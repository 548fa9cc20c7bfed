"""Deterministic stratified train/val/test split — the training-data
partitioning step every corpus pipeline runs before packing/tokenizing.

EXACT per-stratum proportions (train = floor(8n/10), val = floor(9n/10)
- train, test = rest, computed in integers so the SQL oracle reproduces
the cutoffs bit-for-bit) without ever sorting a stratum globally:

1. Hash every row with the same two-round LCG mod P31 the hash sampler
   uses (SQL-mirrorable in BIGINT; seed differs so split and sample
   membership are independent), and bucket rows by the hash's top 8
   bits — bucket order IS hash order.
2. Pass 1 (streaming, shuffle = one tiny bucket_reduce): per
   (stratum, bucket) counts — at most n_strata x 256 rows on the
   driver at ANY corpus size.
3. The driver turns cumulative bucket counts into per-bucket verdicts:
   a bucket wholly inside one side of both cutoffs gets a fixed label;
   only the <=2 buckets per stratum that STRADDLE a cutoff need
   within-bucket ranks.
4. Pass 2 (streaming, no shuffle) labels every non-boundary row from
   the broadcast verdict table; boundary rows — ~n/256 per stratum —
   take one tiny groupby for an exact within-bucket (hash, id) rank.

So the 100 TB cost is two streaming reads plus a shuffle of ~0.4% of
rows, and the result is still EXACTLY the per-stratum quantile split a
full sort would produce. (The reference has no split stage; this is an
engine-brief training-data operator. Hash machinery shared with
stages/text.py corpus_sample_hash.)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from bge_m3_onnx_ray.hashing import P31

_A = np.uint64(1103515245)
_SHIFT = np.uint64(23)          # P31 < 2^31 -> h >> 23 in [0, 256)
_NB = 256
_LABELS = ("train", "val", "test")


def _lcg2(ids: np.ndarray, seed: int) -> np.ndarray:
    s = np.uint64(seed)
    h = ((ids.astype(np.uint64) % P31) * _A + s) % P31
    return (h * _A + s) % P31


def _cutoffs(n: int) -> tuple[int, int]:
    # integer forms of floor(0.8n) / floor(0.9n): exact on both sides
    return (n * 8) // 10, (n * 9) // 10


def stratified_split(ds: rd.Dataset, strat_col: str = "lang",
                     id_col: str = "doc_id",
                     seed: int = 29) -> rd.Dataset:
    """(id_col, strat_col, split) with split in train/val/test at exact
    80/10/10 per stratum, ordered within a stratum by (lcg-hash, id).
    Strata cardinality must be driver-small (languages, sources — not
    user IDs): the verdict table is n_strata x 256 entries."""
    from bge_m3_onnx_ray.stages._groups import bucket_reduce

    def partial_counts(t: pa.Table) -> pa.Table:
        h = _lcg2(t.column(id_col).to_numpy(), seed)
        b = (h >> _SHIFT).astype(np.int64)
        strat = t.column(strat_col).combine_chunks().dictionary_encode()
        sc = np.asarray(strat.indices).astype(np.int64)
        key, cnt = np.unique(sc * _NB + b, return_counts=True)
        return pa.table({
            strat_col: strat.dictionary.take(
                pa.array(key // _NB)).cast(pa.string()),
            "bucket": pa.array(key % _NB, pa.int64()),
            "n": pa.array(cnt.astype(np.int64), pa.int64())})

    counts = bucket_reduce(
        ds.select_columns([id_col, strat_col])
          .map_batches(partial_counts, batch_format="pyarrow"),
        [strat_col, "bucket"], [("n", "sum", "n")],
        n_buckets=16).to_pandas()

    # verdict tables: per stratum an int8[256] of 0/1/2 (fixed label) or
    # 3 (boundary: needs within-bucket rank), plus per boundary bucket
    # its global start rank and the stratum's integer cutoffs
    verdict: dict[str, np.ndarray] = {}
    bounds: dict[tuple[str, int], tuple[int, int, int]] = {}
    for strat, g in counts.groupby(strat_col):
        g = g.sort_values("bucket")
        bks = g["bucket"].to_numpy()
        ns = g["n"].to_numpy()
        starts = np.concatenate([[0], np.cumsum(ns)[:-1]])
        n = int(ns.sum())
        c1, c2 = _cutoffs(n)
        tab = np.full(_NB, 2, np.int8)          # empty buckets: don't care
        for bk, st, nb in zip(bks, starts, ns):
            lo, hi = int(st), int(st) + int(nb)
            if hi <= c1:
                tab[bk] = 0
            elif lo >= c2:
                tab[bk] = 2
            elif lo >= c1 and hi <= c2:
                tab[bk] = 1
            else:
                tab[bk] = 3
                bounds[(str(strat), int(bk))] = (lo, c1, c2)
        verdict[str(strat)] = tab

    def assign_main(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy()
        h = _lcg2(ids, seed)
        b = (h >> _SHIFT).astype(np.int64)
        strat = t.column(strat_col).combine_chunks().dictionary_encode()
        sc = np.asarray(strat.indices).astype(np.int64)
        code = np.empty(len(ids), np.int8)
        for si, sval in enumerate(strat.dictionary.to_pylist()):
            m = sc == si
            code[m] = verdict[sval][b[m]]
        keep = code < 3
        lab = pa.DictionaryArray.from_arrays(
            pa.array(code[keep].astype(np.int32)),
            pa.array(list(_LABELS))).cast(pa.string())
        return pa.table({id_col: pa.array(ids[keep], pa.int64()),
                         strat_col: t.column(strat_col).filter(
                             pa.array(keep)).cast(pa.string()),
                         "split": lab})

    def boundary_rows(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy()
        h = _lcg2(ids, seed)
        b = (h >> _SHIFT).astype(np.int64)
        strat = t.column(strat_col).combine_chunks().dictionary_encode()
        sc = np.asarray(strat.indices).astype(np.int64)
        code = np.empty(len(ids), np.int8)
        svals = strat.dictionary.to_pylist()
        for si, sval in enumerate(svals):
            m = sc == si
            code[m] = verdict[sval][b[m]]
        keep = code == 3
        gk = [f"{svals[s]}\x00{bk}"
              for s, bk in zip(sc[keep], b[keep])]
        return pa.table({id_col: pa.array(ids[keep], pa.int64()),
                         strat_col: t.column(strat_col).filter(
                             pa.array(keep)).cast(pa.string()),
                         "_h": pa.array(h[keep].astype(np.int64)),
                         "_gk": pa.array(gk, pa.string())})

    def rank_kernel(g: pa.Table) -> pa.Table:
        sval, bk = g.column("_gk")[0].as_py().split("\x00")
        lo, c1, c2 = bounds[(sval, int(bk))]
        ids = g.column(id_col).to_numpy()
        h = g.column("_h").to_numpy()
        order = np.lexsort((ids, h))
        rank = np.empty(len(ids), np.int64)
        rank[order] = lo + np.arange(len(ids))
        code = np.where(rank < c1, 0, np.where(rank < c2, 1, 2))
        lab = pa.DictionaryArray.from_arrays(
            pa.array(code.astype(np.int32)),
            pa.array(list(_LABELS))).cast(pa.string())
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         strat_col: g.column(strat_col).cast(pa.string()),
                         "split": lab})

    src = ds.select_columns([id_col, strat_col])
    main = src.map_batches(assign_main, batch_format="pyarrow")
    bnd = src.map_batches(boundary_rows, batch_format="pyarrow") \
        .groupby("_gk").map_groups(rank_kernel, batch_format="pyarrow")
    return main.union(bnd)
