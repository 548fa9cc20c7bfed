"""Deduplication operators for training-data pipelines: exact,
word-n-gram Jaccard, MinHash+LSH, SimHash, embedding-cosine near-dup.

Partitioning strategy (the thing that matters at 100 TB):

- exact:      one shuffle on a content-hash key; groups are tiny (dup
              cliques), so no skew handling needed.
- n-gram / MinHash-LSH: shingle/band rows are exploded per batch
  (vectorized), shuffled ONCE on the shingle/band key, and pair
  candidates are emitted per group with a hard group cap — a stopword-
  level shingle would otherwise produce O(g^2) pairs (documented cap =
  the standard LSH "ban overly-common band" guard).
- SimHash:    no shuffle at all (per-batch map); candidates by identical
              band of the 64-bit signature.
- embedding:  block-matmul against a broadcast (ray.put) matrix.
"""

from __future__ import annotations

from collections import OrderedDict

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Count, Min, Sum

from bge_m3_onnx_ray.stages._pool import task_stage
from bge_m3_onnx_ray.tokenizer import DeterministicTokenizer


# ---------------------------------------------------------------- exact

def exact_dedup(ds: rd.Dataset) -> rd.Dataset:
    """Group identical ``text``; keep the smallest doc_id as canonical.
    Output: (doc_id, n_dups).

    The shuffle key is a 106-bit content hash (two independent polynomial
    codepoint hashes mod P53 with different bases), NOT the text itself —
    at 100 TB the exchange then moves 16 bytes per row instead of the
    document body. Collision probability over 10^12 docs is ~1e-8; the
    two hash lanes are deterministic, so the DuckDB oracle (which groups
    by text) agrees unless an actual collision occurs.

    Threat model: the ~1e-8 bound holds for NON-ADVERSARIAL input only.
    The bases (131, 257) and modulus are fixed and public, so crafted
    colliding texts (small-integer polynomial relations) could silently
    merge distinct documents. For untrusted corpora, derive per-build
    bases recorded in the index config (the SQL-expressibility contract
    only needs the oracle to read the same constants) — not done here
    because the driver oracle inlines the public constants."""

    def add_key(t: pa.Table) -> pa.Table:
        from bge_m3_onnx_ray.hashing import P53, poly_hash
        h1 = poly_hash(t.column("text"), P53)
        h2 = poly_hash(t.column("text"), P53, base=np.uint64(257))
        return pa.table({"h1": pa.array(h1.astype(np.int64)),
                         "h2": pa.array(h2.astype(np.int64)),
                         "doc_id": t.column("doc_id")})

    from bge_m3_onnx_ray.stages._groups import bucket_reduce
    keyed = ds.select_columns(["doc_id", "text"]) \
        .map_batches(add_key, batch_format="pyarrow")
    # groups ~= distinct documents: bucket-reduce, never per-group calls
    return bucket_reduce(keyed, ["h1", "h2"],
                         [("doc_id", "min", "doc_id"),
                          (None, "count", "n_dups")]) \
        .select_columns(["doc_id", "n_dups"])


# ------------------------------------------------- n-gram Jaccard pairs

class ShingleStage:
    """Explode each doc into DISTINCT word-n-gram shingle rows
    (shingle, doc_id), fully vectorized: ordered token lists come from the
    tokenizer's polars/arrow fast path, n-grams are built by shifted
    ``take`` + ``binary_join_element_wise``, and per-doc distinctness is
    one ``dictionary_encode`` + ``np.unique`` over (doc, code) pairs — no
    per-document Python loop. The DuckDB oracle builds identical strings."""

    def __init__(self, n: int):
        self.tok = DeterministicTokenizer()
        self.n = n

    def _shingles(self, texts) -> tuple[pa.Array, np.ndarray, np.ndarray]:
        """All (non-distinct) shingles of a batch → (strings, doc_idx,
        per-doc counts). Rows are grouped by doc in input order."""
        import pyarrow.compute as pc
        flat, offs = self.tok.batch_token_lists(texts)
        lens = np.diff(offs)
        counts = np.maximum(lens - self.n + 1, 0)
        total = int(counts.sum())
        if total == 0:
            return (pa.array([], pa.large_string()),
                    np.empty(0, np.int64), counts)
        cum = np.zeros(len(counts), np.int64)
        np.cumsum(counts[:-1], out=cum[1:])
        starts = np.repeat(offs[:-1] - cum, counts) + np.arange(total)
        parts = [flat.take(pa.array(starts + j)) for j in range(self.n)]
        sep = pa.array([" "] * total, pa.large_string())
        joined = pc.binary_join_element_wise(*parts, sep)
        return joined, np.repeat(np.arange(len(counts)), counts), counts

    def __call__(self, batch: pa.Table) -> pa.Table:
        shingles, doc_idx, _ = self._shingles(batch.column("text"))
        if not len(shingles):
            return pa.table({"shingle": pa.array([], pa.string()),
                             "doc_id": pa.array([], pa.int64())})
        de = shingles.dictionary_encode()
        codes = np.asarray(de.indices).astype(np.int64)
        k = max(len(de.dictionary), 1)
        upair = np.unique(doc_idx * k + codes)   # distinct per doc
        doc_ids = batch.column("doc_id").to_numpy()
        return pa.table({
            "shingle": de.dictionary.take(pa.array(upair % k)).cast(pa.string()),
            "doc_id": pa.array(doc_ids[upair // k], pa.int64())})


def _multi_group_pairs(group: pa.Table, keycols: list[str], cap: int) -> pa.Table:
    """Vectorized pair generation over MANY key-groups at once: ``group``
    holds every row of one hash BUCKET of keys (see
    :func:`_candidate_pairs`); rows are sorted here by (key..., doc_id),
    boundaries found by change detection, and pairs emitted per distinct
    group size via precomputed triangle indices — no per-key Python call.
    Key-groups of fewer than 2 or more than ``cap`` distinct docs emit
    nothing (the standard LSH guard against O(g^2) blowup on
    stopword-level keys)."""
    import pyarrow.compute as pc
    empty = pa.table({"doc_a": pa.array([], pa.int64()),
                      "doc_b": pa.array([], pa.int64())})
    n = group.num_rows
    if n < 2:
        return empty
    order = pc.sort_indices(group, sort_keys=[(c, "ascending")
                                              for c in [*keycols, "doc_id"]])
    tbl = group.take(order)
    change = np.zeros(n - 1, bool)
    for c in keycols:
        col = tbl.column(c).combine_chunks()
        change |= np.asarray(pc.not_equal(col.slice(1), col.slice(0, n - 1))
                             .to_numpy(zero_copy_only=False))
    bounds = np.concatenate([[0], np.flatnonzero(change) + 1, [n]])
    sizes = np.diff(bounds)
    docs = tbl.column("doc_id").to_numpy()
    keep = (sizes >= 2) & (sizes <= cap)
    if not keep.any():
        return empty
    out_a, out_b = [], []
    kept_sizes = sizes[keep]
    kept_starts = bounds[:-1][keep]
    for s in np.unique(kept_sizes):
        starts = kept_starts[kept_sizes == s]
        ai, bi = np.triu_indices(int(s), k=1)
        out_a.append(docs[(starts[:, None] + ai[None, :])].ravel())
        out_b.append(docs[(starts[:, None] + bi[None, :])].ravel())
    return pa.table({"doc_a": pa.array(np.concatenate(out_a), pa.int64()),
                     "doc_b": pa.array(np.concatenate(out_b), pa.int64())})


def _candidate_pairs(rows: rd.Dataset, keycols: list[str], cap: int,
                     n_buckets: int = 1024) -> rd.Dataset:
    """(key..., doc_id) rows → candidate (doc_a, doc_b) pairs, one pair
    row per key the two docs share.

    ONE shuffle, keyed by a HASH BUCKET of the key rather than the key
    itself: a ``groupby(key).map_groups`` pays a per-group Python call,
    and candidate keys are mostly unique (~one group per row — measured
    ~20 us x 800k groups at sf0.1). Bucketing gives each map_groups call
    ~rows/n_buckets rows spanning many keys, and the per-bucket kernel is
    fully vectorized. ``n_buckets`` scales with cluster size at 100 TB —
    it only needs to exceed total_rows / target_group_rows."""
    from bge_m3_onnx_ray.hashing import P53, poly_hash

    def add_bucket(t: pa.Table) -> pa.Table:
        # Horner-mix all key parts: string keys via poly_hash, numeric
        # keys directly (h*131 stays < 2^60: uint64-safe)
        h = np.zeros(t.num_rows, np.uint64)
        for c in keycols:
            col = t.column(c)
            if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
                v = poly_hash(col, P53)
            else:
                v = col.to_numpy().astype(np.uint64) % P53
            h = (h * np.uint64(131) + v) % P53
        return t.append_column("_bucket",
                               pa.array((h % n_buckets).astype(np.int64)))

    bucketed = rows.map_batches(add_bucket, batch_format="pyarrow")
    return bucketed.groupby("_bucket").map_groups(
        lambda g: _multi_group_pairs(g, keycols, cap),
        batch_format="pyarrow")


def _count_pairs(pairs: rd.Dataset, out_col: str,
                 n_buckets: int = 256) -> rd.Dataset:
    """(doc_a, doc_b) rows → (doc_a, doc_b, <out_col>=multiplicity).

    Functionally ``groupby([doc_a, doc_b]).aggregate(Count)``, but Ray's
    sort-aggregate pays ~150 µs of per-GROUP overhead — 172 s for the
    1.13M distinct pairs of the sf0.1 ngram graph. Bucketing by a hash
    of the pair and counting with one lexsort + reduceat per bucket does
    the same reduction in ~2 s; a pair hashes to exactly one bucket, so
    counts are exact."""
    from bge_m3_onnx_ray.hashing import P53

    def add_bucket(t: pa.Table) -> pa.Table:
        a = t.column("doc_a").to_numpy().astype(np.uint64) % P53
        b = t.column("doc_b").to_numpy().astype(np.uint64) % P53
        h = (a * np.uint64(131) + b) % P53
        return t.select(["doc_a", "doc_b"]).append_column(
            "_cb", pa.array((h % np.uint64(n_buckets)).astype(np.int64)))

    def count_kernel(g: pa.Table) -> pa.Table:
        a = g.column("doc_a").to_numpy()
        b = g.column("doc_b").to_numpy()
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        brk = np.empty(len(a), bool)
        brk[0] = True
        brk[1:] = (np.diff(a) != 0) | (np.diff(b) != 0)
        starts = np.flatnonzero(brk)
        cnt = np.diff(np.concatenate([starts, [len(a)]]))
        return pa.table({"doc_a": pa.array(a[starts], pa.int64()),
                         "doc_b": pa.array(b[starts], pa.int64()),
                         out_col: pa.array(cnt.astype(np.int64), pa.int64())})

    return pairs.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("_cb").map_groups(count_kernel, batch_format="pyarrow")


def ngram_pair_candidates(ds: rd.Dataset, n: int = 3, min_common: int = 2,
                          group_cap: int = 1000) -> rd.Dataset:
    """Pairs of docs sharing >= min_common distinct word-n-gram shingles.
    Output (doc_a, doc_b, n_common), doc_a < doc_b."""
    shingles = ds.select_columns(["doc_id", "text"]).map_batches(
        task_stage(ShingleStage, n=n), batch_format="pyarrow",
        batch_size=4096)
    pairs = _candidate_pairs(shingles, ["shingle"], group_cap)
    counted = _count_pairs(pairs, "n_common")
    import pyarrow.compute as pc
    return counted.map_batches(
        lambda t: t.filter(pc.greater_equal(t["n_common"], min_common)),
        batch_format="pyarrow")


def _both_directions(t: pa.Table) -> pa.Table:
    """Undirected pair rows → both-directions (src, dst) rows — hash-
    partitioning by src then co-locates each node's COMPLETE out-edge
    list with the node (the BSP engine's partitioning contract)."""
    a = t.column("doc_a").to_numpy()
    b = t.column("doc_b").to_numpy()
    return pa.table({"src": pa.array(np.concatenate([a, b]), pa.int64()),
                     "dst": pa.array(np.concatenate([b, a]), pa.int64())})


def dup_clusters(pairs: rd.Dataset, max_rounds: int = 512,
                 stats: dict | None = None) -> rd.Dataset:
    """Connected components over a candidate-pair list → (doc_id,
    cluster_id) with cluster_id = min docID in the component.

    Min-label propagation with pointer doubling (label ← label-of-label,
    so the label-tree depth halves each round and path-shaped components
    converge in O(log n) rounds), run on the bucketed BSP task engine
    (:mod:`bge_m3_onnx_ray.stages._bsp`): the both-directions edge set is
    hash-partitioned by source node ONCE, then every round is four waves
    of per-bucket Ray tasks (neighbor-min messages → fold → label-of-
    label query → answer/apply), all integer-min reductions — order-free,
    so the final labels are bit-identical to the earlier groupby-shuffle
    formulation at any bucket count or interleaving. Why not groupby
    rounds: an iterative fixpoint pays Ray Data's fixed per-execution
    cost (plan + executor spin-up, ~0.3-0.5 s) 3x per round for what is
    a STABLE partition of static edges — measured 2.5 s → 0.12 s at
    sf0.01 for identical output. Partitioning contract: one bucket (its
    nodes + their full out-edge lists) fits one worker's heap; bucket
    count scales with the cluster, not the key space. Convergence = a
    round that moves no label (labels are monotone non-increasing); a
    component needing more than ``max_rounds`` raises rather than
    returning wrong labels. The driver-side union-find shortcut is
    deliberately NOT used — candidate graphs can be large at corpus
    scale. ``stats`` (optional) gets ``{"rounds": n}``.
    """
    from bge_m3_onnx_ray.stages._bsp import min_label_bsp
    edges = pairs.select_columns(["doc_a", "doc_b"]).map_batches(
        _both_directions, batch_format="pyarrow").materialize()
    return min_label_bsp(edges, max_rounds, 1024, stats=stats)


# ----------------------------------------------------------- MinHash/LSH

class MinHashStage(ShingleStage):
    """Per-doc MinHash signature (n_perm affine permutations of the
    31-bit polynomial shingle hash) + LSH band keys. One row per
    (doc, band): (band, h1, h2, doc_id) where h1/h2 are two Horner
    polynomial lanes (bases 131 and 257 mod P53) over the band's rpb
    signature values — the exact_dedup trick: the shuffle moves a 16-byte
    key per row instead of a materialized signature string. The DuckDB
    oracle keeps grouping by the STRING signature (string_agg ORDER BY
    perm); engine and oracle produce the same band groups, hence the same
    candidate pairs, unless both 53-bit lanes collide (~2^-106).

    Vectorized: one shingle pass per batch (ShingleStage machinery), one
    poly-hash sweep over the batch's UNIQUE shingles, one
    ``np.minimum.reduceat`` per (doc, perm), one (docs x bands) Horner
    sweep of rpb steps — no per-document or per-band Python loop."""

    def __init__(self, n: int, n_perm: int, n_bands: int, seed: int = 7):
        assert n_perm % n_bands == 0
        super().__init__(n)
        from bge_m3_onnx_ray.hashing import minhash_seeds
        self.n_perm = n_perm
        self.n_bands = n_bands
        self.a, self.b = minhash_seeds(n_perm, seed)

    def _signatures(self, batch: pa.Table):
        """(doc_ids, sig) where sig is (n_docs_with_shingles, n_perm)."""
        from bge_m3_onnx_ray.hashing import P31, affine_minhash, poly_hash
        shingles, doc_idx, counts = self._shingles(batch.column("text"))
        if not len(shingles):
            return np.empty(0, np.int64), np.empty((0, self.n_perm), np.int64)
        de = shingles.dictionary_encode()
        codes = np.asarray(de.indices).astype(np.int64)
        base = poly_hash(de.dictionary, P31)
        H = affine_minhash(base[codes], self.a, self.b)  # (rows, n_perm)
        docs_with = np.flatnonzero(counts > 0)
        cum = np.zeros(len(counts), np.int64)
        np.cumsum(counts[:-1], out=cum[1:])
        sig = np.minimum.reduceat(H, cum[docs_with], axis=0).astype(np.int64)
        doc_ids = batch.column("doc_id").to_numpy()[docs_with]
        return doc_ids, sig

    def __call__(self, batch: pa.Table) -> pa.Table:
        from bge_m3_onnx_ray.hashing import P53
        nb, rpb = self.n_bands, self.n_perm // self.n_bands
        doc_ids, sig = self._signatures(batch)
        nd = len(doc_ids)
        if nd == 0:
            return pa.table({"band": pa.array([], pa.int32()),
                             "h1": pa.array([], pa.int64()),
                             "h2": pa.array([], pa.int64()),
                             "doc_id": pa.array([], pa.int64())})
        # bands are contiguous rpb-column slices: Horner over the 31-bit
        # signature values stays < 2^60 before each mod (uint64-safe)
        S = sig.astype(np.uint64).reshape(nd, nb, rpb)
        h1 = np.zeros((nd, nb), np.uint64)
        h2 = np.zeros((nd, nb), np.uint64)
        for j in range(rpb):
            h1 = (h1 * np.uint64(131) + S[:, :, j]) % P53
            h2 = (h2 * np.uint64(257) + S[:, :, j]) % P53
        return pa.table({
            "band": pa.array(np.tile(np.arange(nb, dtype=np.int32), nd)),
            "h1": pa.array(h1.reshape(-1).astype(np.int64)),
            "h2": pa.array(h2.reshape(-1).astype(np.int64)),
            "doc_id": pa.array(np.repeat(doc_ids, nb), pa.int64())})

    def signature(self, text: str) -> np.ndarray | None:
        """Single-doc signature (test/debug convenience)."""
        t = pa.table({"doc_id": pa.array([0], pa.int64()),
                      "text": pa.array([text], pa.string())})
        doc_ids, sig = self._signatures(t)
        if len(doc_ids) == 0:
            return None
        return sig[0]


def minhash_lsh_candidates(ds: rd.Dataset, n: int = 3, n_perm: int = 64,
                           n_bands: int = 16, group_cap: int = 1000) -> rd.Dataset:
    """Candidate near-dup pairs via MinHash LSH banding. Output
    (doc_a, doc_b, n_bands_hit) distinct pairs colliding in >= 1 band."""
    bands = ds.select_columns(["doc_id", "text"]).map_batches(
        task_stage(MinHashStage, n=n, n_perm=n_perm, n_bands=n_bands),
        batch_format="pyarrow", batch_size=2048)
    pairs = _candidate_pairs(bands, ["h1", "h2", "band"], group_cap)
    return _count_pairs(pairs, "n_bands_hit")


class _FilteredShingles(ShingleStage):
    """ShingleStage restricted to a broadcast doc set (semi-join on the
    small side — the candidate docs — before the explode)."""

    def __init__(self, n: int, docs_ref):
        import ray
        super().__init__(n)
        self.keep = pa.array(sorted(ray.get(docs_ref)), pa.int64())

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        mask = pc.is_in(batch["doc_id"], value_set=self.keep)
        return super().__call__(batch.filter(mask))


class _ShingleSizes(ShingleStage):
    """Per-doc DISTINCT shingle count for a broadcast doc set."""

    def __init__(self, n: int, docs_ref):
        import ray
        super().__init__(n)
        self.keep = pa.array(sorted(ray.get(docs_ref)), pa.int64())

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        sub = batch.filter(pc.is_in(batch["doc_id"], value_set=self.keep))
        rows = ShingleStage.__call__(self, sub)  # distinct per doc
        docs, counts = np.unique(rows.column("doc_id").to_numpy(),
                                 return_counts=True)
        return pa.table({"doc_id": pa.array(docs, pa.int64()),
                         "n_shingles": pa.array(counts.astype(np.int64),
                                                pa.int64())})


def verify_jaccard(ds: rd.Dataset, candidates, n: int = 3) -> pa.Table:
    """EXACT Jaccard for candidate pairs — the verification half of the
    LSH pattern (the reference's candidates-then-verify test shape,
    ``samples/python/bge_m3_tests.py:146-160``), distributed:

    1. semi-join: shingle only the candidate DOCS (broadcast id set);
    2. one bucketed shuffle counts the FULL intersection per co-candidate
       pair (no group cap — the doc set is already bounded);
    3. per-doc distinct-shingle sizes from the same filtered pass,
       broadcast (two O(#candidate docs) int arrays, 16 B/doc);
    4. jaccard = inter / (|A| + |B| - inter): the (candidates ⨝
       intersections) join is a SECOND bucketed shuffle keyed on
       hash(doc_a, doc_b) with a vectorized searchsorted kernel per
       bucket — NO per-pair driver work; the only driver-side state is
       the candidate-doc id/size arrays.

    Output: Dataset (doc_a, doc_b, n_common, jaccard_q6), one row per
    candidate pair. ``candidates`` is a pa.Table or Dataset with
    (doc_a, doc_b) columns (extras dropped).
    """
    import ray

    empty = pa.table({"doc_a": pa.array([], pa.int64()),
                      "doc_b": pa.array([], pa.int64()),
                      "n_common": pa.array([], pa.int64()),
                      "jaccard_q6": pa.array([], pa.int64())})
    if isinstance(candidates, pa.Table):
        candidates = rd.from_arrow(candidates)
    # materialize: the pair list is re-read below (doc-id scan + join
    # shuffle) and recomputing an LSH candidate pipeline twice would
    # double the dominant cost; the materialized blocks live in the
    # object store, not on the driver
    candidates = candidates.select_columns(["doc_a", "doc_b"]).materialize()

    # distinct candidate docs, streamed batch-at-a-time (ids only)
    parts = [np.union1d(t.column("doc_a").to_numpy(),
                        t.column("doc_b").to_numpy())
             for t in candidates.iter_batches(batch_size=None,
                                              batch_format="pyarrow")]
    docs_needed = (np.unique(np.concatenate(parts)) if parts
                   else np.empty(0, np.int64))
    if not len(docs_needed):
        return rd.from_arrow(empty)
    docs_ref = ray.put(docs_needed.tolist())

    src = ds.select_columns(["doc_id", "text"])
    sh = src.map_batches(task_stage(_FilteredShingles, n=n, docs_ref=docs_ref),
                         batch_format="pyarrow", batch_size=4096)
    inter = _count_pairs(
        _candidate_pairs(sh, ["shingle"], cap=len(docs_needed) + 1),
        "n_common")
    sizes = src.map_batches(task_stage(_ShingleSizes, n=n, docs_ref=docs_ref),
                            batch_format="pyarrow", batch_size=4096) \
        .to_pandas()  # O(#candidate docs) — the broadcast small side
    order = np.argsort(sizes.doc_id.to_numpy())
    sizes_ref = ray.put((sizes.doc_id.to_numpy()[order].astype(np.int64),
                         sizes.n_shingles.to_numpy()[order].astype(np.int64)))

    n_buckets = 256
    from bge_m3_onnx_ray.hashing import P53

    def tag(src_id):
        def add(t: pa.Table) -> pa.Table:
            a = t.column("doc_a").to_numpy().astype(np.uint64) % P53
            b = t.column("doc_b").to_numpy().astype(np.uint64) % P53
            h = (a * np.uint64(131) + b) % P53
            nc = (t.column("n_common") if "n_common" in t.column_names
                  else pa.array(np.zeros(t.num_rows, np.int64)))
            return pa.table({
                "doc_a": t.column("doc_a"), "doc_b": t.column("doc_b"),
                "n_common": nc,
                "_src": pa.array(np.full(t.num_rows, src_id, np.int8)),
                "_bucket": pa.array((h % n_buckets).astype(np.int64))})
        return add

    both = candidates.map_batches(tag(0), batch_format="pyarrow") \
        .union(inter.map_batches(tag(1), batch_format="pyarrow"))

    def join_kernel(group: pa.Table) -> pa.Table:
        s = group.column("_src").to_numpy()
        a = group.column("doc_a").to_numpy()
        b = group.column("doc_b").to_numpy()
        nc = group.column("n_common").to_numpy()
        cm = s == 0
        dt = np.dtype([("a", np.int64), ("b", np.int64)])
        ik = np.empty(int((~cm).sum()), dt)
        ik["a"], ik["b"] = a[~cm], b[~cm]
        inc = nc[~cm]
        o = np.argsort(ik, order=("a", "b"))
        ik, inc = ik[o], inc[o]
        ck = np.empty(int(cm.sum()), dt)
        ck["a"], ck["b"] = a[cm], b[cm]
        if len(ik):
            pos = np.searchsorted(ik, ck)
            hit = pos < len(ik)
            hit[hit] &= ik[pos[hit]] == ck[hit]
            n_common = np.where(hit, inc[np.minimum(pos, len(ik) - 1)], 0)
        else:
            n_common = np.zeros(len(ck), np.int64)

        def size_of(keys, sdocs, scnt):
            # a candidate doc can have ZERO shingles (shorter than n
            # tokens) and then has no sizes row — missing → 0
            if not len(sdocs):
                return np.zeros(len(keys), np.float64)
            p = np.minimum(np.searchsorted(sdocs, keys), len(sdocs) - 1)
            return np.where(sdocs[p] == keys, scnt[p], 0).astype(np.float64)

        sdocs, scnt = ray.get(sizes_ref)
        sa = size_of(ck["a"], sdocs, scnt)
        sb = size_of(ck["b"], sdocs, scnt)
        union = sa + sb - n_common
        jac = np.divide(n_common, union, out=np.zeros(len(union)),
                        where=union > 0)
        return pa.table({
            "doc_a": pa.array(ck["a"], pa.int64()),
            "doc_b": pa.array(ck["b"], pa.int64()),
            "n_common": pa.array(n_common.astype(np.int64), pa.int64()),
            "jaccard_q6": pa.array(np.floor(jac * 1e6).astype(np.int64),
                                   pa.int64())})

    return both.groupby("_bucket").map_groups(join_kernel,
                                              batch_format="pyarrow")


# --------------------------------------------------------------- SimHash

SIMHASH_BITS = 53  # bit width of the P53 polynomial term hash


class SimHashStage:
    """53-bit SimHash over tf-weighted polynomial term hashes; no shuffle.

    Vectorized: term counts from the tokenizer's coded fast path, one
    poly-hash sweep over the batch's unique terms, sign matrix expansion
    and one ``np.add.reduceat`` per doc — no per-document/per-term loop.
    The P53 hash makes the whole computation DuckDB-expressible, so the
    driver check is a value-hash match, not rows-only."""

    def __init__(self):
        self.tok = DeterministicTokenizer()

    def __call__(self, batch: pa.Table) -> pa.Table:
        from bge_m3_onnx_ray.hashing import P53, poly_hash
        out = np.zeros(batch.num_rows, np.int64)  # token-less docs → 0
        doc_idx, codes, uniques, tfs, _ = \
            self.tok.batch_term_counts_coded(batch.column("text"))
        if len(codes):
            h = poly_hash(uniques, P53)
            js = np.arange(SIMHASH_BITS, dtype=np.uint64)
            signs = (((h[:, None] >> js[None, :]) & np.uint64(1))
                     .astype(np.int64) * 2 - 1)          # (n_uniq, 53)
            contrib = tfs.astype(np.int64)[:, None] * signs[codes]
            docs_with, seg_starts = np.unique(doc_idx, return_index=True)
            acc = np.add.reduceat(contrib, seg_starts, axis=0)
            bits = (acc > 0).astype(np.uint64)
            vals = (bits << js[None, :]).sum(axis=1)     # < 2^53: int64-safe
            out[docs_with] = vals.astype(np.int64)
        return pa.table({"doc_id": batch.column("doc_id"),
                         "simhash": pa.array(out, pa.int64())})


def simhash(ds: rd.Dataset) -> rd.Dataset:
    return ds.select_columns(["doc_id", "text"]).map_batches(
        task_stage(SimHashStage), batch_format="pyarrow", batch_size=2048)


# -------------------------------------------- SimHash near-dup pairs

# 4 bands covering the 53 simhash bits as (shift, width): any pair
# within Hamming distance <= 3 is identical in >= 1 band (pigeonhole),
# so banded candidate generation has no false negatives at the default
# ``max_hamming=3`` (Manku/Jain/Sarma 2007, WWW — "Detecting
# near-duplicates for web crawling" uses the same split-and-probe).
_SIMHASH_BANDS = ((0, 14), (14, 13), (27, 13), (40, 13))

_POP8 = np.array([bin(i).count("1") for i in range(256)], np.uint8)


def _popcount64(x: np.ndarray) -> np.ndarray:
    b = _POP8[np.ascontiguousarray(x.astype(np.uint64)).view(np.uint8)]
    return b.reshape(len(x), 8).sum(axis=1, dtype=np.int64)


def _simhash_band_pair_kernel(group: pa.Table, cap: int,
                              max_hamming: int) -> pa.Table:
    """One hash BUCKET of (band, band_val, doc_id, simhash) rows →
    verified near-dup pairs: triangle candidates per identical
    (band, band_val) key-group (size 2..cap, the LSH hot-key guard),
    then the EXACT popcount(xor) filter — candidates never leave the
    kernel, only verified pairs do."""
    import pyarrow.compute as pc
    empty = pa.table({"doc_a": pa.array([], pa.int64()),
                      "doc_b": pa.array([], pa.int64()),
                      "hamming": pa.array([], pa.int64())})
    n = group.num_rows
    if n < 2:
        return empty
    order = pc.sort_indices(group, sort_keys=[
        ("band", "ascending"), ("band_val", "ascending"),
        ("doc_id", "ascending")])
    tbl = group.take(order)
    change = np.zeros(n - 1, bool)
    for c in ("band", "band_val"):
        col = tbl.column(c).combine_chunks()
        change |= np.asarray(pc.not_equal(col.slice(1), col.slice(0, n - 1))
                             .to_numpy(zero_copy_only=False))
    bounds = np.concatenate([[0], np.flatnonzero(change) + 1, [n]])
    sizes = np.diff(bounds)
    docs = tbl.column("doc_id").to_numpy()
    sims = tbl.column("simhash").to_numpy().astype(np.uint64)
    keep = (sizes >= 2) & (sizes <= cap)
    if not keep.any():
        return empty
    out_a, out_b, out_h = [], [], []
    kept_sizes = sizes[keep]
    kept_starts = bounds[:-1][keep]
    for s in np.unique(kept_sizes):
        starts = kept_starts[kept_sizes == s]
        ai, bi = np.triu_indices(int(s), k=1)
        ia = (starts[:, None] + ai[None, :]).ravel()
        ib = (starts[:, None] + bi[None, :]).ravel()
        ham = _popcount64(sims[ia] ^ sims[ib])
        ok = ham <= max_hamming
        out_a.append(docs[ia[ok]])          # doc-sorted in group: a < b
        out_b.append(docs[ib[ok]])
        out_h.append(ham[ok])
    return pa.table({"doc_a": pa.array(np.concatenate(out_a), pa.int64()),
                     "doc_b": pa.array(np.concatenate(out_b), pa.int64()),
                     "hamming": pa.array(np.concatenate(out_h), pa.int64())})


def simhash_dup_pairs(ds: rd.Dataset, max_hamming: int = 3,
                      group_cap: int = 1000,
                      n_buckets: int = 1024) -> rd.Dataset:
    """SimHash near-duplicate PAIRS: docs whose 53-bit simhashes differ
    in at most ``max_hamming`` bits — the web-crawl near-dup shape
    (Manku et al. 2007) the reference's dedup family lacks a
    Hamming-space member for.

    Scale shape: simhash is map-only; each doc then emits 4 tiny
    (band, band_val) rows and ONE bucket-keyed shuffle moves them —
    16 B/row keys, never the text. Candidates are generated and
    popcount-VERIFIED inside the bucket kernel (only true pairs leave),
    and a pair found by several bands dedupes in a second 16-byte
    bucket exchange. ``group_cap`` bounds the O(g²) blowup of a hot
    band value (boilerplate corpora) exactly like the ngram/MinHash
    paths; with the default 4 bands the pigeonhole guarantee means NO
    false negatives at max_hamming <= 3 (up to capped groups — the
    documented LSH trade, cap >> any sf0.01 group so the SQL oracle is
    the plain all-pairs Hamming join)."""
    from bge_m3_onnx_ray.hashing import P53
    from bge_m3_onnx_ray.stages._groups import bucket_reduce

    sh = simhash(ds)

    def explode(t: pa.Table) -> pa.Table:
        sim = t.column("simhash").to_numpy().astype(np.uint64)
        doc = t.column("doc_id").to_numpy()
        parts = []
        for band, (off, w) in enumerate(_SIMHASH_BANDS):
            bv = ((sim >> np.uint64(off)) & np.uint64((1 << w) - 1))
            parts.append(pa.table({
                "band": pa.array(np.full(len(doc), band, np.int64)),
                "band_val": pa.array(bv.astype(np.int64)),
                "doc_id": pa.array(doc, pa.int64()),
                "simhash": t.column("simhash")}))
        return pa.concat_tables(parts)

    def add_bucket(t: pa.Table) -> pa.Table:
        band = t.column("band").to_numpy().astype(np.uint64)
        bv = t.column("band_val").to_numpy().astype(np.uint64)
        h = (band * np.uint64(131) + bv) % P53
        return t.append_column(
            "_bucket", pa.array((h % np.uint64(n_buckets)).astype(np.int64)))

    verified = sh.map_batches(explode, batch_format="pyarrow") \
        .map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("_bucket").map_groups(
            lambda g: _simhash_band_pair_kernel(g, group_cap, max_hamming),
            batch_format="pyarrow")
    return bucket_reduce(verified, ["doc_a", "doc_b"],
                         [("hamming", "min", "hamming")])


# ------------------------------------------------- embedding near-dup

_PAIR_SCHEMA = pa.schema([("vec_a", pa.int64()), ("vec_b", pa.int64()),
                          ("cos_q2", pa.int64())])


class _PairBlockCos:
    """One (block_i, block_j) TILE of the exact all-pairs cosine. No
    process ever holds more than a handful of blocks: the driver puts
    one block at a time, each task fetches the two blocks its tile
    names (zero-copy from the local object store) and keeps a small
    per-worker LRU for tile reuse. The diagonal tile dedups with the
    id< mask; off-diagonal tiles orient each hit as (min_id, max_id)."""

    def __init__(self, block_refs, threshold: float):
        self.block_refs = block_refs
        self.threshold = threshold
        self._cache: "OrderedDict[int, tuple]" = OrderedDict()

    def _block(self, i: int):
        got = self._cache.get(i)
        if got is None:
            import ray
            got = ray.get(self.block_refs[i])
            self._cache[i] = got
            while len(self._cache) > 8:
                self._cache.popitem(last=False)
        else:
            self._cache.move_to_end(i)
        return got

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for bi, bj in zip(batch.column("bi").to_pylist(),
                          batch.column("bj").to_pylist()):
            ids_i, mi = self._block(int(bi))
            ids_j, mj = self._block(int(bj))
            sims = mi @ mj.T
            if bi == bj:
                r, c = np.nonzero((sims >= self.threshold) &
                                  (ids_i[:, None] < ids_j[None, :]))
                a, b = ids_i[r], ids_j[c]
            else:
                r, c = np.nonzero(sims >= self.threshold)
                ai, bj_ = ids_i[r], ids_j[c]
                a, b = np.minimum(ai, bj_), np.maximum(ai, bj_)
            out.append(pa.table({
                "vec_a": pa.array(a, pa.int64()),
                "vec_b": pa.array(b, pa.int64()),
                "cos_q2": pa.array(
                    np.floor(sims[r, c] * 100.0).astype(np.int64),
                    pa.int64())}, schema=_PAIR_SCHEMA))
        return (pa.concat_tables(out) if out
                else _PAIR_SCHEMA.empty_table())


def embedding_dup_pairs(ds: rd.Dataset, threshold: float = 0.4,
                        max_vectors: int = 1_000_000,
                        block_size: int = 4096,
                        exact: bool = False,
                        n_planes: int = 12, seed: int = 11) -> rd.Dataset:
    """ALL pairs with cosine >= threshold — the exact baseline, computed
    block×block: vectors are cut into normalized blocks of
    ``block_size`` rows (the driver streams batches and puts ONE block
    at a time — peak driver memory is one block, never the matrix), and
    each upper-triangle (block_i, block_j) tile is an independent task
    holding exactly two blocks. Output (vec_a, vec_b, cos_q2),
    vec_a < vec_b.

    Total compute is still O(N²·dim) — that is what "exact all-pairs"
    means — so ``max_vectors`` bounds the exact path. Beyond the cap an
    unknown-scale caller is AUTO-ROUTED to :func:`lsh_bucket_pairs`
    (random-hyperplane candidates, exact per-bucket cosine verify —
    same output schema, LSH-recall instead of total recall; ``n_planes``
    / ``seed`` tune it). Pass ``exact=True`` to forbid the approximate
    fallback, in which case exceeding the cap raises. The cap bounds
    tile COUNT, not memory: at 10⁶ vectors the fan-out is ~30k tiles of
    ~33 MB sims each."""
    import ray

    from bge_m3_onnx_ray.stages.ann import _embedding_matrix, _normalize

    src = ds.select_columns(["vec_id", "embedding"])
    n = src.count()
    if n > max_vectors:
        if exact:
            raise ValueError(
                f"embedding_dup_pairs(exact=True) is the exact all-pairs "
                f"baseline, capped at max_vectors={max_vectors} (got {n}): "
                f"O(N^2) tiles do not scale past ~10^6 vectors. Use "
                f"lsh_bucket_pairs() / exact=False for larger corpora, or "
                f"raise max_vectors explicitly.")
        return lsh_bucket_pairs(src, threshold=threshold,
                                n_planes=n_planes, seed=seed)
    block_refs = []
    buf_ids: list[np.ndarray] = []
    buf_ms: list[np.ndarray] = []
    buffered = 0

    def _flush(upto: int) -> None:
        nonlocal buffered
        ids_b = np.concatenate(buf_ids)[:upto]
        m_b = np.concatenate(buf_ms)[:upto]
        rest_ids, rest_m = (np.concatenate(buf_ids)[upto:],
                            np.concatenate(buf_ms)[upto:])
        block_refs.append(ray.put((ids_b, _normalize(m_b))))
        buf_ids.clear()
        buf_ms.clear()
        if len(rest_ids):
            buf_ids.append(rest_ids)
            buf_ms.append(rest_m)
        buffered = len(rest_ids)

    for t in src.iter_batches(batch_size=block_size, batch_format="pyarrow"):
        buf_ids.append(t.column("vec_id").to_numpy().astype(np.int64))
        buf_ms.append(_embedding_matrix(t.column("embedding")))
        buffered += t.num_rows
        while buffered >= block_size:
            _flush(block_size)
    if buffered:
        _flush(buffered)
    if not block_refs:
        return rd.from_arrow(_PAIR_SCHEMA.empty_table())

    p = len(block_refs)
    tiles = [{"bi": i, "bj": j} for i in range(p) for j in range(i, p)]
    return rd.from_items(tiles).map_batches(
        task_stage(_PairBlockCos, block_refs=tuple(block_refs),
                   threshold=threshold),
        batch_format="pyarrow", batch_size=4)


def _bucket_cos_pairs(group: pa.Table, threshold: float) -> pa.Table:
    """Exact all-pairs cosine within one LSH bucket."""
    from bge_m3_onnx_ray.stages.ann import _embedding_matrix, _normalize
    ids = group.column("vec_id").to_numpy()
    if len(ids) < 2:
        return pa.table({"vec_a": pa.array([], pa.int64()),
                         "vec_b": pa.array([], pa.int64()),
                         "cos_q2": pa.array([], pa.int64())})
    m = _normalize(_embedding_matrix(group.column("embedding")))
    sims = m @ m.T
    ai, bj = np.nonzero((sims >= threshold) & (ids[:, None] < ids[None, :]))
    return pa.table({
        "vec_a": pa.array(ids[ai], pa.int64()),
        "vec_b": pa.array(ids[bj], pa.int64()),
        "cos_q2": pa.array(np.floor(sims[ai, bj] * 100.0).astype(np.int64),
                           pa.int64())})


def lsh_bucket_pairs(ds: rd.Dataset, threshold: float = 0.4,
                     n_planes: int = 12, seed: int = 11) -> rd.Dataset:
    """The SCALE path for embedding near-dup: random-hyperplane bucket
    assignment (stages.ann.LshBucketStage planes), ONE shuffle on the
    bucket key, exact cosine all-pairs inside each bucket. Finds every
    pair whose vectors collide in the bucket (same sign on all planes);
    cross-bucket pairs are the LSH recall trade-off — tune n_planes.
    Output (vec_a, vec_b, cos_q2), vec_a < vec_b; deterministic, and
    SQL-expressible (fixed planes) → driver value-hash check."""
    from bge_m3_onnx_ray.stages.ann import LshBucketStage

    class _WithBucket(LshBucketStage):
        def __call__(self, batch: pa.Table) -> pa.Table:
            b = super().__call__(batch)
            return batch.append_column("bucket", b.column("bucket"))

    dim = len(ds.take(1)[0]["embedding"])
    bucketed = ds.select_columns(["vec_id", "embedding"]).map_batches(
        task_stage(_WithBucket, dim=dim, n_planes=n_planes, seed=seed),
        batch_format="pyarrow", batch_size=4096)
    return bucketed.groupby("bucket").map_groups(
        lambda g: _bucket_cos_pairs(g, threshold), batch_format="pyarrow")


def keep_best(clusters: rd.Dataset, docs: rd.Dataset,
              n_buckets: int = 64) -> rd.Dataset:
    """Representative selection for duplicate clusters: per cluster keep
    the LONGEST member (token count; ties by ascending doc_id) — the
    "which copy survives dedup" step a real training-data pipeline runs
    after :func:`dup_clusters`. Output (cluster_id, keep_doc_id,
    keep_n_words, n_members).

    Distributed shape: two bucket-keyed shuffles, both carrying only
    (int64 x 4) rows — (1) join cluster labels to per-doc token counts
    on hash(doc_id) with a searchsorted kernel, (2) per-cluster argmax
    on hash(cluster_id) with one lexsort. Neither the corpus text nor
    any per-group Python loop crosses an exchange."""
    from bge_m3_onnx_ray.hashing import splitmix64
    from bge_m3_onnx_ray.tokenizer import DeterministicTokenizer

    def word_counts(t: pa.Table) -> pa.Table:
        tok = DeterministicTokenizer()
        _, _, _, _, dls = tok.batch_term_counts_coded(t.column("text"))
        return pa.table({"doc_id": t.column("doc_id").cast(pa.int64()),
                         "side": pa.array(np.ones(t.num_rows, np.int64)),
                         "val": pa.array(dls.astype(np.int64))})

    def label_rows(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t.column("doc_id").cast(pa.int64()),
                         "side": pa.array(np.zeros(t.num_rows, np.int64)),
                         "val": t.column("cluster_id").cast(pa.int64())})

    def add_doc_bucket(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy().astype(np.uint64)
        return t.append_column("_jb", pa.array(
            (splitmix64(d) % np.uint64(n_buckets)).astype(np.int64)))

    def join_kernel(g: pa.Table) -> pa.Table:
        side = g.column("side").to_numpy()
        doc = g.column("doc_id").to_numpy()
        val = g.column("val").to_numpy()
        lab = side == 0
        ld, lv = doc[lab], val[lab]          # labeled docs (in clusters)
        wd, wv = doc[~lab], val[~lab]        # word counts (all docs)
        order = np.argsort(wd, kind="stable")
        wd, wv = wd[order], wv[order]
        pos = np.searchsorted(wd, ld)
        ok = (pos < len(wd)) & (wd[np.minimum(pos, max(len(wd) - 1, 0))]
                                == ld) if len(wd) else np.zeros(len(ld), bool)
        return pa.table({"cluster_id": pa.array(lv[ok], pa.int64()),
                         "doc_id": pa.array(ld[ok], pa.int64()),
                         "n_words": pa.array(wv[pos[ok]], pa.int64())})

    def add_cluster_bucket(t: pa.Table) -> pa.Table:
        c = t.column("cluster_id").to_numpy().astype(np.uint64)
        return t.append_column("_cb", pa.array(
            (splitmix64(c) % np.uint64(n_buckets)).astype(np.int64)))

    def argmax_kernel(g: pa.Table) -> pa.Table:
        c = g.column("cluster_id").to_numpy()
        d = g.column("doc_id").to_numpy()
        w = g.column("n_words").to_numpy()
        order = np.lexsort((d, -w, c))       # per cluster: best first
        c, d, w = c[order], d[order], w[order]
        brk = np.empty(len(c), bool)
        if len(c):
            brk[0] = True
            brk[1:] = np.diff(c) != 0
        starts = np.flatnonzero(brk)
        sizes = np.diff(np.concatenate([starts, [len(c)]]))
        return pa.table({
            "cluster_id": pa.array(c[starts], pa.int64()),
            "keep_doc_id": pa.array(d[starts], pa.int64()),
            "keep_n_words": pa.array(w[starts], pa.int64()),
            "n_members": pa.array(sizes.astype(np.int64), pa.int64())})

    lens = docs.select_columns(["doc_id", "text"]).map_batches(
        word_counts, batch_format="pyarrow", batch_size=4096)
    labels = clusters.map_batches(label_rows, batch_format="pyarrow")
    joined = labels.union(lens).map_batches(
        add_doc_bucket, batch_format="pyarrow") \
        .groupby("_jb").map_groups(join_kernel, batch_format="pyarrow")
    return joined.map_batches(add_cluster_bucket, batch_format="pyarrow") \
        .groupby("_cb").map_groups(argmax_kernel, batch_format="pyarrow")


# ---------------------------------------------- cross-source overlap

class _SourceShingles(ShingleStage):
    """(shingle, source) rows, distinct per batch — the contamination
    matrix's pre-deduped exchange rows (final distinctness happens in
    the bucket kernel, where every copy of a (shingle, source) pair
    lands by construction)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        shingles, doc_idx, _ = self._shingles(batch.column("text"))
        if not len(shingles):
            return pa.table({"shingle": pa.array([], pa.string()),
                             "source": pa.array([], pa.string())})
        sde = batch.column("source").combine_chunks().dictionary_encode()
        s_idx = np.asarray(sde.indices).astype(np.int64)[doc_idx]
        de = shingles.dictionary_encode()
        codes = np.asarray(de.indices).astype(np.int64)
        nsrc = max(len(sde.dictionary), 1)
        upair = np.unique(codes * nsrc + s_idx)
        return pa.table({
            "shingle": de.dictionary.take(pa.array(upair // nsrc))
                                    .cast(pa.string()),
            "source": sde.dictionary.take(pa.array(upair % nsrc))
                                    .cast(pa.string())})


def source_overlap(ds: rd.Dataset, n: int = 3,
                   n_buckets: int = 256) -> pa.Table:
    """Cross-source contamination matrix: for every source pair, how
    many DISTINCT word-``n``-gram shingles the two sources share — the
    "is my web scrape leaking into my books corpus" diagnostic run
    before mixing training domains (the cross-split twin of
    :func:`bge_m3_onnx_ray.stages.decontam` benchmark contamination).
    Output (src_a, src_b, n_shared_shingles), src_a < src_b.

    Scale shape: batches emit per-batch-distinct (shingle, source) rows
    (never the text); ONE hash(shingle) bucket exchange makes them
    globally distinct and emits per-shingle source pairs fully
    vectorized — a shingle shared by s sources costs s(s-1)/2 pair
    increments, bounded by n_sources², NOT corpus size; each bucket
    returns at most n_sources² count rows and the driver merges
    n_buckets of those tiny tables. Assumes n_sources is dimension-like
    (≤ ~10³) — with more sources, bucket the pair space too."""
    from bge_m3_onnx_ray.hashing import P53, poly_hash

    rows = ds.select_columns(["source", "text"]).map_batches(
        task_stage(_SourceShingles, n=n), batch_format="pyarrow",
        batch_size=2048)

    def add_bucket(t: pa.Table) -> pa.Table:
        h = poly_hash(t.column("shingle"), P53)
        return t.append_column(
            "_bucket", pa.array((h % np.uint64(n_buckets)).astype(np.int64)))

    def kernel(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        empty = pa.table({"src_a": pa.array([], pa.string()),
                          "src_b": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        if not g.num_rows:
            return empty
        sh = g.column("shingle").combine_chunks().dictionary_encode()
        sc = g.column("source").combine_chunks().dictionary_encode()
        nsrc = max(len(sc.dictionary), 1)
        # re-code sources to LEXICOGRAPHIC ranks so (lo, hi) ordering
        # is by string, stable across buckets (dictionary codes are
        # first-appearance order and differ bucket to bucket)
        dic = np.asarray(sc.dictionary.to_pylist(), dtype=object)
        sorted_idx = np.argsort(dic.astype(str))
        remap = np.empty(nsrc, np.int64)
        remap[sorted_idx] = np.arange(nsrc)
        dic_sorted = dic[sorted_idx]
        key = np.asarray(sh.indices).astype(np.int64) * nsrc \
            + remap[np.asarray(sc.indices).astype(np.int64)]
        key = np.unique(key)                      # global distinctness
        shi, si = key // nsrc, key % nsrc
        starts = np.concatenate([[0], np.flatnonzero(np.diff(shi)) + 1])
        sizes = np.diff(np.concatenate([starts, [len(shi)]]))
        counts = np.zeros(nsrc * nsrc, np.int64)
        for s in np.unique(sizes):
            if s < 2:
                continue
            st = starts[sizes == s]
            ai, bi = np.triu_indices(int(s), k=1)
            pa_i = si[(st[:, None] + ai[None, :])].ravel()
            pb_i = si[(st[:, None] + bi[None, :])].ravel()
            lo = np.minimum(pa_i, pb_i)
            hi = np.maximum(pa_i, pb_i)
            np.add.at(counts, lo * nsrc + hi, 1)
        nz = np.flatnonzero(counts)
        if not len(nz):
            return empty
        return pa.table({
            "src_a": pa.array(dic_sorted[nz // nsrc].astype(str),
                              pa.string()),
            "src_b": pa.array(dic_sorted[nz % nsrc].astype(str),
                              pa.string()),
            "n": pa.array(counts[nz], pa.int64())})

    parts = rows.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("_bucket").map_groups(kernel, batch_format="pyarrow") \
        .to_pandas()
    if not len(parts):
        return pa.table({"src_a": pa.array([], pa.string()),
                         "src_b": pa.array([], pa.string()),
                         "n_shared_shingles": pa.array([], pa.int64())})
    out = parts.groupby(["src_a", "src_b"], as_index=False)["n"].sum() \
        .sort_values(["src_a", "src_b"]).reset_index(drop=True)
    return pa.table({
        "src_a": pa.array(out["src_a"], pa.string()),
        "src_b": pa.array(out["src_b"], pa.string()),
        "n_shared_shingles": pa.array(out["n"].to_numpy(), pa.int64())})


# ------------------------------------------------- triangle counting

def triangle_count(pairs: rd.Dataset, n_buckets: int = 256) -> pa.Table:
    """Exact triangle count of the undirected (doc_a < doc_b) pair
    graph — the density diagnostic for a near-dup graph (many triangles
    = tight template cliques that :func:`dup_clusters` will collapse;
    few = chains of borderline matches worth a higher threshold).
    Output one row (n_edges, n_wedges, n_triangles).

    The MapReduce node-iterator with degree orientation (Suri & Vassilvitskii
    2011, "Counting triangles and the curse of the last reducer"):
    orient every edge from its lower-(degree, id) endpoint to the
    higher one, so each out-neighborhood is O(sqrt(m)) and total wedge
    volume is O(m^1.5) REGARDLESS of skew — a star graph makes zero
    wedges at its hub. Stages, all bucketed exchanges: degree count →
    two large-side joins attaching endpoint degrees → per-source wedge
    explosion → wedge ⋈ edge membership, counted per bucket. The
    driver only ever sums n_buckets partial counts."""
    from bge_m3_onnx_ray.hashing import splitmix64
    from bge_m3_onnx_ray.stages._groups import bucket_reduce
    from bge_m3_onnx_ray.stages.relational import equi_join

    def endpoints(t: pa.Table) -> pa.Table:
        a = t.column("doc_a").to_numpy()
        b = t.column("doc_b").to_numpy()
        return pa.table({"node": pa.array(np.concatenate([a, b]),
                                          pa.int64())})

    # edges feeds THREE consumers (degree count, the join left side,
    # the membership side) and deg feeds two — materialize both, or Ray
    # re-executes the whole upstream (the pair-generation shuffle) per
    # consumer
    edges = pairs.select_columns(["doc_a", "doc_b"]).materialize()
    deg = bucket_reduce(
        edges.map_batches(endpoints, batch_format="pyarrow"),
        ["node"], [(None, "count", "deg")]).materialize()

    da = deg.map_batches(lambda t: pa.table(
        {"node": t.column("node"), "deg_a": t.column("deg")}),
        batch_format="pyarrow")
    db = deg.map_batches(lambda t: pa.table(
        {"node": t.column("node"), "deg_b": t.column("deg")}),
        batch_format="pyarrow")
    with_deg = equi_join(
        equi_join(edges, da, "doc_a", "node", ["deg_a"],
                  n_buckets=n_buckets),
        db, "doc_b", "node", ["deg_b"], n_buckets=n_buckets)

    def orient(t: pa.Table) -> pa.Table:
        a = t.column("doc_a").to_numpy()
        b = t.column("doc_b").to_numpy()
        dega = t.column("deg_a").to_numpy()
        degb = t.column("deg_b").to_numpy()
        # lower (deg, id) endpoint becomes the wedge source
        a_first = (dega < degb) | ((dega == degb) & (a < b))
        src = np.where(a_first, a, b)
        dst = np.where(a_first, b, a)
        h = splitmix64(src.astype(np.uint64)) % np.uint64(n_buckets)
        return pa.table({"src": pa.array(src, pa.int64()),
                         "dst": pa.array(dst, pa.int64()),
                         "_wb": pa.array(h.astype(np.int64))})

    oriented = with_deg.map_batches(orient, batch_format="pyarrow")

    def wedge_kernel(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        empty = pa.table({"a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64()),
                          "is_edge": pa.array([], pa.int64())})
        n = g.num_rows
        if n < 2:
            return empty
        order = pc.sort_indices(g, sort_keys=[("src", "ascending"),
                                              ("dst", "ascending")])
        tbl = g.take(order)
        src = tbl.column("src").to_numpy()
        dst = tbl.column("dst").to_numpy()
        starts = np.concatenate([[0], np.flatnonzero(np.diff(src)) + 1])
        sizes = np.diff(np.concatenate([starts, [n]]))
        out_a, out_b = [], []
        for s in np.unique(sizes):
            if s < 2:
                continue
            st = starts[sizes == s]
            ai, bi = np.triu_indices(int(s), k=1)
            v = dst[(st[:, None] + ai[None, :])].ravel()
            w = dst[(st[:, None] + bi[None, :])].ravel()
            out_a.append(np.minimum(v, w))
            out_b.append(np.maximum(v, w))
        if not out_a:
            return empty
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        return pa.table({"a": pa.array(a, pa.int64()),
                         "b": pa.array(b, pa.int64()),
                         "is_edge": pa.array(np.zeros(len(a), np.int64))})

    wedges = oriented.groupby("_wb").map_groups(
        wedge_kernel, batch_format="pyarrow")

    def edge_rows(t: pa.Table) -> pa.Table:
        a = t.column("doc_a").to_numpy()
        b = t.column("doc_b").to_numpy()
        return pa.table({"a": pa.array(a, pa.int64()),
                         "b": pa.array(b, pa.int64()),
                         "is_edge": pa.array(np.ones(len(a), np.int64))})

    tagged_edges = edges.map_batches(edge_rows, batch_format="pyarrow")

    def add_pair_bucket(t: pa.Table) -> pa.Table:
        k = splitmix64(t.column("a").to_numpy().astype(np.uint64)
                       * np.uint64(1_000_003)
                       + t.column("b").to_numpy().astype(np.uint64))
        return t.append_column("_pb", pa.array(
            (k % np.uint64(n_buckets)).astype(np.int64)))

    def count_kernel(g: pa.Table) -> pa.Table:
        is_e = g.column("is_edge").to_numpy()
        a = g.column("a").to_numpy()
        b = g.column("b").to_numpy()
        em = is_e == 1
        # pack (a, b) into one sortable int64 — requires ids < 2^31;
        # enforced, not assumed (beyond it, switch to a lexicographic
        # two-column searchsorted)
        if len(b) and b.max() >= (1 << 31):
            raise ValueError("triangle_count int64 pair packing needs "
                             "doc ids < 2^31")
        ek = a[em] * (1 << 31) + b[em]
        wk = a[~em] * (1 << 31) + b[~em]
        n_w = len(wk)
        if not len(ek) or not n_w:
            tri = 0
        else:
            ek = np.sort(ek)
            pos = np.minimum(np.searchsorted(ek, wk), len(ek) - 1)
            tri = int((ek[pos] == wk).sum())
        return pa.table({"n_wedges": pa.array([n_w], pa.int64()),
                         "n_triangles": pa.array([tri], pa.int64())})

    parts = wedges.union(tagged_edges) \
        .map_batches(add_pair_bucket, batch_format="pyarrow") \
        .groupby("_pb").map_groups(count_kernel, batch_format="pyarrow") \
        .to_pandas()
    return pa.table({
        "n_edges": pa.array([int(edges.count())], pa.int64()),
        "n_wedges": pa.array([int(parts["n_wedges"].sum())], pa.int64()),
        "n_triangles": pa.array([int(parts["n_triangles"].sum())],
                                pa.int64())})


# --------------------------------------------------------- PageRank

def pagerank(pairs: rd.Dataset, n_iter: int = 5,
             n_buckets: int = 128, weighted: bool = False) -> rd.Dataset:
    """Integer-exact PageRank over the undirected pair graph — "which
    document is the CENTER of its near-dup neighborhood" (a centrality
    prior for dedup representative selection beyond keep-longest).
    Output (doc_id, rank_q9) after ``n_iter`` power iterations.

    The recurrence is defined ON INTEGERS so two engines cannot drift:
    r_0(v) = 10^9; r_{t+1}(v) = 150_000_000 + Σ_{u→v} (850 · r_t(u))
    // (1000 · outdeg(u)) with both directions of every undirected
    edge; floor division is part of the SPEC (the DuckDB oracle runs
    the same recurrence as a recursive CTE — bit-equal at every
    iteration, no floats, no convergence tolerance). Dangling nodes
    cannot exist here (every node has an edge by construction).

    ``weighted=True`` uses the pairs' ``n_common`` column (shared-
    shingle count) as an integer edge weight: share(u→v) =
    (850 · r(u) · w(u,v)) // (1000 · W(u)) with W(u) = Σ out-weights —
    strong near-dup ties pull more rank mass than borderline ones,
    the edge-strength-aware representative prior. Still integer-exact
    and oracle-mirrored; w ≡ 1 degenerates to the unweighted spec.

    Runs on the bucketed BSP task engine
    (:mod:`bge_m3_onnx_ray.stages._bsp`): outdegrees and edges are
    co-partitioned by hash(node) ONCE; each iteration is two waves of
    per-bucket Ray tasks — contributions pre-summed per target inside
    the source bucket, then folded per target bucket — with integer
    sums (order-free, so any bucket count / interleaving is
    bit-identical). Why not groupby rounds: the iterative loop pays Ray
    Data's fixed per-execution cost 3x per iteration for a STABLE
    partition of static edges — measured 9.7 s → 0.12 s at sf0.01 for
    identical output. Partitioning contract: one bucket's nodes +
    out-edges fit one worker's heap; bucket count scales with the
    cluster. 10^9-scale ranks keep Σ contributions < 2^63 for graphs
    to ~10^9 nodes."""
    from bge_m3_onnx_ray.stages._bsp import pagerank_bsp
    if weighted:
        def both_w(t: pa.Table) -> pa.Table:
            a = t.column("doc_a").to_numpy()
            b = t.column("doc_b").to_numpy()
            w = t.column("n_common").to_numpy().astype(np.int64)
            return pa.table({
                "src": pa.array(np.concatenate([a, b]), pa.int64()),
                "dst": pa.array(np.concatenate([b, a]), pa.int64()),
                "w": pa.array(np.concatenate([w, w]), pa.int64())})
        edges = pairs.select_columns(["doc_a", "doc_b", "n_common"]) \
            .map_batches(both_w, batch_format="pyarrow").materialize()
    else:
        edges = pairs.select_columns(["doc_a", "doc_b"]).map_batches(
            _both_directions, batch_format="pyarrow").materialize()
    return pagerank_bsp(edges, n_iter, n_buckets)


def bfs_depth(pairs: rd.Dataset, max_rounds: int = 256) -> rd.Dataset:
    """BFS depth of every dup-graph node from its cluster REPRESENTATIVE
    (the component-min docID): how many near-dup hops separate a doc
    from the copy dedup keeps — 0 for the representative itself, 1 for
    its direct near-dups, deeper for chain-of-edits tails. Output
    (doc_id, cluster_id, depth).

    The min-plus fixpoint s(v) = min(v·2^20, min_{u~v} s(u)+1) over
    packed (root, dist) int64 states, run on the BSP task engine
    (O(diameter) rounds — pointer doubling would corrupt distances).
    Integer-exact; the DuckDB oracle unrolls the same recurrence a
    fixed number of steps, so both sides reach the identical fixpoint
    whenever the graph's diameter fits the unroll (the engine raises
    loudly past ``max_rounds`` instead of returning wrong depths)."""
    from bge_m3_onnx_ray.stages._bsp import minplus_bfs_bsp
    edges = pairs.select_columns(["doc_a", "doc_b"]).map_batches(
        _both_directions, batch_format="pyarrow").materialize()
    return minplus_bfs_bsp(edges, max_rounds, 1024)


def segment_dedup(ds: rd.Dataset, window: int = 8,
                  n_buckets: int = 64) -> rd.Dataset:
    """Segment-level exact dedup — the C4/RefinedWeb "remove duplicated
    lines across the corpus" step, on fixed ``window``-token segments
    (the corpus has no line structure; the op is granularity-agnostic).
    Every segment whose exact token run appears elsewhere keeps only its
    FIRST occurrence (min (doc_id, seg_idx) corpus-wide); docs are
    reassembled from their surviving segments. Output (doc_id, n_segs,
    n_dropped, clean_text) for every doc with >= 1 segment.

    Scale shape — three bucketed int64 exchanges, none keyed on text:
    1. winner per distinct segment: ``bucket_reduce`` min over the
       packed (doc_id << 16 | seg_idx) occurrence key, keyed by the
       106-bit segment content hash (16 B/row crosses, not segments);
    2. keep/drop: tagged union of segment rows and winners on a hash
       bucket, one searchsorted join per bucket (segment TEXT rides
       only this exchange, once);
    3. reassembly: hash(doc_id) buckets; per-bucket sort by (doc,
       seg_idx) and one vectorized ListArray + binary_join pass
       rebuilds clean_text — no per-doc Python loop."""
    import pyarrow.compute as pc

    from bge_m3_onnx_ray.hashing import P53, poly_hash, splitmix64
    from bge_m3_onnx_ray.stages._groups import bucket_reduce

    tok = DeterministicTokenizer()

    def segments(t: pa.Table) -> pa.Table:
        flat, offs = tok.batch_token_lists(t.column("text"))
        lens = np.diff(offs)
        nseg = (lens + window - 1) // window
        total = int(nseg.sum())
        empty = pa.table({"h1": pa.array([], pa.int64()),
                          "h2": pa.array([], pa.int64()),
                          "pack": pa.array([], pa.int64()),
                          "doc_id": pa.array([], pa.int64()),
                          "seg_idx": pa.array([], pa.int64()),
                          "seg": pa.array([], pa.string())})
        if total == 0:
            return empty
        if int(nseg.max()) >= (1 << 16):
            raise ValueError("doc exceeds 2^16 segments; raise the pack "
                             "width before indexing such documents")
        cum = np.zeros(len(nseg), np.int64)
        np.cumsum(nseg[:-1], out=cum[1:])
        seg_idx = np.arange(total, dtype=np.int64) - np.repeat(cum, nseg)
        starts = np.repeat(offs[:-1], nseg) + seg_idx * window
        bounds = np.append(starts, offs[-1]).astype(np.int64)
        lists = pa.LargeListArray.from_arrays(bounds, flat)
        segs = pc.binary_join(lists, pa.scalar(" ", pa.large_string()))
        h1 = poly_hash(segs, P53).astype(np.int64)
        h2 = poly_hash(segs, P53, base=np.uint64(257)).astype(np.int64)
        doc_ids = np.repeat(t.column("doc_id").to_numpy(), nseg)
        return pa.table({"h1": pa.array(h1),
                         "h2": pa.array(h2),
                         "pack": pa.array(doc_ids * 65536 + seg_idx),
                         "doc_id": pa.array(doc_ids, pa.int64()),
                         "seg_idx": pa.array(seg_idx, pa.int64()),
                         "seg": segs.cast(pa.string())})

    seg_ds = ds.select_columns(["doc_id", "text"]).map_batches(
        segments, batch_format="pyarrow").materialize()
    winners = bucket_reduce(
        seg_ds.select_columns(["h1", "h2", "pack"]),
        ["h1", "h2"], [("pack", "min", "win")], n_buckets)

    def tag_seg(t: pa.Table) -> pa.Table:
        h = t.column("h1").to_numpy().astype(np.uint64)
        return pa.table({
            "h1": t.column("h1"), "h2": t.column("h2"),
            "pack": t.column("pack"), "doc_id": t.column("doc_id"),
            "seg_idx": t.column("seg_idx"), "seg": t.column("seg"),
            "_side": pa.array(np.zeros(t.num_rows, np.int64)),
            "_jb": pa.array((splitmix64(h) % np.uint64(n_buckets))
                            .astype(np.int64))})

    def tag_win(t: pa.Table) -> pa.Table:
        h = t.column("h1").to_numpy().astype(np.uint64)
        return pa.table({
            "h1": t.column("h1"), "h2": t.column("h2"),
            "pack": t.column("win"),
            "doc_id": pa.array(np.zeros(t.num_rows, np.int64)),
            "seg_idx": pa.array(np.zeros(t.num_rows, np.int64)),
            "seg": pa.nulls(t.num_rows, pa.string()),
            "_side": pa.array(np.ones(t.num_rows, np.int64)),
            "_jb": pa.array((splitmix64(h) % np.uint64(n_buckets))
                            .astype(np.int64))})

    def keep_kernel(g: pa.Table) -> pa.Table:
        side = g.column("_side").to_numpy()
        h1 = g.column("h1").to_numpy()
        h2 = g.column("h2").to_numpy()
        pack = g.column("pack").to_numpy()
        sm, wm = side == 0, side == 1
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "seg_idx": pa.array([], pa.int64()),
                          "seg": pa.array([], pa.string()),
                          "kept": pa.array([], pa.int64())})
        if not sm.any():
            return empty
        wi = np.flatnonzero(wm)
        worder = np.lexsort((h2[wi], h1[wi]))
        wh1, wh2, wwin = h1[wi][worder], h2[wi][worder], pack[wi][worder]
        si = np.flatnonzero(sm)
        pos = np.searchsorted(wh1, h1[si])
        # winner exists for every segment by construction; resolve the
        # h1 run by scanning to the matching h2 (runs are collision-rare)
        pos = np.minimum(pos, len(wh1) - 1)
        bad = (wh1[pos] != h1[si]) | (wh2[pos] != h2[si])
        while bad.any():
            pos[bad] += 1
            pos = np.minimum(pos, len(wh1) - 1)
            nb = (wh1[pos] != h1[si]) | (wh2[pos] != h2[si])
            if nb[bad].all():
                raise AssertionError("segment winner missing in bucket")
            bad = nb
        kept = (pack[si] == wwin[pos]).astype(np.int64)
        return pa.table({
            "doc_id": g.column("doc_id").take(pa.array(si, pa.int64())),
            "seg_idx": g.column("seg_idx").take(pa.array(si, pa.int64())),
            "seg": g.column("seg").take(pa.array(si, pa.int64())),
            "kept": pa.array(kept, pa.int64())})

    marked = seg_ds.map_batches(tag_seg, batch_format="pyarrow").union(
        winners.map_batches(tag_win, batch_format="pyarrow")) \
        .groupby("_jb").map_groups(keep_kernel, batch_format="pyarrow")

    def doc_bucket(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy().astype(np.uint64)
        return t.append_column("_db", pa.array(
            (splitmix64(d) % np.uint64(n_buckets)).astype(np.int64)))

    def rebuild(g: pa.Table) -> pa.Table:
        doc = g.column("doc_id").to_numpy()
        idx = g.column("seg_idx").to_numpy()
        kept = g.column("kept").to_numpy()
        if not len(doc):
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_segs": pa.array([], pa.int64()),
                             "n_dropped": pa.array([], pa.int64()),
                             "clean_text": pa.array([], pa.string())})
        o = np.lexsort((idx, doc))
        doc, idx, kept = doc[o], idx[o], kept[o]
        segs = g.column("seg").take(pa.array(o, pa.int64()))
        first = np.concatenate([[0], np.flatnonzero(np.diff(doc)) + 1])
        counts = np.diff(np.concatenate([first, [len(doc)]]))
        nd = np.zeros(len(first), np.int64)
        np.add.at(nd, np.repeat(np.arange(len(first)), counts),
                  1 - kept)
        km = np.flatnonzero(kept == 1)
        kdoc = doc[km]
        ksegs = segs.take(pa.array(km, pa.int64())).cast(pa.large_string())
        if isinstance(ksegs, pa.ChunkedArray):
            ksegs = ksegs.combine_chunks()
        kb = np.searchsorted(kdoc, doc[first])      # kept-run starts
        bounds = np.append(kb, len(kdoc)).astype(np.int64)
        lists = pa.LargeListArray.from_arrays(bounds, ksegs)
        import pyarrow.compute as pc
        txt = pc.binary_join(lists, pa.scalar(" ", pa.large_string()))
        return pa.table({
            "doc_id": pa.array(doc[first], pa.int64()),
            "n_segs": pa.array(counts, pa.int64()),
            "n_dropped": pa.array(nd, pa.int64()),
            "clean_text": txt.cast(pa.string())})

    return marked.map_batches(doc_bucket, batch_format="pyarrow") \
        .groupby("_db").map_groups(rebuild, batch_format="pyarrow")
