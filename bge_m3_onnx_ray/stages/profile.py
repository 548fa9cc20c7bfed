"""Table profiling — per-column row/null/distinct counts and min/max,
the "what is in this 100 TB directory" first step of any data
pipeline.

Distributed shape: ONE streaming pass emits tiny per-batch partials
(counts + typed min/max, reduced on the driver: n_batches x n_cols
rows) plus a (col, hash-lane) stream for distincts; distinct counting
is two chained ``bucket_reduce`` exchanges moving 24-byte rows — the
values themselves never shuffle. Exact-distinct via a 106-bit two-lane
content hash, same convention (and same non-adversarial caveat) as
``stages.dedup.exact_dedup``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd


def profile_table(ds: rd.Dataset, columns: list[str]) -> pa.Table:
    """Profile ``columns`` of ``ds``. Returns one row per column:
    (col_name, n_rows, n_nulls, n_distinct, min_val, max_val) with
    min/max rendered as strings (numeric columns reduce numerically
    first — "9" < "72" holds). NULLs are excluded from distinct/min/max,
    matching SQL aggregate semantics."""
    import pyarrow.compute as pc

    from bge_m3_onnx_ray.hashing import P53, poly_hash, splitmix64
    from bge_m3_onnx_ray.stages._groups import bucket_reduce

    def partials(t: pa.Table) -> pa.Table:
        names, rows, nulls = [], [], []
        mins_i, maxs_i, mins_s, maxs_s = [], [], [], []
        for c in columns:
            col = t.column(c)
            names.append(c)
            rows.append(t.num_rows)
            nulls.append(int(pc.sum(pc.is_null(col)).as_py() or 0))
            mm = pc.min_max(col)         # skips nulls
            lo, hi = mm["min"].as_py(), mm["max"].as_py()
            if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
                mins_i.append(None); maxs_i.append(None)
                mins_s.append(lo); maxs_s.append(hi)
            else:
                mins_i.append(lo); maxs_i.append(hi)
                mins_s.append(None); maxs_s.append(None)
        return pa.table({"col_name": pa.array(names, pa.string()),
                         "n_rows": pa.array(rows, pa.int64()),
                         "n_nulls": pa.array(nulls, pa.int64()),
                         "min_i": pa.array(mins_i, pa.int64()),
                         "max_i": pa.array(maxs_i, pa.int64()),
                         "min_s": pa.array(mins_s, pa.string()),
                         "max_s": pa.array(maxs_s, pa.string())})

    def hash_rows(t: pa.Table) -> pa.Table:
        outs = []
        for ci, c in enumerate(columns):
            col = t.column(c).combine_chunks()
            valid = pc.is_valid(col)
            col = col.filter(valid)
            if not len(col):
                continue
            if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
                h1 = poly_hash(col, P53)
                h2 = poly_hash(col, P53, base=np.uint64(257))
            else:
                v = col.to_numpy(zero_copy_only=False).astype(np.uint64)
                h1 = splitmix64(v)
                h2 = splitmix64(v + np.uint64(0x9E3779B97F4A7C15))
            outs.append(pa.table({
                "col_name": pa.array([c] * len(col), pa.string()),
                "h1": pa.array(h1.astype(np.int64)),
                "h2": pa.array(h2.astype(np.int64))}))
        return (pa.concat_tables(outs) if outs else
                pa.table({"col_name": pa.array([], pa.string()),
                          "h1": pa.array([], pa.int64()),
                          "h2": pa.array([], pa.int64())}))

    src = ds.select_columns(columns)
    part = src.map_batches(partials, batch_format="pyarrow",
                           batch_size=8192).to_pandas()
    # exact distinct: (col, h1, h2) -> one row per distinct value, then
    # count rows per col — both exchanges carry only 24-byte rows
    uniq = bucket_reduce(
        src.map_batches(hash_rows, batch_format="pyarrow", batch_size=8192),
        ["col_name", "h1", "h2"], [(None, "count", "x")])
    nd = bucket_reduce(uniq, ["col_name"], [(None, "count", "n_distinct")],
                       n_buckets=8).to_pandas()

    out_rows = []
    for c in columns:
        g = part[part.col_name == c]
        if g["min_i"].notna().any():
            mn, mx = str(int(g["min_i"].min())), str(int(g["max_i"].max()))
        else:
            mn = g["min_s"].dropna().min()
            mx = g["max_s"].dropna().max()
        d = nd[nd.col_name == c]
        out_rows.append({
            "col_name": c,
            "n_rows": int(g["n_rows"].sum()),
            "n_nulls": int(g["n_nulls"].sum()),
            "n_distinct": int(d["n_distinct"].iloc[0]) if len(d) else 0,
            "min_val": mn, "max_val": mx})
    import pandas as pd
    return pa.Table.from_pandas(pd.DataFrame(out_rows),
                                preserve_index=False)


def corpus_diff(v1: rd.Dataset, v2: rd.Dataset,
                n_buckets: int = 64) -> rd.Dataset:
    """Dataset-versioning diff: which doc_ids were added, removed, or
    changed between two corpus versions (unchanged rows are omitted).
    'Changed' compares the 106-bit two-lane content hash, so the ONE
    hash-bucket exchange carries 32-byte rows — document bodies never
    shuffle. Output (doc_id, change) with change in
    {added, removed, changed}."""
    import pyarrow.compute as pc

    from bge_m3_onnx_ray.hashing import P53, poly_hash, splitmix64

    def tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            d = t.column("doc_id").to_numpy().astype(np.int64)
            h1 = poly_hash(t.column("text"), P53).astype(np.int64)
            h2 = poly_hash(t.column("text"), P53,
                           base=np.uint64(257)).astype(np.int64)
            return pa.table({
                "doc_id": pa.array(d, pa.int64()),
                "side": pa.array(np.full(len(d), side, np.int64)),
                "h1": pa.array(h1), "h2": pa.array(h2),
                "_db": pa.array((splitmix64(d.astype(np.uint64))
                                 % np.uint64(n_buckets)).astype(np.int64))})
        return fn

    def kernel(g: pa.Table) -> pa.Table:
        d = g.column("doc_id").to_numpy()
        s = g.column("side").to_numpy()
        h1 = g.column("h1").to_numpy()
        h2 = g.column("h2").to_numpy()
        order = np.lexsort((s, d))
        d, s, h1, h2 = d[order], s[order], h1[order], h2[order]
        n = len(d)
        if not n:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "change": pa.array([], pa.string())})
        brk = np.empty(n, bool)
        brk[0] = True
        brk[1:] = np.diff(d) != 0
        starts = np.flatnonzero(brk)
        sizes = np.diff(np.concatenate([starts, [n]]))
        lone = sizes == 1                     # present on one side only
        lone_d = d[starts[lone]]
        lone_c = np.where(s[starts[lone]] == 0, "removed", "added")
        both = starts[sizes == 2]             # sorted (side0, side1)
        chg = (h1[both] != h1[both + 1]) | (h2[both] != h2[both + 1])
        out_d = np.concatenate([lone_d, d[both[chg]]])
        out_c = np.concatenate([lone_c, np.full(int(chg.sum()), "changed",
                                                object)])
        return pa.table({"doc_id": pa.array(out_d.astype(np.int64),
                                            pa.int64()),
                         "change": pa.array(out_c.astype(str),
                                            pa.string())})

    a = v1.select_columns(["doc_id", "text"]).map_batches(
        tag(0), batch_format="pyarrow")
    b = v2.select_columns(["doc_id", "text"]).map_batches(
        tag(1), batch_format="pyarrow")
    return a.union(b).groupby("_db").map_groups(
        kernel, batch_format="pyarrow")
