"""Bucketed group-reduce — the many-distinct-keys replacement for
``Dataset.groupby(...).aggregate(...)``.

Ray's sort-based aggregate pays per-GROUP overhead (measured ~150 µs /
group on this host); with mostly-distinct keys (content hashes, vocab
terms, candidate pairs) that cost dwarfs the actual reduction — 172 s
for 1.13M groups whose real work is ~2 s. ``bucket_reduce`` shuffles on
a HASH BUCKET of the key instead (n_buckets groups total) and reduces
each bucket with one sort + ``reduceat`` pass, so the per-group cost is
vectorized away. A key hashes to exactly one bucket, so results equal
the plain groupby exactly. Float determinism: when a reduced column is
floating-point it is added to the sort keys, so ``sum`` accumulates in
(key, value)-sorted order — bit-deterministic per input multiset, not
merely up to Ray's shuffle arrival order.

``n_buckets`` needs only to exceed total_rows / target_rows_per_call;
it scales with cluster size at 100 TB, not with key cardinality.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

_OPS = {"sum", "min", "max", "count"}


def bucket_reduce(ds: rd.Dataset, key_cols: list[str],
                  reducers: list[tuple[str | None, str, str]],
                  n_buckets: int = 256) -> rd.Dataset:
    """``reducers``: (in_col, op, out_col) with op in sum|min|max|count
    (count ignores in_col). Output: key_cols + one column per reducer."""
    from bge_m3_onnx_ray.hashing import P53, poly_hash

    for _, op, _ in reducers:
        if op not in _OPS:
            raise ValueError(f"unsupported op {op!r}")
    in_cols = sorted({c for c, op, _ in reducers if op != "count"})

    def add_bucket(t: pa.Table) -> pa.Table:
        h = np.zeros(t.num_rows, np.uint64)
        for c in key_cols:
            col = t.column(c)
            if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
                v = poly_hash(col, P53)
            else:
                v = col.to_numpy().astype(np.uint64) % P53
            h = (h * np.uint64(131) + v) % P53
        return t.select([*key_cols, *in_cols]).append_column(
            "_rb", pa.array((h % np.uint64(n_buckets)).astype(np.int64)))

    def kernel(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        n = g.num_rows
        # float value columns join the sort keys: rows sharing a key then
        # reduce in value order, making float sums bit-deterministic (int
        # reductions are order-free; sorting them too would be wasted work)
        fcols = [c for c in in_cols if pa.types.is_floating(g.column(c).type)]
        order = pc.sort_indices(
            g, sort_keys=[(c, "ascending") for c in [*key_cols, *fcols]])
        tbl = g.take(order)
        change = np.zeros(max(n - 1, 0), bool)
        for c in key_cols:
            col = tbl.column(c).combine_chunks()
            change |= np.asarray(
                pc.not_equal(col.slice(1), col.slice(0, n - 1))
                .to_numpy(zero_copy_only=False))
        starts = np.concatenate([[0], np.flatnonzero(change) + 1])
        out = {c: tbl.column(c).take(pa.array(starts)) for c in key_cols}
        sizes = np.diff(np.concatenate([starts, [n]]))
        for in_col, op, out_col in reducers:
            if op == "count":
                out[out_col] = pa.array(sizes.astype(np.int64), pa.int64())
                continue
            v = tbl.column(in_col).to_numpy()
            red = {"sum": np.add, "min": np.minimum,
                   "max": np.maximum}[op].reduceat(v, starts)
            out[out_col] = pa.array(red)
        return pa.table(out)

    return ds.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("_rb").map_groups(kernel, batch_format="pyarrow")
