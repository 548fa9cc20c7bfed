"""Relational joins for pipeline plumbing.

The reference has no relational joins (SURVEY.md §2.5) — these exist
because a training-data pipeline constantly joins fact streams against
dimension tables. Two patterns, by side size:

- ``broadcast_join``: small side fits one worker → ``ray.put`` it once,
  map the big side with a vectorized lookup — no shuffle.
- ``bucket_join_agg``: BOTH sides large → tag rows, union, ONE shuffle
  keyed by a hash bucket of the join key, and a vectorized searchsorted
  kernel per bucket (the dedup.verify_jaccard join shape) that joins and
  pre-aggregates in the same pass, so only partial aggregates leave the
  shuffle. Nothing order-dependent: a key hashes to exactly one bucket.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Count, Sum


def broadcast_join(big: rd.Dataset, small_df: pd.DataFrame, key: str,
                   columns: list[str]) -> rd.Dataset:
    """Inner-join ``big`` against a driver-side small table on ``key``,
    appending ``columns``. Small side shipped once via the object store."""
    import ray

    ref = ray.put(small_df.set_index(key)[columns])

    def join_batch(batch: pa.Table) -> pa.Table:
        lookup: pd.DataFrame = ray.get(ref)
        keys = batch.column(key).to_numpy()
        idx = lookup.index.get_indexer(keys)
        keep = idx >= 0
        out = batch.filter(pa.array(keep))
        for c in columns:
            vals = lookup[c].to_numpy()[idx[keep]]
            out = out.append_column(c, pa.array(vals))
        return out

    return big.map_batches(join_batch, batch_format="pyarrow",
                           batch_size=65536)


def revenue_by_segment(sf_dir: str, n_buckets: int = 64) -> rd.Dataset:
    """TPC-H-flavored showcase: lineitem ⨝ orders ⨝ customer, revenue per
    market segment. Output (c_mktsegment, n_items, revenue_q0).

    Scale shape (the both-sides-large join the engine brief needs):
    customer→segment is the only broadcast (a dictionary-coded key/value
    pair, tiny); orders maps to (orderkey, segment-code) DISTRIBUTED, as
    a Ray stage — never materialized on the driver; the orders⨝lineitem
    join is ONE bucketed shuffle on hash(orderkey) with a searchsorted
    kernel per bucket that joins AND reduces to per-(bucket, segment)
    partial sums, so the shuffle output is ≤ n_segments rows per bucket.
    At 100 TB each side streams through the exchange once and no process
    ever holds a full table."""
    import os

    import ray
    import pyarrow.parquet as pq

    from bge_m3_onnx_ray.hashing import P53

    # --- the one true broadcast: customer→segment (sorted custkey +
    # int8 segment code; segment dictionary kept driver-side)
    cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey", "c_mktsegment"])
    seg_dict = cust.column("c_mktsegment").combine_chunks().dictionary_encode()
    seg_names = seg_dict.dictionary.to_pylist()
    ckeys = cust.column("c_custkey").to_numpy()
    order_c = np.argsort(ckeys)
    cust_ref = ray.put((ckeys[order_c],
                        np.asarray(seg_dict.indices).astype(np.int8)[order_c]))
    n_seg = len(seg_names)

    def bucket_of(keys: np.ndarray) -> np.ndarray:
        h = (keys.astype(np.uint64) % P53) * np.uint64(2654435761) % P53
        return (h % np.uint64(n_buckets)).astype(np.int64)

    # --- orders side, distributed: (orderkey, seg code) rows, tagged
    def orders_map(batch: pa.Table) -> pa.Table:
        ck, seg = ray.get(cust_ref)
        cust_k = batch.column("o_custkey").to_numpy()
        if len(ck):
            pos = np.minimum(np.searchsorted(ck, cust_k), len(ck) - 1)
            hit = ck[pos] == cust_k                 # inner-join semantics
        else:
            pos = np.zeros(len(cust_k), np.int64)
            hit = np.zeros(len(cust_k), bool)
        batch = batch.filter(pa.array(hit))
        ok = batch.column("o_orderkey").to_numpy()
        pos = pos[hit]
        return pa.table({
            "l_orderkey": pa.array(ok, pa.int64()),
            "seg": pa.array(seg[pos], pa.int8()),
            "revenue": pa.array(np.zeros(len(ok)), pa.float64()),
            "n_items": pa.array(np.zeros(len(ok), np.int64), pa.int64()),
            "_src": pa.array(np.zeros(len(ok), np.int8), pa.int8()),
            "_bucket": pa.array(bucket_of(ok), pa.int64())})

    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey"]).map_batches(
        orders_map, batch_format="pyarrow", batch_size=131072)

    # --- lineitem side: per-batch pre-aggregation to (orderkey, n, rev)
    # partials (avg ~4 items/order → the shuffle moves ~4x fewer rows)
    def line_partial(batch: pa.Table) -> pa.Table:
        ok = batch.column("l_orderkey").to_numpy()
        rev = batch.column("l_extendedprice").to_numpy() \
            * (1.0 - batch.column("l_discount").to_numpy())
        order = np.argsort(ok, kind="stable")
        ok, rev = ok[order], rev[order]
        starts = np.concatenate([[0], np.flatnonzero(np.diff(ok)) + 1])
        keys = ok[starts]
        return pa.table({
            "l_orderkey": pa.array(keys, pa.int64()),
            "seg": pa.array(np.zeros(len(keys), np.int8), pa.int8()),
            "revenue": pa.array(np.add.reduceat(rev, starts), pa.float64()),
            "n_items": pa.array(
                np.diff(np.concatenate([starts, [len(ok)]])).astype(np.int64),
                pa.int64()),
            "_src": pa.array(np.ones(len(keys), np.int8), pa.int8()),
            "_bucket": pa.array(bucket_of(keys), pa.int64())})

    line = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount"]).map_batches(
        line_partial, batch_format="pyarrow", batch_size=131072)

    # --- ONE shuffle: join + reduce per bucket, emitting ≤ n_seg rows
    def join_reduce(group: pa.Table) -> pa.Table:
        src = group.column("_src").to_numpy()
        keys = group.column("l_orderkey").to_numpy()
        om = src == 0
        okeys = keys[om]
        oseg = group.column("seg").to_numpy()[om]
        o = np.argsort(okeys)
        okeys, oseg = okeys[o], oseg[o]
        lkeys = keys[~om]
        rev = group.column("revenue").to_numpy()[~om]
        cnt = group.column("n_items").to_numpy()[~om]
        # revenue accumulates in (orderkey-sorted lineitem-partial) order
        # — deterministic enough under the q0 contract (integer dollars)
        lo = np.argsort(lkeys, kind="stable")
        lkeys, rev, cnt = lkeys[lo], rev[lo], cnt[lo]
        pos = np.searchsorted(okeys, lkeys)
        hit = pos < len(okeys)
        hit[hit] &= okeys[pos[hit]] == lkeys[hit]   # inner join semantics
        seg = oseg[pos[hit]].astype(np.int64)
        out_rev = np.bincount(seg, weights=rev[hit], minlength=n_seg)
        out_cnt = np.bincount(seg, weights=cnt[hit], minlength=n_seg)
        keep = out_cnt > 0
        return pa.table({
            "seg": pa.array(np.flatnonzero(keep).astype(np.int8), pa.int8()),
            "n_items": pa.array(out_cnt[keep].astype(np.int64), pa.int64()),
            "revenue": pa.array(out_rev[keep], pa.float64())})

    agg = orders.union(line).groupby("_bucket").map_groups(
        join_reduce, batch_format="pyarrow") \
        .groupby("seg").aggregate(Sum("n_items", alias_name="n_items"),
                                  Sum("revenue", alias_name="revenue"))

    def finalize(batch: pa.Table) -> pa.Table:
        # integer dollars (round-half-up): revenue terms lie on a 1e-4
        # decimal grid, so finer quantizations sit ON the grid and flip
        # under cross-engine summation noise
        rev = batch.column("revenue").to_numpy()
        segs = batch.column("seg").to_numpy()
        names = pa.array([seg_names[s] for s in segs], pa.string())
        return pa.table({
            "c_mktsegment": names,
            "n_items": batch.column("n_items"),
            "revenue_q0": pa.array(np.floor(rev + 0.5).astype(np.int64),
                                   pa.int64())})

    return agg.map_batches(finalize, batch_format="pyarrow")


def semi_anti_join(left: rd.Dataset, right: rd.Dataset, left_key: str,
                   right_key: str, anti: bool = False,
                   n_buckets: int = 64) -> rd.Dataset:
    """Distributed SEMI (``anti=False``) / ANTI (``anti=True``) join:
    keep left rows whose key does / does not appear in the right side —
    the EXISTS / NOT EXISTS shapes (TPC-H Q4/Q22). ONE shuffle keyed by
    a hash bucket of the join key; the right side ships only its
    (deduplicated-per-batch) int64 keys, the left side its full rows;
    each bucket resolves membership with one searchsorted. A key hashes
    to exactly one bucket, so results equal the relational semantics
    exactly."""
    from bge_m3_onnx_ray.hashing import splitmix64

    lschema = left.schema()
    left_pa = getattr(lschema, "base_schema", None) or pa.schema(
        [pa.field(n, t) for n, t in zip(lschema.names, lschema.types)])
    left_cols = list(left_pa.names)

    def tag_left(t: pa.Table) -> pa.Table:
        k = t.column(left_key).to_numpy().astype(np.uint64)
        return t.append_column("_side", pa.array(
            np.zeros(t.num_rows, np.int64))).append_column(
            "_jb", pa.array((splitmix64(k) % np.uint64(n_buckets))
                            .astype(np.int64)))

    def tag_right(t: pa.Table) -> pa.Table:
        # per-batch dedup: only distinct keys cross the exchange
        k = np.unique(t.column(right_key).to_numpy().astype(np.int64))
        out = {c: pa.nulls(len(k), left_pa.field(c).type)
               for c in left_cols}
        out[left_key] = pa.array(k, pa.int64())
        out["_side"] = pa.array(np.ones(len(k), np.int64))
        out["_jb"] = pa.array((splitmix64(k.astype(np.uint64))
                               % np.uint64(n_buckets)).astype(np.int64))
        return pa.table(out)

    def kernel(g: pa.Table) -> pa.Table:
        side = g.column("_side").to_numpy()
        keys = g.column(left_key).to_numpy(zero_copy_only=False)
        rk = np.unique(keys[side == 1])
        lrows = np.flatnonzero(side == 0)
        if len(rk):
            pos = np.searchsorted(rk, keys[lrows])
            hit = (pos < len(rk)) & (rk[np.minimum(pos, len(rk) - 1)]
                                     == keys[lrows])
        else:
            hit = np.zeros(len(lrows), bool)
        keep = lrows[~hit] if anti else lrows[hit]
        return g.take(pa.array(keep, pa.int64())).select(left_cols)

    lt = left.map_batches(tag_left, batch_format="pyarrow")
    rt = right.select_columns([right_key]).map_batches(
        tag_right, batch_format="pyarrow")
    return lt.union(rt).groupby("_jb").map_groups(
        kernel, batch_format="pyarrow")


def equi_join(left: rd.Dataset, right: rd.Dataset, left_key: str,
              right_key: str, right_cols: list[str],
              n_buckets: int = 64) -> rd.Dataset:
    """Row-materializing INNER equi-join of two large tables — the
    general shape (``bucket_join_agg`` covers join+aggregate;
    ``semi_anti_join`` covers membership; this one emits the joined
    rows). ONE shuffle keyed by a hash bucket of the join key; each
    bucket sorts the (deduplicated-per-key) right side once and gathers
    matches with a searchsorted, so multiplicity comes from the LEFT
    side only when the right key is unique — duplicate right keys fan
    out via the standard run-expansion. Left columns pass through,
    ``right_cols`` are appended."""
    from bge_m3_onnx_ray.hashing import splitmix64

    lschema = left.schema()
    left_pa = getattr(lschema, "base_schema", None) or pa.schema(
        [pa.field(n, t) for n, t in zip(lschema.names, lschema.types)])
    left_cols = list(left_pa.names)
    rschema = right.schema()
    right_pa = getattr(rschema, "base_schema", None) or pa.schema(
        [pa.field(n, t) for n, t in zip(rschema.names, rschema.types)])
    all_cols = left_cols + right_cols

    def tag_left(t: pa.Table) -> pa.Table:
        k = t.column(left_key).to_numpy().astype(np.uint64)
        out = {c: t.column(c) for c in left_cols}
        for c in right_cols:
            out[c] = pa.nulls(t.num_rows, right_pa.field(c).type)
        out["_k"] = t.column(left_key).cast(pa.int64())
        out["_side"] = pa.array(np.zeros(t.num_rows, np.int64))
        out["_jb"] = pa.array((splitmix64(k) % np.uint64(n_buckets))
                              .astype(np.int64))
        return pa.table(out)

    def tag_right(t: pa.Table) -> pa.Table:
        k = t.column(right_key).to_numpy().astype(np.uint64)
        out = {c: pa.nulls(t.num_rows, left_pa.field(c).type)
               for c in left_cols}
        for c in right_cols:
            out[c] = t.column(c)
        out["_k"] = t.column(right_key).cast(pa.int64())
        out["_side"] = pa.array(np.ones(t.num_rows, np.int64))
        out["_jb"] = pa.array((splitmix64(k) % np.uint64(n_buckets))
                              .astype(np.int64))
        return pa.table(out)

    def kernel(g: pa.Table) -> pa.Table:
        side = g.column("_side").to_numpy()
        keys = g.column("_k").to_numpy()
        lrows = np.flatnonzero(side == 0)
        rrows = np.flatnonzero(side == 1)
        if not len(lrows) or not len(rrows):
            return g.take(pa.array([], pa.int64())).select(all_cols)
        rk = keys[rrows]
        order = np.argsort(rk, kind="stable")
        rk_s, rrows_s = rk[order], rrows[order]
        # run boundaries of the sorted right keys
        starts = np.concatenate([[0], np.flatnonzero(np.diff(rk_s)) + 1])
        run_key = rk_s[starts]
        run_len = np.diff(np.concatenate([starts, [len(rk_s)]]))
        pos = np.searchsorted(run_key, keys[lrows])
        ok = (pos < len(run_key)) & (run_key[np.minimum(
            pos, len(run_key) - 1)] == keys[lrows])
        li = lrows[ok]
        pi = pos[ok]
        # fan out left rows across duplicate right keys (run expansion)
        reps = run_len[pi]
        l_take = np.repeat(li, reps)
        offs = np.concatenate([[0], np.cumsum(reps)[:-1]])
        r_take = rrows_s[np.repeat(starts[pi], reps)
                         + (np.arange(int(reps.sum())) - np.repeat(offs, reps))]
        lt = g.take(pa.array(l_take, pa.int64())).select(left_cols)
        rt = g.take(pa.array(r_take, pa.int64())).select(right_cols)
        return pa.table({**{c: lt.column(c) for c in left_cols},
                         **{c: rt.column(c) for c in right_cols}})

    lt = left.map_batches(tag_left, batch_format="pyarrow")
    rt = right.map_batches(tag_right, batch_format="pyarrow")
    return lt.union(rt).groupby("_jb").map_groups(
        kernel, batch_format="pyarrow")


def customer_order_distribution(sf_dir: str) -> pa.Table:
    """TPC-H Q13 shape: the distribution of orders-per-customer,
    INCLUDING zero-order customers (the part a plain inner join loses —
    this is the canonical LEFT OUTER JOIN + double GROUP BY). Composed
    entirely from existing primitives: per-customer order counts via
    ``bucket_reduce`` (one exchange of (custkey, partial) int rows),
    zero-order customers via :func:`semi_anti_join` (anti), and a tiny
    final count-of-counts. Output (c_count, n_customers) sorted by
    c_count."""
    import os

    from bge_m3_onnx_ray.stages._groups import bucket_reduce

    orders = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                             columns=["o_custkey"])
    cust = rd.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                           columns=["c_custkey"])
    # exchange 1: per-customer counts; exchange 2: count-of-counts —
    # both distributed, the driver only sees the tiny final histogram
    per_cust = bucket_reduce(orders, ["o_custkey"],
                             [(None, "count", "c_count")])
    dist = bucket_reduce(per_cust, ["c_count"],
                         [(None, "count", "n_customers")],
                         n_buckets=8).to_pandas()
    zero = semi_anti_join(cust, orders, "c_custkey", "o_custkey",
                          anti=True).count()
    if zero:
        import pandas as pd
        dist = pd.concat([dist, pd.DataFrame(
            [{"c_count": 0, "n_customers": zero}])], ignore_index=True)
    dist = dist.sort_values("c_count").reset_index(drop=True)
    dist["c_count"] = dist["c_count"].astype("int64")
    dist["n_customers"] = dist["n_customers"].astype("int64")
    return pa.Table.from_pandas(dist, preserve_index=False)
