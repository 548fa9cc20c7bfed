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
        if not len(li):      # both sides present, zero key overlap
            return g.take(pa.array([], pa.int64())).select(all_cols)
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


def pricing_summary(sf_dir: str, cutoff: str = "2000-09-02") -> pa.Table:
    """TPC-H Q1 shape: the pricing-summary report — per (returnflag,
    linestatus) sums/averages of quantity, price, discounted price and
    charge over lineitems shipped on or before ``cutoff``.

    Exactness contract: every money/rate column in the table sits on a
    0.01 grid, so all arithmetic runs in INTEGER cents —
    ``disc_price = price_c·(100−disc_c)`` (units 1e-4 $),
    ``charge = price_c·(100−disc_c)·(100+tax_c)`` (units 1e-6 $) — and
    the averages are integer floor divisions. Bit-identical to the SQL
    mirror with no float summation anywhere.

    Scale shape: a six-group aggregate — per-batch sort+reduceat partials
    over a tiny composite code, one six-row ``groupby``; the shuffle
    moves ≤ 6 rows per block regardless of corpus size. The shipdate
    predicate is pushed into the parquet read.
    """
    import os

    import pyarrow.dataset as pads

    cut = pa.scalar(np.datetime64(cutoff + "T23:59:59.999999"),
                    pa.timestamp("us"))
    cols = ["l_returnflag", "l_linestatus", "l_quantity",
            "l_extendedprice", "l_discount", "l_tax"]
    ds = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                         columns=cols,
                         filter=(pads.field("l_shipdate") <= cut))

    FLAGS = ["A", "N", "R"]
    STATS = ["F", "O"]

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        rf = pc.index_in(batch.column("l_returnflag"),
                         pa.array(FLAGS)).to_numpy().astype(np.int64)
        ls = pc.index_in(batch.column("l_linestatus"),
                         pa.array(STATS)).to_numpy().astype(np.int64)
        code = rf * len(STATS) + ls
        qty_c = np.rint(batch.column("l_quantity").to_numpy() * 100
                        ).astype(np.int64)
        price_c = np.rint(batch.column("l_extendedprice").to_numpy() * 100
                          ).astype(np.int64)
        disc_c = np.rint(batch.column("l_discount").to_numpy() * 100
                         ).astype(np.int64)
        tax_c = np.rint(batch.column("l_tax").to_numpy() * 100
                        ).astype(np.int64)
        disc_price = price_c * (100 - disc_c)
        charge = disc_price * (100 + tax_c)
        # int64 sums segment-by-segment (bincount weights would round-trip
        # through float64, losing exactness above 2^53 per batch)
        order = np.argsort(code, kind="stable")
        code_s = code[order]
        starts = np.concatenate(
            [[0], np.flatnonzero(np.diff(code_s)) + 1]) \
            if len(code_s) else np.array([], np.int64)
        out = {"code": code_s[starts] if len(code_s) else
               np.array([], np.int64)}
        for name, vals in (("sum_qty_q2", qty_c),
                           ("sum_base_price_q2", price_c),
                           ("sum_disc_price_q4", disc_price),
                           ("sum_charge_q6", charge),
                           ("sum_disc_q2", disc_c)):
            v = vals[order]
            out[name] = np.add.reduceat(v, starts) if len(v) else \
                np.array([], np.int64)
        out["count_order"] = np.diff(np.concatenate(
            [starts, [len(code_s)]])) if len(code_s) else \
            np.array([], np.int64)
        return pa.table({k: pa.array(np.asarray(v), pa.int64())
                         for k, v in out.items()})

    agg = ds.map_batches(partial, batch_format="pyarrow",
                         batch_size=131072).groupby("code").aggregate(
        Sum("sum_qty_q2", alias_name="sum_qty_q2"),
        Sum("sum_base_price_q2", alias_name="sum_base_price_q2"),
        Sum("sum_disc_price_q4", alias_name="sum_disc_price_q4"),
        Sum("sum_charge_q6", alias_name="sum_charge_q6"),
        Sum("sum_disc_q2", alias_name="sum_disc_q2"),
        Sum("count_order", alias_name="count_order")).to_pandas()

    agg = agg.sort_values("code").reset_index(drop=True)
    code = agg["code"].to_numpy()
    n = agg["count_order"].to_numpy().astype(np.int64)
    out = pa.table({
        "l_returnflag": pa.array([FLAGS[c // len(STATS)] for c in code]),
        "l_linestatus": pa.array([STATS[c % len(STATS)] for c in code]),
        "sum_qty_q2": pa.array(agg["sum_qty_q2"], pa.int64()),
        "sum_base_price_q2": pa.array(agg["sum_base_price_q2"], pa.int64()),
        "sum_disc_price_q4": pa.array(agg["sum_disc_price_q4"], pa.int64()),
        "sum_charge_q6": pa.array(agg["sum_charge_q6"], pa.int64()),
        "avg_qty_q6": pa.array(
            agg["sum_qty_q2"].to_numpy() * 10000 // n, pa.int64()),
        "avg_price_q6": pa.array(
            agg["sum_base_price_q2"].to_numpy() * 10000 // n, pa.int64()),
        "avg_disc_q6": pa.array(
            agg["sum_disc_q2"].to_numpy() * 10000 // n, pa.int64()),
        "count_order": pa.array(n, pa.int64())})
    return out


def shipping_priority_topk(sf_dir: str, segment: str = "BUILDING",
                           date: str = "1998-07-01", k: int = 10,
                           n_buckets: int = 64) -> pa.Table:
    """TPC-H Q3 shape: top-k unshipped orders by revenue for one market
    segment — customer ⋉ orders ⨝ lineitem with date predicates on both
    fact tables. Output (l_orderkey, revenue_q4, o_orderdate,
    o_orderpriority), revenue desc / orderkey asc, first ``k``.

    Composition of the repo's own join primitives, all distributed:
    segment customers filter orders via :func:`semi_anti_join` (the
    right side ships deduplicated int64 keys only — a segment is ~1/5th
    of all customers, far too big to broadcast at 100 TB); lineitem
    pre-aggregates per-batch to (orderkey, revenue-cents) partials; ONE
    further hash(orderkey) bucket exchange joins the two and keeps a
    per-bucket top-k, so the driver merges ≤ k·n_buckets tiny rows.
    Revenue is exact integer arithmetic: Σ price_c·(100−disc_c), units
    1e-4 dollars (same contract as :func:`pricing_summary`).
    """
    import os

    import pyarrow.dataset as pads

    from bge_m3_onnx_ray.hashing import splitmix64

    cut = pa.scalar(np.datetime64(date + "T00:00:00", "us"),
                    pa.timestamp("us"))

    cust = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey"],
        filter=(pads.field("c_mktsegment") == segment))
    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate",
                 "o_orderpriority"],
        filter=(pads.field("o_orderdate") < cut))
    orders_seg = semi_anti_join(orders, cust, "o_custkey", "c_custkey",
                                n_buckets=n_buckets)

    def line_partial(batch: pa.Table) -> pa.Table:
        ok = batch.column("l_orderkey").to_numpy()
        price_c = np.rint(batch.column("l_extendedprice").to_numpy() * 100
                          ).astype(np.int64)
        disc_c = np.rint(batch.column("l_discount").to_numpy() * 100
                         ).astype(np.int64)
        rev = price_c * (100 - disc_c)
        order = np.argsort(ok, kind="stable")
        ok, rev = ok[order], rev[order]
        starts = np.concatenate([[0], np.flatnonzero(np.diff(ok)) + 1]) \
            if len(ok) else np.array([], np.int64)
        keys = ok[starts] if len(ok) else np.array([], np.int64)
        sums = np.add.reduceat(rev, starts) if len(ok) else \
            np.array([], np.int64)
        return pa.table({
            "o_orderkey": pa.array(keys, pa.int64()),
            "revenue_q4": pa.array(sums, pa.int64()),
            "o_orderdate": pa.nulls(len(keys), pa.timestamp("us")),
            "o_orderpriority": pa.nulls(len(keys), pa.string()),
            "_side": pa.array(np.ones(len(keys), np.int64)),
            "_jb": pa.array((splitmix64(keys.astype(np.uint64))
                             % np.uint64(n_buckets)).astype(np.int64))})

    line = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=(pads.field("l_shipdate") > cut)).map_batches(
        line_partial, batch_format="pyarrow", batch_size=131072)

    def orders_tag(batch: pa.Table) -> pa.Table:
        okeys = batch.column("o_orderkey").to_numpy()
        return pa.table({
            "o_orderkey": batch.column("o_orderkey").cast(pa.int64()),
            "revenue_q4": pa.array(np.zeros(len(okeys), np.int64)),
            "o_orderdate": batch.column("o_orderdate"),
            "o_orderpriority": batch.column("o_orderpriority"),
            "_side": pa.array(np.zeros(len(okeys), np.int64)),
            "_jb": pa.array((splitmix64(okeys.astype(np.uint64))
                             % np.uint64(n_buckets)).astype(np.int64))})

    tagged = orders_seg.map_batches(orders_tag, batch_format="pyarrow")

    def join_topk(g: pa.Table) -> pa.Table:
        side = g.column("_side").to_numpy()
        keys = g.column("o_orderkey").to_numpy(zero_copy_only=False)
        om = side == 0
        orows = np.flatnonzero(om)
        empty = pa.table({
            "l_orderkey": pa.array([], pa.int64()),
            "revenue_q4": pa.array([], pa.int64()),
            "o_orderdate_s": pa.array([], pa.int64()),
            "o_orderpriority": pa.array([], pa.string())})
        if not len(orows):
            return empty
        okeys = keys[orows]
        oo = np.argsort(okeys, kind="stable")
        okeys_s, orows_s = okeys[oo], orows[oo]
        lkeys = keys[~om]
        lrev = g.column("revenue_q4").to_numpy()[~om]
        pos = np.searchsorted(okeys_s, lkeys)
        hit = (pos < len(okeys_s))
        hit[hit] &= okeys_s[np.minimum(pos[hit], len(okeys_s) - 1)] \
            == lkeys[hit]
        rev = np.zeros(len(okeys_s), np.int64)
        np.add.at(rev, pos[hit], lrev[hit])
        nz = rev > 0
        if not nz.any():
            return empty
        cand = np.flatnonzero(nz)
        # per-bucket top-k (revenue desc, orderkey asc): lexsort on
        # (-rev, okey) — both int64, fully deterministic
        o2 = np.lexsort((okeys_s[cand], -rev[cand]))[:k]
        pick = cand[o2]
        out = g.take(pa.array(orows_s[pick], pa.int64()))
        # epoch seconds, not raw timestamps: the driver's value-hash
        # compares integers identically across engines
        odate = out.column("o_orderdate").cast(pa.int64())
        odate_s = pa.array(odate.to_numpy(zero_copy_only=False) // 1_000_000,
                           pa.int64())
        return pa.table({
            "l_orderkey": out.column("o_orderkey"),
            "revenue_q4": pa.array(rev[pick], pa.int64()),
            "o_orderdate_s": odate_s,
            "o_orderpriority": out.column("o_orderpriority")})

    parts = tagged.union(line).groupby("_jb").map_groups(
        join_topk, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(
        ["revenue_q4", "l_orderkey"], ascending=[False, True]
    ).head(k).reset_index(drop=True)
    return pa.Table.from_pandas(parts, preserve_index=False)


def local_supplier_volume(sf_dir: str, region: str = "ASIA",
                          date_from: str = "1996-01-01",
                          date_to: str = "1997-01-01",
                          n_buckets: int = 64) -> pa.Table:
    """TPC-H Q5 shape: revenue per nation from lineitems where the
    CUSTOMER and the SUPPLIER sit in the same nation of one region,
    within an order-date year — the six-table join (customer ⨝ orders
    ⨝ lineitem ⨝ supplier ⨝ nation ⨝ region). Output
    (n_name, revenue_q4), revenue in exact 1e-4-dollar integers (the
    :func:`pricing_summary` contract).

    Scale shape, table by table: region/nation are constant-size (5/25
    rows at ANY scale factor) — driver-resolved; supplier is the
    classic broadcast dimension (suppkey → nationkey, two ints/row,
    resolved inside the lineitem map so the fact table never shuffles
    for it); customer⨝orders picks its join by parquet-footer stats —
    a broadcast custkey→nationkey lookup while customer fits a worker
    (≤8M keys), else a true both-sides-large :func:`equi_join` (ONE
    hash(custkey) exchange, date-pruned orders at the read); the
    joined (orderkey, c_nationkey) stream then meets
    per-batch pre-aggregated lineitem partials — (orderkey, s_nation,
    cents) rows, supplier already resolved and non-region suppliers
    dropped — in ONE further hash(orderkey) exchange whose kernel joins,
    applies the c_nation == s_nation equality, and reduces to
    ≤ n_nations rows per bucket. No stage materializes a fact table."""
    import os

    import ray
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    from bge_m3_onnx_ray.hashing import splitmix64

    # --- constant-size dimensions, driver-side
    reg = pq.read_table(os.path.join(sf_dir, "region.parquet"))
    rkeys = {k for k, name in zip(reg.column("r_regionkey").to_pylist(),
                                  reg.column("r_name").to_pylist())
             if name == region}
    nat = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    nat_name = {}
    for nk, nn, nr in zip(nat.column("n_nationkey").to_pylist(),
                          nat.column("n_name").to_pylist(),
                          nat.column("n_regionkey").to_pylist()):
        if nr in rkeys:
            nat_name[nk] = nn
    nat_keys = sorted(nat_name)

    # --- supplier: the broadcast dimension (suppkey -> nationkey,
    # region nations only), shipped once via the object store
    sup = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                        columns=["s_suppkey", "s_nationkey"])
    skeys = sup.column("s_suppkey").to_numpy()
    snat = sup.column("s_nationkey").to_numpy()
    in_region = np.isin(snat, nat_keys)
    order = np.argsort(skeys[in_region])
    sup_ref = ray.put((skeys[in_region][order], snat[in_region][order]))

    # --- customer ⨝ orders: ADAPTIVE join selection on parquet stats
    # (footer row count — zero data read). Below the broadcast bound the
    # region-filtered custkey→nationkey map ships once via the object
    # store and the join happens inside the orders scan (what a planner
    # picks for a dimension-sized build side); past it, the both-sides-
    # large hash(custkey) exchange (:func:`equi_join`) takes over. 8M
    # keys ≈ 128 MB of int64 pairs — comfortably one worker's heap.
    cut0 = pa.scalar(np.datetime64(date_from + "T00:00:00", "us"),
                     pa.timestamp("us"))
    cut1 = pa.scalar(np.datetime64(date_to + "T00:00:00", "us"),
                     pa.timestamp("us"))
    cust_path = os.path.join(sf_dir, "customer.parquet")
    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey"],
        filter=(pads.field("o_orderdate") >= cut0)
               & (pads.field("o_orderdate") < cut1))
    broadcast_cust = pq.ParquetFile(cust_path).metadata.num_rows <= 8_000_000
    if broadcast_cust:
        ct = pq.read_table(cust_path, columns=["c_custkey", "c_nationkey"],
                           filters=[("c_nationkey", "in", nat_keys)])
        ck = ct.column("c_custkey").to_numpy()
        cn = ct.column("c_nationkey").to_numpy().astype(np.int64)
        co = np.argsort(ck)
        cust_ref = ray.put((ck[co], cn[co]))

        def resolve_nation(t: pa.Table) -> pa.Table:
            ckk, cnn = ray.get(cust_ref)
            ocust = t.column("o_custkey").to_numpy()
            if not len(ckk):
                return pa.table({"o_orderkey": pa.array([], pa.int64()),
                                 "c_nationkey": pa.array([], pa.int64())})
            pos = np.minimum(np.searchsorted(ckk, ocust), len(ckk) - 1)
            hit = ckk[pos] == ocust          # drops non-region customers
            return pa.table({
                "o_orderkey": t.column("o_orderkey").filter(pa.array(hit)),
                "c_nationkey": pa.array(cnn[pos[hit]], pa.int64())})

        ord_nat = orders.map_batches(resolve_nation, batch_format="pyarrow")
    else:
        cust = rd.read_parquet(
            cust_path, columns=["c_custkey", "c_nationkey"],
            filter=pads.field("c_nationkey").isin(nat_keys))
        ord_nat = equi_join(orders, cust, "o_custkey", "c_custkey",
                            ["c_nationkey"], n_buckets=n_buckets)

    def orders_tag(t: pa.Table) -> pa.Table:
        ok = t.column("o_orderkey").to_numpy()
        return pa.table({
            "k": pa.array(ok, pa.int64()),
            "nat": t.column("c_nationkey").cast(pa.int64()),
            "rev": pa.array(np.zeros(len(ok), np.int64)),
            "_side": pa.array(np.zeros(len(ok), np.int64)),
            "_jb": pa.array((splitmix64(ok.astype(np.uint64))
                             % np.uint64(n_buckets)).astype(np.int64))})

    # --- lineitem partials: supplier resolved via the broadcast, exact
    # cents, pre-aggregated per (orderkey, s_nation) before the exchange
    def line_partial(batch: pa.Table) -> pa.Table:
        sk, sn = ray.get(sup_ref)
        lsk = batch.column("l_suppkey").to_numpy()
        empty = pa.table({"k": pa.array([], pa.int64()),
                          "nat": pa.array([], pa.int64()),
                          "rev": pa.array([], pa.int64()),
                          "_side": pa.array([], pa.int64()),
                          "_jb": pa.array([], pa.int64())})
        if not len(sk):
            return empty
        pos = np.minimum(np.searchsorted(sk, lsk), len(sk) - 1)
        hit = sk[pos] == lsk                  # drops non-region suppliers
        if not hit.any():
            return empty
        ok = batch.column("l_orderkey").to_numpy()[hit]
        nat_l = sn[pos[hit]].astype(np.int64)
        price_c = np.rint(batch.column("l_extendedprice").to_numpy()[hit]
                          * 100).astype(np.int64)
        disc_c = np.rint(batch.column("l_discount").to_numpy()[hit]
                         * 100).astype(np.int64)
        rev = price_c * (100 - disc_c)
        o = np.lexsort((nat_l, ok))
        ok, nat_l, rev = ok[o], nat_l[o], rev[o]
        change = (np.diff(ok) != 0) | (np.diff(nat_l) != 0)
        starts = np.concatenate([[0], np.flatnonzero(change) + 1])
        keys = ok[starts]
        return pa.table({
            "k": pa.array(keys, pa.int64()),
            "nat": pa.array(nat_l[starts], pa.int64()),
            "rev": pa.array(np.add.reduceat(rev, starts), pa.int64()),
            "_side": pa.array(np.ones(len(keys), np.int64)),
            "_jb": pa.array((splitmix64(keys.astype(np.uint64))
                             % np.uint64(n_buckets)).astype(np.int64))})

    line = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                 "l_discount"]).map_batches(
        line_partial, batch_format="pyarrow", batch_size=131072)

    max_nat = (max(nat_keys) + 1) if nat_keys else 1

    def join_reduce(g: pa.Table) -> pa.Table:
        side = g.column("_side").to_numpy()
        keys = g.column("k").to_numpy()
        nats = g.column("nat").to_numpy()
        om = side == 0
        okeys, onat = keys[om], nats[om]
        o = np.argsort(okeys, kind="stable")
        okeys, onat = okeys[o], onat[o]
        lkeys = keys[~om]
        lnat = nats[~om]
        lrev = g.column("rev").to_numpy()[~om]
        empty = pa.table({"n_nationkey": pa.array([], pa.int64()),
                          "revenue_q4": pa.array([], pa.int64())})
        if not len(okeys) or not len(lkeys):
            return empty
        pos = np.minimum(np.searchsorted(okeys, lkeys), len(okeys) - 1)
        hit = (okeys[pos] == lkeys) & (onat[pos] == lnat)  # local-supplier
        if not hit.any():
            return empty
        out = np.zeros(max_nat, np.int64)
        np.add.at(out, lnat[hit], lrev[hit])
        nz = np.flatnonzero(out)
        return pa.table({"n_nationkey": pa.array(nz, pa.int64()),
                         "revenue_q4": pa.array(out[nz], pa.int64())})

    tagged = ord_nat.map_batches(orders_tag, batch_format="pyarrow")
    agg = tagged.union(line).groupby("_jb").map_groups(
        join_reduce, batch_format="pyarrow")

    # join_reduce emits <= n_nations rows PER BUCKET (it reduces to the
    # nation histogram inside the kernel), so the driver sees at most
    # n_buckets x 25 rows at ANY scale factor — sum + sort here instead
    # of paying a Ray sort-aggregate's all-to-all fixed cost for a
    # bounded-size table
    out = agg.to_pandas().groupby("n_nationkey", as_index=False) \
        .agg(revenue_q4=("revenue_q4", "sum")).sort_values(
        ["revenue_q4", "n_nationkey"], ascending=[False, True])
    return pa.table({
        "n_name": pa.array([nat_name[int(k)] for k in out["n_nationkey"]],
                           pa.string()),
        "revenue_q4": pa.array(out["revenue_q4"].to_numpy(), pa.int64())})


def nation_volume_shipping(sf_dir: str, nation_a: str = "NATION_2",
                           nation_b: str = "NATION_7",
                           date_from: str = "1996-01-01",
                           date_to: str = "1998-01-01",
                           n_buckets: int = 64) -> pa.Table:
    """TPC-H Q7 shape: shipping volume BETWEEN two nations per
    (supplier nation, customer nation, ship year) — the directional
    trade-flow report. Output (supp_nation, cust_nation, l_year,
    revenue_q4), exact 1e-4-dollar integers.

    Same composition as :func:`local_supplier_volume` (constant
    dimensions driver-side, supplier broadcast into the lineitem map,
    customer⨝orders by adaptive join selection — broadcast below the
    8M-customer footer-stats bound, :func:`equi_join` past it — one
    final hash(orderkey) exchange whose kernel joins and reduces), with
    two differences: lineitem partials keep the SHIP YEAR as part of
    the pre-aggregation key, and the kernel's accept predicate is the
    unordered nation PAIR {a, b} with direction preserved in the
    output key."""
    import os

    import ray
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    from bge_m3_onnx_ray.hashing import splitmix64

    nat = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    name_of = dict(zip(nat.column("n_nationkey").to_pylist(),
                       nat.column("n_name").to_pylist()))
    key_of = {v: k for k, v in name_of.items()}
    ka, kb = key_of[nation_a], key_of[nation_b]
    pair_keys = [ka, kb]

    sup = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                        columns=["s_suppkey", "s_nationkey"])
    skeys = sup.column("s_suppkey").to_numpy()
    snat = sup.column("s_nationkey").to_numpy()
    in_pair = np.isin(snat, pair_keys)
    order = np.argsort(skeys[in_pair])
    sup_ref = ray.put((skeys[in_pair][order], snat[in_pair][order]))

    cut0 = pa.scalar(np.datetime64(date_from + "T00:00:00", "us"),
                     pa.timestamp("us"))
    cut1 = pa.scalar(np.datetime64(date_to + "T00:00:00", "us"),
                     pa.timestamp("us"))
    # adaptive customer join — same parquet-footer-stats rule as
    # :func:`local_supplier_volume`: broadcast the pair-filtered
    # custkey→nationkey map while customer fits a worker, else the
    # both-sides-large hash(custkey) exchange
    cust_path = os.path.join(sf_dir, "customer.parquet")
    orders = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                             columns=["o_orderkey", "o_custkey"])
    if pq.ParquetFile(cust_path).metadata.num_rows <= 8_000_000:
        ct = pq.read_table(cust_path, columns=["c_custkey", "c_nationkey"],
                           filters=[("c_nationkey", "in", pair_keys)])
        ck = ct.column("c_custkey").to_numpy()
        cn = ct.column("c_nationkey").to_numpy().astype(np.int64)
        co = np.argsort(ck)
        cust_ref = ray.put((ck[co], cn[co]))

        def resolve_nation(t: pa.Table) -> pa.Table:
            ckk, cnn = ray.get(cust_ref)
            ocust = t.column("o_custkey").to_numpy()
            if not len(ckk):
                return pa.table({"o_orderkey": pa.array([], pa.int64()),
                                 "c_nationkey": pa.array([], pa.int64())})
            pos = np.minimum(np.searchsorted(ckk, ocust), len(ckk) - 1)
            hit = ckk[pos] == ocust          # drops out-of-pair customers
            return pa.table({
                "o_orderkey": t.column("o_orderkey").filter(pa.array(hit)),
                "c_nationkey": pa.array(cnn[pos[hit]], pa.int64())})

        ord_nat = orders.map_batches(resolve_nation, batch_format="pyarrow")
    else:
        cust = rd.read_parquet(
            cust_path, columns=["c_custkey", "c_nationkey"],
            filter=pads.field("c_nationkey").isin(pair_keys))
        ord_nat = equi_join(orders, cust, "o_custkey", "c_custkey",
                            ["c_nationkey"], n_buckets=n_buckets)

    def orders_tag(t: pa.Table) -> pa.Table:
        ok = t.column("o_orderkey").to_numpy()
        return pa.table({
            "k": pa.array(ok, pa.int64()),
            "nat": t.column("c_nationkey").cast(pa.int64()),
            "year": pa.array(np.zeros(len(ok), np.int64)),
            "rev": pa.array(np.zeros(len(ok), np.int64)),
            "_side": pa.array(np.zeros(len(ok), np.int64)),
            "_jb": pa.array((splitmix64(ok.astype(np.uint64))
                             % np.uint64(n_buckets)).astype(np.int64))})

    def line_partial(batch: pa.Table) -> pa.Table:
        sk, sn = ray.get(sup_ref)
        lsk = batch.column("l_suppkey").to_numpy()
        empty = pa.table({"k": pa.array([], pa.int64()),
                          "nat": pa.array([], pa.int64()),
                          "year": pa.array([], pa.int64()),
                          "rev": pa.array([], pa.int64()),
                          "_side": pa.array([], pa.int64()),
                          "_jb": pa.array([], pa.int64())})
        if not len(sk):
            return empty
        pos = np.minimum(np.searchsorted(sk, lsk), len(sk) - 1)
        hit = sk[pos] == lsk
        if not hit.any():
            return empty
        ok = batch.column("l_orderkey").to_numpy()[hit]
        nat_l = sn[pos[hit]].astype(np.int64)
        ship_us = batch.column("l_shipdate").cast(pa.timestamp("us")) \
            .cast(pa.int64()).to_numpy()[hit]
        # UTC year via the days-since-epoch → (y, m, d) civil algorithm
        # is overkill: numpy datetime64 gives the year directly
        year = (ship_us.astype("datetime64[us]")
                .astype("datetime64[Y]").astype(np.int64) + 1970)
        price_c = np.rint(batch.column("l_extendedprice").to_numpy()[hit]
                          * 100).astype(np.int64)
        disc_c = np.rint(batch.column("l_discount").to_numpy()[hit]
                         * 100).astype(np.int64)
        rev = price_c * (100 - disc_c)
        o = np.lexsort((year, nat_l, ok))
        ok, nat_l, year, rev = ok[o], nat_l[o], year[o], rev[o]
        change = (np.diff(ok) != 0) | (np.diff(nat_l) != 0) \
            | (np.diff(year) != 0)
        starts = np.concatenate([[0], np.flatnonzero(change) + 1])
        return pa.table({
            "k": pa.array(ok[starts], pa.int64()),
            "nat": pa.array(nat_l[starts], pa.int64()),
            "year": pa.array(year[starts], pa.int64()),
            "rev": pa.array(np.add.reduceat(rev, starts), pa.int64()),
            "_side": pa.array(np.ones(len(starts), np.int64)),
            "_jb": pa.array((splitmix64(ok[starts].astype(np.uint64))
                             % np.uint64(n_buckets)).astype(np.int64))})

    line = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_suppkey", "l_shipdate",
                 "l_extendedprice", "l_discount"],
        filter=(pads.field("l_shipdate") >= cut0)
               & (pads.field("l_shipdate") < cut1)).map_batches(
        line_partial, batch_format="pyarrow", batch_size=131072)

    def join_reduce(g: pa.Table) -> pa.Table:
        side = g.column("_side").to_numpy()
        keys = g.column("k").to_numpy()
        nats = g.column("nat").to_numpy()
        om = side == 0
        okeys, onat = keys[om], nats[om]
        o = np.argsort(okeys, kind="stable")
        okeys, onat = okeys[o], onat[o]
        lkeys, lnat = keys[~om], nats[~om]
        lyear = g.column("year").to_numpy()[~om]
        lrev = g.column("rev").to_numpy()[~om]
        empty = pa.table({"s_nat": pa.array([], pa.int64()),
                          "c_nat": pa.array([], pa.int64()),
                          "l_year": pa.array([], pa.int64()),
                          "revenue_q4": pa.array([], pa.int64())})
        if not len(okeys) or not len(lkeys):
            return empty
        pos = np.minimum(np.searchsorted(okeys, lkeys), len(okeys) - 1)
        hit = (okeys[pos] == lkeys) & (onat[pos] != lnat)  # cross-nation
        if not hit.any():
            return empty
        c_nat = onat[pos[hit]]
        s_nat, yr, rv = lnat[hit], lyear[hit], lrev[hit]
        key = (s_nat * 32 + c_nat) * 4096 + (yr - 1970)
        uk, inv = np.unique(key, return_inverse=True)
        out = np.zeros(len(uk), np.int64)
        np.add.at(out, inv, rv)
        return pa.table({
            "s_nat": pa.array(uk // 4096 // 32, pa.int64()),
            "c_nat": pa.array(uk // 4096 % 32, pa.int64()),
            "l_year": pa.array(uk % 4096 + 1970, pa.int64()),
            "revenue_q4": pa.array(out, pa.int64())})

    tagged = ord_nat.map_batches(orders_tag, batch_format="pyarrow")
    parts = tagged.union(line).groupby("_jb").map_groups(
        join_reduce, batch_format="pyarrow").to_pandas()
    if parts.empty:        # zero qualifying lineitems: keep the schema
        return pa.table({"supp_nation": pa.array([], pa.string()),
                         "cust_nation": pa.array([], pa.string()),
                         "l_year": pa.array([], pa.int64()),
                         "revenue_q4": pa.array([], pa.int64())})
    agg = parts.groupby(["s_nat", "c_nat", "l_year"], as_index=False)[
        "revenue_q4"].sum().sort_values(["s_nat", "c_nat", "l_year"])
    return pa.table({
        "supp_nation": pa.array([name_of[int(k)] for k in agg["s_nat"]],
                                pa.string()),
        "cust_nation": pa.array([name_of[int(k)] for k in agg["c_nat"]],
                                pa.string()),
        "l_year": pa.array(agg["l_year"].to_numpy(), pa.int64()),
        "revenue_q4": pa.array(agg["revenue_q4"].to_numpy(), pa.int64())})


def returned_item_topk(sf_dir: str, date_from: str = "1996-01-01",
                       date_to: str = "1996-07-01", k: int = 20,
                       n_buckets: int = 64) -> pa.Table:
    """TPC-H Q10 shape: the top-``k`` customers by revenue LOST to
    returned items (l_returnflag = 'R') in one order-date window,
    decorated with customer name/nation. Output (c_custkey, c_name,
    n_name, revenue_q4), revenue desc / custkey asc.

    The aggregate-then-decorate composition: revenue per CUSTOMER
    reduces distributedly (lineitem 'R' partials join date-filtered
    orders in ONE hash(orderkey) exchange that re-keys to custkey and
    pre-reduces; a bucket_reduce finishes the per-customer sums); each
    bucket then keeps only its local top-k so the driver merges
    ≤ k x n_buckets rows; customer/nation attributes attach AFTER the
    cut — k rows decorate driver-side, the full customer table is
    never joined."""
    import os

    import ray
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    from bge_m3_onnx_ray.hashing import splitmix64
    from bge_m3_onnx_ray.stages._groups import bucket_reduce

    cut0 = pa.scalar(np.datetime64(date_from + "T00:00:00", "us"),
                     pa.timestamp("us"))
    cut1 = pa.scalar(np.datetime64(date_to + "T00:00:00", "us"),
                     pa.timestamp("us"))
    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey"],
        filter=(pads.field("o_orderdate") >= cut0)
               & (pads.field("o_orderdate") < cut1))

    def orders_tag(t: pa.Table) -> pa.Table:
        ok = t.column("o_orderkey").to_numpy()
        return pa.table({
            "k": pa.array(ok, pa.int64()),
            "cust": t.column("o_custkey").cast(pa.int64()),
            "rev": pa.array(np.zeros(len(ok), np.int64)),
            "_side": pa.array(np.zeros(len(ok), np.int64)),
            "_jb": pa.array((splitmix64(ok.astype(np.uint64))
                             % np.uint64(n_buckets)).astype(np.int64))})

    def line_partial(batch: pa.Table) -> pa.Table:
        ok = batch.column("l_orderkey").to_numpy()
        price_c = np.rint(batch.column("l_extendedprice").to_numpy()
                          * 100).astype(np.int64)
        disc_c = np.rint(batch.column("l_discount").to_numpy()
                         * 100).astype(np.int64)
        rev = price_c * (100 - disc_c)
        o = np.argsort(ok, kind="stable")
        ok, rev = ok[o], rev[o]
        starts = np.concatenate([[0], np.flatnonzero(np.diff(ok)) + 1]) \
            if len(ok) else np.array([], np.int64)
        keys = ok[starts] if len(ok) else np.array([], np.int64)
        sums = np.add.reduceat(rev, starts) if len(ok) else \
            np.array([], np.int64)
        return pa.table({
            "k": pa.array(keys, pa.int64()),
            "cust": pa.array(np.zeros(len(keys), np.int64)),
            "rev": pa.array(sums, pa.int64()),
            "_side": pa.array(np.ones(len(keys), np.int64)),
            "_jb": pa.array((splitmix64(keys.astype(np.uint64))
                             % np.uint64(n_buckets)).astype(np.int64))})

    line = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=(pads.field("l_returnflag") == "R")).map_batches(
        line_partial, batch_format="pyarrow", batch_size=131072)

    def join_rekey(g: pa.Table) -> pa.Table:
        side = g.column("_side").to_numpy()
        keys = g.column("k").to_numpy()
        om = side == 0
        okeys, ocust = keys[om], g.column("cust").to_numpy()[om]
        o = np.argsort(okeys, kind="stable")
        okeys, ocust = okeys[o], ocust[o]
        lkeys = keys[~om]
        lrev = g.column("rev").to_numpy()[~om]
        empty = pa.table({"cust": pa.array([], pa.int64()),
                          "rev": pa.array([], pa.int64())})
        if not len(okeys) or not len(lkeys):
            return empty
        pos = np.minimum(np.searchsorted(okeys, lkeys), len(okeys) - 1)
        hit = okeys[pos] == lkeys
        if not hit.any():
            return empty
        cust = ocust[pos[hit]]
        uk, inv = np.unique(cust, return_inverse=True)
        out = np.zeros(len(uk), np.int64)
        np.add.at(out, inv, lrev[hit])
        return pa.table({"cust": pa.array(uk, pa.int64()),
                         "rev": pa.array(out, pa.int64())})

    per_cust = bucket_reduce(
        orders.map_batches(orders_tag, batch_format="pyarrow")
        .union(line).groupby("_jb").map_groups(
            join_rekey, batch_format="pyarrow"),
        ["cust"], [("rev", "sum", "rev")])

    def local_topk(t: pa.Table) -> pa.Table:
        c = t.column("cust").to_numpy()
        r = t.column("rev").to_numpy()
        o = np.lexsort((c, -r))[:k]
        return pa.table({"cust": pa.array(c[o], pa.int64()),
                         "rev": pa.array(r[o], pa.int64())})

    cand = per_cust.map_batches(local_topk, batch_format="pyarrow") \
        .to_pandas().sort_values(["rev", "cust"],
                                 ascending=[False, True]).head(k)

    # decorate ONLY the k winners: predicate-pushdown read of just
    # their customer rows, never the full table
    cust_t = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_name", "c_nationkey"],
        filters=[("c_custkey", "in", cand["cust"].tolist())])
    nat = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    name_of = dict(zip(nat.column("n_nationkey").to_pylist(),
                       nat.column("n_name").to_pylist()))
    cdf = cust_t.to_pandas().set_index("c_custkey").loc[cand["cust"]]
    return pa.table({
        "c_custkey": pa.array(cand["cust"].to_numpy(), pa.int64()),
        "c_name": pa.array(cdf["c_name"].to_numpy(), pa.string()),
        "n_name": pa.array([name_of[int(x)]
                            for x in cdf["c_nationkey"]], pa.string()),
        "revenue_q4": pa.array(cand["rev"].to_numpy(), pa.int64())})


def promo_revenue_share(sf_dir: str, promo_type: str = "ECONOMY",
                        date_from: str = "1996-03-01",
                        date_to: str = "1996-04-01") -> pa.Table:
    """TPC-H Q14 shape: the share of one ship-month's revenue that came
    from a promoted part class — lineitem ⨝ part with the ratio
    aggregate. Output one row (promo_revenue_q4, total_revenue_q4,
    promo_pct_q6), all integer-exact (percent = floor of the integer
    ratio on the 1e-6 grid).

    Scale shape: part is the broadcast dimension (partkey → one bool,
    shipped once as a sorted key array + bitmask); the lineitem pass is
    map-only with per-batch PAIRED partial sums — two int64s per batch
    cross the (tree-reduce) aggregation, no shuffle anywhere."""
    import os

    import ray
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum

    part = pq.read_table(os.path.join(sf_dir, "part.parquet"),
                         columns=["p_partkey", "p_type"])
    pk = part.column("p_partkey").to_numpy()
    promo = (np.asarray(part.column("p_type").to_pylist(), dtype=object)
             == promo_type)
    order = np.argsort(pk)
    ref = ray.put((pk[order], promo[order]))

    cut0 = pa.scalar(np.datetime64(date_from + "T00:00:00", "us"),
                     pa.timestamp("us"))
    cut1 = pa.scalar(np.datetime64(date_to + "T00:00:00", "us"),
                     pa.timestamp("us"))

    def partial(batch: pa.Table) -> pa.Table:
        k, isp = ray.get(ref)
        lpk = batch.column("l_partkey").to_numpy()
        price_c = np.rint(batch.column("l_extendedprice").to_numpy()
                          * 100).astype(np.int64)
        disc_c = np.rint(batch.column("l_discount").to_numpy()
                         * 100).astype(np.int64)
        rev = price_c * (100 - disc_c)
        if len(k):
            pos = np.minimum(np.searchsorted(k, lpk), len(k) - 1)
            hit = k[pos] == lpk
            promo_rev = int(rev[hit & isp[pos]].sum())
            total_rev = int(rev[hit].sum())
        else:
            promo_rev = total_rev = 0
        return pa.table({"promo": pa.array([promo_rev], pa.int64()),
                         "total": pa.array([total_rev], pa.int64())})

    agg = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_extendedprice", "l_discount"],
        filter=(pads.field("l_shipdate") >= cut0)
               & (pads.field("l_shipdate") < cut1)).map_batches(
        partial, batch_format="pyarrow", batch_size=131072).aggregate(
        Sum("promo", alias_name="promo"), Sum("total", alias_name="total"))
    p, t = int(agg["promo"]), int(agg["total"])
    pct_q6 = (100 * p * 1_000_000) // t if t else 0
    return pa.table({
        "promo_revenue_q4": pa.array([p], pa.int64()),
        "total_revenue_q4": pa.array([t], pa.int64()),
        "promo_pct_q6": pa.array([pct_q6], pa.int64())})


def disjunctive_filter_revenue(sf_dir: str) -> pa.Table:
    """TPC-H Q19 shape: revenue from lineitems matching an OR of three
    brand/size/quantity predicate conjunctions — the disjunctive
    multi-attribute filter that defeats naive pushdown (no single
    column prunes it). Output one row (n_matches, revenue_q4).

    Predicates (adapted to the synthetic domains):
      (Brand#1,  size 1..10,  qty 1..15)
    | (Brand#7,  size 11..25, qty 10..30)
    | (Brand#13, size 26..50, qty 20..50)

    Scale shape: part ships once as a broadcast (sorted partkey +
    int8 predicate-class code: which brand/size clause a part can
    satisfy, or none — the part-side half of each conjunction is
    resolved BEFORE the scan); the lineitem pass is map-only, applying
    the quantity half against the broadcast class. Exact integer
    cents; no shuffle."""
    import os

    import ray
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum

    part = pq.read_table(os.path.join(sf_dir, "part.parquet"),
                         columns=["p_partkey", "p_brand", "p_size"])
    pk = part.column("p_partkey").to_numpy()
    brand = np.asarray(part.column("p_brand").to_pylist(), dtype=object)
    size = part.column("p_size").to_numpy()
    cls = np.full(len(pk), -1, np.int8)
    cls[(brand == "Brand#1") & (size >= 1) & (size <= 10)] = 0
    cls[(brand == "Brand#7") & (size >= 11) & (size <= 25)] = 1
    cls[(brand == "Brand#13") & (size >= 26) & (size <= 50)] = 2
    order = np.argsort(pk)
    ref = ray.put((pk[order], cls[order]))
    qlo = np.array([1, 10, 20], np.int64)
    qhi = np.array([15, 30, 50], np.int64)

    def partial(batch: pa.Table) -> pa.Table:
        k, c = ray.get(ref)
        lpk = batch.column("l_partkey").to_numpy()
        qty = np.rint(batch.column("l_quantity").to_numpy()) \
            .astype(np.int64)
        pos = np.minimum(np.searchsorted(k, lpk), len(k) - 1) \
            if len(k) else np.zeros(len(lpk), np.int64)
        pcls = np.where((len(k) > 0) & (k[pos] == lpk), c[pos], -1)
        ok = pcls >= 0
        okc = pcls[ok].astype(np.int64)
        ok2 = (qty[ok] >= qlo[okc]) & (qty[ok] <= qhi[okc])
        idx = np.flatnonzero(ok)[ok2]
        price_c = np.rint(batch.column("l_extendedprice").to_numpy()[idx]
                          * 100).astype(np.int64)
        disc_c = np.rint(batch.column("l_discount").to_numpy()[idx]
                         * 100).astype(np.int64)
        rev = int((price_c * (100 - disc_c)).sum())
        return pa.table({"n": pa.array([len(idx)], pa.int64()),
                         "rev": pa.array([rev], pa.int64())})

    agg = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_quantity", "l_extendedprice",
                 "l_discount"]).map_batches(
        partial, batch_format="pyarrow", batch_size=131072).aggregate(
        Sum("n", alias_name="n"), Sum("rev", alias_name="rev"))
    return pa.table({
        "n_matches": pa.array([int(agg["n"])], pa.int64()),
        "revenue_q4": pa.array([int(agg["rev"])], pa.int64())})


def large_volume_customers(sf_dir: str, qty_threshold: float = 250.0,
                           k: int = 100, n_buckets: int = 64) -> pa.Table:
    """TPC-H Q18 shape: customers whose ORDERS carry a total lineitem
    quantity above ``qty_threshold`` — the large-volume-order report.
    Output (c_name, c_custkey, o_orderkey, o_orderdate_us,
    o_totalprice_q2, sum_qty_q2), ordered o_totalprice desc /
    o_orderkey asc, top ``k``; quantities and prices in exact
    1e-2-unit integers (the :func:`pricing_summary` contract).

    Scale shape: per-order quantity sums reduce distributedly
    (``bucket_reduce`` on hash(orderkey) — 16-byte rows); the
    THRESHOLD bounds the qualifying set (≤ total corpus quantity /
    threshold orders can exceed it, a data-independent cap), so the
    qualifying (orderkey, sum) map broadcasts via the object store
    into a pruned orders scan, customer names attach from a
    custkey-pruned footer-gated read, and only ≤ qualifying-count
    rows ever reach the driver for the final top-k sort."""
    import os

    import ray
    import pyarrow.parquet as pq

    from bge_m3_onnx_ray.stages._groups import bucket_reduce

    def qty_partial(t: pa.Table) -> pa.Table:
        q2 = np.rint(t.column("l_quantity").to_numpy() * 100).astype(np.int64)
        return pa.table({"l_orderkey": t.column("l_orderkey"),
                         "q2": pa.array(q2, pa.int64())})

    line = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_quantity"]).map_batches(
        qty_partial, batch_format="pyarrow")
    sums = bucket_reduce(line, ["l_orderkey"], [("q2", "sum", "sum_qty_q2")],
                         n_buckets)
    thr = int(round(qty_threshold * 100))
    heavy = sums.map_batches(
        lambda t, _thr=thr: t.filter(
            pa.compute.greater(t.column("sum_qty_q2"), _thr)),
        batch_format="pyarrow").to_pandas()
    if heavy.empty:
        return pa.table({"c_name": pa.array([], pa.string()),
                         "c_custkey": pa.array([], pa.int64()),
                         "o_orderkey": pa.array([], pa.int64()),
                         "o_orderdate_us": pa.array([], pa.int64()),
                         "o_totalprice_q2": pa.array([], pa.int64()),
                         "sum_qty_q2": pa.array([], pa.int64())})
    hk = heavy["l_orderkey"].to_numpy()
    hs = heavy["sum_qty_q2"].to_numpy()
    o = np.argsort(hk)
    heavy_ref = ray.put((hk[o], hs[o]))

    def orders_pick(t: pa.Table) -> pa.Table:
        kk, ss = ray.get(heavy_ref)
        ok = t.column("o_orderkey").to_numpy()
        pos = np.minimum(np.searchsorted(kk, ok), len(kk) - 1)
        hit = kk[pos] == ok
        if not hit.any():
            return pa.table({"o_orderkey": pa.array([], pa.int64()),
                             "o_custkey": pa.array([], pa.int64()),
                             "o_orderdate_us": pa.array([], pa.int64()),
                             "o_totalprice_q2": pa.array([], pa.int64()),
                             "sum_qty_q2": pa.array([], pa.int64())})
        price_q2 = np.rint(t.column("o_totalprice").to_numpy()[hit]
                           * 100).astype(np.int64)
        od = t.column("o_orderdate").cast(pa.timestamp("us")) \
            .cast(pa.int64()).to_numpy()[hit]
        return pa.table({
            "o_orderkey": pa.array(ok[hit], pa.int64()),
            "o_custkey": t.column("o_custkey").filter(pa.array(hit))
                .cast(pa.int64()),
            "o_orderdate_us": pa.array(od, pa.int64()),
            "o_totalprice_q2": pa.array(price_q2, pa.int64()),
            "sum_qty_q2": pa.array(ss[pos[hit]], pa.int64())})

    picked = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate",
                 "o_totalprice"]).map_batches(
        orders_pick, batch_format="pyarrow").to_pandas()
    picked = picked.sort_values(
        ["o_totalprice_q2", "o_orderkey"],
        ascending=[False, True]).head(k)
    ckeys = sorted(set(int(c) for c in picked["o_custkey"]))
    names = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                          columns=["c_custkey", "c_name"],
                          filters=[("c_custkey", "in", ckeys)])
    name_of = dict(zip(names.column("c_custkey").to_pylist(),
                       names.column("c_name").to_pylist()))
    return pa.table({
        "c_name": pa.array([name_of[int(c)] for c in picked["o_custkey"]],
                           pa.string()),
        "c_custkey": pa.array(picked["o_custkey"].to_numpy().astype("int64"),
                              pa.int64()),
        "o_orderkey": pa.array(picked["o_orderkey"].to_numpy(), pa.int64()),
        "o_orderdate_us": pa.array(picked["o_orderdate_us"].to_numpy(),
                                   pa.int64()),
        "o_totalprice_q2": pa.array(picked["o_totalprice_q2"].to_numpy(),
                                    pa.int64()),
        "sum_qty_q2": pa.array(picked["sum_qty_q2"].to_numpy(), pa.int64())})


def forecast_revenue_change(sf_dir: str, date_from: str = "1996-01-01",
                            date_to: str = "1997-01-01",
                            disc_lo: float = 0.05, disc_hi: float = 0.07,
                            qty_below: float = 24.0) -> pa.Table:
    """TPC-H Q6 shape: revenue that would be recovered by eliminating a
    discount band on small-quantity orders in one ship-year —
    sum(extendedprice · discount) over the filtered lineitems. Output
    one row (revenue_q4, n_lineitems), revenue in exact 1e-4-dollar
    integers (price cents × discount cents).

    Scale shape: the purest scan-aggregate — ship-date, discount-band
    and quantity predicates push into the parquet read; each batch
    reduces to TWO int64 partials (revenue sum + row count), and a
    tree reduce finishes. No shuffle, no driver-side rows."""
    import os

    import pyarrow.dataset as pads

    cut0 = pa.scalar(np.datetime64(date_from + "T00:00:00", "us"),
                     pa.timestamp("us"))
    cut1 = pa.scalar(np.datetime64(date_to + "T00:00:00", "us"),
                     pa.timestamp("us"))
    # the band compares on the exact cent grid (mirrored in SQL):
    # disc_c in [round(lo*100), round(hi*100)], qty < qty_below
    lo_c = int(round(disc_lo * 100))
    hi_c = int(round(disc_hi * 100))

    def partial(t: pa.Table) -> pa.Table:
        price_c = np.rint(t.column("l_extendedprice").to_numpy()
                          * 100).astype(np.int64)
        disc_c = np.rint(t.column("l_discount").to_numpy()
                         * 100).astype(np.int64)
        qty = t.column("l_quantity").to_numpy()
        keep = (disc_c >= lo_c) & (disc_c <= hi_c) & (qty < qty_below)
        rev = int(np.sum(price_c[keep] * disc_c[keep]))
        return pa.table({"revenue_q4": pa.array([rev], pa.int64()),
                         "n_lineitems": pa.array([int(keep.sum())],
                                                 pa.int64())})

    agg = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_extendedprice", "l_discount", "l_quantity"],
        filter=(pads.field("l_shipdate") >= cut0)
               & (pads.field("l_shipdate") < cut1)).map_batches(
        partial, batch_format="pyarrow").to_pandas()
    return pa.table({
        "revenue_q4": pa.array([int(agg["revenue_q4"].sum())], pa.int64()),
        "n_lineitems": pa.array([int(agg["n_lineitems"].sum())],
                                pa.int64())})


def top_supplier(sf_dir: str, date_from: str = "1996-01-01",
                 date_to: str = "1996-04-01",
                 n_buckets: int = 64) -> pa.Table:
    """TPC-H Q15 shape: the supplier(s) with the maximum lineitem
    revenue in one ship-date quarter. Output (s_suppkey, s_name,
    total_revenue_q4) ordered by s_suppkey — every supplier tied at the
    max qualifies, exactly the CREATE VIEW / max-subquery semantics.

    Scale shape: per-supplier revenue reduces distributedly (per-batch
    np.unique partials, then ``bucket_reduce`` on hash(suppkey) —
    16-byte rows); the reduced table MATERIALIZES once (it is one row
    per active supplier) and is consumed twice without recompute: a
    tree max (one int64 per bucket reaches the driver) and a stream
    filter for rows equal to the max (ties only — a handful of rows).
    Names attach from a suppkey-pruned footer-gated read."""
    import os

    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    from bge_m3_onnx_ray.stages._groups import bucket_reduce

    cut0 = pa.scalar(np.datetime64(date_from + "T00:00:00", "us"),
                     pa.timestamp("us"))
    cut1 = pa.scalar(np.datetime64(date_to + "T00:00:00", "us"),
                     pa.timestamp("us"))

    def partial(t: pa.Table) -> pa.Table:
        sk = t.column("l_suppkey").to_numpy()
        price_c = np.rint(t.column("l_extendedprice").to_numpy()
                          * 100).astype(np.int64)
        disc_c = np.rint(t.column("l_discount").to_numpy()
                         * 100).astype(np.int64)
        rev = price_c * (100 - disc_c)
        uk, inv = np.unique(sk, return_inverse=True)
        out = np.zeros(len(uk), np.int64)
        np.add.at(out, inv, rev)
        return pa.table({"l_suppkey": pa.array(uk, pa.int64()),
                         "rev": pa.array(out, pa.int64())})

    sums = bucket_reduce(
        rd.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_suppkey", "l_extendedprice", "l_discount"],
            filter=(pads.field("l_shipdate") >= cut0)
                   & (pads.field("l_shipdate") < cut1)).map_batches(
            partial, batch_format="pyarrow"),
        ["l_suppkey"], [("rev", "sum", "total_revenue_q4")],
        n_buckets).materialize()

    mx = sums.map_batches(
        lambda t: pa.table({"m": pa.array(
            [int(t.column("total_revenue_q4").to_numpy().max())
             if t.num_rows else -1], pa.int64())}),
        batch_format="pyarrow").to_pandas()
    if mx.empty or int(mx["m"].max()) < 0:
        return pa.table({"s_suppkey": pa.array([], pa.int64()),
                         "s_name": pa.array([], pa.string()),
                         "total_revenue_q4": pa.array([], pa.int64())})
    best = int(mx["m"].max())
    winners = sums.map_batches(
        lambda t, _b=best: t.filter(
            pa.compute.equal(t.column("total_revenue_q4"), _b)),
        batch_format="pyarrow").to_pandas().sort_values("l_suppkey")
    skeys = [int(s) for s in winners["l_suppkey"]]
    names = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                          columns=["s_suppkey", "s_name"],
                          filters=[("s_suppkey", "in", skeys)])
    name_of = dict(zip(names.column("s_suppkey").to_pylist(),
                       names.column("s_name").to_pylist()))
    return pa.table({
        "s_suppkey": pa.array(skeys, pa.int64()),
        "s_name": pa.array([name_of[s] for s in skeys], pa.string()),
        "total_revenue_q4": pa.array(
            winners["total_revenue_q4"].to_numpy(), pa.int64())})


def small_quantity_revenue(sf_dir: str, brand: str = "Brand#12",
                           n_buckets: int = 64) -> pa.Table:
    """TPC-H Q17 shape: revenue from SMALL-quantity orders of one
    brand's parts — lineitems whose quantity is below 20% of that
    part's corpus-wide average. Output one row (revenue_q2,
    n_lineitems); the threshold test is the exact rational
    ``qty·5·count(part) < sum_qty(part)`` (both sides integer on the
    1e-2 grid), so no float division on either side.

    Scale shape: the brand's partkey set comes from a footer-gated
    predicate read and broadcasts once via ``ray.put`` (brand
    selectivity bounds it — TPC-H brands are ~1/25 of parts; a
    many-million-part corpus would swap this side into ``equi_join``,
    the documented adaptive rule of :func:`local_supplier_volume`);
    pass 1 reduces per-part (sum_qty, count) over a pruned
    2-column scan (``bucket_reduce``, partials only cross); the
    per-part stats — bounded by the brand's part count — broadcast
    back for pass 2, a shuffle-free filtered scan-aggregate emitting
    two int64 partials per batch."""
    import os

    import ray
    import pyarrow.parquet as pq

    from bge_m3_onnx_ray.stages._groups import bucket_reduce

    pt = pq.read_table(os.path.join(sf_dir, "part.parquet"),
                       columns=["p_partkey"],
                       filters=[("p_brand", "=", brand)])
    pkeys = np.sort(pt.column("p_partkey").to_numpy().astype(np.int64))
    if not len(pkeys):
        return pa.table({"revenue_q2": pa.array([0], pa.int64()),
                         "n_lineitems": pa.array([0], pa.int64())})
    pk_ref = ray.put(pkeys)

    def qty_partial(t: pa.Table) -> pa.Table:
        pk = ray.get(pk_ref)
        lp = t.column("l_partkey").to_numpy()
        pos = np.minimum(np.searchsorted(pk, lp), len(pk) - 1)
        hit = pk[pos] == lp
        if not hit.any():
            return pa.table({"l_partkey": pa.array([], pa.int64()),
                             "sq": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        lph = lp[hit]
        q2 = np.rint(t.column("l_quantity").to_numpy()[hit]
                     * 100).astype(np.int64)
        uk, inv = np.unique(lph, return_inverse=True)
        sq = np.zeros(len(uk), np.int64)
        np.add.at(sq, inv, q2)
        cnt = np.bincount(inv, minlength=len(uk)).astype(np.int64)
        return pa.table({"l_partkey": pa.array(uk, pa.int64()),
                         "sq": pa.array(sq, pa.int64()),
                         "cnt": pa.array(cnt, pa.int64())})

    stats = bucket_reduce(
        rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                        columns=["l_partkey", "l_quantity"]).map_batches(
            qty_partial, batch_format="pyarrow"),
        ["l_partkey"], [("sq", "sum", "sum_q2"), ("cnt", "sum", "n")],
        n_buckets).to_pandas()
    if stats.empty:
        return pa.table({"revenue_q2": pa.array([0], pa.int64()),
                         "n_lineitems": pa.array([0], pa.int64())})
    o = np.argsort(stats["l_partkey"].to_numpy())
    stat_ref = ray.put((stats["l_partkey"].to_numpy()[o],
                        stats["sum_q2"].to_numpy()[o],
                        stats["n"].to_numpy()[o]))

    def rev_partial(t: pa.Table) -> pa.Table:
        pk, sq, cn = ray.get(stat_ref)
        lp = t.column("l_partkey").to_numpy()
        pos = np.minimum(np.searchsorted(pk, lp), len(pk) - 1)
        hit = pk[pos] == lp
        q2 = np.rint(t.column("l_quantity").to_numpy() * 100).astype(np.int64)
        # qty < 0.2·avg  ⟺  qty_q2·5·n < sum_q2 (exact rational)
        small = hit & (q2 * 5 * cn[pos] < sq[pos])
        price_c = np.rint(t.column("l_extendedprice").to_numpy()[small]
                          * 100).astype(np.int64)
        return pa.table({
            "revenue_q2": pa.array([int(price_c.sum())], pa.int64()),
            "n_lineitems": pa.array([int(small.sum())], pa.int64())})

    agg = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_quantity", "l_extendedprice"]).map_batches(
        rev_partial, batch_format="pyarrow").to_pandas()
    return pa.table({
        "revenue_q2": pa.array([int(agg["revenue_q2"].sum())], pa.int64()),
        "n_lineitems": pa.array([int(agg["n_lineitems"].sum())],
                                pa.int64())})


def sales_opportunity(sf_dir: str, cutoff: str = "1999-01-01",
                      n_buckets: int = 64) -> pa.Table:
    """TPC-H Q22 shape: per-nation count and balance of RICH-but-IDLE
    customers — account balance above the corpus average of positive
    balances, and no orders on or after ``cutoff``. Output (n_name,
    n_custs, total_acctbal_q2) ordered by n_name; the wealth threshold
    is the exact rational ``bal_q2 · count > sum_q2`` (no float
    division on either side).

    Scale shape: the positive-balance average reduces to TWO int64
    partials per batch (shuffle-free scan); the NOT EXISTS is the
    repo's distributed :func:`semi_anti_join` — ONE hash(custkey)
    exchange where the date-pruned orders side ships deduplicated
    int64 keys only; the surviving rows pre-reduce per nation inside
    a final map (nation cardinality is bounded), so the driver sums
    25-row partials."""
    import os

    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    cut = pa.scalar(np.datetime64(cutoff + "T00:00:00", "us"),
                    pa.timestamp("us"))

    def bal_partial(t: pa.Table) -> pa.Table:
        bal_c = np.rint(t.column("c_acctbal").to_numpy()
                        * 100).astype(np.int64)
        pos = bal_c > 0
        return pa.table({"s": pa.array([int(bal_c[pos].sum())], pa.int64()),
                         "c": pa.array([int(pos.sum())], pa.int64())})

    ab = rd.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_acctbal"]).map_batches(
        bal_partial, batch_format="pyarrow").to_pandas()
    sum_c, cnt = int(ab["s"].sum()), int(ab["c"].sum())

    def rich(t: pa.Table) -> pa.Table:
        bal_c = np.rint(t.column("c_acctbal").to_numpy()
                        * 100).astype(np.int64)
        keep = bal_c * cnt > sum_c          # bal > avg(positive), exact
        return pa.table({
            "c_custkey": t.column("c_custkey").filter(pa.array(keep)),
            "c_nationkey": t.column("c_nationkey").filter(
                pa.array(keep)).cast(pa.int64()),
            "bal_c": pa.array(bal_c[keep], pa.int64())})

    rich_ds = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey", "c_acctbal"]).map_batches(
        rich, batch_format="pyarrow")
    active = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                             columns=["o_custkey"],
                             filter=pads.field("o_orderdate") >= cut)
    idle = semi_anti_join(rich_ds, active, "c_custkey", "o_custkey",
                          anti=True, n_buckets=n_buckets)

    def nat_partial(t: pa.Table) -> pa.Table:
        nk = t.column("c_nationkey").to_numpy()
        bal = t.column("bal_c").to_numpy()
        uk, inv = np.unique(nk, return_inverse=True)
        s = np.zeros(len(uk), np.int64)
        np.add.at(s, inv, bal)
        return pa.table({
            "nk": pa.array(uk, pa.int64()),
            "n_custs": pa.array(np.bincount(inv, minlength=len(uk))
                                .astype(np.int64)),
            "total_acctbal_q2": pa.array(s, pa.int64())})

    parts = idle.map_batches(nat_partial,
                             batch_format="pyarrow").to_pandas()
    nat = pq.read_table(os.path.join(sf_dir, "nation.parquet"),
                        columns=["n_nationkey", "n_name"])
    name_of = dict(zip(nat.column("n_nationkey").to_pylist(),
                       nat.column("n_name").to_pylist()))
    if parts.empty:
        return pa.table({"n_name": pa.array([], pa.string()),
                         "n_custs": pa.array([], pa.int64()),
                         "total_acctbal_q2": pa.array([], pa.int64())})
    agg = parts.groupby("nk", as_index=False).sum()
    agg["n_name"] = [name_of[int(k)] for k in agg["nk"]]
    agg = agg.sort_values("n_name")
    return pa.table({
        "n_name": pa.array(agg["n_name"].tolist(), pa.string()),
        "n_custs": pa.array(agg["n_custs"].to_numpy(), pa.int64()),
        "total_acctbal_q2": pa.array(agg["total_acctbal_q2"].to_numpy(),
                                     pa.int64())})


def market_share(sf_dir: str, region: str = "ASIA",
                 supp_nation: str = "NATION_2", p_type: str = "PROMO",
                 n_buckets: int = 64) -> pa.Table:
    """TPC-H Q8 shape: one supplier nation's share of a region's
    revenue in one part type, by order year. Output (o_year,
    numerator_q4, denominator_q4) — the share stays a RATIONAL
    (target-nation revenue, total revenue) so both sides are exact
    int64 sums; consumers divide.

    Scale shape: nation/region resolve driver-side (bounded dims);
    supplier→nationkey and the type-filtered partkey set broadcast
    while their footer row counts fit a worker (≤8M — the
    :func:`local_supplier_volume` adaptive rule), else they swap into
    :func:`equi_join`; the customer region filter reuses the same
    adaptive rule to tag date-complete ORDERS with (orderkey, year);
    lineitem partials pre-reduce per orderkey (num, den); ONE
    hash(orderkey) tagged-union exchange joins orders tags with line
    partials and emits per-year partials, so the driver sums ≤ years
    rows per bucket."""
    import os

    import ray
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    from bge_m3_onnx_ray.hashing import splitmix64

    nat = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    reg = pq.read_table(os.path.join(sf_dir, "region.parquet"))
    rkey = {n: k for k, n in zip(reg.column("r_regionkey").to_pylist(),
                                 reg.column("r_name").to_pylist())}[region]
    nk = nat.column("n_nationkey").to_numpy()
    nr = nat.column("n_regionkey").to_numpy()
    region_nations = set(int(k) for k in nk[nr == rkey])
    target_nk = {n: k for k, n in zip(nat.column("n_nationkey").to_pylist(),
                                      nat.column("n_name").to_pylist())
                 }[supp_nation]

    sup_path = os.path.join(sf_dir, "supplier.parquet")
    sup = pq.read_table(sup_path, columns=["s_suppkey", "s_nationkey"])
    sk = sup.column("s_suppkey").to_numpy()
    sn = sup.column("s_nationkey").to_numpy().astype(np.int64)
    so = np.argsort(sk)
    sup_ref = ray.put((sk[so], sn[so]))

    part_path = os.path.join(sf_dir, "part.parquet")
    pt = pq.read_table(part_path, columns=["p_partkey"],
                       filters=[("p_type", "=", p_type)])
    pk_ref = ray.put(np.sort(pt.column("p_partkey").to_numpy()
                             .astype(np.int64)))

    # orders tagged (orderkey, year) for region customers — adaptive
    cust_path = os.path.join(sf_dir, "customer.parquet")
    orders = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate"])
    if pq.ParquetFile(cust_path).metadata.num_rows <= 8_000_000:
        ct = pq.read_table(cust_path, columns=["c_custkey"],
                           filters=[("c_nationkey", "in",
                                     sorted(region_nations))])
        cust_ref = ray.put(np.sort(ct.column("c_custkey").to_numpy()
                                   .astype(np.int64)))

        def region_orders(t: pa.Table) -> pa.Table:
            ck = ray.get(cust_ref)
            oc = t.column("o_custkey").to_numpy()
            if not len(ck):
                return pa.table({"o_orderkey": pa.array([], pa.int64()),
                                 "o_year": pa.array([], pa.int64())})
            pos = np.minimum(np.searchsorted(ck, oc), len(ck) - 1)
            hit = ck[pos] == oc
            od = t.column("o_orderdate").cast(pa.timestamp("us")) \
                .cast(pa.int64()).to_numpy()[hit]
            yr = (od.astype("datetime64[us]").astype("datetime64[Y]")
                  .astype(np.int64) + 1970)
            return pa.table({
                "o_orderkey": t.column("o_orderkey").filter(pa.array(hit)),
                "o_year": pa.array(yr, pa.int64())})

        ord_yr = orders.map_batches(region_orders, batch_format="pyarrow")
    else:
        cust = rd.read_parquet(
            cust_path, columns=["c_custkey"],
            filter=pads.field("c_nationkey").isin(
                sorted(region_nations)))
        joined = equi_join(orders, cust, "o_custkey", "c_custkey", [],
                           n_buckets=n_buckets)

        def to_year(t: pa.Table) -> pa.Table:
            od = t.column("o_orderdate").cast(pa.timestamp("us")) \
                .cast(pa.int64()).to_numpy()
            yr = (od.astype("datetime64[us]").astype("datetime64[Y]")
                  .astype(np.int64) + 1970)
            return pa.table({"o_orderkey": t.column("o_orderkey"),
                             "o_year": pa.array(yr, pa.int64())})

        ord_yr = joined.map_batches(to_year, batch_format="pyarrow")

    def orders_tag(t: pa.Table) -> pa.Table:
        ok = t.column("o_orderkey").to_numpy()
        return pa.table({
            "k": pa.array(ok, pa.int64()),
            "year": t.column("o_year").cast(pa.int64()),
            "num": pa.array(np.zeros(len(ok), np.int64)),
            "den": pa.array(np.zeros(len(ok), np.int64)),
            "_side": pa.array(np.zeros(len(ok), np.int64)),
            "_jb": pa.array((splitmix64(ok.astype(np.uint64))
                             % np.uint64(n_buckets)).astype(np.int64))})

    def line_partial(t: pa.Table) -> pa.Table:
        pk = ray.get(pk_ref)
        sk_, sn_ = ray.get(sup_ref)
        lp = t.column("l_partkey").to_numpy()
        empty = pa.table({"k": pa.array([], pa.int64()),
                          "year": pa.array([], pa.int64()),
                          "num": pa.array([], pa.int64()),
                          "den": pa.array([], pa.int64()),
                          "_side": pa.array([], pa.int64()),
                          "_jb": pa.array([], pa.int64())})
        if not len(pk):
            return empty
        ppos = np.minimum(np.searchsorted(pk, lp), len(pk) - 1)
        hit = pk[ppos] == lp
        if not hit.any():
            return empty
        ok = t.column("l_orderkey").to_numpy()[hit]
        ls = t.column("l_suppkey").to_numpy()[hit]
        spos = np.minimum(np.searchsorted(sk_, ls), len(sk_) - 1)
        is_target = (sk_[spos] == ls) & (sn_[spos] == target_nk)
        price_c = np.rint(t.column("l_extendedprice").to_numpy()[hit]
                          * 100).astype(np.int64)
        disc_c = np.rint(t.column("l_discount").to_numpy()[hit]
                         * 100).astype(np.int64)
        rev = price_c * (100 - disc_c)
        uk, inv = np.unique(ok, return_inverse=True)
        den = np.zeros(len(uk), np.int64)
        np.add.at(den, inv, rev)
        num = np.zeros(len(uk), np.int64)
        np.add.at(num, inv, np.where(is_target, rev, 0))
        return pa.table({
            "k": pa.array(uk, pa.int64()),
            "year": pa.array(np.zeros(len(uk), np.int64)),
            "num": pa.array(num, pa.int64()),
            "den": pa.array(den, pa.int64()),
            "_side": pa.array(np.ones(len(uk), np.int64)),
            "_jb": pa.array((splitmix64(uk.astype(np.uint64))
                             % np.uint64(n_buckets)).astype(np.int64))})

    line = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_partkey", "l_suppkey",
                 "l_extendedprice", "l_discount"]).map_batches(
        line_partial, batch_format="pyarrow", batch_size=131072)

    def join_reduce(g: pa.Table) -> pa.Table:
        side = g.column("_side").to_numpy()
        keys = g.column("k").to_numpy()
        om = side == 0
        okeys = keys[om]
        oyear = g.column("year").to_numpy()[om]
        o = np.argsort(okeys, kind="stable")
        okeys, oyear = okeys[o], oyear[o]
        lkeys = keys[~om]
        lnum = g.column("num").to_numpy()[~om]
        lden = g.column("den").to_numpy()[~om]
        empty = pa.table({"o_year": pa.array([], pa.int64()),
                          "numerator_q4": pa.array([], pa.int64()),
                          "denominator_q4": pa.array([], pa.int64())})
        if not len(okeys) or not len(lkeys):
            return empty
        pos = np.minimum(np.searchsorted(okeys, lkeys), len(okeys) - 1)
        hit = okeys[pos] == lkeys
        if not hit.any():
            return empty
        yr = oyear[pos[hit]]
        uk, inv = np.unique(yr, return_inverse=True)
        num = np.zeros(len(uk), np.int64)
        den = np.zeros(len(uk), np.int64)
        np.add.at(num, inv, lnum[hit])
        np.add.at(den, inv, lden[hit])
        return pa.table({"o_year": pa.array(uk, pa.int64()),
                         "numerator_q4": pa.array(num, pa.int64()),
                         "denominator_q4": pa.array(den, pa.int64())})

    parts = ord_yr.map_batches(orders_tag, batch_format="pyarrow") \
        .union(line).groupby("_jb").map_groups(
        join_reduce, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return pa.table({"o_year": pa.array([], pa.int64()),
                         "numerator_q4": pa.array([], pa.int64()),
                         "denominator_q4": pa.array([], pa.int64())})
    agg = parts.groupby("o_year", as_index=False).sum() \
        .sort_values("o_year")
    return pa.table({
        "o_year": pa.array(agg["o_year"].to_numpy(), pa.int64()),
        "numerator_q4": pa.array(agg["numerator_q4"].to_numpy(),
                                 pa.int64()),
        "denominator_q4": pa.array(agg["denominator_q4"].to_numpy(),
                                   pa.int64())})


def order_gap_stats(sf_dir: str, n_buckets: int = 64) -> pa.Table:
    """LAG-window shape: per-nation statistics of the day gaps between
    a customer's consecutive orders (ordered by o_orderdate,
    o_orderkey — the deterministic LAG frame). Output (n_name,
    n_custs, n_gaps, sum_gap_days, max_gap_days) ordered by n_name;
    n_custs counts customers with at least two orders. Order dates sit
    on the midnight grid, so gaps are exact integer days.

    Scale shape: ONE hash(custkey) exchange co-locates each customer's
    orders; the per-bucket kernel lexsorts once, diffs within customer
    runs, resolves nationkey from the footer-gated broadcast
    custkey→nationkey map (≤8M-row rule of
    :func:`local_supplier_volume`; a bigger dimension swaps into
    :func:`equi_join`), and pre-reduces to per-nation partials —
    nation cardinality bounds what reaches the driver."""
    import os

    import ray
    import pyarrow.parquet as pq

    from bge_m3_onnx_ray.hashing import splitmix64

    cust_path = os.path.join(sf_dir, "customer.parquet")
    orders = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                             columns=["o_custkey", "o_orderkey",
                                      "o_orderdate"])
    big_cust = pq.ParquetFile(cust_path).metadata.num_rows > 8_000_000
    if not big_cust:
        ct = pq.read_table(cust_path, columns=["c_custkey", "c_nationkey"])
        ck = ct.column("c_custkey").to_numpy()
        cn = ct.column("c_nationkey").to_numpy().astype(np.int64)
        co = np.argsort(ck)
        cust_ref = ray.put((ck[co], cn[co]))
        src = orders
    else:
        cust_ref = None
        cust = rd.read_parquet(cust_path,
                               columns=["c_custkey", "c_nationkey"])
        src = equi_join(orders, cust, "o_custkey", "c_custkey",
                        ["c_nationkey"], n_buckets=n_buckets)

    def tag(t: pa.Table) -> pa.Table:
        k = t.column("o_custkey").to_numpy().astype(np.uint64)
        return t.append_column("_jb", pa.array(
            (splitmix64(k) % np.uint64(n_buckets)).astype(np.int64)))

    def kernel(g: pa.Table) -> pa.Table:
        cust = g.column("o_custkey").to_numpy()
        ok = g.column("o_orderkey").to_numpy()
        od = g.column("o_orderdate").cast(pa.timestamp("us")) \
            .cast(pa.int64()).to_numpy()
        empty = pa.table({"nk": pa.array([], pa.int64()),
                          "n_custs": pa.array([], pa.int64()),
                          "n_gaps": pa.array([], pa.int64()),
                          "sum_gap_days": pa.array([], pa.int64()),
                          "max_gap_days": pa.array([], pa.int64())})
        if not len(cust):
            return empty
        o = np.lexsort((ok, od, cust))
        cust, od = cust[o], od[o]
        same = np.concatenate([[False], np.diff(cust) == 0])
        gaps = np.diff(od, prepend=od[:1]) // 86_400_000_000
        gaps = gaps[same]                       # one per LAG pair
        gcust = cust[same]
        if not len(gcust):
            return empty
        if cust_ref is not None:
            ckk, cnn = ray.get(cust_ref)
            pos = np.minimum(np.searchsorted(ckk, gcust), len(ckk) - 1)
            nat = cnn[pos]
        else:
            nk_col = g.column("c_nationkey").to_numpy().astype(np.int64)
            nat = nk_col[o][same]
        # per-customer first-gap flags count distinct multi-order custs
        first = np.concatenate([[True], np.diff(gcust) != 0])
        uk, inv = np.unique(nat, return_inverse=True)
        ncust = np.zeros(len(uk), np.int64)
        np.add.at(ncust, inv[first], 1)
        ngap = np.bincount(inv, minlength=len(uk)).astype(np.int64)
        sgap = np.zeros(len(uk), np.int64)
        np.add.at(sgap, inv, gaps)
        mgap = np.full(len(uk), -1, np.int64)
        np.maximum.at(mgap, inv, gaps)
        return pa.table({"nk": pa.array(uk, pa.int64()),
                         "n_custs": pa.array(ncust, pa.int64()),
                         "n_gaps": pa.array(ngap, pa.int64()),
                         "sum_gap_days": pa.array(sgap, pa.int64()),
                         "max_gap_days": pa.array(mgap, pa.int64())})

    parts = src.map_batches(tag, batch_format="pyarrow") \
        .groupby("_jb").map_groups(kernel,
                                   batch_format="pyarrow").to_pandas()
    nat = pq.read_table(os.path.join(sf_dir, "nation.parquet"),
                        columns=["n_nationkey", "n_name"])
    name_of = dict(zip(nat.column("n_nationkey").to_pylist(),
                       nat.column("n_name").to_pylist()))
    if parts.empty:
        return pa.table({"n_name": pa.array([], pa.string()),
                         "n_custs": pa.array([], pa.int64()),
                         "n_gaps": pa.array([], pa.int64()),
                         "sum_gap_days": pa.array([], pa.int64()),
                         "max_gap_days": pa.array([], pa.int64())})
    agg = parts.groupby("nk", as_index=False).agg(
        n_custs=("n_custs", "sum"), n_gaps=("n_gaps", "sum"),
        sum_gap_days=("sum_gap_days", "sum"),
        max_gap_days=("max_gap_days", "max"))
    agg["n_name"] = [name_of[int(k)] for k in agg["nk"]]
    agg = agg.sort_values("n_name")
    return pa.table({
        "n_name": pa.array(agg["n_name"].tolist(), pa.string()),
        "n_custs": pa.array(agg["n_custs"].to_numpy(), pa.int64()),
        "n_gaps": pa.array(agg["n_gaps"].to_numpy(), pa.int64()),
        "sum_gap_days": pa.array(agg["sum_gap_days"].to_numpy(),
                                 pa.int64()),
        "max_gap_days": pa.array(agg["max_gap_days"].to_numpy(),
                                 pa.int64())})


def customer_running_totals(sf_dir: str, k: int = 20,
                            n_buckets: int = 64) -> pa.Table:
    """Running-sum window shape: the cumulative spend trajectory of the
    top-``k`` customers by total order value. Output (c_custkey,
    o_orderkey, o_orderdate_us, o_totalprice_q2, running_q2, rn)
    ordered (c_custkey, rn) — running_q2 is SUM OVER (PARTITION BY
    customer ORDER BY o_orderdate, o_orderkey ROWS UNBOUNDED
    PRECEDING) on the exact cent grid, rn the matching row_number.

    Scale shape: per-customer spend reduces distributedly
    (``bucket_reduce`` on hash(custkey)); each reduced block keeps its
    LOCAL (spend desc, custkey) top-k so the driver merges
    ≤ k · n_blocks candidate rows; the k winner keys broadcast into a
    pruned orders scan, and ONE hash(custkey) exchange co-locates each
    winner's orders for the per-bucket cumsum kernel — the result is
    bounded by the winners' order counts, never the orders table."""
    import os

    import ray

    from bge_m3_onnx_ray.hashing import splitmix64
    from bge_m3_onnx_ray.stages._groups import bucket_reduce

    def spend_partial(t: pa.Table) -> pa.Table:
        ck = t.column("o_custkey").to_numpy()
        p2 = np.rint(t.column("o_totalprice").to_numpy()
                     * 100).astype(np.int64)
        uk, inv = np.unique(ck, return_inverse=True)
        s = np.zeros(len(uk), np.int64)
        np.add.at(s, inv, p2)
        return pa.table({"o_custkey": pa.array(uk, pa.int64()),
                         "s": pa.array(s, pa.int64())})

    sums = bucket_reduce(
        rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                        columns=["o_custkey", "o_totalprice"]).map_batches(
            spend_partial, batch_format="pyarrow"),
        ["o_custkey"], [("s", "sum", "spend_q2")], n_buckets)

    def local_topk(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t
        sp = t.column("spend_q2").to_numpy()
        ck = t.column("o_custkey").to_numpy()
        keep = np.lexsort((ck, -sp))[:k]
        return t.take(pa.array(np.sort(keep), pa.int64()))

    cand = sums.map_batches(local_topk,
                            batch_format="pyarrow").to_pandas()
    cand = cand.sort_values(["spend_q2", "o_custkey"],
                            ascending=[False, True]).head(k)
    win_ref = ray.put(np.sort(cand["o_custkey"].to_numpy()
                              .astype(np.int64)))

    def pick(t: pa.Table) -> pa.Table:
        wk = ray.get(win_ref)
        ck = t.column("o_custkey").to_numpy()
        pos = np.minimum(np.searchsorted(wk, ck), len(wk) - 1)
        hit = wk[pos] == ck
        t = t.filter(pa.array(hit))
        kk = t.column("o_custkey").to_numpy().astype(np.uint64)
        return t.append_column("_jb", pa.array(
            (splitmix64(kk) % np.uint64(n_buckets)).astype(np.int64)))

    def cumsum_kernel(g: pa.Table) -> pa.Table:
        ck = g.column("o_custkey").to_numpy()
        ok = g.column("o_orderkey").to_numpy()
        od = g.column("o_orderdate").cast(pa.timestamp("us")) \
            .cast(pa.int64()).to_numpy()
        p2 = np.rint(g.column("o_totalprice").to_numpy()
                     * 100).astype(np.int64)
        if not len(ck):
            return pa.table({"c_custkey": pa.array([], pa.int64()),
                             "o_orderkey": pa.array([], pa.int64()),
                             "o_orderdate_us": pa.array([], pa.int64()),
                             "o_totalprice_q2": pa.array([], pa.int64()),
                             "running_q2": pa.array([], pa.int64()),
                             "rn": pa.array([], pa.int64())})
        o = np.lexsort((ok, od, ck))
        ck, ok, od, p2 = ck[o], ok[o], od[o], p2[o]
        run = np.cumsum(p2)
        first = np.concatenate([[0], np.flatnonzero(np.diff(ck)) + 1])
        base = np.zeros(len(ck), np.int64)
        base[first[1:]] = run[first[1:] - 1]
        base = np.maximum.accumulate(base)
        rn = np.arange(len(ck), dtype=np.int64) \
            - np.repeat(first, np.diff(np.concatenate([first, [len(ck)]]))) + 1
        return pa.table({
            "c_custkey": pa.array(ck, pa.int64()),
            "o_orderkey": pa.array(ok, pa.int64()),
            "o_orderdate_us": pa.array(od, pa.int64()),
            "o_totalprice_q2": pa.array(p2, pa.int64()),
            "running_q2": pa.array(run - base, pa.int64()),
            "rn": pa.array(rn, pa.int64())})

    rows = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderkey", "o_orderdate",
                 "o_totalprice"]).map_batches(
        pick, batch_format="pyarrow").groupby("_jb").map_groups(
        cumsum_kernel, batch_format="pyarrow").to_pandas()
    rows = rows.sort_values(["c_custkey", "rn"]).reset_index(drop=True)
    return pa.Table.from_pandas(rows, preserve_index=False)


def order_priority_check(sf_dir: str, date_from: str = "1996-01-01",
                         date_to: str = "1996-04-01",
                         n_buckets: int = 64) -> pa.Table:
    """TPC-H Q4 shape: orders placed in one quarter that had at least
    one RETURNED lineitem (l_returnflag = 'R' — the fixture's stand-in
    for the commit-date breach), counted per order priority. Output
    (o_orderpriority, order_count) ordered by priority.

    Scale shape: the EXISTS is the repo's distributed
    :func:`semi_anti_join` — ONE hash(orderkey) exchange; the lineitem
    side ships deduplicated int64 orderkeys only (returnflag filter
    applied at the scan), the orders side is date-pruned at the read;
    surviving rows pre-reduce to per-priority partials (priority
    cardinality is 5), so the driver sums tiny tables."""
    import os

    import pyarrow.dataset as pads

    cut0 = pa.scalar(np.datetime64(date_from + "T00:00:00", "us"),
                     pa.timestamp("us"))
    cut1 = pa.scalar(np.datetime64(date_to + "T00:00:00", "us"),
                     pa.timestamp("us"))
    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderpriority"],
        filter=(pads.field("o_orderdate") >= cut0)
               & (pads.field("o_orderdate") < cut1))
    returned = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey"],
        filter=pads.field("l_returnflag") == "R")
    hits = semi_anti_join(orders, returned, "o_orderkey", "l_orderkey",
                          n_buckets=n_buckets)

    def pri_partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        vc = pc.value_counts(t.column("o_orderpriority"))
        return pa.table({
            "o_orderpriority": vc.field("values").cast(pa.string()),
            "c": vc.field("counts").cast(pa.int64())})

    parts = hits.map_batches(pri_partial,
                             batch_format="pyarrow").to_pandas()
    if parts.empty:
        return pa.table({"o_orderpriority": pa.array([], pa.string()),
                         "order_count": pa.array([], pa.int64())})
    agg = parts.groupby("o_orderpriority", as_index=False)["c"].sum() \
        .sort_values("o_orderpriority")
    return pa.table({
        "o_orderpriority": pa.array(agg["o_orderpriority"].tolist(),
                                    pa.string()),
        "order_count": pa.array(agg["c"].to_numpy(), pa.int64())})


def late_shipment_counts(sf_dir: str, late_days: int = 30,
                         n_buckets: int = 64) -> pa.Table:
    """TPC-H Q12 shape: lineitems shipped more than ``late_days`` after
    their order date ("late shipments"), counted per line status and
    split into high-priority (1-URGENT / 2-HIGH) vs low-priority
    orders. Output (l_linestatus, high_line_count, low_line_count)
    ordered by status. The lateness predicate is a RESIDUAL condition —
    it compares columns from BOTH sides, so it cannot push into either
    scan and must run inside the join kernel.

    Scale shape: ONE hash(orderkey) tagged-union exchange (the
    :func:`nation_volume_shipping` plan): orders ship (orderkey,
    is_high, orderdate), lineitems ship per-row (orderkey, shipdate,
    status code); each bucket's kernel joins by searchsorted, applies
    the residual date comparison vectorized, and reduces to ≤ 4 partial
    rows — per-(status, priority-class) counts — per bucket."""
    import os

    from bge_m3_onnx_ray.hashing import splitmix64

    def orders_tag(t: pa.Table) -> pa.Table:
        ok = t.column("o_orderkey").to_numpy()
        pri = t.column("o_orderpriority").to_pylist()
        high = np.array([p in ("1-URGENT", "2-HIGH") for p in pri],
                        np.int64)
        od = t.column("o_orderdate").cast(pa.timestamp("us")) \
            .cast(pa.int64()).to_numpy()
        return pa.table({
            "k": pa.array(ok, pa.int64()),
            "v1": pa.array(high, pa.int64()),          # is_high
            "v2": pa.array(od, pa.int64()),            # orderdate_us
            "_side": pa.array(np.zeros(len(ok), np.int64)),
            "_jb": pa.array((splitmix64(ok.astype(np.uint64))
                             % np.uint64(n_buckets)).astype(np.int64))})

    def line_tag(t: pa.Table) -> pa.Table:
        ok = t.column("l_orderkey").to_numpy()
        sd = t.column("l_shipdate").cast(pa.timestamp("us")) \
            .cast(pa.int64()).to_numpy()
        st = t.column("l_linestatus").to_pylist()
        code = np.array([0 if s == "F" else 1 for s in st], np.int64)
        return pa.table({
            "k": pa.array(ok, pa.int64()),
            "v1": pa.array(code, pa.int64()),          # status code
            "v2": pa.array(sd, pa.int64()),            # shipdate_us
            "_side": pa.array(np.ones(len(ok), np.int64)),
            "_jb": pa.array((splitmix64(ok.astype(np.uint64))
                             % np.uint64(n_buckets)).astype(np.int64))})

    late_us = np.int64(late_days) * 86_400_000_000

    def kernel(g: pa.Table) -> pa.Table:
        side = g.column("_side").to_numpy()
        keys = g.column("k").to_numpy()
        v1 = g.column("v1").to_numpy()
        v2 = g.column("v2").to_numpy()
        om = side == 0
        okeys, ohigh, odate = keys[om], v1[om], v2[om]
        o = np.argsort(okeys, kind="stable")
        okeys, ohigh, odate = okeys[o], ohigh[o], odate[o]
        lkeys, lcode, lship = keys[~om], v1[~om], v2[~om]
        empty = pa.table({"status_code": pa.array([], pa.int64()),
                          "high": pa.array([], pa.int64()),
                          "low": pa.array([], pa.int64())})
        if not len(okeys) or not len(lkeys):
            return empty
        pos = np.minimum(np.searchsorted(okeys, lkeys), len(okeys) - 1)
        hit = okeys[pos] == lkeys
        # residual predicate: shipped more than late_days after order
        late = hit & (lship > odate[pos] + late_us)
        if not late.any():
            return empty
        code = lcode[late]
        high = ohigh[pos[late]]
        key = code * 2 + high
        cnt = np.bincount(key, minlength=4).astype(np.int64)
        return pa.table({
            "status_code": pa.array([0, 0, 1, 1], pa.int64()),
            "high": pa.array([0, cnt[1], 0, cnt[3]], pa.int64()),
            "low": pa.array([cnt[0], 0, cnt[2], 0], pa.int64())})

    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderpriority", "o_orderdate"]) \
        .map_batches(orders_tag, batch_format="pyarrow")
    line = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_linestatus", "l_shipdate"]) \
        .map_batches(line_tag, batch_format="pyarrow")
    parts = orders.union(line).groupby("_jb").map_groups(
        kernel, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return pa.table({"l_linestatus": pa.array([], pa.string()),
                         "high_line_count": pa.array([], pa.int64()),
                         "low_line_count": pa.array([], pa.int64())})
    agg = parts.groupby("status_code", as_index=False).sum() \
        .sort_values("status_code")
    keep = (agg["high"] + agg["low"]) > 0
    agg = agg[keep]
    return pa.table({
        "l_linestatus": pa.array(["F" if c == 0 else "O"
                                  for c in agg["status_code"]],
                                 pa.string()),
        "high_line_count": pa.array(agg["high"].to_numpy(), pa.int64()),
        "low_line_count": pa.array(agg["low"].to_numpy(), pa.int64())})


def suppliers_kept_waiting(sf_dir: str, k: int = 10,
                           n_buckets: int = 64) -> pa.Table:
    """TPC-H Q21 shape: suppliers who were the SOLE failure on
    multi-supplier orders — supplier s has a returned lineitem
    (l_returnflag = 'R', the fixture's commit-breach stand-in) on an
    order with >= 2 distinct suppliers where NO other supplier's item
    was returned. Output top-``k`` (s_name, numwait) ordered
    (numwait desc, s_name) — numwait counts DISTINCT such orders.

    The multi-EXISTS self-join runs as ONE hash(orderkey) exchange over
    a 3-column lineitem projection: each bucket's kernel finds distinct
    (order, supplier) pairs by sort + run detection, reduces per order
    to (n_suppliers, n_returned_suppliers), and selects the sole
    returned supplier where (n >= 2, n_r == 1) — emitting per-supplier
    partial counts. A ``bucket_reduce`` on suppkey finishes the sums;
    per-block local top-k bounds the driver merge (exact because
    supplier names are zero-padded, so name order == suppkey order);
    names decorate from a suppkey-pruned read after the cut."""
    import os

    import pyarrow.parquet as pq

    from bge_m3_onnx_ray.hashing import splitmix64
    from bge_m3_onnx_ray.stages._groups import bucket_reduce

    def tag(t: pa.Table) -> pa.Table:
        ok = t.column("l_orderkey").to_numpy().astype(np.uint64)
        return pa.table({
            "l_orderkey": t.column("l_orderkey"),
            "l_suppkey": t.column("l_suppkey"),
            "r": pa.array((np.asarray(
                t.column("l_returnflag").to_pandas()) == "R")
                .astype(np.int64)),
            "_jb": pa.array((splitmix64(ok) % np.uint64(n_buckets))
                            .astype(np.int64))})

    def kernel(g: pa.Table) -> pa.Table:
        ok = g.column("l_orderkey").to_numpy()
        sk = g.column("l_suppkey").to_numpy()
        rf = g.column("r").to_numpy()
        empty = pa.table({"l_suppkey": pa.array([], pa.int64()),
                          "numwait": pa.array([], pa.int64())})
        if not len(ok):
            return empty
        o = np.lexsort((sk, ok))
        ok, sk, rf = ok[o], sk[o], rf[o]
        # distinct (order, supplier) pairs with any-returned flag
        newpair = np.concatenate([[True], (np.diff(ok) != 0)
                                  | (np.diff(sk) != 0)])
        starts = np.flatnonzero(newpair)
        ends = np.append(starts[1:], len(ok))
        pair_ok = ok[starts]
        pair_sk = sk[starts]
        pair_r = np.maximum.reduceat(rf, starts)
        pair_r[ends == starts] = 0  # unreachable, defensive
        # per-order reduction over pairs
        ofirst = np.concatenate([[0],
                                 np.flatnonzero(np.diff(pair_ok)) + 1])
        ocnt = np.diff(np.append(ofirst, len(pair_ok)))
        oid = np.repeat(np.arange(len(ofirst)), ocnt)
        n_r = np.zeros(len(ofirst), np.int64)
        np.add.at(n_r, oid, pair_r)
        ridx = np.zeros(len(ofirst), np.int64)
        np.add.at(ridx, oid, pair_r * np.arange(len(pair_ok)))
        sole = (ocnt >= 2) & (n_r == 1)
        if not sole.any():
            return empty
        winners = pair_sk[ridx[sole]]
        uk, inv = np.unique(winners, return_inverse=True)
        return pa.table({
            "l_suppkey": pa.array(uk, pa.int64()),
            "numwait": pa.array(np.bincount(inv, minlength=len(uk))
                                .astype(np.int64))})

    parts = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_suppkey", "l_returnflag"]).map_batches(
        tag, batch_format="pyarrow").groupby("_jb").map_groups(
        kernel, batch_format="pyarrow")
    sums = bucket_reduce(parts, ["l_suppkey"],
                         [("numwait", "sum", "numwait")], n_buckets)

    def local_topk(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t
        nw = t.column("numwait").to_numpy()
        sk = t.column("l_suppkey").to_numpy()
        keep = np.lexsort((sk, -nw))[:k]
        return t.take(pa.array(np.sort(keep), pa.int64()))

    cand = sums.map_batches(local_topk,
                            batch_format="pyarrow").to_pandas()
    if cand.empty:
        return pa.table({"s_name": pa.array([], pa.string()),
                         "numwait": pa.array([], pa.int64())})
    skeys = sorted(int(s) for s in cand["l_suppkey"])
    names = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                          columns=["s_suppkey", "s_name"],
                          filters=[("s_suppkey", "in", skeys)])
    name_of = dict(zip(names.column("s_suppkey").to_pylist(),
                       names.column("s_name").to_pylist()))
    cand["s_name"] = [name_of[int(s)] for s in cand["l_suppkey"]]
    cand = cand.sort_values(["numwait", "s_name"],
                            ascending=[False, True]).head(k)
    return pa.table({
        "s_name": pa.array(cand["s_name"].tolist(), pa.string()),
        "numwait": pa.array(cand["numwait"].to_numpy(), pa.int64())})
