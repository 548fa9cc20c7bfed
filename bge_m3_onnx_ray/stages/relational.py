"""Relational lookups for pipeline plumbing: broadcast hash joins.

The reference has no relational joins (SURVEY.md §2.5) — these exist
because a training-data pipeline constantly joins fact streams against
small dimension tables (doc metadata, quality labels, conversation
attributes). Pattern per the guide: ``ray.put`` the small side once, map
the big side with a vectorized lookup — no shuffle. Both-sides-large
joins would use the bucketed-groupby pattern; not needed here.
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


def revenue_by_segment(sf_dir: str) -> rd.Dataset:
    """TPC-H-flavored showcase: lineitem ⨝ orders ⨝ customer, revenue per
    market segment. Both dimension sides are broadcast (customer into
    orders on the driver — tiny; the resulting orderkey→segment map into
    the lineitem scan); the only aggregation is a partial-combine then a
    5-row groupby. Output (c_mktsegment, n_items, revenue_q0)."""
    import os

    import pyarrow.parquet as pq

    cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey", "c_mktsegment"]).to_pandas()
    orders = pq.read_table(os.path.join(sf_dir, "orders.parquet"),
                           columns=["o_orderkey", "o_custkey"]).to_pandas()
    omap = orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
    omap = omap[["o_orderkey", "c_mktsegment"]].rename(
        columns={"o_orderkey": "l_orderkey"})

    line = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount"])
    joined = broadcast_join(line, omap, "l_orderkey", ["c_mktsegment"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["revenue"] = df.l_extendedprice * (1.0 - df.l_discount)
        g = df.groupby("c_mktsegment", sort=False).agg(
            n_items=("revenue", "size"), revenue=("revenue", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = joined.map_batches(partial, batch_format="pyarrow",
                             batch_size=65536) \
        .groupby("c_mktsegment").aggregate(
            Sum("n_items", alias_name="n_items"),
            Sum("revenue", alias_name="revenue"))

    def finalize(batch: pa.Table) -> pa.Table:
        # integer dollars (round-half-up): revenue terms lie on a 1e-4
        # decimal grid, so finer quantizations sit ON the grid and flip
        # under cross-engine summation noise
        rev = batch.column("revenue").to_numpy()
        return batch.drop_columns(["revenue"]).append_column(
            "revenue_q0",
            pa.array(np.floor(rev + 0.5).astype(np.int64), pa.int64()))

    return agg.map_batches(finalize, batch_format="pyarrow")
