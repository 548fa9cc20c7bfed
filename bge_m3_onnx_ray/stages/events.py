"""Event-stream-shaped operators over the ``events`` table
(event_id, ts, user_id, event_type, value, props).

Ray Data has no event-time windows; these follow the guide's pattern:
tumbling windows = keyed truncation + pre-aggregated groupby; session
windows = ``groupby(user).map_groups`` over ts-sorted groups
(gaps-and-islands). Ordering assumption: windowing is per-key and each
key's rows fit one group (bounded per-user history)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Count, Sum


def hourly_agg(ds: rd.Dataset) -> rd.Dataset:
    """Tumbling 1h window per event_type: n_events, sum_value_q6.
    Pre-aggregated per batch before the groupby (partial combine)."""

    def partial(batch: pa.Table) -> pa.Table:
        # Arrow/numpy all the way (no per-batch pandas round-trip): hour
        # as epoch seconds (int64) — engine-neutral window key. The
        # timestamp[us] cast normalizes any parquet unit (ms/us/ns)
        # before the integer view; int64 floor-division == floor("h")
        # for negative epochs too.
        ts = batch.column("ts").cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        hour = (ts // 3_600_000_000) * 3600
        et = batch.column("event_type").combine_chunks().dictionary_encode()
        codes = np.asarray(et.indices).astype(np.int64)
        val = batch.column("value").to_numpy()
        if not len(codes):
            return pa.table({"event_type": pa.array([], pa.string()),
                             "hour": pa.array([], pa.int64()),
                             "n_events": pa.array([], pa.int64()),
                             "sum_value": pa.array([], pa.float64())})
        order = np.lexsort((hour, codes))
        c, h, v = codes[order], hour[order], val[order]
        brk = np.empty(len(c), bool)
        brk[0] = True
        brk[1:] = (np.diff(c) != 0) | (np.diff(h) != 0)
        starts = np.flatnonzero(brk)
        return pa.table({
            "event_type": et.dictionary.take(pa.array(c[starts]))
                .cast(pa.string()),
            "hour": pa.array(h[starts], pa.int64()),
            "n_events": pa.array(
                np.diff(np.concatenate([starts, [len(c)]])).astype(np.int64),
                pa.int64()),
            "sum_value": pa.array(np.add.reduceat(v, starts), pa.float64())})

    from bge_m3_onnx_ray.stages._groups import bucket_reduce
    agg = bucket_reduce(
        ds.select_columns(["ts", "event_type", "value"]).map_batches(
            partial, batch_format="pyarrow", batch_size=65536),
        ["event_type", "hour"],
        [("n_events", "sum", "n_events"), ("sum_value", "sum", "sum_value")])

    def finalize(batch: pa.Table) -> pa.Table:
        # round-half-up at q2: event values are 2-decimal, so exact sums
        # lie ON the 0.01 grid and floor would straddle the boundary under
        # summation-order float noise; half-grid points cannot occur for
        # decimal data, so +0.5-then-floor is engine-stable.
        sv = batch.column("sum_value").to_numpy()
        return batch.drop_columns(["sum_value"]).append_column(
            "sum_value_q2",
            pa.array(np.floor(sv * 100.0 + 0.5).astype(np.int64), pa.int64()))

    return agg.map_batches(finalize, batch_format="pyarrow")


def moving_hourly(ds: rd.Dataset, window: int = 3) -> rd.Dataset:
    """Pipeline aggregations over the hourly series — the Elasticsearch
    ``moving_fn`` + ``derivative`` pair on a date_histogram with
    min_doc_count=0: per event_type, the DENSE hour series from its
    first to last bucket (gap hours = 0), a trailing ``window``-bucket
    integer moving average, and the bucket-to-bucket delta. Output
    (event_type, hour, sum_value_q2, mavg_q4, delta_q2); the first
    bucket's delta is taken against an implicit empty predecessor and
    partial leading windows average over the buckets that exist, both
    as ES does.

    All arithmetic is integer on the q2-quantized sums so the SQL
    oracle matches exactly: mavg_q4 = trunc-div(wsum*100, wn) —
    TRUNCATING division, matching SQL's BIGINT ``//`` on any sign.

    Scale shape: this runs on the OUTPUT of :func:`hourly_agg` (already
    reduced), so a group is one event_type's full series — bounded by
    calendar hours in the data's time range, never by event count. The
    window pass is one cumsum per group."""
    hourly = hourly_agg(ds)

    def kernel(g: pa.Table) -> pa.Table:
        hours = g.column("hour").to_numpy()
        q2 = g.column("sum_value_q2").to_numpy()
        order = np.argsort(hours)
        hours, q2 = hours[order], q2[order]
        dense_h = np.arange(hours[0], hours[-1] + 1, 3600)
        dq = np.zeros(len(dense_h), np.int64)
        dq[(hours - hours[0]) // 3600] = q2
        idx = np.arange(len(dense_h))
        csum = np.concatenate([[0], np.cumsum(dq)])
        start = np.maximum(idx - window + 1, 0)
        wsum = csum[idx + 1] - csum[start]
        wn = idx + 1 - start
        num = wsum * 100
        mavg = np.sign(num) * (np.abs(num) // wn)    # trunc toward zero
        delta = dq - np.concatenate([[0], dq[:-1]])
        et = g.column("event_type")[0].as_py()
        return pa.table({
            "event_type": pa.array([et] * len(dense_h), pa.string()),
            "hour": pa.array(dense_h, pa.int64()),
            "sum_value_q2": pa.array(dq, pa.int64()),
            "mavg_q4": pa.array(mavg.astype(np.int64), pa.int64()),
            "delta_q2": pa.array(delta, pa.int64())})

    return hourly.groupby("event_type").map_groups(
        kernel, batch_format="pyarrow")


def hopping_agg(ds: rd.Dataset, window_s: int = 3600,
                hop_s: int = 900) -> rd.Dataset:
    """HOPPING (sliding) windows per event_type — the Flink/Beam/Kafka-
    Streams hop shape: windows of ``window_s`` seconds starting every
    ``hop_s`` seconds, so each event lands in ``window_s // hop_s``
    overlapping windows. Output (event_type, wstart, n_events,
    sum_value_q2) with ``wstart`` = window start in epoch seconds.

    Same two-level shape as :func:`hourly_agg`: the per-batch partial
    TILES the batch into its window replicas (vectorized — the fan-out
    factor is the constant window/hop ratio, not data-dependent) and
    pre-aggregates before the one low-cardinality bucket_reduce."""
    if window_s % hop_s != 0:
        raise ValueError("window_s must be a multiple of hop_s "
                         f"({window_s} % {hop_s} != 0)")
    nw = window_s // hop_s

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        base = (ts // (hop_s * 1_000_000)) * hop_s
        et = batch.column("event_type").combine_chunks().dictionary_encode()
        codes = np.asarray(et.indices).astype(np.int64)
        val = batch.column("value").to_numpy()
        if not len(codes):
            return pa.table({"event_type": pa.array([], pa.string()),
                             "wstart": pa.array([], pa.int64()),
                             "n_events": pa.array([], pa.int64()),
                             "sum_value": pa.array([], pa.float64())})
        c = np.tile(codes, nw)
        v = np.tile(val, nw)
        w = np.concatenate([base - j * hop_s for j in range(nw)])
        order = np.lexsort((w, c))
        c, w, v = c[order], w[order], v[order]
        brk = np.empty(len(c), bool)
        brk[0] = True
        brk[1:] = (np.diff(c) != 0) | (np.diff(w) != 0)
        starts = np.flatnonzero(brk)
        return pa.table({
            "event_type": et.dictionary.take(pa.array(c[starts]))
                .cast(pa.string()),
            "wstart": pa.array(w[starts], pa.int64()),
            "n_events": pa.array(
                np.diff(np.concatenate([starts, [len(c)]])).astype(np.int64),
                pa.int64()),
            "sum_value": pa.array(np.add.reduceat(v, starts), pa.float64())})

    from bge_m3_onnx_ray.stages._groups import bucket_reduce
    agg = bucket_reduce(
        ds.select_columns(["ts", "event_type", "value"]).map_batches(
            partial, batch_format="pyarrow", batch_size=65536),
        ["event_type", "wstart"],
        [("n_events", "sum", "n_events"), ("sum_value", "sum", "sum_value")])

    def finalize(batch: pa.Table) -> pa.Table:
        # same q2 round-half-up argument as hourly_agg's finalize
        sv = batch.column("sum_value").to_numpy()
        return batch.drop_columns(["sum_value"]).append_column(
            "sum_value_q2",
            pa.array(np.floor(sv * 100.0 + 0.5).astype(np.int64), pa.int64()))

    return agg.map_batches(finalize, batch_format="pyarrow")


def sessionize(ds: rd.Dataset, gap_minutes: int = 30,
               n_buckets: int = 512) -> rd.Dataset:
    """Session windows per user (new session when the gap to the previous
    event exceeds ``gap_minutes``). Output one row per session:
    (user_id, session_id, n_events, start_us, end_us).

    One shuffle, keyed by a HASH BUCKET of user_id rather than user_id
    itself: ``groupby(user).map_groups`` pays one Python call per user
    (~20 us x users); bucketing gives each call ~users/n_buckets users
    and a fully vectorized multi-user gaps-and-islands kernel (same
    pattern as dedup._candidate_pairs). ``n_buckets`` scales with cluster
    size at 100 TB — it only needs to exceed rows / target_group_rows."""
    gap_us = np.int64(gap_minutes * 60) * 1_000_000

    def per_bucket(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        n = g.num_rows
        order = pc.sort_indices(
            g, sort_keys=[("user_id", "ascending"), ("ts", "ascending"),
                          ("event_id", "ascending")])
        tbl = g.take(order)
        users = tbl.column("user_id").combine_chunks()
        # normalize ANY timestamp unit (ms/us/ns parquet inputs) to
        # epoch-us exactly before the int64 view — a raw int64 cast of a
        # timestamp[ms] column would compare millisecond ticks to gap_us
        ts = tbl.column("ts").cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        uchg = np.empty(n, bool)
        uchg[0] = True
        uchg[1:] = np.asarray(
            pc.not_equal(users.slice(1), users.slice(0, n - 1))
            .to_numpy(zero_copy_only=False))
        brk = uchg.copy()
        brk[1:] |= np.diff(ts) > gap_us
        starts = np.flatnonzero(brk)             # session start rows
        m = len(starts)
        ends = np.empty(m, np.int64)
        ends[:-1] = starts[1:]
        ends[-1] = n
        # session_id = 1-based ordinal within its user: global session
        # ordinal minus the ordinal of the user's first session
        user_first = np.flatnonzero(uchg[starts])  # sessions starting a user
        sess_user = np.zeros(m, np.int64)
        sess_user[user_first] = np.arange(m, dtype=np.int64)[user_first]
        np.maximum.accumulate(sess_user, out=sess_user)
        return pa.table({
            "user_id": users.take(pa.array(starts)),
            "session_id": pa.array(
                np.arange(m, dtype=np.int64) - sess_user + 1, pa.int64()),
            "n_events": pa.array(ends - starts, pa.int64()),
            "start_us": pa.array(ts[starts], pa.int64()),
            "end_us": pa.array(ts[ends - 1], pa.int64()),
        })

    def add_bucket(t: pa.Table) -> pa.Table:
        from bge_m3_onnx_ray.hashing import P53, poly_hash
        b = (poly_hash(t.column("user_id"), P53) % np.uint64(n_buckets))
        return t.append_column("_bucket", pa.array(b.astype(np.int64)))

    return ds.select_columns(["event_id", "ts", "user_id"]) \
        .map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("_bucket").map_groups(per_bucket, batch_format="pyarrow")


def value_percentile_ranks(ds: rd.Dataset,
                           thresholds: tuple = (100, 1000, 5000)
                           ) -> rd.Dataset:
    """percentile_ranks — the INVERSE of the percentiles aggregation:
    for each event_type and each q2 threshold, what fraction (ppm) of
    events have value <= threshold. Pure map-side partial counts (one
    int per (type, threshold) per batch) + a tiny bucket_reduce; the
    exact-integer ppm ((n_le * 1e6) // n) matches SQL BIGINT division.
    Output (event_type, threshold_q2, rank_ppm, n_events)."""
    th = np.asarray(sorted(thresholds), np.int64)

    def partial(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type").combine_chunks().dictionary_encode()
        codes = np.asarray(et.indices).astype(np.int64)
        q2 = np.floor(batch.column("value").to_numpy() * 100.0 + 0.5) \
            .astype(np.int64)
        if not len(codes):
            return pa.table({"event_type": pa.array([], pa.string()),
                             "threshold_q2": pa.array([], pa.int64()),
                             "n_le": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        out_e, out_t, out_le, out_n = [], [], [], []
        for ci in range(len(et.dictionary)):
            m = codes == ci
            vals = q2[m]
            for t in th:
                out_e.append(ci)
                out_t.append(int(t))
                out_le.append(int((vals <= t).sum()))
                out_n.append(int(m.sum()))
        return pa.table({
            "event_type": et.dictionary.take(pa.array(out_e))
                .cast(pa.string()),
            "threshold_q2": pa.array(out_t, pa.int64()),
            "n_le": pa.array(out_le, pa.int64()),
            "n": pa.array(out_n, pa.int64())})

    from bge_m3_onnx_ray.stages._groups import bucket_reduce
    agg = bucket_reduce(
        ds.select_columns(["event_type", "value"]).map_batches(
            partial, batch_format="pyarrow", batch_size=65536),
        ["event_type", "threshold_q2"],
        [("n_le", "sum", "n_le"), ("n", "sum", "n")], n_buckets=16)

    def finalize(batch: pa.Table) -> pa.Table:
        n_le = batch.column("n_le").to_numpy()
        n = batch.column("n").to_numpy()
        return pa.table({
            "event_type": batch.column("event_type"),
            "threshold_q2": batch.column("threshold_q2"),
            "rank_ppm": pa.array((n_le * 1_000_000) // n, pa.int64()),
            "n_events": pa.array(n, pa.int64())})

    return agg.map_batches(finalize, batch_format="pyarrow")


def user_running_totals(ds: rd.Dataset, n_buckets: int = 512) -> rd.Dataset:
    """Per-user running total of ``value`` — the ordered-window
    cumulative sum (SQL: SUM OVER PARTITION BY user ORDER BY ts, id).
    Output one row per event: (event_id, user_id, running_q2).

    Values quantize to the q2 integer grid BEFORE accumulation
    (2-decimal inputs are exact there), so the integer cumsum equals
    the oracle's windowed sum bit-for-bit regardless of either engine's
    summation tree. Same ONE hash-bucket-of-user shuffle + vectorized
    multi-user kernel as :func:`sessionize`; per-call work is
    ~rows/n_buckets, and n_buckets scales with the cluster."""

    def per_bucket(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        n = g.num_rows
        order = pc.sort_indices(
            g, sort_keys=[("user_id", "ascending"), ("ts", "ascending"),
                          ("event_id", "ascending")])
        tbl = g.take(order)
        users = tbl.column("user_id").combine_chunks()
        q2 = np.floor(tbl.column("value").to_numpy() * 100.0 + 0.5) \
            .astype(np.int64)
        uchg = np.empty(n, bool)
        uchg[0] = True
        uchg[1:] = np.asarray(
            pc.not_equal(users.slice(1), users.slice(0, n - 1))
            .to_numpy(zero_copy_only=False))
        starts = np.flatnonzero(uchg)
        counts = np.diff(np.concatenate([starts, [n]]))
        csum = np.cumsum(q2)
        base = np.repeat(csum[starts] - q2[starts], counts)
        return pa.table({
            "event_id": tbl.column("event_id"),
            "user_id": users,
            "running_q2": pa.array(csum - base, pa.int64())})

    def add_bucket(t: pa.Table) -> pa.Table:
        from bge_m3_onnx_ray.hashing import P53, poly_hash
        b = (poly_hash(t.column("user_id"), P53) % np.uint64(n_buckets))
        return t.append_column("_bucket", pa.array(b.astype(np.int64)))

    return ds.select_columns(["event_id", "ts", "user_id", "value"]) \
        .map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("_bucket").map_groups(per_bucket, batch_format="pyarrow")


def interarrival(ds: rd.Dataset, n_buckets: int = 512) -> rd.Dataset:
    """Per-user inter-arrival LAG window: for every event, the
    microsecond delta to the SAME user's previous event and that
    event's id (SQL: ``lag(...) OVER (PARTITION BY user ORDER BY ts,
    event_id)``). First event per user → -1 sentinels (integer-stable
    across engines, unlike NULL). Output one row per event:
    (event_id, user_id, delta_us, prev_event_id).

    Same ONE hash-bucket-of-user shuffle + vectorized multi-user kernel
    as :func:`user_running_totals`; all arithmetic is int64 timestamp
    microseconds — nothing float anywhere."""

    def per_bucket(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        n = g.num_rows
        order = pc.sort_indices(
            g, sort_keys=[("user_id", "ascending"), ("ts", "ascending"),
                          ("event_id", "ascending")])
        tbl = g.take(order)
        users = tbl.column("user_id").combine_chunks()
        ts_us = tbl.column("ts").cast(pa.timestamp("us")) \
            .cast(pa.int64()).to_numpy()
        eid = tbl.column("event_id").to_numpy()
        first = np.empty(n, bool)
        first[0] = True
        first[1:] = np.asarray(
            pc.not_equal(users.slice(1), users.slice(0, n - 1))
            .to_numpy(zero_copy_only=False))
        delta = np.empty(n, np.int64)
        prev = np.empty(n, np.int64)
        delta[0], prev[0] = -1, -1
        delta[1:] = ts_us[1:] - ts_us[:-1]
        prev[1:] = eid[:-1]
        delta[first], prev[first] = -1, -1
        return pa.table({
            "event_id": pa.array(eid, pa.int64()),
            "user_id": users,
            "delta_us": pa.array(delta, pa.int64()),
            "prev_event_id": pa.array(prev, pa.int64())})

    def add_bucket(t: pa.Table) -> pa.Table:
        from bge_m3_onnx_ray.hashing import P53, poly_hash
        b = (poly_hash(t.column("user_id"), P53) % np.uint64(n_buckets))
        return t.append_column("_bucket", pa.array(b.astype(np.int64)))

    return ds.select_columns(["event_id", "ts", "user_id"]) \
        .map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("_bucket").map_groups(per_bucket, batch_format="pyarrow")


def distinct_users_daily(ds: rd.Dataset, n_buckets: int = 256) -> rd.Dataset:
    """Exact COUNT(DISTINCT user_id) per UTC day — the cardinality
    aggregation, exact path.

    Distributed shape (ONE wide shuffle): per-batch dedupe of
    (day, user) pairs (a combiner — repeated users inside a batch never
    leave it), shuffle keyed by hash-bucket of the PAIR (a pair lands in
    exactly one bucket, so per-bucket distinct counts per day sum to the
    exact global count), vectorized per-bucket dedupe + per-day count,
    then a tiny second reduce over n_days x n_buckets partial rows. The
    wide exchange carries 16 B/pair — the irreducible cost of exact
    distinct; :func:`bge_m3_onnx_ray.stages.sketch.hll_distinct` is the
    fixed-memory approximate path beyond."""
    from bge_m3_onnx_ray.hashing import P53
    from bge_m3_onnx_ray.stages._groups import bucket_reduce

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        day = (ts // 86_400_000_000) * 86400
        user = batch.column("user_id").to_numpy()
        if not len(user):
            return pa.table({"day": pa.array([], pa.int64()),
                             "user_id": pa.array([], pa.int64()),
                             "_db": pa.array([], pa.int64())})
        order = np.lexsort((user, day))
        d, u = day[order], user[order]
        head = np.empty(len(d), bool)
        head[0] = True
        head[1:] = (np.diff(d) != 0) | (np.diff(u) != 0)
        d, u = d[head], u[head]
        h = ((d.astype(np.uint64) % P53) * np.uint64(131)
             + u.astype(np.uint64) % P53) % P53
        return pa.table({"day": pa.array(d, pa.int64()),
                         "user_id": pa.array(u, pa.int64()),
                         "_db": pa.array(
                             (h % np.uint64(n_buckets)).astype(np.int64))})

    def per_bucket(g: pa.Table) -> pa.Table:
        d = g.column("day").to_numpy()
        u = g.column("user_id").to_numpy()
        order = np.lexsort((u, d))
        d, u = d[order], u[order]
        head = np.empty(len(d), bool)
        head[0] = True
        head[1:] = (np.diff(d) != 0) | (np.diff(u) != 0)
        d = d[head]
        brk = np.empty(len(d), bool)
        brk[0] = True
        brk[1:] = np.diff(d) != 0
        starts = np.flatnonzero(brk)
        return pa.table({
            "day": pa.array(d[starts], pa.int64()),
            "partial": pa.array(np.diff(np.concatenate(
                [starts, [len(d)]])).astype(np.int64), pa.int64())})

    pairs = ds.select_columns(["ts", "user_id"]) \
        .map_batches(partial, batch_format="pyarrow", batch_size=65536) \
        .groupby("_db").map_groups(per_bucket, batch_format="pyarrow")
    return bucket_reduce(pairs, ["day"],
                         [("partial", "sum", "distinct_users")],
                         n_buckets=32)


def percentiles_value_by_type(ds: rd.Dataset,
                              qs: tuple = (0.25, 0.5, 0.75, 0.95, 0.99)
                              ) -> rd.Dataset:
    """Exact percentiles of ``value`` per event_type — the metrics
    percentiles aggregation, computed the bounded-domain way: event
    values are 2-decimal, so quantizing to the q2 integer grid
    (floor(v*100+0.5)) is lossless and the whole distribution becomes a
    HISTOGRAM of (event_type, value_q2) counts. The histogram (not the
    rows) is what shuffles: per-batch partial counts -> bucket_reduce ->
    one tiny per-type quantile pass. At 100 TB the exchange is bounded
    by types x distinct grid values, independent of row count.

    Quantile rule = SQL percentile_disc / DuckDB quantile_disc: smallest
    value whose cumulative count reaches ceil(q*n) (both sides compute
    ceil on the same IEEE double product, so boundaries agree)."""
    from bge_m3_onnx_ray.stages._groups import bucket_reduce

    def partial(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type").combine_chunks().dictionary_encode()
        codes = np.asarray(et.indices).astype(np.int64)
        q2 = np.floor(batch.column("value").to_numpy() * 100.0 + 0.5) \
            .astype(np.int64)
        if not len(codes):
            return pa.table({"event_type": pa.array([], pa.string()),
                             "value_q2": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        order = np.lexsort((q2, codes))
        c, v = codes[order], q2[order]
        brk = np.empty(len(c), bool)
        brk[0] = True
        brk[1:] = (np.diff(c) != 0) | (np.diff(v) != 0)
        starts = np.flatnonzero(brk)
        return pa.table({
            "event_type": et.dictionary.take(pa.array(c[starts]))
                .cast(pa.string()),
            "value_q2": pa.array(v[starts], pa.int64()),
            "n": pa.array(np.diff(np.concatenate(
                [starts, [len(c)]])).astype(np.int64), pa.int64())})

    hist = bucket_reduce(
        ds.select_columns(["event_type", "value"]).map_batches(
            partial, batch_format="pyarrow", batch_size=65536),
        ["event_type", "value_q2"], [("n", "sum", "n")], n_buckets=32)

    def quantiles(g: pa.Table) -> pa.Table:
        et = g.column("event_type")[0].as_py()
        v = g.column("value_q2").to_numpy()
        n = g.column("n").to_numpy()
        order = np.argsort(v, kind="stable")
        v, n = v[order], n[order]
        cum = np.cumsum(n)
        total = int(cum[-1])
        out = {"event_type": pa.array([et], pa.string())}
        for q in qs:
            rank = min(max(int(np.ceil(q * total)), 1), total)
            out[f"p{int(q * 100)}"] = pa.array(
                [int(v[np.searchsorted(cum, rank)])], pa.int64())
        return pa.table(out)

    return hist.groupby("event_type").map_groups(
        quantiles, batch_format="pyarrow")


def stats_value_by_type(ds: rd.Dataset) -> rd.Dataset:
    """The stats metrics aggregation (count/min/max/sum/avg of ``value``
    per event_type), integer-exact: values quantized to the lossless q2
    grid per row, batch-level pre-aggregation (one partial row per type
    per batch), then one bucket_reduce — every reduced quantity is an
    int64, so results are order-free and engine-neutral. avg is reported
    as avg_q4 = (sum_q2 * 100) // count (exact integer division; values
    here are positive, so floor vs truncate division cannot differ —
    keep it that way or switch both sides to a signed-safe form)."""
    from bge_m3_onnx_ray.stages._groups import bucket_reduce

    def partial(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type").combine_chunks().dictionary_encode()
        codes = np.asarray(et.indices).astype(np.int64)
        q2 = np.floor(batch.column("value").to_numpy() * 100.0 + 0.5) \
            .astype(np.int64)
        if not len(codes):
            return pa.table({"event_type": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "min_q2": pa.array([], pa.int64()),
                             "max_q2": pa.array([], pa.int64()),
                             "sum_q2": pa.array([], pa.int64())})
        order = np.argsort(codes, kind="stable")
        c, v = codes[order], q2[order]
        brk = np.empty(len(c), bool)
        brk[0] = True
        brk[1:] = np.diff(c) != 0
        starts = np.flatnonzero(brk)
        return pa.table({
            "event_type": et.dictionary.take(pa.array(c[starts]))
                .cast(pa.string()),
            "n": pa.array(np.diff(np.concatenate(
                [starts, [len(c)]])).astype(np.int64), pa.int64()),
            "min_q2": pa.array(np.minimum.reduceat(v, starts), pa.int64()),
            "max_q2": pa.array(np.maximum.reduceat(v, starts), pa.int64()),
            "sum_q2": pa.array(np.add.reduceat(v, starts), pa.int64())})

    agg = bucket_reduce(
        ds.select_columns(["event_type", "value"]).map_batches(
            partial, batch_format="pyarrow", batch_size=65536),
        ["event_type"],
        [("n", "sum", "n"), ("min_q2", "min", "min_q2"),
         ("max_q2", "max", "max_q2"), ("sum_q2", "sum", "sum_q2")],
        n_buckets=8)

    def finalize(t: pa.Table) -> pa.Table:
        s = t.column("sum_q2").to_numpy()
        n = t.column("n").to_numpy()
        return t.append_column(
            "avg_q4", pa.array((s * 100) // np.maximum(n, 1), pa.int64()))

    return agg.map_batches(finalize, batch_format="pyarrow")


def daily_pipeline_aggs(ds: rd.Dataset) -> rd.Dataset:
    """Pipeline aggregations (cumulative_sum / derivative / moving window
    sum) over daily event counts. The parent agg (events per UTC day) is
    fully distributed (batch pre-agg + bucket_reduce); the pipeline part
    then runs over the BUCKET TABLE — n_days rows, small by construction
    — in one task, exactly the semantics pipeline aggs have upstream
    (they consume the reduced bucket list, never raw rows). All outputs
    are integers: order-free and engine-neutral."""
    from bge_m3_onnx_ray.stages._groups import bucket_reduce

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        day = (ts // 86_400_000_000) * 86400
        u, c = np.unique(day, return_counts=True)
        return pa.table({"day": pa.array(u, pa.int64()),
                         "n_events": pa.array(c.astype(np.int64), pa.int64())})

    daily = bucket_reduce(
        ds.select_columns(["ts"]).map_batches(
            partial, batch_format="pyarrow", batch_size=65536),
        ["day"], [("n_events", "sum", "n_events")], n_buckets=8)

    def pipeline(t: pa.Table) -> pa.Table:
        d = t.column("day").to_numpy()
        n = t.column("n_events").to_numpy()
        order = np.argsort(d, kind="stable")
        d, n = d[order], n[order]
        cum = np.cumsum(n)
        delta = np.empty(len(n), np.int64)
        delta[0] = 0
        delta[1:] = np.diff(n)
        win = np.minimum(np.arange(len(n)) + 1, 7)
        mov = cum - np.concatenate([[0] * min(7, len(n)), cum[:-7]])[:len(n)]
        return pa.table({
            "day": pa.array(d, pa.int64()),
            "n_events": pa.array(n, pa.int64()),
            "cum_events": pa.array(cum.astype(np.int64), pa.int64()),
            "delta_events": pa.array(delta, pa.int64()),
            "moving7_events": pa.array(mov.astype(np.int64), pa.int64()),
            "moving7_window": pa.array(win.astype(np.int64), pa.int64())})

    return daily.repartition(1).map_batches(pipeline, batch_format="pyarrow",
                                            batch_size=None)


def asof_join(ds: rd.Dataset, left_type: str = "click",
              right_type: str = "view", n_buckets: int = 512) -> rd.Dataset:
    """AS-OF JOIN per user — the brief's canonical custom operator: each
    ``left_type`` event is matched to the most recent STRICTLY-earlier
    ``right_type`` event of the same user (kdb/Pandas merge_asof /
    DuckDB ASOF JOIN semantics, strict inequality so timestamp ties
    never self-match). Inner form: lefts with no earlier right are
    dropped.

    Distributed shape: filter to the two types at the read (tiny
    column set), ONE shuffle keyed by hash-bucket of user_id (same
    machinery as :func:`sessionize` — a user's whole history lands in
    one group), then a fully vectorized per-bucket kernel: sort by
    (user, ts, event_id), pack (user-rank, relative-ts) into one int64
    key, and ``np.searchsorted(side='left') - 1`` over the right-side
    subarray gives every left row's predecessor in O(n log n) with no
    per-row Python. Ties on (user, ts) among rights resolve to the
    greatest event_id (the sort order), mirrored in the oracle.

    Key-packing bound: users-per-bucket x time-span-us must stay under
    2^63 — at 512+ buckets that allows ~300k users/bucket over a
    30-year span; raise ``n_buckets`` with corpus size.

    Output (all int64): event_id, user_id, ts_us, right_event_id,
    right_ts_us, delta_us.
    """
    import pyarrow.compute as pc

    from bge_m3_onnx_ray.hashing import P53, poly_hash

    def add_bucket(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(
            t.column("event_type"),
            value_set=pa.array([left_type, right_type])))
        b = poly_hash(t.column("user_id"), P53) % np.uint64(n_buckets)
        return t.append_column("_bucket", pa.array(b.astype(np.int64)))

    def per_bucket(g: pa.Table) -> pa.Table:
        empty = pa.table({c: pa.array([], pa.int64()) for c in
                          ("event_id", "user_id", "ts_us",
                           "right_event_id", "right_ts_us", "delta_us")})
        if not g.num_rows:
            return empty
        tbl = g.take(pc.sort_indices(
            g, sort_keys=[("user_id", "ascending"), ("ts", "ascending"),
                          ("event_id", "ascending")]))
        user = tbl.column("user_id").to_numpy(zero_copy_only=False)
        ts = tbl.column("ts").cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        eid = tbl.column("event_id").to_numpy(zero_copy_only=False)
        is_left = pc.equal(tbl.column("event_type"), left_type) \
            .to_numpy(zero_copy_only=False)
        urank = np.unique(user, return_inverse=True)[1].astype(np.int64)
        rel = ts - ts.min()
        key = urank * (rel.max() + 2) + rel      # (user, ts) packed, sorted
        r = ~is_left
        rkey, ruser, rts, reid = key[r], user[r], ts[r], eid[r]
        if not len(rkey) or not is_left.any():
            return empty
        lkey, luser, lts, leid = (key[is_left], user[is_left],
                                  ts[is_left], eid[is_left])
        idx = np.searchsorted(rkey, lkey, side="left") - 1
        ok = idx >= 0
        ok[ok] = ruser[idx[ok]] == luser[ok]     # predecessor is same user
        m = idx[ok]
        return pa.table({
            "event_id": pa.array(leid[ok].astype(np.int64), pa.int64()),
            "user_id": pa.array(luser[ok].astype(np.int64), pa.int64()),
            "ts_us": pa.array(lts[ok], pa.int64()),
            "right_event_id": pa.array(reid[m].astype(np.int64), pa.int64()),
            "right_ts_us": pa.array(rts[m], pa.int64()),
            "delta_us": pa.array(lts[ok] - rts[m], pa.int64()),
        })

    return ds.select_columns(["event_id", "ts", "user_id", "event_type"]) \
        .map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("_bucket").map_groups(per_bucket, batch_format="pyarrow")


def funnel(ds: rd.Dataset, steps: tuple = ("view", "click", "purchase"),
           window_minutes: int = 60, n_buckets: int = 512) -> rd.Dataset:
    """K-step FUNNEL with sequential-first semantics (the Amplitude/
    Mixpanel funnel shape): a user's step-1 time is their FIRST
    ``steps[0]`` event; step i+1 completes at the first ``steps[i+1]``
    event strictly after step i's completion and within
    ``window_minutes`` of it. Output one row per user with >= 1 step-1
    event: (user_id, reached) where reached in [1, len(steps)].

    Same distributed shape as :func:`asof_join` — ONE user-hash-bucket
    shuffle, then a vectorized kernel: per step, one
    ``np.searchsorted(side='right')`` of every active user's previous
    completion time into that step's (user, ts)-packed key array. The
    per-bucket loop is over STEPS (a constant), never rows or users.
    """
    import pyarrow.compute as pc

    from bge_m3_onnx_ray.hashing import P53, poly_hash
    window_us = np.int64(window_minutes * 60) * 1_000_000

    def add_bucket(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t.column("event_type"),
                              value_set=pa.array(list(steps))))
        b = poly_hash(t.column("user_id"), P53) % np.uint64(n_buckets)
        return t.append_column("_bucket", pa.array(b.astype(np.int64)))

    def per_bucket(g: pa.Table) -> pa.Table:
        empty = pa.table({"user_id": pa.array([], pa.int64()),
                          "reached": pa.array([], pa.int64())})
        if not g.num_rows:
            return empty
        tbl = g.take(pc.sort_indices(
            g, sort_keys=[("user_id", "ascending"), ("ts", "ascending"),
                          ("event_id", "ascending")]))
        user = tbl.column("user_id").to_numpy(zero_copy_only=False)
        ts = tbl.column("ts").cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        etype = tbl.column("event_type").to_pandas().to_numpy()
        users, urank = np.unique(user, return_inverse=True)
        urank = urank.astype(np.int64)
        rel = ts - ts.min()
        span = rel.max() + 2
        key = urank * span + rel

        m0 = etype == steps[0]
        if not m0.any():
            return empty
        # first step-1 event per user
        u0, first = np.unique(urank[m0], return_index=True)
        prev_t = np.full(len(users), np.int64(-1))
        prev_t[u0] = rel[m0][first]
        active = np.zeros(len(users), bool)
        active[u0] = True
        reached = np.where(active, 1, 0).astype(np.int64)

        for i, s in enumerate(steps[1:], start=2):
            mi = etype == s
            skey = key[mi]
            srel = rel[mi]
            suser = urank[mi]
            au = np.flatnonzero(active)
            if not len(au) or not len(skey):
                break
            # first event of this step strictly after prev_t, same user
            pos = np.searchsorted(skey, au * span + prev_t[au], side="right")
            ok = pos < len(skey)
            ok[ok] &= suser[pos[ok]] == au[ok]
            ok[ok] &= srel[pos[ok]] - prev_t[au[ok]] <= window_us
            hit = au[ok]
            active[:] = False
            active[hit] = True
            reached[hit] = i
            prev_t[hit] = srel[pos[ok]]

        keep = reached >= 1
        return pa.table({
            "user_id": pa.array(users[keep].astype(np.int64), pa.int64()),
            "reached": pa.array(reached[keep], pa.int64()),
        })

    return ds.select_columns(["event_id", "ts", "user_id", "event_type"]) \
        .map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("_bucket").map_groups(per_bucket, batch_format="pyarrow")


def retention(ds: rd.Dataset, cohort_type: str = "signup",
              period_s: int = 7 * 86400, n_buckets: int = 256) -> rd.Dataset:
    """Cohort RETENTION matrix — the product-analytics staple: users are
    cohorted by the period of their FIRST ``cohort_type`` event; cell
    (cohort, offset) counts distinct cohort members with ANY event in
    cohort_period + offset. Output (cohort_period_s, period_offset,
    n_users), offsets >= 0 only.

    Distributed shape: ONE user-hash-bucket shuffle (a user's whole
    history lands in one group, so per-bucket distinct counts are exact
    and disjoint), vectorized per-bucket kernel (np.unique over packed
    (cohort, offset, user) keys), then a tiny bucket_reduce over the
    cohort x offset matrix — cells, not users, cross the second
    exchange.
    """
    import pyarrow.compute as pc

    from bge_m3_onnx_ray.hashing import P53, poly_hash
    from bge_m3_onnx_ray.stages._groups import bucket_reduce
    period_us = np.int64(period_s) * 1_000_000

    def add_bucket(t: pa.Table) -> pa.Table:
        b = poly_hash(t.column("user_id"), P53) % np.uint64(n_buckets)
        return t.append_column("_bucket", pa.array(b.astype(np.int64)))

    def per_bucket(g: pa.Table) -> pa.Table:
        empty = pa.table({"cohort_period_s": pa.array([], pa.int64()),
                          "period_offset": pa.array([], pa.int64()),
                          "n_users": pa.array([], pa.int64())})
        if not g.num_rows:
            return empty
        tbl = g.take(pc.sort_indices(
            g, sort_keys=[("user_id", "ascending"), ("ts", "ascending")]))
        user = tbl.column("user_id").to_numpy(zero_copy_only=False)
        ts = tbl.column("ts").cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        week = ts // period_us
        urank = np.unique(user, return_inverse=True)[1].astype(np.int64)
        n_users = int(urank[-1]) + 1
        is_c = pc.equal(tbl.column("event_type"), cohort_type) \
            .to_numpy(zero_copy_only=False)
        if not is_c.any():
            return empty
        cu, first = np.unique(urank[is_c], return_index=True)
        cohort = np.full(n_users, np.int64(-1))
        cohort[cu] = week[is_c][first]      # first cohort event per user
        cw = cohort[urank]
        off = week - cw
        keep = (cw >= 0) & (off >= 0)
        if not keep.any():
            return empty
        # distinct (cohort, offset, user) -> count per (cohort, offset)
        span_o = off[keep].max() + 1
        key = (cw[keep] * span_o + off[keep]) * n_users + urank[keep]
        cells = np.unique(key) // n_users
        uc, counts = np.unique(cells, return_counts=True)
        return pa.table({
            "cohort_period_s": pa.array((uc // span_o) * period_s,
                                        pa.int64()),
            "period_offset": pa.array(uc % span_o, pa.int64()),
            "n_users": pa.array(counts.astype(np.int64), pa.int64()),
        })

    partials = ds.select_columns(["ts", "user_id", "event_type"]) \
        .map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("_bucket").map_groups(per_bucket, batch_format="pyarrow")
    return bucket_reduce(partials, ["cohort_period_s", "period_offset"],
                         [("n_users", "sum", "n_users")], n_buckets=8)


def anomaly_days(ds: rd.Dataset) -> pa.Table:
    """Anomalous-day detection per event type: flag days whose event
    count deviates from that type's mean by more than two population
    standard deviations. The test is evaluated as the EXACT integer
    inequality

        (n * cnt - S)^2 > 4 * (n * Q - S^2)

    (S = sum of daily counts, Q = sum of squares, n = number of days) —
    algebraically identical to |z| > 2 but with no float anywhere, so
    the SQL oracle matches bit-for-bit by construction. Distributed
    shape: batch pre-agg + ONE bucket_reduce to the (type, day) counts;
    the per-type stats reduce over the bucket table (n_types x n_days
    rows, small by construction). Output (event_type, day, n_events,
    flagged) sorted by (event_type, day)."""
    from bge_m3_onnx_ray.stages._groups import bucket_reduce

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        ts = batch.column("ts").cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        day = (ts // 86_400_000_000) * 86400
        et = batch.column("event_type").combine_chunks().dictionary_encode()
        code = np.asarray(et.indices).astype(np.int64)
        key = code * np.int64(1 << 32) + day // 86400
        u, c = np.unique(key, return_counts=True)
        return pa.table({
            "event_type": et.dictionary.take(
                pa.array(u >> np.int64(32))).cast(pa.string()),
            "day": pa.array((u & np.int64((1 << 32) - 1)) * 86400,
                            pa.int64()),
            "n_events": pa.array(c.astype(np.int64), pa.int64())})

    daily = bucket_reduce(
        ds.select_columns(["ts", "event_type"]).map_batches(
            partial, batch_format="pyarrow", batch_size=65536),
        ["event_type", "day"], [("n_events", "sum", "n_events")],
        n_buckets=16).to_pandas()

    out = []
    import pandas as pd
    for et, g in daily.groupby("event_type", sort=True):
        cnt = g["n_events"].to_numpy(np.int64)
        n = np.int64(len(cnt))
        s = np.int64(cnt.sum())
        q = np.int64((cnt * cnt).sum())
        lhs = (n * cnt - s).astype(object)       # python ints: no overflow
        flagged = np.array([int(v * v > 4 * (int(n) * int(q)
                                             - int(s) * int(s)))
                            for v in lhs], np.int64)
        gg = g.sort_values("day").reset_index(drop=True)
        gg["flagged"] = flagged[np.argsort(g["day"].to_numpy(),
                                           kind="stable")]
        out.append(gg)
    res = pd.concat(out, ignore_index=True) if out else \
        pd.DataFrame(columns=["event_type", "day", "n_events", "flagged"])
    return pa.Table.from_pandas(
        res[["event_type", "day", "n_events", "flagged"]],
        preserve_index=False)


def value_deciles(ds: rd.Dataset) -> rd.Dataset:
    """Per-event decile bucket of ``value`` within its event_type — the
    quantile-bucketing featurizer (the ML-feature twin of
    :func:`percentiles_value_by_type`): decile d means the value exceeds
    exactly d−1 of the 9 per-type decile cutoffs (``quantile_disc``
    semantics on the lossless q2 grid; a value EQUAL to a cutoff stays
    in the lower bucket). Output (event_id, event_type, value_q2,
    decile ∈ 1..10).

    Scale shape: cutoffs come from the histogram path (the exchange is
    types × grid values, row-count-independent), are broadcast once as
    a (type → 9 ints) table, and the assignment pass is map-only — a
    searchsorted per batch, no second shuffle."""
    import ray

    cuts = percentiles_value_by_type(
        ds, qs=(0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9)).to_pandas()
    cuts = cuts.sort_values("event_type").reset_index(drop=True)
    types = cuts["event_type"].to_numpy().astype(str)
    cols = [f"p{i}" for i in range(10, 100, 10)]
    mat = cuts[cols].to_numpy().astype(np.int64)      # (n_types, 9)
    ref = ray.put((types, mat))

    def assign(batch: pa.Table) -> pa.Table:
        t_l, m_l = ray.get(ref)
        et = batch.column("event_type").to_numpy(zero_copy_only=False) \
            .astype(str)
        q2 = np.floor(batch.column("value").to_numpy() * 100.0 + 0.5) \
            .astype(np.int64)
        ti = np.searchsorted(t_l, et)
        # rows of unseen types cannot occur (cutoffs derive from the
        # same dataset), so ti indexes are always valid
        row_cuts = m_l[ti]                            # (n, 9)
        decile = 1 + (q2[:, None] > row_cuts).sum(axis=1)
        return pa.table({
            "event_id": batch.column("event_id").cast(pa.int64()),
            "event_type": batch.column("event_type").cast(pa.string()),
            "value_q2": pa.array(q2, pa.int64()),
            "decile": pa.array(decile.astype(np.int64), pa.int64())})

    return ds.select_columns(["event_id", "event_type", "value"]) \
        .map_batches(assign, batch_format="pyarrow", batch_size=65536)


def type_transitions(ds: rd.Dataset, n_buckets: int = 512) -> rd.Dataset:
    """Per-user event-type TRANSITION counts (the first-order Markov /
    sequence-mining aggregate): for every consecutive pair of a user's
    events ordered by (ts, event_id), count (type_from, type_to) pairs
    globally. Output (type_from, type_to, n), one row per observed
    transition. SQL twin: ``lag(event_type) OVER (PARTITION BY user_id
    ORDER BY ts, event_id)`` then GROUP BY.

    Scale shape: the same ONE hash-bucket-of-user exchange as
    :func:`interarrival` — each bucket's kernel sorts its users once,
    shifts the type codes, and PRE-AGGREGATES transition counts before
    they leave (output per bucket ≤ n_types², not n_events); a tiny
    bucket_reduce finishes."""
    from bge_m3_onnx_ray.stages._groups import bucket_reduce

    def per_bucket(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        n = g.num_rows
        empty = pa.table({"type_from": pa.array([], pa.string()),
                          "type_to": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        if n < 2:
            return empty
        order = pc.sort_indices(
            g, sort_keys=[("user_id", "ascending"), ("ts", "ascending"),
                          ("event_id", "ascending")])
        tbl = g.take(order)
        users = tbl.column("user_id").combine_chunks()
        et = tbl.column("event_type").combine_chunks().dictionary_encode()
        codes = np.asarray(et.indices).astype(np.int64)
        k = max(len(et.dictionary), 1)
        same = ~np.asarray(
            pc.not_equal(users.slice(1), users.slice(0, n - 1))
            .to_numpy(zero_copy_only=False))
        key = codes[:-1][same] * k + codes[1:][same]
        if not len(key):
            return empty
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({
            "type_from": et.dictionary.take(pa.array(uk // k))
                                      .cast(pa.string()),
            "type_to": et.dictionary.take(pa.array(uk % k))
                                    .cast(pa.string()),
            "n": pa.array(cnt.astype(np.int64), pa.int64())})

    def add_bucket(t: pa.Table) -> pa.Table:
        from bge_m3_onnx_ray.hashing import P53, poly_hash
        b = (poly_hash(t.column("user_id"), P53) % np.uint64(n_buckets))
        return t.append_column("_bucket", pa.array(b.astype(np.int64)))

    parts = ds.select_columns(["event_id", "ts", "user_id", "event_type"]) \
        .map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("_bucket").map_groups(per_bucket, batch_format="pyarrow")
    return bucket_reduce(parts, ["type_from", "type_to"],
                         [("n", "sum", "n")], 16)


def new_users_daily(ds: rd.Dataset) -> pa.Table:
    """Growth accounting: per UTC day, how many users had their FIRST
    EVER event that day, plus the running cumulative user count — the
    new-vs-returning split every activity dashboard opens with. Output
    (day, n_new_users, cum_users), day in epoch seconds.

    Scale shape: ONE bucket_reduce computes min(ts) per user (16-byte
    rows, the same exchange class as exact_dedup); the per-day histogram
    of those firsts is ≤ n_days rows, so the cumulative sum runs on the
    driver."""
    from bge_m3_onnx_ray.stages._groups import bucket_reduce

    def to_us(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t.column("user_id").cast(pa.int64()),
            "us": t.column("ts").cast(pa.timestamp("us"))
                   .cast(pa.int64())})

    firsts = bucket_reduce(
        ds.select_columns(["user_id", "ts"]).map_batches(
            to_us, batch_format="pyarrow", batch_size=65536),
        ["user_id"], [("us", "min", "us")])

    def day_partial(t: pa.Table) -> pa.Table:
        day = (t.column("us").to_numpy() // 1_000_000 // 86_400) * 86_400
        ud, cnt = np.unique(day, return_counts=True)
        return pa.table({"day": pa.array(ud, pa.int64()),
                         "n_new": pa.array(cnt.astype(np.int64))})

    hist = bucket_reduce(
        firsts.map_batches(day_partial, batch_format="pyarrow"),
        ["day"], [("n_new", "sum", "n_new")], 8).to_pandas() \
        .sort_values("day").reset_index(drop=True)
    return pa.table({
        "day": pa.array(hist["day"].to_numpy(), pa.int64()),
        "n_new_users": pa.array(hist["n_new"].to_numpy(), pa.int64()),
        "cum_users": pa.array(hist["n_new"].cumsum().to_numpy(),
                              pa.int64())})


def user_top_type(ds: rd.Dataset, n_buckets: int = 256) -> rd.Dataset:
    """Per-user MODE: each user's most frequent event_type (ties to the
    lexicographically smaller type) with its count — the argmax-per-
    group aggregate SQL spells ``mode()`` / ``row_number() = 1``.
    Output (user_id, top_type, n).

    Scale shape: (user, type) pair counts via ONE bucket_reduce (pairs
    per user are bounded by the type vocabulary, so rows out ≈ users ×
    types, far below events); the argmax runs inside a second
    user-bucketed kernel as one lexsort + boundary take — no per-user
    Python."""
    from bge_m3_onnx_ray.stages._groups import bucket_reduce

    counts = bucket_reduce(
        ds.select_columns(["user_id", "event_type"]),
        ["user_id", "event_type"], [(None, "count", "n")], n_buckets)

    def add_bucket(t: pa.Table) -> pa.Table:
        from bge_m3_onnx_ray.hashing import splitmix64
        u = t.column("user_id").to_numpy().astype(np.uint64)
        return t.append_column("_ub", pa.array(
            (splitmix64(u) % np.uint64(64)).astype(np.int64)))

    def argmax_kernel(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        n = g.num_rows
        if not n:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "top_type": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        # (user asc, n desc, type asc): each user's first row is its mode
        order = pc.sort_indices(g, sort_keys=[
            ("user_id", "ascending"), ("n", "descending"),
            ("event_type", "ascending")])
        tbl = g.take(order)
        users = tbl.column("user_id").to_numpy()
        firsts = np.concatenate([[0], np.flatnonzero(np.diff(users)) + 1])
        pick = pa.array(firsts, pa.int64())
        return pa.table({
            "user_id": tbl.column("user_id").take(pick),
            "top_type": tbl.column("event_type").take(pick)
                           .cast(pa.string()),
            "n": tbl.column("n").take(pick)})

    return counts.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("_ub").map_groups(argmax_kernel, batch_format="pyarrow")


def value_zscore(ds: rd.Dataset) -> rd.Dataset:
    """Per-event POPULATION z-score of ``value`` within its event_type —
    the standardization featurizer. Kept on the integer-exact contract:
    per-type (n, Σv, Σv²) are int64 sums over the lossless q2 grid
    (range bound: n·Σv² < 2^63 — holds to ~10^10 rows at |v| ≤ 200),
    and z = (v·n − Σv) / sqrt(n·Σv² − (Σv)²) is ONE IEEE expression
    evaluated identically by numpy and SQL before the q6 floor.
    Output (event_id, event_type, value_q2, z_q6); degenerate types
    (zero variance) emit z_q6 = 0.

    Scale shape: the moment pass is a per-batch partial → tiny
    bucket_reduce (3 ints per type); moments broadcast once; the
    scoring pass is map-only."""
    import ray

    from bge_m3_onnx_ray.stages._groups import bucket_reduce

    def moments(t: pa.Table) -> pa.Table:
        et = t.column("event_type").combine_chunks().dictionary_encode()
        codes = np.asarray(et.indices).astype(np.int64)
        q2 = np.floor(t.column("value").to_numpy() * 100.0 + 0.5) \
            .astype(np.int64)
        k = max(len(et.dictionary), 1)
        n = np.bincount(codes, minlength=k).astype(np.int64)
        s = np.bincount(codes, weights=q2, minlength=k).astype(np.int64)
        ss = np.bincount(codes, weights=q2 * q2, minlength=k) \
            .astype(np.int64)
        return pa.table({"event_type": et.dictionary.cast(pa.string()),
                         "n": pa.array(n), "s": pa.array(s),
                         "ss": pa.array(ss)})

    mom = bucket_reduce(
        ds.select_columns(["event_type", "value"]).map_batches(
            moments, batch_format="pyarrow", batch_size=65536),
        ["event_type"], [("n", "sum", "n"), ("s", "sum", "s"),
                         ("ss", "sum", "ss")], 8).to_pandas() \
        .sort_values("event_type")
    types = mom["event_type"].to_numpy().astype(str)
    ref = ray.put((types, mom["n"].to_numpy().astype(np.int64),
                   mom["s"].to_numpy().astype(np.int64),
                   mom["ss"].to_numpy().astype(np.int64)))

    def score(t: pa.Table) -> pa.Table:
        t_l, n_l, s_l, ss_l = ray.get(ref)
        et = t.column("event_type").to_numpy(zero_copy_only=False) \
            .astype(str)
        q2 = np.floor(t.column("value").to_numpy() * 100.0 + 0.5) \
            .astype(np.int64)
        ti = np.searchsorted(t_l, et)
        n, s, ss = n_l[ti], s_l[ti], ss_l[ti]
        var_n2 = (n * ss - s * s).astype(np.float64)   # n^2 * variance
        num = (q2 * n - s).astype(np.float64)
        z = np.divide(num, np.sqrt(var_n2),
                      out=np.zeros(len(q2)), where=var_n2 > 0)
        return pa.table({
            "event_id": t.column("event_id").cast(pa.int64()),
            "event_type": t.column("event_type").cast(pa.string()),
            "value_q2": pa.array(q2, pa.int64()),
            "z_q6": pa.array(np.floor(z * 1e6).astype(np.int64),
                             pa.int64())})

    return ds.select_columns(["event_id", "event_type", "value"]) \
        .map_batches(score, batch_format="pyarrow", batch_size=65536)


def value_mad(ds: rd.Dataset) -> rd.Dataset:
    """Per-type ROBUST location/scale: the median and the median
    absolute deviation of ``value`` — the outlier-resistant twin of
    :func:`stats_value_by_type`, with NO floats anywhere: both
    statistics are exact ``quantile_disc`` picks on the lossless q2
    integer grid (median first, then the median of |v − median|).
    Output (event_type, median_q2, mad_q2).

    Scale shape: two histogram passes (each exchange bounded by
    types × grid values, row-count-independent) with the per-type
    medians broadcast between them; the deviation histogram derives
    from the VALUE histogram directly — the corpus is read once."""
    import ray

    from bge_m3_onnx_ray.stages._groups import bucket_reduce

    def hist_partial(t: pa.Table) -> pa.Table:
        et = t.column("event_type").combine_chunks().dictionary_encode()
        codes = np.asarray(et.indices).astype(np.int64)
        q2 = np.floor(t.column("value").to_numpy() * 100.0 + 0.5) \
            .astype(np.int64)
        # composite (type, value) count via np.unique on pairs
        pair = np.stack([codes, q2], axis=1)
        uk, cnt = np.unique(pair, axis=0, return_counts=True)
        return pa.table({
            "event_type": et.dictionary.take(pa.array(uk[:, 0]))
                            .cast(pa.string()),
            "value_q2": pa.array(uk[:, 1], pa.int64()),
            "n": pa.array(cnt.astype(np.int64), pa.int64())})

    hist = bucket_reduce(
        ds.select_columns(["event_type", "value"]).map_batches(
            hist_partial, batch_format="pyarrow", batch_size=65536),
        ["event_type", "value_q2"], [("n", "sum", "n")], 32).to_pandas()

    def disc_median(g):
        g = g.sort_values("value_q2")
        cum = g["n"].cumsum()
        total = int(cum.iloc[-1])
        rank = max(int(np.ceil(0.5 * total)), 1)
        return int(g["value_q2"].to_numpy()[np.searchsorted(
            cum.to_numpy(), rank)])

    med = {t: disc_median(g) for t, g in hist.groupby("event_type")}
    # deviation histogram straight from the value histogram (no re-read)
    hist["dev"] = (hist["value_q2"]
                   - hist["event_type"].map(med)).abs().astype(np.int64)
    dev = hist.groupby(["event_type", "dev"], as_index=False)["n"].sum() \
        .rename(columns={"dev": "value_q2"})
    mad = {t: disc_median(g) for t, g in dev.groupby("event_type")}
    types = sorted(med)
    import ray.data as _rd
    return _rd.from_arrow(pa.table({
        "event_type": pa.array(types, pa.string()),
        "median_q2": pa.array([med[t] for t in types], pa.int64()),
        "mad_q2": pa.array([mad[t] for t in types], pa.int64())}))


def hourly_trend(ds: rd.Dataset) -> pa.Table:
    """Per-type activity TREND: the OLS slope of hourly event counts
    over the observed hours (events/hour per hour — positive = growing
    traffic), in PURE integer arithmetic: x = hour index from the
    corpus's first hour, y = hourly count, slope = (nΣxy − ΣxΣy) /
    (nΣx² − (Σx)²) floored onto the 1e-6 grid through a +1e9 offset so
    floor and truncate agree on negative slopes (DuckDB ``//``
    truncates; Python floors). Hours with zero events of a type are NOT
    regression points (both sides identically). Output (event_type,
    n_hours, slope_q6).

    Scale shape: rides :func:`hourly_agg`'s distributed histogram
    (types × hours rows — bounded by the time range, not the event
    count); the per-type regression is driver math on that aggregate."""
    hourly = hourly_agg(ds).to_pandas()
    if not len(hourly):
        return pa.table({"event_type": pa.array([], pa.string()),
                         "n_hours": pa.array([], pa.int64()),
                         "slope_q6": pa.array([], pa.int64())})
    h0 = int(hourly["hour"].min())
    hourly["x"] = (hourly["hour"] - h0) // 3600
    out_t, out_n, out_s = [], [], []
    OFF = 1_000_000_000
    for et, g in sorted(hourly.groupby("event_type")):
        x = g["x"].to_numpy().astype(object)     # python ints: no overflow
        y = g["n_events"].to_numpy().astype(object)
        n = len(g)
        sx, sy = sum(x), sum(y)
        sxx = sum(v * v for v in x)
        sxy = sum(a * b for a, b in zip(x, y))
        d = n * sxx - sx * sx
        slope_q6 = ((n * sxy - sx * sy) * 1_000_000 + OFF * d) // d - OFF \
            if d > 0 else 0
        out_t.append(et)
        out_n.append(n)
        out_s.append(int(slope_q6))
    return pa.table({"event_type": pa.array(out_t, pa.string()),
                     "n_hours": pa.array(out_n, pa.int64()),
                     "slope_q6": pa.array(out_s, pa.int64())})


def user_gini(ds: rd.Dataset) -> pa.Table:
    """Concentration of activity across users: the Gini coefficient of
    events-per-user — the "is 1% of accounts generating 90% of the
    traffic" audit (bot/spam detection, load-skew planning). Output one
    row (n_users, total_events, gini_q6).

    Integer-exact: per-user counts reduce distributedly (16-byte rows);
    on the sorted counts y_1 ≤ … ≤ y_n the coefficient is the exact
    rational G = (2·Σ i·y_i − (n+1)·Σy) / (n·Σy), floored onto the
    1e-6 grid in arbitrary-precision Python — no floats. The count
    table is user-bounded (not event-bounded), so the driver sort is
    the same size class as every other driver-side finish here."""
    from bge_m3_onnx_ray.stages._groups import bucket_reduce

    counts = bucket_reduce(
        ds.select_columns(["user_id"]),
        ["user_id"], [(None, "count", "n")]).to_pandas()
    if not len(counts):
        return pa.table({"n_users": pa.array([0], pa.int64()),
                         "total_events": pa.array([0], pa.int64()),
                         "gini_q6": pa.array([0], pa.int64())})
    y = np.sort(counts["n"].to_numpy().astype(np.int64))
    n = len(y)
    s = int(y.sum())
    weighted = int((np.arange(1, n + 1, dtype=np.int64) * y).sum())
    num = 2 * weighted - (n + 1) * s
    OFF = 1_000_000_000
    gini_q6 = (num * 1_000_000 + OFF * n * s) // (n * s) - OFF if s else 0
    return pa.table({"n_users": pa.array([n], pa.int64()),
                     "total_events": pa.array([s], pa.int64()),
                     "gini_q6": pa.array([int(gini_q6)], pa.int64())})


def user_span(ds: rd.Dataset, n_buckets: int = 256) -> rd.Dataset:
    """Per-user FIRST/LAST aggregate: the first and last event (by ts,
    event_id) with their types, plus the active span — the
    account-lifetime summary behind retention analysis. Output
    (user_id, first_type, last_type, n_events, span_us).

    Scale shape: ONE hash-bucket-of-user exchange; each bucket kernel
    sorts its users once and takes run boundaries — the same shape as
    :func:`interarrival`, but emitting one row per user instead of per
    event."""

    def per_bucket(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        n = g.num_rows
        if not n:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "first_type": pa.array([], pa.string()),
                             "last_type": pa.array([], pa.string()),
                             "n_events": pa.array([], pa.int64()),
                             "span_us": pa.array([], pa.int64())})
        order = pc.sort_indices(
            g, sort_keys=[("user_id", "ascending"), ("ts", "ascending"),
                          ("event_id", "ascending")])
        tbl = g.take(order)
        users = tbl.column("user_id").to_numpy()
        # normalize any parquet timestamp unit (ms/us/ns) before the
        # integer view — the sessionize lesson
        ts_us = tbl.column("ts").cast(pa.timestamp("us")) \
            .cast(pa.int64()).to_numpy()
        starts = np.concatenate([[0], np.flatnonzero(np.diff(users)) + 1])
        ends = np.concatenate([starts[1:], [n]]) - 1
        return pa.table({
            "user_id": pa.array(users[starts], pa.int64()),
            "first_type": tbl.column("event_type")
                             .take(pa.array(starts)).cast(pa.string()),
            "last_type": tbl.column("event_type")
                            .take(pa.array(ends)).cast(pa.string()),
            "n_events": pa.array(ends - starts + 1, pa.int64()),
            "span_us": pa.array(ts_us[ends] - ts_us[starts], pa.int64())})

    def add_bucket(t: pa.Table) -> pa.Table:
        from bge_m3_onnx_ray.hashing import splitmix64
        u = t.column("user_id").to_numpy().astype(np.uint64)
        return t.append_column("_bucket", pa.array(
            (splitmix64(u) % np.uint64(n_buckets)).astype(np.int64)))

    return ds.select_columns(["event_id", "ts", "user_id",
                              "event_type"]) \
        .map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("_bucket").map_groups(per_bucket, batch_format="pyarrow")
