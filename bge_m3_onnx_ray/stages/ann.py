"""Similarity search over an embedding column (vec_id, embedding:
list<float>, ...).

Baseline: brute-force cosine top-k — per-batch numpy matmul against a
broadcast query matrix (``ray.put`` once, read in every task; never
re-shipped per batch), per-batch partial top-k, tiny groupby merge.
Scale path: random-hyperplane LSH bucketing (``lsh_buckets``) which
turns the all-pairs scan into per-bucket scans (``lsh_bucket_pairs`` in
stages.dedup consumes it); bucket scans reuse the same brute-force
kernel.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray.data as rd

from bge_m3_onnx_ray.stages._pool import task_stage


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)


def _embedding_matrix(col) -> np.ndarray:
    """(n, dim) float64 from a list<float> column — via the flat values
    buffer (zero Python-object round trip), valid for non-null
    fixed-length rows."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.values.to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(col)
    return flat.reshape(n, -1) if n else flat.reshape(0, 0)


class _PartialTopK:
    """Per-batch exact cosine partial top-k against the broadcast query
    matrix; state fetched once per worker (task_stage cache).
    ``label_of`` (query_id -> label), when present, restricts each
    query's CANDIDATES to rows with that label (the Elasticsearch
    knn-with-filter shape) — scores are unchanged, the filter only
    prunes."""

    def __init__(self, q_ref, k: int):
        import ray
        got = ray.get(q_ref)
        self.qids, self.q, self.exclude = got[:3]
        self.label_of = got[3] if len(got) > 3 else None
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        vids = batch.column("vec_id").to_numpy()
        labels = (batch.column("label").to_numpy()
                  if self.label_of is not None else None)
        m = _normalize(_embedding_matrix(batch.column("embedding")))
        sims = self.q @ m.T                      # (n_q, n_batch)
        out_q, out_v, out_s = [], [], []
        k = self.k
        for qi, qid in enumerate(self.qids):
            s = sims[qi]
            mask = np.ones(len(vids), bool)
            ex = self.exclude.get(int(qid))
            if ex is not None:
                mask &= vids != ex
            if labels is not None:
                mask &= labels == self.label_of[int(qid)]
            idx = np.flatnonzero(mask)
            if not len(idx):
                continue
            kk = min(k, len(idx))
            if len(idx) > kk:
                # exact tie-safe pre-cut: keep EVERYTHING >= the kth
                # score so equal-cos candidates (tie-break vec_id asc)
                # survive to the merge stage
                kth = -np.partition(-s[idx], kk - 1)[kk - 1]
                top = idx[s[idx] >= kth]
            else:
                top = idx
            out_q.extend([qid] * len(top))
            out_v.extend(vids[top].tolist())
            out_s.extend(s[top].tolist())
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_v, pa.int64()),
                         "cos": pa.array(out_s, pa.float64())})


def brute_force_topk(ds: rd.Dataset, query_vecs: np.ndarray,
                     query_ids: np.ndarray, k: int = 10,
                     exclude: dict[int, int] | None = None,
                     label_of: dict[int, int] | None = None) -> rd.Dataset:
    """Exact cosine top-k for each query vector.

    Output (query_id, rank, vec_id, cos_q2); ties (cos equal) break by
    ascending vec_id. ``exclude`` maps query_id -> vec_id to drop (self-
    match exclusion when queries come from the corpus). ``label_of``
    maps query_id -> required ``label`` value: filtered kNN — each
    query's candidates restrict to rows carrying its label (pruning
    only; cosine unchanged)."""
    import ray

    q = _normalize(np.asarray(query_vecs, np.float64))
    q_ref = ray.put((np.asarray(query_ids, np.int64), q,
                     dict(exclude or {}),
                     dict(label_of) if label_of is not None else None))

    cols = (["vec_id", "embedding", "label"] if label_of is not None
            else ["vec_id", "embedding"])
    partials = ds.select_columns(cols).map_batches(
        task_stage(_PartialTopK, q_ref=q_ref, k=k),
        batch_format="pyarrow", batch_size=4096)

    def merge(group: pa.Table) -> pa.Table:
        qid = group.column("query_id")[0].as_py()
        s = group.column("cos").to_numpy()
        v = group.column("vec_id").to_numpy()
        order = np.lexsort((v, -s))[:k]
        return pa.table({
            "query_id": pa.array(np.full(len(order), qid), pa.int64()),
            "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int32), pa.int32()),
            "vec_id": pa.array(v[order], pa.int64()),
            # q2: DuckDB computes list_cosine_similarity in float32 (~1e-7
            # error), so a 1e-6 grid would flip floor boundaries cross-engine
            "cos_q2": pa.array(np.floor(s[order] * 100.0).astype(np.int64), pa.int64()),
        })

    return partials.groupby("query_id").map_groups(merge, batch_format="pyarrow")


class LshBucketStage:
    """Random-hyperplane LSH: bucket = sign-bits of (v . H) — the scale
    path for ANN / near-dup (bucket co-location turns all-pairs into
    per-bucket work). Deterministic: fixed-seed hyperplanes generated in
    __init__, once per worker; the DuckDB oracle inlines the identical
    planes (``__ray_entry__._lsh_buckets_sql``)."""

    def __init__(self, dim: int, n_planes: int = 12, seed: int = 11):
        rng = np.random.default_rng(seed)
        self.h = rng.standard_normal((dim, n_planes))

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _embedding_matrix(batch.column("embedding"))
        bits = (m @ self.h) > 0
        bucket = np.zeros(len(m), np.int64)
        for j in range(bits.shape[1]):
            bucket |= bits[:, j].astype(np.int64) << j
        return pa.table({"vec_id": batch.column("vec_id"),
                         "bucket": pa.array(bucket, pa.int64())})


def lsh_buckets(ds: rd.Dataset, dim: int, n_planes: int = 12) -> rd.Dataset:
    return ds.select_columns(["vec_id", "embedding"]).map_batches(
        task_stage(LshBucketStage, dim=dim, n_planes=n_planes),
        batch_format="pyarrow", batch_size=4096)


# ------------------------------------------------------------------ IVF

class _KMeansSeed:
    """Per-batch candidate seeds: the k smallest hash(vec_id) rows. The
    driver merges partials, so the global seed set is a pure function of
    the data (independent of partitioning)."""

    def __init__(self, k: int):
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        vids = batch.column("vec_id").to_numpy()
        h = (vids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) \
            >> np.uint64(1)
        take = np.argsort(h, kind="stable")[:self.k]
        m = _embedding_matrix(batch.column("embedding"))
        return pa.table({
            "h": pa.array(h[take].astype(np.int64), pa.int64()),
            "vec_id": pa.array(vids[take], pa.int64()),
            "embedding": pa.array(list(m[take]),
                                  pa.list_(pa.float64())),
        })


class _KMeansAssignPartial:
    """Per-batch partial sums for one k-means iteration: per-centroid
    (count, sum-vector). Centroids broadcast once (ray.put)."""

    def __init__(self, c_ref):
        import ray
        self.c = ray.get(c_ref)          # (k, dim), unit rows

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_embedding_matrix(batch.column("embedding")))
        a = np.argmax(m @ self.c.T, axis=1)     # ties: lowest centroid id
        order = np.argsort(a, kind="stable")
        a_s, m_s = a[order], m[order]
        bounds = np.concatenate([[0], np.flatnonzero(np.diff(a_s)) + 1,
                                 [len(a_s)]])
        cids = a_s[bounds[:-1]]
        sums = np.add.reduceat(m_s, bounds[:-1], axis=0)
        return pa.table({
            "cid": pa.array(cids.astype(np.int64), pa.int64()),
            "cnt": pa.array(np.diff(bounds).astype(np.int64), pa.int64()),
            "sum": pa.array(list(sums), pa.list_(pa.float64())),
        })


def kmeans_centroids(ds: rd.Dataset, n_lists: int = 64,
                     n_iters: int = 5) -> np.ndarray:
    """Distributed spherical k-means over the embedding column.

    Every heavy pass is a ``map_batches`` partial (one small table per
    batch); the driver reduces only k x dim floats per iteration — the
    broadcast-small-side pattern, never a full-table collect. Seeds are
    the k corpus rows with the smallest splitmix-style hash(vec_id), so
    the result is a pure function of the data. The driver reduce sorts
    partial rows before summing, making centroid floats independent of
    batch arrival order."""
    import ray

    seeds = ds.select_columns(["vec_id", "embedding"]).map_batches(
        task_stage(_KMeansSeed, k=n_lists),
        batch_format="pyarrow", batch_size=8192).to_pandas()
    seeds = seeds.sort_values(["h", "vec_id"]).head(n_lists)
    c = _normalize(np.vstack(seeds["embedding"].to_numpy()))
    for _ in range(n_iters):
        c_ref = ray.put(c)
        parts = ds.select_columns(["vec_id", "embedding"]).map_batches(
            task_stage(_KMeansAssignPartial, c_ref=c_ref),
            batch_format="pyarrow", batch_size=8192).to_pandas()
        parts["key"] = parts["sum"].map(lambda v: np.asarray(v).tobytes())
        parts = parts.sort_values(["cid", "cnt", "key"])
        nxt = c.copy()                   # empty cluster keeps its centroid
        for cid, grp in parts.groupby("cid", sort=True):
            s = np.sum(np.vstack(grp["sum"].to_numpy()), axis=0)
            n = np.linalg.norm(s)
            if n > 1e-30:
                nxt[int(cid)] = s / n
        c = nxt
    return c


def ivf_assign(ds: rd.Dataset, centroids: np.ndarray) -> rd.Dataset:
    """(vec_id, embedding, list_id): nearest-centroid assignment — the
    IVF index body. At 100 TB this is what you ``write_parquet``
    partitioned by list_id so a probe-pruned query READS only its lists;
    here it stays a Dataset consumed by :func:`ivf_topk`."""
    import ray
    c_ref = ray.put(np.ascontiguousarray(centroids, np.float64))

    class _Assign:
        def __init__(self, c_ref):
            self.c = ray.get(c_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _normalize(_embedding_matrix(batch.column("embedding")))
            a = np.argmax(m @ self.c.T, axis=1).astype(np.int64)
            return batch.append_column("list_id", pa.array(a, pa.int64()))

    return ds.select_columns(["vec_id", "embedding"]).map_batches(
        task_stage(_Assign, c_ref=c_ref),
        batch_format="pyarrow", batch_size=8192)


class _IvfPartialTopK:
    """Per-batch partial top-k over PROBED lists only: rows whose
    list_id is outside every query's probe set are dropped before the
    matmul (the compute analogue of reading only probed partitions)."""

    def __init__(self, q_ref, k: int):
        import ray
        self.qids, self.q, self.probes, self.union, self.exclude = \
            ray.get(q_ref)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        lists = batch.column("list_id").to_numpy()
        keep = np.isin(lists, self.union)
        out_q, out_v, out_s = [], [], []
        if keep.any():
            sub = batch.filter(pa.array(keep))
            vids = sub.column("vec_id").to_numpy()
            lsub = lists[keep]
            m = _normalize(_embedding_matrix(sub.column("embedding")))
            sims = self.q @ m.T
            k = self.k
            for qi, qid in enumerate(self.qids):
                mask = np.isin(lsub, self.probes[qi])
                ex = self.exclude.get(int(qid))
                if ex is not None:
                    mask &= vids != ex
                sel = np.flatnonzero(mask)
                if not len(sel):
                    continue
                s = sims[qi][sel]
                kk = min(k, len(sel))
                if len(sel) > kk:
                    kth = -np.partition(-s, kk - 1)[kk - 1]
                    pick = sel[s >= kth]
                else:
                    pick = sel
                out_q.extend([qid] * len(pick))
                out_v.extend(vids[pick].tolist())
                out_s.extend(sims[qi][pick].tolist())
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_v, pa.int64()),
                         "cos": pa.array(out_s, pa.float64())})


def ivf_topk(assigned: rd.Dataset, centroids: np.ndarray,
             query_vecs: np.ndarray, query_ids: np.ndarray,
             k: int = 10, nprobe: int | None = None,
             exclude: dict[int, int] | None = None) -> rd.Dataset:
    """IVF cosine top-k: probe the ``nprobe`` nearest lists per query.

    With ``nprobe == len(centroids)`` every list is probed and the
    result is EXACTLY :func:`brute_force_topk` (same kernel, same
    (cos desc, vec_id asc) ties) — the completeness gate the driver
    SQL-checks; smaller nprobe trades recall for scan fraction.

    ``nprobe=None`` (default) probes HALF the lists (min 8): the bench's
    recall@10/nprobe sweep on the synthetic corpus measures 0.33/0.46/
    0.61/0.84/1.0 at nprobe=1/2/4/8/16 of 16 — synthetic uniform vectors
    are near-unclusterable, so a fixed small nprobe (the previous 4)
    silently shipped 0.61 recall. Real embedding corpora cluster far
    better; tune nprobe against the bench curve for the target corpus
    and pass it explicitly for a measured recall/speed point."""
    import ray

    q = _normalize(np.asarray(query_vecs, np.float64))
    csims = q @ np.ascontiguousarray(centroids, np.float64).T
    if nprobe is None:
        nprobe = max(8, csims.shape[1] // 2)
    nprobe = min(nprobe, csims.shape[1])
    # deterministic probe order: (-sim, list_id)
    probes = [row[:nprobe] for row in
              np.lexsort((np.arange(csims.shape[1])[None, :].repeat(
                  len(q), 0), -csims), axis=1)[:, :nprobe]]
    probes = [np.sort(p).astype(np.int64) for p in probes]
    union = np.unique(np.concatenate(probes)) if probes else np.empty(0, np.int64)
    q_ref = ray.put((np.asarray(query_ids, np.int64), q, probes, union,
                     dict(exclude or {})))

    partials = assigned.map_batches(
        task_stage(_IvfPartialTopK, q_ref=q_ref, k=k),
        batch_format="pyarrow", batch_size=8192)

    def merge(group: pa.Table) -> pa.Table:
        qid = group.column("query_id")[0].as_py()
        s = group.column("cos").to_numpy()
        v = group.column("vec_id").to_numpy()
        order = np.lexsort((v, -s))[:k]
        return pa.table({
            "query_id": pa.array(np.full(len(order), qid), pa.int64()),
            "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int32),
                             pa.int32()),
            "vec_id": pa.array(v[order], pa.int64()),
            "cos_q2": pa.array(np.floor(s[order] * 100.0).astype(np.int64),
                               pa.int64()),
        })

    return partials.groupby("query_id").map_groups(
        merge, batch_format="pyarrow")


def quantize_int8(m: np.ndarray) -> np.ndarray:
    """Symmetric per-vector max-abs int8 scalar quantization:
    ``q_i = floor((127.0 * x_i) / s + 0.5)`` with ``s = max|x_i|`` (an
    all-zero vector quantizes to zeros). The scale is a max — order-
    independent, so exact under any batch split — and every operation
    (float32→float64 widening, multiply, divide, floor) is bit-mirrored
    by the DuckDB oracle (``__ray_entry__._ANN_INT8_SQL``). Returned as
    int64 for numpy matmul convenience; values fit int8 by construction
    (the 100-TB artifact stores them as int8 — a 4x memory cut over
    float32, the standard serving-time compression for embedding
    columns)."""
    m = np.asarray(m, np.float64)
    if not m.size:
        return m.astype(np.int64)
    s = np.max(np.abs(m), axis=1, keepdims=True)
    with np.errstate(invalid="ignore", divide="ignore"):
        q = np.floor((127.0 * m) / s + 0.5)
    q[np.broadcast_to(s == 0.0, q.shape)] = 0.0
    return q.astype(np.int64)


class _PartialTopKInt8:
    """Per-batch partial top-k by QUANTIZED COSINE: integer dot product
    of the int8 vectors normalized by their exact integer self-dots,

        score = dot / (sqrt(na) * sqrt(nb))

    All three inputs are exact int64 (sums of int8 products), and
    sqrt/divide are correctly-rounded IEEE-754 ops on them, so the
    float score is a pure function of the integers — bit-identical
    across batch splits AND in the DuckDB mirror. Ranking by the raw
    dot instead would NOT approximate cosine (max-abs scales differ per
    vector); normalizing restores rank fidelity while keeping every
    comparison hazard-free. A zero vector (na or nb = 0) has no cosine
    and never ranks."""

    def __init__(self, q_ref, k: int):
        import ray
        self.qids, self.q, self.exclude = ray.get(q_ref)
        qn = (self.q * self.q).sum(axis=1)        # exact int64
        self.q_sqrt = np.sqrt(qn.astype(np.float64))
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        vids = batch.column("vec_id").to_numpy()
        m = quantize_int8(_embedding_matrix(batch.column("embedding")))
        nb = (m * m).sum(axis=1)                  # exact int64 per row
        nb_sqrt = np.sqrt(nb.astype(np.float64))
        dots = self.q @ m.T                       # (n_q, n_batch) int64
        out_q, out_v, out_d, out_s = [], [], [], []
        k = self.k
        for qi, qid in enumerate(self.qids):
            d = dots[qi]
            with np.errstate(invalid="ignore", divide="ignore"):
                s = d.astype(np.float64) / (self.q_sqrt[qi] * nb_sqrt)
            mask = nb > 0
            if self.q_sqrt[qi] == 0.0:
                mask = np.zeros(len(vids), bool)
            ex = self.exclude.get(int(qid))
            if ex is not None:
                mask &= vids != ex
            idx = np.flatnonzero(mask)
            if not len(idx):
                continue
            kk = min(k, len(idx))
            if len(idx) > kk:
                kth = -np.partition(-s[idx], kk - 1)[kk - 1]
                top = idx[s[idx] >= kth]         # tie-safe pre-cut
            else:
                top = idx
            out_q.extend([qid] * len(top))
            out_v.extend(vids[top].tolist())
            out_d.extend(d[top].tolist())
            out_s.extend(s[top].tolist())
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_v, pa.int64()),
                         "dot": pa.array(out_d, pa.int64()),
                         "cos": pa.array(out_s, pa.float64())})


def int8_topk(ds: rd.Dataset, query_vecs: np.ndarray,
              query_ids: np.ndarray, k: int = 10,
              exclude: dict[int, int] | None = None) -> rd.Dataset:
    """Top-k by int8-quantized COSINE — the scalar-quantization serving
    path (4x smaller vectors, SIMD int8 kernels at scale). Output
    (query_id, rank, vec_id, dot, cos_qq6): ``dot`` is the exact
    integer dot product, ``cos_qq6`` the quantized cosine floored to a
    1e-6 grid; ranking is by the float quantized cosine (a pure
    function of three exact integers, so deterministic), ties by
    ascending vec_id. Same broadcast/partial/merge shape as
    :func:`brute_force_topk`."""
    import ray

    q = quantize_int8(np.asarray(query_vecs, np.float64))
    q_ref = ray.put((np.asarray(query_ids, np.int64), q,
                     dict(exclude or {})))

    partials = ds.select_columns(["vec_id", "embedding"]).map_batches(
        task_stage(_PartialTopKInt8, q_ref=q_ref, k=k),
        batch_format="pyarrow", batch_size=4096)

    def merge(group: pa.Table) -> pa.Table:
        qid = group.column("query_id")[0].as_py()
        s = group.column("cos").to_numpy()
        d = group.column("dot").to_numpy()
        v = group.column("vec_id").to_numpy()
        order = np.lexsort((v, -s))[:k]
        return pa.table({
            "query_id": pa.array(np.full(len(order), qid), pa.int64()),
            "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int32), pa.int32()),
            "vec_id": pa.array(v[order], pa.int64()),
            "dot": pa.array(d[order], pa.int64()),
            "cos_qq6": pa.array(np.floor(s[order] * 1e6).astype(np.int64),
                                pa.int64()),
        })

    return partials.groupby("query_id").map_groups(merge, batch_format="pyarrow")


def ivf_write(ds: rd.Dataset, index_dir: str, n_lists: int = 64,
              n_iters: int = 5) -> dict:
    """Persist an IVF index: centroids + the corpus written as Parquet
    PARTITIONED BY list_id (one directory per inverted list). This is
    the 100-TB ANN serving artifact — a query that probes ``nprobe``
    lists READS only those partitions from storage; every other byte of
    the corpus never leaves disk. ``list_id`` is duplicated into an
    ordinary column ("list") so the probe-pruned read needs no
    partition-path parsing. Returns the meta dict (also written to
    meta.json)."""
    import json

    centroids = kmeans_centroids(ds, n_lists=n_lists, n_iters=n_iters)
    assigned = ivf_assign(ds, centroids).map_batches(
        lambda t: t.append_column("list", t.column("list_id")),
        batch_format="pyarrow")
    os.makedirs(index_dir, exist_ok=True)
    assigned.write_parquet(os.path.join(index_dir, "lists"),
                           partition_cols=["list_id"])
    np.save(os.path.join(index_dir, "centroids.npy"), centroids)
    meta = {"n_lists": int(n_lists), "dim": int(centroids.shape[1]),
            "n_vectors": int(ds.count())}
    with open(os.path.join(index_dir, "meta.json"), "w") as f:
        json.dump(meta, f, sort_keys=True)
    return meta


def ivf_search_disk(index_dir: str, query_vecs: np.ndarray,
                    query_ids: np.ndarray, k: int = 10,
                    nprobe: int | None = None,
                    exclude: dict[int, int] | None = None) -> rd.Dataset:
    """Query a persisted IVF index with probe-pruned PARTITION READS:
    only the union of the queries' probed lists is read from storage
    (``read_parquet`` over exactly those ``list_id=<l>`` directories).
    With ``nprobe == n_lists`` results are exactly brute force — the
    SQL-gated completeness point; smaller nprobe reads a fraction of
    the corpus. Same kernel/merge as :func:`ivf_topk`."""
    import ray

    centroids = np.load(os.path.join(index_dir, "centroids.npy"))
    q = _normalize(np.asarray(query_vecs, np.float64))
    csims = q @ np.ascontiguousarray(centroids, np.float64).T
    n_lists = csims.shape[1]
    if nprobe is None:
        nprobe = max(8, n_lists // 2)
    nprobe = min(nprobe, n_lists)
    probes = [row[:nprobe] for row in
              np.lexsort((np.arange(n_lists)[None, :].repeat(len(q), 0),
                          -csims), axis=1)[:, :nprobe]]
    probes = [np.sort(p).astype(np.int64) for p in probes]
    union = (np.unique(np.concatenate(probes)) if probes
             else np.empty(0, np.int64))
    # THE read prune: only probed partitions are opened
    dirs = [os.path.join(index_dir, "lists", f"list_id={int(l)}")
            for l in union]
    paths = [os.path.join(d, f) for d in dirs if os.path.isdir(d)
             for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
    if not paths:
        return rd.from_arrow(pa.table({
            "query_id": pa.array([], pa.int64()),
            "rank": pa.array([], pa.int32()),
            "vec_id": pa.array([], pa.int64()),
            "cos_q2": pa.array([], pa.int64())}))
    probed = rd.read_parquet(paths, columns=["vec_id", "embedding", "list"]) \
        .map_batches(lambda t: t.append_column(
            "list_id", t.column("list").cast(pa.int64())),
            batch_format="pyarrow")
    q_ref = ray.put((np.asarray(query_ids, np.int64), q, probes, union,
                     dict(exclude or {})))
    partials = probed.map_batches(
        task_stage(_IvfPartialTopK, q_ref=q_ref, k=k),
        batch_format="pyarrow", batch_size=8192)

    def merge(group: pa.Table) -> pa.Table:
        qid = group.column("query_id")[0].as_py()
        s = group.column("cos").to_numpy()
        v = group.column("vec_id").to_numpy()
        order = np.lexsort((v, -s))[:k]
        return pa.table({
            "query_id": pa.array(np.full(len(order), qid), pa.int64()),
            "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int32),
                             pa.int32()),
            "vec_id": pa.array(v[order], pa.int64()),
            "cos_q2": pa.array(np.floor(s[order] * 100.0).astype(np.int64),
                               pa.int64()),
        })

    return partials.groupby("query_id").map_groups(
        merge, batch_format="pyarrow")


def ivf_append(ds: rd.Dataset, index_dir: str) -> dict:
    """Incrementally add vectors to a persisted IVF index: assign the
    NEW vectors to the EXISTING centroids and write them as additional
    files inside the matching ``list_id=`` partitions — the build never
    re-reads old vectors, so appending N rows costs O(N) regardless of
    index size (the lexical index's delta-append contract, applied to
    ANN). Centroids are not retrained (standard IVF practice: retrain =
    rebuild); search over the appended index is exactly a one-shot
    build over the union at the same centroids. Updates meta.json's
    n_vectors and returns the new meta."""
    import json

    centroids = np.load(os.path.join(index_dir, "centroids.npy"))
    assigned = ivf_assign(ds, centroids).map_batches(
        lambda t: t.append_column("list", t.column("list_id")),
        batch_format="pyarrow")
    # write_parquet appends new UUID-named files; existing partition
    # files are never touched
    assigned.write_parquet(os.path.join(index_dir, "lists"),
                           partition_cols=["list_id"])
    meta_path = os.path.join(index_dir, "meta.json")
    with open(meta_path) as f:
        meta = json.load(f)
    meta["n_vectors"] = int(meta["n_vectors"]) + int(ds.count())
    with open(meta_path, "w") as f:
        json.dump(meta, f, sort_keys=True)
    return meta


def ivf_write_q8(ds: rd.Dataset, index_dir: str, n_lists: int = 64,
                 n_iters: int = 5) -> dict:
    """Persist a COMPRESSED IVF index: centroids train and lists assign
    on the float vectors, but each partition stores only the int8
    quantization (list<int8> ``q``) plus its exact integer self-dot
    (``nn``) — a 4x smaller artifact whose probe-pruned reads move a
    quarter of the bytes. Ranking at query time is the quantized cosine
    (see :class:`_PartialTopKInt8`), so at ``nprobe = n_lists`` results
    equal :func:`int8_topk` exactly — one SQL oracle gates both."""
    import json

    centroids = kmeans_centroids(ds, n_lists=n_lists, n_iters=n_iters)
    assigned = ivf_assign(ds, centroids)

    def compress(t: pa.Table) -> pa.Table:
        q = quantize_int8(_embedding_matrix(t.column("embedding")))
        nn = (q * q).sum(axis=1)
        return pa.table({
            "vec_id": t.column("vec_id"),
            "q": pa.array(list(q.astype(np.int8)), pa.list_(pa.int8())),
            "nn": pa.array(nn.astype(np.int64), pa.int64()),
            "list": t.column("list_id"),
            "list_id": t.column("list_id")})

    os.makedirs(index_dir, exist_ok=True)
    assigned.map_batches(compress, batch_format="pyarrow").write_parquet(
        os.path.join(index_dir, "lists"), partition_cols=["list_id"])
    np.save(os.path.join(index_dir, "centroids.npy"), centroids)
    meta = {"n_lists": int(n_lists), "dim": int(centroids.shape[1]),
            "n_vectors": int(ds.count()), "quantized": "int8"}
    with open(os.path.join(index_dir, "meta.json"), "w") as f:
        json.dump(meta, f, sort_keys=True)
    return meta


class _PartialTopKInt8Stored:
    """Like :class:`_PartialTopKInt8` but over PRE-QUANTIZED partition
    rows (q, nn) — no re-quantization at query time — with per-query
    probe-list restriction."""

    def __init__(self, q_ref, k: int):
        import ray
        (self.qids, self.q, self.probes, self.union,
         self.exclude) = ray.get(q_ref)
        qn = (self.q * self.q).sum(axis=1)
        self.q_sqrt = np.sqrt(qn.astype(np.float64))
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        lists = batch.column("list_id").to_numpy()
        keep = np.isin(lists, self.union)
        out_q, out_v, out_d, out_s = [], [], [], []
        if keep.any():
            sub = batch.filter(pa.array(keep))
            vids = sub.column("vec_id").to_numpy()
            lsub = lists[keep]
            m = _embedding_matrix(sub.column("q")).astype(np.int64)
            nb = sub.column("nn").to_numpy()
            nb_sqrt = np.sqrt(nb.astype(np.float64))
            dots = self.q @ m.T
            k = self.k
            for qi, qid in enumerate(self.qids):
                d = dots[qi]
                with np.errstate(invalid="ignore", divide="ignore"):
                    s = d.astype(np.float64) / (self.q_sqrt[qi] * nb_sqrt)
                mask = (nb > 0) & np.isin(lsub, self.probes[qi])
                if self.q_sqrt[qi] == 0.0:
                    mask[:] = False
                ex = self.exclude.get(int(qid))
                if ex is not None:
                    mask &= vids != ex
                sel = np.flatnonzero(mask)
                if not len(sel):
                    continue
                kk = min(k, len(sel))
                if len(sel) > kk:
                    kth = -np.partition(-s[sel], kk - 1)[kk - 1]
                    pick = sel[s[sel] >= kth]
                else:
                    pick = sel
                out_q.extend([qid] * len(pick))
                out_v.extend(vids[pick].tolist())
                out_d.extend(d[pick].tolist())
                out_s.extend(s[pick].tolist())
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_v, pa.int64()),
                         "dot": pa.array(out_d, pa.int64()),
                         "cos": pa.array(out_s, pa.float64())})


def ivf_search_disk_q8(index_dir: str, query_vecs: np.ndarray,
                       query_ids: np.ndarray, k: int = 10,
                       nprobe: int | None = None,
                       exclude: dict[int, int] | None = None) -> rd.Dataset:
    """Query the compressed IVF index: probe-pruned partition reads of
    int8 rows, quantized-cosine ranking. Output matches
    :func:`int8_topk` (query_id, rank, vec_id, dot, cos_qq6)."""
    import ray

    centroids = np.load(os.path.join(index_dir, "centroids.npy"))
    qf = _normalize(np.asarray(query_vecs, np.float64))
    csims = qf @ np.ascontiguousarray(centroids, np.float64).T
    n_lists = csims.shape[1]
    if nprobe is None:
        nprobe = max(8, n_lists // 2)
    nprobe = min(nprobe, n_lists)
    probes = [np.sort(row[:nprobe]).astype(np.int64) for row in
              np.lexsort((np.arange(n_lists)[None, :].repeat(len(qf), 0),
                          -csims), axis=1)[:, :nprobe]]
    union = (np.unique(np.concatenate(probes)) if probes
             else np.empty(0, np.int64))
    dirs = [os.path.join(index_dir, "lists", f"list_id={int(l)}")
            for l in union]
    paths = [os.path.join(d, f) for d in dirs if os.path.isdir(d)
             for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
    if not paths:
        return rd.from_arrow(pa.table({
            "query_id": pa.array([], pa.int64()),
            "rank": pa.array([], pa.int32()),
            "vec_id": pa.array([], pa.int64()),
            "dot": pa.array([], pa.int64()),
            "cos_qq6": pa.array([], pa.int64())}))
    probed = rd.read_parquet(paths, columns=["vec_id", "q", "nn", "list"]) \
        .map_batches(lambda t: t.append_column(
            "list_id", t.column("list").cast(pa.int64())),
            batch_format="pyarrow")
    q8 = quantize_int8(np.asarray(query_vecs, np.float64))
    q_ref = ray.put((np.asarray(query_ids, np.int64), q8, probes, union,
                     dict(exclude or {})))
    partials = probed.map_batches(
        task_stage(_PartialTopKInt8Stored, q_ref=q_ref, k=k),
        batch_format="pyarrow", batch_size=8192)

    def merge(group: pa.Table) -> pa.Table:
        qid = group.column("query_id")[0].as_py()
        s = group.column("cos").to_numpy()
        d = group.column("dot").to_numpy()
        v = group.column("vec_id").to_numpy()
        order = np.lexsort((v, -s))[:k]
        return pa.table({
            "query_id": pa.array(np.full(len(order), qid), pa.int64()),
            "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int32),
                             pa.int32()),
            "vec_id": pa.array(v[order], pa.int64()),
            "dot": pa.array(d[order], pa.int64()),
            "cos_qq6": pa.array(np.floor(s[order] * 1e6).astype(np.int64),
                                pa.int64())})

    return partials.groupby("query_id").map_groups(
        merge, batch_format="pyarrow")


def embedding_contamination(ds: rd.Dataset, bench_vecs: np.ndarray,
                            bench_ids: np.ndarray,
                            threshold: float = 0.4) -> rd.Dataset:
    """Semantic benchmark decontamination: flag corpus vectors whose
    cosine against ANY benchmark vector reaches ``threshold`` — the
    embedding-space complement of the n-gram overlap check
    (``stages.decontam``), catching paraphrased leakage n-grams miss.

    Shuffle-free: the benchmark matrix broadcasts once via ``ray.put``
    (the small side by definition) and every batch does one matmul;
    output (vec_id, n_contaminating) only for flagged rows, so the
    result is contamination-sized, not corpus-sized. A corpus vector
    that IS a benchmark vector (same vec_id) does not count itself."""
    import ray

    b = _normalize(np.asarray(bench_vecs, np.float64))
    b_ref = ray.put((np.asarray(bench_ids, np.int64), b,
                     np.float64(threshold)))

    class _Flag:
        def __init__(self, b_ref):
            self.bids, self.b, self.thresh = ray.get(b_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            vids = batch.column("vec_id").to_numpy()
            m = _normalize(_embedding_matrix(batch.column("embedding")))
            sims = self.b @ m.T                    # (n_bench, n_batch)
            hit = sims >= self.thresh
            # self-match exclusion by vec_id
            same = self.bids[:, None] == vids[None, :]
            hit &= ~same
            n = hit.sum(axis=0).astype(np.int64)
            keep = n > 0
            return pa.table({
                "vec_id": pa.array(vids[keep], pa.int64()),
                "n_contaminating": pa.array(n[keep], pa.int64())})

    return ds.select_columns(["vec_id", "embedding"]).map_batches(
        task_stage(_Flag, b_ref=b_ref), batch_format="pyarrow",
        batch_size=4096)


# ---------------------------------------------------------------------------
# Product quantization (Jegou, Douze & Schmid 2011, "Product
# quantization for nearest neighbor search"): split each NORMALIZED
# vector into m subvectors, k-means each subspace independently, store
# one byte-ish code per subspace — dim x 8 bytes shrinks to m bytes —
# and answer queries with asymmetric distance (ADC): per query one
# (m x k) lookup table of exact subspace dot products, per candidate a
# SUM of m table gathers, no float vector ever read at query time.
# This is the memory-side 100 TB ANN path (int8 SQ is 4x; PQ here is
# dim*8/m = 64x at m=8 over float64, 32x over float32), composable
# with IVF (probe lists, then ADC within them).


def pq_train(ds: rd.Dataset, m: int = 8, k: int = 16,
             n_iters: int = 5) -> np.ndarray:
    """(m, k, dim/m) PQ codebooks via per-subspace k-means, every heavy
    pass a map_batches partial (same reduce discipline as
    :func:`kmeans_centroids`: the driver folds m*k*subdim floats per
    iteration, partial rows sorted before summing so codebooks are
    independent of batch arrival order). Seeds: the k corpus rows with
    the smallest deterministic hash, sliced per subspace."""
    import ray

    seeds = ds.select_columns(["vec_id", "embedding"]).map_batches(
        task_stage(_KMeansSeed, k=k),
        batch_format="pyarrow", batch_size=8192).to_pandas()
    seeds = seeds.sort_values(["h", "vec_id"]).head(k)
    full = _normalize(np.vstack(seeds["embedding"].to_numpy()))
    dim = full.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    books = np.stack([full[:, j * sub:(j + 1) * sub] for j in range(m)])

    class _PqPartial:
        """Per-batch (subspace, cid) partial sums for the next
        codebooks: assignment by exact squared distance
        |x|^2 - 2 x.c + |c|^2 (only the argmin-relevant terms)."""

        def __init__(self, b_ref):
            self.books = ray.get(b_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            x = _normalize(_embedding_matrix(batch.column("embedding")))
            mm, kk, sd = self.books.shape
            out_j, out_c, out_n, out_s = [], [], [], []
            for j in range(mm):
                xs = x[:, j * sd:(j + 1) * sd]
                b = self.books[j]
                d = (xs * xs).sum(1)[:, None] - 2.0 * (xs @ b.T) \
                    + (b * b).sum(1)[None, :]
                a = np.argmin(d, axis=1)
                order = np.argsort(a, kind="stable")
                a_o = a[order]
                bounds = np.concatenate(
                    [[0], np.flatnonzero(np.diff(a_o)) + 1, [len(a_o)]])
                cids = a_o[bounds[:-1]]
                sums = np.add.reduceat(xs[order], bounds[:-1], axis=0)
                out_j.extend([j] * len(cids))
                out_c.extend(cids.tolist())
                out_n.extend(np.diff(bounds).tolist())
                out_s.extend(list(sums))
            return pa.table({
                "sub": pa.array(out_j, pa.int64()),
                "cid": pa.array(out_c, pa.int64()),
                "cnt": pa.array(out_n, pa.int64()),
                "sum": pa.array([s.tolist() for s in out_s],
                                pa.list_(pa.float64()))})

    for _ in range(n_iters):
        b_ref = ray.put(books)
        parts = ds.select_columns(["vec_id", "embedding"]).map_batches(
            task_stage(_PqPartial, b_ref=b_ref),
            batch_format="pyarrow", batch_size=8192).to_pandas()
        parts["key"] = parts["sum"].map(lambda v: np.asarray(v).tobytes())
        parts = parts.sort_values(["sub", "cid", "cnt", "key"])
        nxt = books.copy()               # empty cell keeps its centroid
        for (j, cid), grp in parts.groupby(["sub", "cid"], sort=True):
            s = np.sum(np.vstack(grp["sum"].to_numpy()), axis=0)
            n = int(grp["cnt"].sum())
            if n > 0:
                nxt[int(j), int(cid)] = s / n
        books = nxt
    return books


def pq_encode(ds: rd.Dataset, books: np.ndarray) -> rd.Dataset:
    """(vec_id, code): each NORMALIZED vector's per-subspace nearest
    codewords packed as an m-byte binary — the stored index body (this
    is what you write_parquet at scale; the float column never ships to
    the query tier)."""
    import ray
    b_ref = ray.put(np.ascontiguousarray(books))

    class _Encode:
        def __init__(self, b_ref):
            self.books = ray.get(b_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            x = _normalize(_embedding_matrix(batch.column("embedding")))
            mm, kk, sd = self.books.shape
            codes = np.empty((len(x), mm), np.uint8)
            for j in range(mm):
                xs = x[:, j * sd:(j + 1) * sd]
                b = self.books[j]
                d = (xs * xs).sum(1)[:, None] - 2.0 * (xs @ b.T) \
                    + (b * b).sum(1)[None, :]
                codes[:, j] = np.argmin(d, axis=1).astype(np.uint8)
            return pa.table({
                "vec_id": batch.column("vec_id"),
                "code": pa.array([c.tobytes() for c in codes],
                                 pa.binary())})

    return ds.select_columns(["vec_id", "embedding"]).map_batches(
        task_stage(_Encode, b_ref=b_ref),
        batch_format="pyarrow", batch_size=8192)


class _PqAdcPartial:
    """ADC partial top-k over a codes batch: per query an (m x k) LUT of
    exact subspace dots; candidate score = sum of m gathers. No float
    vectors at query time."""

    def __init__(self, q_ref, k: int):
        import ray
        self.qids, self.luts, self.exclude = ray.get(q_ref)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        vids = batch.column("vec_id").to_numpy()
        bc = batch.column("code").combine_chunks()
        mm = self.luts.shape[1]
        codes = np.frombuffer(
            b"".join(bc.to_pylist()), np.uint8).reshape(-1, mm)
        out_q, out_v, out_s = [], [], []
        k = self.k
        for qi, qid in enumerate(self.qids):
            lut = self.luts[qi]                  # (m, k_codes)
            s = lut[np.arange(mm)[None, :], codes].sum(axis=1)
            mask = np.ones(len(vids), bool)
            ex = self.exclude.get(int(qid))
            if ex is not None:
                mask &= vids != ex
            idx = np.flatnonzero(mask)
            if not len(idx):
                continue
            kk = min(k, len(idx))
            if len(idx) > kk:
                kth = -np.partition(-s[idx], kk - 1)[kk - 1]
                top = idx[s[idx] >= kth]
            else:
                top = idx
            out_q.extend([qid] * len(top))
            out_v.extend(vids[top].tolist())
            out_s.extend(s[top].tolist())
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_v, pa.int64()),
                         "cos": pa.array(out_s, pa.float64())})


def pq_topk(codes: rd.Dataset, books: np.ndarray, query_vecs: np.ndarray,
            query_ids: np.ndarray, k: int = 10,
            exclude: dict[int, int] | None = None) -> rd.Dataset:
    """Approximate cosine top-k by ADC over a PQ-coded corpus. Output
    (query_id, rank, vec_id, cos_q2) — same shape as
    :func:`brute_force_topk`; scores are the ADC approximation (bench
    records recall@k against the exact path)."""
    import ray

    q = _normalize(np.asarray(query_vecs, np.float64))
    mm, kk, sd = books.shape
    luts = np.empty((len(q), mm, kk), np.float64)
    for j in range(mm):
        luts[:, j, :] = q[:, j * sd:(j + 1) * sd] @ books[j].T
    q_ref = ray.put((np.asarray(query_ids, np.int64), luts,
                     dict(exclude or {})))

    partials = codes.map_batches(
        task_stage(_PqAdcPartial, q_ref=q_ref, k=k),
        batch_format="pyarrow", batch_size=8192)

    def merge(group: pa.Table) -> pa.Table:
        qid = group.column("query_id")[0].as_py()
        s = group.column("cos").to_numpy()
        v = group.column("vec_id").to_numpy()
        order = np.lexsort((v, -s))[:k]
        return pa.table({
            "query_id": pa.array(np.full(len(order), qid), pa.int64()),
            "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int32),
                             pa.int32()),
            "vec_id": pa.array(v[order], pa.int64()),
            "cos_q2": pa.array(np.floor(s[order] * 100.0).astype(np.int64),
                               pa.int64())})

    return partials.groupby("query_id").map_groups(
        merge, batch_format="pyarrow")


class _IvfPqAdcPartial(_PqAdcPartial):
    """ADC partial top-k restricted to PROBED IVF lists: rows outside
    every query's probe set drop before any LUT gather (the compute
    analogue of reading only the probed code partitions)."""

    def __init__(self, q_ref, k: int):
        import ray
        (self.qids, self.luts, self.exclude,
         self.probes, self.union) = ray.get(q_ref)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        lists = batch.column("list_id").to_numpy()
        keep = np.isin(lists, self.union)
        out_q, out_v, out_s = [], [], []
        if keep.any():
            sub = batch.filter(pa.array(keep))
            vids = sub.column("vec_id").to_numpy()
            lsub = lists[keep]
            bc = sub.column("code").combine_chunks()
            mm = self.luts.shape[1]
            codes = np.frombuffer(
                b"".join(bc.to_pylist()), np.uint8).reshape(-1, mm)
            k = self.k
            for qi, qid in enumerate(self.qids):
                lut = self.luts[qi]
                s = lut[np.arange(mm)[None, :], codes].sum(axis=1)
                mask = np.isin(lsub, self.probes[qi])
                ex = self.exclude.get(int(qid))
                if ex is not None:
                    mask &= vids != ex
                idx = np.flatnonzero(mask)
                if not len(idx):
                    continue
                kk = min(k, len(idx))
                if len(idx) > kk:
                    kth = -np.partition(-s[idx], kk - 1)[kk - 1]
                    top = idx[s[idx] >= kth]
                else:
                    top = idx
                out_q.extend([qid] * len(top))
                out_v.extend(vids[top].tolist())
                out_s.extend(s[top].tolist())
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_v, pa.int64()),
                         "cos": pa.array(out_s, pa.float64())})


def ivfpq_encode(ds: rd.Dataset, centroids: np.ndarray,
                 books: np.ndarray) -> rd.Dataset:
    """(vec_id, list_id, code): the composed IVF+PQ index body — the
    shape a 10^12-vector system stores (parquet partitioned by list_id,
    m bytes of code per vector, floats discarded)."""
    assigned = ivf_assign(ds, centroids)
    import ray
    b_ref = ray.put(np.ascontiguousarray(books))

    class _Encode:
        def __init__(self, b_ref):
            self.books = ray.get(b_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            x = _normalize(_embedding_matrix(batch.column("embedding")))
            mm, kk, sd = self.books.shape
            codes = np.empty((len(x), mm), np.uint8)
            for j in range(mm):
                xs = x[:, j * sd:(j + 1) * sd]
                b = self.books[j]
                d = (xs * xs).sum(1)[:, None] - 2.0 * (xs @ b.T) \
                    + (b * b).sum(1)[None, :]
                codes[:, j] = np.argmin(d, axis=1).astype(np.uint8)
            return pa.table({
                "vec_id": batch.column("vec_id"),
                "list_id": batch.column("list_id"),
                "code": pa.array([c.tobytes() for c in codes],
                                 pa.binary())})

    return assigned.map_batches(
        task_stage(_Encode, b_ref=b_ref),
        batch_format="pyarrow", batch_size=8192)


def ivfpq_topk(codes: rd.Dataset, centroids: np.ndarray,
               books: np.ndarray, query_vecs: np.ndarray,
               query_ids: np.ndarray, k: int = 10, nprobe: int = 4,
               exclude: dict[int, int] | None = None) -> rd.Dataset:
    """IVF+PQ search: probe each query's ``nprobe`` nearest lists, score
    ONLY their rows by ADC. At ``nprobe = n_lists`` this equals plain
    :func:`pq_topk` over the same codes exactly (tested), so the probe
    pruning is separately measurable from the quantization loss."""
    import ray

    q = _normalize(np.asarray(query_vecs, np.float64))
    mm, kk, sd = books.shape
    luts = np.empty((len(q), mm, kk), np.float64)
    for j in range(mm):
        luts[:, j, :] = q[:, j * sd:(j + 1) * sd] @ books[j].T
    cs = q @ np.ascontiguousarray(centroids, np.float64).T
    nprobe = min(nprobe, centroids.shape[0])
    probes = np.argsort(-cs, axis=1)[:, :nprobe].astype(np.int64)
    union = np.unique(probes)
    q_ref = ray.put((np.asarray(query_ids, np.int64), luts,
                     dict(exclude or {}), probes, union))

    partials = codes.map_batches(
        task_stage(_IvfPqAdcPartial, q_ref=q_ref, k=k),
        batch_format="pyarrow", batch_size=8192)

    def merge(group: pa.Table) -> pa.Table:
        qid = group.column("query_id")[0].as_py()
        s = group.column("cos").to_numpy()
        v = group.column("vec_id").to_numpy()
        order = np.lexsort((v, -s))[:k]
        return pa.table({
            "query_id": pa.array(np.full(len(order), qid), pa.int64()),
            "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int32),
                             pa.int32()),
            "vec_id": pa.array(v[order], pa.int64()),
            "cos_q2": pa.array(np.floor(s[order] * 100.0).astype(np.int64),
                               pa.int64())})

    return partials.groupby("query_id").map_groups(
        merge, batch_format="pyarrow")


# ------------------------------ integer-exact (SQL-gated) PQ ADC path

def pq_books_int8(ds: rd.Dataset, m: int = 8, k: int = 32) -> np.ndarray:
    """Deterministic INTEGER PQ codebooks — no float training. Codewords
    are the ``k`` corpus rows with the smallest ``hash(vec_id)`` (the
    :class:`_KMeansSeed` order, ties by vec_id), int8-quantized per FULL
    vector on :func:`quantize_int8`'s max-abs grid, then sliced per
    subspace. Every downstream operation (encode argmin over integer
    squared distances, ADC integer LUT sums) is then exact int64
    arithmetic, bit-mirrored by the DuckDB oracle
    (``__ray_entry__._pq_adc_sql``) — the same discipline that
    SQL-gates :func:`int8_topk`. Returns int64 ``(m, k, dim/m)``."""
    seeds = ds.select_columns(["vec_id", "embedding"]).map_batches(
        task_stage(_KMeansSeed, k=k),
        batch_format="pyarrow", batch_size=8192).to_pandas()
    seeds = seeds.sort_values(["h", "vec_id"]).head(k)
    full = quantize_int8(np.vstack(seeds["embedding"].to_numpy()))
    dim = full.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    return np.stack([full[:, j * sub:(j + 1) * sub] for j in range(m)])


class _EncodeInt8:
    """Per-subspace nearest INT8 codeword by exact integer squared
    distance ``x·x - 2 x·c + c·c`` (ties → smallest cid, numpy
    argmin's first-hit); carries ``list_id`` through when present (the
    IVF+PQ body)."""

    def __init__(self, b_ref):
        import ray
        self.books = ray.get(b_ref)            # int64 (m, k, sub)

    def __call__(self, batch: pa.Table) -> pa.Table:
        x = quantize_int8(_embedding_matrix(batch.column("embedding")))
        mm, kk, sd = self.books.shape
        codes = np.empty((len(x), mm), np.uint8)
        for j in range(mm):
            xs = x[:, j * sd:(j + 1) * sd]
            b = self.books[j]
            d = (xs * xs).sum(1)[:, None] - 2 * (xs @ b.T) \
                + (b * b).sum(1)[None, :]
            codes[:, j] = np.argmin(d, axis=1).astype(np.uint8)
        cols = {"vec_id": batch.column("vec_id")}
        if "list_id" in batch.column_names:
            cols["list_id"] = batch.column("list_id")
        cols["code"] = pa.array([c.tobytes() for c in codes], pa.binary())
        return pa.table(cols)


def pq_encode_int8(ds: rd.Dataset, books: np.ndarray) -> rd.Dataset:
    """(vec_id, code): integer-deterministic PQ encoding — same stored
    index shape as :func:`pq_encode`, every assignment exact int64."""
    import ray
    b_ref = ray.put(np.ascontiguousarray(books))
    return ds.select_columns(["vec_id", "embedding"]).map_batches(
        task_stage(_EncodeInt8, b_ref=b_ref),
        batch_format="pyarrow", batch_size=8192)


def ivfpq_encode_int8(ds: rd.Dataset, centroids: np.ndarray,
                      books: np.ndarray) -> rd.Dataset:
    """(vec_id, list_id, code): the IVF+PQ index body with
    integer-deterministic codes — list-partitioned m-byte codes, floats
    discarded, every code SQL-re-derivable."""
    import ray
    b_ref = ray.put(np.ascontiguousarray(books))
    return ivf_assign(ds, centroids).map_batches(
        task_stage(_EncodeInt8, b_ref=b_ref),
        batch_format="pyarrow", batch_size=8192)


class _PqAdcIntPartial:
    """ADC partial top-k with an INTEGER LUT: per query an (m x k)
    table of exact int64 subspace dots; candidate score = sum of m
    gathers — no floats anywhere, so rank (adc_dot desc, vec_id asc)
    is engine/oracle exact. Rows carrying a ``list_id`` column are
    probe-filtered per query (the IVF+PQ composition) before any
    gather."""

    def __init__(self, q_ref, k: int):
        import ray
        (self.qids, self.luts, self.exclude,
         self.probes, self.union) = ray.get(q_ref)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.union is not None and "list_id" in batch.column_names:
            lists = batch.column("list_id").to_numpy()
            keep = np.isin(lists, self.union)
            batch = batch.filter(pa.array(keep))
            lsub = lists[keep]
        else:
            lsub = None
        out_q, out_v, out_s = [], [], []
        if batch.num_rows:
            vids = batch.column("vec_id").to_numpy()
            bc = batch.column("code").combine_chunks()
            mm = self.luts.shape[1]
            codes = np.frombuffer(
                b"".join(bc.to_pylist()), np.uint8).reshape(-1, mm)
            k = self.k
            for qi, qid in enumerate(self.qids):
                lut = self.luts[qi]
                s = lut[np.arange(mm)[None, :], codes].sum(axis=1)
                mask = np.ones(len(vids), bool)
                if lsub is not None:
                    mask &= np.isin(lsub, self.probes[qi])
                ex = self.exclude.get(int(qid))
                if ex is not None:
                    mask &= vids != ex
                idx = np.flatnonzero(mask)
                if not len(idx):
                    continue
                kk = min(k, len(idx))
                if len(idx) > kk:
                    kth = -np.partition(-s[idx], kk - 1)[kk - 1]
                    top = idx[s[idx] >= kth]
                else:
                    top = idx
                out_q.extend([qid] * len(top))
                out_v.extend(vids[top].tolist())
                out_s.extend(s[top].tolist())
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_v, pa.int64()),
                         "adc_dot": pa.array(out_s, pa.int64())})


def pq_adc_int8_topk(codes: rd.Dataset, books: np.ndarray,
                     query_vecs: np.ndarray, query_ids: np.ndarray,
                     k: int = 10,
                     exclude: dict[int, int] | None = None,
                     centroids: np.ndarray | None = None,
                     nprobe: int | None = None) -> rd.Dataset:
    """Integer-exact ADC top-k over an int8-PQ-coded corpus. Output
    (query_id, rank, vec_id, adc_dot) — every column int, rank by
    (adc_dot desc, vec_id asc) — so the driver gate is a value-hash
    match, not rows-only. Pass ``centroids``+``nprobe`` (and codes that
    carry ``list_id``) for the IVF+PQ composition: rows outside the
    probed lists drop before any LUT gather."""
    import ray

    q = quantize_int8(np.asarray(query_vecs, np.float64))
    mm, kk, sd = books.shape
    luts = np.empty((len(q), mm, kk), np.int64)
    for j in range(mm):
        luts[:, j, :] = q[:, j * sd:(j + 1) * sd] @ books[j].T
    if centroids is not None:
        cs = np.asarray(query_vecs, np.float64) \
            @ np.ascontiguousarray(centroids, np.float64).T
        npb = min(nprobe or centroids.shape[0], centroids.shape[0])
        probes = np.argsort(-cs, axis=1)[:, :npb].astype(np.int64)
        union = np.unique(probes)
    else:
        probes, union = None, None
    q_ref = ray.put((np.asarray(query_ids, np.int64), luts,
                     dict(exclude or {}), probes, union))

    partials = codes.map_batches(
        task_stage(_PqAdcIntPartial, q_ref=q_ref, k=k),
        batch_format="pyarrow", batch_size=8192)

    def merge(group: pa.Table) -> pa.Table:
        qid = group.column("query_id")[0].as_py()
        s = group.column("adc_dot").to_numpy()
        v = group.column("vec_id").to_numpy()
        order = np.lexsort((v, -s))[:k]
        return pa.table({
            "query_id": pa.array(np.full(len(order), qid), pa.int64()),
            "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int32),
                             pa.int32()),
            "vec_id": pa.array(v[order], pa.int64()),
            "adc_dot": pa.array(s[order], pa.int64())})

    return partials.groupby("query_id").map_groups(
        merge, batch_format="pyarrow")


# -------------------------------------------- per-group vector mean

def _centroid_partial(t: pa.Table) -> pa.Table:
    """Per-batch (label, dim, s, n) partials of the q6-quantized
    embedding sum — the list-column aggregation pre-reduce. Components
    are offset by +2e6 before summation so every intermediate is
    POSITIVE and integer floor-division at the end is sign-unambiguous
    (engine // and SQL // agree on non-negatives; they differ on
    negative operands)."""
    m = _embedding_matrix(t.column("embedding"))
    n, d = m.shape
    if not n:
        return pa.table({"label": pa.array([], pa.int64()),
                         "dim": pa.array([], pa.int64()),
                         "s": pa.array([], pa.int64()),
                         "n": pa.array([], pa.int64())})
    q = np.floor(m * 1e6).astype(np.int64) + 2_000_000
    labels = t.column("label").to_numpy()
    uniq, inv = np.unique(labels, return_inverse=True)
    sums = np.zeros((len(uniq), d), np.int64)
    np.add.at(sums, inv, q)
    counts = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
    k = len(uniq)
    return pa.table({
        "label": pa.array(np.repeat(uniq.astype(np.int64), d)),
        "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), k)),
        "s": pa.array(sums.ravel(), pa.int64()),
        "n": pa.array(np.repeat(counts, d), pa.int64())})


def embedding_centroids(ds: rd.Dataset) -> rd.Dataset:
    """Per-label mean embedding, integer-exact — the vector AGGREGATE
    (list-column groupby) a clustering/labeling pipeline reports, kept
    on the repo's no-float-summation contract: components quantize to
    1e-6 (in float64, matching SQL DOUBLE math exactly), sums are int64
    (range: 3e6 x n_vectors — safe to ~3x10^12 rows/label), and the
    mean is one floor division. Output long-form (label, dim, n_vecs,
    centroid_q6) — scalar columns only, so the driver's value-hash
    needs no list support.

    Scale shape: each batch pre-reduces to k x dim partial rows (vector
    count never crosses the exchange), then ONE bucket_reduce over
    (label, dim) — the shuffle moves k x dim x n_blocks tiny rows, and
    a final map divides. No stage holds more than one batch of
    vectors."""
    from bge_m3_onnx_ray.stages._groups import bucket_reduce

    parts = ds.select_columns(["label", "embedding"]).map_batches(
        _centroid_partial, batch_format="pyarrow", batch_size=4096)
    agg = bucket_reduce(parts, ["label", "dim"],
                        [("s", "sum", "s"), ("n", "sum", "n")], 64)

    def finalize(t: pa.Table) -> pa.Table:
        s = t.column("s").to_numpy()
        n = t.column("n").to_numpy()
        return pa.table({
            "label": t.column("label"),
            "dim": t.column("dim"),
            "n_vecs": pa.array(n, pa.int64()),
            "centroid_q6": pa.array(s // n - 2_000_000, pa.int64())})

    return agg.map_batches(finalize, batch_format="pyarrow")


def knn_label_vote(ds: rd.Dataset, query_vecs: np.ndarray,
                   query_ids: np.ndarray, k: int = 10,
                   exclude: dict[int, int] | None = None) -> pa.Table:
    """k-NN classification over the embedding column: each query's
    predicted label is the majority vote of its exact cosine top-k
    (tie-break: higher vote count, then SMALLER label). Output
    (query_id, predicted_label, n_votes).

    Scale shape: the neighbor search is :func:`brute_force_topk`
    (broadcast queries, per-batch partial top-k, tiny merge); neighbor
    labels attach via the bucketed :func:`~bge_m3_onnx_ray.stages
    .relational.equi_join` — the corpus side ships only (vec_id, label)
    int pairs, the top-k side is queries x k rows — and the vote itself
    is driver-side over those few rows."""
    from bge_m3_onnx_ray.stages.relational import equi_join

    topk = brute_force_topk(ds, query_vecs, query_ids, k=k,
                            exclude=exclude)
    labels = ds.select_columns(["vec_id", "label"])
    df = equi_join(topk, labels, "vec_id", "vec_id", ["label"]) \
        .to_pandas()
    votes = df.groupby(["query_id", "label"]).size() \
        .reset_index(name="n_votes") \
        .sort_values(["query_id", "n_votes", "label"],
                     ascending=[True, False, True])
    best = votes.groupby("query_id").head(1).sort_values("query_id")
    return pa.table({
        "query_id": pa.array(best["query_id"].to_numpy(), pa.int64()),
        "predicted_label": pa.array(best["label"].to_numpy(), pa.int64()),
        "n_votes": pa.array(best["n_votes"].to_numpy(), pa.int64())})


def centroid_outliers(ds: rd.Dataset) -> rd.Dataset:
    """Per-vector cosine to its OWN label's centroid — the
    mislabeled-sample / outlier detector run after any labeling or
    clustering pass (low cosine = the vector disagrees with its
    cluster). Output (vec_id, label, cos_to_centroid_q6), every row.

    Exactness: both the vector and the centroid live on the q6 integer
    grid (:func:`embedding_centroids`), the dot product and both
    squared norms are INT64 sums of integer products (bounds: dim x
    1e12 per product sum — safe beyond 10^5 dims), and the only float
    step is the final ``dot / (sqrt(nv) * sqrt(nc))`` — one IEEE
    expression evaluated identically by numpy and SQL, then floored to
    q6. Scale shape: centroids are a k x dim driver table broadcast
    once; the scoring pass is map-only."""
    import ray

    cents = embedding_centroids(ds).to_pandas()
    cents = cents.sort_values(["label", "dim"])
    labels_u = np.sort(cents["label"].unique()).astype(np.int64)
    d = int(cents["dim"].max()) + 1 if len(cents) else 0
    cmat = cents["centroid_q6"].to_numpy().astype(np.int64) \
        .reshape(len(labels_u), d)
    # |c|^2 in int64: components bounded by the q6 grid (|c_d| <= 2e6),
    # so dim x 4e12 stays far under 2^63
    cnorm = (cmat * cmat).sum(axis=1, dtype=np.int64)
    ref = ray.put((labels_u, cmat, cnorm.astype(np.float64)))

    def score(t: pa.Table) -> pa.Table:
        l_u, c_m, c_n = ray.get(ref)
        m = _embedding_matrix(t.column("embedding"))
        v = np.floor(m * 1e6).astype(np.int64)
        lab = t.column("label").to_numpy().astype(np.int64)
        li = np.searchsorted(l_u, lab)
        dot = (v * c_m[li]).sum(axis=1).astype(np.float64)
        nv = (v * v).sum(axis=1).astype(np.float64)
        nc = c_n[li]
        denom = np.sqrt(nv) * np.sqrt(nc)
        cos = np.divide(dot, denom, out=np.zeros(len(v)),
                        where=denom > 0)
        return pa.table({
            "vec_id": t.column("vec_id").cast(pa.int64()),
            "label": pa.array(lab, pa.int64()),
            "cos_to_centroid_q6": pa.array(
                np.floor(cos * 1e6).astype(np.int64), pa.int64())})

    return ds.select_columns(["vec_id", "label", "embedding"]) \
        .map_batches(score, batch_format="pyarrow", batch_size=4096)
