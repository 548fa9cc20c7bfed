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
    matrix; state fetched once per worker (task_stage cache)."""

    def __init__(self, q_ref, k: int):
        import ray
        self.qids, self.q, self.exclude = ray.get(q_ref)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        vids = batch.column("vec_id").to_numpy()
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
                     exclude: dict[int, int] | None = None) -> rd.Dataset:
    """Exact cosine top-k for each query vector.

    Output (query_id, rank, vec_id, cos_q2); ties (cos equal) break by
    ascending vec_id. ``exclude`` maps query_id -> vec_id to drop (self-
    match exclusion when queries come from the corpus)."""
    import ray

    q = _normalize(np.asarray(query_vecs, np.float64))
    q_ref = ray.put((np.asarray(query_ids, np.int64), q,
                     dict(exclude or {})))

    partials = ds.select_columns(["vec_id", "embedding"]).map_batches(
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
