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

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Count, Min, Sum

from bge_m3_onnx_ray.tokenizer import DeterministicTokenizer


# ---------------------------------------------------------------- exact

def exact_dedup(ds: rd.Dataset) -> rd.Dataset:
    """Group identical ``text``; keep the smallest doc_id as canonical.
    Output: (doc_id, n_dups). Shuffle key = text itself in-sandbox; at
    scale the key would be a 128-bit content hash added per batch
    (identical semantics, bounded key width)."""
    return ds.select_columns(["doc_id", "text"]).groupby("text").aggregate(
        Min("doc_id", alias_name="doc_id"),
        Count(alias_name="n_dups")).select_columns(["doc_id", "n_dups"])


# ------------------------------------------------- n-gram Jaccard pairs

class ShingleStage:
    """Explode each doc into word-n-gram shingle rows (shingle, doc_id).
    Shingles are space-joined token n-grams; the DuckDB oracle builds the
    identical strings."""

    def __init__(self, n: int):
        self.tok = DeterministicTokenizer()
        self.n = n

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_s, out_d = [], []
        n = self.n
        for doc_id, text in zip(batch.column("doc_id").to_pylist(),
                                batch.column("text").to_pylist()):
            ts = self.tok.tokenize(text or "")
            seen = set()
            for i in range(len(ts) - n + 1):
                sh = " ".join(ts[i:i + n])
                if sh not in seen:       # distinct shingles per doc
                    seen.add(sh)
                    out_s.append(sh)
                    out_d.append(doc_id)
        return pa.table({"shingle": pa.array(out_s, pa.string()),
                         "doc_id": pa.array(out_d, pa.int64())})


def _pairs_from_group(group: pa.Table, cap: int) -> pa.Table:
    docs = np.unique(group.column("doc_id").to_numpy())
    if len(docs) < 2 or len(docs) > cap:
        # overly-common shingle: banned from candidate generation (the
        # standard guard against O(g^2) blowup on stopword shingles)
        return pa.table({"doc_a": pa.array([], pa.int64()),
                         "doc_b": pa.array([], pa.int64())})
    a, b = np.triu_indices(len(docs), k=1)
    return pa.table({"doc_a": pa.array(docs[a], pa.int64()),
                     "doc_b": pa.array(docs[b], pa.int64())})


def ngram_pair_candidates(ds: rd.Dataset, n: int = 3, min_common: int = 2,
                          group_cap: int = 1000) -> rd.Dataset:
    """Pairs of docs sharing >= min_common distinct word-n-gram shingles.
    Output (doc_a, doc_b, n_common), doc_a < doc_b."""
    shingles = ds.select_columns(["doc_id", "text"]).map_batches(
        ShingleStage, fn_constructor_kwargs={"n": n},
        batch_format="pyarrow", batch_size=4096, concurrency=(1, 4))
    pairs = shingles.groupby("shingle").map_groups(
        lambda g: _pairs_from_group(g, group_cap), batch_format="pyarrow")
    counted = pairs.groupby(["doc_a", "doc_b"]).aggregate(
        Count(alias_name="n_common"))
    import pyarrow.compute as pc
    return counted.map_batches(
        lambda t: t.filter(pc.greater_equal(t["n_common"], min_common)),
        batch_format="pyarrow")


def dup_clusters(pairs: rd.Dataset, max_rounds: int = 512) -> rd.Dataset:
    """Connected components over a candidate-pair list → (doc_id,
    cluster_id) with cluster_id = min docID in the component.

    Distributed min-label propagation using ONLY groupby shuffles (no
    joins): each round unions label rows with edge rows, groups by node,
    and broadcasts the node's current min label to its neighbors;
    converges in O(diameter) rounds (checked via a label checksum). The
    driver-side union-find shortcut is deliberately NOT used — candidate
    graphs can be large at corpus scale.
    """
    edges = pairs.select_columns(["doc_a", "doc_b"]).map_batches(
        lambda t: pa.table({
            "key": pa.concat_arrays([t["doc_a"].combine_chunks(),
                                     t["doc_b"].combine_chunks()]),
            "val": pa.concat_arrays([t["doc_b"].combine_chunks(),
                                     t["doc_a"].combine_chunks()]),
            "kind": pa.array(["e"] * (2 * t.num_rows), pa.string()),
        }), batch_format="pyarrow").materialize()
    labels = edges.groupby("key").aggregate(Min("val", alias_name="val")) \
        .map_batches(lambda t: pa.table({
            "key": t["key"],
            "val": pa.compute.min_element_wise(t["key"], t["val"]),
            "kind": pa.array(["l"] * t.num_rows, pa.string()),
        }), batch_format="pyarrow").materialize()

    def propagate(group: pa.Table) -> pa.Table:
        kinds = group.column("kind").to_pylist()
        vals = group.column("val").to_numpy()
        node = group.column("key")[0].as_py()
        label = min(int(vals[i]) for i, k in enumerate(kinds) if k == "l")
        nbrs = [int(vals[i]) for i, k in enumerate(kinds) if k == "e"]
        out_k = [node] + nbrs
        out_v = [label] * (1 + len(nbrs))
        return pa.table({"key": pa.array(out_k, pa.int64()),
                         "val": pa.array(out_v, pa.int64()),
                         "kind": pa.array(["l"] * len(out_k), pa.string())})

    prev_sum = None
    converged = False
    for _ in range(max_rounds):
        msgs = labels.union(edges).groupby("key").map_groups(
            propagate, batch_format="pyarrow")
        labels = msgs.groupby("key").aggregate(Min("val", alias_name="val")) \
            .map_batches(lambda t: pa.table({
                "key": t["key"], "val": t["val"],
                "kind": pa.array(["l"] * t.num_rows, pa.string()),
            }), batch_format="pyarrow").materialize()
        s = labels.aggregate(Sum("val"))["sum(val)"]
        if s == prev_sum:
            converged = True
            break
        prev_sum = s
    if not converged:
        # min-label propagation advances ~1 hop/round; a component whose
        # diameter exceeds max_rounds would get WRONG labels — fail loudly
        raise RuntimeError(
            f"dup_clusters did not converge within {max_rounds} rounds "
            f"(component diameter too large); raise max_rounds")
    return labels.map_batches(lambda t: pa.table({
        "doc_id": t["key"], "cluster_id": t["val"]}), batch_format="pyarrow")


# ----------------------------------------------------------- MinHash/LSH

def _hash_shingles_batch(shingles: list[str], seeds: np.ndarray) -> np.ndarray:
    """(n_shingles, n_perm) hash matrix from crc32 base hashes.
    crc32 (not Python hash()) → deterministic across processes.

    Note: the affine map wraps mod 2^64 BEFORE the mod-p reduction, so
    this is an affine-over-2^64 mixing hash, not a strict min-wise
    independent (a*x+b) mod p family — deterministic and well-spread,
    adequate for LSH candidate generation (candidates are verified with
    exact Jaccard anyway)."""
    base = np.fromiter((zlib.crc32(s.encode()) for s in shingles),
                       np.uint64, len(shingles))
    p = np.uint64((1 << 61) - 1)
    a, b = seeds[0], seeds[1]
    with np.errstate(over="ignore"):
        return ((base[:, None] * a[None, :] + b[None, :]) % p)


class MinHashStage:
    """Per-doc MinHash signature (n_perm permutations) + LSH band keys.
    One row per (doc, band): (band, band_hash, doc_id)."""

    def __init__(self, n: int, n_perm: int, n_bands: int, seed: int = 7):
        assert n_perm % n_bands == 0
        self.tok = DeterministicTokenizer()
        self.n = n
        self.n_perm = n_perm
        self.n_bands = n_bands
        rng = np.random.default_rng(seed)
        p = (1 << 61) - 1
        self.seeds = np.stack([
            rng.integers(1, p, n_perm, dtype=np.uint64),
            rng.integers(0, p, n_perm, dtype=np.uint64)])

    def signature(self, text: str) -> np.ndarray | None:
        ts = self.tok.tokenize(text or "")
        shingles = list({" ".join(ts[i:i + self.n])
                         for i in range(len(ts) - self.n + 1)})
        if not shingles:
            return None
        return _hash_shingles_batch(shingles, self.seeds).min(axis=0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows_b, rows_h, rows_d = [], [], []
        rpb = self.n_perm // self.n_bands
        for doc_id, text in zip(batch.column("doc_id").to_pylist(),
                                batch.column("text").to_pylist()):
            sig = self.signature(text)
            if sig is None:
                continue
            for b in range(self.n_bands):
                band = sig[b * rpb:(b + 1) * rpb]
                h = zlib.crc32(band.tobytes())
                rows_b.append(b)
                rows_h.append(h)
                rows_d.append(doc_id)
        return pa.table({"band": pa.array(rows_b, pa.int32()),
                         "band_hash": pa.array(rows_h, pa.int64()),
                         "doc_id": pa.array(rows_d, pa.int64())})


def minhash_lsh_candidates(ds: rd.Dataset, n: int = 3, n_perm: int = 64,
                           n_bands: int = 16, group_cap: int = 1000) -> rd.Dataset:
    """Candidate near-dup pairs via MinHash LSH banding. Output
    (doc_a, doc_b) distinct pairs colliding in >= 1 band."""
    bands = ds.select_columns(["doc_id", "text"]).map_batches(
        MinHashStage, fn_constructor_kwargs={"n": n, "n_perm": n_perm,
                                             "n_bands": n_bands},
        batch_format="pyarrow", batch_size=2048, concurrency=(1, 4))
    pairs = bands.groupby(["band", "band_hash"]).map_groups(
        lambda g: _pairs_from_group(g, group_cap), batch_format="pyarrow")
    return pairs.groupby(["doc_a", "doc_b"]).aggregate(
        Count(alias_name="n_bands_hit"))


def verify_jaccard(ds: rd.Dataset, candidates: pa.Table, n: int = 3) -> pa.Table:
    """Exact Jaccard for candidate pairs: broadcast candidate doc set,
    collect their shingle sets (small side), verify on the driver."""
    import ray
    docs_needed = sorted(set(candidates.column("doc_a").to_pylist()) |
                         set(candidates.column("doc_b").to_pylist()))
    needed_ref = ray.put(frozenset(docs_needed))

    class CollectShingles(ShingleStage):
        def __init__(self):
            super().__init__(n)
            self.needed = ray.get(needed_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            mask = pc.is_in(batch["doc_id"], pa.array(sorted(self.needed)))
            return super().__call__(batch.filter(mask))

    sh = ds.select_columns(["doc_id", "text"]).map_batches(
        CollectShingles, batch_format="pyarrow", batch_size=4096,
        concurrency=(1, 4)).to_pandas()
    sets = {d: set(g["shingle"]) for d, g in sh.groupby("doc_id")}
    jac = []
    for a, b in zip(candidates.column("doc_a").to_pylist(),
                    candidates.column("doc_b").to_pylist()):
        sa, sb = sets.get(a, set()), sets.get(b, set())
        u = len(sa | sb)
        jac.append(len(sa & sb) / u if u else 0.0)
    return candidates.append_column(
        "jaccard_q6", pa.array(np.floor(np.array(jac) * 1e6).astype(np.int64),
                               pa.int64()))


# --------------------------------------------------------------- SimHash

class SimHashStage:
    """64-bit SimHash over tf-weighted crc32 term hashes; no shuffle."""

    def __init__(self):
        self.tok = DeterministicTokenizer()

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = np.zeros(batch.num_rows, np.uint64)
        for i, text in enumerate(batch.column("text").to_pylist()):
            ts = self.tok.tokenize(text or "")
            if not ts:
                continue
            from collections import Counter
            acc = np.zeros(64, np.float64)
            for term, tf in Counter(ts).items():
                h = np.uint64(zlib.crc32(term.encode()) |
                              (zlib.crc32(term[::-1].encode()) << 32))
                bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
                acc += tf * (2.0 * bits.astype(np.float64) - 1.0)
            bits = (acc > 0).astype(np.uint64)
            out[i] = np.bitwise_or.reduce(bits << np.arange(64, dtype=np.uint64))
        return pa.table({"doc_id": batch.column("doc_id"),
                         "simhash": pa.array(out.view(np.int64), pa.int64())})


def simhash(ds: rd.Dataset) -> rd.Dataset:
    return ds.select_columns(["doc_id", "text"]).map_batches(
        SimHashStage, batch_format="pyarrow", batch_size=2048, concurrency=(1, 4))


# ------------------------------------------------- embedding near-dup

def embedding_dup_pairs(ds: rd.Dataset, threshold: float = 0.4) -> rd.Dataset:
    """All pairs with cosine >= threshold. Sandbox-scale implementation:
    normalize per batch, then block-matmul each batch against the full
    (broadcast) matrix — O(N^2/B) per task, no shuffle. At 100 TB this
    becomes the LSH-bucketed variant (ann.lsh_buckets) — documented
    scale path. Output (vec_a, vec_b, cos_q2), vec_a < vec_b."""
    import ray

    mat_t = ds.select_columns(["vec_id", "embedding"]).to_pandas()
    ids = mat_t["vec_id"].to_numpy(np.int64)
    m = np.stack(mat_t["embedding"].to_numpy()).astype(np.float64)
    m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
    mat_ref = ray.put((ids, m))

    class BlockCos:
        def __init__(self):
            self.ids, self.m = ray.get(mat_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            bids = batch.column("vec_id").to_numpy()
            bm = np.stack(batch.column("embedding").to_pylist()).astype(np.float64)
            bm /= np.maximum(np.linalg.norm(bm, axis=1, keepdims=True), 1e-30)
            sims = bm @ self.m.T
            bi, gj = np.nonzero((sims >= threshold) &
                                (bids[:, None] < self.ids[None, :]))
            return pa.table({
                "vec_a": pa.array(bids[bi], pa.int64()),
                "vec_b": pa.array(self.ids[gj], pa.int64()),
                "cos_q2": pa.array(np.floor(sims[bi, gj] * 100.0).astype(np.int64),
                                   pa.int64())})

    out = ds.select_columns(["vec_id", "embedding"]).map_batches(
        BlockCos, batch_format="pyarrow", batch_size=256,
        concurrency=(1, 4))
    return out
