"""Benchmark decontamination: flag training documents that share any
word-n-gram with a held-out evaluation/benchmark set.

The standard training-data hygiene pass (GPT-3 appendix C, Dodge et al.
2021 "Documenting Large Webtext Corpora" — both public): before
training, every corpus document whose text overlaps an evaluation
benchmark by at least one n-gram is flagged (and usually dropped) so
eval scores measure generalization, not memorization. The reference
repo has no such operator (it embeds single texts,
``samples/python/bge_m3_embedder.py``); this is part of the
training-data operator set the engine brief adds on top.

Partitioning strategy (the 100-TB shape): benchmark sets are small by
nature (MBs — a few thousand eval prompts), so the benchmark side is
shingled once, hashed, deduplicated, and BROADCAST via ``ray.put``;
the corpus pass is then a pure ``map_batches`` — membership tests
against the broadcast sorted arrays, NO shuffle at all. A benchmark too
large to broadcast would instead hash-partition both sides on the
shingle hash (the ``dedup._candidate_pairs`` pattern); not needed for
real benchmark sizes.

Hashing: shingles cross the membership test as the repo's two-lane
106-bit polynomial codepoint hash (bases 131/257 mod P53 —
``hashing.poly_hash``), so the broadcast costs 16 bytes per distinct
benchmark shingle and the DuckDB oracle (which joins shingle STRINGS)
agrees unless both 53-bit lanes collide (~2^-106 per pair;
non-adversarial threat model documented in ``dedup.exact_dedup``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from bge_m3_onnx_ray.stages._pool import task_stage
from bge_m3_onnx_ray.stages.dedup import ShingleStage


class _ShingleHashes(ShingleStage):
    """Per-batch distinct (doc_id, shingle) rows → two-lane hashes."""

    def __call__(self, batch: pa.Table) -> pa.Table:  # noqa: D102
        t = super().__call__(batch)
        from bge_m3_onnx_ray.hashing import P53, poly_hash
        sh = t.column("shingle")
        return pa.table({
            "doc_id": t.column("doc_id"),
            "h1": pa.array(poly_hash(sh, P53).astype(np.int64)),
            "h2": pa.array(poly_hash(sh, P53,
                                     base=np.uint64(257)).astype(np.int64)),
        })


def benchmark_shingle_hashes(bench: rd.Dataset, n: int = 3
                             ) -> tuple[np.ndarray, np.ndarray]:
    """Distinct two-lane shingle hashes of the benchmark set, sorted by
    (h1, h2) — the broadcast side. Streams batch partials to the driver
    (``iter_batches``) and dedups with one lexsort; the result is the
    only driver-resident state and is benchmark-sized, not corpus-sized.
    """
    sh = bench.map_batches(task_stage(_ShingleHashes, n=n),
                           batch_format="pyarrow")
    parts1, parts2 = [], []
    for b in sh.iter_batches(batch_format="pyarrow"):
        parts1.append(b.column("h1").to_numpy())
        parts2.append(b.column("h2").to_numpy())
    if not parts1:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    h1 = np.concatenate(parts1)
    h2 = np.concatenate(parts2)
    order = np.lexsort((h2, h1))
    h1, h2 = h1[order], h2[order]
    keep = np.ones(len(h1), bool)
    keep[1:] = (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])
    return h1[keep], h2[keep]


class _MatchBenchmark:
    """Count per document the distinct shingles present in the broadcast
    benchmark set. Exact two-lane membership, vectorized: a sorted-h1
    searchsorted prefilter, then an h2 equality check on the (almost
    always singleton) h1 run; benchmark-internal h1 collisions — runs
    longer than one — fall back to a loop over only those rows."""

    def __init__(self, n: int, bench_ref):
        import ray
        self.stage = _ShingleHashes(n)
        self.b1, self.b2 = ray.get(bench_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = self.stage(batch)
        doc = t.column("doc_id").to_numpy()
        q1 = t.column("h1").to_numpy()
        q2 = t.column("h2").to_numpy()
        if len(self.b1) == 0 or len(q1) == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_hit_ngrams": pa.array([], pa.int64())})
        lo = np.searchsorted(self.b1, q1, "left")
        hi = np.searchsorted(self.b1, q1, "right")
        hit = np.zeros(len(q1), bool)
        single = hi - lo == 1
        hit[single] = self.b2[lo[single]] == q2[single]
        for i in np.flatnonzero(hi - lo > 1):       # bench h1 collision
            hit[i] = q2[i] in self.b2[lo[i]:hi[i]]
        if not hit.any():
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_hit_ngrams": pa.array([], pa.int64())})
        hdoc = doc[hit]
        # rows are grouped by doc in ShingleStage output order
        bounds = np.concatenate([[0], np.flatnonzero(
            hdoc[1:] != hdoc[:-1]) + 1])
        counts = np.diff(np.concatenate([bounds, [len(hdoc)]]))
        return pa.table({"doc_id": pa.array(hdoc[bounds], pa.int64()),
                         "n_hit_ngrams": pa.array(counts, pa.int64())})


def contaminated_docs(corpus: rd.Dataset, bench: rd.Dataset,
                      n: int = 3) -> rd.Dataset:
    """Documents sharing >= 1 word-``n``-gram with the benchmark set.

    Output: (doc_id, n_hit_ngrams) — n_hit_ngrams = how many DISTINCT
    shingles of the document appear anywhere in the benchmark. Drop or
    quarantine the flagged rows before training. Shuffle-free: the
    benchmark hash set is built once and broadcast (``ray.put``); the
    corpus pass is one ``map_batches``.

    A document shorter than ``n`` tokens has no shingles and is never
    flagged (mirrored by the oracle's shingle generator).
    """
    import ray
    bench_ref = ray.put(benchmark_shingle_hashes(bench, n))
    return corpus.select_columns(["doc_id", "text"]).map_batches(
        task_stage(_MatchBenchmark, n=n, bench_ref=bench_ref),
        batch_format="pyarrow")
