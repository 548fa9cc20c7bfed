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


# ----------------------------------------------- Bloom-sketch variant

def _bloom_positions(shingles, m_bits: int, k: int) -> np.ndarray:
    """(n, k) bit positions: lane j of a shingle is
    splitmix64(poly_hash(shingle) * 8 + j) % m_bits — deterministic and
    re-derivable in DuckDB (poly-hash CTE + the splitmix UBIGINT
    chain), so the sketch has an EXACT oracle, false positives
    included."""
    from bge_m3_onnx_ray.hashing import P53, poly_hash, splitmix64
    sx = poly_hash(shingles, P53)                       # < 2^53
    js = np.arange(k, dtype=np.uint64)
    return (splitmix64((sx[:, None] * np.uint64(8)) + js[None, :])
            % np.uint64(m_bits))


def bloom_contamination(ds: rd.Dataset, m_bits: int = 1 << 17,
                        k: int = 4, n: int = 3) -> rd.Dataset:
    """Benchmark decontamination through a BLOOM FILTER — the
    fixed-memory form of :func:`benchmark_shingle_hashes` +
    ``_MatchBenchmark`` for when the benchmark side outgrows an exact
    broadcast (m_bits/8 bytes total, vs 16 B per distinct shingle
    exact): per corpus doc, how many of its distinct word-``n``-grams
    the filter claims are benchmark shingles (includes the sketch's
    false positives — deterministic ones: the hash lanes are exactly
    re-derivable, so the DuckDB oracle reproduces every false positive
    bit-for-bit). Benchmark set = docs with doc_id % 97 == 0, as in the
    exact operator. Output (doc_id, n_bloom_hits), hits > 0 only.

    Scale shape: the filter builds as a ``Dataset.aggregate``
    tree-reduce of per-block partial BITMAPS (merge is elementwise OR —
    associative/commutative, the HLL register shape); the corpus probe
    is map-only against the broadcast bitmap. No shuffle anywhere."""
    import ray
    from ray.data.aggregate import AggregateFn

    words = m_bits // 64

    class _BenchShingles(ShingleStage):
        def __call__(self, batch: pa.Table) -> pa.Table:
            d = batch.column("doc_id").to_numpy()
            return super().__call__(batch.filter(pa.array(d % 97 == 0)))

    def acc_block(bits: np.ndarray, block: pa.Table) -> np.ndarray:
        sh = block.column("shingle")
        if not len(sh):
            return bits
        pos = _bloom_positions(sh.combine_chunks(), m_bits, k).ravel()
        np.bitwise_or.at(bits, (pos // 64).astype(np.int64),
                         np.uint64(1) << (pos % np.uint64(64)))
        return bits

    agg = AggregateFn(init=lambda _: np.zeros(words, np.uint64),
                      merge=np.bitwise_or,
                      accumulate_block=acc_block, name="bloom")
    bench_sh = ds.select_columns(["doc_id", "text"]).map_batches(
        task_stage(_BenchShingles, n=n), batch_format="pyarrow",
        batch_size=2048)
    bits = bench_sh.aggregate(agg)["bloom"]
    ref = ray.put(bits)

    class _Probe(ShingleStage):
        def __call__(self, batch: pa.Table) -> pa.Table:
            t = ShingleStage.__call__(self, batch)
            empty = pa.table({"doc_id": pa.array([], pa.int64()),
                              "n_bloom_hits": pa.array([], pa.int64())})
            if not t.num_rows:
                return empty
            b = ray.get(ref)
            pos = _bloom_positions(t.column("shingle").combine_chunks(),
                                   m_bits, k)
            hit = ((b[(pos // 64).astype(np.int64)]
                    >> (pos % np.uint64(64))) & np.uint64(1)) \
                .astype(bool).all(axis=1)
            doc = t.column("doc_id").to_numpy()
            ud, inv = np.unique(doc, return_inverse=True)
            cnt = np.bincount(inv, weights=hit, minlength=len(ud)) \
                .astype(np.int64)
            nz = cnt > 0
            return pa.table({
                "doc_id": pa.array(ud[nz], pa.int64()),
                "n_bloom_hits": pa.array(cnt[nz], pa.int64())})

    return ds.select_columns(["doc_id", "text"]).map_batches(
        task_stage(_Probe, n=n), batch_format="pyarrow", batch_size=2048)


class _MatchRatio(_MatchBenchmark):
    """The containment form: per doc, distinct-shingle TOTAL and hit
    counts plus the exact q6 ratio — the thresholdable signal
    ("quarantine above 80% containment" vs the any-overlap flag)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = self.stage(batch)
        doc = t.column("doc_id").to_numpy()
        q1 = t.column("h1").to_numpy()
        q2 = t.column("h2").to_numpy()
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "n_shingles": pa.array([], pa.int64()),
                          "n_hit": pa.array([], pa.int64()),
                          "containment_q6": pa.array([], pa.int64())})
        if not len(q1):
            return empty
        if len(self.b1):
            lo = np.searchsorted(self.b1, q1, "left")
            hi = np.searchsorted(self.b1, q1, "right")
            hit = np.zeros(len(q1), bool)
            single = hi - lo == 1
            hit[single] = self.b2[lo[single]] == q2[single]
            for i in np.flatnonzero(hi - lo > 1):
                hit[i] = q2[i] in self.b2[lo[i]:hi[i]]
        else:
            hit = np.zeros(len(q1), bool)
        bounds = np.concatenate([[0], np.flatnonzero(
            doc[1:] != doc[:-1]) + 1])
        totals = np.diff(np.concatenate([bounds, [len(doc)]]))
        hits = np.add.reduceat(hit.astype(np.int64), bounds)
        keep = hits > 0
        if not keep.any():
            return empty
        return pa.table({
            "doc_id": pa.array(doc[bounds][keep], pa.int64()),
            "n_shingles": pa.array(totals[keep], pa.int64()),
            "n_hit": pa.array(hits[keep], pa.int64()),
            "containment_q6": pa.array(
                hits[keep] * 1_000_000 // totals[keep], pa.int64())})


def contamination_ratio(corpus: rd.Dataset, bench: rd.Dataset,
                        n: int = 3) -> rd.Dataset:
    """Containment decontamination (Lee et al. 2022 "Deduplicating
    training data makes language models better" use the same
    fraction-of-ngrams-shared form): per flagged doc, the exact share
    of its distinct shingles found in the benchmark — a quarantine
    THRESHOLD signal where :func:`contaminated_docs` is the any-overlap
    flag. Output (doc_id, n_shingles, n_hit, containment_q6), hits > 0
    only. Same shuffle-free broadcast shape."""
    import ray
    bench_ref = ray.put(benchmark_shingle_hashes(bench, n))
    return corpus.select_columns(["doc_id", "text"]).map_batches(
        task_stage(_MatchRatio, n=n, bench_ref=bench_ref),
        batch_format="pyarrow")
