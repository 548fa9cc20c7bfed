"""Cardinality sketches — the fixed-memory approximate path for
COUNT(DISTINCT) at 100 TB.

HyperLogLog (Flajolet et al. 2007, "HyperLogLog: the analysis of a
near-optimal cardinality estimation algorithm"): each value hashes to a
(register index, leading-zero rank) pair; a sketch is the elementwise
MAX of 2^p byte registers, so per-block partial sketches merge
associatively and commutatively — exactly Ray Data's
``Dataset.aggregate`` tree-reduce shape. Memory is 2^p bytes per
partial (16 KiB at p=14) regardless of input size; standard error is
~1.04 / sqrt(2^p) (~0.8% at p=14).

The exact twin is :func:`bge_m3_onnx_ray.stages.events
.distinct_users_daily` — use it while the distinct-pair exchange is
affordable; the sketch beyond. Hashing is the repo's deterministic
splitmix64, so estimates are bit-reproducible across runs and cluster
sizes (merge order cannot change a MAX)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from bge_m3_onnx_ray.hashing import splitmix64


def _alpha(m: int) -> float:
    # bias correction constants from the HLL paper (m >= 128 branch)
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(values: np.ndarray, p: int = 14) -> np.ndarray:
    """Partial sketch over one block: 2^p uint8 registers.

    splitmix64(values) supplies 64 uniform bits; the top p pick the
    register, the remaining 64-p feed the rank (position of the first
    1-bit, 1-based; all-zero tail -> 64-p+1)."""
    m = 1 << p
    regs = np.zeros(m, np.uint8)
    if not len(values):
        return regs
    h = splitmix64(values.astype(np.uint64))
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    tail = h << np.uint64(p)  # remaining 64-p bits, left-aligned
    # rank = leading zeros of the left-aligned tail + 1 (all-zero tail ->
    # 64-p+1). Exact vectorized clz: view as 8 big-endian bytes, first
    # nonzero byte via argmax over a boolean row, byte-level clz by LUT.
    bts = tail.byteswap().view(np.uint8).reshape(-1, 8)  # big-endian rows
    nz = bts != 0
    first = np.argmax(nz, axis=1)                # 0 if all-zero row
    any_nz = nz.any(axis=1)
    lead_byte = bts[np.arange(len(bts)), first]
    clz8 = _CLZ8[lead_byte]
    clz = np.where(any_nz, first * 8 + clz8, 64).astype(np.int64)
    rank = np.minimum(clz + 1, 64 - p + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


_CLZ8 = np.array([8] + [7 - int(np.floor(np.log2(i))) for i in range(1, 256)],
                 np.int64)  # exact for 8-bit ints (log2 exact below 2^53)


def hll_estimate(regs: np.ndarray) -> float:
    """Bias-corrected HLL estimate with the paper's small/large-range
    corrections (linear counting below 2.5m; log correction near 2^64)."""
    m = len(regs)
    est = _alpha(m) * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    if est <= 2.5 * m:
        zeros = int(np.count_nonzero(regs == 0))
        if zeros:
            return m * np.log(m / zeros)
    two64 = 2.0 ** 64
    if est > two64 / 30.0:
        return -two64 * np.log1p(-est / two64)
    return float(est)


def hll_distinct(ds: rd.Dataset, col: str, p: int = 14) -> dict:
    """Approximate COUNT(DISTINCT col) via a Dataset.aggregate tree
    reduce of partial register arrays — no shuffle, no driver state
    beyond one 2^p-byte sketch. Returns {"estimate": float,
    "registers_nonzero": int, "p": int}."""
    from ray.data.aggregate import AggregateFn

    def acc_block(regs: np.ndarray, block: pa.Table) -> np.ndarray:
        v = block.column(col).to_numpy(zero_copy_only=False)
        return np.maximum(regs, hll_registers(np.asarray(v), p))

    agg = AggregateFn(
        init=lambda k: np.zeros(1 << p, np.uint8),
        merge=np.maximum,
        accumulate_block=acc_block,
        name=f"hll_{col}")
    regs = ds.select_columns([col]).aggregate(agg)[f"hll_{col}"]
    return {"estimate": hll_estimate(regs),
            "registers_nonzero": int(np.count_nonzero(regs)),
            "p": p}


# ---------------------------------------------------------------------------
# Count-Min heavy hitters (Cormode & Muthukrishnan 2005, "An improved
# data stream summary: the count-min sketch and its applications").


class _CmsPartial:
    """One streaming pass emitting three row kinds in ONE narrow table
    (cell, term, n) so a single bucket_reduce merges everything:

    - sketch cells: (cell = j*width + idx, term = "", n = count) — the
      nonzero cells of this batch's count-min sketch, summed globally
      (CMS merge IS elementwise sum);
    - candidates: (cell = -1, term, n = batch count) for terms LOCALLY
      heavy in this batch (count*1e6 >= ppm * batch_tokens). Pigeonhole
      guarantees a globally heavy term is locally heavy in >= 1 batch,
      so the candidate union has NO false negatives;
    - the token total: (cell = -2, term = "", n = batch tokens)."""

    def __init__(self, depth: int, width: int, ppm: int, seed: int = 31):
        from bge_m3_onnx_ray.hashing import minhash_seeds
        from bge_m3_onnx_ray.tokenizer import DeterministicTokenizer
        self.tok = DeterministicTokenizer()
        self.depth, self.width, self.ppm = depth, width, ppm
        self.a, self.b = minhash_seeds(depth, seed=seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from bge_m3_onnx_ray.hashing import P31, P53, poly_hash
        flat, _ = self.tok.batch_token_lists(batch.column("text"))
        total = len(flat)
        if not total:
            return pa.table({"cell": pa.array([], pa.int64()),
                             "term": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        vc = pc.value_counts(flat)
        terms = vc.field("values")
        counts = vc.field("counts").to_numpy().astype(np.int64)
        h = poly_hash(terms, P53) % P31
        cells, ns = [], []
        for j in range(self.depth):
            idx = ((h * self.a[j] + self.b[j]) % P31) \
                % np.uint64(self.width)
            cells.append(np.int64(j * self.width) + idx.astype(np.int64))
            ns.append(counts)
        cell = np.concatenate(cells)
        n = np.concatenate(ns)
        # in-batch cell dedup (two terms may share a cell)
        uc, inv = np.unique(cell, return_inverse=True)
        un = np.zeros(len(uc), np.int64)
        np.add.at(un, inv, n)
        heavy = counts * 1_000_000 >= self.ppm * total
        hterms = terms.filter(pa.array(heavy))
        return pa.table({
            "cell": pa.array(np.concatenate(
                [uc, np.full(int(heavy.sum()), -1, np.int64), [-2]]),
                pa.int64()),
            "term": pa.concat_arrays([
                pa.array([""] * len(uc), pa.string()),
                pc.cast(hterms, pa.string()),
                pa.array([""], pa.string())]),
            "n": pa.array(np.concatenate(
                [un, counts[heavy], [total]]), pa.int64())})


class _ExactTermCounts:
    """Exact tf for a broadcast candidate set only — the verify pass."""

    def __init__(self, cand: tuple):
        from bge_m3_onnx_ray.tokenizer import DeterministicTokenizer
        self.tok = DeterministicTokenizer()
        self.cand = pa.array(sorted(cand), pa.large_string())

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        flat, _ = self.tok.batch_token_lists(batch.column("text"))
        if not len(flat):
            return pa.table({"term": pa.array([], pa.string()),
                             "tf": pa.array([], pa.int64())})
        hit = pc.is_in(flat, value_set=self.cand)
        vc = pc.value_counts(flat.filter(hit))
        return pa.table({
            "term": vc.field("values").cast(pa.string()),
            "tf": vc.field("counts").cast(pa.int64())})


def heavy_hitter_terms(ds: rd.Dataset, threshold_ppm: int = 2000,
                       depth: int = 4, width: int = 8192) -> pa.Table:
    """EXACT heavy hitters — every term whose corpus-wide tf is >=
    threshold_ppm/1e6 of all tokens — via the classic sketch-then-verify
    shape: one streaming pass builds a merged count-min sketch + a
    no-false-negative candidate union (locally-heavy pigeonhole) + the
    token total; the sketch's overestimate-only point queries PRUNE
    candidates (est < T cannot be heavy); a second streaming pass counts
    the survivors exactly. Nothing corpus-sized ever aggregates: the
    sketch is depth x width cells, candidates are bounded by
    batches/phi, and the verify pass carries survivor terms only.
    Returns (term, tf) sorted by term, exact."""
    from bge_m3_onnx_ray.stages._groups import bucket_reduce
    from bge_m3_onnx_ray.stages._pool import task_stage

    part = ds.select_columns(["text"]).map_batches(
        task_stage(_CmsPartial, depth=depth, width=width,
                   ppm=threshold_ppm),
        batch_format="pyarrow", batch_size=8192)
    merged = bucket_reduce(part, ["cell", "term"],
                           [("n", "sum", "n")], n_buckets=32).to_pandas()
    total = int(merged.loc[merged.cell == -2, "n"].sum())
    if not total:
        return pa.table({"term": pa.array([], pa.string()),
                         "tf": pa.array([], pa.int64())})
    thresh_num = threshold_ppm * total            # compare tf*1e6 >= this
    cand = merged[merged.cell == -1]["term"].tolist()
    cells = merged[merged.cell >= 0]
    sk = np.zeros(depth * width, np.int64)
    sk[cells["cell"].to_numpy()] = cells["n"].to_numpy()
    from bge_m3_onnx_ray.hashing import P31, P53, poly_hash
    from bge_m3_onnx_ray.hashing import minhash_seeds
    a, b = minhash_seeds(depth, seed=31)
    carr = pa.array(sorted(set(cand)), pa.large_string())
    h = poly_hash(carr, P53) % P31
    est = np.full(len(h), np.iinfo(np.int64).max, np.int64)
    for j in range(depth):
        idx = ((h * a[j] + b[j]) % P31) % np.uint64(width)
        est = np.minimum(est, sk[j * width + idx.astype(np.int64)])
    keep = est * 1_000_000 >= thresh_num
    survivors = tuple(t for t, k in zip(carr.to_pylist(), keep) if k)
    if not survivors:
        return pa.table({"term": pa.array([], pa.string()),
                         "tf": pa.array([], pa.int64())})
    exact = bucket_reduce(
        ds.select_columns(["text"]).map_batches(
            task_stage(_ExactTermCounts, cand=survivors),
            batch_format="pyarrow", batch_size=8192),
        ["term"], [("tf", "sum", "tf")], n_buckets=16).to_pandas()
    out = exact[exact.tf * 1_000_000 >= thresh_num] \
        .sort_values("term").reset_index(drop=True)
    return pa.table({"term": pa.array(out.term.tolist(), pa.string()),
                     "tf": pa.array(out.tf.to_numpy(), pa.int64())})
