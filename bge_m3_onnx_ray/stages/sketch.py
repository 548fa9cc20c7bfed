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
