"""Deterministic, SQL-expressible string hashing shared by the dedup /
fingerprint stages and their DuckDB oracles.

The hash family is a polynomial (Horner) rolling hash over Unicode
CODEPOINTS:  ``h = 0; for ch in s: h = (h * B + ord(ch)) % p``.

Why this instead of crc32/xxhash: the driver's correctness gate compares
engine output against ANSI SQL run by DuckDB, and a polynomial hash is
the one hash DuckDB 1.0 can reproduce exactly (``unicode(substring(...))``
codepoints + a recursive-CTE power table in HUGEINT — see
``__ray_entry__.poly_hash_sql``). Two moduli are used, both chosen so
every intermediate fits the engine's uint64 AND the oracle's integer
types:

- ``P53`` (largest prime < 2^53): fingerprint / SimHash bit source.
  Horner step ``h*131 + cp`` < 2^60 (uint64-safe); the SQL side sums
  ``cp * B^(L-i)`` terms < 2^73 in HUGEINT.
- ``P31`` (2^31-1): MinHash base hash, because the affine permutations
  ``(a*h + b) % P31`` with a,h < 2^31 stay under 2^62 — safe in uint64
  and in DuckDB's signed BIGINT.

The reference's tests hash nothing — but its golden-parity methodology
(byte-identical outputs across independent implementations,
``samples/python/bge_m3_tests.py:146-160``) is exactly what these
cross-engine-stable hashes buy at corpus scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

P53 = np.uint64((1 << 53) - 111)   # 9007199254740881, prime
P31 = np.uint64((1 << 31) - 1)     # 2147483647, prime (Mersenne)
B = np.uint64(131)

_SM_GAMMA = np.uint64(0x9E3779B97F4A7C15)
_SM_M1 = np.uint64(0xBF58476D1CE4E5B9)
_SM_M2 = np.uint64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain mixing function,
    Steele/Lea/Flood 2014): uint64 → uint64 with full avalanche. Used as
    a SOUND multiset fingerprint: summing ``splitmix64(v)`` over a
    multiset detects any multiset difference except a ~2^-64 sum
    collision — unlike raw power sums, which low-order multisets can
    preserve (see ``index.build._conv_partial``)."""
    z = x.astype(np.uint64) + _SM_GAMMA
    z = (z ^ (z >> np.uint64(30))) * _SM_M1
    z = (z ^ (z >> np.uint64(27))) * _SM_M2
    return z ^ (z >> np.uint64(31))


def poly_hash(strings, p: np.uint64 = P53, base: np.uint64 = B) -> np.ndarray:
    """Vectorized polynomial rolling hash of a string array → uint64 < p.

    ASCII strings go through one numpy Horner sweep over the utf-8 buffer
    (codepoint == byte there); non-ASCII strings take a per-string Python
    path over real codepoints — identical results, and the split exists
    only because numpy has no vectorized codepoint iterator.

    ``base`` must keep the Horner step under 2^64: p*base + 1114111 —
    any base ≤ 1024 is safe with P53.
    """
    if isinstance(strings, pa.ChunkedArray):
        strings = strings.combine_chunks()
    if not isinstance(strings, pa.Array):
        strings = pa.array(list(strings), pa.large_string())
    import pyarrow.compute as pc
    strings = strings.cast(pa.large_string())
    n = len(strings)
    out = np.zeros(n, np.uint64)
    if n == 0:
        return out
    ascii_mask = pc.fill_null(pc.string_is_ascii(strings), True) \
        .to_numpy(zero_copy_only=False)
    if ascii_mask.all():
        sub = strings
        rows = None
    else:
        rows = np.flatnonzero(ascii_mask)
        sub = strings.take(pa.array(rows))
        # exact path for non-ASCII rows: Horner over codepoints
        for i in np.flatnonzero(~ascii_mask):
            s = strings[int(i)].as_py()
            h = 0
            pp, bb = int(p), int(base)
            for ch in (s or ""):
                h = (h * bb + ord(ch)) % pp
            out[i] = h
    if len(sub):
        # flat byte view of the ascii subset + per-string offsets (from the
        # raw buffers — StringArray has no .offsets accessor; honor the
        # array's slice offset)
        bufs = sub.buffers()
        off_all = np.frombuffer(bufs[1], np.int64)
        off = off_all[sub.offset:sub.offset + len(sub) + 1]
        data = np.frombuffer(bufs[2] or b"", np.uint8)
        lens = np.diff(off)
        maxlen = int(lens.max()) if len(lens) else 0
        starts = off[:-1]
        # length-sorted Horner: strings sorted ascending by length, so at
        # step j the active set (len > j) is a SUFFIX found by searchsorted
        # — per-iteration work tracks only still-active strings. One
        # multi-hundred-KB outlier in a batch costs O(its own length), not
        # O(batch_size x its length) as a full boolean mask per step would.
        order = np.argsort(lens, kind="stable")
        slens = lens[order]
        sstarts = starts[order]
        hs = np.zeros(len(sub), np.uint64)
        a = 0
        for j in range(maxlen):
            a = int(np.searchsorted(slens, j, side="right"))
            hs[a:] = (hs[a:] * base + data[sstarts[a:] + j]) % p
        h = np.empty(len(sub), np.uint64)
        h[order] = hs
        if rows is None:
            out = h
        else:
            out[rows] = h
    return out


def affine_minhash(base: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(n_values, n_perm) matrix of ``(a_j * h + b_j) % P31`` — the MinHash
    permutation family. All operands < 2^31 so products fit uint64 (and
    the DuckDB oracle's BIGINT).

    Preallocated zeros + in-place ops, NOT a chained expression: in this
    sandbox a broadcast ufunc writing into fresh malloc'd pages pays
    ~0.35 ms/page first-touch faults (measured 2.4 s for a 25 MB
    temporary), while calloc zero-pages fault ~100x cheaper. Three chained
    temporaries made this one line ~5 s/batch; this form is ~50 ms."""
    out = np.zeros((len(base), len(a)), np.uint64)
    np.multiply(base[:, None], a[None, :], out=out)
    out += b[None, :]
    out %= P31
    return out


def minhash_seeds(n_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (a, b) coefficient vectors in [1, P31) / [0, P31)."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, int(P31), n_perm, dtype=np.uint64)
    b = rng.integers(0, int(P31), n_perm, dtype=np.uint64)
    return a, b
