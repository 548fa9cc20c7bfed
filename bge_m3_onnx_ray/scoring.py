"""Okapi BM25 scoring — one implementation shared by the distributed
engine and the pure-Python oracle so scores are bit-identical.

This replaces the reference's neural per-token weight
(``max`` over the hidden dim of the sparse head output,
``samples/python/bge_m3_embedder.py:137``) with the Lucene-standard
non-negative BM25 variant (SURVEY.md §2.4):

    idf(t)  = ln((N - df + 0.5) / (df + 0.5) + 1)
    s(t, d) = idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))

Determinism contract (SURVEY.md §4.3): all arithmetic is float64; ``+ * /``
are exactly rounded by IEEE 754 so numpy-vectorized and scalar-Python
evaluations of ``bm25_term_score`` produce identical bits as long as the
operand ORDER below is never changed. ``ln`` (the one transcendental) is
always evaluated through scalar ``math.log`` via :func:`idf`, never through
``np.log``, so engine and oracle cannot diverge by an ulp. Document scores
are accumulated over query terms in ascending-term-string order — both
engine scorers and the oracle follow this.
"""

from __future__ import annotations

import math

K1 = 1.2
B = 0.75


def idf(df: int, n_docs: int) -> float:
    """Scalar only — keep transcendentals out of vectorized code paths."""
    return math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)


def bm25_term_score(tf, dl, idf_t: float, avgdl: float,
                    k1: float = K1, b: float = B):
    """Polymorphic over scalars and numpy float64 arrays (tf, dl).

    Callers must pass ``tf``/``dl`` as float64 (or Python float) — the
    operand order here is the bit-level determinism contract.
    """
    norm = k1 * ((1.0 - b) + b * (dl / avgdl))
    return idf_t * ((tf * (k1 + 1.0)) / (tf + norm))


def classic_idf(df: int, n_docs: int) -> float:
    """Lucene ClassicSimilarity idf: 1 + ln(N / (df + 1)). Scalar only,
    like :func:`idf` (transcendentals stay out of vectorized paths)."""
    return 1.0 + math.log(n_docs / (df + 1.0))


def classic_term_score(tf, dl, w_t: float, avgdl: float = 0.0,
                       k1: float = 0.0, b: float = 0.0):
    """Lucene ClassicSimilarity (pre-BM25 TF-IDF) term score:
    ``w_t * (sqrt(tf) / sqrt(dl))`` with ``w_t = classic_idf**2``
    (idf contributes once for the query weight and once for the doc
    weight in the classic model; queryNorm/coord omitted as Lucene 6+
    does). Same call shape as :func:`bm25_term_score` so the exhaustive
    scorer can take either as its ``term_score`` — avgdl/k1/b unused.
    ``sqrt`` is exactly rounded in IEEE-754, so numpy here and DuckDB's
    sqrt in the oracle agree bit-for-bit; the operand grouping
    ``w * (sqrt(tf) / sqrt(dl))`` is the determinism contract."""
    import numpy as np
    return w_t * (np.sqrt(tf) / np.sqrt(dl))


MU = 2000.0  # Dirichlet smoothing parameter (Lucene's LMDirichlet default)


def lmd_term_score(tf, dl, w_t: float, avgdl: float = 0.0,
                   k1: float = 0.0, b: float = 0.0):
    """Lucene LMDirichletSimilarity (query-likelihood language model with
    Dirichlet smoothing — Zhai & Lafferty 2001) term score:

        max(0, ln(1 + tf / (mu * p_c(t))) + ln(mu / (dl + mu)))

    where ``w_t = MU * cf(t) / total_len`` is the smoothed collection
    mass of the term (collection frequency over total token count —
    NOT df; the dictionary artifact stores both). The clamp at 0 mirrors
    Lucene 8+'s non-negative-scores requirement, and keeps a long doc
    that matches only a stopword-ish term from ranking below docs the
    query never touched. Same call shape as :func:`bm25_term_score` so
    the exhaustive scorer takes it through the Similarity seam;
    avgdl/k1/b unused.

    Determinism: ``1.0 + tf / w_t`` and ``dl + MU`` are exactly rounded;
    ``np.log`` and DuckDB's ``ln`` both resolve to the platform libm on
    this container, and any residual ulp is absorbed by the oracle's q6
    quantization (the repo-wide float-score convention). The operand
    grouping ``ln(1.0 + tf / w) + ln(MU / (dl + MU))`` is the contract —
    the SQL oracle mirrors it token for token (``log1p`` is deliberately
    NOT used: DuckDB computes ``ln(1 + x)``, so the engine must too)."""
    import numpy as np
    return np.maximum(0.0, np.log(1.0 + tf / w_t)
                      + np.log(MU / (dl + MU)))
