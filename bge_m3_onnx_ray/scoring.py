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
