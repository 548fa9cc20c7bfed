"""Pure-Python BM25 oracle — the parity reference for the Ray engine.

Plays the role FlagEmbedding plays in the reference's test suite
(``samples/python/bge_m3_tests.py:70,107-131``: re-compute with an
independent implementation, assert parity). It is deliberately
Ray-free and dict-based: a straightforward in-memory inverted index with
float64 arithmetic, term-sorted score accumulation and
(score desc, doc_id asc) tie-break — the determinism contract of
SURVEY.md §4.3 that the distributed engine must reproduce exactly.

Shares ``tokenizer`` and ``scoring`` with the engine so parity failures
can only come from the distributed machinery (the thing under test).
"""

from __future__ import annotations

from collections import Counter

from bge_m3_onnx_ray.scoring import B, K1, bm25_term_score, idf
from bge_m3_onnx_ray.tokenizer import DeterministicTokenizer


class OracleIndex:
    def __init__(self, rows, k1: float = K1, b: float = B, tokenizer=None):
        """``rows``: iterable of (conv_id, turn_idx, text).

        docIDs are the dense rank of lexicographic (conv_id, turn_idx) —
        the engine's docID invariant. ``tokenizer``: any object with the
        tokenize() contract (the engine's pluggable seam — pass the same
        tokenizer the engine was configured with)."""
        self.k1, self.b = k1, b
        tok = self.tok = tokenizer or DeterministicTokenizer()
        ordered = sorted(rows, key=lambda r: (r[0], r[1]))
        self.doc_keys = [(c, t) for c, t, _ in ordered]
        self.postings: dict[str, list[tuple[int, int]]] = {}
        self.doc_lens: list[int] = []
        self.doc_tokens: list[list[str]] = []  # ordered, for phrase queries
        for doc_id, (_, _, text) in enumerate(ordered):
            terms = tok.tokenize(text)
            self.doc_tokens.append(terms)
            self.doc_lens.append(len(terms))
            for term, tf in sorted(Counter(terms).items()):
                self.postings.setdefault(term, []).append((doc_id, tf))
        self.n_docs = len(self.doc_lens)
        total = sum(self.doc_lens)
        self.total_len = total
        self.avgdl = (total / self.n_docs) if self.n_docs else 0.0

    def df(self, term: str) -> int:
        return len(self.postings.get(term, ()))

    def search(self, query_text: str, k: int = 10, mode: str = "or",
               allowed: set | None = None) -> list[dict]:
        """Exhaustive top-k; one result row per hit:
        {doc_id, score, conv_id, turn_idx}.

        ``mode="and"``: conjunctive — only docs containing EVERY query
        term are candidates (scores unchanged). ``allowed``: optional
        docID facet mask; df/avgdl stay corpus-wide (the engine's
        filtered-search semantics)."""
        qterms = sorted(set(self.tok.tokenize(query_text)))
        scores: dict[int, float] = {}
        nhits: dict[int, int] = {}
        if mode == "and" and any(t not in self.postings for t in qterms):
            return []
        for term in qterms:  # ascending term order = accumulation order
            plist = self.postings.get(term)
            if not plist:
                continue
            w = idf(len(plist), self.n_docs)
            for doc_id, tf in plist:
                s = bm25_term_score(float(tf), float(self.doc_lens[doc_id]),
                                    w, self.avgdl, self.k1, self.b)
                scores[doc_id] = scores.get(doc_id, 0.0) + s
                nhits[doc_id] = nhits.get(doc_id, 0) + 1
        if mode == "and":
            need = len(qterms)
            scores = {d: s for d, s in scores.items() if nhits[d] == need}
        if allowed is not None:
            scores = {d: s for d, s in scores.items() if d in allowed}
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        return [
            {"doc_id": d, "score": s,
             "conv_id": self.doc_keys[d][0], "turn_idx": self.doc_keys[d][1]}
            for d, s in ranked
        ]

    def search_all(self, queries, k: int = 10) -> dict[int, list[dict]]:
        return {qid: self.search(text, k) for qid, text in queries}

    def phrase_search(self, phrase_text: str, k: int = 10) -> list[dict]:
        """Exact-phrase top-k: a doc matches where the phrase's tokens
        appear CONSECUTIVELY; tf = number of phrase occurrences; score =
        the standard BM25 term score with the phrase as the term (df =
        matching-doc count). Ranked (floor(score*1e6) desc, doc_id asc) —
        the engine's quantized tie-break."""
        import math
        terms = self.tok.tokenize(phrase_text)
        if not terms:
            return []
        m = len(terms)
        matches: list[tuple[int, int]] = []
        for doc_id, toks in enumerate(self.doc_tokens):
            tf = sum(1 for i in range(len(toks) - m + 1)
                     if toks[i:i + m] == terms)
            if tf:
                matches.append((doc_id, tf))
        if not matches:
            return []
        w = idf(len(matches), self.n_docs)
        rows = [
            {"doc_id": d, "tf": tf,
             "score": bm25_term_score(float(tf), float(self.doc_lens[d]),
                                      w, self.avgdl, self.k1, self.b),
             "conv_id": self.doc_keys[d][0], "turn_idx": self.doc_keys[d][1]}
            for d, tf in matches
        ]
        rows.sort(key=lambda r: (-math.floor(r["score"] * 1e6), r["doc_id"]))
        return rows[:k]
