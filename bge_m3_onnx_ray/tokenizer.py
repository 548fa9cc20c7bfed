"""Deterministic text tokenizer, shared by the Ray engine and the
pure-Python oracle.

The reference tokenizes with an ONNX-Extensions export of the XLM-R
SentencePiece model (``bge-m3-to-onnx.ipynb`` cell 9, invoked at
``samples/python/bge_m3_embedder.py:114``). That artifact is a release
download and cannot run in this sandbox (no onnxruntime / tokenizers /
network), so per SURVEY.md §7.3 the engine uses a self-contained
deterministic tokenizer: Unicode NFKC + casefold, script-aware
segmentation (CJK characters are single tokens, other ``\\w`` runs are
word tokens). It is a pluggable class so an XLM-R vocab tokenizer can be
dropped in where the environment provides one; engine and oracle import
THIS module, so parity tests exercise the distributed machinery, not
tokenizer differences.

Token ids 0-3 are reserved ([PAD],[UNK],[CLS],[SEP]), matching the
special-token filter of the reference
(``samples/python/bge_m3_embedder.py:30`` / ``:135``).
"""

from __future__ import annotations

import re
import unicodedata

import numpy as np
import pandas as pd

# CJK unified ideographs + extensions A, compat, kana, hangul: each char is
# its own token (script-aware segmentation; no dictionary segmentation).
_CJK_RE = re.compile(
    r"[㐀-䶿一-鿿豈-﫿぀-ヿㇰ-ㇿ가-힯]"
)
_TOKEN_RE = re.compile(r"\w+", re.UNICODE)


class DeterministicTokenizer:
    """Stateless, deterministic, order-independent tokenizer.

    ``tokenize`` returns the token list in text order (the reference
    re-sorts tokenizer output by ``token_indices`` to recover text order,
    ``samples/python/bge_m3_embedder.py:85-98`` — our tokenizer emits
    in-order directly, so that per-record sort is unnecessary).
    """

    def tokenize(self, text: str) -> list[str]:
        if not text:
            return []
        if text.isascii():
            # fast path: NFKC is identity and casefold == lower on ASCII
            return _TOKEN_RE.findall(text.lower())
        t = unicodedata.normalize("NFKC", text).casefold()
        t = _CJK_RE.sub(r" \g<0> ", t)
        return _TOKEN_RE.findall(t)

    def batch_term_counts(
        self, texts: "list[str] | np.ndarray | pd.Series"
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """Vectorized per-document term counting for a batch of texts.

        Returns ``(doc_idx, terms, tfs, doc_lens)`` where the first three
        are aligned arrays of per-(doc, term) counts (the SPIMI partial
        postings for this batch — the BM25 analogue of the reference's
        per-document sparse dict with duplicate-token ``max``-merge at
        ``samples/python/bge_m3_embedder.py:139-143``; here the merge is
        a COUNT, per SURVEY.md §2.4) and ``doc_lens[i]`` is the token
        count of ``texts[i]``.
        """
        tok = self.tokenize
        all_tokens: list[list[str]] = [tok(t) if t is not None else [] for t in texts]
        doc_lens = np.fromiter((len(ts) for ts in all_tokens), np.int32, len(all_tokens))
        total = int(doc_lens.sum())
        if total == 0:
            return (np.empty(0, np.int64), np.empty(0, object),
                    np.empty(0, np.int32), doc_lens)
        flat = np.empty(total, dtype=object)
        pos = 0
        for ts in all_tokens:
            flat[pos:pos + len(ts)] = ts
            pos += len(ts)
        doc_of_token = np.repeat(np.arange(len(texts), dtype=np.int64), doc_lens)
        # hash-based C factorize → integer codes per distinct term
        codes, uniques = pd.factorize(flat, sort=False)
        n_codes = len(uniques)
        pair = doc_of_token * n_codes + codes
        upair, tfs = np.unique(pair, return_counts=True)
        doc_idx = upair // n_codes
        term_codes = upair % n_codes
        terms = np.asarray(uniques, dtype=object)[term_codes]
        return doc_idx, terms, tfs.astype(np.int32), doc_lens


DEFAULT_TOKENIZER = DeterministicTokenizer()


def tokenize(text: str) -> list[str]:
    return DEFAULT_TOKENIZER.tokenize(text)
