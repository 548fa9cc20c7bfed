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

import os
import re
import unicodedata

# One actor = one CPU: polars would otherwise spawn a machine-wide thread
# pool PER worker process (N actors x N cores threads — observed to make
# 32-CPU runs slower than 8-CPU runs). Must be set before polars imports.
os.environ.setdefault("POLARS_MAX_THREADS", "1")

import numpy as np
import pandas as pd
import pyarrow as pa

try:
    import polars as pl
    _HAVE_POLARS = True
except ImportError:  # pragma: no cover
    _HAVE_POLARS = False

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

    def batch_term_counts_coded(
        self, texts: "list[str]"
    ) -> tuple[np.ndarray, np.ndarray, pa.Array, np.ndarray, np.ndarray]:
        """Vectorized per-document term counting for a batch of texts.

        Returns ``(doc_idx, term_codes, uniques, tfs, doc_lens)``:
        per-(doc, term) rows as integer codes into the ``uniques`` string
        array (the SPIMI partial postings for this batch — the BM25
        analogue of the reference's per-document sparse dict with
        duplicate-token ``max``-merge at
        ``samples/python/bge_m3_embedder.py:139-143``; the merge here is
        a COUNT, per SURVEY.md §2.4). Rows are sorted by doc_idx.

        Hot path: ASCII rows go through polars ``extract_all`` + arrow
        ``dictionary_encode`` (Rust/C++, ~8x the regex-loop throughput);
        non-ASCII rows use the exact Python path (NFKC + casefold + CJK
        splitting). Results are identical either way — the fast path is
        only taken where lower() == casefold() and NFKC is identity.
        """
        import pyarrow.compute as pc
        is_arrow = isinstance(texts, (pa.Array, pa.ChunkedArray))
        if is_arrow and isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        n = len(texts)
        doc_lens = np.zeros(n, np.int32)
        flats: list[pa.Array] = []
        doc_ofs: list[np.ndarray] = []
        py_rows: list[int] = []
        py_texts: list[str] | None = None
        if _HAVE_POLARS and n:
            if is_arrow:
                ascii_mask = pc.fill_null(pc.string_is_ascii(texts), True) \
                    .to_numpy(zero_copy_only=False)
            else:
                ascii_mask = np.fromiter(
                    (t is None or t.isascii() for t in texts), bool, n)
            if ascii_mask.any():
                a_ids = np.flatnonzero(ascii_mask)
                if is_arrow:
                    sub = texts.take(pa.array(a_ids))
                    s = pl.from_arrow(pa.chunked_array([sub]))
                else:
                    s = pl.Series("t", [texts[i] for i in a_ids], dtype=pl.Utf8)
                la = s.str.to_lowercase().str.extract_all(r"\w+").to_arrow()
                if isinstance(la, pa.ChunkedArray):  # pragma: no cover
                    la = la.combine_chunks()
                dl = np.diff(np.asarray(la.offsets))
                doc_lens[a_ids] = dl
                flats.append(la.values)
                doc_ofs.append(np.repeat(a_ids, dl))
            py_rows = np.flatnonzero(~ascii_mask).tolist()
            if py_rows:
                py_texts = (texts.take(pa.array(py_rows)).to_pylist()
                            if is_arrow else [texts[i] for i in py_rows])
        else:
            py_rows = list(range(n))
            py_texts = texts.to_pylist() if is_arrow else list(texts)
        if py_rows:
            toks = [self.tokenize(t) if t is not None else []
                    for t in py_texts]
            lens = np.fromiter((len(t) for t in toks), np.int64, len(toks))
            doc_lens[py_rows] = lens
            flat_py: list[str] = []
            for t in toks:
                flat_py.extend(t)
            if flat_py:
                flats.append(pa.array(flat_py, pa.large_string()))
                doc_ofs.append(np.repeat(np.asarray(py_rows, np.int64), lens))
        if not flats:
            return (np.empty(0, np.int64), np.empty(0, np.int64),
                    pa.array([], pa.large_string()), np.empty(0, np.int32),
                    doc_lens)
        flat = pa.concat_arrays([f.cast(pa.large_string()) for f in flats])
        doc_of = np.concatenate(doc_ofs) if len(doc_ofs) > 1 else doc_ofs[0]
        de = flat.dictionary_encode()
        codes = np.asarray(de.indices).astype(np.int64)
        uniques = de.dictionary
        k = max(len(uniques), 1)
        pair = doc_of * k + codes
        upair, tfs = np.unique(pair, return_counts=True)
        return (upair // k, upair % k, uniques,
                tfs.astype(np.int32), doc_lens)

    def batch_term_counts(
        self, texts: "list[str] | np.ndarray | pd.Series"
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """Materialized-strings variant of :meth:`batch_term_counts_coded`:
        returns ``(doc_idx, terms, tfs, doc_lens)``."""
        doc_idx, term_codes, uniques, tfs, doc_lens = \
            self.batch_term_counts_coded(
                texts if isinstance(texts, (pa.Array, pa.ChunkedArray, list))
                else list(texts))
        terms = np.asarray(uniques.take(pa.array(term_codes)).to_pylist(),
                           dtype=object)
        return doc_idx, terms, tfs, doc_lens


DEFAULT_TOKENIZER = DeterministicTokenizer()


def tokenize(text: str) -> list[str]:
    return DEFAULT_TOKENIZER.tokenize(text)
