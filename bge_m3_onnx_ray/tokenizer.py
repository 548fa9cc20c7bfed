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

# byte LUTs for the ASCII fast path: lowercase map and \w membership
# ([0-9a-z_] after lowering — identical to the oracle regex and to
# re.findall(r"\w+", text.lower()) on ASCII input)
_LOWER_LUT = np.arange(256, dtype=np.uint8)
_LOWER_LUT[65:91] += 32
_WORD_LUT = np.zeros(256, bool)
for _c in range(256):
    _WORD_LUT[_c] = chr(_LOWER_LUT[_c]) in "0123456789_abcdefghijklmnopqrstuvwxyz"


def _ascii_flat_tokens(sub: pa.Array) -> tuple[pa.Array, np.ndarray]:
    """Vectorized ASCII tokenizer: one lowercase LUT pass + word-mask
    boundary detection over the raw utf-8 buffer — no regex engine, no
    per-row work. Returns (flat large_string tokens in text order,
    int64 doc offsets). Tokens never span documents (explicit split at
    document boundaries in the shared buffer)."""
    n = len(sub)
    bufs = sub.buffers()
    o = np.frombuffer(bufs[1], np.int64)[sub.offset:sub.offset + n + 1]
    data = np.frombuffer(bufs[2] or b"", np.uint8)
    d = data[o[0]:o[-1]]
    o = o - o[0]
    low = _LOWER_LUT[d]
    w = _WORD_LUT[low]
    if not len(w):
        return pa.array([], pa.large_string()), np.zeros(n + 1, np.int64)
    wi = w.view(np.int8)
    dw = np.diff(wi)
    starts = np.flatnonzero(dw == 1) + 1
    ends = np.flatnonzero(dw == -1) + 1
    if w[0]:
        starts = np.concatenate([[0], starts])
    if w[-1]:
        ends = np.concatenate([ends, [len(w)]])
    # split tokens that straddle a document boundary (adjacent docs are
    # contiguous in the buffer): cut at every boundary inside a token
    bnd = o[1:-1]
    if len(bnd) and len(starts):
        j = np.searchsorted(starts, bnd, side="right") - 1
        cover = (j >= 0) & (bnd > starts[np.maximum(j, 0)]) & \
                (bnd < ends[np.maximum(j, 0)])
        cuts = np.unique(bnd[cover])   # empty docs duplicate boundaries
        if len(cuts):
            starts = np.sort(np.concatenate([starts, cuts]))
            ends = np.sort(np.concatenate([ends, cuts]))
    lens = ends - starts
    total = int(lens.sum())
    cum = np.zeros(len(lens), np.int64)
    np.cumsum(lens[:-1], out=cum[1:])
    sel = np.repeat(starts - cum, lens) + np.arange(total)
    vals = low[sel]
    tok_offs = np.zeros(len(lens) + 1, np.int64)
    np.cumsum(lens, out=tok_offs[1:])
    flat = pa.Array.from_buffers(
        pa.large_string(), len(lens),
        [None, pa.py_buffer(tok_offs), pa.py_buffer(np.ascontiguousarray(vals))])
    # doc offsets: token i belongs to the doc whose byte range holds its start
    doc_of = np.searchsorted(o, starts, side="right") - 1
    counts = np.bincount(doc_of, minlength=n)
    offsets = np.zeros(n + 1, np.int64)
    np.cumsum(counts, out=offsets[1:])
    return flat, offsets


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
        # callable replacement: avoids re's template-expansion path (~2x)
        t = _CJK_RE.sub(lambda m: f" {m[0]} ", t)
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

    def batch_token_lists(
        self, texts: "list[str]"
    ) -> tuple[pa.Array, np.ndarray]:
        """Vectorized per-document token SEQUENCES (text order preserved).

        Returns ``(flat_tokens, offsets)``: one large_string array of all
        tokens and int64 offsets (n_docs+1) — doc d's tokens are
        ``flat_tokens[offsets[d]:offsets[d+1]]``. Same ASCII-polars /
        non-ASCII-Python split as :meth:`batch_term_counts_coded`; the
        order-preserving variant exists for shingling (n-gram) stages.
        """
        import pyarrow.compute as pc
        is_arrow = isinstance(texts, (pa.Array, pa.ChunkedArray))
        if is_arrow and isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        n = len(texts)
        lens = np.zeros(n, np.int64)
        if n == 0:
            return pa.array([], pa.large_string()), np.zeros(1, np.int64)
        if is_arrow:
            ascii_mask = pc.fill_null(pc.string_is_ascii(texts), True) \
                .to_numpy(zero_copy_only=False)
        else:
            ascii_mask = np.fromiter(
                (t is None or t.isascii() for t in texts), bool, n)
        a_ids = np.flatnonzero(ascii_mask)
        p_ids = np.flatnonzero(~ascii_mask)
        a_flat = pa.array([], pa.large_string())
        p_flat = pa.array([], pa.large_string())
        if len(a_ids):
            if is_arrow:
                sub = texts if len(a_ids) == n else texts.take(pa.array(a_ids))
            else:
                sub = pa.array([texts[i] for i in a_ids], pa.string())
            sub = pc.fill_null(sub, "").cast(pa.large_string())
            if _HAVE_POLARS:
                s = pl.from_arrow(pa.chunked_array([sub]))
                la = s.str.to_lowercase().str.extract_all(r"\w+").to_arrow()
                if isinstance(la, pa.ChunkedArray):  # pragma: no cover
                    la = la.combine_chunks()
                lens[a_ids] = np.diff(np.asarray(la.offsets))
                a_flat = la.values.cast(pa.large_string())
            else:
                # polars-free vectorized path (byte-LUT tokenizer) —
                # identical output, ~50x the per-row Python fallback
                a_flat, a_offs = _ascii_flat_tokens(sub)
                lens[a_ids] = np.diff(a_offs)
        if len(p_ids):
            ptexts = (texts.take(pa.array(p_ids)).to_pylist()
                      if is_arrow else [texts[i] for i in p_ids])
            toks = [self.tokenize(t) if t is not None else [] for t in ptexts]
            lens[p_ids] = [len(t) for t in toks]
            p_flat = pa.array([w for t in toks for w in t], pa.large_string())
        offsets = np.zeros(n + 1, np.int64)
        np.cumsum(lens, out=offsets[1:])
        if not len(p_ids):
            return a_flat, offsets
        if not len(a_ids):
            return p_flat, offsets
        # interleave: doc d's tokens are contiguous in a_flat or p_flat;
        # build one gather permutation into the concatenated array
        src_start = np.empty(n, np.int64)
        a_off = np.zeros(len(a_ids) + 1, np.int64)
        np.cumsum(lens[a_ids], out=a_off[1:])
        p_off = np.zeros(len(p_ids) + 1, np.int64)
        np.cumsum(lens[p_ids], out=p_off[1:])
        src_start[a_ids] = a_off[:-1]
        src_start[p_ids] = p_off[:-1] + len(a_flat)
        total = offsets[-1]
        perm = np.repeat(src_start - offsets[:-1], lens) + np.arange(total)
        both = pa.concat_arrays([a_flat, p_flat])
        return both.take(pa.array(perm)), offsets

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


def _counts_from_flat(flat: pa.Array, offsets: np.ndarray):
    """(flat tokens, doc offsets) → the batch_term_counts_coded contract
    (doc_idx, term_codes, uniques, tfs, doc_lens). Tokenizer-agnostic."""
    lens = np.diff(offsets)
    doc_lens = lens.astype(np.int32)
    if not len(flat):
        return (np.empty(0, np.int64), np.empty(0, np.int64),
                pa.array([], pa.large_string()), np.empty(0, np.int32),
                doc_lens)
    doc_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    de = flat.dictionary_encode()
    codes = np.asarray(de.indices).astype(np.int64)
    k = max(len(de.dictionary), 1)
    pair = doc_of * k + codes
    upair, tfs = np.unique(pair, return_counts=True)
    return (upair // k, upair % k, de.dictionary,
            tfs.astype(np.int32), doc_lens)


class VocabSubwordTokenizer:
    """Vocabulary-file-driven greedy-longest-match subword tokenizer —
    the pluggable seam for the north star's "reusing the repo's XLM-R
    tokenizer vocabulary" (the reference loads its SentencePiece vocab as
    an ONNX graph once per session, ``bge-m3-to-onnx.ipynb`` cell 9,
    invoked at ``samples/python/bge_m3_embedder.py:114``; this sandbox has
    no onnxruntime/tokenizers, so the seam is proven with a committed toy
    vocab instead — SURVEY.md §7.3).

    Pieces are matched longest-first inside each pre-tokenized word
    (DeterministicTokenizer's word segmentation), with single-character
    fallback, so every text tokenizes deterministically. Ids 0-3 are
    reserved ([PAD],[UNK],[CLS],[SEP]) matching the reference's
    special-token filter (``bge_m3_embedder.py:30``); OOV single-char
    fallback pieces map to [UNK]'s id but keep their string identity in
    the postings (the engine keys postings by term string)."""

    RESERVED = ("[PAD]", "[UNK]", "[CLS]", "[SEP]")

    def __init__(self, vocab_path: str):
        self.vocab_path = vocab_path
        with open(vocab_path, encoding="utf-8") as f:
            pieces = [ln.rstrip("\n") for ln in f if ln.strip()]
        self.pieces = pieces
        self.vocab = frozenset(pieces)
        self.ids = {p: i + len(self.RESERVED) for i, p in enumerate(pieces)}
        self.max_piece = max((len(p) for p in pieces), default=1)
        self._word_tok = DeterministicTokenizer()

    def id(self, piece: str) -> int:
        return self.ids.get(piece, 1)  # 1 == [UNK]

    def tokenize(self, text: str) -> list[str]:
        out: list[str] = []
        vocab, mx = self.vocab, self.max_piece
        for w in self._word_tok.tokenize(text or ""):
            i, n = 0, len(w)
            while i < n:
                for ln in range(min(mx, n - i), 0, -1):
                    piece = w[i:i + ln]
                    if piece in vocab or ln == 1:
                        out.append(piece)
                        i += ln
                        break
        return out

    def batch_token_lists(self, texts) -> tuple[pa.Array, np.ndarray]:
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        rows = texts.to_pylist() if isinstance(texts, pa.Array) else list(texts)
        toks = [self.tokenize(t) if t is not None else [] for t in rows]
        lens = np.fromiter((len(t) for t in toks), np.int64, len(toks))
        offsets = np.zeros(len(toks) + 1, np.int64)
        np.cumsum(lens, out=offsets[1:])
        flat = pa.array([w for t in toks for w in t], pa.large_string())
        return flat, offsets

    def batch_term_counts_coded(self, texts):
        return _counts_from_flat(*self.batch_token_lists(texts))


# Suffix-strip rules (Harman 1991 "S stemmer" extended with -ed/-ing —
# public weak-stemming literature), applied SEQUENTIALLY in this order,
# each at most once, as anchored RE2 replaces. Both sides of the
# correctness gate run these exact patterns (pyarrow.compute here,
# DuckDB regexp_replace in the oracle — both RE2), so parity holds by
# construction regardless of linguistic corner cases.
STEM_RULES: tuple[tuple[str, str], ...] = (
    (r"^(.{2,})ing$", r"\1"),       # len>4: drop -ing
    (r"^(.{2,})ed$", r"\1"),        # len>3: drop -ed
    (r"^(.{2,})es$", r"\1"),        # len>3: drop -es
    (r"^(.{1,}[^s])s$", r"\1"),     # len>2, not -ss: drop -s
)


class StemTokenizer(DeterministicTokenizer):
    """Analyzer chain: the deterministic tokenizer + English
    suffix-strip stemming (spec ``"stem_en"``). Lucene's
    EnglishAnalyzer shape — normalize, tokenize, stem — with a stemmer
    weak enough to mirror exactly in SQL. Batch path is columnar: four
    anchored RE2 replaces over the flat token array."""

    def tokenize(self, text: str) -> list[str]:
        import re
        out = super().tokenize(text)
        for pat, rep in STEM_RULES:
            rx = re.compile(pat)
            out = [rx.sub(rep, w) for w in out]
        return out

    def batch_token_lists(self, texts):
        import pyarrow.compute as pc
        flat, offsets = super().batch_token_lists(texts)
        for pat, rep in STEM_RULES:
            flat = pc.replace_substring_regex(flat, pat, rep)
        return flat, offsets

    def batch_term_counts_coded(self, texts):
        return _counts_from_flat(*self.batch_token_lists(texts))


class StopTokenizer(DeterministicTokenizer):
    """Analyzer chain: the deterministic tokenizer + English stopword
    removal (spec ``"stop_en"`` — Lucene StandardAnalyzer + StopFilter
    shape). The stop set is the engine's shared English list
    (stages.text.STOPWORDS — also the quality-score denominator), so
    the SQL mirror is ``term NOT IN (...)``. Batch path: one ``is_in``
    mask + an offsets re-base, no Python loop."""

    def __init__(self):
        super().__init__()
        from bge_m3_onnx_ray.stages.text import STOPWORDS
        self.stop = frozenset(STOPWORDS["en"])

    def tokenize(self, text: str) -> list[str]:
        return [w for w in super().tokenize(text) if w not in self.stop]

    def batch_token_lists(self, texts):
        import pyarrow.compute as pc
        flat, offsets = super().batch_token_lists(texts)
        if not len(flat):
            return flat, offsets
        keep = pc.invert(pc.is_in(
            flat, value_set=pa.array(sorted(self.stop), flat.type)))
        keep_np = np.asarray(keep.to_numpy(zero_copy_only=False))
        cum = np.zeros(len(flat) + 1, np.int64)
        np.cumsum(keep_np, out=cum[1:])
        return flat.filter(keep), cum[offsets]

    def batch_term_counts_coded(self, texts):
        return _counts_from_flat(*self.batch_token_lists(texts))


# Index-time synonym classes (spec "syn_en"): source → canonical.
# Replace-mode (Lucene SynonymFilter with replacement, Solr index-side
# synonyms): every source token NORMALIZES to its class canonical at
# both index and query time, so dl is unchanged and any member of a
# class matches documents containing any other member. Weak enough to
# mirror exactly in SQL (a word-boundary regexp_replace chain).
SYNONYM_MAP: tuple[tuple[str, str], ...] = (
    ("join", "merge"),
    ("group", "merge"),
    ("scan", "query"),
)


class SynonymTokenizer(DeterministicTokenizer):
    """Analyzer chain: the deterministic tokenizer + replace-mode
    synonym normalization over :data:`SYNONYM_MAP`. Batch path is
    columnar: one ``index_in`` over the flat token array, a ``take``
    of the canonical forms, and a ``coalesce`` — no Python loop."""

    def __init__(self):
        super().__init__()
        self._src = [s for s, _ in SYNONYM_MAP]
        self._dst = [d for _, d in SYNONYM_MAP]
        self._map = dict(SYNONYM_MAP)

    def tokenize(self, text: str) -> list[str]:
        return [self._map.get(w, w) for w in super().tokenize(text)]

    def batch_token_lists(self, texts):
        import pyarrow.compute as pc
        flat, offsets = super().batch_token_lists(texts)
        if not len(flat):
            return flat, offsets
        idx = pc.index_in(flat, value_set=pa.array(self._src, flat.type))
        repl = pc.take(pa.array(self._dst, flat.type), idx)
        return pc.coalesce(repl, flat), offsets

    def batch_term_counts_coded(self, texts):
        return _counts_from_flat(*self.batch_token_lists(texts))


def default_vocab_path() -> str:
    """The committed toy vocabulary proving the subword seam."""
    return os.path.join(os.path.dirname(__file__), "data", "toy_vocab.txt")


def make_tokenizer(spec: str = "deterministic"):
    """Tokenizer factory — the config surface mirroring the reference's
    ``M3EmbedderFactory`` presets (``M3EmbedderFactory.cs:16-80``).

    ``"deterministic"`` → :class:`DeterministicTokenizer`;
    ``"vocab"`` → :class:`VocabSubwordTokenizer` over the committed toy
    vocab; ``"vocab:<path>"`` → the same over a caller-supplied vocab
    file (where an environment provides a real XLM-R piece list, drop it
    in here)."""
    if spec == "deterministic":
        return DeterministicTokenizer()
    if spec == "stem_en":
        return StemTokenizer()
    if spec == "stop_en":
        return StopTokenizer()
    if spec == "syn_en":
        return SynonymTokenizer()
    if spec == "vocab":
        return VocabSubwordTokenizer(default_vocab_path())
    if spec.startswith("vocab:"):
        return VocabSubwordTokenizer(spec.split(":", 1)[1])
    raise ValueError(f"unknown tokenizer spec {spec!r}")


DEFAULT_TOKENIZER = DeterministicTokenizer()


def tokenize(text: str) -> list[str]:
    return DEFAULT_TOKENIZER.tokenize(text)
