"""Tokenizer determinism + edge texts, mirroring the reference's
hand-picked golden set (``generate_reference_embeddings.py:60-69``:
empty string, long text, multilingual, numbers/symbols) plus FIXTURES.md
§5 extras (whitespace-only, single char, 10k-char turn, emoji,
mixed-script token)."""

import numpy as np

from bge_m3_onnx_ray.tokenizer import DeterministicTokenizer, tokenize

EDGE_TEXTS = [
    "",                                            # reference golden incl. ""
    "Hello world",
    "This is a test sentence for ONNX conversion verification.",
    "Short text",
    "A longer text that contains multiple sentences. It should test the "
    "model's ability to handle varying lengths.",
    "Text with numbers: 12345 and symbols: !@#$%^&*()",  # cf. reference :67
    "多语言文本测试",                                 # CJK
    "Многоязычный тест",                            # Cyrillic
    "اختبار متعدد اللغات",                          # Arabic
    "   \t\n  ",                                    # whitespace only
    "x",
    "word " * 2000,                                 # 10k-char turn
    "🙂🎉🔥",                                        # pure emoji → no \w tokens
    "abc日本語def",                                  # mixed-script token
    "Café naïve façade",                            # NFKC + casefold
]


def test_edge_texts_deterministic():
    tok = DeterministicTokenizer()
    for t in EDGE_TEXTS:
        a, b = tok.tokenize(t), tok.tokenize(t)
        assert a == b
        for w in a:
            assert w and "\x00" not in w


def test_empty_and_whitespace():
    assert tokenize("") == []
    assert tokenize("   \t\n  ") == []
    assert tokenize("🙂🎉🔥") == []


def test_cjk_char_segmentation():
    assert tokenize("abc日本語def") == ["abc", "日", "本", "語", "def"]
    assert tokenize("多语言文本测试") == list("多语言文本测试")


def test_case_and_nfkc():
    assert tokenize("Hello WORLD") == ["hello", "world"]
    # NFKC folds full-width forms
    assert tokenize("ＡＢＣ１２３") == ["abc123"]


def test_fast_path_equals_python_path():
    """The polars/arrow ASCII fast path and the pure-Python path must
    produce the same (doc, term, tf) multiset and doc_lens (internal code
    numbering may differ; downstream sorts normalize it)."""
    import bge_m3_onnx_ray.tokenizer as tk
    tok = tk.DeterministicTokenizer()
    texts = EDGE_TEXTS * 3
    a = tok.batch_term_counts(texts)
    had = tk._HAVE_POLARS
    tk._HAVE_POLARS = False
    try:
        b = tok.batch_term_counts(texts)
    finally:
        tk._HAVE_POLARS = had
    assert sorted(zip(a[0].tolist(), a[1].tolist(), a[2].tolist())) == \
           sorted(zip(b[0].tolist(), b[1].tolist(), b[2].tolist()))
    assert (a[3] == b[3]).all()


from hypothesis import given, settings
from hypothesis import strategies as st


@given(st.lists(st.one_of(st.text(max_size=40),
                          st.text(alphabet="abc 123日本語х ", max_size=40),
                          st.none()),
                min_size=1, max_size=30))
@settings(max_examples=50, deadline=None)
def test_fuzz_batch_paths_agree(texts):
    """Arbitrary unicode/None mixes: polars-fast-path batches must agree
    with the pure-Python path AND with per-row tokenize()."""
    import bge_m3_onnx_ray.tokenizer as tk
    from collections import Counter
    tok = tk.DeterministicTokenizer()
    a = tok.batch_term_counts(texts)
    had = tk._HAVE_POLARS
    tk._HAVE_POLARS = False
    try:
        b = tok.batch_term_counts(texts)
    finally:
        tk._HAVE_POLARS = had
    assert sorted(zip(a[0].tolist(), a[1].tolist(), a[2].tolist())) == \
           sorted(zip(b[0].tolist(), b[1].tolist(), b[2].tolist()))
    assert (a[3] == b[3]).all()
    for i, t in enumerate(texts):
        want = Counter(tok.tokenize(t) if t is not None else [])
        got = {a[1][j]: int(a[2][j]) for j in np.flatnonzero(a[0] == i)}
        assert got == dict(want)


def test_batch_counts_match_scalar_path():
    tok = DeterministicTokenizer()
    from collections import Counter
    doc_idx, terms, tfs, doc_lens = tok.batch_term_counts(EDGE_TEXTS)
    assert len(doc_lens) == len(EDGE_TEXTS)
    for i, text in enumerate(EDGE_TEXTS):
        want = Counter(tok.tokenize(text))
        got = {terms[j]: int(tfs[j]) for j in np.flatnonzero(doc_idx == i)}
        assert got == dict(want), text
        assert int(doc_lens[i]) == sum(want.values())


def test_ascii_lut_fallback_matches_polars_path():
    """The polars-free byte-LUT tokenizer (used when polars is absent)
    must produce identical token streams to the polars fast path and the
    scalar regex path, including empty docs, punctuation edges and nulls."""
    import numpy as np
    import pyarrow as pa

    import bge_m3_onnx_ray.tokenizer as T

    tok = T.DeterministicTokenizer()
    rng = np.random.default_rng(9)
    texts = ["abc", "", "Def!", None, "9_a B", "", "zz", "A!B!C", "_", "!!"]
    texts += ["".join(rng.choice(list("ab c.D_3!"), rng.integers(0, 30)))
              for _ in range(200)]
    arr = pa.array(texts, pa.string())
    want = [tok.tokenize(t or "") for t in texts]
    flat, offs = T._ascii_flat_tokens(
        pa.compute.fill_null(arr, "").cast(pa.large_string()))
    toks = flat.to_pylist()
    assert [toks[offs[i]:offs[i + 1]] for i in range(len(texts))] == want
    old = T._HAVE_POLARS
    try:
        T._HAVE_POLARS = False
        flat2, offs2 = tok.batch_token_lists(arr)
        toks2 = flat2.to_pylist()
        assert [toks2[offs2[i]:offs2[i + 1]] for i in range(len(texts))] == want
    finally:
        T._HAVE_POLARS = old
