"""Tokenizer seam: the engine is pluggable over the tokenizer class
(SURVEY.md §7.3; the north star's "reusing the repo's XLM-R tokenizer
vocabulary" — proven here with the committed toy vocab, since the
reference's SentencePiece export can't run in this sandbox).

The full build→search parity gate runs under BOTH tokenizers; the vocab
tokenizer produces a genuinely different term space (subword pieces), so
a pass means the distributed machinery is tokenizer-agnostic end-to-end.
"""

import pytest

from bge_m3_onnx_ray.config import IndexConfig, QueryConfig
from bge_m3_onnx_ray.index.build import build_index
from bge_m3_onnx_ray.index.search import search
from bge_m3_onnx_ray.oracle import OracleIndex
from bge_m3_onnx_ray.tokenizer import (
    DeterministicTokenizer,
    VocabSubwordTokenizer,
    default_vocab_path,
    make_tokenizer,
)


def test_greedy_longest_match():
    tok = VocabSubwordTokenizer(default_vocab_path())
    # "customer" is a whole piece — must win over "custom"+"er"
    assert tok.tokenize("Customer!") == ["customer"]
    # longest-match then fallback: unknown word decomposes deterministically
    pieces = tok.tokenize("zzdataqx")
    assert "".join(pieces) == "zzdataqx"
    assert "data" in pieces
    # reserved-id contract (reference bge_m3_embedder.py:30)
    assert tok.id("[absent-piece]") == 1     # [UNK]
    assert tok.id("the") >= 4
    assert tok.tokenize("") == []


def test_batch_paths_match_scalar():
    tok = VocabSubwordTokenizer(default_vocab_path())
    texts = ["the customer sorts data", "", "zzq 42 spark-stream", None]
    flat, offs = tok.batch_token_lists(texts)
    toks = flat.to_pylist()
    for i, t in enumerate(texts):
        assert toks[offs[i]:offs[i + 1]] == tok.tokenize(t or "")
    doc_idx, codes, uniques, tfs, doc_lens = tok.batch_term_counts_coded(texts)
    assert doc_lens.tolist() == [len(tok.tokenize(t or "")) for t in texts]


@pytest.mark.parametrize("spec", ["deterministic", "vocab"])
def test_build_query_parity_under_both_tokenizers(ray_session, tiny_corpus,
                                                  tmp_path, spec):
    import pyarrow.parquet as pq

    path, _, queries = tiny_corpus
    cfg = IndexConfig(tokenizer_spec=spec, docs_per_shard=256,
                      term_buckets=4, block_size=16)
    idx = str(tmp_path / f"idx-{spec}")
    res = build_index(path, idx, cfg)
    assert res["n_docs"] == 2000
    t = pq.read_table(path)
    oi = OracleIndex(zip(t.column("conv_id").to_pylist(),
                         t.column("turn_idx").to_pylist(),
                         t.column("text").to_pylist()),
                     tokenizer=make_tokenizer(spec))
    out = search(idx, queries[:12], QueryConfig(k=10, method="wand")).to_pandas()
    checked = 0
    for qid, text in queries[:12]:
        exp = oi.search(text, 10)
        got = out[out.query_id == qid].sort_values("rank")
        assert got.doc_id.tolist() == [r["doc_id"] for r in exp], (spec, qid)
        for s, r in zip(got.score.tolist(), exp):
            assert abs(s - r["score"]) < 1e-9
        checked += len(exp)
    assert checked > 0
    if spec == "vocab":
        # the two tokenizers must actually disagree, or this test proves
        # nothing: subword pieces create a different vocabulary
        det = DeterministicTokenizer()
        vt = make_tokenizer("vocab")
        assert det.tokenize("customers streaming") != \
            vt.tokenize("customers streaming")


def test_stem_tokenizer_batch_equals_scalar():
    """StemTokenizer's columnar RE2 path must equal the scalar path,
    and the sequential-rule semantics must hold (documented artifacts
    like braises->brai included)."""
    import pyarrow as pa

    from bge_m3_onnx_ray.tokenizer import StemTokenizer, make_tokenizer
    t = make_tokenizer("stem_en")
    assert isinstance(t, StemTokenizer)
    texts = ["Sorting sorted sorts sort", "classes dress dressing ss",
             "braises bees queries", "", "ing ed es s"]
    flat, offs = t.batch_token_lists(pa.array(texts))
    toks = flat.to_pylist()
    batch = [toks[offs[i]:offs[i + 1]] for i in range(len(texts))]
    assert batch == [t.tokenize(x) for x in texts]
    assert t.tokenize("sorting sorted sorts") == ["sort"] * 3
    assert t.tokenize("dress ss") == ["dress", "ss"]   # -ss guard
    assert t.tokenize("braises") == ["brai"]           # sequential rules


def test_stop_tokenizer_batch_equals_scalar():
    """StopTokenizer: stopwords dropped identically by the scalar and
    columnar paths; offsets re-base correctly around empty rows."""
    import pyarrow as pa

    from bge_m3_onnx_ray.tokenizer import StopTokenizer, make_tokenizer
    t = make_tokenizer("stop_en")
    assert isinstance(t, StopTokenizer)
    texts = ["the quick fox", "a and of", "", "data the stream", "the"]
    flat, offs = t.batch_token_lists(pa.array(texts))
    toks = flat.to_pylist()
    batch = [toks[offs[i]:offs[i + 1]] for i in range(len(texts))]
    assert batch == [t.tokenize(x) for x in texts]
    assert t.tokenize("the quick fox") == ["quick", "fox"]
    assert t.tokenize("a and of the") == []


def test_synonym_tokenizer_paths_agree():
    """syn_en: the columnar batch path equals the Python path, mapping
    applied; class members normalize to one canonical term."""
    import pyarrow as pa

    from bge_m3_onnx_ray.tokenizer import SynonymTokenizer, make_tokenizer

    tok = make_tokenizer("syn_en")
    assert isinstance(tok, SynonymTokenizer)
    texts = ["fast join and group by key", "scan the table", "plain data",
             ""]
    flat, offs = tok.batch_token_lists(pa.array(texts))
    flat = flat.to_pylist()
    got = [flat[offs[i]:offs[i + 1]] for i in range(len(texts))]
    want = [tok.tokenize(t) for t in texts]
    assert got == want
    assert "merge" in got[0] and "join" not in got[0] \
        and "group" not in got[0]
    assert got[1][0] == "query"      # scan -> query


def test_synonym_index_matches_class_members(ray_session, tmp_path):
    """A query for one class member matches documents containing only
    ANOTHER member — the index-time synonym contract."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import bge_m3_onnx_ray as eng
    from bge_m3_onnx_ray.config import IndexConfig, QueryConfig

    t = pa.table({
        "conv_id": pa.array(["c0", "c1", "c2"], pa.string()),
        "turn_idx": pa.array([0, 0, 0], pa.int32()),
        "role": pa.array(["user"] * 3, pa.string()),
        "text": pa.array(["the join runs", "the group runs",
                          "nothing here"], pa.string()),
        "tool": pa.array([""] * 3, pa.string()),
        "ts": pa.array([0, 0, 0], pa.timestamp("us")),
    })
    src = tmp_path / "corpus"
    src.mkdir()
    pq.write_table(t, str(src / "part-0.parquet"))
    idx = str(tmp_path / "idx")
    eng.build_index(str(src), idx,
                    IndexConfig(docs_per_shard=4, term_buckets=2,
                                tokenizer_spec="syn_en"))
    out = eng.search(idx, [(0, "join")], QueryConfig(k=10)).to_pandas()
    assert sorted(out["conv_id"]) == ["c0", "c1"]   # both class members
