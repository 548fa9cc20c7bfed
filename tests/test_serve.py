"""Persistent-scorer serving layer (index/serve.py): parity with the
Dataset search path and the oracle; both scoring methods."""

import pytest

from bge_m3_onnx_ray.index.serve import Searcher


@pytest.fixture(scope="module")
def searcher(ray_session, tiny_index):
    idx, _ = tiny_index
    s = Searcher(idx, n_actors=2)
    yield s
    s.shutdown()


@pytest.mark.parametrize("method", ["exhaustive", "wand"])
def test_serve_matches_oracle(searcher, tiny_corpus, method):
    _, oi, queries = tiny_corpus
    rows = searcher.search_batch(queries, 10, method)
    got = {}
    for r in rows:
        got.setdefault(r["query_id"], []).append(r)
    for qid, text in queries:
        want = oi.search(text, 10)
        have = got.get(qid, [])
        assert [h["doc_id"] for h in have] == [w["doc_id"] for w in want], (qid, text)
        for h, w in zip(have, want):
            assert abs(h["score"] - w["score"]) < 1e-12
            assert h["conv_id"] == w["conv_id"] and h["turn_idx"] == w["turn_idx"]


def test_serve_single_and_empty(searcher):
    assert searcher.search("") == []
    assert searcher.search("zzzqx notinvocab") == []
    hits = searcher.search("fox")
    assert hits and hits[0]["rank"] == 1
