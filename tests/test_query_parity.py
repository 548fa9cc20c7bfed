"""Query parity: engine top-k ≡ committed golden JSON ≡ live oracle —
rank-identical docIDs, |Δscore| < 1e-9 (in practice bit-exact), WAND ≡
exhaustive. Mirrors the reference's golden-file + live-reference dual
comparison (``samples/python/bge_m3_tests.py:107-131`` and the
C#/Java golden-file tests)."""

import json
import os

import pytest

from bge_m3_onnx_ray.config import QueryConfig
from bge_m3_onnx_ray.index.search import search

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "topk.json")


def _engine_results(idx, queries, method):
    out = search(idx, queries, QueryConfig(k=10, method=method)).to_pandas()
    res = {}
    for qid, g in out.groupby("query_id"):
        g = g.sort_values("rank")
        res[int(qid)] = list(zip(g.doc_id.tolist(), g.score.tolist(),
                                 g.conv_id.tolist(), g.turn_idx.tolist()))
    return res


@pytest.mark.parametrize("method", ["exhaustive", "wand"])
def test_topk_matches_golden(tiny_index, tiny_corpus, method):
    idx, _ = tiny_index
    _, _, queries = tiny_corpus
    with open(GOLDEN) as f:
        golden = json.load(f)
    got = _engine_results(idx, queries, method)
    for qid, text in queries:
        want = golden[str(qid)]["hits"]
        have = got.get(qid, [])
        assert len(have) == len(want), (qid, text)
        for (doc_id, score, conv_id, turn_idx), w in zip(have, want):
            assert doc_id == w["doc_id"], (qid, text)
            assert conv_id == w["conv_id"] and turn_idx == w["turn_idx"]
            assert abs(score - float(w["score"])) < 1e-9, (qid, text)


def test_wand_equals_exhaustive(tiny_index, tiny_corpus):
    idx, _ = tiny_index
    _, _, queries = tiny_corpus
    a = _engine_results(idx, queries, "wand")
    b = _engine_results(idx, queries, "exhaustive")
    assert a == b  # bit-identical scores, identical order


def test_live_oracle_parity(tiny_index, tiny_corpus):
    """Golden-free comparison against the oracle computed in-process
    (the FlagEmbedding-style live reference)."""
    idx, _ = tiny_index
    _, oi, queries = tiny_corpus
    got = _engine_results(idx, queries, "wand")
    for qid, text in queries:
        want = oi.search(text, 10)
        have = got.get(qid, [])
        assert [h[0] for h in have] == [w["doc_id"] for w in want], (qid, text)
        for h, w in zip(have, want):
            assert abs(h[1] - w["score"]) < 1e-9


def test_empty_and_oov_queries(tiny_index):
    idx, _ = tiny_index
    out = search(idx, [(0, ""), (1, "zzzqx notinvocab")],
                 QueryConfig(k=5)).to_pandas()
    assert len(out) == 0


def test_bulk_search_matches_driver_path(tiny_index, tiny_corpus):
    """search_bulk (queries as a streaming Dataset, actor-side
    dictionary-bucket idf lookup) ≡ search (driver-resolved idfs) —
    same tokenizer, same global df, so scores must be bit-identical."""
    import ray.data as rd

    idx, _ = tiny_index
    _, _, queries = tiny_corpus
    qds = rd.from_items([{"query_id": q, "text": t} for q, t in queries])
    bulk = _engine_results(idx, qds, "wand")
    drv = _engine_results(idx, queries, "wand")
    assert bulk == drv
    # Dataset input to search() routes through search_bulk (no driver
    # collect); OOV/empty queries drop out without error
    qds2 = rd.from_items([{"query_id": 0, "text": ""},
                          {"query_id": 1, "text": "zzzqx notinvocab"},
                          {"query_id": 2, "text": queries[0][1]}])
    out = search(idx, qds2, QueryConfig(k=5, method="exhaustive")).to_pandas()
    assert set(out["query_id"]) == {2}
