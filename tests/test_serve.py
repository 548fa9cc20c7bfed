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


def test_request_cache_hits_and_invalidates(ray_session, tiny_index,
                                            tiny_corpus, tmp_path):
    """search() serves repeats from the driver-side request cache
    (identical, independent row copies) and flushes it when the index
    generation changes (stats/manifest/tombstones stat fingerprint)."""
    import os
    import shutil

    idx, _ = tiny_index
    _, oi, queries = tiny_corpus
    # private index copy: the test mutates generation markers
    my = str(tmp_path / "idx")
    shutil.copytree(idx, my)
    s = Searcher(my, n_actors=1)
    try:
        text = queries[0][1]
        a = s.search(text, 5)
        assert len(s._res_cache) == 1
        b = s.search(text, 5)
        assert a == b
        assert b is not a and (not a or b[0] is not a[0])  # copies
        # mutation: touching stats.json bumps the generation fingerprint
        st = os.path.join(my, "stats.json")
        os.utime(st, ns=(os.stat(st).st_mtime_ns + 10**9,) * 2)
        s.search(text, 5)
        assert len(s._res_cache) == 1          # flushed then repopulated
        # different k = different entry
        s.search(text, 3)
        assert len(s._res_cache) == 2
        # LRU bound
        s2 = Searcher(my, n_actors=1, result_cache_size=2)
        try:
            for i, (qid, t) in enumerate(queries[:4]):
                s2.search(t, 5)
            assert len(s2._res_cache) <= 2
        finally:
            s2.shutdown()
    finally:
        s.shutdown()
