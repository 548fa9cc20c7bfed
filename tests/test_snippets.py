"""Snippet/highlight tests (`index.snippets.attach_snippets`) over the
multi-turn fixture corpus — pure-Python recompute as the parity model."""

import pyarrow as pa
import pytest


def test_snippets_match_pure_python(ray_session, tiny_corpus, tiny_index):
    from bge_m3_onnx_ray.config import QueryConfig
    from bge_m3_onnx_ray.index.search import search
    from bge_m3_onnx_ray.index.snippets import attach_snippets
    path, oi, queries = tiny_corpus
    idx, _ = tiny_index
    queries = queries[:10]
    res = search(idx, queries, QueryConfig(k=5, method="wand")).to_pandas()
    tbl = pa.Table.from_pandas(res, preserve_index=False)
    qterms = {qid: sorted(set(oi.tok.tokenize(t))) for qid, t in queries}
    out = attach_snippets(tbl, path, qterms, window=8).to_pandas()
    assert len(out) == len(res) > 0
    doc_rank = {(c, t): i for i, (c, t) in enumerate(oi.doc_keys)}
    for _, r in out.iterrows():
        toks = oi.doc_tokens[doc_rank[(r.conv_id, int(r.turn_idx))]]
        terms = set(qterms[int(r.query_id)])
        hits = [i for i, w in enumerate(toks) if w in terms]
        assert hits, "a BM25 result row must contain a query term"
        f = hits[0]
        assert int(r.first_hit) == f
        assert int(r.n_hits) == len(hits)
        assert r.snippet == " ".join(toks[max(0, f - 8):f + 9])
        # highlight terms really appear in the snippet
        assert terms & set(r.snippet.split())
