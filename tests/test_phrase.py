"""Positional index + phrase query tests.

Parity model: the reference's golden-comparison pattern
(``samples/python/bge_m3_tests.py:107-131``) — recompute with the
independent pure-Python implementation (``OracleIndex.phrase_search``),
assert identical output (docIDs, tf AND quantized scores).
"""

import math

import numpy as np
import pytest


# ------------------------------------------------------------ codec unit

def test_occ_codec_roundtrip():
    from bge_m3_onnx_ray.index.positions import (decode_occ_rows,
                                                 encode_occ_segments)
    rng = np.random.default_rng(7)
    for _ in range(60):
        n_segs = int(rng.integers(1, 9))
        docs_all, poss_all, bounds = [], [], [0]
        for _s in range(n_segs):
            doc = int(rng.integers(0, 5000))
            for d in range(int(rng.integers(1, 6))):
                doc += int(rng.integers(1, 9)) if d else 0
                ps = np.sort(rng.choice(500, size=int(rng.integers(1, 8)),
                                        replace=False))
                docs_all.extend([doc] * len(ps))
                poss_all.extend(ps.tolist())
            bounds.append(len(docs_all))
        docs = np.array(docs_all, np.int64)
        poss = np.array(poss_all, np.int64)
        bounds = np.array(bounds, np.int64)
        blob, offs = encode_occ_segments(bounds, docs, poss)
        bdata = np.frombuffer(blob, np.uint8)
        ns = np.diff(bounds)
        d2, p2 = decode_occ_rows(bdata, offs, ns, np.arange(n_segs))
        assert np.array_equal(d2, docs) and np.array_equal(p2, poss)
        perm = rng.permutation(n_segs)
        d3, p3 = decode_occ_rows(bdata, offs, ns, perm)
        assert np.array_equal(
            d3, np.concatenate([docs[bounds[i]:bounds[i + 1]] for i in perm]))
        assert np.array_equal(
            p3, np.concatenate([poss[bounds[i]:bounds[i + 1]] for i in perm]))


def test_phrase_hit_kernel():
    from bge_m3_onnx_ray.index.positions import PhraseScorer
    occ = {"a": (np.array([0, 0, 1, 2]), np.array([0, 5, 3, 1])),
           "b": (np.array([0, 1, 2]), np.array([1, 4, 0]))}
    d, t = PhraseScorer._phrase_hits(occ, ["a", "b"])
    assert d.tolist() == [0, 1] and t.tolist() == [1, 1]
    d, t = PhraseScorer._phrase_hits(occ, ["a"])
    assert d.tolist() == [0, 1, 2] and t.tolist() == [2, 1, 1]
    # repeated word: consecutive occurrences only
    d, t = PhraseScorer._phrase_hits(
        {"a": (np.array([5, 5, 5]), np.array([2, 3, 4]))}, ["a", "a"])
    assert d.tolist() == [5] and t.tolist() == [2]  # overlapping pairs
    d, t = PhraseScorer._phrase_hits(occ, ["a", "zzz"])
    assert len(d) == 0


# ------------------------------------------------------------ end-to-end

@pytest.fixture(scope="module")
def positions_index(ray_session, tiny_corpus, tiny_index):
    from bge_m3_onnx_ray.index.positions import build_positions, has_positions
    path, oi, _ = tiny_corpus
    idx, _res = tiny_index
    build_positions(path, idx)
    assert has_positions(idx)
    # idempotency: a complete matching artifact is a no-op
    assert build_positions(path, idx).get("skipped") is True
    return idx, oi


# phrases over the multi-turn fixture corpus: the fixtures vocabulary is
# sentence-ish, so draw phrases from actual turn texts at runtime
def _pick_phrases(oi, n=6):
    """Deterministic phrases: first bigram/trigram of the first few docs
    with ≥3 tokens, plus edge cases."""
    out = []
    qid = 0
    for toks in oi.doc_tokens:
        if len(toks) >= 3:
            out.append((qid, " ".join(toks[:2])))
            out.append((qid + 1, " ".join(toks[:3])))
            qid += 2
        if qid >= n:
            break
    out.append((100, "zzzneverseen phrase"))   # OOV
    out.append((101, oi.doc_tokens[0][0]))     # single word ≡ term query
    return out


def test_phrase_engine_vs_oracle(positions_index):
    from bge_m3_onnx_ray.index.positions import phrase_search
    idx, oi = positions_index
    phrases = _pick_phrases(oi)
    got = phrase_search(idx, phrases, k=10).to_pandas()
    for qid, text in phrases:
        mine = got[got.query_id == qid].sort_values("rank")
        want = oi.phrase_search(text, k=10)
        assert len(mine) == len(want), (qid, text)
        for (_, row), w in zip(mine.iterrows(), want):
            assert int(row.doc_id) == w["doc_id"], (qid, text)
            assert int(row.tf) == w["tf"], (qid, text)
            assert row.conv_id == w["conv_id"]
            assert int(row.turn_idx) == w["turn_idx"]
            # scores bit-identical: same scalar idf + same float64 ops
            assert row.score == pytest.approx(w["score"], abs=0.0), (qid, text)


def test_single_word_phrase_tf_equals_term_tf(positions_index):
    """A one-word phrase's tf must equal the term's tf from the postings
    path (positions and postings agree on the corpus)."""
    from bge_m3_onnx_ray.index.positions import phrase_search
    idx, oi = positions_index
    word = max(oi.postings, key=lambda t: len(oi.postings[t]))
    got = phrase_search(idx, [(0, word)], k=10_000_000).to_pandas()
    want = dict(oi.postings[word])
    assert len(got) == len(want)
    for _, row in got.iterrows():
        assert want[int(row.doc_id)] == int(row.tf)


def test_phrase_oov_empty(positions_index):
    from bge_m3_onnx_ray.index.positions import phrase_search
    idx, _ = positions_index
    got = phrase_search(idx, [(0, "zzzneverseen qqqabsent")], k=10)
    assert got.count() == 0


def test_phrase_score_formula(positions_index):
    """Spot-check the phrase BM25 arithmetic end-to-end: recompute one
    result row's score from (tf, dl, df) first principles."""
    from bge_m3_onnx_ray.index.positions import phrase_search
    idx, oi = positions_index
    phrases = _pick_phrases(oi, n=2)[:1]
    got = phrase_search(idx, phrases, k=5).to_pandas()
    if not len(got):
        pytest.skip("phrase absent from corpus")
    text = phrases[0][1]
    want = oi.phrase_search(text, k=5)
    df = None
    # recompute df independently: count docs with the exact phrase
    terms = oi.tok.tokenize(text)
    m = len(terms)
    df = sum(1 for toks in oi.doc_tokens
             if any(toks[i:i + m] == terms
                    for i in range(len(toks) - m + 1)))
    row = got.iloc[0]
    w = math.log((oi.n_docs - df + 0.5) / (df + 0.5) + 1.0)
    dl = oi.doc_lens[int(row.doc_id)]
    tf = float(row.tf)
    norm = 1.2 * (0.25 + 0.75 * (dl / oi.avgdl))
    assert row.score == pytest.approx(w * (tf * 2.2 / (tf + norm)), rel=1e-12)
    assert want[0]["score"] == pytest.approx(row.score, abs=0.0)


def test_near_kernel():
    from bge_m3_onnx_ray.index.positions import NearScorer
    occ = {"a": (np.array([0, 0, 1]), np.array([0, 10, 5])),
           "b": (np.array([0, 1]), np.array([2, 9]))}
    # doc0: a@0 vs b@2 (|d|=2<=3) -> 1 pair; a@10 vs b@2 no; doc1: a@5 vs b@9 (4>3) no
    d, t = NearScorer._near_hits(occ, "a", "b", 3)
    assert d.tolist() == [0] and t.tolist() == [1]
    # widen slop: doc1 pair now counts
    d, t = NearScorer._near_hits(occ, "a", "b", 4)
    assert d.tolist() == [0, 1] and t.tolist() == [1, 1]
    # same-term: pairs are ordered, self-pair removed
    d, t = NearScorer._near_hits(
        {"x": (np.array([7, 7, 7]), np.array([1, 2, 9]))}, "x", "x", 2)
    assert d.tolist() == [7] and t.tolist() == [2]  # (1,2) and (2,1)
    # OOV side
    d, t = NearScorer._near_hits(occ, "a", "zzz", 3)
    assert len(d) == 0
    # ordered (SpanNear inOrder): a must PRECEDE b — doc0 a@0 b@2 counts,
    # doc1 a@5 b@9 is 4 ahead so only slop>=4 counts
    d, t = NearScorer._near_hits(occ, "a", "b", 3, in_order=True)
    assert d.tolist() == [0] and t.tolist() == [1]
    d, t = NearScorer._near_hits(occ, "b", "a", 3, in_order=True)
    assert len(d) == 0  # b@2 -> a within (3,5]: a@0 behind, a@10 too far
    d, t = NearScorer._near_hits(occ, "b", "a", 8, in_order=True)
    assert d.tolist() == [0] and t.tolist() == [1]  # b@2 -> a@10
    # same-term ordered: (1,2), (1,9)? no (gap 8>2), (2,9)? no -> 1 pair
    d, t = NearScorer._near_hits(
        {"x": (np.array([7, 7, 7]), np.array([1, 2, 9]))}, "x", "x", 2,
        in_order=True)
    assert d.tolist() == [7] and t.tolist() == [1]


def test_near_engine_vs_pure_python(positions_index):
    from bge_m3_onnx_ray.index.positions import near_search
    idx, oi = positions_index
    # derive pairs from the corpus: two frequent terms + a same-term pair
    freq = sorted(oi.postings, key=lambda t: -len(oi.postings[t]))
    queries = [(0, freq[0], freq[1], 3), (1, freq[2], freq[0], 2),
               (2, freq[0], freq[0], 2), (3, freq[0], "zzznever", 4)]
    got = near_search(idx, queries, k=10_000_000).to_pandas()
    import math
    from bge_m3_onnx_ray.scoring import bm25_term_score, idf
    for qid, ta, tb, slop in queries:
        mine = got[got.query_id == qid].sort_values("doc_id")
        # pure-python recompute
        want = {}
        for doc_id, toks in enumerate(oi.doc_tokens):
            pa_ = [i for i, w in enumerate(toks) if w == ta]
            pb_ = [i for i, w in enumerate(toks) if w == tb]
            tf = sum(1 for i in pa_ for j in pb_
                     if i != j and abs(i - j) <= slop)
            if tf:
                want[doc_id] = tf
        assert len(mine) == len(want), (qid, ta, tb)
        if not want:
            continue
        w = idf(len(want), oi.n_docs)
        for _, r in mine.iterrows():
            assert want[int(r.doc_id)] == int(r.tf)
            exp = bm25_term_score(float(r.tf),
                                  float(oi.doc_lens[int(r.doc_id)]),
                                  w, oi.avgdl, oi.k1, oi.b)
            assert r.score == pytest.approx(exp, abs=0.0)


def test_near_ordered_engine_vs_pure_python(positions_index):
    from bge_m3_onnx_ray.index.positions import near_search
    idx, oi = positions_index
    freq = sorted(oi.postings, key=lambda t: -len(oi.postings[t]))
    queries = [(0, freq[0], freq[1], 3), (1, freq[1], freq[0], 3),
               (2, freq[0], freq[0], 2)]
    got = near_search(idx, queries, k=10_000_000,
                      in_order=True).to_pandas()
    for qid, ta, tb, slop in queries:
        mine = got[got.query_id == qid].sort_values("doc_id")
        want = {}
        for doc_id, toks in enumerate(oi.doc_tokens):
            pa_ = [i for i, w in enumerate(toks) if w == ta]
            pb_ = [i for i, w in enumerate(toks) if w == tb]
            tf = sum(1 for i in pa_ for j in pb_ if 0 < j - i <= slop)
            if tf:
                want[doc_id] = tf
        assert len(mine) == len(want), (qid, ta, tb)
        for _, r in mine.iterrows():
            assert want[int(r.doc_id)] == int(r.tf)


def test_distributed_rank_tail_equals_fast_path(positions_index, monkeypatch):
    """The distributed match->df->score->merge tail (taken when the match
    set exceeds the fast-path limit) must produce exactly the fast
    path's output."""
    from bge_m3_onnx_ray.index import positions as P
    idx, oi = positions_index
    phrases = _pick_phrases(oi)
    fast = P.phrase_search(idx, phrases, k=10).to_pandas() \
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    orig = P._score_and_rank_matches
    monkeypatch.setattr(
        P, "_score_and_rank_matches",
        lambda m, meta, off, k: orig(m, meta, off, k, small_limit=0))
    dist = P.phrase_search(idx, phrases, k=10).to_pandas() \
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    import pandas as pd
    pd.testing.assert_frame_equal(fast, dist)


def test_search_quoted_vs_oracle(positions_index):
    """Quoted-span filters + BM25-over-all-terms ≡ the pure oracle with a
    manually computed phrase-allowed set."""
    from bge_m3_onnx_ray.config import QueryConfig
    from bge_m3_onnx_ray.index.positions import search_quoted
    idx, oi = positions_index
    base = _pick_phrases(oi, n=4)
    queries = []
    for qid, text in base[:3]:
        toks = text.split()
        extra = oi.doc_tokens[5][0] if len(oi.doc_tokens) > 5 else "x"
        queries.append((qid, f'"{text}" {extra}'))
    queries.append((900, '"zzzneverseen qqq" anything'))  # OOV phrase
    got = search_quoted(idx, queries, QueryConfig(k=10)).to_pandas()

    def phrase_docs(ptext):
        terms = oi.tok.tokenize(ptext)
        m = len(terms)
        return {d for d, toks in enumerate(oi.doc_tokens)
                if any(toks[i:i + m] == terms
                       for i in range(len(toks) - m + 1))}

    import re
    for qid, text in queries:
        spans = re.findall(r'"([^"]*)"', text)
        allowed = None
        for s in spans:
            ds = phrase_docs(s)
            allowed = ds if allowed is None else (allowed & ds)
        want = oi.search(text.replace('"', ' '), 10, allowed=allowed)
        mine = got[got.query_id == qid].sort_values("rank")
        assert len(mine) == len(want), (qid, text)
        for (_, r), w in zip(mine.iterrows(), want):
            assert int(r.doc_id) == w["doc_id"], (qid, text)
            assert abs(r.score - w["score"]) < 1e-12
    assert len(got[got.query_id == 900]) == 0


def test_positional_queries_require_artifact(ray_session, tiny_corpus,
                                             tmp_path_factory):
    """Phrase/NEAR/quoted against an index WITHOUT a positions artifact
    must raise, not silently return empty."""
    from bge_m3_onnx_ray.config import QueryConfig, create_tiny_index_config
    from bge_m3_onnx_ray.index.build import build_index
    from bge_m3_onnx_ray.index.positions import (near_search, phrase_search,
                                                 search_quoted)
    path, _oi, _ = tiny_corpus
    idx = str(tmp_path_factory.mktemp("noposidx") / "index")
    build_index(path, idx, create_tiny_index_config())
    with pytest.raises(ValueError, match="positional artifact"):
        phrase_search(idx, [(0, "a b")], k=5)
    with pytest.raises(ValueError, match="positional artifact"):
        near_search(idx, [(0, "a", "b", 3)], k=5)
    with pytest.raises(ValueError, match="positional artifact"):
        search_quoted(idx, [(0, '"a b" c')], QueryConfig(k=5))


def test_search_box_composition(positions_index):
    """The full search-box syntax composes: quoted phrase filter +
    prefix expansion + negation in ONE query, equal to the manually
    assembled oracle result."""
    from bge_m3_onnx_ray.config import QueryConfig
    from bge_m3_onnx_ray.index.positions import search_quoted
    idx, oi = positions_index
    vocab = sorted(oi.postings)
    prefix = vocab[len(vocab) // 2][:1]
    expanded = {t for t in vocab if t.startswith(prefix)}
    neg = max(oi.postings, key=lambda t: len(oi.postings[t]))
    phrase = " ".join(oi.doc_tokens[0][:2])
    text = f'"{phrase}" {prefix}* -{neg}'
    got = search_quoted(
        idx, [(0, text)],
        QueryConfig(k=10, parse_negation=True, parse_prefix=True)
    ).to_pandas().sort_values("rank")

    # oracle: phrase-allowed ∩ not-containing-neg, ranked by BM25 over
    # (phrase words ∪ prefix expansion)
    terms = set(oi.tok.tokenize(phrase)) | expanded
    m = len(oi.tok.tokenize(phrase))
    pterms = oi.tok.tokenize(phrase)
    allowed = {d for d, toks in enumerate(oi.doc_tokens)
               if any(toks[i:i + m] == pterms
                      for i in range(len(toks) - m + 1))}
    excluded = {d for d, _ in oi.postings[neg]}
    want = oi.search(" ".join(sorted(terms)), 10_000_000,
                     allowed=allowed - excluded)[:10]
    assert len(got) == len(want)
    for (_, r), w in zip(got.iterrows(), want):
        assert int(r.doc_id) == w["doc_id"]
        assert abs(r.score - w["score"]) < 1e-12


def test_phrase_prefix_vs_pure_python(positions_index):
    """match_phrase_prefix: engine equals a direct token-scan recompute
    (leading tokens exact, last token startswith-prefix; BM25 with
    df = matching docs), across multi-expansion, exact-term-as-prefix,
    single-token-prefix and no-expansion shapes."""
    import math

    import numpy as np

    from bge_m3_onnx_ray.index.positions import phrase_prefix_search
    idx, oi = positions_index

    first = oi.doc_tokens[[i for i, t in enumerate(oi.doc_tokens)
                           if len(t) >= 3][0]]
    queries = [
        (0, f"{first[0]} {first[1][:2]}"),    # bigram, 2-char prefix
        (1, f"{first[0]} {first[1]}"),        # full term as prefix
        (2, first[0][:1]),                    # 1-char single-token prefix
        (3, f"{first[0]} zzzzz"),             # prefix matches nothing
    ]
    got = phrase_prefix_search(idx, queries, k=10).to_pandas()

    import json
    import os
    stats = json.load(open(os.path.join(idx, "stats.json")))
    avgdl, n_docs = stats["avgdl"], stats["n_docs"]  # engine's (q3) avgdl

    for qid, text in queries:
        ws = text.split()
        lead, pref = ws[:-1], ws[-1]
        matches = {}
        for d, toks in enumerate(oi.doc_tokens):
            n = 0
            m = len(lead)
            for i in range(len(toks) - m):
                if toks[i:i + m] == lead and toks[i + m].startswith(pref):
                    n += 1
            if n:
                matches[d] = n
        mine = got[got.query_id == qid].sort_values("rank")
        if not matches:
            assert len(mine) == 0, (qid, text)
            continue
        df = len(matches)
        w = math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
        scored = []
        for d, tf in matches.items():
            dl = float(oi.doc_lens[d])
            # scoring.bm25_term_score's exact operand order
            norm = 1.2 * ((1.0 - 0.75) + 0.75 * (dl / avgdl))
            s = ((tf * 2.2) / (tf + norm)) * w
            scored.append((d, tf, s))
        scored.sort(key=lambda r: (-math.floor(r[2] * 1e6), r[0]))
        scored = scored[:10]
        assert len(mine) == len(scored), (qid, text)
        for (_, row), (d, tf, s) in zip(mine.iterrows(), scored):
            assert int(row.doc_id) == d and int(row.tf) == tf, (qid, text)
            assert row.score == pytest.approx(s, abs=0.0), (qid, text)


def test_span_near_kernel():
    from bge_m3_onnx_ray.index.positions import SpanNearScorer
    # doc0: a@0 b@2 c@4 -> chain (0,2,4) with slop>=2; b@9 adds none
    occ = {"a": (np.array([0, 0]), np.array([0, 12])),
           "b": (np.array([0, 0]), np.array([2, 9])),
           "c": (np.array([0]), np.array([4]))}
    d, t = SpanNearScorer._span_hits(occ, ["a", "b", "c"], 2)
    assert d.tolist() == [0] and t.tolist() == [1]
    # slop 1 breaks the 2-gaps
    d, t = SpanNearScorer._span_hits(occ, ["a", "b", "c"], 1)
    assert len(d) == 0
    # chain COUNTING: two a's before one b within slop -> tf = 2
    occ2 = {"a": (np.array([5, 5]), np.array([1, 2])),
            "b": (np.array([5]), np.array([3]))}
    d, t = SpanNearScorer._span_hits(occ2, ["a", "b"], 2)
    assert d.tolist() == [5] and t.tolist() == [2]
    # OOV term
    d, t = SpanNearScorer._span_hits(occ, ["a", "zzz"], 3)
    assert len(d) == 0
    # same-term chains: x@1,2,9 slop 2 -> (1,2) only
    d, t = SpanNearScorer._span_hits(
        {"x": (np.array([7, 7, 7]), np.array([1, 2, 9]))}, ["x", "x"], 2)
    assert d.tolist() == [7] and t.tolist() == [1]


def test_span_near_engine_vs_pure_python(positions_index):
    from itertools import product

    from bge_m3_onnx_ray.index.positions import span_near_search
    idx, oi = positions_index
    freq = sorted(oi.postings, key=lambda t: -len(oi.postings[t]))
    queries = [(0, f"{freq[0]} {freq[1]}", 3),
               (1, f"{freq[0]} {freq[2]} {freq[1]}", 4),
               (2, f"{freq[0]} {freq[0]}", 2)]
    got = span_near_search(idx, queries, k=10_000_000).to_pandas()
    for qid, text, slop in queries:
        terms = text.split()
        mine = got[got.query_id == qid].sort_values("doc_id")
        want = {}
        for doc_id, toks in enumerate(oi.doc_tokens):
            pos = [[i for i, w in enumerate(toks) if w == t]
                   for t in terms]
            tf = sum(1 for chain in product(*pos)
                     if all(0 < chain[j + 1] - chain[j] <= slop
                            for j in range(len(chain) - 1)))
            if tf:
                want[doc_id] = tf
        assert len(mine) == len(want), (qid, text)
        for _, r in mine.iterrows():
            assert want[int(r.doc_id)] == int(r.tf), (qid, r.doc_id)
