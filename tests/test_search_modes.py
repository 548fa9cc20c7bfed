"""Conjunctive (AND) and faceted (filtered) search parity vs the pure
oracle — the engine's new query modes, on both scorer methods.

Mirrors the reference's live-reference comparison shape
(``samples/python/bge_m3_tests.py:107-131``): same tokenizer and scoring
on both sides, so only the distributed machinery is under test."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from bge_m3_onnx_ray.config import QueryConfig
from bge_m3_onnx_ray.index.search import search


def _engine(idx, queries, cfg):
    out = search(idx, queries, cfg).to_pandas()
    res = {}
    for qid, g in out.groupby("query_id"):
        g = g.sort_values("rank")
        res[int(qid)] = list(zip(g.doc_id.tolist(), g.score.tolist()))
    return res


def _assert_parity(got, oi_results, queries):
    for qid, text in queries:
        want = [(h["doc_id"], h["score"]) for h in oi_results[qid]]
        have = got.get(qid, [])
        assert len(have) == len(want), (qid, text)
        for (d, s), (wd, ws) in zip(have, want):
            assert d == wd, (qid, text)
            assert abs(s - ws) < 1e-9, (qid, text)


@pytest.mark.parametrize("method", ["exhaustive", "wand"])
def test_conjunctive_parity(tiny_index, tiny_corpus, method):
    idx, _ = tiny_index
    _, oi, queries = tiny_corpus
    # add a guaranteed-OOV query: AND must return nothing for it
    queries = list(queries) + [(9901, "zzzneverseen qqqabsent")]
    got = _engine(idx, queries, QueryConfig(k=10, method=method, mode="and"))
    want = {qid: oi.search(text, 10, mode="and") for qid, text in queries}
    assert 9901 not in got or got[9901] == []
    _assert_parity(got, want, queries)


def test_conjunctive_is_or_restricted(tiny_index, tiny_corpus):
    """An AND hit's score must equal its OR score (same BM25 sums over
    the full-coverage docs) — the semantic contract of mode='and'."""
    idx, _ = tiny_index
    _, _, queries = tiny_corpus
    or_res = _engine(idx, queries, QueryConfig(k=1000, method="exhaustive"))
    and_res = _engine(idx, queries, QueryConfig(k=10, method="exhaustive",
                                                mode="and"))
    for qid, hits in and_res.items():
        or_scores = dict(or_res[qid])
        for d, s in hits:
            assert s == or_scores[d], qid  # bit-identical


@pytest.fixture(scope="module")
def role_attrs(tiny_index, tiny_corpus, ray_session):
    """Build the 'role' attrs side table on the tiny index; return the
    oracle-side docID mask per role."""
    import ray.data as rd

    from bge_m3_onnx_ray.index.attrs import build_doc_attrs, has_doc_attrs
    idx, _ = tiny_index
    path, oi, _ = tiny_corpus
    if not has_doc_attrs(idx, "role"):
        build_doc_attrs(rd.read_parquet(path), idx, "role")
    t = pq.read_table(path, columns=["conv_id", "turn_idx", "role"])
    key_to_doc = {k: i for i, k in enumerate(oi.doc_keys)}
    masks: dict[str, set] = {}
    for c, ti, r in zip(t.column("conv_id").to_pylist(),
                        t.column("turn_idx").to_pylist(),
                        t.column("role").to_pylist()):
        masks.setdefault(r, set()).add(key_to_doc[(c, ti)])
    return masks


@pytest.mark.parametrize("method", ["exhaustive", "wand"])
@pytest.mark.parametrize("role", ["user", "assistant"])
def test_filtered_parity(tiny_index, tiny_corpus, role_attrs, method, role):
    idx, _ = tiny_index
    _, oi, queries = tiny_corpus
    got = _engine(idx, queries,
                  QueryConfig(k=10, method=method,
                              filter_attr="role", filter_value=role))
    want = {qid: oi.search(text, 10, allowed=role_attrs[role])
            for qid, text in queries}
    _assert_parity(got, want, queries)


def test_filtered_results_respect_mask(tiny_index, tiny_corpus, role_attrs):
    """Every returned doc carries the filtered attribute value."""
    idx, _ = tiny_index
    _, _, queries = tiny_corpus
    got = _engine(idx, queries, QueryConfig(k=10, filter_attr="role",
                                            filter_value="tool"))
    mask = role_attrs["tool"]
    assert any(got.values())  # non-vacuous
    for hits in got.values():
        for d, _ in hits:
            assert d in mask


def test_filtered_conjunctive_compose(tiny_index, tiny_corpus, role_attrs):
    """mode='and' + facet filter compose: engine ≡ oracle with both."""
    idx, _ = tiny_index
    _, oi, queries = tiny_corpus
    got = _engine(idx, queries,
                  QueryConfig(k=10, mode="and",
                              filter_attr="role", filter_value="user"))
    want = {qid: oi.search(text, 10, mode="and", allowed=role_attrs["user"])
            for qid, text in queries}
    _assert_parity(got, want, queries)


@pytest.mark.parametrize("method", ["exhaustive", "wand"])
def test_negation_parity(tiny_index, tiny_corpus, method):
    """'-word' negation: engine ≡ oracle-with-manual-exclusion; OOV
    negation is a no-op; self-negation empties the result."""
    idx, _ = tiny_index
    _, oi, queries = tiny_corpus
    # derive negated variants: negate a term present in the oracle vocab
    common = max(oi.postings, key=lambda t: len(oi.postings[t]))
    neg_queries = [(qid + 5000, f"{text} -{common}")
                   for qid, text in queries[:8]]
    neg_queries += [(9800, f"{queries[0][1]} -zzzneverseen"),  # OOV no-op
                    (9801, f"{common} -{common}")]             # self-negation
    got = _engine(idx, neg_queries,
                  QueryConfig(k=10, method=method, parse_negation=True))
    excluded = {d for d, _ in oi.postings[common]}
    want = {}
    for qid, text in neg_queries:
        pos = " ".join(w for w in text.split() if not w.startswith("-"))
        negs = {t for w in text.split() if w.startswith("-")
                for t in oi.tok.tokenize(w[1:])}
        exc = set()
        for t in negs:
            exc |= {d for d, _ in oi.postings.get(t, ())}
        hits = oi.search(pos, 10_000_000)
        hits = [h for h in hits if h["doc_id"] not in exc][:10]
        want[qid] = hits
    assert got.get(9801, []) == []          # self-negation: empty
    _assert_parity(got, want, neg_queries)
    # OOV negation identical to the plain query
    plain = _engine(idx, [queries[0]], QueryConfig(k=10, method=method))
    assert got[9800] == plain[queries[0][0]]


def test_negation_bulk_equals_driver_path(tiny_index, tiny_corpus):
    """search_bulk must honour parse_negation identically to search()."""
    import ray.data as rd

    from bge_m3_onnx_ray.index.search import search_bulk
    idx, _ = tiny_index
    _, oi, queries = tiny_corpus
    common = max(oi.postings, key=lambda t: len(oi.postings[t]))
    neg_queries = [(qid, f"{text} -{common}") for qid, text in queries[:6]]
    cfg = QueryConfig(k=10, parse_negation=True)
    a = _engine(idx, neg_queries, cfg)
    qds = rd.from_items([{"query_id": q, "text": t} for q, t in neg_queries])
    out = search_bulk(idx, qds, cfg).to_pandas()
    b = {}
    for qid, g in out.groupby("query_id"):
        g = g.sort_values("rank")
        b[int(qid)] = list(zip(g.doc_id.tolist(), g.score.tolist()))
    assert a == b


def _lev(a: str, b: str) -> int:
    """Full Levenshtein DP — intentionally independent of the engine's
    prefix/suffix one-edit shortcut so the test checks it from scratch."""
    prev = list(range(len(b) + 1))
    for i, x in enumerate(a, 1):
        cur = [i]
        for j, y in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (x != y)))
        prev = cur
    return prev[-1]


@pytest.mark.parametrize("method", ["exhaustive", "wand"])
def test_fuzzy_parity(tiny_index, tiny_corpus, method):
    """parse_fuzzy: engine ≡ oracle searched with the manually computed
    Levenshtein-distance-1 expansion (full-DP on the oracle side);
    no-neighbour tokens contribute nothing; over-wide expansion raises."""
    idx, _ = tiny_index
    _, oi, _ = tiny_corpus
    vocab = sorted(oi.postings)
    base = max((t for t in vocab if len(t) >= 4), key=len)
    typo = base[:2] + base[3:]               # one deletion: lev 1 from base
    exact = vocab[len(vocab) // 2]
    queries = [(0, f"{typo} {exact}"), (1, "zzzneverseen"), (2, typo)]
    got = _engine(idx, queries,
                  QueryConfig(k=10, method=method, parse_fuzzy=True))
    want = {}
    for qid, text in queries:
        terms = set()
        for w in text.split():
            for t in oi.tok.tokenize(w):
                terms |= {v for v in vocab if _lev(t, v) <= 1}
        want[qid] = oi.search(" ".join(sorted(terms)), 10) if terms else []
    assert want[0] and want[2]                    # non-vacuous
    assert got.get(1, []) == []                   # no neighbours: empty
    _assert_parity(got, want, queries)
    wide = min(vocab, key=len)                    # short token: many hits
    if sum(_lev(wide, v) <= 1 for v in vocab) > 1:
        with pytest.raises(ValueError, match="expands to"):
            search(idx, [(9, wide)],
                   QueryConfig(k=5, parse_fuzzy=True,
                               max_fuzzy_expansion=1)).to_pandas()


@pytest.mark.parametrize("method", ["exhaustive", "wand"])
def test_prefix_parity(tiny_index, tiny_corpus, method):
    """'word*' wildcard expansion: engine ≡ oracle searched with the
    manually expanded term set; empty expansion leaves literals only;
    over-wide expansion raises."""
    idx, _ = tiny_index
    _, oi, _ = tiny_corpus
    vocab = sorted(oi.postings)
    prefix = vocab[len(vocab) // 2][:1]     # single char: several terms
    expanded = sorted({t for t in vocab if t.startswith(prefix)})
    assert len(expanded) >= 2
    lit = vocab[0]
    queries = [(0, f"{prefix}* {lit}"), (1, "zzznever* " + lit)]
    got = _engine(idx, queries,
                  QueryConfig(k=10, method=method, parse_prefix=True))
    want0 = oi.search(" ".join(sorted(set(expanded) | {lit})), 10)
    want1 = oi.search(lit, 10)
    _assert_parity(got, {0: want0, 1: want1}, queries)
    with pytest.raises(ValueError, match="expands to"):
        from bge_m3_onnx_ray.index.search import search
        search(idx, [(9, f"{prefix}*")],
               QueryConfig(k=5, parse_prefix=True,
                           max_prefix_expansion=1)).to_pandas()


@pytest.mark.parametrize("method", ["exhaustive", "wand"])
def test_wildcard_parity(tiny_index, tiny_corpus, method):
    """Generalized '*'-wildcard ('*fix', 'a*b', '*mid*'): engine ≡
    oracle searched with the manually expanded term set (fnmatch on the
    vocabulary); empty expansion contributes nothing; the cap raises."""
    import fnmatch
    idx, _ = tiny_index
    _, oi, _ = tiny_corpus
    vocab = sorted(oi.postings)
    base = max((t for t in vocab if len(t) >= 4), key=len)
    suffix_pat = "*" + base[-3:]
    infix_pat = "*" + base[1:-1] + "*"
    bounded_pat = base[0] + "*" + base[-1]
    lit = vocab[0]
    queries = [(0, f"{suffix_pat} {lit}"), (1, infix_pat),
               (2, bounded_pat), (3, f"*zzznever* {lit}")]
    got = _engine(idx, queries,
                  QueryConfig(k=10, method=method, parse_wildcard=True))
    want = {}
    for qid, text in queries:
        terms = set()
        for w in text.split():
            if "*" in w:
                terms |= set(fnmatch.filter(vocab, w))
            else:
                terms |= set(oi.tok.tokenize(w))
        want[qid] = oi.search(" ".join(sorted(terms)), 10) if terms else []
    assert want[0] and want[1] and want[2]         # non-vacuous
    assert [d for d, _ in got.get(3, [])] == \
        [h["doc_id"] for h in oi.search(lit, 10)]  # empty expansion
    _assert_parity(got, want, queries)
    with pytest.raises(ValueError, match="expands to"):
        search(idx, [(9, "*" + base[-1])],
               QueryConfig(k=5, parse_wildcard=True,
                           max_prefix_expansion=0)).to_pandas()


@pytest.mark.parametrize("method", ["exhaustive", "wand"])
def test_regex_parity(tiny_index, tiny_corpus, method):
    """'/pat/' regex terms (anchored full match): engine ≡ oracle with
    the re.fullmatch-expanded term set; an unmatchable pattern yields
    nothing; a malformed pattern raises."""
    import re
    idx, _ = tiny_index
    _, oi, _ = tiny_corpus
    vocab = sorted(oi.postings)
    a, b = vocab[0], vocab[len(vocab) // 2]
    queries = [(0, f"/({a}|{b})/"), (1, f"/{b[:-1]}./ {a}"),
               (2, "/qqqnever+/")]
    got = _engine(idx, queries,
                  QueryConfig(k=10, method=method, parse_regex=True))
    want = {}
    for qid, text in queries:
        terms = set()
        for w in text.split():
            if len(w) > 2 and w.startswith("/") and w.endswith("/"):
                rx = re.compile(w[1:-1])
                terms |= {v for v in vocab if rx.fullmatch(v)}
            else:
                terms |= set(oi.tok.tokenize(w))
        want[qid] = oi.search(" ".join(sorted(terms)), 10) if terms else []
    assert want[0] and want[1]
    assert got.get(2, []) == []
    _assert_parity(got, want, queries)
    with pytest.raises(ValueError, match="bad regex"):
        search(idx, [(9, "/a(/")],
               QueryConfig(k=5, parse_regex=True)).to_pandas()


@pytest.mark.parametrize("method", ["exhaustive", "wand"])
def test_min_should_match_parity(tiny_index, tiny_corpus, method):
    """min_should_match=2: engine ≡ oracle-OR-results restricted to docs
    matching >= 2 distinct query terms; a single-term query returns
    nothing; m == n_terms coincides with mode='and' for all-in-vocab
    queries (bit-identical scores)."""
    idx, _ = tiny_index
    _, oi, queries = tiny_corpus
    single = max(oi.postings, key=lambda t: len(oi.postings[t]))
    mqueries = list(queries) + [(9930, single)]
    got = _engine(idx, mqueries,
                  QueryConfig(k=10, method=method, min_should_match=2))
    want = {}
    for qid, text in mqueries:
        terms = sorted(set(oi.tok.tokenize(text)))
        tsets = [{d for d, _ in oi.postings.get(t, ())} for t in terms]
        hits = oi.search(text, 10_000_000)
        want[qid] = [h for h in hits
                     if sum(h["doc_id"] in s for s in tsets) >= 2][:10]
    assert got.get(9930, []) == []          # single term can't reach m=2
    assert any(want.values())               # non-vacuous
    _assert_parity(got, want, mqueries)
    # m == n_terms ≡ boolean AND for an all-in-vocab query
    multi = [(qid, t) for qid, t in queries
             if len({x for x in oi.tok.tokenize(t)} - set(oi.postings)) == 0
             and len(set(oi.tok.tokenize(t))) >= 2]
    if multi:
        qid, text = multi[0]
        n = len(set(oi.tok.tokenize(text)))
        a = _engine(idx, [(qid, text)],
                    QueryConfig(k=10, method=method, min_should_match=n))
        b = _engine(idx, [(qid, text)],
                    QueryConfig(k=10, method=method, mode="and"))
        assert a == b


@pytest.mark.parametrize("method", ["exhaustive", "wand"])
def test_pagination_is_global_rank_slice(tiny_index, tiny_corpus, method):
    """offset=10, k=5 returns exactly rows 11..15 of a k=15 run, with
    their GLOBAL rank numbers — stable pages under the deterministic
    (score desc, doc_id asc) tie-break."""
    idx, _ = tiny_index
    _, _, queries = tiny_corpus
    full = _engine(idx, queries, QueryConfig(k=15, method=method))
    page = search(idx, queries,
                  QueryConfig(k=5, method=method, offset=10)).to_pandas()
    assert len(page)                        # non-vacuous
    seen = set()
    for qid, g in page.groupby("query_id"):
        g = g.sort_values("rank")
        assert g["rank"].tolist() == list(range(11, 11 + len(g)))
        have = list(zip(g.doc_id.tolist(), g.score.tolist()))
        assert have == full[int(qid)][10:15]
        seen.add(int(qid))
    # queries with <= 10 hits are absent from page 2, present in page 1
    for qid, hits in full.items():
        assert (qid in seen) == (len(hits) > 10)


def test_facet_counts_parity(tiny_index, tiny_corpus, role_attrs):
    """index.facets.facet_counts ≡ manual per-role distinct-doc counts
    over the FULL match set (any query term), not the top-k."""
    from bge_m3_onnx_ray.index.facets import facet_counts
    idx, _ = tiny_index
    _, oi, queries = tiny_corpus
    out = facet_counts(idx, queries[:10], "role").to_pandas()
    got = {(int(r.query_id), r.value): int(r.n_docs)
           for r in out.itertuples()}
    want = {}
    for qid, text in queries[:10]:
        match = set()
        for t in set(oi.tok.tokenize(text)):
            match |= {d for d, _ in oi.postings.get(t, ())}
        for role, mask in role_attrs.items():
            n = len(match & mask)
            if n:
                want[(qid, role)] = n
    assert want and got == want


@pytest.fixture(scope="module")
def nchars_attrs(tiny_index, tiny_corpus, ray_session):
    """Numeric (int) attrs side table derived from text length; returns
    the oracle-side doc -> n_chars map."""
    import pyarrow.compute as pc
    import ray.data as rd

    from bge_m3_onnx_ray.index.attrs import build_doc_attrs, has_doc_attrs
    idx, _ = tiny_index
    path, oi, _ = tiny_corpus
    if not has_doc_attrs(idx, "n_chars"):
        ds = rd.read_parquet(path).map_batches(
            lambda t: t.select(["conv_id", "turn_idx"]).append_column(
                "n_chars", pc.utf8_length(t.column("text"))),
            batch_format="pyarrow")
        build_doc_attrs(ds, idx, "n_chars")
    t = pq.read_table(path, columns=["conv_id", "turn_idx", "text"])
    key_to_doc = {k: i for i, k in enumerate(oi.doc_keys)}
    return {key_to_doc[(c, ti)]: len(x)
            for c, ti, x in zip(t.column("conv_id").to_pylist(),
                                t.column("turn_idx").to_pylist(),
                                t.column("text").to_pylist())}


@pytest.mark.parametrize("method", ["exhaustive", "wand"])
def test_range_filter_parity(tiny_index, tiny_corpus, nchars_attrs, method):
    """filter_range=(col, lo, hi): engine ≡ oracle restricted to docs
    with lo <= n_chars <= hi (inclusive both ends); composes with the
    equality facet by intersection."""
    idx, _ = tiny_index
    _, oi, queries = tiny_corpus
    lens = nchars_attrs
    lo, hi = (int(x) for x in
              np.percentile(list(lens.values()), [25, 75]))
    allowed = {d for d, n in lens.items() if lo <= n <= hi}
    assert 0 < len(allowed) < len(lens)        # non-vacuous range
    got = _engine(idx, queries,
                  QueryConfig(k=10, method=method,
                              filter_range=("n_chars", lo, hi)))
    want = {qid: oi.search(text, 10, allowed=allowed)
            for qid, text in queries}
    _assert_parity(got, want, queries)


def test_range_and_equality_filters_compose(tiny_index, tiny_corpus,
                                            nchars_attrs, role_attrs):
    idx, _ = tiny_index
    _, oi, queries = tiny_corpus
    lens = nchars_attrs
    lo, hi = (int(x) for x in
              np.percentile(list(lens.values()), [25, 75]))
    allowed = ({d for d, n in lens.items() if lo <= n <= hi}
               & role_attrs["user"])
    got = _engine(idx, queries,
                  QueryConfig(k=10, filter_attr="role", filter_value="user",
                              filter_range=("n_chars", lo, hi)))
    want = {qid: oi.search(text, 10, allowed=allowed)
            for qid, text in queries}
    assert any(want.values())
    _assert_parity(got, want, queries)


@pytest.mark.parametrize("mode", ["or", "and"])
def test_collapse_parity(tiny_index, tiny_corpus, mode):
    """Field collapsing == collapse applied to the FULL exhaustive
    ranking: per query, walk the (score desc, doc_id asc) ranking and
    keep the first row of each conversation, cut at k. The distributed
    form (per-shard collapse before the shard's top-k cut + a second
    collapse in the merge) must lose no conversation and must report the
    per-conv best turn with a bit-identical score."""
    idx, _ = tiny_index
    _, _, queries = tiny_corpus
    k = 10
    full = search(idx, queries,
                  QueryConfig(k=10**6, method="exhaustive",
                              mode=mode)).to_pandas()
    col = search(idx, queries,
                 QueryConfig(k=k, method="exhaustive", mode=mode,
                             collapse=True)).to_pandas()
    assert (col.groupby(["query_id", "conv_id"]).size() == 1).all()
    for qid, g in full.groupby("query_id"):
        want = (g.sort_values("rank").drop_duplicates("conv_id").head(k))
        have = col[col.query_id == qid].sort_values("rank")
        assert list(have.conv_id) == list(want.conv_id), qid
        assert list(have.doc_id) == list(want.doc_id), qid
        assert list(have.score) == list(want.score), qid  # bit-identical


def test_collapse_wand_equals_exhaustive(tiny_index, tiny_corpus):
    """Collapse under WAND: the conv-granular theta bound must be
    rank- and score-exact — bit-identical to exhaustive+collapse,
    including equal-score ties broken by doc_id."""
    import pandas as pd
    idx, _ = tiny_index
    _, _, queries = tiny_corpus
    ex = search(idx, queries,
                QueryConfig(k=10, method="exhaustive",
                            collapse=True)).to_pandas() \
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    wd = search(idx, queries,
                QueryConfig(k=10, method="wand",
                            collapse=True)).to_pandas() \
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(ex, wd)


def test_boost_wand_equals_exhaustive(tiny_index):
    """Boosts scale idf, and WAND's block upper bounds are linear in
    idf — pruning must stay exact: bit-identical results on both
    scorer methods under mixed up/down boosts."""
    idx, _ = tiny_index
    queries = [(0, "data^3 order"), (1, "table^0.25 key sort^2"),
               (2, "zzzneverseen^9 table")]
    res = {}
    for method in ("exhaustive", "wand"):
        out = search(idx, queries,
                     QueryConfig(k=10, method=method,
                                 parse_boost=True)).to_pandas()
        res[method] = out.sort_values(["query_id", "rank"]
                                      ).reset_index(drop=True)
    assert res["wand"][["query_id", "rank", "doc_id"]].equals(
        res["exhaustive"][["query_id", "rank", "doc_id"]])
    assert list(res["wand"].score) == list(res["exhaustive"].score)


def test_boost_one_is_identity(tiny_index, tiny_corpus):
    """'word^1' everywhere == the plain query, bit-identical (the
    boost==1 path must not even rebuild the idf dict)."""
    idx, _ = tiny_index
    _, _, queries = tiny_corpus
    plain = search(idx, queries, QueryConfig(k=10)).to_pandas()
    boosted = search(idx, [(q, " ".join(w + "^1" for w in t.split()))
                           for q, t in queries],
                     QueryConfig(k=10, parse_boost=True)).to_pandas()
    cols = ["query_id", "rank", "doc_id", "score"]
    assert plain.sort_values(cols[:2]).reset_index(drop=True)[cols].equals(
        boosted.sort_values(cols[:2]).reset_index(drop=True)[cols])


def test_boost_max_rule(tiny_index):
    """A term reached by several words takes the MAX boost: 'data
    data^4' must equal 'data^4' bit-identically."""
    idx, _ = tiny_index
    a = search(idx, [(0, "data data^4")],
               QueryConfig(k=10, parse_boost=True)).to_pandas()
    b = search(idx, [(0, "data^4")],
               QueryConfig(k=10, parse_boost=True)).to_pandas()
    cols = ["rank", "doc_id", "score"]
    assert a.sort_values("rank").reset_index(drop=True)[cols].equals(
        b.sort_values("rank").reset_index(drop=True)[cols])


def test_sort_by_attr_matches(tiny_index, tiny_corpus, nchars_attrs):
    """sort_by_attr == the OR match set (every doc any query term hits)
    ordered by (n_chars desc, doc_id asc), cut at k — integer-exact."""
    from bge_m3_onnx_ray.index.facets import sort_by_attr
    idx, _ = tiny_index
    _, _, queries = tiny_corpus
    full = search(idx, queries,
                  QueryConfig(k=10**6, method="exhaustive")).to_pandas()
    got = sort_by_attr(idx, queries, "n_chars", k=10).to_pandas()
    assert set(got.query_id) == set(full.query_id)
    for qid, g in full.groupby("query_id"):
        want = sorted(((nchars_attrs[d], d) for d in g.doc_id),
                      key=lambda x: (-x[0], x[1]))[:10]
        have = got[got.query_id == qid].sort_values("rank")
        assert list(zip(have.sort_value, have.doc_id)) == want, qid
        assert list(have["rank"]) == list(range(1, len(want) + 1)), qid


@pytest.mark.parametrize("method", ["exhaustive", "wand"])
def test_synonym_expansion_parity(tiny_index, tiny_corpus, method):
    """Query-time synonyms == the manually expanded plain query,
    bit-identical (one-hop, dedup, OOV expansion a no-op)."""
    idx, _ = tiny_index
    syn = (("data", ("order", "table")), ("key", ("zzzneverseen",)))
    cases = [(0, "data row", "data order table row"),
             (1, "key sort", "key sort"),        # OOV synonym: no-op
             (2, "data order", "data order table")]  # synonym present: dedup
    got = search(idx, [(q, t) for q, t, _ in cases],
                 QueryConfig(k=10, method=method, synonyms=syn)).to_pandas()
    want = search(idx, [(q, t) for q, _, t in cases],
                  QueryConfig(k=10, method=method)).to_pandas()
    cols = ["query_id", "rank", "doc_id", "score"]
    assert got.sort_values(cols[:2]).reset_index(drop=True)[cols].equals(
        want.sort_values(cols[:2]).reset_index(drop=True)[cols])


def test_synonym_boost_inheritance(tiny_index):
    """Under parse_boost, a synonym inherits its source word's boost:
    'data^3' with data->order must equal 'data^3 order^3'."""
    idx, _ = tiny_index
    a = search(idx, [(0, "data^3")],
               QueryConfig(k=10, parse_boost=True,
                           synonyms=(("data", ("order",)),))).to_pandas()
    b = search(idx, [(0, "data^3 order^3")],
               QueryConfig(k=10, parse_boost=True)).to_pandas()
    cols = ["rank", "doc_id", "score"]
    assert a.sort_values("rank").reset_index(drop=True)[cols].equals(
        b.sort_values("rank").reset_index(drop=True)[cols])


def test_collapse_composes_with_filter(tiny_index, tiny_corpus, role_attrs):
    """collapse + facet filter: the per-conv best is taken over the
    FILTERED candidates (filter first, then collapse) — must equal
    collapse applied to the filtered full ranking."""
    idx, _ = tiny_index
    _, _, queries = tiny_corpus
    full = search(idx, queries,
                  QueryConfig(k=10**6, method="exhaustive",
                              filter_attr="role",
                              filter_value="user")).to_pandas()
    col = search(idx, queries,
                 QueryConfig(k=10, method="exhaustive", collapse=True,
                             filter_attr="role",
                             filter_value="user")).to_pandas()
    for qid, g in full.groupby("query_id"):
        want = g.sort_values("rank").drop_duplicates("conv_id").head(10)
        have = col[col.query_id == qid].sort_values("rank")
        assert list(have.doc_id) == list(want.doc_id), qid
        assert list(have.score) == list(want.score), qid


def test_collapse_bulk_equals_driver_path(tiny_index, tiny_corpus):
    """search_bulk must honour collapse identically to search()."""
    import ray.data as rd

    from bge_m3_onnx_ray.index.search import search_bulk
    idx, _ = tiny_index
    _, _, queries = tiny_corpus
    cfg = QueryConfig(k=10, method="exhaustive", collapse=True)
    a = search(idx, queries, cfg).to_pandas()
    qds = rd.from_items([{"query_id": q, "text": t} for q, t in queries])
    b = search_bulk(idx, qds, cfg).to_pandas()
    cols = ["query_id", "rank", "conv_id", "doc_id", "score"]
    assert a.sort_values(cols[:2]).reset_index(drop=True)[cols].equals(
        b.sort_values(cols[:2]).reset_index(drop=True)[cols])


def test_bulk_rejects_unsupported_syntax(tiny_index):
    """The streaming fan-out implements negation only — the other
    syntax flags must raise, not silently ignore."""
    import ray.data as rd

    from bge_m3_onnx_ray.index.search import search_bulk
    idx, _ = tiny_index
    qds = rd.from_items([{"query_id": 0, "text": "data"}])
    for cfg in (QueryConfig(parse_prefix=True),
                QueryConfig(parse_fuzzy=True),
                QueryConfig(parse_boost=True),
                QueryConfig(parse_wildcard=True),
                QueryConfig(parse_regex=True),
                QueryConfig(synonyms=(("data", ("order",)),))):
        with pytest.raises(NotImplementedError, match="search_bulk"):
            search_bulk(idx, qds, cfg)


def test_explain_sums_to_score(tiny_index, tiny_corpus):
    """explain_topk rows must sum, per (query, doc), to EXACTLY the
    ranked score (same bm25_term_score calls, ascending-term order),
    and cover every top doc of every query with in-vocab terms."""
    from bge_m3_onnx_ray.index.explain import explain_topk
    from bge_m3_onnx_ray.index.search import search
    idx, _ = tiny_index
    _, _, queries = tiny_corpus
    top = search(idx, queries, QueryConfig(k=5)).to_pandas()
    rows = explain_topk(idx, queries, k=5).to_pandas()
    assert len(rows) > 0
    got = rows.groupby(["query_id", "doc_id"]).contrib_q6.sum()
    import math
    for (_, r) in top.iterrows():
        key = (r.query_id, r.doc_id)
        # per-term contributions are quantized individually, so the sum
        # of q6 values differs from q6(score) by < n_terms; check tight
        n_terms = len(rows[(rows.query_id == r.query_id)
                           & (rows.doc_id == r.doc_id)])
        assert n_terms > 0, key
        assert abs(got[key] - math.floor(r.score * 1e6)) <= n_terms, key


def test_function_score_parity(tiny_index, tiny_corpus, role_attrs):
    """weight_attr function score: engine ≡ oracle-with-manually-
    weighted scores (score * w(role), re-ranked); weight 1.0 values and
    docs missing from the attrs table are untouched; WAND rejects."""
    idx, _ = tiny_index
    _, oi, queries = tiny_corpus
    weights = {"user": 2.0, "tool": 0.25}
    got = _engine(idx, queries,
                  QueryConfig(k=10, method="exhaustive",
                              weight_attr="role",
                              attr_weights=tuple(weights.items())))
    doc_w = {}
    for role, docs in role_attrs.items():
        for d in docs:
            doc_w[d] = weights.get(role, 1.0)
    want = {}
    for qid, text in queries:
        hits = oi.search(text, 10_000_000)
        rescored = sorted(((h["doc_id"], h["score"] * doc_w.get(h["doc_id"], 1.0))
                           for h in hits), key=lambda x: (-x[1], x[0]))[:10]
        want[qid] = rescored
    non_trivial = 0
    for qid, text in queries:
        have = got.get(qid, [])
        assert len(have) == len(want[qid]), (qid, text)
        for (d, s), (wd, ws) in zip(have, want[qid]):
            assert d == wd and abs(s - ws) < 1e-9, (qid, text)
        if [d for d, _ in have] != [h["doc_id"] for h in oi.search(text, 10)]:
            non_trivial += 1
    assert non_trivial > 0      # the weights actually reordered something
    import pytest as _pt
    with _pt.raises(ValueError, match="weight_attr"):
        search(idx, queries[:1],
               QueryConfig(k=5, method="wand", weight_attr="role",
                           attr_weights=(("user", 2.0),))).to_pandas()


def test_function_score_bulk_equals_driver(tiny_index, tiny_corpus,
                                           role_attrs):
    """search_bulk honours weight_attr identically to search() (the
    weighting is entirely actor-side, so the streaming path supports it)."""
    import ray.data as rd

    from bge_m3_onnx_ray.index.search import search_bulk
    idx, _ = tiny_index
    _, _, queries = tiny_corpus
    cfg = QueryConfig(k=10, method="exhaustive", weight_attr="role",
                      attr_weights=(("user", 2.0), ("tool", 0.25)))
    a = _engine(idx, queries, cfg)
    qds = rd.from_items([{"query_id": q, "text": t} for q, t in queries])
    out = search_bulk(idx, qds, cfg).to_pandas()
    b = {}
    for qid, g in out.groupby("query_id"):
        g = g.sort_values("rank")
        b[int(qid)] = list(zip(g.doc_id.tolist(), g.score.tolist()))
    assert a == b


def test_federated_equals_union(tiny_index, tiny_corpus, tmp_path, ray_session):
    """search_federated over two half-corpus indexes must be
    bit-identical (docs AND scores) to search over the single union
    index — merged N/avgdl/df make member scores globally exact."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from bge_m3_onnx_ray.config import create_tiny_index_config
    from bge_m3_onnx_ray.index.build import build_index
    from bge_m3_onnx_ray.index.federate import search_federated
    idx, _ = tiny_index
    path, _, queries = tiny_corpus
    t = pq.read_table(path)
    convs = sorted(set(t.column("conv_id").to_pylist()))
    half = set(convs[: len(convs) // 2])
    mask = pa.array([c in half for c in t.column("conv_id").to_pylist()])
    parts = []
    for i, m in enumerate((mask, pa.compute.invert(mask))):
        sub = t.filter(m)
        d = str(tmp_path / f"fed{i}")
        build_index(rd.from_arrow(sub), d, create_tiny_index_config())
        parts.append(d)
    fed = search_federated(parts, queries, QueryConfig(k=10)).to_pandas()
    solo = search(idx, queries, QueryConfig(k=10)).to_pandas()
    fed = fed.sort_values(["query_id", "rank"]).reset_index(drop=True)
    solo = solo.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert len(fed) == len(solo) > 0
    assert fed.conv_id.tolist() == solo.conv_id.tolist()
    assert fed.turn_idx.tolist() == solo.turn_idx.tolist()
    assert fed.score.tolist() == solo.score.tolist()   # bit-identical


def test_trigram_substring_search(tmp_path, ray_session):
    """Trigram index candidates ∩ verify ≡ a brute-force contains scan,
    including cross-token patterns, case-insensitivity, multibyte text,
    and the <3-byte pattern rejection."""
    import pyarrow as pa
    import ray.data as rd

    from bge_m3_onnx_ray.index.trigram import (build_trigram_index,
                                               pattern_trigrams,
                                               substring_search)
    texts = [
        "alpha beta gamma",
        "ALPHA omega",              # case-insensitive match
        "the gam mabet special",    # shares trigrams, not the substring
        "中文 beta 文本",             # multibyte neighbours
        "nothing here",
    ]
    corpus = str(tmp_path / "docs.parquet")
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    import pyarrow.parquet as pq
    pq.write_table(t, corpus)
    tri = str(tmp_path / "tri")
    assert build_trigram_index(rd.from_arrow(t), tri) > 0
    pats = [(0, "a bet"), (1, "alpha"), (2, "gamma"), (3, "文 bet"),
            (4, "zzzz")]
    out = substring_search(tri, corpus, pats).to_pandas()
    got = {p: sorted(g.doc_id) for p, g in out.groupby("pattern_id")}
    want = {}
    for pid, pat in pats:
        m = sorted(i for i, x in enumerate(texts)
                   if pat.lower() in x.lower())
        if m:
            want[pid] = m
    assert got == want
    assert 0 in want and 3 in want          # cross-token + multibyte hit
    import pytest as _pt
    with _pt.raises(ValueError, match="shorter than 3"):
        pattern_trigrams("ab")


def test_search_after_equals_offset(tiny_index, tiny_corpus):
    """Cursor pagination: walking pages with search_after must
    reproduce the offset-pagination pages exactly, scores bit-equal."""
    idx, _ = tiny_index
    _, _, queries = tiny_corpus
    k = 5
    p1 = search(idx, queries, QueryConfig(k=k, method="exhaustive")) \
        .to_pandas()
    cursors = {}
    for qid, g in p1.groupby("query_id"):
        g = g.sort_values("rank")
        if len(g) == k:
            last = g.iloc[-1]
            cursors[int(qid)] = (float(last.score), int(last.doc_id))
    assert cursors     # non-vacuous
    qs = [(q, t) for q, t in queries if q in cursors]
    after = search(idx, qs, QueryConfig(k=k, method="exhaustive"),
                   search_after=cursors).to_pandas()
    off = search(idx, qs, QueryConfig(k=k, method="exhaustive",
                                      offset=k)).to_pandas()
    a = after.sort_values(["query_id", "rank"]).reset_index(drop=True)
    o = off.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert len(a) == len(o) > 0
    assert a.doc_id.tolist() == o.doc_id.tolist()
    assert a.score.tolist() == o.score.tolist()
    import pytest as _pt
    with _pt.raises(ValueError, match="search_after"):
        search(idx, qs, QueryConfig(k=k, method="wand"),
               search_after=cursors).to_pandas()


def test_conv_sum_parity(tiny_index, tiny_corpus):
    """conv_score_mode="sum" == the per-conv integer sum of quantized
    per-turn scores over the FULL exhaustive match set, ranked
    (sum desc, conv-start docID asc), cut at k. The tiny index's
    64-doc shards split conversations across shards, so this exercises
    the cross-shard partial-sum merge."""
    idx, _ = tiny_index
    _, _, queries = tiny_corpus
    k = 10
    full = search(idx, queries,
                  QueryConfig(k=10**6, method="exhaustive")).to_pandas()
    got = search(idx, queries,
                 QueryConfig(k=k, method="exhaustive",
                             conv_score_mode="sum")).to_pandas()
    assert (got.groupby(["query_id", "conv_id"]).size() == 1).all()
    full["q6"] = np.floor(full["score"].to_numpy() * 1e6).astype(np.int64)
    full["conv_start"] = full.doc_id - full.turn_idx
    for qid, g in full.groupby("query_id"):
        want = (g.groupby(["conv_id", "conv_start"], as_index=False)
                .q6.sum()
                .sort_values(["q6", "conv_start"], ascending=[False, True])
                .head(k))
        have = got[got.query_id == qid].sort_values("rank")
        assert list(have.conv_id) == list(want.conv_id), qid
        assert [int(s) for s in have.score] == list(want.q6), qid


def test_conv_sum_rejects_unsupported(tiny_index):
    idx, _ = tiny_index
    with pytest.raises(ValueError, match="conv_score_mode"):
        search(idx, [(0, "data")],
               QueryConfig(k=10, method="wand", conv_score_mode="sum"))
    with pytest.raises(ValueError, match="conv_score_mode"):
        search(idx, [(0, "data")],
               QueryConfig(k=10, method="exhaustive", collapse=True,
                           conv_score_mode="sum"))
    with pytest.raises(ValueError, match="conv_score_mode"):
        search(idx, [(0, "data")],
               QueryConfig(k=10, method="exhaustive", conv_score_mode="max"))


def test_bool_query_parity(tiny_index, tiny_corpus):
    """bool(must/should/must_not) == OR scoring over must+should terms,
    restricted to the AND(must) candidate set minus docs containing any
    must_not term — composed from oracle primitives."""
    from bge_m3_onnx_ray.index.search import search_bool
    from bge_m3_onnx_ray.oracle import OracleIndex
    import pyarrow.parquet as pq

    idx, _ = tiny_index
    path, _, _ = tiny_corpus
    t = pq.read_table(path)
    oi = OracleIndex(zip(t.column("conv_id").to_pylist(),
                         t.column("turn_idx").to_pylist(),
                         t.column("text").to_pylist()))
    cases = [(0, "data", "table key", ""),
             (1, "table sort", "", "merge"),
             (2, "order", "data data", "zzznope"),
             (3, "zzznope", "data", "")]
    got = search_bool(idx, cases, QueryConfig(k=8)).to_pandas()
    for qid, must, should, neg in cases:
        allowed = {r["doc_id"] for r in oi.search(must, k=10**9, mode="and")}
        for nt in set(oi.tok.tokenize(neg or "")):
            allowed -= {d for d, _ in oi.postings.get(nt, [])}
        want = oi.search(f"{must} {should}", k=8, allowed=allowed)
        have = got[got.query_id == qid].sort_values("rank")
        assert list(have.doc_id) == [r["doc_id"] for r in want], qid
        assert np.allclose(list(have.score),
                           [r["score"] for r in want], rtol=0, atol=0), qid


def test_classic_similarity(tiny_index, tiny_corpus):
    """Pluggable similarity: classic TF-IDF scores equal a pure-numpy
    recompute over the oracle's postings (bit-identical), and the config
    seam rejects the BM25-only fast paths."""
    import math

    idx, _ = tiny_index
    _, oi, queries = tiny_corpus
    queries = list(queries)[:10]
    out = search(idx, queries,
                 QueryConfig(k=10, method="exhaustive",
                             similarity="classic")).to_pandas()
    assert len(out)
    n = oi.n_docs
    for qid, text in queries:
        # brute force with the oracle's dict index
        scores: dict[int, float] = {}
        for t in sorted(set(oi.tok.tokenize(text))):
            pl = oi.postings.get(t)
            if not pl:
                continue
            i = 1.0 + math.log(n / (len(pl) + 1.0))
            w = i * i
            for doc_id, tf in pl:
                s = w * (np.sqrt(np.float64(tf))
                         / np.sqrt(np.float64(oi.doc_lens[doc_id])))
                scores[doc_id] = scores.get(doc_id, 0.0) + float(s)
        want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        g = out[out.query_id == qid].sort_values("rank")
        got = list(zip(g.doc_id.tolist(), g.score.tolist()))
        assert [d for d, _ in got] == [d for d, _ in want], (qid, text)
        assert all(a == b for (_, a), (_, b) in zip(got, want)), (qid, text)
    with pytest.raises(ValueError, match="classic"):
        search(idx, queries[:1],
               QueryConfig(k=5, method="wand", similarity="classic"))


def test_lmd_similarity(tiny_index, tiny_corpus):
    """Pluggable similarity #3: LM-Dirichlet scores equal an independent
    recompute over the oracle's postings (same float64 kernel/operand
    order, so bit-identical), stay within 1e-12 of a scalar math.log
    evaluation, and the config seam rejects the BM25-only fast paths."""
    import math

    idx, _ = tiny_index
    _, oi, queries = tiny_corpus
    queries = list(queries)[:10]
    out = search(idx, queries,
                 QueryConfig(k=10, method="exhaustive",
                             similarity="lmd")).to_pandas()
    assert len(out)
    total = float(sum(oi.doc_lens))
    MU = 2000.0
    for qid, text in queries:
        scores: dict[int, float] = {}
        approx: dict[int, float] = {}
        for t in sorted(set(oi.tok.tokenize(text))):
            pl = oi.postings.get(t)
            if not pl:
                continue
            cf = sum(tf for _, tf in pl)
            w = MU * float(cf) / total
            docs = np.array([d for d, _ in pl], np.int64)
            tfs = np.array([tf for _, tf in pl], np.float64)
            dls = np.array([oi.doc_lens[d] for d in docs], np.float64)
            contrib = np.maximum(0.0, np.log(1.0 + tfs / w)
                                 + np.log(MU / (dls + MU)))
            for d, s in zip(docs, contrib):
                scores[d] = scores.get(int(d), 0.0) + float(s)
            for d, tf in pl:
                sa = max(0.0, math.log(1.0 + tf / w)
                         + math.log(MU / (oi.doc_lens[d] + MU)))
                approx[d] = approx.get(d, 0.0) + sa
        want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        g = out[out.query_id == qid].sort_values("rank")
        got = list(zip(g.doc_id.tolist(), g.score.tolist()))
        assert [d for d, _ in got] == [d for d, _ in want], (qid, text)
        assert all(a == b for (_, a), (_, b) in zip(got, want)), (qid, text)
        # independent transcendental: scalar libm log agrees to 1e-12
        assert all(abs(s - approx[d]) < 1e-12 for d, s in got), (qid, text)
    with pytest.raises(ValueError, match="lmd"):
        search(idx, queries[:1],
               QueryConfig(k=5, method="wand", similarity="lmd"))


def test_rescore_window(tiny_index, tiny_corpus):
    """Two-phase window rescore: combined ranking equals a brute-force
    recompute (BM25 window by exact scores, classic re-score, combined
    = bm25 + w * classic) over the oracle's postings, bit-identically."""
    import math

    from bge_m3_onnx_ray.index.search import rescore_search

    idx, _ = tiny_index
    _, oi, queries = tiny_corpus
    queries = list(queries)[:10]
    window, w = 15, 0.5
    out = rescore_search(idx, queries, QueryConfig(k=10),
                         window=window, rescore_weight=w).to_pandas()
    assert len(out)
    n = oi.n_docs
    for qid, text in queries:
        bm25: dict[int, float] = {}
        cls: dict[int, float] = {}
        for t in sorted(set(oi.tok.tokenize(text))):
            pl = oi.postings.get(t)
            if not pl:
                continue
            i_b = math.log((n - len(pl) + 0.5) / (len(pl) + 0.5) + 1.0)
            i_c = 1.0 + math.log(n / (len(pl) + 1.0))
            w_c = i_c * i_c
            for doc_id, tf in pl:
                dl = float(oi.doc_lens[doc_id])
                bm25[doc_id] = bm25.get(doc_id, 0.0) + i_b * (
                    (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / oi.avgdl)))
                cls[doc_id] = cls.get(doc_id, 0.0) + float(
                    w_c * (np.sqrt(np.float64(tf)) / np.sqrt(np.float64(dl))))
        win = sorted(bm25.items(), key=lambda kv: (-kv[1], kv[0]))[:window]
        combined = sorted(((d, s + w * cls[d]) for d, s in win),
                          key=lambda kv: (-kv[1], kv[0]))[:10]
        g = out[out.query_id == qid].sort_values("rank")
        assert list(g.doc_id) == [d for d, _ in combined], (qid, text)
        assert np.allclose(list(g.score), [s for _, s in combined],
                           rtol=0, atol=1e-12), (qid, text)
    with pytest.raises(ValueError, match="window"):
        rescore_search(idx, queries[:1], QueryConfig(k=10), window=5)


def test_dismax(tiny_index, tiny_corpus):
    """Disjunction-max: scores equal best + tie*(sum-best) recomputed
    from the oracle's postings; WAND rejects the mode."""
    import math

    idx, _ = tiny_index
    _, oi, queries = tiny_corpus
    queries = list(queries)[:10]
    tie = 0.3
    out = search(idx, queries,
                 QueryConfig(k=10, method="exhaustive",
                             dismax_tie=tie)).to_pandas()
    assert len(out)
    n, avgdl = oi.n_docs, oi.avgdl
    for qid, text in queries:
        sums: dict[int, float] = {}
        best: dict[int, float] = {}
        for t in sorted(set(oi.tok.tokenize(text))):
            pl = oi.postings.get(t)
            if not pl:
                continue
            i = math.log((n - len(pl) + 0.5) / (len(pl) + 0.5) + 1.0)
            for doc_id, tf in pl:
                dl = float(oi.doc_lens[doc_id])
                c = i * ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)))
                sums[doc_id] = sums.get(doc_id, 0.0) + c
                best[doc_id] = max(best.get(doc_id, 0.0), c)
        comb = {d: best[d] + tie * (sums[d] - best[d]) for d in sums}
        want = sorted(comb.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        g = out[out.query_id == qid].sort_values("rank")
        assert list(g.doc_id) == [d for d, _ in want], (qid, text)
        assert np.allclose(list(g.score), [s for _, s in want],
                           rtol=0, atol=1e-12), (qid, text)
    with pytest.raises(ValueError, match="dismax"):
        search(idx, queries[:1], QueryConfig(k=5, dismax_tie=tie))


def test_merge_topk_driver_path_equals_exchange(tiny_index, tiny_corpus):
    """The rows_bound driver-side merge and the groupby exchange are the
    SAME kernel on the same partials — row-identical results. Forces
    the exchange by nulling rows_bound (the 10^6-shard code path) and
    compares against the default small-fan-out driver path."""
    import bge_m3_onnx_ray.index.search as S
    idx, _ = tiny_index
    _, _, queries = tiny_corpus
    cfg = QueryConfig(k=10)
    a = search(idx, queries, cfg).to_pandas() \
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    orig = S.merge_topk

    def force_exchange(partials, offsets, k, n_buckets=256,
                       collapse=False, conv_sum=False, rows_bound=None):
        return orig(partials, offsets, k, n_buckets, collapse,
                    conv_sum, None)

    S.merge_topk = force_exchange
    try:
        b = search(idx, queries, cfg).to_pandas() \
            .sort_values(["query_id", "rank"]).reset_index(drop=True)
    finally:
        S.merge_topk = orig
    assert a.equals(b)
