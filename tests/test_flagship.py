"""End-to-end flagship gate inside pytest: the BM25 documents pipeline
against a full BM25 ranking oracle written in SQL (DuckDB) — the same
comparison the external driver runs, so `python -m pytest -x -q` alone
proves the headline pipeline."""

import os

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("documents", "embeddings", "events", "lineitem", "orders",
              "customer"):
        p = os.path.join(SF, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


@pytest.mark.skipif(not os.path.isdir(SF), reason="sandbox test data absent")
@pytest.mark.parametrize("name", [
    "bm25_documents_topk", "bm25_documents_topk_exhaustive",
    "bm25_documents_topk_fuzzy", "hybrid_rrf_topk",
    "bm25_documents_topk_deleted", "bm25_documents_topk_deleted_compacted",
    "token_count", "term_df_top100", "doc_term_weights",
    "exact_dedup", "events_hourly", "revenue_by_segment",
    "rank_eval_documents", "rank_eval_ndcg_documents",
    "bm25_documents_topk_boosting", "bm25_documents_topk_resharded",
    "events_value_stats", "top_docs_per_lang",
    "events_value_percentiles", "events_distinct_users_daily",
    "stratified_split_documents", "events_moving_hourly",
    "heavy_hitter_terms", "phrase_prefix_documents_topk",
    "ann_filtered_topk", "events_user_running_totals",
    "events_value_percentile_ranks",
    "histogram_n_chars", "events_daily_pipeline",
])
def test_flagship_vs_sql_oracle(ray_session, duck, name):
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as m

    got = m.queries()[name](SF)
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    want = duck.sql(m.oracle_sql()[name]).df()
    gc, wc = sorted(got.columns), sorted(want.columns)
    assert gc == wc
    g = got[gc].sort_values(gc).reset_index(drop=True)
    w = want[gc].sort_values(gc).reset_index(drop=True)
    assert len(g) == len(w), (name, len(g), len(w))
    for c in gc:
        assert g[c].astype(str).equals(w[c].astype(str)), (name, c)


def test_entry_smoke(ray_session):
    import __ray_entry__ as m
    r = m.entry()
    assert r.num_rows > 0
    assert r.schema.names == ["query_id", "rank", "doc_id", "score_q6"]


def test_bm25f_multi_field(ray_session, tmp_path):
    """BM25F over a synthetic corpus: engine result equals a pure-Python
    recompute of the Robertson field-blended model (title = first 5
    tokens, body = rest, whole-doc df) at q6 precision."""
    import math

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bge_m3_onnx_ray.pipelines.flagship import (DOC_QUERIES,
                                                    bm25f_documents_topk)
    from bge_m3_onnx_ray.tokenizer import tokenize

    rng = np.random.default_rng(5)
    vocab = ["key", "order", "sort", "data", "table", "join", "filter",
             "window", "row", "count", "alpha", "beta", "gamma"]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(2, 20)))
             for _ in range(120)]
    texts[7] = ""                                    # empty doc
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(pa.table({"doc_id": pa.array(range(120), pa.int64()),
                             "text": pa.array(texts, pa.string())}),
                   sf / "documents.parquet")

    out = bm25f_documents_topk(str(sf)).to_pandas()
    assert len(out)

    # pure-Python recompute
    TITLE = 5
    toks = [tokenize(t) for t in texts]
    n = len(texts)
    avg_t = sum(min(len(ts), TITLE) for ts in toks) / n
    avg_b = sum(max(len(ts) - TITLE, 0) for ts in toks) / n
    for qid, qtext in DOC_QUERIES:
        scores = {}
        for t in sorted(set(tokenize(qtext))):
            df = sum(1 for ts in toks if t in ts)
            if not df:
                continue
            i = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            for d, ts in enumerate(toks):
                tf_t = ts[:TITLE].count(t)
                tf_b = ts[TITLE:].count(t)
                if not (tf_t or tf_b):
                    continue
                b_t = 0.25 + 0.75 * min(len(ts), TITLE) / avg_t
                b_b = 0.25 + 0.75 * max(len(ts) - TITLE, 0) / avg_b
                tfd = 2.0 * (tf_t / b_t) + 1.0 * (tf_b / b_b)
                scores[d] = scores.get(d, 0.0) + i * (tfd / (1.2 + tfd))
        want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        g = out[out.query_id == qid].sort_values("rank")
        assert g.doc_id.tolist() == [d for d, _ in want], (qid, qtext)
        assert g.score_q6.tolist() == [math.floor(s * 1e6)
                                       for _, s in want], (qid, qtext)


def test_sft_pairs(ray_session):
    """SFT pair extraction equals a pandas shift-based recompute over
    the same fixture (adjacent user->assistant turns per conversation)."""
    import pyarrow.parquet as pq

    from bge_m3_onnx_ray.fixtures import transcripts_path
    from bge_m3_onnx_ray.pipelines.flagship import (transcripts_n_turns,
                                                    transcripts_sft_pairs)

    out = transcripts_sft_pairs(SF).to_pandas()
    path = transcripts_path(transcripts_n_turns(SF))
    df = pq.read_table(path).to_pandas() \
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    nxt = df.groupby("conv_id", sort=False).shift(-1)
    m = (df.role == "user") & (nxt.role == "assistant")
    want = df[m].assign(response_turn_idx=nxt.turn_idx[m].astype("int32"),
                        response=nxt.text[m]) \
        .rename(columns={"turn_idx": "prompt_turn_idx", "text": "prompt"}) \
        [["conv_id", "prompt_turn_idx", "response_turn_idx",
          "prompt", "response"]] \
        .sort_values(["conv_id", "prompt_turn_idx"]).reset_index(drop=True)
    assert len(out) == len(want) > 0
    for c in want.columns:
        assert out[c].astype(want[c].dtype).tolist() == want[c].tolist(), c


def test_sft_with_history(ray_session):
    """Chat-format SFT: history equals a pandas cumulative recompute
    (all prior turns joined as 'role: text' lines) for assistant turns."""
    import pyarrow.parquet as pq

    from bge_m3_onnx_ray.fixtures import transcripts_path
    from bge_m3_onnx_ray.pipelines.flagship import (
        transcripts_n_turns, transcripts_sft_with_history)

    out = transcripts_sft_with_history(SF).to_pandas()
    df = pq.read_table(path := transcripts_path(transcripts_n_turns(SF))) \
        .to_pandas().sort_values(["conv_id", "turn_idx"]) \
        .reset_index(drop=True)
    frag = df.role + ": " + df.text
    want = []
    for conv, g in df.groupby("conv_id", sort=True):
        acc = []
        for _, r in g.iterrows():
            if r.role == "assistant" and acc:
                want.append((conv, int(r.turn_idx), "\n".join(acc), r.text))
            acc.append(f"{r.role}: {r.text}")
    assert len(out) == len(want) > 0
    got = list(zip(out.conv_id, out.turn_idx.astype(int), out.history,
                   out.response))
    assert got == want


def test_bm25f_best_fields(ray_session, tmp_path):
    """best_fields multi-match: per-field BM25 sums combined as
    greatest + tie * rest, q6-exact vs a pure-Python recompute."""
    import math

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bge_m3_onnx_ray.pipelines.flagship import (DOC_QUERIES,
                                                    bm25f_best_fields_topk)
    from bge_m3_onnx_ray.tokenizer import tokenize

    rng = np.random.default_rng(11)
    vocab = ["key", "order", "sort", "data", "table", "join", "filter"]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(2, 16)))
             for _ in range(80)]
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(pa.table({"doc_id": pa.array(range(80), pa.int64()),
                             "text": pa.array(texts, pa.string())}),
                   sf / "documents.parquet")
    out = bm25f_best_fields_topk(str(sf)).to_pandas()
    assert len(out)

    TITLE, tie = 5, 0.3
    toks = [tokenize(t) for t in texts]
    n = len(texts)
    avg_t = sum(min(len(ts), TITLE) for ts in toks) / n
    avg_b = sum(max(len(ts) - TITLE, 0) for ts in toks) / n
    for qid, qtext in DOC_QUERIES:
        st, sb = {}, {}
        for t in sorted(set(tokenize(qtext))):
            df = sum(1 for ts in toks if t in ts)
            if not df:
                continue
            i = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            for d, ts in enumerate(toks):
                tf_t, tf_b = ts[:TITLE].count(t), ts[TITLE:].count(t)
                if not (tf_t or tf_b):
                    continue
                b_t = 0.25 + 0.75 * min(len(ts), TITLE) / avg_t
                b_b = 0.25 + 0.75 * max(len(ts) - TITLE, 0) / avg_b
                st[d] = st.get(d, 0.0) + i * ((tf_t * 2.2)
                                              / (tf_t + 1.2 * b_t))
                sb[d] = sb.get(d, 0.0) + i * ((tf_b * 2.2)
                                              / (tf_b + 1.2 * b_b))
        comb = {d: max(st[d], sb[d]) + tie * ((st[d] + sb[d])
                                              - max(st[d], sb[d]))
                for d in st}
        want = sorted(comb.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        g = out[out.query_id == qid].sort_values("rank")
        assert g.doc_id.tolist() == [d for d, _ in want], (qid, qtext)
        assert g.score_q6.tolist() == [math.floor(s * 1e6)
                                       for _, s in want], (qid, qtext)


def test_bm25f_cross_fields(ray_session, tmp_path):
    """cross_fields multi-match: per-TERM dis-max across fields summed
    over terms, q6-exact vs a pure-Python recompute — and distinct from
    best_fields on the same corpus (terms may win in different fields)."""
    import math

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bge_m3_onnx_ray.pipelines.flagship import (DOC_QUERIES,
                                                    bm25f_cross_fields_topk)
    from bge_m3_onnx_ray.tokenizer import tokenize

    rng = np.random.default_rng(13)
    vocab = ["key", "order", "sort", "data", "table", "join", "filter"]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(2, 16)))
             for _ in range(80)]
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(pa.table({"doc_id": pa.array(range(80), pa.int64()),
                             "text": pa.array(texts, pa.string())}),
                   sf / "documents.parquet")
    out = bm25f_cross_fields_topk(str(sf)).to_pandas()
    assert len(out)

    TITLE, tie = 5, 0.3
    toks = [tokenize(t) for t in texts]
    n = len(texts)
    avg_t = sum(min(len(ts), TITLE) for ts in toks) / n
    avg_b = sum(max(len(ts) - TITLE, 0) for ts in toks) / n
    for qid, qtext in DOC_QUERIES:
        comb = {}
        for t in sorted(set(tokenize(qtext))):
            df = sum(1 for ts in toks if t in ts)
            if not df:
                continue
            i = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            for d, ts in enumerate(toks):
                tf_t, tf_b = ts[:TITLE].count(t), ts[TITLE:].count(t)
                if not (tf_t or tf_b):
                    continue
                b_t = 0.25 + 0.75 * min(len(ts), TITLE) / avg_t
                b_b = 0.25 + 0.75 * max(len(ts) - TITLE, 0) / avg_b
                c_t = i * ((tf_t * 2.2) / (tf_t + 1.2 * b_t))
                c_b = i * ((tf_b * 2.2) / (tf_b + 1.2 * b_b))
                m = max(c_t, c_b)
                comb[d] = comb.get(d, 0.0) + m + tie * ((c_t + c_b) - m)
        want = sorted(comb.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        g = out[out.query_id == qid].sort_values("rank")
        assert g.doc_id.tolist() == [d for d, _ in want], (qid, qtext)
        assert g.score_q6.tolist() == [math.floor(s * 1e6)
                                       for _, s in want], (qid, qtext)


def test_deduped_pipeline(ray_session, tmp_path):
    """Dedup -> rebuild -> search composition on a corpus WITH real
    duplicates: results equal a pure-SQL BM25 over the canonical-only
    corpus, and differ from the full-corpus ranking (the duplicates
    shift N/df/avgdl, so a leaked dup would be visible)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bge_m3_onnx_ray.pipelines.flagship import (
        bm25_documents_topk, bm25_documents_topk_deduped)

    rng = np.random.default_rng(21)
    vocab = ["key", "order", "sort", "data", "table", "join", "filter",
             "group", "row"]
    base = [" ".join(rng.choice(vocab, size=rng.integers(3, 12)))
            for _ in range(90)]
    texts = base + [base[i] for i in range(0, 30)]      # 30 exact dups
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(pa.table({"doc_id": pa.array(range(len(texts)),
                                                pa.int64()),
                             "text": pa.array(texts, pa.string())}),
                   sf / "documents.parquet")

    deduped = bm25_documents_topk_deduped(str(sf)).to_pandas()
    full = bm25_documents_topk(str(sf)).to_pandas()
    assert len(deduped)
    # duplicates changed the stats: the two rankings must differ
    assert not deduped.equals(full)
    # no duplicate (doc_id >= 90) can appear in deduped results
    assert (deduped.doc_id < 90).all()
    # deduped scores equal DuckDB BM25 over the canonical corpus
    import duckdb

    import __ray_entry__ as entry
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    sql = entry.oracle_sql()["bm25_documents_topk_deduped"]
    o = con.execute(sql).fetch_df()
    got = deduped.sort_values(["query_id", "rank"]).reset_index(drop=True)
    want = o.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert got.doc_id.tolist() == want.doc_id.tolist()
    assert got.score_q6.tolist() == want.score_q6.tolist()


def test_prf_expands(ray_session):
    """PRF: the feedback pass changes at least one query's ranking vs
    plain BM25 (expansion terms pull in new documents), and a zero-boost
    feedback degenerates to exactly the plain ranking."""
    from bge_m3_onnx_ray.pipelines.flagship import (bm25_documents_topk,
                                                    prf_documents_topk)

    plain = bm25_documents_topk(SF).to_pandas()
    prf = prf_documents_topk(SF).to_pandas()
    assert len(prf)
    assert not prf.equals(plain)          # feedback moved something
    # fb_terms=0: no expansion -> exactly the plain ranking (the second
    # pass scores the original terms alone)
    degenerate = prf_documents_topk(SF, fb_terms=0).to_pandas()
    assert degenerate[["query_id", "rank", "doc_id", "score_q6"]].equals(
        plain[["query_id", "rank", "doc_id", "score_q6"]])
