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
    "rank_eval_documents", "events_value_stats", "top_docs_per_lang",
    "events_value_percentiles", "events_distinct_users_daily",
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
