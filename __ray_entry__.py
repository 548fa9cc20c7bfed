"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship BM25 pipeline on sf0.001. ``queries()``
exposes one callable per implemented operator (SURVEY.md §2 + the
training-data operator set); ``oracle_sql()`` gives the DuckDB oracle for
every SQL-expressible one — including a complete BM25 ranking oracle.

Conventions shared by both sides (see bge_m3_onnx_ray.stages.text):
- tokenizer ≡ ``regexp_extract_all(lower(text), '[0-9a-z_]+')`` on ASCII;
- floats are quantized ``floor(x*1e6)`` → ``*_q6`` BIGINT columns (floor
  is IEEE-exact in every engine; ROUND is not);
- timestamps cross the boundary as epoch integers.

Ray is initialised by the driver — nothing here calls ray.init().
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

import numpy as np

_TOKEN_RE_SQL = "[0-9a-z_]+"


def _docs(sf_dir: str):
    import ray.data as rd
    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"))


def _events(sf_dir: str):
    import ray.data as rd
    return rd.read_parquet(os.path.join(sf_dir, "events.parquet"))


def _embeddings(sf_dir: str):
    import ray.data as rd
    return rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))


def entry() -> Any:
    """Flagship: BM25 index build + top-k over sf0.001 documents."""
    from bge_m3_onnx_ray.pipelines.flagship import bm25_documents_topk
    return bm25_documents_topk("/root/testdata/sf0.001")


# --------------------------------------------------------------- queries

def _q_bm25(sf_dir):
    from bge_m3_onnx_ray.pipelines.flagship import bm25_documents_topk
    return bm25_documents_topk(sf_dir, method="wand")


def _q_bm25_exhaustive(sf_dir):
    from bge_m3_onnx_ray.pipelines.flagship import bm25_documents_topk
    return bm25_documents_topk(sf_dir, method="exhaustive")


def _q_bm25_transcripts(sf_dir):
    from bge_m3_onnx_ray.pipelines.flagship import bm25_transcripts_topk
    return bm25_transcripts_topk(sf_dir)


def _q_transcripts_index_stats(sf_dir):
    import json

    import pyarrow as pa

    from bge_m3_onnx_ray.pipelines.flagship import bm25_transcripts_topk
    bm25_transcripts_topk(sf_dir)  # ensure the index exists
    base = os.path.basename(os.path.normpath(sf_dir))
    sf = float(base.replace("sf", "")) if base.startswith("sf") else 0.001
    n_turns = max(2000, int(sf * 2_000_000))
    with open(f"/tmp/bm25_indexes/transcripts-n{n_turns}/stats.json") as f:
        s = json.load(f)
    return pa.table({
        "n_docs": [s["n_docs"]], "n_terms": [s["n_terms"]],
        "total_len": [s["total_len"]],
        "avgdl_q6": [int(np.floor(s["avgdl"] * 1e6))],
        "n_shards": [s["n_shards"]]})


def _q_token_count(sf_dir):
    from bge_m3_onnx_ray.stages.text import token_count
    return token_count(_docs(sf_dir))


def _q_corpus_stats(sf_dir):
    from bge_m3_onnx_ray.stages.text import corpus_stats
    return corpus_stats(_docs(sf_dir))


def _q_term_df(sf_dir):
    from bge_m3_onnx_ray.stages.text import term_df
    return term_df(_docs(sf_dir), top_n=100)


def _q_top_terms(sf_dir):
    from bge_m3_onnx_ray.stages.text import top_terms_per_doc
    return top_terms_per_doc(_docs(sf_dir), k=5, max_doc_id=50)


def _q_length_cat(sf_dir):
    from bge_m3_onnx_ray.stages.text import length_categorize
    return length_categorize(_docs(sf_dir))


def _q_langid(sf_dir):
    from bge_m3_onnx_ray.stages.text import langid
    return langid(_docs(sf_dir))


def _q_quality(sf_dir):
    from bge_m3_onnx_ray.stages.text import quality_score
    return quality_score(_docs(sf_dir))


def _q_fingerprint(sf_dir):
    from bge_m3_onnx_ray.stages.text import fingerprint
    return fingerprint(_docs(sf_dir))


def _q_exact_dedup(sf_dir):
    from bge_m3_onnx_ray.stages.dedup import exact_dedup
    return exact_dedup(_docs(sf_dir))


def _q_ngram_pairs(sf_dir):
    from bge_m3_onnx_ray.stages.dedup import ngram_pair_candidates
    return ngram_pair_candidates(_docs(sf_dir), n=3, min_common=2)


def _q_minhash(sf_dir):
    from bge_m3_onnx_ray.stages.dedup import minhash_lsh_candidates
    return minhash_lsh_candidates(_docs(sf_dir))


def _q_simhash(sf_dir):
    from bge_m3_onnx_ray.stages.dedup import simhash
    return simhash(_docs(sf_dir))


def _q_embedding_dups(sf_dir):
    from bge_m3_onnx_ray.stages.dedup import embedding_dup_pairs
    return embedding_dup_pairs(_embeddings(sf_dir), threshold=0.4)


def _q_ann(sf_dir):
    import pyarrow.compute as pc

    from bge_m3_onnx_ray.stages.ann import brute_force_topk
    emb = _embeddings(sf_dir)
    # filter BEFORE collecting: only the 5 query vectors reach the driver
    qdf = emb.map_batches(lambda t: t.filter(pc.less(t["vec_id"], 5)),
                          batch_format="pyarrow").to_pandas()
    qdf = qdf.sort_values("vec_id")
    return brute_force_topk(
        emb, np.stack(qdf.embedding.to_numpy()), qdf.vec_id.to_numpy(),
        k=10, exclude={int(v): int(v) for v in qdf.vec_id})


def _q_lsh_buckets(sf_dir):
    from bge_m3_onnx_ray.stages.ann import lsh_buckets
    emb = _embeddings(sf_dir)
    dim = len(emb.take(1)[0]["embedding"])
    return lsh_buckets(emb, dim=dim)


def _q_events_hourly(sf_dir):
    from bge_m3_onnx_ray.stages.events import hourly_agg
    return hourly_agg(_events(sf_dir))


def _q_sessionize(sf_dir):
    from bge_m3_onnx_ray.stages.events import sessionize
    return sessionize(_events(sf_dir))


def _q_distribution_counts(sf_dir):
    from bge_m3_onnx_ray.stages.text import distribution_counts
    return distribution_counts(_docs(sf_dir))


def _q_corpus_sample(sf_dir):
    from bge_m3_onnx_ray.stages.text import corpus_sample
    return corpus_sample(_docs(sf_dir).select_columns(["doc_id", "text"]), n=100)


def _q_text_variations(sf_dir):
    from bge_m3_onnx_ray.stages.text import text_variations
    return text_variations(_docs(sf_dir))


def _q_dup_clusters(sf_dir):
    from bge_m3_onnx_ray.stages.dedup import dup_clusters, ngram_pair_candidates
    pairs = ngram_pair_candidates(_docs(sf_dir), n=3, min_common=2)
    return dup_clusters(pairs)


def _q_doc_term_weights(sf_dir):
    from bge_m3_onnx_ray.stages.text import doc_term_weights
    return doc_term_weights(_docs(sf_dir), max_doc_id=50)


def _q_revenue_by_segment(sf_dir):
    from bge_m3_onnx_ray.stages.relational import revenue_by_segment
    return revenue_by_segment(sf_dir)


def _q_multimodal_decode(sf_dir):
    import ray.data as rd

    from bge_m3_onnx_ray.stages.multimodal import decode_features, make_fake_media
    out = decode_features(rd.from_arrow(make_fake_media(200)))
    # the raw feature vector column is for downstream stages; the driver
    # compares scalars only
    return out.select_columns(["media_id", "kind", "mean_intensity_q6",
                               "payload_bytes"])


def _q_frame_sample(sf_dir):
    import ray.data as rd

    from bge_m3_onnx_ray.stages.multimodal import frame_sample, make_fake_media
    return frame_sample(rd.from_arrow(make_fake_media(200)))


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "bm25_documents_topk": _q_bm25,
        "bm25_documents_topk_exhaustive": _q_bm25_exhaustive,
        "bm25_transcripts_topk": _q_bm25_transcripts,
        "transcripts_index_stats": _q_transcripts_index_stats,
        "token_count": _q_token_count,
        "corpus_stats": _q_corpus_stats,
        "term_df_top100": _q_term_df,
        "top5_terms_per_doc": _q_top_terms,
        "length_categorize": _q_length_cat,
        "langid": _q_langid,
        "quality_score": _q_quality,
        "doc_fingerprint": _q_fingerprint,
        "distribution_counts": _q_distribution_counts,
        "corpus_sample": _q_corpus_sample,
        "text_variations": _q_text_variations,
        "exact_dedup": _q_exact_dedup,
        "ngram_dup_pairs": _q_ngram_pairs,
        "dup_clusters": _q_dup_clusters,
        "minhash_lsh_candidates": _q_minhash,
        "simhash": _q_simhash,
        "embedding_dup_pairs": _q_embedding_dups,
        "ann_cosine_topk": _q_ann,
        "lsh_buckets": _q_lsh_buckets,
        "doc_term_weights": _q_doc_term_weights,
        "revenue_by_segment": _q_revenue_by_segment,
        "events_hourly": _q_events_hourly,
        "events_sessionize": _q_sessionize,
        "multimodal_decode": _q_multimodal_decode,
        "multimodal_frame_sample": _q_frame_sample,
    }


# ------------------------------------------------------------ oracle SQL

_TOKS = ("SELECT doc_id, unnest(regexp_extract_all(lower(text), "
         f"'{_TOKEN_RE_SQL}')) AS term FROM documents")


def _bm25_sql() -> str:
    from bge_m3_onnx_ray.pipelines.flagship import DOC_QUERIES
    from bge_m3_onnx_ray.tokenizer import tokenize
    vals = []
    for qid, text in DOC_QUERIES:
        for t in sorted(set(tokenize(text))):
            vals.append(f"({qid}, '{t}')")
    qvalues = ", ".join(vals)
    return f"""
WITH toks AS ({_TOKS}),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
                 (SELECT count(*) FROM toks)::DOUBLE
                   / (SELECT count(*) FROM documents)::DOUBLE AS avgdl),
dfs AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
qterms(query_id, term) AS (VALUES {qvalues}),
scores AS (
  SELECT q.query_id, tf.doc_id,
         sum(ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
             * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))
         ) AS score
  FROM qterms q
  JOIN dfs d ON d.term = q.term
  JOIN tf ON tf.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY q.query_id, tf.doc_id),
ranked AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id) AS rnk
  FROM scores)
SELECT query_id::BIGINT AS query_id, rnk::INTEGER AS "rank",
       doc_id::BIGINT AS doc_id,
       CAST(floor(score * 1000000) AS BIGINT) AS score_q6
FROM ranked WHERE rnk <= 10 ORDER BY query_id, "rank"
"""


def _langid_sql() -> str:
    from bge_m3_onnx_ray.stages.text import LANG_ORDER, STOPWORDS

    def inlist(lang):
        return ", ".join(f"'{w}'" for w in STOPWORDS[lang])

    cols = ",\n  ".join(
        f"len(list_filter(regexp_extract_all(lower(text), '{_TOKEN_RE_SQL}'), "
        f"x -> x IN ({inlist(lg)}))) AS c_{lg}" for lg in LANG_ORDER)
    return f"""
WITH c AS (SELECT doc_id, {cols} FROM documents)
SELECT doc_id, CASE
  WHEN c_en = 0 AND c_es = 0 AND c_de = 0 AND c_fr = 0 THEN 'other'
  WHEN c_en >= c_es AND c_en >= c_de AND c_en >= c_fr THEN 'en'
  WHEN c_es >= c_de AND c_es >= c_fr THEN 'es'
  WHEN c_de >= c_fr THEN 'de'
  ELSE 'fr' END AS lang_guess
FROM c
"""


def oracle_sql() -> dict[str, str]:
    from bge_m3_onnx_ray.stages.text import STOPWORDS
    en = ", ".join(f"'{w}'" for w in STOPWORDS["en"])
    bm25 = _bm25_sql()
    return {
        "bm25_documents_topk": bm25,
        "bm25_documents_topk_exhaustive": bm25,
        "token_count": f"""
SELECT doc_id, len(regexp_extract_all(lower(text), '{_TOKEN_RE_SQL}'))::BIGINT
       AS n_tokens
FROM documents
""",
        "corpus_stats": f"""
WITH toks AS ({_TOKS})
SELECT (SELECT count(*) FROM documents)::BIGINT AS n_docs,
       (SELECT count(*) FROM toks)::BIGINT AS n_tokens,
       CAST(floor((SELECT count(*) FROM toks)::DOUBLE
                  / (SELECT count(*) FROM documents)::DOUBLE * 1000000) AS BIGINT)
         AS avg_tokens_q6
""",
        "term_df_top100": f"""
WITH toks AS ({_TOKS}),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY doc_id, term)
SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS cf
FROM tf GROUP BY term ORDER BY df DESC, term LIMIT 100
""",
        "top5_terms_per_doc": f"""
WITH toks AS ({_TOKS}),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY doc_id, term)
SELECT doc_id, term, tf,
       row_number() OVER (PARTITION BY doc_id ORDER BY tf DESC, term)::BIGINT
         AS term_rank
FROM tf WHERE doc_id < 50
QUALIFY term_rank <= 5
""",
        "length_categorize": f"""
WITH c AS (SELECT doc_id,
  len(regexp_extract_all(lower(text), '{_TOKEN_RE_SQL}'))::BIGINT AS n_words
  FROM documents)
SELECT doc_id, n_words,
  CASE WHEN n_words <= 10 THEN 'short'
       WHEN n_words <= 30 THEN 'medium' ELSE 'long' END AS category
FROM c
""",
        "langid": _langid_sql(),
        "quality_score": f"""
WITH c AS (SELECT doc_id, length(text)::BIGINT AS n_chars,
  regexp_extract_all(lower(text), '{_TOKEN_RE_SQL}') AS ts FROM documents)
SELECT doc_id, n_chars, len(ts)::BIGINT AS n_words,
  CAST(floor(coalesce(list_sum(list_transform(ts, x -> length(x))), 0)::DOUBLE
             / greatest(len(ts), 1)::DOUBLE * 1000000) AS BIGINT)
    AS avg_word_len_q6,
  CAST(floor(len(list_filter(ts, x -> x IN ({en})))::DOUBLE
             / greatest(len(ts), 1)::DOUBLE * 1000000) AS BIGINT)
    AS stop_ratio_q6
FROM c
""",
        "distribution_counts": """
SELECT lang, source, count(*)::BIGINT AS n_docs,
       min(n_chars)::BIGINT AS min_chars, max(n_chars)::BIGINT AS max_chars,
       CAST(floor(avg(n_chars::DOUBLE) * 1000000) AS BIGINT) AS avg_chars_q6
FROM documents GROUP BY lang, source
""",
        "text_variations": """
SELECT doc_id, 0::BIGINT AS variant_idx, text FROM documents
UNION ALL
SELECT doc_id, 1::BIGINT, trim(text) FROM documents WHERE trim(text) <> text
UNION ALL
SELECT doc_id,
       CASE WHEN trim(text) <> text THEN 2 ELSE 1 END::BIGINT,
       text || ' explained' FROM documents
""",
        "exact_dedup": """
SELECT min(doc_id)::BIGINT AS doc_id, count(*)::BIGINT AS n_dups
FROM documents GROUP BY text
""",
        "ngram_dup_pairs": f"""
WITH toks AS (SELECT doc_id,
    regexp_extract_all(lower(text), '{_TOKEN_RE_SQL}') AS ts FROM documents),
sh AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
  FROM (SELECT doc_id, ts, unnest(range(1, greatest(len(ts) - 2, 0) + 1)) AS i
        FROM toks)),
-- group cap aligned with the engine's ShingleStage guard (group_cap=1000):
-- shingles shared by more than 1000 docs are banned from pair generation
ok AS (SELECT shingle FROM sh GROUP BY shingle
       HAVING count(*) BETWEEN 2 AND 1000)
SELECT a.doc_id::BIGINT AS doc_a, b.doc_id::BIGINT AS doc_b,
       count(*)::BIGINT AS n_common
FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
WHERE a.shingle IN (SELECT shingle FROM ok)
GROUP BY a.doc_id, b.doc_id HAVING count(*) >= 2
""",
        "dup_clusters": f"""
WITH RECURSIVE toks AS (SELECT doc_id,
    regexp_extract_all(lower(text), '{_TOKEN_RE_SQL}') AS ts FROM documents),
sh AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
  FROM (SELECT doc_id, ts, unnest(range(1, greatest(len(ts) - 2, 0) + 1)) AS i
        FROM toks)),
ok AS (SELECT shingle FROM sh GROUP BY shingle
       HAVING count(*) BETWEEN 2 AND 1000),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  WHERE a.shingle IN (SELECT shingle FROM ok)
  GROUP BY a.doc_id, b.doc_id HAVING count(*) >= 2),
edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
          UNION SELECT doc_b, doc_a FROM pairs),
reach(u, v) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON e.u = r.v)
SELECT u::BIGINT AS doc_id, min(v)::BIGINT AS cluster_id
FROM reach GROUP BY u
""",
        "embedding_dup_pairs": """
SELECT a.vec_id::BIGINT AS vec_a, b.vec_id::BIGINT AS vec_b,
       CAST(floor(list_cosine_similarity(a.embedding, b.embedding) * 100)
            AS BIGINT) AS cos_q2
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4
""",
        "ann_cosine_topk": """
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
           WHERE vec_id < 5),
sims AS (SELECT q.query_id, e.vec_id,
                list_cosine_similarity(q.qv, e.embedding) AS cos
         FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.query_id),
ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
                        ORDER BY cos DESC, vec_id) AS rnk FROM sims)
SELECT query_id::BIGINT AS query_id, rnk::INTEGER AS "rank",
       vec_id::BIGINT AS vec_id,
       CAST(floor(cos * 100) AS BIGINT) AS cos_q2
FROM ranked WHERE rnk <= 10
""",
        "doc_term_weights": f"""
WITH toks AS ({_TOKS}),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks
       GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
                 (SELECT count(*) FROM toks)::DOUBLE
                   / (SELECT count(*) FROM documents)::DOUBLE AS avgdl),
dfs AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term)
SELECT tf.doc_id, tf.term, tf.tf::BIGINT AS tf,
       CAST(floor(ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
                  * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))
                  * 1000000) AS BIGINT) AS weight_q6
FROM tf JOIN dfs d ON d.term = tf.term
JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats s
WHERE tf.doc_id < 50
""",
        "revenue_by_segment": """
SELECT c.c_mktsegment, count(*)::BIGINT AS n_items,
       CAST(floor(sum(l.l_extendedprice * (1.0 - l.l_discount)) + 0.5)
            AS BIGINT) AS revenue_q0
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
GROUP BY c.c_mktsegment
""",
        "events_hourly": """
SELECT event_type,
       CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour,
       count(*)::BIGINT AS n_events,
       CAST(floor(sum(value) * 100 + 0.5) AS BIGINT) AS sum_value_q2
FROM events GROUP BY event_type, date_trunc('hour', ts)
""",
        "events_sessionize": """
WITH e AS (SELECT user_id, event_id, ts,
    CASE WHEN lag(ts) OVER w IS NULL
              OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
         THEN 1 ELSE 0 END AS brk
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_id FROM e)
SELECT user_id, session_id::BIGINT AS session_id, count(*)::BIGINT AS n_events,
       CAST(epoch_us(min(ts)) AS BIGINT) AS start_us,
       CAST(epoch_us(max(ts)) AS BIGINT) AS end_us
FROM s GROUP BY user_id, session_id
""",
    }
