"""Explain: per-term BM25 score breakdown for a query's top-k documents
(Lucene's ``IndexSearcher.explain``). For every (query, top-k doc,
in-vocabulary query term) it reports the term frequency, the global
document frequency, and the exact score contribution — the rows sum to
the ranked score, bit-identically, because contributions are computed
by the SAME ``scoring.bm25_term_score`` the scorers use (determinism
contract, SURVEY.md §4.3).

Shape: one normal ``search`` for the top-k, then a second fan-out of
(query, shard) rows restricted to the top docs — postings load through
the scorer's own predicate-pushdown path, contributions are a
vectorized mask + one ``bm25_term_score`` call per term. Cost is
O(top-k docs × query terms), independent of corpus size.

The reference has no explain surface; its per-token sparse weight dict
(``samples/python/bge_m3_embedder.py:131-143``) is the closest
analogue — a per-term decomposition of the document representation —
and this operator is its BM25 counterpart.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from bge_m3_onnx_ray.config import QueryConfig
from bge_m3_onnx_ray.index.artifacts import IndexMeta
from bge_m3_onnx_ray.index.search import ShardScorer, search
from bge_m3_onnx_ray.scoring import idf

EXPLAIN_SCHEMA = pa.schema([
    ("query_id", pa.int64()),
    ("doc_id", pa.int64()),
    ("term", pa.string()),
    ("tf", pa.int64()),
    ("df", pa.int64()),
    ("contrib_q6", pa.int64()),
])


class _ExplainStage:
    """Per-(query, shard) row → per-term contribution rows for the row's
    allowed (top-k) docs. Reuses ShardScorer's postings loader/cache so
    there is exactly one loading path in the engine."""

    def __init__(self, index_dir: str, idfs: dict[str, float],
                 dfs: dict[str, int]):
        self.scorer = ShardScorer(index_dir, idfs, k=1,
                                  method="exhaustive", cache_size=64)
        self.meta = self.scorer.meta
        self.idfs = idfs
        self.dfs = dfs

    def __call__(self, batch: pa.Table) -> pa.Table:
        from bge_m3_onnx_ray.index.codec import decode_postings
        from bge_m3_onnx_ray.scoring import bm25_term_score
        m = self.meta
        oq, od, ot, otf, odf, oc = [], [], [], [], [], []
        for qid, terms, shard, allow in zip(
                batch.column("query_id").to_pylist(),
                batch.column("terms").to_pylist(),
                batch.column("shard").to_pylist(),
                batch.column("allow").to_pylist()):
            allow = np.asarray(allow, np.int64)
            post = self.scorer._shard_postings(int(shard), list(terms))
            for t in terms:
                e = post.get(t)
                if e is None:
                    continue
                docs, tfs, dls = decode_postings(e, m.block_size)
                mask = np.isin(docs, allow)
                if not mask.any():
                    continue
                d, tfv, dlv = docs[mask], tfs[mask], dls[mask]
                contrib = bm25_term_score(
                    tfv.astype(np.float64), dlv.astype(np.float64),
                    self.idfs[t], m.avgdl)
                oq.extend([int(qid)] * len(d))
                od.extend(d.tolist())
                ot.extend([t] * len(d))
                otf.extend(tfv.tolist())
                odf.extend([int(self.dfs[t])] * len(d))
                oc.extend(np.floor(contrib * 1e6).astype(np.int64).tolist())
        return pa.table({"query_id": pa.array(oq, pa.int64()),
                         "doc_id": pa.array(od, pa.int64()),
                         "term": pa.array(ot, pa.string()),
                         "tf": pa.array(otf, pa.int64()),
                         "df": pa.array(odf, pa.int64()),
                         "contrib_q6": pa.array(oc, pa.int64())},
                        schema=EXPLAIN_SCHEMA)


def explain_topk(index_dir: str, queries, k: int = 10,
                 method: str = "wand") -> rd.Dataset:
    """Per-term contribution rows for each query's top-``k`` docs:
    (query_id, doc_id, term, tf, df, contrib_q6). OOV query terms and
    terms absent from a doc contribute no rows. The contribution floats
    are the scorers' own term scores, so per-(query, doc) they sum to
    the ranked score exactly."""
    meta = IndexMeta(index_dir)
    top = search(index_dir, queries,
                 QueryConfig(k=k, method=method)).to_pandas()

    from bge_m3_onnx_ray.tokenizer import make_tokenizer
    tok = make_tokenizer(meta.stats.get("tokenizer_spec", "deterministic"))
    qterms = {int(q): sorted(set(tok.tokenize(str(t)))) for q, t in queries}
    all_terms = sorted({t for ts in qterms.values() for t in ts})
    dfs = meta.load_term_dfs(all_terms) if all_terms else {}
    idfs = {t: idf(d, meta.n_docs) for t, d in dfs.items()}

    dps = meta.docs_per_shard
    rows = []
    for qid, g in top.groupby("query_id"):
        terms = [t for t in qterms.get(int(qid), ()) if t in dfs]
        if not terms:
            continue
        docs = np.sort(g["doc_id"].to_numpy())
        for s in np.unique(docs // dps):
            sel = docs[(docs >= s * dps) & (docs < (s + 1) * dps)]
            rows.append({"query_id": int(qid), "terms": terms,
                         "shard": int(s), "allow": sel.tolist()})
    if not rows:
        return rd.from_arrow(EXPLAIN_SCHEMA.empty_table())
    fan = rd.from_items(sorted(rows, key=lambda r: r["shard"]))
    return fan.map_batches(
        _ExplainStage,
        fn_constructor_kwargs={"index_dir": index_dir, "idfs": idfs,
                               "dfs": dfs},
        batch_format="pyarrow", concurrency=(1, 8), num_cpus=1)
