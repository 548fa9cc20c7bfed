"""Federated search: one query over SEVERAL independent indexes with
merged global statistics — the Elasticsearch multi-index / Lucene
MultiReader pattern.

Scores are made globally exact by resolving the scoring model from the
UNION of the federation members before any scorer runs: N = Σ n_docs,
avgdl = Σ total_len / N, df(t) = Σ df_i(t). Each member is then
searched with those external stats (ShardScorer's ``idfs`` +
``avgdl_override``), so a document scores identically whether its index
is searched alone in a union build or as a federation member — the
property the driver gate checks (two half-corpus indexes ≡ the
single-index SQL oracle).

Shape: per member the usual (query × shard) fan-out and per-member
top-k merge (global top-k ⊆ union of member top-ks, since scores are
globally comparable); the final cross-member merge re-ranks only
n_members × k rows per query. Nothing beyond dictionary lookups leaves
any member's shards.

The reference has no index at all; federation is part of the engine
surface a fulltext user expects (cross-cluster search). Cited practice:
Lucene's MultiReader computes exactly these merged collection
statistics (public API docs).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from bge_m3_onnx_ray.config import QueryConfig
from bge_m3_onnx_ray.index.artifacts import ConvOffsets, IndexMeta
from bge_m3_onnx_ray.index.search import ShardScorer, merge_topk
from bge_m3_onnx_ray.scoring import idf

FED_SCHEMA = pa.schema([
    ("query_id", pa.int64()),
    ("rank", pa.int32()),
    ("index_id", pa.int32()),
    ("doc_id", pa.int64()),
    ("score", pa.float64()),
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
])


def search_federated(index_dirs: list[str], queries,
                     cfg: QueryConfig | None = None) -> rd.Dataset:
    """Top-k over the federation. ``queries``: list[(query_id, text)].
    Returns (query_id, rank, index_id, doc_id, score, conv_id,
    turn_idx) — ``doc_id`` is member-local, ``index_id`` the member's
    position in ``index_dirs``. Ties break (score desc, conv_id asc,
    turn_idx asc): conv_id is the only identity that is global across
    members. Plain disjunctive/AND retrieval only — the query-syntax
    flags raise (they would need a federated dictionary)."""
    cfg = cfg or QueryConfig()
    unsupported = [f for f, on in (
        ("parse_negation", cfg.parse_negation),
        ("parse_prefix", cfg.parse_prefix),
        ("parse_fuzzy", cfg.parse_fuzzy),
        ("parse_boost", cfg.parse_boost),
        ("parse_wildcard", cfg.parse_wildcard),
        ("parse_regex", cfg.parse_regex),
        ("collapse", cfg.collapse),
        ("synonyms", bool(cfg.synonyms))) if on]
    if unsupported:
        raise NotImplementedError(
            f"search_federated does not support {unsupported}")
    metas = [IndexMeta(d) for d in index_dirs]
    specs = {m.stats.get("tokenizer_spec", "deterministic") for m in metas}
    if len(specs) > 1:
        raise ValueError(f"federation members disagree on tokenizer: {specs}")
    n_docs = sum(m.n_docs for m in metas)
    avgdl = sum(m.total_len for m in metas) / max(n_docs, 1)

    from bge_m3_onnx_ray.tokenizer import make_tokenizer
    tok = make_tokenizer(next(iter(specs)))
    qlist = [(int(q), str(t)) for q, t in queries]
    qterms = {qid: sorted(set(tok.tokenize(text))) for qid, text in qlist}
    all_terms = sorted({t for ts in qterms.values() for t in ts})
    dfs: dict[str, int] = {}
    for m in metas:
        for t, d in m.load_term_dfs(all_terms).items():
            dfs[t] = dfs.get(t, 0) + int(d)
    idfs = {t: idf(d, n_docs) for t, d in dfs.items()}

    outs = []
    for i, (d, m) in enumerate(zip(index_dirs, metas)):
        pairs = [{"query_id": qid, "terms": ts, "shard": s}
                 for s in m.shards
                 for qid, ts in qterms.items() if ts]
        if not pairs:
            continue
        fan = rd.from_items(sorted(pairs, key=lambda r: r["shard"]))
        partials = fan.map_batches(
            ShardScorer,
            fn_constructor_kwargs={"index_dir": d, "idfs": idfs,
                                   "k": cfg.k, "method": cfg.method,
                                   "cache_size": cfg.shard_cache_size,
                                   "mode": cfg.mode,
                                   "msm": cfg.min_should_match,
                                   "avgdl_override": avgdl},
            batch_format="pyarrow", batch_size=cfg.scorer_batch_size,
            concurrency=cfg.scorer_concurrency, num_cpus=1)
        member = merge_topk(partials, ConvOffsets.load(d), cfg.k,
                            rows_bound=len(pairs) * cfg.k)
        member = member.map_batches(
            lambda t, _i=i: t.append_column(
                "index_id", pa.array(np.full(t.num_rows, _i, np.int32))),
            batch_format="pyarrow")
        outs.append(member)
    if not outs:
        return rd.from_arrow(FED_SCHEMA.empty_table())
    merged = outs[0].union(*outs[1:]) if len(outs) > 1 else outs[0]

    def rerank(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        order = pc.sort_indices(group, sort_keys=[
            ("query_id", "ascending"), ("score", "descending"),
            ("conv_id", "ascending"), ("turn_idx", "ascending")])
        g = group.take(order)
        qs = g.column("query_id").to_numpy()
        brk = np.empty(len(qs), bool)
        if len(qs):
            brk[0] = True
            brk[1:] = qs[1:] != qs[:-1]
        first = np.flatnonzero(brk)
        rank = np.arange(len(qs)) - np.repeat(first, np.diff(
            np.concatenate([first, [len(qs)]])))
        keep = rank < cfg.k
        g = g.filter(pa.array(keep))
        return pa.table({
            "query_id": g.column("query_id"),
            "rank": pa.array((rank[keep] + 1).astype(np.int32), pa.int32()),
            "index_id": g.column("index_id"),
            "doc_id": g.column("doc_id"),
            "score": g.column("score"),
            "conv_id": g.column("conv_id"),
            "turn_idx": g.column("turn_idx"),
        }, schema=FED_SCHEMA)

    def add_bucket(t: pa.Table) -> pa.Table:
        q = t.column("query_id").to_numpy().astype(np.uint64)
        b = (q * np.uint64(2654435761)) % np.uint64(64)
        return t.append_column("_qb", pa.array(b.astype(np.int64)))

    return merged.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("_qb").map_groups(rerank, batch_format="pyarrow")
