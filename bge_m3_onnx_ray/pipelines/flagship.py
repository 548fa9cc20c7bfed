"""Flagship pipeline: BM25 index build + top-k search.

Two corpora:

- the ``documents`` table of the sandbox test data, framed as one-turn
  transcripts (``conv_id = f"doc-{doc_id:08d}", turn_idx = 0``) — this
  variant is verified row-for-row against a full BM25 oracle written in
  SQL (DuckDB) by the driver;
- the synthetic multi-turn ``transcripts`` fixture (the authoritative
  input_hint shape) — verified against the pure-Python oracle in pytest.

Indexes are cached under /tmp keyed by corpus identity; rebuild of an
existing complete index is a no-op thanks to the resume manifest.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import ray.data as rd

from bge_m3_onnx_ray.config import IndexConfig, QueryConfig
from bge_m3_onnx_ray.index.build import build_index
from bge_m3_onnx_ray.index.search import search

# Fixed reference query set for the documents corpus (vocabulary of the
# sandbox documents tables). Duplicate + OOV terms included on purpose.
DOC_QUERIES: list[tuple[int, str]] = [
    (0, "key order sort"),
    (1, "spark group query"),
    (2, "join filter window"),
    (3, "data data data"),          # duplicate terms
    (4, "customer stream merge scan"),
    (5, "zzzneverseen oov"),        # out-of-vocabulary
    (6, "table"),
    (7, "slow small filter count row"),
]

_DOC_CFG = IndexConfig(docs_per_shard=4096, term_buckets=8, block_size=128)

# Negated-term queries ("-word" excludes documents containing it):
# no-op OOV negation, self-negation (empty result), multi-negation.
DOC_NOT_QUERIES: list[tuple[int, str]] = [
    (0, "key order sort -join"),
    (1, "spark group query -filter -window"),
    (2, "table -zzzneverseen"),         # OOV negation: same as plain query
    (3, "data data data -data"),        # self-negation: empty result
    (4, "customer stream merge -the"),
]

# Prefix (wildcard) queries: "word*" expands to every dictionary term
# with that prefix; disjunctive BM25 over the expansion + literals.
DOC_PREFIX_QUERIES: list[tuple[int, str]] = [
    (0, "s* table"),        # wide expansion (scan slow small sort spark stream)
    (1, "qu* key order"),
    (2, "c*"),              # prefix-only query
    (3, "zz* data"),        # empty expansion: literal terms only
]

# Generalized wildcard queries ('*' anywhere — Lucene WildcardQuery):
# suffix, bounded infix, double-infix, leading-star-with-literal, an
# empty expansion (literal term only), and a very wide single-char hub.
DOC_WILDCARD_QUERIES: list[tuple[int, str]] = [
    (0, "*ream table"),     # suffix: stream
    (1, "s*w"),             # bounded: slow
    (2, "*a*ue*"),          # double infix: value
    (3, "c*er data"),       # head-pruned: customer
    (4, "*zzz* key"),       # empty expansion: literal only
    (5, "*a*"),             # wide hub: every term containing 'a'
]

# Regex term queries (Lucene RegexpQuery: the pattern must match the
# WHOLE normalized term): alternation, unbounded prefix-star, character
# class, an empty expansion, and a multi-term alternation.
DOC_REGEX_QUERIES: list[tuple[int, str]] = [
    (0, "/s(low|mall)/ table"),
    (1, "/.*ream/"),
    (2, "/dat[a-z]/ key"),
    (3, "/qqq+/"),                  # matches nothing: zero rows
    (4, "/(key|order|sort)/"),
]

# Fuzzy (typo-tolerant) queries: every token expands to its
# Levenshtein-distance-1 dictionary neighbourhood. Misspellings with a
# unique target, an exact in-vocabulary word (always-expand semantics),
# a no-neighbour token (empty result), and a multi-expansion token
# ("sow" -> {slow, row}).
DOC_FUZZY_QUERIES: list[tuple[int, str]] = [
    (0, "keey orde sort"),          # keey->key, orde->order
    (1, "spark qury"),              # qury->query
    (2, "tble filtr"),              # tble->table, filtr->filter
    (3, "data"),                    # exact term: expansion includes itself
    (4, "zzzneverseen"),            # no dist-1 neighbour: empty result
    (5, "custmer streem mrge"),     # customer / stream / merge
    (6, "sow"),                     # multi-expansion: slow AND row
]

# Term-boost queries (the Lucene "word^2.5" syntax): integer and
# fractional boosts, a down-boost (<1), a duplicate word where the MAX
# boost wins, a boosted OOV word (no-op), and a malformed suffix that
# must parse as a plain word.
DOC_BOOST_QUERIES: list[tuple[int, str]] = [
    (0, "key^3 order sort"),
    (1, "spark group^0.5 query"),
    (2, "join^2.5 filter window^2.5"),
    (3, "data data^4"),                  # same term twice: max boost (4)
    (4, "customer^2 zzzneverseen^9"),    # boosted OOV term: no-op
    (5, "table^x"),                      # malformed boost: literal word
    (6, "slow^1 small filter"),          # explicit ^1 == no boost
]

# Query-time synonym map + queries: an in-vocabulary expansion, a
# multi-synonym entry, an OOV expansion (contributes nothing), and a
# query containing both a source term and its synonym (dedup).
DOC_SYNONYMS: tuple = (
    ("query", ("scan",)),
    ("merge", ("join", "group")),
    ("table", ("zzzneverseen",)),       # OOV synonym: no-op
    ("slow", ("small",)),
)
DOC_SYN_QUERIES: list[tuple[int, str]] = [
    (0, "query table"),
    (1, "merge stream"),
    (2, "slow small row"),              # synonym already present: dedup
    (3, "data filter"),                 # no entries: plain query
]

# Quoted-phrase mixed queries ("..." spans are candidate filters, all
# terms rank): two-phrase conjunction, OOV phrase (empty), phrase-only.
DOC_QUOTED_QUERIES: list[tuple[int, str]] = [
    (0, '"order sort" table'),
    (1, 'data "batch batch" stream'),
    (2, '"key order sort"'),
    (3, 'table "zzzneverseen qqq"'),          # OOV phrase: empty result
    (4, '"customer stream" "slow query" row'),  # two phrases: intersection
]

# Proximity (NEAR) queries: (query_id, term_a, term_b, slop) — pairs of
# terms within `slop` token positions; includes a same-term pair and an
# OOV pair.
DOC_NEAR_QUERIES: list[tuple[int, str, str, int]] = [
    (0, "key", "sort", 3),
    (1, "data", "join", 2),
    (2, "customer", "merge", 4),
    (3, "batch", "batch", 2),           # same term: adjacent repetitions
    (4, "table", "zzzneverseen", 5),    # OOV side: no matches
]

# Fixed phrase-query set (exact consecutive-token match over the same
# corpus): repeated words, a 3-gram that vanishes at some scale factors,
# an OOV word, and a single-word phrase (≡ term query) on purpose.
DOC_PHRASES: list[tuple[int, str]] = [
    (0, "order sort"),
    (1, "batch batch"),            # repeated word — overlapping positions
    (2, "key order sort"),         # 3-gram (absent at sf0.01: zero rows)
    (3, "data data data"),
    (4, "customer stream"),
    (5, "zzzneverseen table"),     # OOV word: matches nothing
    (6, "table"),                  # single-word phrase == term frequency
    (7, "slow query"),
]

# match_phrase_prefix fixtures: the LAST token is a prefix. Shapes:
# multi-expansion last slot, exact-term-as-prefix, single-token prefix,
# prefix matching nothing, one-char prefix (wide expansion).
PHRASE_PREFIX_QUERIES: list[tuple[int, str]] = [
    (0, "key or"),                 # "or" -> order
    (1, "table s"),                # wide: sort/scan/stream/spark/...
    (2, "quer"),                   # single-token prefix
    (3, "data zz"),                # prefix matches no term: zero rows
    (4, "batch batch"),            # full term as prefix, repeated word
    (5, "c"),                      # one char: customer/count/column/...
]


def _doc_rows_to_transcript(batch: pa.Table) -> pa.Table:
    ids = batch.column("doc_id").to_numpy()
    return pa.table({
        "conv_id": pa.array([f"doc-{i:08d}" for i in ids], pa.string()),
        "turn_idx": pa.array(np.zeros(len(ids), np.int32), pa.int32()),
        "text": batch.column("text"),
    })


def documents_as_transcripts(sf_dir: str) -> rd.Dataset:
    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"])
    return ds.map_batches(_doc_rows_to_transcript, batch_format="pyarrow")


def _cached_index(corpus_ds: rd.Dataset, cache_key: str,
                  cfg: IndexConfig) -> str:
    idx = os.path.join("/tmp/bm25_indexes", cache_key)
    stats = os.path.join(idx, "stats.json")
    if not os.path.exists(stats):
        build_index(corpus_ds, idx, cfg)
    else:
        with open(stats) as f:
            if json.load(f).get("config_fingerprint") != cfg.fingerprint():
                import shutil
                shutil.rmtree(idx)
                build_index(corpus_ds, idx, cfg)
    return idx


def bm25_documents_topk(sf_dir: str, method: str = "wand", k: int = 10) -> pa.Table:
    """Top-k BM25 over the documents table; output (query_id, rank,
    doc_id, score_q6) — shaped to hash-match the DuckDB SQL oracle."""
    key = "documents-" + os.path.basename(os.path.normpath(sf_dir))
    idx = _cached_index(documents_as_transcripts(sf_dir), key, _DOC_CFG)
    out = search(idx, DOC_QUERIES, QueryConfig(k=k, method=method)).to_pandas()
    out["doc_id"] = out["conv_id"].str.slice(4).astype(np.int64)
    out["score_q6"] = np.floor(out["score"].to_numpy() * 1e6).astype(np.int64)
    out = out.sort_values(["query_id", "rank"]).reset_index(drop=True)
    return pa.Table.from_pandas(out[["query_id", "rank", "doc_id", "score_q6"]],
                                preserve_index=False)


def bm25_documents_topk_and(sf_dir: str, k: int = 10) -> pa.Table:
    """Conjunctive (boolean AND) top-k: only documents containing EVERY
    query term are candidates, ranked by the same BM25 sums — the
    classic fulltext AND query. Same result shape/oracle conventions as
    :func:`bm25_documents_topk`; queries with an out-of-vocabulary term
    (e.g. DOC_QUERIES[5]) return no rows on both sides."""
    key = "documents-" + os.path.basename(os.path.normpath(sf_dir))
    idx = _cached_index(documents_as_transcripts(sf_dir), key, _DOC_CFG)
    out = search(idx, DOC_QUERIES,
                 QueryConfig(k=k, method="wand", mode="and")).to_pandas()
    out["doc_id"] = out["conv_id"].str.slice(4).astype(np.int64)
    out["score_q6"] = np.floor(out["score"].to_numpy() * 1e6).astype(np.int64)
    out = out.sort_values(["query_id", "rank"]).reset_index(drop=True)
    return pa.Table.from_pandas(out[["query_id", "rank", "doc_id", "score_q6"]],
                                preserve_index=False)


def bm25_documents_topk_appended(sf_dir: str, k: int = 10) -> pa.Table:
    """Same BM25 top-k as :func:`bm25_documents_topk`, but the index is
    built INCREMENTALLY: half the corpus (doc_id parity) is indexed
    fresh, the other half arrives via ``index.append.append_index`` —
    so the driver's SQL oracle gates the delta-append path end-to-end
    (N, avgdl, per-term df must all come out exactly as a one-shot build
    over the union).

    Ranking detail: appended internal docIDs are not in original doc
    order, so the merge's internal tie-break differs from a fresh build;
    results are re-ranked on (floor(score*1e6) desc, doc_id) — ulp-stable
    across engines — with the same over-fetch + tie-width guard as the
    transcripts flagship, and the oracle ranks identically."""
    from bge_m3_onnx_ray.index.append import append_index
    idx = os.path.join("/tmp/bm25_indexes", "documents-appended-"
                       + os.path.basename(os.path.normpath(sf_dir)))
    if not os.path.exists(os.path.join(idx, "appended.json")):
        import shutil
        shutil.rmtree(idx, ignore_errors=True)
        import pyarrow.compute as pc

        def _half(parity: int) -> rd.Dataset:
            ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                                 columns=["doc_id", "text"])
            return ds.map_batches(
                lambda t, _p=parity: t.filter(pc.equal(
                    pc.bit_wise_and(t.column("doc_id"), 1), _p)),
                batch_format="pyarrow").map_batches(
                _doc_rows_to_transcript, batch_format="pyarrow")

        build_index(_half(0), idx, _DOC_CFG)
        append_index(_half(1), idx)
        from bge_m3_onnx_ray.index.artifacts import atomic_write_json
        atomic_write_json({"appended": True},
                          os.path.join(idx, "appended.json"))
    out = search(idx, DOC_QUERIES,
                 QueryConfig(k=3 * k, method="wand")).to_pandas()
    out["doc_id"] = out["conv_id"].str.slice(4).astype(np.int64)
    out["score_q6"] = np.floor(out["score"].to_numpy() * 1e6).astype(np.int64)
    out = out.sort_values(["query_id", "score_q6", "doc_id"],
                          ascending=[True, False, True]) \
        .reset_index(drop=True)
    out["rank"] = out.groupby("query_id").cumcount().astype(np.int32) + 1
    kth = out[out["rank"] == k].set_index("query_id").score_q6
    g = out.groupby("query_id")
    risky = (g.size() >= 3 * k) & (kth.reindex(g.size().index)
                                   == g.score_q6.last())
    if bool(risky.any()):
        raise RuntimeError(
            f"quantized-score tie group wider than the {3 * k}-row "
            f"over-fetch for queries {list(risky[risky].index)[:5]}")
    out = out[out["rank"] <= k]
    return pa.Table.from_pandas(out[["query_id", "rank", "doc_id",
                                     "score_q6"]], preserve_index=False)


def bm25_transcripts_topk_collapsed(sf_dir: str, k: int = 10,
                                    n_turns: int | None = None,
                                    method: str = "exhaustive") -> pa.Table:
    """Field-collapsed flagship: at most ONE result per CONVERSATION,
    conversations ranked by their best-scoring turn — the Lucene/Solr
    collapse / Elasticsearch field_collapse shape, and the natural
    transcripts ask ("the best conversations", not five turns of one).

    Output (query_id, rank, conv_id, score_q6). The best turn's
    turn_idx is deliberately NOT part of the gated shape: the per-conv
    MAX quantized score is quantization-stable (floor is monotone, so
    the raw-score-best turn always carries the conversation's max
    score_q6), but the IDENTITY of that turn inside a quantized tie is
    not — the oracle mirrors with max(score_q6) GROUP BY conv_id. Same
    over-fetch + tie-width guard as :func:`bm25_transcripts_topk`."""
    from bge_m3_onnx_ray.fixtures import gen_queries, transcripts_path

    if n_turns is None:
        n_turns = transcripts_n_turns(sf_dir)
    path = transcripts_path(n_turns)
    cfg = IndexConfig(docs_per_shard=TRANSCRIPTS_DOCS_PER_SHARD,
                      term_buckets=8)
    idx = _cached_index(rd.read_parquet(path), f"transcripts-n{n_turns}", cfg)
    out = search(idx, gen_queries(50),
                 QueryConfig(k=3 * k, method=method, collapse=True))
    df = out.to_pandas()
    df["score_q6"] = np.floor(df["score"].to_numpy() * 1e6).astype(np.int64)
    df = df.sort_values(["query_id", "score_q6", "conv_id"],
                        ascending=[True, False, True]).reset_index(drop=True)
    df["rank"] = df.groupby("query_id").cumcount().astype(np.int32) + 1
    kth = df[df["rank"] == k].set_index("query_id").score_q6
    g = df.groupby("query_id")
    last = g.score_q6.last()
    nfetch = g.size()
    risky = (nfetch >= 3 * k) & (kth.reindex(nfetch.index) == last)
    if bool(risky.any()):
        raise RuntimeError(
            f"quantized-score tie group wider than the {3 * k}-conv "
            f"over-fetch for queries {list(risky[risky].index)[:5]}; "
            f"re-run with a larger fetch")
    df = df[df["rank"] <= k]
    return pa.Table.from_pandas(
        df[["query_id", "rank", "conv_id", "score_q6"]],
        preserve_index=False)


def bm25_transcripts_conv_topk(sf_dir: str, k: int = 10,
                               n_turns: int | None = None) -> pa.Table:
    """Parent-level ranking, score_mode=sum (the Elasticsearch has_child
    / join-field shape): conversations ranked by the SUM of their
    matching turns' BM25 scores — "which conversations are most about
    X overall", vs collapse's "which conversation has the single best
    turn".

    Exact under sharding with no over-fetch: per-turn scores are
    quantized to floor(score*1e6) int64 BEFORE summing, shards emit
    per-conv partial int sums keyed by the conv's first docID, and the
    merge adds partials (integer addition is order-free) — the global
    per-conv sum is exact, so the top-k cut needs no tie-width guard.
    Output (query_id, rank, conv_id, score_sum_q6); oracle mirrors with
    sum(floor(score*1e6)) GROUP BY conv_id."""
    from bge_m3_onnx_ray.fixtures import gen_queries, transcripts_path

    if n_turns is None:
        n_turns = transcripts_n_turns(sf_dir)
    path = transcripts_path(n_turns)
    cfg = IndexConfig(docs_per_shard=TRANSCRIPTS_DOCS_PER_SHARD,
                      term_buckets=8)
    idx = _cached_index(rd.read_parquet(path), f"transcripts-n{n_turns}", cfg)
    out = search(idx, gen_queries(50),
                 QueryConfig(k=k, method="exhaustive",
                             conv_score_mode="sum"))
    df = out.to_pandas()
    df["score_sum_q6"] = df["score"].to_numpy().astype(np.int64)
    df = df.sort_values(["query_id", "rank"]).reset_index(drop=True)
    return pa.Table.from_pandas(
        df[["query_id", "rank", "conv_id", "score_sum_q6"]],
        preserve_index=False)


def _add_day(t: pa.Table) -> pa.Table:
    import pyarrow.compute as pc
    us = t.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
    day = pc.divide(pc.divide(us, 1_000_000), 86_400)
    return t.select(["conv_id", "turn_idx"]) \
        .append_column("day", day.cast(pa.int64()))


def _ensure_day_attrs(idx: str, path: str) -> None:
    """Derived epoch-day integer attrs column (histogram key / recency
    decay input): epoch_seconds // 86400 from the fixture timestamp."""
    from bge_m3_onnx_ray.index.attrs import build_doc_attrs, has_doc_attrs
    if not has_doc_attrs(idx, "day"):
        build_doc_attrs(
            rd.read_parquet(path).map_batches(_add_day,
                                              batch_format="pyarrow"),
            idx, "day")


def bm25_transcripts_topk_recency(sf_dir: str, k: int = 10,
                                  tau: float = 30.0) -> pa.Table:
    """Recency-decayed ranking (the Elasticsearch decay-function
    shape): score' = score * (tau / (tau + age_days)), age measured
    from the corpus' newest day — both sides derive origin = max(day)
    from the data, so the gate carries no magic constant."""
    return bm25_transcripts_topk(sf_dir, method="exhaustive", k=k,
                                 decay_tau=tau)


def facet_histogram_day(sf_dir: str) -> pa.Table:
    """Date-histogram aggregation (the Elasticsearch date_histogram
    shape, day interval): per query, the number of matching TURNS per
    UTC day of their timestamp, over the full OR match set of the
    transcripts corpus. The day lands in the index as a derived integer
    attrs column (epoch_seconds // 86400 — ``timestamp[us]`` cast
    normalizes the parquet unit first), counted by the same per-shard
    facet machinery as the value facets. Output (query_id, day,
    n_docs)."""
    import pyarrow.compute as pc

    from bge_m3_onnx_ray.fixtures import gen_queries, transcripts_path
    from bge_m3_onnx_ray.index.attrs import build_doc_attrs, has_doc_attrs
    from bge_m3_onnx_ray.index.facets import facet_counts
    n_turns = transcripts_n_turns(sf_dir)
    path = transcripts_path(n_turns)
    cfg = IndexConfig(docs_per_shard=TRANSCRIPTS_DOCS_PER_SHARD,
                      term_buckets=8)
    idx = _cached_index(rd.read_parquet(path), f"transcripts-n{n_turns}", cfg)
    _ensure_day_attrs(idx, path)
    out = facet_counts(idx, gen_queries(50), "day").to_pandas()
    out["day"] = out["value"].astype(np.int64)
    out = out.sort_values(["query_id", "day"]).reset_index(drop=True)
    return pa.Table.from_pandas(out[["query_id", "day", "n_docs"]],
                                preserve_index=False)


def transcripts_tool_stats(sf_dir: str) -> pa.Table:
    """Per-tool usage analytics over the full input_hint schema — the
    ``tool`` column's first first-class consumer: turns, DISTINCT
    conversations, total/average token length per tool value. Two
    vectorized partial stages + low-cardinality bucket reduces; the
    distinct-conversation count reduces (tool, conv) pairs, so a
    conversation spanning many batches counts once. Output (tool,
    n_turns, n_convs, sum_len, avg_len_q6)."""
    import pandas as pd

    from bge_m3_onnx_ray.fixtures import transcripts_path
    from bge_m3_onnx_ray.stages._groups import bucket_reduce
    from bge_m3_onnx_ray.tokenizer import DeterministicTokenizer
    path = transcripts_path(transcripts_n_turns(sf_dir))

    def partial_turns(t: pa.Table) -> pa.Table:
        tok = DeterministicTokenizer()
        _, _, _, _, dls = tok.batch_term_counts_coded(t.column("text"))
        tool = t.column("tool").combine_chunks().dictionary_encode()
        codes = np.asarray(tool.indices).astype(np.int64)
        order = np.argsort(codes, kind="stable")
        c, d = codes[order], dls[order].astype(np.int64)
        brk = np.empty(len(c), bool)
        if len(c):
            brk[0] = True
            brk[1:] = np.diff(c) != 0
        starts = np.flatnonzero(brk)
        return pa.table({
            "tool": tool.dictionary.take(pa.array(c[starts]))
                .cast(pa.string()),
            "n_turns": pa.array(np.diff(np.concatenate(
                [starts, [len(c)]])).astype(np.int64), pa.int64()),
            "sum_len": pa.array(np.add.reduceat(d, starts)
                                if len(starts) else np.empty(0, np.int64),
                                pa.int64())})

    def partial_convs(t: pa.Table) -> pa.Table:
        return t.select(["tool", "conv_id"])

    src = rd.read_parquet(path, columns=["conv_id", "tool", "text"])
    turns = bucket_reduce(
        src.map_batches(partial_turns, batch_format="pyarrow"),
        ["tool"], [("n_turns", "sum", "n_turns"),
                   ("sum_len", "sum", "sum_len")]).to_pandas()
    pairs = bucket_reduce(
        rd.read_parquet(path, columns=["conv_id", "tool"])
        .map_batches(partial_convs, batch_format="pyarrow"),
        ["tool", "conv_id"], [(None, "count", "x")]).to_pandas()
    convs = pairs.groupby("tool").size().rename("n_convs").reset_index()
    out = turns.merge(convs, on="tool")
    out["avg_len_q6"] = np.floor(
        out["sum_len"].to_numpy(np.float64)
        / out["n_turns"].to_numpy(np.float64) * 1e6).astype(np.int64)
    out = out.sort_values("tool").reset_index(drop=True)
    return pa.Table.from_pandas(
        out[["tool", "n_turns", "n_convs", "sum_len", "avg_len_q6"]],
        preserve_index=False)


def transcripts_role_transitions(sf_dir: str, n_buckets: int = 64) -> pa.Table:
    """Role-transition bigram counts over the multi-turn schema: how
    often does a turn of role A follow a turn of role B inside one
    conversation (turn_idx order) — the conversation-flow analytic.

    Distributed shape: ONE shuffle keyed by a hash bucket of conv_id
    (all of a conversation's turns co-locate; transitions never cross
    conversations, so buckets are independent), a vectorized per-bucket
    sort + adjacent-pair kernel, then a tiny (roles x roles) reduce.
    Output (from_role, to_role, n)."""
    from bge_m3_onnx_ray.fixtures import transcripts_path
    from bge_m3_onnx_ray.hashing import P53, poly_hash
    from bge_m3_onnx_ray.stages._groups import bucket_reduce
    path = transcripts_path(transcripts_n_turns(sf_dir))

    def add_bucket(t: pa.Table) -> pa.Table:
        b = poly_hash(t.column("conv_id"), P53) % np.uint64(n_buckets)
        return t.append_column("_cb", pa.array(b.astype(np.int64)))

    def per_bucket(g: pa.Table) -> pa.Table:
        conv = g.column("conv_id").combine_chunks().dictionary_encode()
        cc = np.asarray(conv.indices).astype(np.int64)
        turn = g.column("turn_idx").to_numpy()
        role = g.column("role").combine_chunks().dictionary_encode()
        rc = np.asarray(role.indices).astype(np.int64)
        order = np.lexsort((turn, cc))
        cc, rc = cc[order], rc[order]
        same = cc[1:] == cc[:-1]              # adjacent rows, same conv
        frm, to = rc[:-1][same], rc[1:][same]
        nr = len(role.dictionary)
        pair = frm * nr + to
        u, c = np.unique(pair, return_counts=True)
        return pa.table({
            "from_role": role.dictionary.take(pa.array(u // nr))
                .cast(pa.string()),
            "to_role": role.dictionary.take(pa.array(u % nr))
                .cast(pa.string()),
            "n": pa.array(c.astype(np.int64), pa.int64())})

    src = rd.read_parquet(path, columns=["conv_id", "turn_idx", "role"])
    pairs = src.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("_cb").map_groups(per_bucket, batch_format="pyarrow")
    return bucket_reduce(pairs, ["from_role", "to_role"],
                         [("n", "sum", "n")], n_buckets=8) \
        .to_pandas().sort_values(["from_role", "to_role"]) \
        .pipe(lambda d: pa.Table.from_pandas(d.reset_index(drop=True),
                                             preserve_index=False))


def transcripts_phrases(sf_dir: str, n: int = 8) -> list[tuple[int, str]]:
    """Deterministic phrase set drawn from the multi-turn fixture itself
    (both the engine query and the DuckDB oracle builder call this, so
    the two sides always agree): the first bigram/trigram of the first
    few sufficiently-long turns in (conv_id, turn_idx) order, plus OOV
    and single-word edges."""
    import pyarrow.parquet as pq

    from bge_m3_onnx_ray.fixtures import transcripts_path
    from bge_m3_onnx_ray.tokenizer import tokenize
    path = transcripts_path(transcripts_n_turns(sf_dir))
    t = pa.concat_tables([pq.read_table(os.path.join(path, f),
                                        columns=["conv_id", "turn_idx",
                                                 "text"])
                          for f in sorted(os.listdir(path))])
    import pyarrow.compute as pc
    t = t.take(pc.sort_indices(t, sort_keys=[("conv_id", "ascending"),
                                             ("turn_idx", "ascending")]))
    out: list[tuple[int, str]] = []
    qid = 0
    for text in t.column("text").to_pylist():
        toks = tokenize(text or "")
        if len(toks) >= 4:
            out.append((qid, " ".join(toks[:2])))
            out.append((qid + 1, " ".join(toks[1:4])))
            qid += 2
        if qid >= n:
            break
    out.append((100, "zzzneverseen phrase"))
    if len(t):
        first = tokenize(t.column("text")[0].as_py() or "")
        if first:
            out.append((101, first[0]))
    return out


def phrase_transcripts_topk(sf_dir: str, k: int = 10) -> pa.Table:
    """Exact-phrase top-k over the authoritative multi-turn transcripts
    corpus (positional index over the same shard geometry). Output
    (query_id, rank, conv_id, turn_idx, tf, score_q6), quantized-rank
    tie-break on (conv_id, turn_idx) — hash-matches the chained-join
    DuckDB oracle over the Unicode tokenizer mirror."""
    from bge_m3_onnx_ray.fixtures import transcripts_path
    from bge_m3_onnx_ray.index.positions import build_positions, phrase_search
    n_turns = transcripts_n_turns(sf_dir)
    path = transcripts_path(n_turns)
    cfg = IndexConfig(docs_per_shard=TRANSCRIPTS_DOCS_PER_SHARD,
                      term_buckets=8)
    idx = _cached_index(rd.read_parquet(path), f"transcripts-n{n_turns}", cfg)
    build_positions(path, idx)  # no-op if current
    out = phrase_search(idx, transcripts_phrases(sf_dir), k).to_pandas()
    if not len(out):
        import pandas as pd
        out = pd.DataFrame({"query_id": pd.Series([], dtype=np.int64),
                            "rank": pd.Series([], dtype=np.int32),
                            "conv_id": pd.Series([], dtype=str),
                            "turn_idx": pd.Series([], dtype=np.int32),
                            "tf": pd.Series([], dtype=np.int64),
                            "score_q6": pd.Series([], dtype=np.int64)})
        return pa.Table.from_pandas(out, preserve_index=False)
    out["score_q6"] = np.floor(out["score"].to_numpy() * 1e6).astype(np.int64)
    out = out.sort_values(["query_id", "rank"]).reset_index(drop=True)
    return pa.Table.from_pandas(
        out[["query_id", "rank", "conv_id", "turn_idx", "tf", "score_q6"]],
        preserve_index=False)


def bm25_documents_topk_prefix(sf_dir: str, k: int = 10) -> pa.Table:
    """Wildcard retrieval: "word*" terms expand against the global
    dictionary (range-pruned predicate-pushdown scan), ranked by the
    standard disjunctive BM25 over expansion + literals. Same
    shape/oracle conventions as :func:`bm25_documents_topk`."""
    key = "documents-" + os.path.basename(os.path.normpath(sf_dir))
    idx = _cached_index(documents_as_transcripts(sf_dir), key, _DOC_CFG)
    out = search(idx, DOC_PREFIX_QUERIES,
                 QueryConfig(k=k, method="wand",
                             parse_prefix=True)).to_pandas()
    out["doc_id"] = out["conv_id"].str.slice(4).astype(np.int64)
    out["score_q6"] = np.floor(out["score"].to_numpy() * 1e6).astype(np.int64)
    out = out.sort_values(["query_id", "rank"]).reset_index(drop=True)
    return pa.Table.from_pandas(out[["query_id", "rank", "doc_id", "score_q6"]],
                                preserve_index=False)


def bm25_documents_topk_wildcard(sf_dir: str, k: int = 10) -> pa.Table:
    """Generalized wildcard retrieval: '*' anywhere in a word ("*fix",
    "a*b") expands against the global dictionary
    (``IndexMeta.expand_wildcard`` — head-literal range pruning + one
    anchored RE2 match), ranked by the standard disjunctive BM25 over
    expansions + literals. The DuckDB oracle mirrors the expansion with
    ``term LIKE`` patterns ('*' → '%'). Same shape/oracle conventions
    as :func:`bm25_documents_topk`."""
    key = "documents-" + os.path.basename(os.path.normpath(sf_dir))
    idx = _cached_index(documents_as_transcripts(sf_dir), key, _DOC_CFG)
    out = search(idx, DOC_WILDCARD_QUERIES,
                 QueryConfig(k=k, method="wand",
                             parse_wildcard=True)).to_pandas()
    out["doc_id"] = out["conv_id"].str.slice(4).astype(np.int64)
    out["score_q6"] = np.floor(out["score"].to_numpy() * 1e6).astype(np.int64)
    out = out.sort_values(["query_id", "rank"]).reset_index(drop=True)
    return pa.Table.from_pandas(out[["query_id", "rank", "doc_id", "score_q6"]],
                                preserve_index=False)


def bm25_documents_topk_regex(sf_dir: str, k: int = 10) -> pa.Table:
    """Regex term retrieval: "/pat/" words expand to the dictionary
    terms FULLY matching the RE2 pattern (``IndexMeta.expand_regex``),
    ranked by the standard disjunctive BM25. RE2 on both sides of the
    gate: Arrow's match_substring_regex here, DuckDB's
    ``regexp_full_match`` in the oracle. Same shape/oracle conventions
    as :func:`bm25_documents_topk`."""
    key = "documents-" + os.path.basename(os.path.normpath(sf_dir))
    idx = _cached_index(documents_as_transcripts(sf_dir), key, _DOC_CFG)
    out = search(idx, DOC_REGEX_QUERIES,
                 QueryConfig(k=k, method="wand",
                             parse_regex=True)).to_pandas()
    out["doc_id"] = out["conv_id"].str.slice(4).astype(np.int64)
    out["score_q6"] = np.floor(out["score"].to_numpy() * 1e6).astype(np.int64)
    out = out.sort_values(["query_id", "rank"]).reset_index(drop=True)
    return pa.Table.from_pandas(out[["query_id", "rank", "doc_id", "score_q6"]],
                                preserve_index=False)


class _PercolateStage:
    """Reverse search (the Elasticsearch percolator): registered
    queries are broadcast, and each incoming document reports which
    queries it satisfies (AND semantics — the doc must contain EVERY
    query term). Vectorized per batch: one dictionary encode, then
    per-query sorted-row intersections over term-presence arrays."""

    def __init__(self, queries: tuple):
        from bge_m3_onnx_ray.tokenizer import DeterministicTokenizer
        self.tok = DeterministicTokenizer()
        self.queries = [(int(q), sorted(set(self.tok.tokenize(t))))
                        for q, t in queries]

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc = batch.column("doc_id").to_numpy()
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "query_id": pa.array([], pa.int64())})
        if not len(doc):
            return empty
        flat, offs = self.tok.batch_token_lists(batch.column("text"))
        if not len(flat):
            return empty
        de = flat.dictionary_encode()
        codes = np.asarray(de.indices).astype(np.int64)
        row_idx = np.repeat(np.arange(len(doc)), np.diff(offs))
        vocab = {t: i for i, t in enumerate(de.dictionary.to_pylist())}
        out_d, out_q = [], []
        for qid, terms in self.queries:
            if not terms:
                continue
            need = [vocab.get(t) for t in terms]
            if any(c is None for c in need):    # a term absent from the
                continue                        # whole batch: no matches
            rows = None
            for c in need:
                rc = np.unique(row_idx[codes == c])
                rows = rc if rows is None else \
                    np.intersect1d(rows, rc, assume_unique=True)
                if not len(rows):
                    break
            if rows is not None and len(rows):
                out_d.extend(doc[rows].tolist())
                out_q.extend([qid] * len(rows))
        return pa.table({"doc_id": pa.array(out_d, pa.int64()),
                         "query_id": pa.array(out_q, pa.int64())})


def percolate_documents(sf_dir: str) -> pa.Table:
    """Route every corpus document against the registered DOC_QUERIES
    (AND semantics) — the streaming-ingest percolation shape: the query
    set is the broadcast small side, the corpus streams through one
    map stage, no index needed. Output (doc_id, query_id)."""
    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"])
    out = ds.map_batches(
        _PercolateStage,
        fn_constructor_kwargs={"queries": tuple(DOC_QUERIES)},
        batch_format="pyarrow", concurrency=(1, 8),
        num_cpus=1).to_pandas()
    out = out.sort_values(["doc_id", "query_id"]).reset_index(drop=True)
    return pa.Table.from_pandas(out[["doc_id", "query_id"]],
                                preserve_index=False)


class _FgTermCounts:
    """Per-batch foreground term counts for significant-terms: for
    (query_id, doc_id) match rows, read those docs' texts (row-group
    pushdown), take each doc's DISTINCT terms (vectorized dictionary
    trick, no per-doc Python tokenatomy), emit (query_id, term, n=1 per
    match-doc) partial rows."""

    def __init__(self, corpus_path: str):
        from bge_m3_onnx_ray.tokenizer import DeterministicTokenizer
        self.corpus_path = corpus_path
        self.tok = DeterministicTokenizer()

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.dataset as pads
        qid = batch.column("query_id").to_numpy()
        doc = batch.column("doc_id").to_numpy()
        empty = pa.table({"query_id": pa.array([], pa.int64()),
                          "term": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        if not len(doc):
            return empty
        uniq = np.unique(doc)
        t = pads.dataset(self.corpus_path, format="parquet").to_table(
            filter=pads.field("doc_id").isin(uniq.tolist()),
            columns=["doc_id", "text"])
        row_of = {d: i for i, d in enumerate(t.column("doc_id").to_pylist())}
        flat, offs = self.tok.batch_token_lists(t.column("text"))
        if not len(flat):
            return empty
        de = flat.dictionary_encode()
        codes = np.asarray(de.indices).astype(np.int64)
        k = max(len(de.dictionary), 1)
        row_idx = np.repeat(np.arange(t.num_rows), np.diff(offs))
        upair = np.unique(row_idx * k + codes)       # distinct per doc
        urow, ucode = upair // k, upair % k
        # per corpus row: its distinct-term slice boundaries
        starts = np.searchsorted(urow, np.arange(t.num_rows))
        ends = np.searchsorted(urow, np.arange(t.num_rows) + 1)
        rows = np.fromiter((row_of[d] for d in doc), np.int64, len(doc))
        counts = ends[rows] - starts[rows]
        qrep = np.repeat(qid, counts)
        take = np.concatenate([np.arange(starts[r], ends[r]) for r in rows]) \
            if counts.sum() else np.empty(0, np.int64)
        terms = de.dictionary.take(pa.array(ucode[take])).cast(pa.string())
        return pa.table({"query_id": pa.array(qrep, pa.int64()),
                         "term": terms,
                         "n": pa.array(np.ones(len(qrep), np.int64))})


def significant_terms_documents(sf_dir: str, k: int = 10) -> pa.Table:
    """Significant-terms aggregation (the Elasticsearch shape): per
    query, the terms most over-represented in the match set vs the
    whole corpus, scored by integer-exact lift
    ``(fg_df * n_docs * 1e6) // (bg_df * n_matches)`` — pure integer
    arithmetic, so engine and oracle agree bit-for-bit with no float
    quantization argument. Output (query_id, term_rank, term, fg_df,
    bg_df, lift_q6). Match sets stream through a distributed term-count
    stage; only the vocabulary-bounded (query, term) partials reach the
    driver for the final rank."""
    import pandas as pd

    from bge_m3_onnx_ray.index.artifacts import ConvOffsets, IndexMeta
    from bge_m3_onnx_ray.index.facets import match_counts, matching_docs
    from bge_m3_onnx_ray.stages._groups import bucket_reduce
    key = "documents-" + os.path.basename(os.path.normpath(sf_dir))
    idx = _cached_index(documents_as_transcripts(sf_dir), key, _DOC_CFG)
    meta = IndexMeta(idx)
    corpus = os.path.join(sf_dir, "documents.parquet")

    m = matching_docs(idx, DOC_QUERIES)
    offsets = ConvOffsets.load(idx)

    def to_table_ids(t: pa.Table) -> pa.Table:
        conv, _ = offsets.doc_to_conv(t.column("doc_id").to_numpy())
        ids = pd.Series(conv).str.slice(4).astype(np.int64)
        return pa.table({"query_id": t.column("query_id"),
                         "doc_id": pa.array(ids.to_numpy(), pa.int64())})

    mt = m.map_batches(to_table_ids, batch_format="pyarrow")
    # Per-query match-set sizes come from the distributed per-shard
    # candidate counter (index/facets.py match_counts) — one small
    # (query_id, n_matches) table reaches the driver, never the full
    # O(corpus) (query_id, doc_id) match set.
    nm = match_counts(idx, DOC_QUERIES).to_pandas()
    n_matches = dict(zip(nm["query_id"].astype(int),
                         nm["n_matches"].astype(int)))
    fg = bucket_reduce(
        mt.map_batches(_FgTermCounts,
                       fn_constructor_kwargs={"corpus_path": corpus},
                       batch_format="pyarrow", concurrency=(1, 8),
                       num_cpus=1, batch_size=8192),
        ["query_id", "term"], [("n", "sum", "fg_df")]).to_pandas()
    dfs = meta.load_term_dfs(sorted(fg["term"].unique()))
    fg["bg_df"] = fg["term"].map(dfs).astype(np.int64)
    fg["nm"] = fg["query_id"].map(n_matches).astype(np.int64)
    fg["lift_q6"] = (fg["fg_df"] * meta.n_docs * 1_000_000) \
        // (fg["bg_df"] * fg["nm"])
    fg = fg.sort_values(["query_id", "lift_q6", "term"],
                        ascending=[True, False, True]).reset_index(drop=True)
    fg["term_rank"] = fg.groupby("query_id").cumcount().astype(np.int32) + 1
    fg = fg[fg["term_rank"] <= k]
    return pa.Table.from_pandas(
        fg[["query_id", "term_rank", "term", "fg_df", "bg_df", "lift_q6"]],
        preserve_index=False)


def bm25_documents_topk_search_after(sf_dir: str, k: int = 10) -> pa.Table:
    """Cursor (search_after) deep pagination: page 1's last (score,
    docID) per query becomes the cursor, and page 2 is fetched with a
    strictly-after filter applied BEFORE the top-k cut — no offset+k
    over-fetch, the Elasticsearch search_after shape. Must equal the
    offset-pagination oracle rows (global ranks 11..20) exactly."""
    key = "documents-" + os.path.basename(os.path.normpath(sf_dir))
    idx = _cached_index(documents_as_transcripts(sf_dir), key, _DOC_CFG)
    p1 = search(idx, DOC_QUERIES,
                QueryConfig(k=k, method="exhaustive")).to_pandas()
    cursors = {}
    for qid, g in p1.groupby("query_id"):
        g = g.sort_values("rank")
        if len(g) == k:            # a shorter page 1 has no page 2
            last = g.iloc[-1]
            cursors[int(qid)] = (float(last.score), int(last.doc_id))
    qs = [(q, t) for q, t in DOC_QUERIES if q in cursors]
    out = search(idx, qs, QueryConfig(k=k, method="exhaustive"),
                 search_after=cursors).to_pandas()
    out["rank"] = out["rank"].astype(np.int32) + k      # global ranks
    out["doc_id"] = out["conv_id"].str.slice(4).astype(np.int64)
    out["score_q6"] = np.floor(out["score"].to_numpy() * 1e6).astype(np.int64)
    out = out.sort_values(["query_id", "rank"]).reset_index(drop=True)
    return pa.Table.from_pandas(out[["query_id", "rank", "doc_id", "score_q6"]],
                                preserve_index=False)


def match_counts_documents(sf_dir: str) -> pa.Table:
    """Total-hit counts per reference query (track_total_hits): exact
    live-doc match counts from per-shard candidate sets — no scoring,
    no top-k. Output (query_id, n_matches)."""
    from bge_m3_onnx_ray.index.facets import match_counts
    key = "documents-" + os.path.basename(os.path.normpath(sf_dir))
    idx = _cached_index(documents_as_transcripts(sf_dir), key, _DOC_CFG)
    out = match_counts(idx, DOC_QUERIES).to_pandas() \
        .sort_values("query_id").reset_index(drop=True)
    return pa.Table.from_pandas(out[["query_id", "n_matches"]],
                                preserve_index=False)


# Stemmed-analyzer queries: inflected forms that must match the
# decorated corpus (and each other) only through the stemmer.
DOC_STEM_QUERIES: list[tuple[int, str]] = [
    (0, "sorts join"),          # sorts→sort: hits originals + decoration
    (1, "merging batch"),       # merging→merg: hits only 'merged' docs
    (2, "filtered scans"),
    (3, "queries data"),        # queries→queri (sequential-rule artifact)
]

_DOC_STEM_CFG = IndexConfig(docs_per_shard=4096, term_buckets=8,
                            block_size=128, tokenizer_spec="stem_en")


def _documents_inflected(sf_dir: str) -> rd.Dataset:
    """Documents corpus deterministically decorated with inflected
    word forms (the sandbox text has none), mirrored by a CASE in the
    SQL oracle — makes the stemming gate non-vacuous."""
    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"])

    def decorate(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        texts = t.column("text").to_pylist()
        out = []
        for i, x in zip(ids, texts):
            m = i % 5
            if m == 1:
                x = f"{x} sorting joins"
            elif m == 2:
                x = f"{x} merged batches"
            elif m == 3:
                x = f"{x} filtering scanned"
            out.append(x)
        return pa.table({"doc_id": t.column("doc_id"),
                         "text": pa.array(out, pa.string())})

    return ds.map_batches(decorate, batch_format="pyarrow") \
        .map_batches(_doc_rows_to_transcript, batch_format="pyarrow")


def bm25_documents_topk_stemmed(sf_dir: str, k: int = 10) -> pa.Table:
    """Stemmed-analyzer retrieval: the index is built with the
    ``stem_en`` analyzer chain (tokenize → suffix-strip, recorded in
    the config fingerprint and stats.json), so query tokens stem
    automatically at search time and inflected query forms match
    inflected document forms. Same shape/oracle conventions as
    :func:`bm25_documents_topk`; the DuckDB oracle stems with the
    identical RE2 rules via nested regexp_replace."""
    key = "documents-stem-" + os.path.basename(os.path.normpath(sf_dir))
    idx = _cached_index(_documents_inflected(sf_dir), key, _DOC_STEM_CFG)
    out = search(idx, DOC_STEM_QUERIES,
                 QueryConfig(k=k, method="wand")).to_pandas()
    out["doc_id"] = out["conv_id"].str.slice(4).astype(np.int64)
    out["score_q6"] = np.floor(out["score"].to_numpy() * 1e6).astype(np.int64)
    out = out.sort_values(["query_id", "rank"]).reset_index(drop=True)
    return pa.Table.from_pandas(out[["query_id", "rank", "doc_id", "score_q6"]],
                                preserve_index=False)


# Stopword-analyzer queries: stopwords in the query are dropped by the
# same chain that dropped them at index time; an all-stopword query
# matches nothing.
DOC_STOP_QUERIES: list[tuple[int, str]] = [
    (0, "the key order"),
    (1, "a data stream"),
    (2, "the a of"),            # all stopwords: zero rows
    (3, "table and value"),
]

_DOC_STOP_CFG = IndexConfig(docs_per_shard=4096, term_buckets=8,
                            block_size=128, tokenizer_spec="stop_en")


def bm25_documents_topk_stopworded(sf_dir: str, k: int = 10) -> pa.Table:
    """Stopword-filtered retrieval: the ``stop_en`` analyzer drops the
    shared English stop list at index AND query time, so doc lengths,
    avgdl and df all reflect the filtered stream (the corpus text
    contains 'the'/'a', making the gate non-vacuous). Same
    shape/oracle conventions as :func:`bm25_documents_topk`."""
    key = "documents-stop-" + os.path.basename(os.path.normpath(sf_dir))
    idx = _cached_index(documents_as_transcripts(sf_dir), key,
                        _DOC_STOP_CFG)
    out = search(idx, DOC_STOP_QUERIES,
                 QueryConfig(k=k, method="wand")).to_pandas()
    out["doc_id"] = out["conv_id"].str.slice(4).astype(np.int64)
    out["score_q6"] = np.floor(out["score"].to_numpy() * 1e6).astype(np.int64)
    out = out.sort_values(["query_id", "rank"]).reset_index(drop=True)
    return pa.Table.from_pandas(out[["query_id", "rank", "doc_id", "score_q6"]],
                                preserve_index=False)


# N-term ordered span queries: (query_id, text, slop) — tokens must
# appear in order with every consecutive gap <= slop; a 3-term chain,
# a wider-slop 3-term chain, a 2-term sanity case, and an OOV no-op.
DOC_SPAN_QUERIES: list[tuple[int, str, int]] = [
    (0, "key value table", 3),
    (1, "fast row merge", 4),
    (2, "slow fast", 2),
    (3, "data zzzneverseen part", 3),    # OOV middle term: zero rows
]


def span_near_documents_topk(sf_dir: str, k: int = 10) -> pa.Table:
    """N-term ordered span retrieval (Lucene SpanNearQuery inOrder
    beyond two terms): tf counts position chains p1 < ... < pn with
    every gap <= slop, scored by BM25 — the chain count is exactly
    what the oracle's chained windowed self-join counts. Same
    shape/oracle conventions as :func:`near_documents_topk`."""
    from bge_m3_onnx_ray.index.positions import (build_positions,
                                                 span_near_search)
    key = "documents-" + os.path.basename(os.path.normpath(sf_dir))
    idx = _cached_index(documents_as_transcripts(sf_dir), key, _DOC_CFG)
    build_positions(documents_as_transcripts(sf_dir), idx)
    out = span_near_search(idx, DOC_SPAN_QUERIES, k).to_pandas()
    if not len(out):
        import pandas as pd
        out = pd.DataFrame({"query_id": pd.Series([], dtype=np.int64),
                            "rank": pd.Series([], dtype=np.int32),
                            "doc_id": pd.Series([], dtype=np.int64),
                            "tf": pd.Series([], dtype=np.int64),
                            "score_q6": pd.Series([], dtype=np.int64)})
        return pa.Table.from_pandas(out, preserve_index=False)
    out["doc_id"] = out["conv_id"].str.slice(4).astype(np.int64)
    out["score_q6"] = np.floor(out["score"].to_numpy() * 1e6).astype(np.int64)
    out = out.sort_values(["query_id", "rank"]).reset_index(drop=True)
    return pa.Table.from_pandas(
        out[["query_id", "rank", "doc_id", "tf", "score_q6"]],
        preserve_index=False)


# Index-time synonym queries: a canonical-form query, a source-form
# query (normalizes at query time through the same analyzer), a second
# class, and an unmapped plain query.
DOC_SYNIDX_QUERIES: list[tuple[int, str]] = [
    (0, "merge row"),       # canonical: matches docs with join/group/merge
    (1, "join value"),      # source form: query normalizes join -> merge
    (2, "scan table"),      # scan -> query class
    (3, "data stream"),     # no mapped words: plain BM25
]

_DOC_SYNIDX_CFG = IndexConfig(docs_per_shard=4096, term_buckets=8,
                              block_size=128, tokenizer_spec="syn_en")


def bm25_documents_topk_synindexed(sf_dir: str, k: int = 10) -> pa.Table:
    """INDEX-TIME synonym retrieval (the counterpart of the query-time
    ``bm25_documents_topk_synonyms``): the ``syn_en`` analyzer
    normalizes every synonym-class member to its canonical form at
    index AND query time (Lucene replace-mode SynonymFilter), so df,
    tf and dl reflect the merged classes and any class member matches
    documents containing any other member. Same shape/oracle
    conventions as :func:`bm25_documents_topk`; the DuckDB oracle
    applies the identical mapping as a word-boundary regexp_replace
    chain over the corpus and normalizes query tokens through the
    engine's own tokenizer."""
    key = "documents-synidx-" + os.path.basename(os.path.normpath(sf_dir))
    idx = _cached_index(documents_as_transcripts(sf_dir), key,
                        _DOC_SYNIDX_CFG)
    out = search(idx, DOC_SYNIDX_QUERIES,
                 QueryConfig(k=k, method="wand")).to_pandas()
    out["doc_id"] = out["conv_id"].str.slice(4).astype(np.int64)
    out["score_q6"] = np.floor(out["score"].to_numpy() * 1e6).astype(np.int64)
    out = out.sort_values(["query_id", "rank"]).reset_index(drop=True)
    return pa.Table.from_pandas(out[["query_id", "rank", "doc_id", "score_q6"]],
                                preserve_index=False)


# Substring (grep-style contains) patterns: cross-token spans the
# inverted index cannot answer, a within-token infix, and a no-match.
DOC_SUBSTRINGS: list[tuple[int, str]] = [
    (0, "er sort"),         # crosses a token boundary (…er + sort)
    (1, "data bat"),        # crosses into a token prefix
    (2, "stream merge"),    # two whole tokens incl. the space
    (3, "tab"),             # within-token infix
    (4, "zzzq"),            # matches nothing
]


def substring_documents(sf_dir: str) -> pa.Table:
    """Grep at scale: documents whose raw lowercased text CONTAINS each
    pattern — answered from the trigram index (candidate intersection)
    + exact distributed verification, never a full-corpus scan per
    query. Output (pattern_id, doc_id); oracle: LIKE on the text."""
    from bge_m3_onnx_ray.index.trigram import (build_trigram_index,
                                               substring_search)
    base = os.path.basename(os.path.normpath(sf_dir))
    corpus = os.path.join(sf_dir, "documents.parquet")
    tri_dir = os.path.join("/tmp/bm25_indexes", f"trigram-{base}")
    build_trigram_index(
        rd.read_parquet(corpus, columns=["doc_id", "text"]), tri_dir)
    out = substring_search(tri_dir, corpus, DOC_SUBSTRINGS).to_pandas() \
        .sort_values(["pattern_id", "doc_id"]).reset_index(drop=True)
    return pa.Table.from_pandas(out[["pattern_id", "doc_id"]],
                                preserve_index=False)


def _documents_half(sf_dir: str, parity: int) -> rd.Dataset:
    """Even / odd doc_id half of the documents corpus, as transcripts —
    the two federation members whose union is the whole corpus."""
    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"])

    def pick(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        return t.filter(pa.array(ids % 2 == parity))

    return ds.map_batches(pick, batch_format="pyarrow") \
        .map_batches(_doc_rows_to_transcript, batch_format="pyarrow")


def bm25_documents_federated_topk(sf_dir: str, k: int = 10) -> pa.Table:
    """Federated search over TWO half-corpus indexes (even / odd
    doc_ids) with merged global stats — scores and ranks must equal the
    single whole-corpus index, so the oracle is the unchanged standard
    BM25 SQL. Output (query_id, rank, doc_id, score_q6)."""
    from bge_m3_onnx_ray.index.federate import search_federated
    base = os.path.basename(os.path.normpath(sf_dir))
    idxs = [_cached_index(_documents_half(sf_dir, p),
                          f"documents-h{p}-{base}", _DOC_CFG)
            for p in (0, 1)]
    out = search_federated(idxs, DOC_QUERIES,
                           QueryConfig(k=k)).to_pandas()
    out["doc_id"] = out["conv_id"].str.slice(4).astype(np.int64)
    out["score_q6"] = np.floor(out["score"].to_numpy() * 1e6).astype(np.int64)
    out = out.sort_values(["query_id", "rank"]).reset_index(drop=True)
    return pa.Table.from_pandas(out[["query_id", "rank", "doc_id", "score_q6"]],
                                preserve_index=False)


# More-like-this source documents (Lucene MoreLikeThisQuery): fixed
# doc_ids present at every scale factor (all sfs carry 500 documents).
MLT_SOURCE_DOCS: list[int] = [0, 7, 42, 99, 123]


def more_like_this_documents(sf_dir: str, k: int = 10,
                             n_terms: int = 5) -> pa.Table:
    """Find documents similar to each source doc: the source's terms are
    ranked by quantized tf·idf (floor(tf*idf*1e6) desc, term asc — the
    cross-engine-stable selection), the top ``n_terms`` become a
    disjunctive BM25 query, and the source itself is excluded from the
    results. Output (query_id=source doc_id, rank, doc_id, score_q6)."""
    import pyarrow.dataset as pads

    from bge_m3_onnx_ray.index.artifacts import IndexMeta
    from bge_m3_onnx_ray.scoring import idf
    from bge_m3_onnx_ray.tokenizer import tokenize
    key = "documents-" + os.path.basename(os.path.normpath(sf_dir))
    idx = _cached_index(documents_as_transcripts(sf_dir), key, _DOC_CFG)
    meta = IndexMeta(idx)

    import pyarrow.compute as pc
    src = pads.dataset(os.path.join(sf_dir, "documents.parquet")) \
        .to_table(filter=pc.field("doc_id").isin(MLT_SOURCE_DOCS),
                  columns=["doc_id", "text"])
    tfs: dict[int, dict[str, int]] = {}
    for did, text in zip(src.column("doc_id").to_pylist(),
                         src.column("text").to_pylist()):
        c: dict[str, int] = {}
        for t in tokenize(text or ""):
            c[t] = c.get(t, 0) + 1
        tfs[int(did)] = c
    all_terms = sorted({t for c in tfs.values() for t in c})
    dfs = meta.load_term_dfs(all_terms)
    queries = []
    for did in MLT_SOURCE_DOCS:
        scored = [(-(int(np.floor(tf * idf(dfs[t], meta.n_docs) * 1e6))), t)
                  for t, tf in tfs.get(did, {}).items() if t in dfs]
        top = [t for _, t in sorted(scored)[:n_terms]]
        if top:
            queries.append((did, " ".join(top)))
    out = search(idx, queries, QueryConfig(k=k + 1)).to_pandas()
    out["doc_id"] = out["conv_id"].str.slice(4).astype(np.int64)
    out = out[out["doc_id"] != out["query_id"]]
    out = out.sort_values(["query_id", "rank"]).reset_index(drop=True)
    out["rank"] = out.groupby("query_id").cumcount().astype(np.int32) + 1
    out = out[out["rank"] <= k]
    out["score_q6"] = np.floor(out["score"].to_numpy() * 1e6).astype(np.int64)
    return pa.Table.from_pandas(out[["query_id", "rank", "doc_id", "score_q6"]],
                                preserve_index=False)


def bm25_documents_explain(sf_dir: str, k: int = 3) -> pa.Table:
    """Per-term score breakdown (Lucene explain) for each DOC_QUERIES
    query's top-``k`` docs: (query_id, doc_id, term, tf, df,
    contrib_q6). Contributions come from the scorers' own
    ``bm25_term_score``, so they sum to the ranked score exactly; the
    DuckDB oracle recomputes the identical expression with the same
    operand association."""
    import pandas as pd

    from bge_m3_onnx_ray.index.artifacts import ConvOffsets
    from bge_m3_onnx_ray.index.explain import explain_topk
    key = "documents-" + os.path.basename(os.path.normpath(sf_dir))
    idx = _cached_index(documents_as_transcripts(sf_dir), key, _DOC_CFG)
    out = explain_topk(idx, DOC_QUERIES, k=k).to_pandas()
    conv, _ = ConvOffsets.load(idx).doc_to_conv(out["doc_id"].to_numpy())
    out["doc_id"] = pd.Series(conv).str.slice(4).astype(np.int64)
    out = out.sort_values(["query_id", "doc_id", "term"]) \
        .reset_index(drop=True)
    return pa.Table.from_pandas(
        out[["query_id", "doc_id", "term", "tf", "df", "contrib_q6"]],
        preserve_index=False)


def bm25_documents_topk_fuzzy(sf_dir: str, k: int = 10) -> pa.Table:
    """Typo-tolerant retrieval: each query token expands to the
    dictionary terms within Levenshtein distance 1
    (``IndexMeta.expand_fuzzy``), ranked by the standard disjunctive
    BM25 over the union of expansions. Same shape/oracle conventions as
    :func:`bm25_documents_topk`; the DuckDB oracle mirrors the expansion
    with ``levenshtein(word, term) <= 1`` against the corpus-derived
    dictionary."""
    key = "documents-" + os.path.basename(os.path.normpath(sf_dir))
    idx = _cached_index(documents_as_transcripts(sf_dir), key, _DOC_CFG)
    out = search(idx, DOC_FUZZY_QUERIES,
                 QueryConfig(k=k, method="wand",
                             parse_fuzzy=True)).to_pandas()
    out["doc_id"] = out["conv_id"].str.slice(4).astype(np.int64)
    out["score_q6"] = np.floor(out["score"].to_numpy() * 1e6).astype(np.int64)
    out = out.sort_values(["query_id", "rank"]).reset_index(drop=True)
    return pa.Table.from_pandas(out[["query_id", "rank", "doc_id", "score_q6"]],
                                preserve_index=False)


def bm25_documents_topk_boosted(sf_dir: str, k: int = 10) -> pa.Table:
    """Query-time term boosting: "word^2.5" multiplies the idf of every
    term the word contributes (MAX boost per term across words), ranked
    by the boosted disjunctive BM25 — exact under WAND because block
    upper bounds are linear in idf. Same shape/oracle conventions as
    :func:`bm25_documents_topk`; the DuckDB oracle carries a per-term
    boost column parsed by the same rule."""
    key = "documents-" + os.path.basename(os.path.normpath(sf_dir))
    idx = _cached_index(documents_as_transcripts(sf_dir), key, _DOC_CFG)
    out = search(idx, DOC_BOOST_QUERIES,
                 QueryConfig(k=k, method="wand",
                             parse_boost=True)).to_pandas()
    out["doc_id"] = out["conv_id"].str.slice(4).astype(np.int64)
    out["score_q6"] = np.floor(out["score"].to_numpy() * 1e6).astype(np.int64)
    out = out.sort_values(["query_id", "rank"]).reset_index(drop=True)
    return pa.Table.from_pandas(out[["query_id", "rank", "doc_id", "score_q6"]],
                                preserve_index=False)


def _ensure_nchars_attrs(sf_dir: str, idx: str) -> None:
    from bge_m3_onnx_ray.index.attrs import build_doc_attrs, has_doc_attrs
    if has_doc_attrs(idx, "n_chars"):
        return
    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "n_chars"])

    def to_keyed(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        return pa.table({
            "conv_id": pa.array([f"doc-{i:08d}" for i in ids], pa.string()),
            "turn_idx": pa.array(np.zeros(len(ids), np.int32), pa.int32()),
            "n_chars": t.column("n_chars"),
        })

    build_doc_attrs(ds.map_batches(to_keyed, batch_format="pyarrow"),
                    idx, "n_chars")


def matches_by_length_topk(sf_dir: str, k: int = 10) -> pa.Table:
    """Sort-by-field retrieval (the Elasticsearch ``sort`` clause): for
    each query, the top-k MATCHING documents ordered by n_chars desc
    (doc_id tie-break) instead of relevance — "longest matches first".
    Output (query_id, rank, doc_id, sort_value); integers end to end, so
    the oracle gate is exact with no score quantization."""
    from bge_m3_onnx_ray.index.facets import sort_by_attr
    key = "documents-" + os.path.basename(os.path.normpath(sf_dir))
    idx = _cached_index(documents_as_transcripts(sf_dir), key, _DOC_CFG)
    _ensure_nchars_attrs(sf_dir, idx)
    out = sort_by_attr(idx, DOC_QUERIES, "n_chars", k=k).to_pandas()
    out = out.sort_values(["query_id", "rank"]).reset_index(drop=True)
    return pa.Table.from_pandas(
        out[["query_id", "rank", "doc_id", "sort_value"]],
        preserve_index=False)


def bm25_documents_topk_synonyms(sf_dir: str, k: int = 10) -> pa.Table:
    """Query-time synonym expansion: each query term with a
    ``DOC_SYNONYMS`` entry expands one hop to itself plus its synonyms,
    ranked by plain disjunctive BM25 over the union (the Elasticsearch
    query-time synonym filter shape — the index is untouched). Same
    shape/oracle conventions as :func:`bm25_documents_topk`; the DuckDB
    oracle expands its qterms VALUES with the same map."""
    key = "documents-" + os.path.basename(os.path.normpath(sf_dir))
    idx = _cached_index(documents_as_transcripts(sf_dir), key, _DOC_CFG)
    out = search(idx, DOC_SYN_QUERIES,
                 QueryConfig(k=k, method="wand",
                             synonyms=DOC_SYNONYMS)).to_pandas()
    out["doc_id"] = out["conv_id"].str.slice(4).astype(np.int64)
    out["score_q6"] = np.floor(out["score"].to_numpy() * 1e6).astype(np.int64)
    out = out.sort_values(["query_id", "rank"]).reset_index(drop=True)
    return pa.Table.from_pandas(out[["query_id", "rank", "doc_id", "score_q6"]],
                                preserve_index=False)


def bm25_documents_topk_quoted(sf_dir: str, k: int = 10) -> pa.Table:
    """Mixed quoted-phrase retrieval: quoted spans filter candidates
    (consecutive-token match via the positional artifact), BM25 ranks
    over all terms. Same shape/oracle conventions as
    :func:`bm25_documents_topk`."""
    from bge_m3_onnx_ray.index.positions import build_positions, search_quoted
    key = "documents-" + os.path.basename(os.path.normpath(sf_dir))
    idx = _cached_index(documents_as_transcripts(sf_dir), key, _DOC_CFG)
    build_positions(documents_as_transcripts(sf_dir), idx)
    out = search_quoted(idx, DOC_QUOTED_QUERIES,
                        QueryConfig(k=k, method="wand")).to_pandas()
    out["doc_id"] = out["conv_id"].str.slice(4).astype(np.int64)
    out["score_q6"] = np.floor(out["score"].to_numpy() * 1e6).astype(np.int64)
    out = out.sort_values(["query_id", "rank"]).reset_index(drop=True)
    return pa.Table.from_pandas(out[["query_id", "rank", "doc_id", "score_q6"]],
                                preserve_index=False)


def near_documents_topk(sf_dir: str, k: int = 10) -> pa.Table:
    """Proximity (NEAR) top-k over the documents corpus: tf = ordered
    position pairs of the two terms within the slop window (i != j),
    scored by BM25 over the pair count. Output (query_id, rank, doc_id,
    tf, score_q6) — hash-matches the windowed self-join DuckDB oracle."""
    from bge_m3_onnx_ray.index.positions import build_positions, near_search
    key = "documents-" + os.path.basename(os.path.normpath(sf_dir))
    idx = _cached_index(documents_as_transcripts(sf_dir), key, _DOC_CFG)
    build_positions(documents_as_transcripts(sf_dir), idx)
    out = near_search(idx, DOC_NEAR_QUERIES, k).to_pandas()
    if not len(out):
        import pandas as pd
        out = pd.DataFrame({"query_id": pd.Series([], dtype=np.int64),
                            "rank": pd.Series([], dtype=np.int32),
                            "doc_id": pd.Series([], dtype=np.int64),
                            "tf": pd.Series([], dtype=np.int64),
                            "score_q6": pd.Series([], dtype=np.int64)})
        return pa.Table.from_pandas(out, preserve_index=False)
    out["doc_id"] = out["conv_id"].str.slice(4).astype(np.int64)
    out["score_q6"] = np.floor(out["score"].to_numpy() * 1e6).astype(np.int64)
    out = out.sort_values(["query_id", "rank"]).reset_index(drop=True)
    return pa.Table.from_pandas(
        out[["query_id", "rank", "doc_id", "tf", "score_q6"]],
        preserve_index=False)


def near_ordered_documents_topk(sf_dir: str, k: int = 10) -> pa.Table:
    """Ordered-proximity (SpanNear inOrder) top-k over the documents
    corpus: tf = position pairs where term_a strictly PRECEDES term_b
    within the slop window (0 < j - i <= slop), scored by BM25 over the
    pair count. Same query set and conventions as
    :func:`near_documents_topk`; hash-matches the directional windowed
    self-join DuckDB oracle."""
    from bge_m3_onnx_ray.index.positions import build_positions, near_search
    key = "documents-" + os.path.basename(os.path.normpath(sf_dir))
    idx = _cached_index(documents_as_transcripts(sf_dir), key, _DOC_CFG)
    build_positions(documents_as_transcripts(sf_dir), idx)
    out = near_search(idx, DOC_NEAR_QUERIES, k, in_order=True).to_pandas()
    if not len(out):
        import pandas as pd
        out = pd.DataFrame({"query_id": pd.Series([], dtype=np.int64),
                            "rank": pd.Series([], dtype=np.int32),
                            "doc_id": pd.Series([], dtype=np.int64),
                            "tf": pd.Series([], dtype=np.int64),
                            "score_q6": pd.Series([], dtype=np.int64)})
        return pa.Table.from_pandas(out, preserve_index=False)
    out["doc_id"] = out["conv_id"].str.slice(4).astype(np.int64)
    out["score_q6"] = np.floor(out["score"].to_numpy() * 1e6).astype(np.int64)
    out = out.sort_values(["query_id", "rank"]).reset_index(drop=True)
    return pa.Table.from_pandas(
        out[["query_id", "rank", "doc_id", "tf", "score_q6"]],
        preserve_index=False)


def bm25_documents_topk_not(sf_dir: str, k: int = 10) -> pa.Table:
    """Negated-term retrieval: "-word" tokens exclude documents
    containing that term (candidate filter before top-k, scores are the
    unchanged BM25 sums over the positive terms). Same shape/oracle
    conventions as :func:`bm25_documents_topk`."""
    key = "documents-" + os.path.basename(os.path.normpath(sf_dir))
    idx = _cached_index(documents_as_transcripts(sf_dir), key, _DOC_CFG)
    out = search(idx, DOC_NOT_QUERIES,
                 QueryConfig(k=k, method="wand",
                             parse_negation=True)).to_pandas()
    out["doc_id"] = out["conv_id"].str.slice(4).astype(np.int64)
    out["score_q6"] = np.floor(out["score"].to_numpy() * 1e6).astype(np.int64)
    out = out.sort_values(["query_id", "rank"]).reset_index(drop=True)
    return pa.Table.from_pandas(out[["query_id", "rank", "doc_id", "score_q6"]],
                                preserve_index=False)


def bm25_documents_topk_msm(sf_dir: str, k: int = 10, m: int = 2) -> pa.Table:
    """Minimum-should-match retrieval (Lucene ``minimum_should_match``):
    a candidate must contain at least ``m`` DISTINCT query terms; scores
    stay the same disjunctive BM25 sums. Single-term and all-OOV queries
    (DOC_QUERIES 3/5/6) return nothing at m=2 on both sides. Same
    shape/oracle conventions as :func:`bm25_documents_topk`."""
    key = "documents-" + os.path.basename(os.path.normpath(sf_dir))
    idx = _cached_index(documents_as_transcripts(sf_dir), key, _DOC_CFG)
    out = search(idx, DOC_QUERIES,
                 QueryConfig(k=k, method="wand",
                             min_should_match=m)).to_pandas()
    out["doc_id"] = out["conv_id"].str.slice(4).astype(np.int64)
    out["score_q6"] = np.floor(out["score"].to_numpy() * 1e6).astype(np.int64)
    out = out.sort_values(["query_id", "rank"]).reset_index(drop=True)
    return pa.Table.from_pandas(out[["query_id", "rank", "doc_id", "score_q6"]],
                                preserve_index=False)


def bm25_documents_topk_page2(sf_dir: str, k: int = 10,
                              offset: int = 10) -> pa.Table:
    """Paginated retrieval: ranks offset+1 .. offset+k (the second page
    of the plain top-k). Ranks are GLOBAL under the deterministic
    (score desc, doc_id asc) ordering, so this page is exactly rows
    11..20 of a k=20 run — which is what the oracle checks. Queries with
    fewer than offset matches (DOC_QUERIES[5] OOV, short expansions)
    return nothing."""
    key = "documents-" + os.path.basename(os.path.normpath(sf_dir))
    idx = _cached_index(documents_as_transcripts(sf_dir), key, _DOC_CFG)
    out = search(idx, DOC_QUERIES,
                 QueryConfig(k=k, method="wand", offset=offset)).to_pandas()
    out["doc_id"] = out["conv_id"].str.slice(4).astype(np.int64)
    out["score_q6"] = np.floor(out["score"].to_numpy() * 1e6).astype(np.int64)
    out = out.sort_values(["query_id", "rank"]).reset_index(drop=True)
    return pa.Table.from_pandas(out[["query_id", "rank", "doc_id", "score_q6"]],
                                preserve_index=False)


def bm25_documents_topk_range(sf_dir: str, k: int = 10,
                              lo: int = 150, hi: int = 350) -> pa.Table:
    """Numeric-range faceted retrieval: candidates restricted to docs
    with ``lo <= n_chars <= hi`` (SQL BETWEEN, inclusive) via the typed
    attrs side table's predicate-pushdown range mask
    (``index/attrs.load_allowed_docs_range``); global stats stay
    corpus-wide, scores are unchanged BM25 sums. Same shape/oracle
    conventions as :func:`bm25_documents_topk`."""
    key = "documents-" + os.path.basename(os.path.normpath(sf_dir))
    idx = _cached_index(documents_as_transcripts(sf_dir), key, _DOC_CFG)
    _ensure_nchars_attrs(sf_dir, idx)
    out = search(idx, DOC_QUERIES,
                 QueryConfig(k=k, method="wand",
                             filter_range=("n_chars", lo, hi))).to_pandas()
    out["doc_id"] = out["conv_id"].str.slice(4).astype(np.int64)
    out["score_q6"] = np.floor(out["score"].to_numpy() * 1e6).astype(np.int64)
    out = out.sort_values(["query_id", "rank"]).reset_index(drop=True)
    return pa.Table.from_pandas(out[["query_id", "rank", "doc_id", "score_q6"]],
                                preserve_index=False)


def facet_counts_lang(sf_dir: str) -> pa.Table:
    """Search aggregations (Elasticsearch terms-aggs shape): for each
    DOC_QUERIES query, the number of matching documents per ``lang``
    value over the FULL match set (OR semantics — any query term), not
    just the top-k. Output (query_id, value, n_docs); all-OOV queries
    contribute no rows on either side."""
    from bge_m3_onnx_ray.index.attrs import build_doc_attrs, has_doc_attrs
    from bge_m3_onnx_ray.index.facets import facet_counts
    key = "documents-" + os.path.basename(os.path.normpath(sf_dir))
    idx = _cached_index(documents_as_transcripts(sf_dir), key, _DOC_CFG)
    if not has_doc_attrs(idx, "lang"):
        ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                             columns=["doc_id", "lang"])

        def to_keyed(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_numpy()
            return pa.table({
                "conv_id": pa.array([f"doc-{i:08d}" for i in ids], pa.string()),
                "turn_idx": pa.array(np.zeros(len(ids), np.int32), pa.int32()),
                "lang": t.column("lang"),
            })

        build_doc_attrs(ds.map_batches(to_keyed, batch_format="pyarrow"),
                        idx, "lang")
    out = facet_counts(idx, DOC_QUERIES, "lang").to_pandas()
    out = out.sort_values(["query_id", "value"]).reset_index(drop=True)
    return pa.Table.from_pandas(out[["query_id", "value", "n_docs"]],
                                preserve_index=False)


def bm25_documents_snippets(sf_dir: str, k: int = 10) -> pa.Table:
    """Top-k BM25 results with snippet/highlight columns: 0-based
    ``first_hit`` (earliest query-term token position), ``n_hits``
    (token positions matching any query term), and ``snippet`` (the
    space-joined token window around the first hit) — token-level and
    deterministic, so the DuckDB oracle mirrors it exactly."""
    from bge_m3_onnx_ray.index.snippets import attach_snippets
    from bge_m3_onnx_ray.tokenizer import tokenize
    key = "documents-" + os.path.basename(os.path.normpath(sf_dir))
    idx = _cached_index(documents_as_transcripts(sf_dir), key, _DOC_CFG)
    res = search(idx, DOC_QUERIES, QueryConfig(k=k, method="wand"))
    tbl = pa.Table.from_pandas(res.to_pandas(), preserve_index=False)
    qterms = {qid: sorted(set(tokenize(text))) for qid, text in DOC_QUERIES}
    out = attach_snippets(tbl, documents_as_transcripts(sf_dir),
                          qterms).to_pandas()
    out["doc_id"] = out["conv_id"].str.slice(4).astype(np.int64)
    out = out.sort_values(["query_id", "rank"]).reset_index(drop=True)
    return pa.Table.from_pandas(
        out[["query_id", "rank", "doc_id", "first_hit", "n_hits", "snippet"]],
        preserve_index=False)


def phrase_documents_topk(sf_dir: str, k: int = 10) -> pa.Table:
    """Exact-phrase top-k over the documents corpus via the positional
    index (``index.positions``): consecutive-token match, BM25 over the
    phrase frequency, ranked (floor(score*1e6) desc, doc_id). Output
    (query_id, rank, doc_id, tf, score_q6) — hash-matches the DuckDB
    chained-self-join oracle."""
    from bge_m3_onnx_ray.index.positions import build_positions, phrase_search
    key = "documents-" + os.path.basename(os.path.normpath(sf_dir))
    idx = _cached_index(documents_as_transcripts(sf_dir), key, _DOC_CFG)
    build_positions(documents_as_transcripts(sf_dir), idx)  # no-op if built
    out = phrase_search(idx, DOC_PHRASES, k).to_pandas()
    if not len(out):
        import pandas as pd
        out = pd.DataFrame({"query_id": pd.Series([], dtype=np.int64),
                            "rank": pd.Series([], dtype=np.int32),
                            "doc_id": pd.Series([], dtype=np.int64),
                            "tf": pd.Series([], dtype=np.int64),
                            "score_q6": pd.Series([], dtype=np.int64)})
        return pa.Table.from_pandas(out, preserve_index=False)
    out["doc_id"] = out["conv_id"].str.slice(4).astype(np.int64)
    out["score_q6"] = np.floor(out["score"].to_numpy() * 1e6).astype(np.int64)
    out = out.sort_values(["query_id", "rank"]).reset_index(drop=True)
    return pa.Table.from_pandas(
        out[["query_id", "rank", "doc_id", "tf", "score_q6"]],
        preserve_index=False)


def phrase_prefix_documents_topk(sf_dir: str, k: int = 10) -> pa.Table:
    """match_phrase_prefix top-k: the query's last token is a PREFIX,
    expanded against the bucketed dictionary and matched as alternative
    last-position slots through the exact-phrase kernel. Same output
    shape and quantized-ranking conventions as
    :func:`phrase_documents_topk`; the oracle is the phrase self-join
    with its last condition as LIKE 'prefix%'."""
    from bge_m3_onnx_ray.index.positions import (build_positions,
                                                 phrase_prefix_search)
    key = "documents-" + os.path.basename(os.path.normpath(sf_dir))
    idx = _cached_index(documents_as_transcripts(sf_dir), key, _DOC_CFG)
    build_positions(documents_as_transcripts(sf_dir), idx)  # no-op if built
    out = phrase_prefix_search(idx, PHRASE_PREFIX_QUERIES, k).to_pandas()
    if not len(out):
        import pandas as pd
        out = pd.DataFrame({"query_id": pd.Series([], dtype=np.int64),
                            "rank": pd.Series([], dtype=np.int32),
                            "doc_id": pd.Series([], dtype=np.int64),
                            "tf": pd.Series([], dtype=np.int64),
                            "score_q6": pd.Series([], dtype=np.int64)})
        return pa.Table.from_pandas(out, preserve_index=False)
    out["doc_id"] = out["conv_id"].str.slice(4).astype(np.int64)
    out["score_q6"] = np.floor(out["score"].to_numpy() * 1e6).astype(np.int64)
    out = out.sort_values(["query_id", "rank"]).reset_index(drop=True)
    return pa.Table.from_pandas(
        out[["query_id", "rank", "doc_id", "tf", "score_q6"]],
        preserve_index=False)


def phrase_documents_topk_appended(sf_dir: str, k: int = 10) -> pa.Table:
    """Exact-phrase top-k over an INCREMENTALLY built index: half the
    corpus indexed fresh (postings + positions), the other half arrives
    via ``append_index`` + ``append_positions`` — gating the positional
    delta-append end-to-end against the same whole-corpus phrase
    oracle. Appended internal docIDs are not in table order, so results
    re-rank on (score_q6 desc, table doc_id) over a 3k over-fetch with
    the standard tie-width guard."""
    import pyarrow.compute as pc

    from bge_m3_onnx_ray.index.append import append_index
    from bge_m3_onnx_ray.index.artifacts import atomic_write_json
    from bge_m3_onnx_ray.index.positions import (append_positions,
                                                 build_positions,
                                                 phrase_search)
    idx = os.path.join("/tmp/bm25_indexes", "documents-appended-pos-"
                       + os.path.basename(os.path.normpath(sf_dir)))

    def _half(parity: int) -> rd.Dataset:
        ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                             columns=["doc_id", "text"])
        return ds.map_batches(
            lambda t, _p=parity: t.filter(pc.equal(
                pc.bit_wise_and(t.column("doc_id"), 1), _p)),
            batch_format="pyarrow").map_batches(
            _doc_rows_to_transcript, batch_format="pyarrow")

    if not os.path.exists(os.path.join(idx, "appended.json")):
        import shutil
        shutil.rmtree(idx, ignore_errors=True)
        build_index(_half(0), idx, _DOC_CFG)
        build_positions(_half(0), idx)
        append_index(_half(1), idx)
        append_positions(_half(1), idx)
        atomic_write_json({"appended": True},
                          os.path.join(idx, "appended.json"))
    out = phrase_search(idx, DOC_PHRASES, 3 * k).to_pandas()
    if not len(out):
        import pandas as pd
        return pa.Table.from_pandas(pd.DataFrame({
            "query_id": pd.Series([], dtype=np.int64),
            "rank": pd.Series([], dtype=np.int32),
            "doc_id": pd.Series([], dtype=np.int64),
            "tf": pd.Series([], dtype=np.int64),
            "score_q6": pd.Series([], dtype=np.int64)}),
            preserve_index=False)
    out["doc_id"] = out["conv_id"].str.slice(4).astype(np.int64)
    out["score_q6"] = np.floor(out["score"].to_numpy() * 1e6).astype(np.int64)
    out = out.sort_values(["query_id", "score_q6", "doc_id"],
                          ascending=[True, False, True]) \
        .reset_index(drop=True)
    out["rank"] = out.groupby("query_id").cumcount().astype(np.int32) + 1
    kth = out[out["rank"] == k].set_index("query_id").score_q6
    g = out.groupby("query_id")
    risky = (g.size() >= 3 * k) & (kth.reindex(g.size().index)
                                   == g.score_q6.last())
    if bool(risky.any()):
        raise RuntimeError(
            f"quantized-score tie group wider than the {3 * k}-row "
            f"over-fetch for queries {list(risky[risky].index)[:5]}")
    out = out[out["rank"] <= k]
    return pa.Table.from_pandas(
        out[["query_id", "rank", "doc_id", "tf", "score_q6"]],
        preserve_index=False)


def bm25_documents_bulk_topk(sf_dir: str, k: int = 10) -> pa.Table:
    """Same result as :func:`bm25_documents_topk` but through the
    streaming bulk path: queries enter as a ``ray.data.Dataset``, are
    tokenized inside the fan-out stage and get their global idf from the
    bucketed dictionary artifact INSIDE the scorer actors
    (``search.search_bulk``) — no per-query state on the driver. Scores
    are bit-identical to the driver-resolved path, so the same DuckDB
    oracle applies."""
    from bge_m3_onnx_ray.index.search import search_bulk
    key = "documents-" + os.path.basename(os.path.normpath(sf_dir))
    idx = _cached_index(documents_as_transcripts(sf_dir), key, _DOC_CFG)
    qds = rd.from_items([{"query_id": q, "text": t} for q, t in DOC_QUERIES])
    out = search_bulk(idx, qds, QueryConfig(k=k, method="wand")).to_pandas()
    out["doc_id"] = out["conv_id"].str.slice(4).astype(np.int64)
    out["score_q6"] = np.floor(out["score"].to_numpy() * 1e6).astype(np.int64)
    out = out.sort_values(["query_id", "rank"]).reset_index(drop=True)
    return pa.Table.from_pandas(out[["query_id", "rank", "doc_id", "score_q6"]],
                                preserve_index=False)


# Deterministic delete rule for the lifecycle gates: the synthetic
# corpus links global docID ≡ documents.doc_id (one-turn convs named
# doc-%08d sort in docID order), so the SQL oracle expresses the same
# set as doc_id % 7 = 3.
_DEL_MOD, _DEL_REM = 7, 3


def _deleted_docs_index(sf_dir: str) -> str:
    """A documents index with doc_id % 7 == 3 tombstoned — its own cache
    dir so the shared plain-documents index stays tombstone-free."""
    import json as _json

    from bge_m3_onnx_ray.index.delete import delete_docs
    key = "documents-del-" + os.path.basename(os.path.normpath(sf_dir))
    idx = _cached_index(documents_as_transcripts(sf_dir), key, _DOC_CFG)
    with open(os.path.join(idx, "stats.json")) as f:
        n = _json.load(f)["n_docs"]
    ids = np.arange(n, dtype=np.int64)
    delete_docs(idx, ids[ids % _DEL_MOD == _DEL_REM])  # idempotent
    return idx


# Suggestion fixtures: wide/narrow/unmatched prefixes; typos with
# unique and multiple neighbours, an exact word, a no-neighbour word.
SUGGEST_PREFIXES: list[tuple[int, str]] = [
    (0, "s"), (1, "qu"), (2, "c"), (3, "zz")]
SUGGEST_TYPOS: list[tuple[int, str]] = [
    (0, "keey"), (1, "qury"), (2, "sow"), (3, "data"), (4, "zzzneverseen")]


def suggest_completions_documents(sf_dir: str) -> pa.Table:
    """Prefix completion over the documents dictionary, ranked by df."""
    from bge_m3_onnx_ray.index.suggest import suggest_completions
    key = "documents-" + os.path.basename(os.path.normpath(sf_dir))
    idx = _cached_index(documents_as_transcripts(sf_dir), key, _DOC_CFG)
    return suggest_completions(idx, SUGGEST_PREFIXES)


def suggest_corrections_documents(sf_dir: str) -> pa.Table:
    """Did-you-mean spell correction over the documents dictionary."""
    from bge_m3_onnx_ray.index.suggest import suggest_corrections
    key = "documents-" + os.path.basename(os.path.normpath(sf_dir))
    idx = _cached_index(documents_as_transcripts(sf_dir), key, _DOC_CFG)
    return suggest_corrections(idx, SUGGEST_TYPOS)


DELETE_BY_QUERY_TEXT = "customer stream"


def bm25_documents_topk_deleted_by_query(sf_dir: str,
                                         k: int = 10) -> pa.Table:
    """Delete-by-query lifecycle (the Elasticsearch _delete_by_query
    shape): every doc matching "customer stream" (OR) is tombstoned in
    one pass via the match-set machinery, then the reference queries
    run under live-docs semantics — candidates exclude the deleted
    docs, corpus-wide stats keep their as-built values. The oracle
    mirrors with a NOT IN (docs containing either term) candidate
    filter. Same shape as :func:`bm25_documents_topk`."""
    from bge_m3_onnx_ray.index.delete import delete_by_query
    key = "documents-delq-" + os.path.basename(os.path.normpath(sf_dir))
    idx = _cached_index(documents_as_transcripts(sf_dir), key, _DOC_CFG)
    delete_by_query(idx, DELETE_BY_QUERY_TEXT)      # idempotent
    out = search(idx, DOC_QUERIES, QueryConfig(k=k, method="wand")) \
        .to_pandas()
    out["doc_id"] = out["conv_id"].str.slice(4).astype(np.int64)
    out["score_q6"] = np.floor(out["score"].to_numpy() * 1e6).astype(np.int64)
    out = out.sort_values(["query_id", "rank"]).reset_index(drop=True)
    return pa.Table.from_pandas(out[["query_id", "rank", "doc_id", "score_q6"]],
                                preserve_index=False)


_UPS_SUFFIX = " upsert revision"


def _upserted_index(sf_dir: str) -> str:
    """Full CRUD chain on one index — UPDATE as delete + compact +
    delta-append: docs with doc_id % 7 == 3 get a revised text
    (original + ``_UPS_SUFFIX``). The old versions are tombstoned
    (index.delete), dropped physically with stats recomputed over the
    survivors (index.compact), then the revised texts arrive as a delta
    (index.append) — so N, avgdl and every df must come out exactly as
    a fresh build over the UPDATED corpus, which is what the DuckDB
    oracle scores. Own cache dirs; rebuilt when the config fingerprint
    changes."""
    import json as _json
    import shutil

    from bge_m3_onnx_ray.index.append import append_index
    from bge_m3_onnx_ray.index.artifacts import atomic_write_json
    from bge_m3_onnx_ray.index.build import build_index
    from bge_m3_onnx_ray.index.compact import compact_index
    from bge_m3_onnx_ray.index.delete import delete_docs

    sfb = os.path.basename(os.path.normpath(sf_dir))
    final = os.path.join("/tmp/bm25_indexes", "documents-upsert-" + sfb)
    marker = os.path.join(final, "upserted.json")
    if os.path.exists(marker):
        with open(marker) as f:
            if _json.load(f).get("fp") == _DOC_CFG.fingerprint():
                return final
    shutil.rmtree(final, ignore_errors=True)
    base = os.path.join("/tmp/bm25_indexes", "documents-upsbase-" + sfb)
    shutil.rmtree(base, ignore_errors=True)  # deletes mutate it: rebuild
    build_index(documents_as_transcripts(sf_dir), base, _DOC_CFG)
    with open(os.path.join(base, "stats.json")) as f:
        n = _json.load(f)["n_docs"]
    ids = np.arange(n, dtype=np.int64)
    delete_docs(base, ids[ids % _DEL_MOD == _DEL_REM])
    compact_index(base, final)

    def revised(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        sel = np.flatnonzero((ids % _DEL_MOD) == _DEL_REM)
        ids = ids[sel]
        texts = t.column("text").take(pa.array(sel)).to_pylist()
        return pa.table({
            "conv_id": pa.array([f"doc-{i:08d}" for i in ids], pa.string()),
            "turn_idx": pa.array(np.zeros(len(ids), np.int32), pa.int32()),
            "text": pa.array([x + _UPS_SUFFIX for x in texts], pa.string()),
        })

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"])
    append_index(ds.map_batches(revised, batch_format="pyarrow"), final)
    atomic_write_json({"fp": _DOC_CFG.fingerprint()}, marker)
    return final


def bm25_documents_topk_upserted(sf_dir: str, k: int = 10) -> pa.Table:
    """Top-k BM25 over the upserted index (see :func:`_upserted_index`)
    — gates UPDATE semantics end to end: the oracle is a fresh SQL BM25
    over the corpus WITH the revisions applied (``CASE WHEN`` text
    rewrite), so any stale stat or surviving old version hash-fails.
    Appended docIDs are not in original doc order, so results re-rank
    on (floor(score*1e6) desc, doc_id) with the same over-fetch +
    tie-width guard as :func:`bm25_documents_topk_appended`."""
    idx = _upserted_index(sf_dir)
    out = search(idx, DOC_QUERIES,
                 QueryConfig(k=3 * k, method="wand")).to_pandas()
    out["doc_id"] = out["conv_id"].str.slice(4).astype(np.int64)
    out["score_q6"] = np.floor(out["score"].to_numpy() * 1e6).astype(np.int64)
    out = out.sort_values(["query_id", "score_q6", "doc_id"],
                          ascending=[True, False, True]) \
        .reset_index(drop=True)
    out["rank"] = out.groupby("query_id").cumcount().astype(np.int32) + 1
    kth = out[out["rank"] == k].set_index("query_id").score_q6
    g = out.groupby("query_id")
    risky = (g.size() >= 3 * k) & (kth.reindex(g.size().index)
                                   == g.score_q6.last())
    if bool(risky.any()):
        raise RuntimeError(
            f"quantized-score tie group wider than the {3 * k}-row "
            f"over-fetch for queries {list(risky[risky].index)[:5]}")
    out = out[out["rank"] <= k]
    return pa.Table.from_pandas(out[["query_id", "rank", "doc_id",
                                     "score_q6"]], preserve_index=False)


def bm25_documents_topk_deleted(sf_dir: str, k: int = 10) -> pa.Table:
    """Top-k BM25 over an index with tombstoned documents — Lucene
    live-docs semantics: deleted docs never surface, but N/avgdl/df keep
    their as-built values until compaction. The DuckDB oracle scores the
    FULL corpus and only excludes the deleted candidates, mirroring that
    exactly. Same output shape as :func:`bm25_documents_topk`."""
    idx = _deleted_docs_index(sf_dir)
    out = search(idx, DOC_QUERIES, QueryConfig(k=k, method="wand")).to_pandas()
    out["doc_id"] = out["conv_id"].str.slice(4).astype(np.int64)
    assert not ((out["doc_id"] % _DEL_MOD) == _DEL_REM).any(), \
        "tombstoned doc surfaced"
    out["score_q6"] = np.floor(out["score"].to_numpy() * 1e6).astype(np.int64)
    out = out.sort_values(["query_id", "rank"]).reset_index(drop=True)
    return pa.Table.from_pandas(out[["query_id", "rank", "doc_id", "score_q6"]],
                                preserve_index=False)


def bm25_documents_topk_deleted_compacted(sf_dir: str, k: int = 10) -> pa.Table:
    """The same tombstoned index after ``compact_index`` dropped the
    deleted docs physically: stats are recomputed over the survivors, so
    scores CHANGE versus the live-docs variant — the oracle recomputes
    N/avgdl/df over the filtered corpus, proving the whole
    delete→compact lifecycle end-to-end."""
    import json as _json
    import shutil

    from bge_m3_onnx_ray.index.compact import compact_index
    idx = _deleted_docs_index(sf_dir)
    cidx = os.path.join(
        "/tmp/bm25_indexes",
        "documents-delc-" + os.path.basename(os.path.normpath(sf_dir)))
    stats_p = os.path.join(cidx, "stats.json")
    fresh = True
    if os.path.exists(stats_p):
        with open(stats_p) as f:
            st = _json.load(f)
        fresh = (st.get("config_fingerprint") != _DOC_CFG.fingerprint())
    if fresh:
        shutil.rmtree(cidx, ignore_errors=True)
        compact_index(idx, cidx)
    out = search(cidx, DOC_QUERIES, QueryConfig(k=k, method="wand")).to_pandas()
    out["doc_id"] = out["conv_id"].str.slice(4).astype(np.int64)
    out["score_q6"] = np.floor(out["score"].to_numpy() * 1e6).astype(np.int64)
    out = out.sort_values(["query_id", "rank"]).reset_index(drop=True)
    return pa.Table.from_pandas(out[["query_id", "rank", "doc_id", "score_q6"]],
                                preserve_index=False)


def hybrid_rrf_topk(sf_dir: str, k: int = 10, fetch: int = 20,
                    rrf_k: int = 60) -> pa.Table:
    """Hybrid lexical+dense retrieval with reciprocal-rank fusion — the
    reference model's core idea (BGE-M3's sparse and dense heads are
    fused at query time; ``bge_m3_embedder.py`` returns both) re-expressed
    over this engine's two retrieval paths:

    - lexical: BM25 top-``fetch`` from the documents index (text query);
    - dense: exact cosine top-``fetch`` over the embeddings table (the
      query vector is embeddings[vec_id == query_id]; the synthetic
      corpus links vec_id ≡ doc_id).

    Fusion: RRF(doc) = Σ_lists 1/(rrf_k + rank) — rank-based so the two
    engines' incomparable score scales never mix; docs on one list only
    get that list's term. Both retrievals are the existing distributed
    pipelines; the fusion itself is a per-query ``map_groups`` over the
    union of the two (query_id, doc_id, contribution) sets (≤ 2·fetch
    rows per query — at 10⁹ queries this stays one tiny shuffle keyed by
    query_id). Output (query_id, rank, doc_id, rrf_q9); ties break by
    doc_id; the DuckDB oracle mirrors both rankings and the fusion
    arithmetic exactly (1/(60+r) sums are order-independent doubles).
    """
    import pyarrow.compute as pc
    key = "documents-" + os.path.basename(os.path.normpath(sf_dir))
    idx = _cached_index(documents_as_transcripts(sf_dir), key, _DOC_CFG)
    bm = search(idx, DOC_QUERIES[:5], QueryConfig(k=fetch, method="wand"))

    def bm_contrib(t: pa.Table) -> pa.Table:
        ranks = t.column("rank").to_numpy().astype(np.float64)
        return pa.table({
            "query_id": t.column("query_id"),
            "doc_id": pc.cast(pc.utf8_slice_codeunits(
                t.column("conv_id"), 4, 99), pa.int64()),
            "c": pa.array(1.0 / (rrf_k + ranks), pa.float64())})

    from bge_m3_onnx_ray.stages.ann import brute_force_topk
    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    qdf = emb.map_batches(lambda t: t.filter(pc.less(t["vec_id"], 5)),
                          batch_format="pyarrow").to_pandas()
    qdf = qdf.sort_values("vec_id")
    cos = brute_force_topk(emb, np.stack(qdf.embedding.to_numpy()),
                           qdf.vec_id.to_numpy(), k=fetch)

    def cos_contrib(t: pa.Table) -> pa.Table:
        ranks = t.column("rank").to_numpy().astype(np.float64)
        return pa.table({
            "query_id": t.column("query_id"),
            "doc_id": t.column("vec_id"),
            "c": pa.array(1.0 / (rrf_k + ranks), pa.float64())})

    both = bm.map_batches(bm_contrib, batch_format="pyarrow").union(
        cos.map_batches(cos_contrib, batch_format="pyarrow"))

    def fuse(group: pa.Table) -> pa.Table:
        qid = group.column("query_id")[0].as_py()
        d = group.column("doc_id").to_numpy()
        c = group.column("c").to_numpy()
        uniq, inv = np.unique(d, return_inverse=True)
        # ≤2 contributions per doc: a two-operand float add is
        # order-independent, so the sum is bit-stable under shuffle order
        rrf = np.zeros(len(uniq), np.float64)
        np.add.at(rrf, inv, c)
        order = np.lexsort((uniq, -rrf))[:k]
        return pa.table({
            "query_id": pa.array(np.full(len(order), qid), pa.int64()),
            "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int32),
                             pa.int32()),
            "doc_id": pa.array(uniq[order], pa.int64()),
            "rrf_q9": pa.array(np.floor(rrf[order] * 1e9).astype(np.int64),
                               pa.int64())})

    out = both.groupby("query_id").map_groups(fuse, batch_format="pyarrow") \
        .to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


TRANSCRIPTS_DOCS_PER_SHARD = 65536


def transcripts_n_turns(sf_dir: str) -> int:
    base = os.path.basename(os.path.normpath(sf_dir))
    sf = float(base.replace("sf", "")) if base.startswith("sf") else 0.001
    return max(2000, int(sf * 2_000_000))


TRANSCRIPT_ROLE_WEIGHTS: tuple = (("user", 2.0), ("tool", 0.25))


def bm25_transcripts_topk_weighted(sf_dir: str, k: int = 10) -> pa.Table:
    """Function-score flagship: per-turn score multiplied by a
    role-keyed weight (user turns boosted 2x, tool output down-weighted
    4x — the Elasticsearch weight-function shape over the transcripts'
    natural field). Exhaustive scorer (weights are applied before the
    per-shard top-k cut); oracle mirrors with score * CASE role."""
    return bm25_transcripts_topk(sf_dir, method="exhaustive", k=k,
                                 weights=TRANSCRIPT_ROLE_WEIGHTS)


def bm25_transcripts_topk(sf_dir: str, method: str = "wand", k: int = 10,
                          n_turns: int | None = None,
                          role: str | None = None,
                          weights: tuple | None = None,
                          decay_tau: float | None = None) -> pa.Table:
    """Flagship over the synthetic multi-turn transcripts fixture at a
    scale derived from sf_dir (sf0.001→2k, sf0.01→20k, sf0.1→200k turns).
    Output (query_id, rank, conv_id, turn_idx, score_q6) — shaped to
    hash-match the driver's full BM25 DuckDB oracle over the same fixture
    parquet (keyed on (conv_id, turn_idx); the SQL mirrors the Unicode
    tokenizer via regexp + CJK-split, verified token-identical over the
    whole fixture). Exact float parity is additionally covered by the
    pytest golden suite."""
    from bge_m3_onnx_ray.fixtures import gen_queries, transcripts_path

    if n_turns is None:
        n_turns = transcripts_n_turns(sf_dir)
    path = transcripts_path(n_turns)
    cfg = IndexConfig(docs_per_shard=TRANSCRIPTS_DOCS_PER_SHARD,
                      term_buckets=8)
    idx = _cached_index(rd.read_parquet(path), f"transcripts-n{n_turns}", cfg)
    def make_qcfg(fetch: int) -> QueryConfig:
        if decay_tau is not None:
            _ensure_day_attrs(idx, path)
            import pyarrow.parquet as pq
            days = [int(pq.read_table(os.path.join(path, f),
                                      columns=["ts"])
                        .column("ts").cast(pa.timestamp("us"))
                        .cast(pa.int64())
                        .to_numpy().max() // 1_000_000 // 86_400)
                    for f in sorted(os.listdir(path))]
            origin = max(days)      # newest day, derived from the data
            return QueryConfig(k=fetch, method=method,
                               decay_attr=("day", float(origin),
                                           float(decay_tau)))
        if role is not None or weights is not None:
            # faceted search / function score both key on the turn role
            # (the 'role' attrs side table is derived once per index)
            from bge_m3_onnx_ray.index.attrs import (build_doc_attrs,
                                                     has_doc_attrs)
            if not has_doc_attrs(idx, "role"):
                build_doc_attrs(rd.read_parquet(path), idx, "role")
            if role is not None:
                return QueryConfig(k=fetch, method=method,
                                   filter_attr="role", filter_value=role)
            return QueryConfig(k=fetch, method=method,
                               weight_attr="role", attr_weights=weights)
        return QueryConfig(k=fetch, method=method)

    # over-fetch then re-rank on the QUANTIZED score with the docID
    # tie-break: the oracle ranks on floor(score*1e6) (ulp-stable across
    # engines), so a quantized-tie group straddling the raw-score k
    # boundary must be resolved identically on both sides. The tie-width
    # guard — if a query's fetch is saturated AND its k-th quantized
    # score equals its last fetched one, the tie group may extend past
    # the fetch and the raw-score cut could have dropped members the
    # oracle keeps — escalates the fetch instead of assuming the risk
    # away; only an implausibly wide tie (> 100k rows) still raises.
    for mult in (3, 20, 100, 10_000):
        fetch = mult * k
        out = search(idx, gen_queries(50), make_qcfg(fetch))
        df = out.to_pandas()
        df["score_q6"] = np.floor(df["score"].to_numpy() * 1e6) \
            .astype(np.int64)
        df = df.sort_values(["query_id", "score_q6", "conv_id",
                             "turn_idx"],
                            ascending=[True, False, True, True]) \
            .reset_index(drop=True)
        df["rank"] = df.groupby("query_id").cumcount() \
            .astype(np.int32) + 1
        kth = df[df["rank"] == k].set_index("query_id").score_q6
        g = df.groupby("query_id")
        last = g.score_q6.last()      # score-desc sorted: the cut row
        nfetch = g.size()
        risky = (nfetch >= fetch) & (kth.reindex(nfetch.index) == last)
        if not bool(risky.any()):
            break
    else:
        raise RuntimeError(
            f"quantized-score tie group wider than the {fetch}-row "
            f"over-fetch for queries {list(risky[risky].index)[:5]}")
    df = df[df["rank"] <= k]
    return pa.Table.from_pandas(
        df[["query_id", "rank", "conv_id", "turn_idx", "score_q6"]],
        preserve_index=False)


def rank_eval_documents(sf_dir: str, k: int = 10) -> pa.Table:
    """The rank_eval API: search-quality metrics (precision@k, MRR) for
    the BM25 top-k against deterministic relevance judgments — a doc is
    RELEVANT to a query iff it contains EVERY distinct query term (the
    percolator predicate, so judgments need no human labels and the SQL
    oracle can mirror them exactly).

    Scale shape: judging needs only MEMBERSHIP of the k returned docs in
    the relevant set, so the second pass is an AND-mode search RESTRICTED
    to the top-k docIDs via allow_docs (<= n_queries x k candidates
    corpus-wide) — the full conjunctive match set is never materialized.
    Metrics are exact integers: precision_q6 = hits*1e6 // k,
    rr_q6 = 1e6 // first_hit_rank (0 when no hit)."""
    key = "documents-" + os.path.basename(os.path.normpath(sf_dir))
    idx = _cached_index(documents_as_transcripts(sf_dir), key, _DOC_CFG)
    top = search(idx, DOC_QUERIES, QueryConfig(k=k, method="wand")) \
        .to_pandas()
    top["doc_id"] = top["conv_id"].str.slice(4).astype(np.int64)
    allow = {int(qid): np.sort(g["doc_id"].to_numpy())
             for qid, g in top.groupby("query_id")}
    rel = search(idx, DOC_QUERIES,
                 QueryConfig(k=k, method="exhaustive", mode="and"),
                 allow_docs=allow).to_pandas()
    rel["doc_id"] = rel["conv_id"].str.slice(4).astype(np.int64)
    hit_sets = {int(qid): set(g["doc_id"].tolist())
                for qid, g in rel.groupby("query_id")}
    rows = []
    for qid, g in top.groupby("query_id"):
        hits = hit_sets.get(int(qid), set())
        g = g.sort_values("rank")
        is_hit = g["doc_id"].isin(hits).to_numpy()
        first = int(g["rank"].to_numpy()[is_hit][0]) if is_hit.any() else 0
        rows.append((int(qid), int(is_hit.sum()) * 1_000_000 // k,
                     1_000_000 // first if first else 0))
    rows.sort()
    return pa.table({
        "query_id": pa.array([r[0] for r in rows], pa.int64()),
        "precision_q6": pa.array([r[1] for r in rows], pa.int64()),
        "rr_q6": pa.array([r[2] for r in rows], pa.int64())})


def rank_eval_ndcg_documents(sf_dir: str, k: int = 10) -> pa.Table:
    """Graded nDCG@k for the BM25 top-k (the rank_eval ndcg metric):
    a doc's RELEVANCE GRADE for a query is its count of distinct
    matched query terms (deterministic graded judgments — no human
    labels, SQL-mirrorable), gain is linear (gain = grade),
    DCG = sum(grade_i / log2(rank_i + 1)), and IDCG re-ranks the WHOLE
    corpus by grade (the true ideal, not just the returned page).

    Scale shape: observed grades come from a doc-restricted pass
    (<= n_queries x k rows via ``match_grades``); the ideal needs only
    the per-query GRADE HISTOGRAM (``match_grade_histogram``, bounded
    by n_query_terms rows per query at any corpus size) because equal
    grades contribute identically to IDCG regardless of tie order.
    Output (query_id, dcg_q6, ndcg_q6) — q6-quantized floats, the
    repo-wide oracle convention."""
    from bge_m3_onnx_ray.index.facets import match_grades_and_histogram
    key = "documents-" + os.path.basename(os.path.normpath(sf_dir))
    idx = _cached_index(documents_as_transcripts(sf_dir), key, _DOC_CFG)
    top = search(idx, DOC_QUERIES, QueryConfig(k=k, method="wand")) \
        .to_pandas()
    top["doc_id"] = top["conv_id"].str.slice(4).astype(np.int64)
    allow = {int(qid): np.sort(g["doc_id"].to_numpy())
             for qid, g in top.groupby("query_id")}
    # one fused postings scan yields BOTH nDCG inputs (observed grades +
    # the ideal histogram partials) — was two identical scans + a reduce
    both = match_grades_and_histogram(idx, DOC_QUERIES, allow).to_pandas()
    gr = both[both["kind"] == 0]
    grade_of = {(int(q), int(d)): int(g)
                for q, d, g in zip(gr["query_id"], gr["key"], gr["val"])}
    hist = both[both["kind"] == 1].groupby(
        ["query_id", "key"], as_index=False)["val"].sum().rename(
        columns={"key": "grade", "val": "n_docs"})
    rows = []
    for qid, g in top.groupby("query_id"):
        g = g.sort_values("rank")
        ranks = g["rank"].to_numpy().astype(np.float64)
        gains = np.array([grade_of.get((int(qid), int(d)), 0)
                          for d in g["doc_id"]], np.float64)
        dcg = float(np.sum(gains / np.log2(ranks + 1.0)))
        h = hist[hist.query_id == int(qid)].sort_values(
            "grade", ascending=False)
        idcg, pos = 0.0, 0
        for grade, n in zip(h["grade"], h["n_docs"]):
            take = min(int(n), k - pos)
            if take <= 0:
                break
            i = np.arange(pos + 1, pos + take + 1, dtype=np.float64)
            idcg += float(np.sum(float(grade) / np.log2(i + 1.0)))
            pos += take
        # Half-up rounding, not floor: nDCG is EXACTLY 1.0 whenever the
        # top-k grade multiset equals the ideal one (common), and floor
        # is knife-edged there across FP summation orders (engine 1.0 vs
        # oracle 0.999999999…); round is only fragile at half-microunit
        # boundaries, measure-zero for ratios of irrational log2 sums.
        rows.append((int(qid), int(np.floor(dcg * 1e6 + 0.5)),
                     int(np.floor(dcg / idcg * 1e6 + 0.5))
                     if idcg > 0 else 0))
    rows.sort()
    return pa.table({
        "query_id": pa.array([r[0] for r in rows], pa.int64()),
        "dcg_q6": pa.array([r[1] for r in rows], pa.int64()),
        "ndcg_q6": pa.array([r[2] for r in rows], pa.int64())})


# Compound bool queries: (query_id, must_text, should_text, must_not_text).
# Shapes covered: pure-boost should, filter-only must, OOV must (matches
# nothing), OOV must_not (no-op), duplicate should terms (deduped).
BOOL_QUERIES: list[tuple[int, str, str, str]] = [
    (0, "table", "key order", ""),
    (1, "data filter", "window", "stream"),
    (2, "customer", "", "merge"),
    (3, "zzzneverseen", "table", ""),
    (4, "join window", "scan slow", "zzzneverseen"),
    (5, "query", "query query group", ""),
]


def bm25_documents_topk_bool(sf_dir: str, k: int = 10) -> pa.Table:
    """Compound bool query (must/should/must_not) over the documents
    corpus — Lucene BooleanQuery semantics: candidates contain every
    must term and no must_not term; the score adds BM25 over every
    present must-or-should term. Output shaped for the SQL oracle."""
    from bge_m3_onnx_ray.index.search import search_bool
    key = "documents-" + os.path.basename(os.path.normpath(sf_dir))
    idx = _cached_index(documents_as_transcripts(sf_dir), key, _DOC_CFG)
    out = search_bool(idx, BOOL_QUERIES, QueryConfig(k=k)).to_pandas()
    out["doc_id"] = out["conv_id"].str.slice(4).astype(np.int64)
    out["score_q6"] = np.floor(out["score"].to_numpy() * 1e6).astype(np.int64)
    out = out.sort_values(["query_id", "rank"]).reset_index(drop=True)
    return pa.Table.from_pandas(out[["query_id", "rank", "doc_id",
                                     "score_q6"]], preserve_index=False)


# Boosting queries: (query_id, positive_text, negative_text). Shapes
# covered: plain demotion, multi-term negative, OOV negative (no-op),
# negative == a positive term (uniform self-demotion of every match),
# empty negative (plain BM25), negative hitting most of the corpus.
BOOSTING_QUERIES: list[tuple[int, str, str]] = [
    (0, "key order sort", "table"),
    (1, "data filter window", "stream merge"),
    (2, "customer scan", "zzzneverseen"),       # OOV negative: no-op
    (3, "join group", "join"),                  # self-demotion
    (4, "table query", ""),                     # no negative clause
    (5, "slow small count", "data"),            # high-df negative
]


def bm25_documents_topk_boosting(sf_dir: str, k: int = 10) -> pa.Table:
    """Boosting query (positive scores BM25, matching any negative term
    DEMOTES by ×0.5 instead of excluding — the Elasticsearch `boosting`
    query, contrasting bool's must_not) over the documents corpus.
    Output shaped for the SQL oracle."""
    from bge_m3_onnx_ray.index.search import search_boosting
    key = "documents-" + os.path.basename(os.path.normpath(sf_dir))
    idx = _cached_index(documents_as_transcripts(sf_dir), key, _DOC_CFG)
    out = search_boosting(idx, BOOSTING_QUERIES,
                          QueryConfig(k=k)).to_pandas()
    out["doc_id"] = out["conv_id"].str.slice(4).astype(np.int64)
    out["score_q6"] = np.floor(out["score"].to_numpy() * 1e6).astype(np.int64)
    out = out.sort_values(["query_id", "rank"]).reset_index(drop=True)
    return pa.Table.from_pandas(out[["query_id", "rank", "doc_id",
                                     "score_q6"]], preserve_index=False)


def _quantized_rerank(out, k: int) -> pa.Table:
    """Re-rank an over-fetched (3k-per-query) search result on
    (floor(score*1e6) desc, doc_id) and cut to ``k`` — the ulp-stable
    convention the transcripts/appended keys use. Needed for the
    non-BM25 similarities: their float sums are mirrored in SQL with
    the same operand grouping, but DuckDB's parallel ``sum()`` adds in
    nondeterministic order, so two docs within summation-order noise
    can flip under a raw-float rank (observed once at sf0.1 for
    classic TF-IDF). The tie-width guard raises if a quantized tie
    group could span the over-fetch boundary."""
    out["doc_id"] = out["conv_id"].str.slice(4).astype(np.int64)
    out["score_q6"] = np.floor(out["score"].to_numpy() * 1e6).astype(np.int64)
    out = out.sort_values(["query_id", "score_q6", "doc_id"],
                          ascending=[True, False, True]) \
        .reset_index(drop=True)
    out["rank"] = out.groupby("query_id").cumcount().astype(np.int32) + 1
    kth = out[out["rank"] == k].set_index("query_id").score_q6
    g = out.groupby("query_id")
    risky = (g.size() >= 3 * k) & (kth.reindex(g.size().index)
                                   == g.score_q6.last())
    if bool(risky.any()):
        raise RuntimeError(
            f"quantized-score tie group wider than the {3 * k}-row "
            f"over-fetch for queries {list(risky[risky].index)[:5]}")
    out = out[out["rank"] <= k]
    return pa.Table.from_pandas(out[["query_id", "rank", "doc_id",
                                     "score_q6"]], preserve_index=False)


def tfidf_documents_topk(sf_dir: str, k: int = 10) -> pa.Table:
    """Top-k under the pluggable CLASSIC similarity
    (``QueryConfig(similarity="classic")`` — Lucene's pre-BM25 TF-IDF:
    idf^2 * sqrt(tf)/sqrt(dl)) over the same documents index — the
    Similarity abstraction proof: one index, two scoring models. Same
    result shape/oracle conventions as :func:`bm25_documents_topk`."""
    key = "documents-" + os.path.basename(os.path.normpath(sf_dir))
    idx = _cached_index(documents_as_transcripts(sf_dir), key, _DOC_CFG)
    out = search(idx, DOC_QUERIES,
                 QueryConfig(k=3 * k, method="exhaustive",
                             similarity="classic")).to_pandas()
    return _quantized_rerank(out, k)


def lmd_documents_topk(sf_dir: str, k: int = 10) -> pa.Table:
    """Top-k under the pluggable LM-DIRICHLET similarity
    (``QueryConfig(similarity="lmd")`` — Zhai & Lafferty 2001
    query-likelihood with Dirichlet smoothing, Lucene's
    LMDirichletSimilarity shape: max(0, ln(1 + tf/(mu*cf/total)) +
    ln(mu/(dl+mu)))) over the same documents index — third model
    through the Similarity seam: one index, three scoring models
    (BM25 / classic TF-IDF / LMD). Same result shape/oracle
    conventions as :func:`bm25_documents_topk`."""
    key = "documents-" + os.path.basename(os.path.normpath(sf_dir))
    idx = _cached_index(documents_as_transcripts(sf_dir), key, _DOC_CFG)
    out = search(idx, DOC_QUERIES,
                 QueryConfig(k=3 * k, method="exhaustive",
                             similarity="lmd")).to_pandas()
    return _quantized_rerank(out, k)


def rescore_documents_topk(sf_dir: str, k: int = 10, window: int = 30,
                           rescore_weight: float = 0.5) -> pa.Table:
    """Top-k under two-phase window rescoring
    (:func:`~bge_m3_onnx_ray.index.search.rescore_search`): WAND BM25
    fetches the top ``window`` per query, classic TF-IDF re-scores just
    that window, final rank is ``bm25 + rescore_weight * classic`` —
    the Elasticsearch rescore shape. Same result/oracle conventions as
    :func:`bm25_documents_topk`."""
    from bge_m3_onnx_ray.index.search import rescore_search
    key = "documents-" + os.path.basename(os.path.normpath(sf_dir))
    idx = _cached_index(documents_as_transcripts(sf_dir), key, _DOC_CFG)
    out = rescore_search(idx, DOC_QUERIES, QueryConfig(k=k),
                         window=window,
                         rescore_weight=rescore_weight).to_pandas()
    out["doc_id"] = out["conv_id"].str.slice(4).astype(np.int64)
    out["score_q6"] = np.floor(out["score"].to_numpy() * 1e6).astype(np.int64)
    out = out.sort_values(["query_id", "rank"]).reset_index(drop=True)
    return pa.Table.from_pandas(out[["query_id", "rank", "doc_id", "score_q6"]],
                                preserve_index=False)


class _Bm25fStats:
    """Pass 1 of BM25F: per-batch partials of the global model — doc
    count, per-field token totals (title = first TITLE_LEN tokens, body
    = the rest), and per-QUERY-term document frequencies (df is whole-
    doc: a doc counts once if the term appears in either field). Output
    is one tiny row per (batch, term) plus one marker row (term='')
    per batch carrying the corpus partials — driver-reduced."""

    TITLE_LEN = 5

    def __init__(self, qterms: tuple):
        from bge_m3_onnx_ray.tokenizer import DeterministicTokenizer
        self.tok = DeterministicTokenizer()
        self.qterms = pa.array(sorted(qterms), pa.large_string())

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        flat, offsets = self.tok.batch_token_lists(batch.column("text"))
        lens = np.diff(offsets)
        n = len(lens)
        sum_t = int(np.minimum(lens, self.TITLE_LEN).sum())
        sum_b = int(np.maximum(lens - self.TITLE_LEN, 0).sum())
        # whole-doc df for query terms only
        doc_of = np.repeat(np.arange(n, dtype=np.int64), lens)
        hit = pc.is_in(flat, value_set=self.qterms).to_numpy(
            zero_copy_only=False)
        terms, dfs = [], []
        if hit.any():
            qsorted = self.qterms.to_pylist()
            ht = flat.filter(pa.array(hit))
            code = np.searchsorted(
                np.array(qsorted),
                np.asarray(ht, dtype=object).astype(str))
            pairs = np.unique(code.astype(np.int64) * (len(lens) + 1)
                              + doc_of[hit])
            tcode, counts = np.unique(pairs // (len(lens) + 1),
                                      return_counts=True)
            terms = [qsorted[c] for c in tcode]
            dfs = counts.tolist()
        return pa.table({
            "term": pa.array([""] + terms, pa.string()),
            "df": pa.array([0] + dfs, pa.int64()),
            "n": pa.array([n] + [0] * len(terms), pa.int64()),
            "sdl_t": pa.array([sum_t] + [0] * len(terms), pa.int64()),
            "sdl_b": pa.array([sum_b] + [0] * len(terms), pa.int64())})


class _Bm25fScore:
    """Pass 2 of BM25F: with the broadcast model (idf per query term,
    per-field avgdl, query->terms), score every doc in the batch —
    tf blended ACROSS fields before saturation (Robertson BM25F):

        tfd = w_t * (tf_title / B_t) + w_b * (tf_body / B_b)
        B_f = (1 - b) + b * dl_f / avgdl_f
        score = sum_t idf_t * tfd / (k1 + tfd)

    (w_t=2.0, w_b=1.0, k1=1.2, b=0.75; operand grouping mirrored by the
    SQL oracle). Emits a tie-safe per-batch partial top-k.

    ``mode="best_fields"`` (Elasticsearch multi_match best_fields)
    instead scores each FIELD as its own BM25 query (per-field tf
    saturation against that field's length norm) and combines

        score = best_field + tie * (sum_fields - best_field)

    — rank by the strongest single field, the other only breaks ties.

    ``mode="cross_fields"`` (multi_match cross_fields with a
    tie_breaker) is TERM-centric: each term takes the dis-max of its
    per-field BM25 contributions, and the per-term results SUM —
    a term may win in title and another in body (best_fields can't
    mix fields across terms; blend mixes before saturation):

        score = sum_t [max_f c_{t,f} + tie * (sum_f c_{t,f} - max_f)]"""

    TITLE_LEN = 5

    def __init__(self, model_ref, k: int, mode: str = "blend",
                 tie: float = 0.3):
        import ray
        from bge_m3_onnx_ray.tokenizer import DeterministicTokenizer
        self.tok = DeterministicTokenizer()
        (self.idfs, self.avgdl_t, self.avgdl_b,
         self.queries) = ray.get(model_ref)
        self.k = k
        if mode not in ("blend", "best_fields", "cross_fields"):
            raise ValueError(f"unknown bm25f mode {mode!r}")
        self.mode = mode
        self.tie = tie

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        doc_ids = batch.column("doc_id").to_numpy()
        flat, offsets = self.tok.batch_token_lists(batch.column("text"))
        lens = np.diff(offsets)
        n = len(lens)
        dl_t = np.minimum(lens, self.TITLE_LEN).astype(np.float64)
        dl_b = np.maximum(lens - self.TITLE_LEN, 0).astype(np.float64)
        b_t = 0.25 + 0.75 * dl_t / self.avgdl_t
        b_b = 0.25 + 0.75 * dl_b / self.avgdl_b
        doc_of = np.repeat(np.arange(n, dtype=np.int64), lens)
        pos = np.arange(len(doc_of)) - np.repeat(offsets[:-1], lens)
        # per-(doc, term) field tfs for query terms only
        tfs: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
        for term in self.idfs:
            m = pc.equal(flat, term).to_numpy(zero_copy_only=False)
            if not m.any():
                continue
            d = doc_of[m]
            is_t = (pos[m] < self.TITLE_LEN)
            ud = np.unique(d)
            tf_t = np.bincount(np.searchsorted(ud, d[is_t]),
                               minlength=len(ud)).astype(np.float64)
            tf_b = np.bincount(np.searchsorted(ud, d[~is_t]),
                               minlength=len(ud)).astype(np.float64)
            tfs[term] = (ud, tf_t, tf_b)
        out_q, out_d, out_s = [], [], []
        k = self.k
        for qid, terms in self.queries:
            scores: dict[int, float] = {}
            f_t: dict[int, float] = {}
            f_b: dict[int, float] = {}
            for t in terms:                      # ascending = sum order
                got = tfs.get(t)
                if got is None:
                    continue
                ud, tf_t, tf_b = got
                if self.mode in ("best_fields", "cross_fields"):
                    # per-field BM25, saturated against that field's norm
                    c_t = self.idfs[t] * ((tf_t * 2.2)
                                          / (tf_t + 1.2 * b_t[ud]))
                    c_b = self.idfs[t] * ((tf_b * 2.2)
                                          / (tf_b + 1.2 * b_b[ud]))
                    if self.mode == "cross_fields":
                        m = np.maximum(c_t, c_b)
                        contrib = m + self.tie * ((c_t + c_b) - m)
                        for di, c in zip(ud, contrib):
                            scores[int(di)] = (scores.get(int(di), 0.0)
                                               + float(c))
                        continue
                    for di, a, bb in zip(ud, c_t, c_b):
                        f_t[int(di)] = f_t.get(int(di), 0.0) + float(a)
                        f_b[int(di)] = f_b.get(int(di), 0.0) + float(bb)
                    continue
                tfd = (2.0 * (tf_t / b_t[ud])
                       + 1.0 * (tf_b / b_b[ud]))
                contrib = self.idfs[t] * (tfd / (1.2 + tfd))
                for di, c in zip(ud, contrib):
                    scores[int(di)] = scores.get(int(di), 0.0) + float(c)
            if self.mode == "best_fields":
                for di in f_t:
                    st, sb = f_t[di], f_b[di]
                    m = max(st, sb)
                    scores[di] = m + self.tie * ((st + sb) - m)
            if not scores:
                continue
            items = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
            if len(items) > k:                   # tie-safe pre-cut
                kth = items[k - 1][1]
                items = [it for it in items if it[1] >= kth]
            out_q.extend([qid] * len(items))
            out_d.extend(int(doc_ids[d]) for d, _ in items)
            out_s.extend(s for _, s in items)
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "doc_id": pa.array(out_d, pa.int64()),
                         "score": pa.array(out_s, pa.float64())})


def bm25f_documents_topk(sf_dir: str, k: int = 10,
                         mode: str = "blend") -> pa.Table:
    """Multi-field BM25F top-k over the documents table, fields derived
    deterministically from token positions (title = first 5 tokens,
    body = the rest — the schema has one text column, so the split IS
    the field definition, mirrored exactly by the SQL oracle's
    generate_subscripts positions). True BM25F: per-field length
    normalization and weighted tf blending BEFORE the k1 saturation —
    not a sum of per-field BM25 scores.

    Scale shape: two streaming corpus passes. Pass 1 reduces to a tiny
    (term, df) + corpus-stats table on the driver (query terms only —
    a few dozen rows regardless of corpus size); pass 2 broadcasts the
    model once via ray.put and emits tie-safe per-batch partial top-k,
    merged by a per-query groupby. No shuffle ever carries corpus-sized
    data."""
    import math

    import ray

    from bge_m3_onnx_ray.stages._pool import task_stage
    from bge_m3_onnx_ray.tokenizer import tokenize

    queries = [(qid, sorted(set(tokenize(text)))) for qid, text in DOC_QUERIES]
    all_terms = tuple(sorted({t for _, ts in queries for t in ts}))
    path = os.path.join(sf_dir, "documents.parquet")

    part = rd.read_parquet(path, columns=["doc_id", "text"]).map_batches(
        task_stage(_Bm25fStats, qterms=all_terms),
        batch_format="pyarrow", batch_size=8192).to_pandas()
    n = int(part["n"].sum())
    avgdl_t = float(part["sdl_t"].sum()) / float(n)
    avgdl_b = float(part["sdl_b"].sum()) / float(n)
    df = part[part.term != ""].groupby("term")["df"].sum()
    idfs = {t: math.log((n - int(d) + 0.5) / (int(d) + 0.5) + 1.0)
            for t, d in df.items()}

    model_ref = ray.put((idfs, avgdl_t, avgdl_b, queries))
    partials = rd.read_parquet(path, columns=["doc_id", "text"]).map_batches(
        task_stage(_Bm25fScore, model_ref=model_ref, k=k, mode=mode),
        batch_format="pyarrow", batch_size=8192)

    def merge(group: pa.Table) -> pa.Table:
        qid = group.column("query_id")[0].as_py()
        s = group.column("score").to_numpy()
        d = group.column("doc_id").to_numpy()
        order = np.lexsort((d, -s))[:k]
        return pa.table({
            "query_id": pa.array(np.full(len(order), qid), pa.int64()),
            "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int32),
                             pa.int32()),
            "doc_id": pa.array(d[order], pa.int64()),
            "score_q6": pa.array(np.floor(s[order] * 1e6).astype(np.int64),
                                 pa.int64())})

    out = partials.groupby("query_id").map_groups(
        merge, batch_format="pyarrow").to_pandas()
    out = out.sort_values(["query_id", "rank"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def transcripts_sft_pairs(sf_dir: str, n_buckets: int = 64) -> pa.Table:
    """Extract supervised-fine-tuning (prompt, response) pairs from the
    multi-turn transcripts: every adjacent (user turn, assistant turn)
    within one conversation in turn order — the standard dialogue->SFT
    training-data transformation.

    Same distributed shape as :func:`transcripts_role_transitions`: ONE
    shuffle keyed by hash-bucket of conv_id (a conversation's turns
    co-locate, pairs never cross conversations), then a vectorized
    per-bucket sort + adjacent-row kernel. Output (conv_id,
    prompt_turn_idx, response_turn_idx, prompt, response) sorted by
    (conv_id, prompt_turn_idx)."""
    from bge_m3_onnx_ray.fixtures import transcripts_path
    from bge_m3_onnx_ray.hashing import P53, poly_hash
    path = transcripts_path(transcripts_n_turns(sf_dir))

    def add_bucket(t: pa.Table) -> pa.Table:
        b = poly_hash(t.column("conv_id"), P53) % np.uint64(n_buckets)
        return t.append_column("_cb", pa.array(b.astype(np.int64)))

    def per_bucket(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        conv = g.column("conv_id").combine_chunks().dictionary_encode()
        cc = np.asarray(conv.indices).astype(np.int64)
        turn = g.column("turn_idx").to_numpy()
        role = g.column("role").combine_chunks().dictionary_encode()
        rc = np.asarray(role.indices).astype(np.int64)
        rdict = role.dictionary.to_pylist()
        uid = rdict.index("user") if "user" in rdict else -1
        aid = rdict.index("assistant") if "assistant" in rdict else -2
        order = np.lexsort((turn, cc))
        cc, rc, turn = cc[order], rc[order], turn[order]
        m = ((cc[1:] == cc[:-1]) & (rc[:-1] == uid) & (rc[1:] == aid))
        lo = np.flatnonzero(m)               # index of the user turn
        text = g.column("text").combine_chunks()
        take = lambda idx: text.take(pa.array(
            order[idx], pa.int64())).cast(pa.string())
        return pa.table({
            "conv_id": conv.dictionary.take(pa.array(cc[lo]))
                .cast(pa.string()),
            "prompt_turn_idx": pa.array(turn[lo].astype(np.int32),
                                        pa.int32()),
            "response_turn_idx": pa.array(turn[lo + 1].astype(np.int32),
                                          pa.int32()),
            "prompt": take(lo),
            "response": take(lo + 1)})

    src = rd.read_parquet(path, columns=["conv_id", "turn_idx", "role",
                                         "text"])
    out = src.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("_cb").map_groups(per_bucket, batch_format="pyarrow") \
        .to_pandas()
    out = out.sort_values(["conv_id", "prompt_turn_idx"]) \
        .reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def bm25_documents_topk_restored(sf_dir: str, k: int = 10) -> pa.Table:
    """Search over a snapshot-restored index (snapshot -> digest-verify
    -> restore -> search): results are byte-identical to the source
    index's, so the standard BM25 oracle gates the whole backup/restore
    lifecycle. Same result shape as :func:`bm25_documents_topk`."""
    import shutil

    from bge_m3_onnx_ray.index.snapshot import restore_index, snapshot_index
    key = "documents-" + os.path.basename(os.path.normpath(sf_dir))
    idx = _cached_index(documents_as_transcripts(sf_dir), key, _DOC_CFG)
    snap = idx + "-snap"
    restored = idx + "-restored"
    shutil.rmtree(snap, ignore_errors=True)
    shutil.rmtree(restored, ignore_errors=True)
    snapshot_index(idx, snap)
    restore_index(snap, restored)
    out = search(restored, DOC_QUERIES, QueryConfig(k=k)).to_pandas()
    out["doc_id"] = out["conv_id"].str.slice(4).astype(np.int64)
    out["score_q6"] = np.floor(out["score"].to_numpy() * 1e6).astype(np.int64)
    out = out.sort_values(["query_id", "rank"]).reset_index(drop=True)
    return pa.Table.from_pandas(out[["query_id", "rank", "doc_id", "score_q6"]],
                                preserve_index=False)


def bm25_documents_topk_resharded(sf_dir: str, k: int = 10,
                                  new_dps: int = 500) -> pa.Table:
    """Search over a RESHARDED index (the Elasticsearch _split/_shrink
    lifecycle): the cached documents index (docs_per_shard=4096) is
    re-partitioned to docs_per_shard=500 — an UNALIGNED split (500 does
    not divide 4096), so new shards straddle old boundaries and every
    slice path is exercised; postings are decoded, sliced at the new
    boundaries and re-encoded, with NO corpus re-read — and the
    standard BM25 oracle gates the result (scores are bit-identical:
    resharding moves postings, never changes global stats). Same result
    shape as :func:`bm25_documents_topk`."""
    import shutil

    from bge_m3_onnx_ray.index.reshard import reshard_index
    key = "documents-" + os.path.basename(os.path.normpath(sf_dir))
    idx = _cached_index(documents_as_transcripts(sf_dir), key, _DOC_CFG)
    dst = idx + f"-reshard{new_dps}"
    shutil.rmtree(dst, ignore_errors=True)
    # the cached index may carry positions/attrs artifacts (phrase and
    # filtered keys build them in place); this key only runs BM25, so
    # drop both explicitly — tombstones stay guarded: dropping those
    # WOULD change results
    reshard_index(idx, dst, new_dps, drop=("positions", "attrs"))
    out = search(dst, DOC_QUERIES, QueryConfig(k=k)).to_pandas()
    out["doc_id"] = out["conv_id"].str.slice(4).astype(np.int64)
    out["score_q6"] = np.floor(out["score"].to_numpy() * 1e6).astype(np.int64)
    out = out.sort_values(["query_id", "rank"]).reset_index(drop=True)
    return pa.Table.from_pandas(out[["query_id", "rank", "doc_id",
                                     "score_q6"]], preserve_index=False)


def transcripts_sft_with_history(sf_dir: str, n_buckets: int = 64) -> pa.Table:
    """SFT examples WITH full conversational context: for every
    assistant turn that has at least one preceding turn, prompt =
    newline-joined "role: text" of ALL prior turns in the conversation,
    response = the assistant turn — the chat-format SFT shape (history
    -> reply), complementing :func:`transcripts_sft_pairs`'s adjacent
    pairs.

    Same ONE conv-bucket shuffle; inside a bucket the kernel walks each
    conversation once, accumulating fragments (O(total chars) per conv;
    conversations are short by the input_hint's construction — the
    per-conv history is the OUTPUT, so no asymptotic slack exists to
    exploit). Output (conv_id, turn_idx, history, response)."""
    from bge_m3_onnx_ray.fixtures import transcripts_path
    from bge_m3_onnx_ray.hashing import P53, poly_hash
    path = transcripts_path(transcripts_n_turns(sf_dir))

    def add_bucket(t: pa.Table) -> pa.Table:
        b = poly_hash(t.column("conv_id"), P53) % np.uint64(n_buckets)
        return t.append_column("_cb", pa.array(b.astype(np.int64)))

    def per_bucket(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        tbl = g.take(pc.sort_indices(
            g, sort_keys=[("conv_id", "ascending"),
                          ("turn_idx", "ascending")]))
        conv = tbl.column("conv_id").to_pylist()
        turn = tbl.column("turn_idx").to_numpy()
        role = tbl.column("role").to_pylist()
        text = tbl.column("text").to_pylist()
        out_c, out_t, out_h, out_r = [], [], [], []
        acc: list[str] = []
        prev = None
        for i in range(len(conv)):
            if conv[i] != prev:
                acc, prev = [], conv[i]
            if role[i] == "assistant" and acc:
                out_c.append(conv[i])
                out_t.append(int(turn[i]))
                out_h.append("\n".join(acc))
                out_r.append(text[i])
            acc.append(f"{role[i]}: {text[i]}")
        return pa.table({"conv_id": pa.array(out_c, pa.string()),
                         "turn_idx": pa.array(out_t, pa.int32()),
                         "history": pa.array(out_h, pa.string()),
                         "response": pa.array(out_r, pa.string())})

    src = rd.read_parquet(path, columns=["conv_id", "turn_idx", "role",
                                         "text"])
    out = src.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("_cb").map_groups(per_bucket, batch_format="pyarrow") \
        .to_pandas()
    out = out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def dismax_documents_topk(sf_dir: str, k: int = 10,
                          tie: float = 0.3) -> pa.Table:
    """Top-k under disjunction-max scoring
    (``QueryConfig(dismax_tie=0.3)`` — Lucene's DisjunctionMaxQuery
    over the query terms: the best single term contribution dominates,
    the remaining terms contribute tie-broken). Same result/oracle
    conventions as :func:`bm25_documents_topk`."""
    key = "documents-" + os.path.basename(os.path.normpath(sf_dir))
    idx = _cached_index(documents_as_transcripts(sf_dir), key, _DOC_CFG)
    out = search(idx, DOC_QUERIES,
                 QueryConfig(k=k, method="exhaustive",
                             dismax_tie=tie)).to_pandas()
    out["doc_id"] = out["conv_id"].str.slice(4).astype(np.int64)
    out["score_q6"] = np.floor(out["score"].to_numpy() * 1e6).astype(np.int64)
    out = out.sort_values(["query_id", "rank"]).reset_index(drop=True)
    return pa.Table.from_pandas(out[["query_id", "rank", "doc_id", "score_q6"]],
                                preserve_index=False)


def bm25f_best_fields_topk(sf_dir: str, k: int = 10) -> pa.Table:
    """Multi-field best_fields top-k (Elasticsearch multi_match
    best_fields over the position-derived title/body fields): each
    field scores as its own BM25 query, the best field dominates and
    the other tie-breaks (tie=0.3). Same machinery and result shape as
    :func:`bm25f_documents_topk`."""
    return bm25f_documents_topk(sf_dir, k=k, mode="best_fields")


def bm25f_cross_fields_topk(sf_dir: str, k: int = 10) -> pa.Table:
    """Multi-field cross_fields top-k (Elasticsearch multi_match
    cross_fields with tie_breaker=0.3 over the position-derived
    title/body fields): TERM-centric — each query term takes the
    dis-max of its per-field BM25 contributions and the per-term
    results sum, so different terms may each win in a different field
    (the "first name in one field, last name in another" query shape
    neither best_fields nor blend can express). Same machinery and
    result shape as :func:`bm25f_documents_topk`."""
    return bm25f_documents_topk(sf_dir, k=k, mode="cross_fields")


def bm25_documents_topk_deduped(sf_dir: str, k: int = 10) -> pa.Table:
    """End-to-end training-data lifecycle in one key: exact-dedup the
    corpus (keep the canonical lowest-doc_id copy of each distinct
    text), REBUILD the index over only the survivors, search — global
    stats (N, avgdl, df) reflect the deduped corpus, so any leaked
    duplicate or wrong survivor set shifts every score and hash-fails.
    Composition of three first-class ops: ``stages.dedup.exact_dedup``
    -> ``stages.relational.semi_anti_join`` (corpus ⋉ canonical ids,
    one hash-bucket shuffle) -> the standard build/search."""
    from bge_m3_onnx_ray.stages.dedup import exact_dedup
    from bge_m3_onnx_ray.stages.relational import semi_anti_join
    key = "documents-deduped-" + os.path.basename(os.path.normpath(sf_dir))
    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    canonical = exact_dedup(docs)        # (doc_id, n_dups): survivors
    survivors = semi_anti_join(docs, canonical, "doc_id", "doc_id")
    corpus = survivors.map_batches(_doc_rows_to_transcript,
                                   batch_format="pyarrow")
    idx = _cached_index(corpus, key, _DOC_CFG)
    out = search(idx, DOC_QUERIES, QueryConfig(k=k)).to_pandas()
    out["doc_id"] = out["conv_id"].str.slice(4).astype(np.int64)
    out["score_q6"] = np.floor(out["score"].to_numpy() * 1e6).astype(np.int64)
    out = out.sort_values(["query_id", "rank"]).reset_index(drop=True)
    return pa.Table.from_pandas(out[["query_id", "rank", "doc_id", "score_q6"]],
                                preserve_index=False)


def prf_documents_topk(sf_dir: str, k: int = 10, fb_docs: int = 10,
                       fb_terms: int = 3, fb_boost: float = 0.5) -> pa.Table:
    """Pseudo-relevance feedback (Rocchio query expansion): a first BM25
    pass fetches each query's top ``fb_docs`` documents; the
    ``fb_terms`` strongest non-query terms ACROSS those documents —
    ranked by the integer sum of their quantized per-doc BM25 weights
    (floor(idf * sat(tf, dl) * 1e6), the ``doc_term_weights``
    arithmetic, so expansion selection is integer-exact on both sides)
    — join the query at weight ``fb_boost`` via the existing term-boost
    machinery, and the final ranking is the boosted second pass. The
    classic two-pass feedback loop, composed entirely from shipped
    pieces (search, dictionary df lookup, parse_boost).

    Scale shape: the feedback fetch reads only the top-doc rows from
    the corpus (predicate-pushdown filter), term dfs come from the
    bucketed dictionary scan, and both passes are the standard
    distributed search."""
    import math

    import pyarrow.compute as pc

    from bge_m3_onnx_ray.index.artifacts import IndexMeta
    from bge_m3_onnx_ray.tokenizer import tokenize

    key = "documents-" + os.path.basename(os.path.normpath(sf_dir))
    idx = _cached_index(documents_as_transcripts(sf_dir), key, _DOC_CFG)
    meta = IndexMeta(idx)

    first = search(idx, DOC_QUERIES, QueryConfig(k=fb_docs)).to_pandas()
    if not len(first):
        first = first.assign(doc_id=[])
    first["doc_id"] = first["conv_id"].str.slice(4).astype(np.int64)
    fb_ids = np.unique(first["doc_id"].to_numpy()) if len(first) \
        else np.empty(0, np.int64)

    # tokenize ONLY the feedback docs (predicate-pushdown read)
    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"]) \
        .map_batches(lambda t: t.filter(
            pc.is_in(t["doc_id"], value_set=pa.array(fb_ids, pa.int64()))),
            batch_format="pyarrow").to_pandas()
    toks = {int(r.doc_id): tokenize(r.text) for r in docs.itertuples()}
    dfs_needed = sorted({t for ts in toks.values() for t in ts})
    dfs = meta.load_term_dfs(dfs_needed)
    n, avgdl = float(meta.n_docs), meta.avgdl

    def wq6(term: str, tf: int, dl: int) -> int:
        i = math.log((n - dfs[term] + 0.5) / (dfs[term] + 0.5) + 1.0)
        return int(np.floor(i * (tf * 2.2)
                            / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
                            * 1e6))

    expanded = []
    for qid, text in DOC_QUERIES:
        orig = sorted(set(tokenize(text)))
        cand: dict[str, int] = {}
        g = first[first.query_id == qid]
        for d in g["doc_id"]:
            ts = toks.get(int(d), [])
            dl = len(ts)
            from collections import Counter
            for t, tf in Counter(ts).items():
                if t in orig or t not in dfs:
                    continue
                cand[t] = cand.get(t, 0) + wq6(t, tf, dl)
        exp = sorted(cand.items(), key=lambda kv: (-kv[1], kv[0]))[:fb_terms]
        qtext = " ".join(orig + [f"{t}^{fb_boost}" for t, _ in exp])
        expanded.append((qid, qtext))

    out = search(idx, expanded,
                 QueryConfig(k=k, method="exhaustive",
                             parse_boost=True)).to_pandas()
    out["doc_id"] = out["conv_id"].str.slice(4).astype(np.int64)
    out["score_q6"] = np.floor(out["score"].to_numpy() * 1e6).astype(np.int64)
    out = out.sort_values(["query_id", "rank"]).reset_index(drop=True)
    return pa.Table.from_pandas(out[["query_id", "rank", "doc_id", "score_q6"]],
                                preserve_index=False)
