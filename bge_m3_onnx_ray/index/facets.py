"""Facet-count aggregations over the FULL match set — the search-engine
"aggregations" companion to top-k retrieval (Elasticsearch terms aggs /
Solr facet.field): for each query, how many matching documents carry
each value of a document attribute.

Distribution model mirrors ``index/search.py``: the index is
document-sharded, every doc lives in exactly one shard, and the attrs
side table (``index/attrs.py``) is sharded the same way — so a per-shard
``np.unique`` over the query's candidate docIDs followed by a bincount
over the shard's dictionary-encoded attribute codes yields EXACT
distinct-doc counts with no cross-shard coordination. The only shuffle
is the tiny (query_id, value) partial-count reduce, which is
low-cardinality by construction (values are facet labels).

At 100 TB this is the same shape: counting never decodes text, never
ranks, and moves only (query, value, count) triples; a hot query's cost
is one postings read per shard it actually matches in.

The reference has no aggregations (it is a record-at-a-time embedder);
this extends its retrieval surface the way production engines do.
"""

from __future__ import annotations

from collections import OrderedDict

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from bge_m3_onnx_ray.config import QueryConfig
from bge_m3_onnx_ray.index.artifacts import IndexMeta
from bge_m3_onnx_ray.index.attrs import attrs_file
from bge_m3_onnx_ray.index.codec import decode_postings
from bge_m3_onnx_ray.index.search import ShardScorer

_PARTIAL_SCHEMA = pa.schema([
    ("query_id", pa.int64()),
    ("value", pa.string()),
    ("count", pa.int64()),
])

RESULT_SCHEMA = pa.schema([
    ("query_id", pa.int64()),
    ("value", pa.string()),
    ("n_docs", pa.int64()),
])


class FacetCounter:
    """Per-(query, shard) matching-doc counter by attribute value.

    Reuses :class:`ShardScorer`'s postings / tombstone LRU machinery for
    the candidate set (``idfs`` is irrelevant — nothing is scored), and
    holds the shard's attribute column dictionary-encoded: docIDs sorted,
    values as integer codes, so counting is searchsorted + bincount."""

    def __init__(self, index_dir: str, col: str, cache_size: int = 64):
        self._sc = ShardScorer(index_dir, idfs={}, k=1, method="exhaustive",
                               cache_size=cache_size)
        self.meta = self._sc.meta
        self.col = col
        self.cache_size = cache_size
        self._attr_cache: OrderedDict[int, tuple] = OrderedDict()

    def _attrs(self, shard: int) -> tuple[np.ndarray, np.ndarray, list[str]]:
        got = self._attr_cache.get(shard)
        if got is None:
            path = attrs_file(self.meta.index_dir, self.col, shard)
            try:
                t = pq.read_table(path)
            except (FileNotFoundError, OSError):
                got = (np.empty(0, np.int64), np.empty(0, np.int64), [])
            else:
                enc = t.column(self.col).combine_chunks().dictionary_encode()
                # numeric attrs (e.g. a derived epoch-day histogram key)
                # count fine — their values surface as decimal strings
                got = (t.column("doc_id").to_numpy().astype(np.int64),
                       enc.indices.to_numpy().astype(np.int64),
                       enc.dictionary.cast(pa.string()).to_pylist())
            self._attr_cache[shard] = got
            while len(self._attr_cache) > self.cache_size:
                self._attr_cache.popitem(last=False)
        else:
            self._attr_cache.move_to_end(shard)
        return got

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_q: list[int] = []
        out_v: list[str] = []
        out_c: list[int] = []
        qids = batch.column("query_id").to_pylist()
        termss = batch.column("terms").to_pylist()
        shards = batch.column("shard").to_pylist()
        dec_memo: dict[tuple[int, str], tuple] = {}
        for qid, terms, shard in zip(qids, termss, shards):
            shard = int(shard)
            post = self._sc._shard_postings(shard, list(terms))
            docs = []
            for t in terms:
                e = post.get(t)
                if e is None:
                    continue
                got = dec_memo.get((shard, t))
                if got is None:
                    got = dec_memo[(shard, t)] = decode_postings(
                        e, self.meta.block_size)
                docs.append(got[0])
            if not docs:
                continue
            cand = np.unique(np.concatenate(docs))
            if self._sc._has_tombstones:
                dele = self._sc._deleted(shard)
                if len(dele) and len(cand):
                    pos = np.searchsorted(dele, cand)
                    hit = pos < len(dele)
                    hit[hit] = dele[pos[hit]] == cand[hit]
                    cand = cand[~hit]
            adocs, codes, vals = self._attrs(shard)
            if not len(adocs) or not len(cand):
                continue
            pos = np.searchsorted(adocs, cand)
            ok = pos < len(adocs)
            ok[ok] = adocs[pos[ok]] == cand[ok]
            cnt = np.bincount(codes[pos[ok]], minlength=len(vals))
            nz = np.flatnonzero(cnt)
            out_q.extend([int(qid)] * len(nz))
            out_v.extend(vals[i] for i in nz)
            out_c.extend(cnt[nz].tolist())
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "value": pa.array(out_v, pa.string()),
                         "count": pa.array(out_c, pa.int64())},
                        schema=_PARTIAL_SCHEMA)


def facet_counts(index_dir: str, queries, col: str,
                 cfg: QueryConfig | None = None) -> rd.Dataset:
    """For each query, the number of matching documents (OR semantics —
    a doc containing ANY query term matches; tombstoned docs excluded)
    per value of attribute ``col``. Returns a Dataset of
    (query_id, value, n_docs).

    ``queries``: list[(query_id, text)] or a pa.Table with those
    columns. Counts are exact distinct-doc counts: a doc lives in
    exactly one shard, so per-shard unique + one low-cardinality
    (query_id, value) reduce is the whole job."""
    cfg = cfg or QueryConfig()
    meta = IndexMeta(index_dir)
    from bge_m3_onnx_ray.tokenizer import make_tokenizer
    tok = make_tokenizer(meta.stats.get("tokenizer_spec", "deterministic"))
    if isinstance(queries, pa.Table):
        queries = zip(queries.column("query_id").to_pylist(),
                      queries.column("text").to_pylist())
    qterms = {int(q): sorted(set(tok.tokenize(str(t)))) for q, t in queries}
    pairs = [{"query_id": qid, "terms": ts, "shard": s}
             for s in meta.shards
             for qid, ts in qterms.items() if ts]
    if not pairs:
        return rd.from_arrow(RESULT_SCHEMA.empty_table())
    fanout = rd.from_items(sorted(pairs, key=lambda r: r["shard"]))
    partials = fanout.map_batches(
        FacetCounter,
        fn_constructor_kwargs={"index_dir": index_dir, "col": col,
                               "cache_size": cfg.shard_cache_size},
        batch_format="pyarrow", batch_size=cfg.scorer_batch_size,
        concurrency=cfg.scorer_concurrency, num_cpus=1)
    from bge_m3_onnx_ray.stages._groups import bucket_reduce
    return bucket_reduce(partials, ["query_id", "value"],
                         [("count", "sum", "n_docs")], n_buckets=32)


class _CountMatches(FacetCounter):
    """FacetCounter's candidate machinery, counting candidates directly
    instead of joining the attrs table (see :func:`match_counts`)."""

    def __init__(self, index_dir: str, cache_size: int = 64):
        super().__init__(index_dir, col="", cache_size=cache_size)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_q, out_c = [], []
        dec_memo: dict[tuple[int, str], tuple] = {}
        for qid, terms, shard in zip(
                batch.column("query_id").to_pylist(),
                batch.column("terms").to_pylist(),
                batch.column("shard").to_pylist()):
            shard = int(shard)
            post = self._sc._shard_postings(shard, list(terms))
            docs = []
            for t in terms:
                e = post.get(t)
                if e is None:
                    continue
                got = dec_memo.get((shard, t))
                if got is None:
                    got = dec_memo[(shard, t)] = decode_postings(
                        e, self.meta.block_size)
                docs.append(got[0])
            if not docs:
                continue
            cand = np.unique(np.concatenate(docs))
            if self._sc._has_tombstones:
                dele = self._sc._deleted(shard)
                if len(dele) and len(cand):
                    pos = np.searchsorted(dele, cand)
                    hit = pos < len(dele)
                    hit[hit] = dele[pos[hit]] == cand[hit]
                    cand = cand[~hit]
            out_q.append(int(qid))
            out_c.append(int(len(cand)))
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "count": pa.array(out_c, pa.int64())})


class _MatchingDocs(_CountMatches):
    """Candidate machinery emitting the (query_id, doc_id) match rows
    themselves (see :func:`matching_docs`)."""

    def __call__(self, batch: pa.Table) -> pa.Table:  # noqa: D102
        out_q, out_d = [], []
        dec_memo: dict[tuple[int, str], tuple] = {}
        for qid, terms, shard in zip(
                batch.column("query_id").to_pylist(),
                batch.column("terms").to_pylist(),
                batch.column("shard").to_pylist()):
            shard = int(shard)
            post = self._sc._shard_postings(shard, list(terms))
            docs = []
            for t in terms:
                e = post.get(t)
                if e is None:
                    continue
                got = dec_memo.get((shard, t))
                if got is None:
                    got = dec_memo[(shard, t)] = decode_postings(
                        e, self.meta.block_size)
                docs.append(got[0])
            if not docs:
                continue
            cand = np.unique(np.concatenate(docs))
            if self._sc._has_tombstones:
                dele = self._sc._deleted(shard)
                if len(dele) and len(cand):
                    pos = np.searchsorted(dele, cand)
                    hit = pos < len(dele)
                    hit[hit] = dele[pos[hit]] == cand[hit]
                    cand = cand[~hit]
            out_q.extend([int(qid)] * len(cand))
            out_d.extend(cand.tolist())
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "doc_id": pa.array(out_d, pa.int64())})


class _MatchGrades(_CountMatches):
    """GRADED candidate machinery: a candidate doc's grade for a query
    is its count of DISTINCT matched query terms (1..n_terms) — free
    from the same per-term postings decode as :class:`_CountMatches`
    (each term's doc list is unique per doc, so occurrence counts over
    the concatenation ARE the distinct-match grades).

    Histogram mode (default): emits (query_id, grade, count) partials —
    the exact per-query grade distribution at any corpus size without
    ever materializing match rows (the ideal-DCG input). Rows mode
    (``allow``: (query_id, sorted global docID array) pairs): emits
    (query_id, doc_id, grade) for just the allowed docs (the observed-
    DCG input, <= n_queries x k rows corpus-wide)."""

    def __init__(self, index_dir: str, allow: tuple = (),
                 cache_size: int = 64, emit_hist: bool = False):
        super().__init__(index_dir, cache_size=cache_size)
        self.allow = {int(q): np.asarray(a, np.int64) for q, a in allow}
        # fused mode (allow + emit_hist): one postings scan emits BOTH
        # nDCG inputs — doc-restricted grade rows (kind=0, key=doc_id,
        # val=grade) and grade-histogram partials (kind=1, key=grade,
        # val=count) — instead of two identical scans
        self.emit_hist = bool(emit_hist)

    def __call__(self, batch: pa.Table) -> pa.Table:  # noqa: D102
        rows_mode = bool(self.allow)
        out_q: list[int] = []
        out_k: list[int] = []
        out_v: list[int] = []
        out_kind: list[int] = []
        dec_memo: dict[tuple[int, str], tuple] = {}
        for qid, terms, shard in zip(
                batch.column("query_id").to_pylist(),
                batch.column("terms").to_pylist(),
                batch.column("shard").to_pylist()):
            shard = int(shard)
            post = self._sc._shard_postings(shard, list(terms))
            docs = []
            for t in terms:
                e = post.get(t)
                if e is None:
                    continue
                got = dec_memo.get((shard, t))
                if got is None:
                    got = dec_memo[(shard, t)] = decode_postings(
                        e, self.meta.block_size)
                docs.append(got[0])
            if not docs:
                continue
            cand, grades = np.unique(np.concatenate(docs),
                                     return_counts=True)
            if self._sc._has_tombstones:
                dele = self._sc._deleted(shard)
                if len(dele) and len(cand):
                    pos = np.searchsorted(dele, cand)
                    hit = pos < len(dele)
                    hit[hit] = dele[pos[hit]] == cand[hit]
                    cand, grades = cand[~hit], grades[~hit]
            if not len(cand):
                continue
            if rows_mode:
                al = self.allow.get(int(qid))
                if al is not None and len(al):
                    pos = np.searchsorted(cand, al)
                    pos_c = np.minimum(pos, len(cand) - 1)
                    hit = (pos < len(cand)) & (cand[pos_c] == al)
                    out_q.extend([int(qid)] * int(hit.sum()))
                    out_k.extend(al[hit].tolist())
                    out_v.extend(grades[pos_c[hit]].tolist())
                    if self.emit_hist:
                        out_kind.extend([0] * int(hit.sum()))
            if (not rows_mode) or self.emit_hist:
                hist = np.bincount(grades)
                gs = np.nonzero(hist)[0]
                out_q.extend([int(qid)] * len(gs))
                out_k.extend(gs.tolist())
                out_v.extend(hist[gs].tolist())
                if self.emit_hist:
                    out_kind.extend([1] * len(gs))
        if self.emit_hist:
            return pa.table({"query_id": pa.array(out_q, pa.int64()),
                             "kind": pa.array(out_kind, pa.int64()),
                             "key": pa.array(out_k, pa.int64()),
                             "val": pa.array(out_v, pa.int64())})
        kname, vname = (("doc_id", "grade") if rows_mode
                        else ("grade", "count"))
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         kname: pa.array(out_k, pa.int64()),
                         vname: pa.array(out_v, pa.int64())})


def match_grade_histogram(index_dir: str, queries,
                          cfg: QueryConfig | None = None) -> rd.Dataset:
    """Per-query distribution of match grades (distinct matched query
    terms) over the LIVE corpus: (query_id, grade, n_docs). The ideal-
    ranking input for graded nDCG — a doc lives in exactly one shard,
    so per-shard histograms sum exactly; result size is bounded by
    n_queries x n_query_terms regardless of corpus size."""
    cfg = cfg or QueryConfig()
    meta = IndexMeta(index_dir)
    from bge_m3_onnx_ray.tokenizer import make_tokenizer
    tok = make_tokenizer(meta.stats.get("tokenizer_spec", "deterministic"))
    qterms = {int(q): sorted(set(tok.tokenize(str(t)))) for q, t in queries}
    pairs = [{"query_id": qid, "terms": ts, "shard": s}
             for s in meta.shards
             for qid, ts in qterms.items() if ts]
    if not pairs:
        return rd.from_arrow(pa.schema([
            ("query_id", pa.int64()), ("grade", pa.int64()),
            ("n_docs", pa.int64())]).empty_table())
    fanout = rd.from_items(sorted(pairs, key=lambda r: r["shard"]))
    partials = fanout.map_batches(
        _MatchGrades,
        fn_constructor_kwargs={"index_dir": index_dir,
                               "cache_size": cfg.shard_cache_size},
        batch_format="pyarrow", batch_size=cfg.scorer_batch_size,
        concurrency=cfg.scorer_concurrency, num_cpus=1)
    from bge_m3_onnx_ray.stages._groups import bucket_reduce
    return bucket_reduce(partials, ["query_id", "grade"],
                         [("count", "sum", "n_docs")], n_buckets=16)


def match_grades(index_dir: str, queries, allow: dict,
                 cfg: QueryConfig | None = None) -> rd.Dataset:
    """Match grades for a RESTRICTED doc set: (query_id, doc_id, grade)
    for just ``allow``'s (query_id -> sorted global docID array) docs —
    the observed-ranking input for graded nDCG (<= n_queries x k rows).
    No reduce needed: a doc lives in exactly one shard."""
    cfg = cfg or QueryConfig()
    meta = IndexMeta(index_dir)
    from bge_m3_onnx_ray.tokenizer import make_tokenizer
    tok = make_tokenizer(meta.stats.get("tokenizer_spec", "deterministic"))
    qterms = {int(q): sorted(set(tok.tokenize(str(t)))) for q, t in queries}
    pairs = [{"query_id": qid, "terms": ts, "shard": s}
             for s in meta.shards
             for qid, ts in qterms.items() if ts]
    if not pairs:
        return rd.from_arrow(pa.schema([
            ("query_id", pa.int64()), ("doc_id", pa.int64()),
            ("grade", pa.int64())]).empty_table())
    fanout = rd.from_items(sorted(pairs, key=lambda r: r["shard"]))
    return fanout.map_batches(
        _MatchGrades,
        fn_constructor_kwargs={
            "index_dir": index_dir,
            "allow": tuple((int(q), np.asarray(a, np.int64))
                           for q, a in sorted(allow.items())),
            "cache_size": cfg.shard_cache_size},
        batch_format="pyarrow", batch_size=cfg.scorer_batch_size,
        concurrency=cfg.scorer_concurrency, num_cpus=1)


def match_grades_and_histogram(index_dir: str, queries, allow: dict,
                               cfg: QueryConfig | None = None) -> rd.Dataset:
    """BOTH nDCG inputs from ONE postings scan: (query_id, kind, key,
    val) rows where kind=0 carries doc-restricted grade rows (key =
    doc_id, val = grade; <= n_queries x k corpus-wide) and kind=1
    carries per-(query, shard) grade-histogram PARTIALS (key = grade,
    val = count; <= n_query_terms rows per (query, shard)). rank_eval
    previously paid two identical scans + a reduce exchange for these;
    the caller sums kind=1 partials per (query_id, key) — bounded by
    n_shards x n_query_terms rows, driver-safe for interactive query
    sets (route through :func:`match_grade_histogram`'s distributed
    reduce instead at 10^5+-shard indexes)."""
    cfg = cfg or QueryConfig()
    meta = IndexMeta(index_dir)
    from bge_m3_onnx_ray.tokenizer import make_tokenizer
    tok = make_tokenizer(meta.stats.get("tokenizer_spec", "deterministic"))
    qterms = {int(q): sorted(set(tok.tokenize(str(t)))) for q, t in queries}
    pairs = [{"query_id": qid, "terms": ts, "shard": s}
             for s in meta.shards
             for qid, ts in qterms.items() if ts]
    if not pairs:
        return rd.from_arrow(pa.schema([
            ("query_id", pa.int64()), ("kind", pa.int64()),
            ("key", pa.int64()), ("val", pa.int64())]).empty_table())
    fanout = rd.from_items(sorted(pairs, key=lambda r: r["shard"]))
    return fanout.map_batches(
        _MatchGrades,
        fn_constructor_kwargs={
            "index_dir": index_dir,
            "allow": tuple((int(q), np.asarray(a, np.int64))
                           for q, a in sorted(allow.items())),
            "emit_hist": True,
            "cache_size": cfg.shard_cache_size},
        batch_format="pyarrow", batch_size=cfg.scorer_batch_size,
        concurrency=cfg.scorer_concurrency, num_cpus=1)


def matching_docs(index_dir: str, queries,
                  cfg: QueryConfig | None = None) -> rd.Dataset:
    """The full OR match set per query as (query_id, doc_id) rows —
    feeds set-shaped analytics (significant terms). Scale note: for
    stopword-grade queries this is corpus-sized by definition; sample
    first (stages.text hash sampling) when the match set must be
    bounded."""
    cfg = cfg or QueryConfig()
    meta = IndexMeta(index_dir)
    from bge_m3_onnx_ray.tokenizer import make_tokenizer
    tok = make_tokenizer(meta.stats.get("tokenizer_spec", "deterministic"))
    qterms = {int(q): sorted(set(tok.tokenize(str(t)))) for q, t in queries}
    pairs = [{"query_id": qid, "terms": ts, "shard": s}
             for s in meta.shards
             for qid, ts in qterms.items() if ts]
    if not pairs:
        return rd.from_arrow(pa.schema([
            ("query_id", pa.int64()),
            ("doc_id", pa.int64())]).empty_table())
    fanout = rd.from_items(sorted(pairs, key=lambda r: r["shard"]))
    return fanout.map_batches(
        _MatchingDocs,
        fn_constructor_kwargs={"index_dir": index_dir,
                               "cache_size": cfg.shard_cache_size},
        batch_format="pyarrow", batch_size=cfg.scorer_batch_size,
        concurrency=cfg.scorer_concurrency, num_cpus=1)


def match_counts(index_dir: str, queries,
                 cfg: QueryConfig | None = None) -> rd.Dataset:
    """Total-hit counts (Elasticsearch ``track_total_hits``): per query,
    the exact number of live documents matching ANY query term. Same
    per-(query, shard) fan-out as :func:`facet_counts` but without the
    attribute join — a doc lives in exactly one shard, so per-shard
    candidate counts sum exactly. Returns (query_id, n_matches)."""
    cfg = cfg or QueryConfig()
    meta = IndexMeta(index_dir)
    from bge_m3_onnx_ray.tokenizer import make_tokenizer
    tok = make_tokenizer(meta.stats.get("tokenizer_spec", "deterministic"))
    if isinstance(queries, pa.Table):
        queries = zip(queries.column("query_id").to_pylist(),
                      queries.column("text").to_pylist())
    qterms = {int(q): sorted(set(tok.tokenize(str(t)))) for q, t in queries}
    pairs = [{"query_id": qid, "terms": ts, "shard": s}
             for s in meta.shards
             for qid, ts in qterms.items() if ts]
    if not pairs:
        return rd.from_arrow(pa.schema([
            ("query_id", pa.int64()),
            ("n_matches", pa.int64())]).empty_table())
    fanout = rd.from_items(sorted(pairs, key=lambda r: r["shard"]))
    partials = fanout.map_batches(
        _CountMatches,
        fn_constructor_kwargs={"index_dir": index_dir,
                               "cache_size": cfg.shard_cache_size},
        batch_format="pyarrow", batch_size=cfg.scorer_batch_size,
        concurrency=cfg.scorer_concurrency, num_cpus=1)
    from bge_m3_onnx_ray.stages._groups import bucket_reduce
    return bucket_reduce(partials, ["query_id"],
                         [("count", "sum", "n_matches")], n_buckets=16)


SORT_RESULT_SCHEMA = pa.schema([
    ("query_id", pa.int64()),
    ("rank", pa.int32()),
    ("doc_id", pa.int64()),
    ("sort_value", pa.int64()),
])


class AttrTopK:
    """Per-(query, shard) top-k MATCHING docs ordered by an INTEGER
    document attribute instead of relevance (the Elasticsearch ``sort``
    clause: "newest matches first"). Candidates = OR match set (any
    query term, tombstones excluded), exactly :class:`FacetCounter`'s;
    ordering is (attr desc|asc, doc_id asc) — integer-exact, so the
    oracle gate needs no quantization."""

    def __init__(self, index_dir: str, col: str, k: int,
                 descending: bool = True, cache_size: int = 64):
        self._sc = ShardScorer(index_dir, idfs={}, k=1, method="exhaustive",
                               cache_size=cache_size)
        self.meta = self._sc.meta
        self.col = col
        self.k = k
        self.descending = descending
        self.cache_size = cache_size
        self._attr_cache: OrderedDict[int, tuple] = OrderedDict()

    def _attrs(self, shard: int) -> tuple[np.ndarray, np.ndarray]:
        got = self._attr_cache.get(shard)
        if got is None:
            path = attrs_file(self.meta.index_dir, self.col, shard)
            try:
                t = pq.read_table(path)
            except (FileNotFoundError, OSError):
                # unlike facet counting (where an absent value is a zero
                # count), a missing attrs shard would silently corrupt a
                # GLOBAL ordering — fail loudly instead
                raise FileNotFoundError(
                    f"attrs table for {self.col!r} missing for shard "
                    f"{shard} ({path}); run index.attrs.build_doc_attrs "
                    f"before sort_by_attr") from None
            col = t.column(self.col)
            if not pa.types.is_integer(col.type):
                raise TypeError(
                    f"sort_by_attr needs an integer attribute; "
                    f"{self.col!r} is {col.type}")
            got = (t.column("doc_id").to_numpy().astype(np.int64),
                   col.to_numpy().astype(np.int64))
            self._attr_cache[shard] = got
            while len(self._attr_cache) > self.cache_size:
                self._attr_cache.popitem(last=False)
        else:
            self._attr_cache.move_to_end(shard)
        return got

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_q: list[int] = []
        out_d: list[int] = []
        out_v: list[int] = []
        qids = batch.column("query_id").to_pylist()
        termss = batch.column("terms").to_pylist()
        shards = batch.column("shard").to_pylist()
        dec_memo: dict[tuple[int, str], tuple] = {}
        for qid, terms, shard in zip(qids, termss, shards):
            shard = int(shard)
            post = self._sc._shard_postings(shard, list(terms))
            docs = []
            for t in terms:
                e = post.get(t)
                if e is None:
                    continue
                got = dec_memo.get((shard, t))
                if got is None:
                    got = dec_memo[(shard, t)] = decode_postings(
                        e, self.meta.block_size)
                docs.append(got[0])
            if not docs:
                continue
            cand = np.unique(np.concatenate(docs))
            if self._sc._has_tombstones:
                dele = self._sc._deleted(shard)
                if len(dele) and len(cand):
                    pos = np.searchsorted(dele, cand)
                    hit = pos < len(dele)
                    hit[hit] = dele[pos[hit]] == cand[hit]
                    cand = cand[~hit]
            adocs, avals = self._attrs(shard)
            if not len(adocs) or not len(cand):
                continue
            pos = np.searchsorted(adocs, cand)
            ok = pos < len(adocs)
            ok[ok] = adocs[pos[ok]] == cand[ok]
            mdocs = cand[ok]
            mvals = avals[pos[ok]]
            order = np.lexsort((mdocs, -mvals if self.descending
                                else mvals))[:self.k]
            out_q.extend([int(qid)] * len(order))
            out_d.extend(mdocs[order].tolist())
            out_v.extend(mvals[order].tolist())
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "doc_id": pa.array(out_d, pa.int64()),
                         "sort_value": pa.array(out_v, pa.int64())})


def sort_by_attr(index_dir: str, queries, col: str, k: int = 10,
                 descending: bool = True,
                 cfg: QueryConfig | None = None) -> rd.Dataset:
    """For each query, the top-k MATCHING documents ordered by an
    integer document attribute (not by relevance) — the search-engine
    "sort by field" clause. Exact under document sharding: each shard
    emits its local attr-top-k over its matching docs, and the merge
    (one tiny query-bucketed shuffle) re-ranks the union. Output
    (query_id, rank, doc_id, sort_value); both rank key and value are
    integers, so results are exactly reproducible (no score
    quantization)."""
    cfg = cfg or QueryConfig()
    meta = IndexMeta(index_dir)
    from bge_m3_onnx_ray.tokenizer import make_tokenizer
    tok = make_tokenizer(meta.stats.get("tokenizer_spec", "deterministic"))
    if isinstance(queries, pa.Table):
        queries = zip(queries.column("query_id").to_pylist(),
                      queries.column("text").to_pylist())
    qterms = {int(q): sorted(set(tok.tokenize(str(t)))) for q, t in queries}
    pairs = [{"query_id": qid, "terms": ts, "shard": s}
             for s in meta.shards
             for qid, ts in qterms.items() if ts]
    if not pairs:
        return rd.from_arrow(SORT_RESULT_SCHEMA.empty_table())
    fanout = rd.from_items(sorted(pairs, key=lambda r: r["shard"]))
    partials = fanout.map_batches(
        AttrTopK,
        fn_constructor_kwargs={"index_dir": index_dir, "col": col, "k": k,
                               "descending": descending,
                               "cache_size": cfg.shard_cache_size},
        batch_format="pyarrow", batch_size=cfg.scorer_batch_size,
        concurrency=cfg.scorer_concurrency, num_cpus=1)

    sign = -1 if descending else 1

    def add_bucket(t: pa.Table) -> pa.Table:
        q = t.column("query_id").to_numpy().astype(np.uint64)
        b = (q * np.uint64(2654435761)) % np.uint64(256)
        return t.append_column("_qb", pa.array(b.astype(np.int64)))

    def multi_merge(group: pa.Table) -> pa.Table:
        qs = group.column("query_id").to_numpy()
        vals = group.column("sort_value").to_numpy()
        docs = group.column("doc_id").to_numpy()
        order = np.lexsort((docs, sign * vals, qs))
        qs, vals, docs = qs[order], vals[order], docs[order]
        brk = np.empty(len(qs), bool)
        brk[0] = True
        brk[1:] = np.diff(qs) != 0
        first = np.flatnonzero(brk)
        rank = np.arange(len(qs)) - np.repeat(first, np.diff(
            np.concatenate([first, [len(qs)]])))
        keep = rank < k
        return pa.table({
            "query_id": pa.array(qs[keep], pa.int64()),
            "rank": pa.array((rank[keep] + 1).astype(np.int32), pa.int32()),
            "doc_id": pa.array(docs[keep], pa.int64()),
            "sort_value": pa.array(vals[keep], pa.int64()),
        }, schema=SORT_RESULT_SCHEMA)

    return partials.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("_qb").map_groups(multi_merge, batch_format="pyarrow")
