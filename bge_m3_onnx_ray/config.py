"""Config surface for the engine.

Mirrors the reference's config-object + factory pattern
(``samples/dotnet/BgeM3.Onnx/M3EmbedderConfig.cs:8-39``,
``samples/python/bge_m3_embedder.py:179-186``): a pair of small
dataclasses with sensible factories instead of constructor soup.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field


@dataclass(frozen=True)
class IndexConfig:
    """Parameters of an index build.

    ``docs_per_shard`` is the document-sharding unit: every shard holds a
    complete sub-index over a contiguous docID range, which is what makes
    (a) the ``groupby`` merge skew-bounded (a hot term's postings are
    split across shards — deterministic salting by doc range), (b) the
    query side trivially parallel (one WAND run per shard, merge top-k),
    and (c) the build resumable per shard. At 100 TB this is the unit
    that maps to "partition of the cluster"; in the sandbox it is small.
    """

    k1: float = 1.2
    b: float = 0.75
    # tokenizer seam (SURVEY.md §7.3): "deterministic" | "vocab" |
    # "vocab:<path>" — see tokenizer.make_tokenizer. Part of the config
    # fingerprint, so changing it invalidates resume; recorded in
    # stats.json so the query side always tokenizes with the index's own
    # tokenizer.
    tokenizer_spec: str = "deterministic"
    docs_per_shard: int = 131072
    # term buckets per shard: bounds the size of one merge group to
    # ~(docs_per_shard * avg_doc_len / term_buckets) postings.
    term_buckets: int = 4
    block_size: int = 128  # postings entries per skip block
    tokenize_batch_size: int = 32768
    tokenize_concurrency: int | tuple[int, int] = (2, 8)
    # "tasks": warm task pool (no actor-startup cost; right for a
    # stateless tokenizer). "actors": actor pool (right when the
    # tokenizer loads a real vocabulary/model once per worker).
    tokenize_compute: str = "tasks"
    # reserved token ids 0-3 ([PAD],[UNK],[CLS],[SEP]) — kept so the term-id
    # space lines up with the reference's special-token filter
    # (reference samples/python/bge_m3_embedder.py:30).
    n_reserved_ids: int = 4

    def fingerprint(self) -> str:
        payload = {k: v for k, v in asdict(self).items()
                   if k not in ("tokenize_batch_size", "tokenize_concurrency",
                                "tokenize_compute")}
        return hashlib.sha256(
            json.dumps(payload, sort_keys=True).encode()).hexdigest()[:16]


@dataclass(frozen=True)
class QueryConfig:
    k: int = 10
    method: str = "wand"  # "wand" | "exhaustive"
    # pluggable similarity (the Lucene Similarity seam): "bm25"
    # (default) or "classic" (pre-BM25 TF-IDF: idf^2 * sqrt(tf)/
    # sqrt(dl)); classic requires method="exhaustive", mode="or"
    similarity: str = "bm25"
    # "or" (default, rank by summed BM25) | "and" (conjunctive: only docs
    # containing EVERY query term are candidates; scores are the same
    # BM25 sums, so an AND result is the OR result restricted to the
    # full-coverage docs)
    mode: str = "or"
    # faceted search: equality predicate on a doc attribute built with
    # index.attrs.build_doc_attrs — e.g. ("role", "user"). Global stats
    # (df/avgdl) stay corpus-wide (standard facet semantics: the filter
    # narrows candidates, not the scoring model).
    filter_attr: str | None = None
    filter_value: str | None = None
    # numeric range facet: (col, lo, hi) inclusive both ends (SQL
    # BETWEEN). Composes with filter_attr by intersection; same
    # corpus-wide-stats semantics.
    filter_range: tuple[str, int, int] | None = None
    # negation syntax: when True, whitespace-separated "-word" tokens in
    # the query text EXCLUDE documents containing that term (applied to
    # the candidate set before top-k; out-of-vocabulary negations are
    # no-ops). Off by default so hyphenated text is never misparsed.
    parse_negation: bool = False
    # prefix syntax: when True, whitespace-separated "word*" tokens
    # expand to every dictionary term with that prefix (disjunctive
    # BM25 over the expansion — the classic wildcard query). Off by
    # default so asterisks in text are never misparsed.
    parse_prefix: bool = False
    # safety cap on one prefix's expansion (raise, don't truncate: a
    # silent cut would diverge from the oracle and from user intent);
    # shared by the wildcard and regex expansions below
    max_prefix_expansion: int = 10_000
    # generalized wildcard syntax (Lucene WildcardQuery): when True, a
    # whitespace-separated word containing '*' ANYWHERE ("*fix",
    # "*mid*", "a*b") expands to every dictionary term matching the
    # pattern (stars = any char run; disjunctive BM25 over the
    # expansion). Subsumes parse_prefix for starred words. Literal
    # pieces are normalized through the index tokenizer; a pattern whose
    # expansion exceeds max_prefix_expansion raises.
    parse_wildcard: bool = False
    # regex term syntax (Lucene RegexpQuery): when True, a word wrapped
    # in slashes ("/s(low|mall)/") expands to every dictionary term
    # FULLY matching the RE2 pattern (matched verbatim against the
    # normalized terms — write patterns in lowercase). Disjunctive BM25
    # over the expansion; capped by max_prefix_expansion.
    parse_regex: bool = False
    # fuzzy matching: when True, every positive query token expands to
    # the dictionary terms within Levenshtein distance 1 of it
    # (disjunctive BM25 over the union of expansions; a token with no
    # near neighbours contributes nothing). Negated terms stay exact.
    # Off by default: exact match is what a search box does until the
    # user opts into typo tolerance.
    parse_fuzzy: bool = False
    max_fuzzy_expansion: int = 10_000
    # query-time synonym expansion (the Elasticsearch query-time synonym
    # filter): ((term, (synonym, ...)), ...) of NORMALIZED terms. Each
    # query term with an entry expands one hop to itself plus its
    # synonyms (plain disjunctive BM25 over the union; no transitive
    # closure — mirror the map yourself if you want chains). An
    # expansion that is out-of-vocabulary contributes nothing. Under
    # parse_boost, a synonym inherits the MAX boost of any source term
    # that produced it.
    synonyms: tuple = ()
    # term boosts (the Lucene "word^2.5" syntax): when True, a trailing
    # ^<positive float> on a whitespace-separated word multiplies the
    # idf of every term that word contributes (a term reached by several
    # words takes the MAX boost). Scaling idf is exact for all scorers:
    # BM25 contributions AND WAND's block upper bounds are linear in
    # idf, so pruning stays exact under boosts. A malformed or
    # non-positive suffix leaves the word untouched. Off by default so
    # carets in text are never misparsed.
    parse_boost: bool = False
    # function score (Lucene FunctionScoreQuery / Elasticsearch weight
    # functions): a per-document multiplicative weight keyed by a doc
    # attribute value — score' = bm25 * weight(attr(doc)); values not
    # listed weigh 1.0. Example: weight_attr="role",
    # attr_weights=(("user", 2.0), ("tool", 0.25)). Requires
    # method="exhaustive" in "or" mode (WAND's block upper bounds are
    # not weight-aware; scaling them by the max weight would be valid
    # but is not implemented).
    weight_attr: str | None = None
    attr_weights: tuple = ()
    # time-decay function score (Elasticsearch decay / recency ranking):
    # (col, origin, tau) over a NUMERIC attrs column — score' = score *
    # (tau / (tau + age)) with age = max(origin - value, 0), so a doc at
    # the origin keeps its score and one tau units older scores half.
    # Mutually exclusive with weight_attr; method="exhaustive" only.
    decay_attr: tuple | None = None
    # disjunction-max (Lucene DisjunctionMaxQuery over the query terms):
    # score = best term contribution + dismax_tie * (sum of the rest) —
    # rank by the single best matching term, others only break ties.
    # None = normal summed BM25; requires method="exhaustive", mode="or".
    dismax_tie: float | None = None
    # minimum-should-match (Lucene semantics): in "or" mode a candidate
    # must contain at least this many DISTINCT query terms. 0/1 = plain
    # disjunction; a value above the query's in-vocabulary term count
    # matches nothing (OOV terms are unmatchable clauses that still
    # count toward the requirement, as in Lucene's BooleanQuery).
    min_should_match: int = 0
    # field collapsing (the Lucene/Solr collapse shape): at most ONE
    # result per conversation, conversations ranked by their single
    # best-scoring turn (then conv_id). Exact under sharding: each shard
    # keeps its per-conv best before its top-k cut, and the merge
    # collapses again across shards — a conv in the global collapsed
    # top-k is provably in some shard's collapsed top-k. Works with both
    # methods: under WAND the running top-k is kept collapsed so the
    # theta bound is the k-th best CONVERSATION score (conv-granular
    # pruning, still rank-exact — see score_wand's docstring).
    collapse: bool = False
    # parent-level ranking (the Elasticsearch has_child / join-field
    # score_mode="sum" shape): rank CONVERSATIONS by the sum of their
    # matching turns' scores. Scores are per-turn BM25 quantized to
    # floor(score*1e6) int64 BEFORE summing, so partial per-shard sums
    # merge exactly (integer addition is order-free) — a conversation
    # straddling a shard boundary contributes one partial per shard and
    # the merge adds them. k applies to conversations; no per-shard
    # top-k cut happens (an aggregation visits every match — that IS the
    # has_child cost model). Requires method="exhaustive" in "or" mode;
    # mutually exclusive with collapse/offset.
    conv_score_mode: str | None = None  # None | "sum"
    # pagination: skip the first `offset` results per query and return
    # the next k (ranks offset+1 .. offset+k — global rank numbers, the
    # search_after/from page shape). Applied after the deterministic
    # (score desc, doc_id asc) ordering, so pages are stable.
    offset: int = 0
    scorer_concurrency: int | tuple[int, int] = (1, 8)
    scorer_batch_size: int = 64
    shard_cache_size: int = 64  # decoded shards cached per scorer actor


def create_default_index_config() -> IndexConfig:
    """Factory preset (reference: ``M3EmbedderFactory.CreateCpuOptimized``,
    ``samples/dotnet/BgeM3.Onnx/M3EmbedderFactory.cs:16-80``)."""
    return IndexConfig()


def create_tiny_index_config() -> IndexConfig:
    """Preset for unit tests: small shards so sharding paths are exercised."""
    return IndexConfig(docs_per_shard=64, term_buckets=4, block_size=8)
