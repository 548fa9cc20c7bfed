"""BM25 top-k query engine over the sharded index.

Replaces the reference's neural forward pass (M4,
``samples/python/bge_m3_embedder.py:121-124``) with BM25 scoring actors;
the query·doc sparse dot-product that BGE-M3 users run downstream
becomes block-max WAND over compressed postings (SURVEY.md §2.4).

Distribution model: the index is DOCUMENT-sharded (each shard = one
docID range with a complete sub-index), so a query fans out to every
shard, each shard computes an exact local top-k (global idf from the
global dictionary ⇒ locally computed scores are globally exact), and a
tiny ``groupby(query_id)`` merge takes the global top-k. That is the
classic web-search partition-by-document layout: WAND stays node-local,
no postings travel at query time, and adding nodes adds shards.

Determinism (SURVEY.md §4.3): score accumulation per document is always
in ascending-term-string order; ties break (score desc, doc_id asc); the
exhaustive scorer and WAND produce bit-identical float64 scores (WAND's
full evaluation walks the same sorted term set from 0.0).
"""

from __future__ import annotations

import os
from collections import OrderedDict

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from bge_m3_onnx_ray.config import QueryConfig
from bge_m3_onnx_ray.index.artifacts import ConvOffsets, IndexMeta, postings_file
from bge_m3_onnx_ray.index.codec import EncodedPostings, decode_block, decode_postings
from bge_m3_onnx_ray.index.build import term_bucket
from bge_m3_onnx_ray.scoring import (MU, bm25_term_score, classic_idf,
                                     classic_term_score, idf,
                                     lmd_term_score)
from bge_m3_onnx_ray.tokenizer import DeterministicTokenizer

RESULT_SCHEMA = pa.schema([
    ("query_id", pa.int64()),
    ("rank", pa.int32()),
    ("doc_id", pa.int64()),
    ("score", pa.float64()),
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
])

_PARTIAL_SCHEMA = pa.schema([
    ("query_id", pa.int64()), ("doc_id", pa.int64()), ("score", pa.float64())])


def _topk_merge(scores: np.ndarray, doc_ids: np.ndarray, k: int):
    """(score desc, doc_id asc) deterministic top-k."""
    if len(scores) > k:
        # exact pre-cut: keep everything >= the kth score so equal-score
        # ties (broken by doc_id) are never lost before the sort
        kth = -np.partition(-scores, k - 1)[k - 1]
        keep = scores >= kth
        scores, doc_ids = scores[keep], doc_ids[keep]
    order = np.lexsort((doc_ids, -scores))[:k]
    return scores[order], doc_ids[order]


def _apply_allowed(scores: np.ndarray, docs: np.ndarray,
                   allowed: np.ndarray | None,
                   excluded: np.ndarray | None = None):
    """Candidate filters applied BEFORE top-k selection (exact, not
    post-cut): restrict to the sorted ``allowed`` docID set (facets) and
    remove the sorted ``excluded`` set (negated query terms)."""
    if allowed is not None:
        if not len(allowed) or not len(docs):
            return np.empty(0, np.float64), np.empty(0, np.int64)
        pos = np.searchsorted(allowed, docs)
        keep = pos < len(allowed)
        keep[keep] = allowed[pos[keep]] == docs[keep]
        scores, docs = scores[keep], docs[keep]
    if excluded is not None and len(excluded) and len(docs):
        pos = np.searchsorted(excluded, docs)
        hit = pos < len(excluded)
        hit[hit] = excluded[pos[hit]] == docs[hit]
        scores, docs = scores[~hit], docs[~hit]
    return scores, docs


def _collapse_best(scores: np.ndarray, docs: np.ndarray,
                   starts: np.ndarray):
    """Field collapsing kernel: keep, per conversation, the single best
    (score desc, doc_id asc) candidate. ``starts`` is the sorted global
    conv-start docID array (``ConvOffsets.starts``) — conv membership is
    one searchsorted, the per-conv best one lexsort + group-head mask.
    Applied BEFORE the top-k cut so a conversation whose best turn ranks
    below k docs (but above k CONVS) is never lost."""
    if not len(docs):
        return scores, docs
    conv = np.searchsorted(starts, docs, side="right") - 1
    order = np.lexsort((docs, -scores, conv))
    conv_o = conv[order]
    head = np.empty(len(order), bool)
    head[0] = True
    head[1:] = conv_o[1:] != conv_o[:-1]
    sel = order[head]
    return scores[sel], docs[sel]


def score_exhaustive(postings: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]],
                     qterms: list[str], idfs: dict[str, float],
                     avgdl: float, k1: float, b: float, k: int,
                     allowed: np.ndarray | None = None,
                     excluded: np.ndarray | None = None,
                     msm: int = 0,
                     collapse_starts: np.ndarray | None = None,
                     doc_weights: "tuple[np.ndarray, np.ndarray] | None" = None,
                     after: "tuple[float, int] | None" = None,
                     term_score=bm25_term_score,
                     dismax_tie: float | None = None):
    """Exact scorer over fully-decoded postings (the parity fallback the
    reference keeps alongside its fast path). ``qterms`` must be sorted.
    ``allowed``: optional sorted docID facet mask (see _apply_allowed).
    ``msm``: minimum-should-match — candidates must contain at least this
    many distinct query terms (each term's postings are unique per doc,
    so one increment per term list == the distinct-match count).
    ``dismax_tie``: Lucene DisjunctionMaxQuery semantics over the query
    terms — score = best_contrib + tie * (sum - best_contrib), computed
    as that exact expression (mirrored by the SQL oracle) so ranking
    favours the single best term with the others as tie-breakers."""
    arrs = [(t,) + postings[t] for t in qterms if t in postings]
    if not arrs:
        return np.empty(0, np.float64), np.empty(0, np.int64)
    union = np.unique(np.concatenate([a[1] for a in arrs]))
    scores = np.zeros(len(union), np.float64)
    best = np.zeros(len(union), np.float64) if dismax_tie is not None else None
    counts = np.zeros(len(union), np.int32) if msm > 1 else None
    for t, docs, tfs, dls in arrs:  # ascending term order = summation order
        contrib = term_score(tfs.astype(np.float64), dls.astype(np.float64),
                             idfs[t], avgdl, k1, b)
        pos = np.searchsorted(union, docs)
        scores[pos] += contrib
        if best is not None:
            np.maximum.at(best, pos, contrib)
        if counts is not None:
            counts[pos] += 1
    if best is not None:
        scores = best + dismax_tie * (scores - best)
    if counts is not None:
        keep = counts >= msm
        scores, union = scores[keep], union[keep]
    scores, union = _apply_allowed(scores, union, allowed, excluded)
    if doc_weights is not None and len(union):
        # function score: one multiply per candidate (score' = score * w)
        # BEFORE the top-k cut; docs absent from the attr table weigh 1.0
        wd, wv = doc_weights
        pos = np.searchsorted(wd, union)
        pos_c = np.minimum(pos, max(len(wd) - 1, 0))
        valid = (pos < len(wd)) & (wd[pos_c] == union) if len(wd) \
            else np.zeros(len(union), bool)
        w = np.ones(len(union), np.float64)
        w[valid] = wv[pos[valid]]
        scores = scores * w
    if after is not None and len(union):
        # search_after cursor (Elasticsearch deep pagination): keep only
        # candidates STRICTLY after (score desc, docID asc) the cursor —
        # applied before the top-k cut, so page boundaries are exact
        # without fetching offset+k rows
        s_c, d_c = after
        keep = (scores < s_c) | ((scores == s_c) & (union > d_c))
        scores, union = scores[keep], union[keep]
    if collapse_starts is not None:
        scores, union = _collapse_best(scores, union, collapse_starts)
    return _topk_merge(scores, union, k)


def score_conjunctive(postings: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]],
                      qterms: list[str], idfs: dict[str, float],
                      avgdl: float, k1: float, b: float, k: int,
                      allowed: np.ndarray | None = None,
                      excluded: np.ndarray | None = None,
                      collapse_starts: np.ndarray | None = None):
    """AND semantics: only docs containing EVERY query term are
    candidates; their scores are the identical ascending-term float64
    BM25 sums as :func:`score_exhaustive` (an AND result is the OR
    result restricted to full-coverage docs — bit-identical scores).

    The intersection proceeds smallest-posting-list-first (the classic
    skip-list AND order): each step is one searchsorted of the shrinking
    candidate set into the next list, so cost is O(|rarest| · log) — at
    10^12 docs a conjunctive query touches ~|rarest term| docs, never the
    union. A term absent from this shard ⇒ empty (the caller already
    dropped queries with globally-unknown terms)."""
    if any(t not in postings for t in qterms) or not qterms:
        return np.empty(0, np.float64), np.empty(0, np.int64)
    arrs = [(t,) + postings[t] for t in qterms]  # ascending term order
    by_len = sorted(range(len(arrs)), key=lambda i: len(arrs[i][1]))
    inter = arrs[by_len[0]][1]
    for i in by_len[1:]:
        docs = arrs[i][1]
        if not len(inter):
            break
        pos = np.searchsorted(docs, inter)
        keep = pos < len(docs)
        keep[keep] = docs[pos[keep]] == inter[keep]
        inter = inter[keep]
    _, inter = _apply_allowed(np.empty(len(inter)), inter, allowed, excluded)
    if not len(inter):
        return np.empty(0, np.float64), np.empty(0, np.int64)
    scores = np.zeros(len(inter), np.float64)
    for t, docs, tfs, dls in arrs:  # ascending term order = summation order
        pos = np.searchsorted(docs, inter)
        scores += bm25_term_score(tfs[pos].astype(np.float64),
                                  dls[pos].astype(np.float64),
                                  idfs[t], avgdl, k1, b)
    if collapse_starts is not None:
        scores, inter = _collapse_best(scores, inter, collapse_starts)
    return _topk_merge(scores, inter, k)


def score_dense(entries: dict[str, tuple[np.ndarray, np.ndarray]],
                qterms: list[str], k: int, base: int, buf: np.ndarray):
    """Exact scorer over PRECOMPUTED per-posting contributions using a
    dense doc-range accumulator (term-at-a-time over
    ``buf[doc_id - base]``). ``entries``: term → (doc_ids, contribs)
    where ``contribs = bm25_term_score(tf, dl, idf, ...)`` was computed
    once at index-load time (global stats are known then — nothing about
    a posting's contribution depends on the query).

    Bit-identical to :func:`score_exhaustive`: identical float64
    contribution values (same elementwise formula on the same inputs)
    accumulated per doc in the same ascending-term order. The
    scatter-add replaces the union sort (``np.unique`` over millions of
    candidate docIDs was the p50 cost on hot terms at 32M docs). ``buf``
    must be zeros on entry and is restored to zeros on exit — callers
    (serving actors) allocate it once for their contiguous doc range.
    All BM25 contributions are strictly positive (the +1 idf variant),
    so nonzero entries == the candidate set."""
    arrs = [(t,) + entries[t] for t in qterms if t in entries]
    if not arrs:
        return np.empty(0, np.float64), np.empty(0, np.int64)
    if len(arrs) == 1:
        _, docs, contrib = arrs[0]  # already sorted unique — no buffer
        return _topk_merge(contrib, docs, k)
    for _, docs, contrib in arrs:  # ascending term order = summation order
        buf[docs - base] += contrib
    nz = np.flatnonzero(buf)
    scores = buf[nz].copy()
    buf[nz] = 0.0
    return _topk_merge(scores, nz + base, k)


def score_wand(enc_postings: dict[str, EncodedPostings], qterms: list[str],
               idfs: dict[str, float], avgdl: float, k1: float, b: float,
               k: int, block_size: int,
               decoded: dict[str, tuple] | None = None,
               stats: dict | None = None,
               contribs: dict[str, np.ndarray] | None = None,
               allowed: np.ndarray | None = None,
               excluded: np.ndarray | None = None,
               msm: int = 0,
               collapse_starts: np.ndarray | None = None):
    """Vectorized block-max top-k (the WAND/BMW pruning idea — Ding & Suel
    2011 — re-expressed for batch execution instead of a per-posting
    cursor loop, which measured ~47x slower than numpy scoring).

    Doc space is partitioned into SEGMENTS by the union of all query
    terms' skip-block boundaries, so each segment lies inside exactly one
    block of every term and ``sum_t score(max_tf, min_dl)`` of those
    blocks is an exact upper bound for every doc in the segment. Segments
    are processed in descending-bound order in chunks; each chunk decodes
    only the touched blocks and scores its docs EXACTLY with the same
    ascending-term float64 accumulation as :func:`score_exhaustive`
    (bit-identical scores). The loop stops when the best remaining
    segment bound is strictly below the running kth score — pruning keeps
    ``>= theta`` segments so equal-score/lower-docID ties are never lost
    (rank-identical guarantee incl. ties).

    ``decoded`` (term → (docs, tfs, dls), as held by serving actors that
    pre-decode in ``__init__``) skips per-block varint decoding: chunk
    postings are gathered by searchsorted range slicing instead.
    ``contribs`` (term → float64 per-posting BM25 contribution, aligned
    with ``decoded[t][0]``) additionally skips the per-query tf/dl math:
    gathering a precomputed elementwise value is bit-identical to
    computing it on the gathered slice.

    ``allowed`` (sorted docID facet mask): a segment's block-max bound is
    an upper bound over ALL its docs, hence also over the allowed subset,
    so pruning stays exact — only the per-chunk candidate set is
    restricted (before the running top-k, so theta reflects filtered
    candidates only).

    ``msm`` (minimum-should-match): a chunk's segments each lie inside
    one block of EVERY term, so the gathered per-term doc lists are the
    complete postings for every doc in the chunk — the per-chunk distinct
    match count is the doc's exact global count, and filtering on it
    before the running top-k keeps pruning exact (removing candidates
    only ever lowers the competition for theta; segment bounds stay
    upper bounds for the docs that remain).

    ``collapse_starts`` (field collapsing): theta becomes CONV-granular —
    the running top-k holds per-conversation best candidates (collapsed
    with :func:`_collapse_best` after every chunk), so theta is the k-th
    best CONVERSATION score. Pruning stays exact: a pruned doc has
    score < theta; if its conversation reaches the final top-k, that
    conv's best is >= theta (theta only grows), so the pruned doc was
    never the conv representative, and == theta ties survive because
    pruning keeps >= theta segments."""
    terms = [t for t in qterms if t in enc_postings]
    if not terms:
        return np.empty(0, np.float64), np.empty(0, np.int64)
    encs = {t: enc_postings[t] for t in terms}

    # segment table: boundaries = union of block last-docIDs
    bounds = np.unique(np.concatenate([encs[t].last_ids for t in terms]))
    nseg = len(bounds)
    seg_lo = np.empty(nseg, np.int64)
    seg_lo[0] = 0
    seg_lo[1:] = bounds[:-1] + 1
    seg_hi = bounds
    seg_ub = np.zeros(nseg, np.float64)
    term_block: dict[str, np.ndarray] = {}
    for t in terms:
        e = encs[t]
        bub = bm25_term_score(e.max_tf.astype(np.float64),
                              e.min_dl.astype(np.float64),
                              idfs[t], avgdl, k1, b)
        bi = np.searchsorted(e.last_ids, seg_hi)
        valid = bi < len(e.last_ids)
        add = np.zeros(nseg, np.float64)
        add[valid] = bub[bi[valid]]
        seg_ub += add
        term_block[t] = np.where(valid, bi, -1)

    order = np.argsort(-seg_ub, kind="stable")
    top_s = np.empty(0, np.float64)
    top_d = np.empty(0, np.int64)
    theta = None
    cache: dict[str, dict[int, tuple]] = {t: {} for t in terms}
    pos = 0
    chunk_segs = max(16, k // 4)
    while pos < len(order):
        if theta is not None:
            rest = order[pos:]
            rest = rest[seg_ub[rest] >= theta]  # keep ==theta: tie safety
            if not len(rest):
                break
            order = np.concatenate([order[:pos], rest])
        chunk = order[pos:pos + chunk_segs]
        pos += len(chunk)
        los, his = seg_lo[chunk], seg_hi[chunk]
        o = np.argsort(los)
        los, his = los[o], his[o]
        gathered: list[tuple[np.ndarray, np.ndarray]] = []  # (docs, contrib)
        for t in terms:  # ascending term order — the accumulation contract
            if decoded is not None:
                fdocs = decoded[t][0]
                li = np.searchsorted(fdocs, los)
                hi = np.searchsorted(fdocs, his, side="right")
                cnt = hi - li
                tot = int(cnt.sum())
                if not tot:
                    continue
                # flat gather of all ranges: arange over each [li, hi)
                sel = np.repeat(li - np.concatenate([[0], np.cumsum(cnt)[:-1]]),
                                cnt) + np.arange(tot)
                if contribs is not None:
                    con = contribs[t][sel]
                else:
                    _, ftfs, fdls = decoded[t]
                    con = bm25_term_score(ftfs[sel].astype(np.float64),
                                          fdls[sel].astype(np.float64),
                                          idfs[t], avgdl, k1, b)
                gathered.append((fdocs[sel], con))
                continue
            bis = term_block[t][chunk]
            bis = np.unique(bis[bis >= 0])
            if not len(bis):
                continue
            c = cache[t]
            parts = []
            for bi in bis:
                got = c.get(int(bi))
                if got is None:
                    got = decode_block(encs[t], int(bi), block_size)
                    c[int(bi)] = got
                parts.append(got)
            docs = np.concatenate([p[0] for p in parts])
            j = np.searchsorted(los, docs, side="right") - 1
            member = (j >= 0) & (docs <= his[np.maximum(j, 0)])
            if member.any():
                con = bm25_term_score(
                    np.concatenate([p[1] for p in parts])[member].astype(np.float64),
                    np.concatenate([p[2] for p in parts])[member].astype(np.float64),
                    idfs[t], avgdl, k1, b)
                gathered.append((docs[member], con))
        if not gathered:
            continue
        union = np.unique(np.concatenate([g[0] for g in gathered]))
        scores = np.zeros(len(union), np.float64)
        counts = np.zeros(len(union), np.int32) if msm > 1 else None
        for docs, con in gathered:
            gpos = np.searchsorted(union, docs)
            scores[gpos] += con
            if counts is not None:
                counts[gpos] += 1
        if counts is not None:
            mkeep = counts >= msm
            scores, union = scores[mkeep], union[mkeep]
        scores, union = _apply_allowed(scores, union, allowed, excluded)
        if collapse_starts is not None:
            # re-collapse the union of the running (already-collapsed)
            # top-k and this chunk: per-conv best of bests, then the
            # conv-granular k cut — theta = k-th conv score
            cs = np.concatenate([top_s, scores])
            cd = np.concatenate([top_d, union])
            cs, cd = _collapse_best(cs, cd, collapse_starts)
            top_s, top_d = _topk_merge(cs, cd, k)
        else:
            top_s, top_d = _topk_merge(np.concatenate([top_s, scores]),
                                       np.concatenate([top_d, union]), k)
        if len(top_d) == k:
            theta = top_s[-1]
        # exponential chunk growth: the first small chunks seed theta from
        # the highest-bound segments; if pruning then bites, the loop ends
        # early, and if it doesn't (flat score distributions), the growing
        # chunks converge to one exhaustive pass instead of paying
        # per-chunk overhead O(n_segments / chunk) times
        chunk_segs = min(chunk_segs * 2, 4096)
    if stats is not None:
        # pos counts segments actually decoded+scored; the rest were
        # pruned by the theta bound (block-max skipping evidence)
        stats["n_segments"] = nseg
        stats["segments_scored"] = int(pos)
        stats["segments_pruned"] = int(nseg - pos)
    return top_s, top_d


class _DictDfLookup:
    """Actor-side global-df lookup — the dictionary-sharded idf tier.

    The dictionary artifact is term-hash-bucketed parquet; a lookup reads
    ONLY the buckets its missing terms hash to (predicate-pushdown scan
    within each), and caches hits and misses. At 10^12 docs no process
    ever holds the full dictionary: each actor accumulates df for just
    the terms its queries touch. idf derived from the global df is
    identical on every actor, so locally computed BM25 scores stay
    globally exact (the partition-by-document contract above)."""

    def __init__(self, meta: IndexMeta):
        self.meta = meta
        self._df: dict[str, int | None] = {}

    def idfs_for(self, terms) -> dict[str, float]:
        missing = sorted({t for t in terms if t not in self._df})
        if missing:
            by_bucket: dict[int, list[str]] = {}
            buckets = term_bucket(np.asarray(missing, object),
                                  self.meta.term_buckets)
            for t, b in zip(missing, buckets):
                by_bucket.setdefault(int(b), []).append(t)
            import os
            for b, ts in sorted(by_bucket.items()):
                path = os.path.join(self.meta.index_dir, "dictionary",
                                    f"bucket-{b:02d}.parquet")
                found: set[str] = set()
                try:
                    tab = pq.read_table(path, columns=["term", "df"],
                                        filters=[("term", "in", ts)])
                except (FileNotFoundError, OSError):
                    tab = None
                if tab is not None:
                    for t, d in zip(tab.column("term").to_pylist(),
                                    tab.column("df").to_pylist()):
                        self._df[t] = int(d)
                        found.add(t)
                for t in ts:
                    if t not in found:
                        self._df[t] = None  # negative cache
        n = self.meta.n_docs
        return {t: idf(d, n) for t in terms
                if (d := self._df.get(t)) is not None}


class ShardScorer:
    """Scoring actor: holds decoded postings per shard in a bounded LRU
    (loaded once per actor — the reference's sessions-in-__init__ pattern,
    ``samples/python/bge_m3_embedder.py:36-50``). Input batch rows are
    (query_id, terms list, shard); output partial top-k rows.

    ``idfs``: pre-resolved global idf dict (driver-side lookup, the
    low-latency path), or None to resolve lazily per batch from the
    bucketed dictionary artifact (the bulk/streaming path — no query
    state on the driver)."""

    def __init__(self, index_dir: str, idfs: dict[str, float] | None, k: int,
                 method: str, cache_size: int, mode: str = "or",
                 filter_attr: str | None = None,
                 filter_value: str | None = None,
                 allow_docs_ref=None, msm: int = 0,
                 filter_range: tuple[str, int, int] | None = None,
                 collapse: bool = False,
                 weight_attr: str | None = None,
                 attr_weights: tuple = (),
                 avgdl_override: float | None = None,
                 after_ref=None,
                 decay_attr: tuple | None = None,
                 conv_sum: bool = False,
                 similarity: str = "bm25",
                 dismax_tie: float | None = None,
                 demote_weight: float = 0.5):
        self.meta = IndexMeta(index_dir)
        if avgdl_override is not None:
            # federated search: the caller supplies UNION-corpus global
            # stats (avgdl here, combined-df idfs via ``idfs``) so this
            # index's scores equal a single union-index build
            self.meta.avgdl = float(avgdl_override)
        # field collapsing: each shard keeps its per-conversation best
        # BEFORE its top-k cut (see QueryConfig.collapse). The scorer only
        # needs the int64 conv-start array (n_convs × 8 B per actor; a
        # doc-range-sliced view would bound this at 10¹²-doc scale).
        self._collapse_starts = (ConvOffsets.load(index_dir).starts
                                 if collapse else None)
        # parent-level sum ranking (QueryConfig.conv_score_mode="sum"):
        # this shard emits one partial per matched CONVERSATION — the
        # int64 sum of floor(turn_score*1e6) over its matched turns, keyed
        # by the conv's first docID (global, so cross-shard partials for a
        # straddling conv meet under one key in the merge). Same bounded
        # starts array as collapse (n_convs x 8 B).
        self._conv_sum = bool(conv_sum)
        self._conv_starts = (ConvOffsets.load(index_dir).starts
                             if conv_sum else None)
        # pluggable similarity (Lucene's Similarity seam): "classic"
        # TF-IDF and "lmd" (LM Dirichlet) are exhaustive-OR only — WAND
        # block bounds and the AND/bool fast paths are precomputed/
        # derived for BM25
        self._term_score = {"classic": classic_term_score,
                            "lmd": lmd_term_score}.get(similarity,
                                                       bm25_term_score)
        self._dismax_tie = dismax_tie
        # boosting query (Elasticsearch `boosting`): docs matching any
        # per-query "demote" term keep matching but score × this factor
        # (0.5 = one exponent decrement: the multiply is FP-exact, so
        # demoted scores stay bit-identical to oracle arithmetic)
        self.demote_weight = float(demote_weight)
        if dismax_tie is not None and (method == "wand" or mode != "or"):
            raise ValueError('dismax requires method="exhaustive", '
                             'mode="or" (WAND theta bounds assume '
                             "summed contributions)")
        if similarity in ("classic", "lmd") and (method == "wand"
                                                 or mode != "or"
                                                 or conv_sum):
            raise ValueError(f'similarity="{similarity}" requires '
                             'method="exhaustive", mode="or"')
        # collapse under WAND is supported: score_wand's theta turns
        # conv-granular (see its docstring) — no method restriction
        self.idfs = idfs
        self._lookup = None if idfs is not None else _DictDfLookup(self.meta)
        self.k = k
        self.method = method
        self.mode = mode
        # minimum-should-match: per-shard distinct-match counts are the
        # doc's exact global counts (a doc lives in exactly one shard)
        self.msm = msm
        self.filter_attr = filter_attr
        self.filter_value = filter_value
        self.filter_range = filter_range
        # function score: per-shard (sorted docIDs, weights) from the
        # attrs side table, loaded once per shard and LRU-cached
        self.weight_attr = weight_attr
        self.attr_weights = dict(attr_weights)
        if weight_attr is not None and decay_attr is not None:
            raise ValueError("weight_attr and decay_attr are mutually "
                             "exclusive")
        self.decay_attr = decay_attr
        self._weight_cache: OrderedDict[int, tuple] = OrderedDict()
        # search_after cursors: broadcast {query_id: (score, docID)}
        if after_ref is not None:
            from bge_m3_onnx_ray.index.build import get_broadcast
            self.after_by_query: dict[int, tuple] | None = \
                get_broadcast(after_ref)
        else:
            self.after_by_query = None
        # per-query candidate restriction (quoted-phrase filters): a
        # broadcast {query_id: sorted global docID array}, fetched once
        # per worker (ray.put on the driver, get_broadcast here)
        if allow_docs_ref is not None:
            from bge_m3_onnx_ray.index.build import get_broadcast
            self.allow_by_query: dict[int, np.ndarray] | None = \
                get_broadcast(allow_docs_ref)
        else:
            self.allow_by_query = None
        self._allowed_cache: OrderedDict[int, np.ndarray] = OrderedDict()
        # tombstones (index.delete): deleted docs never surface, while
        # N/avgdl/df keep their as-built values until compaction —
        # Lucene's live-docs semantics. Presence checked once per actor.
        from bge_m3_onnx_ray.index.delete import tombstones_file
        self._has_tombstones = os.path.exists(tombstones_file(index_dir))
        self._tomb_cache: OrderedDict[int, np.ndarray] = OrderedDict()
        self.cache: OrderedDict[int, dict[str, EncodedPostings]] = OrderedDict()
        self.cache_size = cache_size

    def _allowed(self, shard: int) -> np.ndarray | None:
        """Per-shard facet mask (sorted docIDs matching the filter),
        loaded once per shard from the attrs side table and LRU-cached
        beside the postings (doc-partitioned: the mask never leaves the
        shard's scorer). Equality and numeric-range filters compose by
        intersection."""
        if self.filter_attr is None and self.filter_range is None:
            return None
        got = self._allowed_cache.get(shard)
        if got is None:
            from bge_m3_onnx_ray.index.attrs import (load_allowed_docs,
                                                     load_allowed_docs_range)
            masks = []
            if self.filter_attr is not None:
                masks.append(load_allowed_docs(
                    self.meta.index_dir, self.filter_attr,
                    shard, self.filter_value))
            if self.filter_range is not None:
                col, lo, hi = self.filter_range
                masks.append(load_allowed_docs_range(
                    self.meta.index_dir, col, shard, lo, hi))
            got = (masks[0] if len(masks) == 1
                   else np.intersect1d(masks[0], masks[1],
                                       assume_unique=True))
            self._allowed_cache[shard] = got
            while len(self._allowed_cache) > self.cache_size:
                self._allowed_cache.popitem(last=False)
        else:
            self._allowed_cache.move_to_end(shard)
        return got

    def _doc_weights(self, shard: int) -> "tuple[np.ndarray, np.ndarray] | None":
        """(sorted docIDs, weight per doc) for this shard's attrs rows
        whose value has a configured weight — docs not returned weigh
        1.0 at scoring time (so the array is bounded by the number of
        weighted-value docs, not the shard size)."""
        if self.weight_attr is None and self.decay_attr is None:
            return None
        got = self._weight_cache.get(shard)
        if got is None:
            from bge_m3_onnx_ray.index.attrs import load_attr_values
            if self.decay_attr is not None:
                # time decay: w = tau / (tau + max(origin - value, 0))
                col, origin, tau = self.decay_attr
                docs, vals = load_attr_values(self.meta.index_dir,
                                              col, shard)
                age = float(origin) - np.asarray(vals, np.float64)
                age[age < 0] = 0.0
                got = (docs, float(tau) / (float(tau) + age))
            else:
                docs, vals = load_attr_values(self.meta.index_dir,
                                              self.weight_attr, shard)
                w = np.fromiter((self.attr_weights.get(v, 1.0)
                                 for v in vals), np.float64, len(vals))
                keep = w != 1.0
                got = (docs[keep], w[keep])
            self._weight_cache[shard] = got
            while len(self._weight_cache) > self.cache_size:
                self._weight_cache.popitem(last=False)
        else:
            self._weight_cache.move_to_end(shard)
        return got

    def _deleted(self, shard: int) -> np.ndarray:
        """This shard's tombstoned docIDs (sorted), loaded once per shard
        via row-group predicate pushdown and LRU-cached."""
        got = self._tomb_cache.get(shard)
        if got is None:
            from bge_m3_onnx_ray.index.delete import load_tombstones_range
            dps = self.meta.docs_per_shard
            got = load_tombstones_range(self.meta.index_dir,
                                        shard * dps, (shard + 1) * dps)
            self._tomb_cache[shard] = got
            while len(self._tomb_cache) > self.cache_size:
                self._tomb_cache.popitem(last=False)
        else:
            self._tomb_cache.move_to_end(shard)
        return got

    def _shard_postings(self, shard: int, terms: list[str]) -> dict[str, EncodedPostings]:
        got = self.cache.get(shard)
        if got is None:
            got = {}
            self.cache[shard] = got
            while len(self.cache) > self.cache_size:
                self.cache.popitem(last=False)
        else:
            self.cache.move_to_end(shard)  # recency, not FIFO
        missing = [t for t in terms if t not in got]
        if missing:
            by_bucket: dict[int, list[str]] = {}
            buckets = term_bucket(np.asarray(missing, object), self.meta.term_buckets)
            for t, b in zip(missing, buckets):
                by_bucket.setdefault(int(b), []).append(t)
            for b, ts in by_bucket.items():
                path = postings_file(self.meta.index_dir, shard, b)
                try:
                    tab = pq.read_table(path, filters=[("term", "in", ts)])
                except (FileNotFoundError, OSError):
                    tab = None  # bucket file absent: no such terms in shard
                found = set()
                if tab is not None:
                    for i in range(tab.num_rows):
                        t = tab.column("term")[i].as_py()
                        got[t] = EncodedPostings(
                            int(tab.column("df")[i].as_py()),
                            np.asarray(tab.column("last_ids")[i].as_py(), np.int64),
                            np.asarray(tab.column("max_tf")[i].as_py(), np.int32),
                            np.asarray(tab.column("min_dl")[i].as_py(), np.int32),
                            np.asarray(tab.column("offs")[i].as_py(), np.int32),
                            tab.column("blob")[i].as_py())
                        found.add(t)
                for t in ts:
                    if t not in found:
                        got[t] = None  # negative cache
        return got

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = self.meta
        out_q, out_d, out_s = [], [], []
        qids = batch.column("query_id").to_pylist()
        termss = batch.column("terms").to_pylist()
        shards = batch.column("shard").to_pylist()
        negss = (batch.column("neg").to_pylist()
                 if "neg" in batch.schema.names else [()] * len(qids))
        boostss = (batch.column("boosts").to_pylist()
                   if "boosts" in batch.schema.names else [None] * len(qids))
        mustss = (batch.column("must").to_pylist()
                  if "must" in batch.schema.names else [None] * len(qids))
        demotess = (batch.column("demote").to_pylist()
                    if "demote" in batch.schema.names else [()] * len(qids))
        if self._lookup is not None:  # bulk path: one dict probe per batch
            self.idfs = self._lookup.idfs_for(
                {t for ts in termss for t in ts})
        # batch-level postings pre-warm: one union read per (shard,
        # bucket) file for ALL the batch's queries instead of a filtered
        # parquet open per (query, shard) item — at many-tiny-shards
        # geometries (reshard to docs_per_shard=64: ~1k shards) the
        # per-open fixed cost, not decoding, dominates the fan-out
        warm: dict[int, set] = {}
        for terms2, negs2, demotes2, shard2 in zip(termss, negss,
                                                   demotess, shards):
            s = warm.setdefault(int(shard2), set())
            s.update(terms2)
            s.update(negs2 or ())
            s.update(demotes2 or ())
        if len(warm) <= self.cache_size:    # never pre-warm past the LRU
            for shard2, ts2 in warm.items():
                self._shard_postings(shard2, sorted(ts2))
        # decoded-postings memo for THIS batch: many queries in a batch hit
        # the same (shard, term) — decode once, not once per query row
        dec_memo: dict[tuple[int, str], tuple] = {}
        for qid, terms, negs, boosts, musts, demotes, shard in zip(
                qids, termss, negss, boostss, mustss, demotess, shards):
            n_required = len(set(terms))
            # per-term boosts scale idf — exact for every scorer (BM25
            # contributions and WAND block bounds are linear in idf)
            if boosts is not None and any(b != 1.0 for b in boosts):
                bmap = dict(zip(terms, boosts))
                qidfs = {t: v * bmap.get(t, 1.0)
                         for t in terms
                         if (v := self.idfs.get(t)) is not None}
            else:
                qidfs = self.idfs
            terms = [t for t in terms if self.idfs.get(t) is not None]
            if not terms:
                continue
            if self.mode == "and" and len(set(terms)) < n_required:
                continue  # a query term is OOV corpus-wide: AND matches nothing
            if self.mode == "bool" and any(
                    self.idfs.get(t) is None for t in (musts or ())):
                continue  # a REQUIRED clause is OOV corpus-wide: no matches
            post = self._shard_postings(int(shard), terms)
            avail = {t: e for t in terms if (e := post.get(t)) is not None}
            if not avail:
                continue
            allowed = self._allowed(int(shard))
            if self.allow_by_query is not None:
                q_allow = self.allow_by_query.get(int(qid))
                if q_allow is not None:
                    dps = self.meta.docs_per_shard
                    lo = np.searchsorted(q_allow, int(shard) * dps)
                    hi = np.searchsorted(q_allow, (int(shard) + 1) * dps)
                    q_allow = q_allow[lo:hi]
                    allowed = (q_allow if allowed is None
                               else np.intersect1d(allowed, q_allow,
                                                   assume_unique=True))
            # negated terms: the excluded set is this shard's docs that
            # contain ANY negative term — loaded/decoded through the same
            # postings path and memo (OOV negatives are naturally absent)
            excluded = None
            if negs:
                npost = self._shard_postings(int(shard), list(negs))
                nds = []
                for t in negs:
                    e = npost.get(t)
                    if e is None:
                        continue
                    got = dec_memo.get((shard, t))
                    if got is None:
                        got = decode_postings(e, m.block_size)
                        dec_memo[(shard, t)] = got
                    nds.append(got[0])
                if nds:
                    excluded = np.unique(np.concatenate(nds))
            if self._has_tombstones:
                dele = self._deleted(int(shard))
                if len(dele):
                    excluded = (dele if excluded is None
                                else np.union1d(excluded, dele))
            # boosting query: this shard's docs containing ANY demote
            # term score × demote_weight — same postings path/memo as
            # negs, applied as a doc_weights multiplier pre-top-k (OOV
            # demote terms are naturally a no-op)
            demote_w = None
            if demotes:
                dpost = self._shard_postings(int(shard), list(demotes))
                dds = []
                for t in demotes:
                    e = dpost.get(t)
                    if e is None:
                        continue
                    got = dec_memo.get((shard, t))
                    if got is None:
                        got = decode_postings(e, m.block_size)
                        dec_memo[(shard, t)] = got
                    dds.append(got[0])
                if dds:
                    dem = np.unique(np.concatenate(dds))
                    demote_w = (dem, np.full(len(dem),
                                             self.demote_weight))
                if (self.mode != "or" or self.method == "wand"
                        or self._conv_sum or self.weight_attr is not None
                        or self.decay_attr is not None):
                    raise ValueError(
                        "demote terms require the exhaustive OR scorer "
                        "without attr weights (WAND theta bounds and "
                        "attr doc_weights don't compose with demotion)")
            decoded = {}
            for t, e in avail.items():
                got = dec_memo.get((shard, t))
                if got is None:
                    got = decode_postings(e, m.block_size)
                    dec_memo[(shard, t)] = got
                decoded[t] = got
            if self.mode == "bool":
                # Lucene BooleanQuery: candidates = docs containing EVERY
                # must term (minus must_not, handled via `excluded`); the
                # SCORE sums BM25 over every present must-or-should term.
                # Intersection first (smallest list leads), passed to the
                # exhaustive scorer as an `allowed` mask — should terms
                # never widen the candidate set, only the score.
                must = list(musts or ())
                if any(t not in decoded for t in must) or not must:
                    continue  # a required term is absent from this shard
                by_len = sorted(must, key=lambda t: len(decoded[t][0]))
                inter = decoded[by_len[0]][0]
                for t in by_len[1:]:
                    darr = decoded[t][0]
                    if not len(inter):
                        break
                    pos = np.searchsorted(darr, inter)
                    keep = pos < len(darr)
                    keep[keep] = darr[pos[keep]] == inter[keep]
                    inter = inter[keep]
                allow2 = (inter if allowed is None
                          else np.intersect1d(allowed, inter,
                                              assume_unique=True))
                scores, docs = score_exhaustive(
                    decoded, sorted(decoded), qidfs, m.avgdl, m.k1, m.b,
                    self.k, allowed=allow2, excluded=excluded)
            elif self.mode == "and":
                # conjunctive: intersection-first IS the fast path (WAND's
                # bound pruning is an OR-mode optimization). Pass the FULL
                # query term set: a term absent from this shard must yield
                # an empty shard result (score_conjunctive's guard), not a
                # match over the remaining terms.
                scores, docs = score_conjunctive(
                    decoded, sorted(set(terms)), qidfs, m.avgdl, m.k1,
                    m.b, self.k, allowed=allowed, excluded=excluded,
                    collapse_starts=self._collapse_starts)
            elif self.method == "wand":
                scores, docs = score_wand(avail, sorted(avail), qidfs,
                                          m.avgdl, m.k1, m.b, self.k,
                                          m.block_size, decoded=decoded,
                                          allowed=allowed, excluded=excluded,
                                          msm=self.msm,
                                          collapse_starts=self._collapse_starts)
            elif self._conv_sum:
                # no top-k cut: an aggregation visits every matched turn.
                # k = 2**62 makes _topk_merge keep the full (sorted) set;
                # the shard's match count bounds the cost.
                scores, docs = score_exhaustive(decoded, sorted(decoded),
                                                qidfs, m.avgdl, m.k1, m.b,
                                                2 ** 62, allowed=allowed,
                                                excluded=excluded,
                                                msm=self.msm)
                if len(docs):
                    q6 = np.floor(scores * 1e6).astype(np.int64)
                    conv = np.searchsorted(self._conv_starts, docs,
                                           side="right") - 1
                    order = np.argsort(conv, kind="stable")
                    conv_o, q6_o = conv[order], q6[order]
                    head = np.empty(len(conv_o), bool)
                    head[0] = True
                    head[1:] = conv_o[1:] != conv_o[:-1]
                    firsts = np.flatnonzero(head)
                    sums = np.add.reduceat(q6_o, firsts)
                    # float64 carries the int sum exactly (< 2**53 by a
                    # wide margin: q6 per turn is ~1e7, convs have few
                    # hundred turns at most)
                    scores = sums.astype(np.float64)
                    docs = self._conv_starts[conv_o[firsts]]
            else:
                scores, docs = score_exhaustive(decoded, sorted(decoded), qidfs,
                                                m.avgdl, m.k1, m.b, self.k,
                                                allowed=allowed,
                                                excluded=excluded,
                                                msm=self.msm,
                                                collapse_starts=self._collapse_starts,
                                                doc_weights=(demote_w
                                                             if demote_w is not None
                                                             else self._doc_weights(int(shard))),
                                                after=(None if self.after_by_query is None
                                                       else self.after_by_query.get(int(qid))),
                                                term_score=self._term_score,
                                                dismax_tie=self._dismax_tie)
            out_q.extend([qid] * len(docs))
            out_d.extend(docs.tolist())
            out_s.extend(scores.tolist())
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "doc_id": pa.array(out_d, pa.int64()),
                         "score": pa.array(out_s, pa.float64())},
                        schema=_PARTIAL_SCHEMA)


def merge_topk(partials: rd.Dataset, offsets: ConvOffsets, k: int,
               n_buckets: int = 256, collapse: bool = False,
               conv_sum: bool = False,
               rows_bound: int | None = None) -> rd.Dataset:
    """Global per-query top-k over scorer partials — ONE shuffle keyed by
    a hash BUCKET of query_id (many queries per map_groups call, the
    per-group-Python-call rule), merged by a vectorized multi-query
    kernel. Selection semantics are exactly :func:`_topk_merge`: rows in
    (score desc, doc_id asc) order per query, cut at k.

    ``collapse``: a conversation straddling a shard boundary arrives as
    one per-shard-best row per shard — dedupe to the global per-conv best
    (same (score desc, doc_id asc) rule) before ranking.

    ``rows_bound``: caller-known upper bound on the partial row count
    (n_work_items × k). When it fits comfortably on the driver the
    merge kernel runs there on the concatenated partials instead of
    paying a Ray groupby's all-to-all fixed cost — the kernel is
    query-independent, so the result is row-identical either way. A
    10^6-shard index blows the bound and takes the exchange."""

    def add_bucket(t: pa.Table) -> pa.Table:
        q = t.column("query_id").to_numpy().astype(np.uint64)
        b = (q * np.uint64(2654435761)) % np.uint64(n_buckets)
        return t.append_column("_qb", pa.array(b.astype(np.int64)))

    def multi_merge(group: pa.Table) -> pa.Table:
        qs = group.column("query_id").to_numpy()
        scores = group.column("score").to_numpy()
        docs = group.column("doc_id").to_numpy()
        if conv_sum and len(qs):
            # add cross-shard partials per (query, conv-start docID) —
            # integer-valued float64 sums, order-free, so a straddling
            # conversation's two shard partials combine exactly
            o2 = np.lexsort((docs, qs))
            q2, d2, s2 = qs[o2], docs[o2], scores[o2]
            head = np.empty(len(o2), bool)
            head[0] = True
            head[1:] = (q2[1:] != q2[:-1]) | (d2[1:] != d2[:-1])
            firsts = np.flatnonzero(head)
            scores = np.add.reduceat(s2, firsts)
            qs, docs = q2[firsts], d2[firsts]
        if collapse and len(qs):
            conv = np.searchsorted(offsets.starts, docs, side="right") - 1
            o2 = np.lexsort((docs, -scores, conv, qs))
            q2, c2 = qs[o2], conv[o2]
            head = np.empty(len(o2), bool)
            head[0] = True
            head[1:] = (q2[1:] != q2[:-1]) | (c2[1:] != c2[:-1])
            sel = o2[head]
            qs, scores, docs = qs[sel], scores[sel], docs[sel]
        order = np.lexsort((docs, -scores, qs))
        qs, scores, docs = qs[order], scores[order], docs[order]
        brk = np.empty(len(qs), bool)
        brk[0] = True
        brk[1:] = np.diff(qs) != 0
        first = np.flatnonzero(brk)
        # rank within query = position - position of the query's first row
        rank = np.arange(len(qs)) - np.repeat(first, np.diff(
            np.concatenate([first, [len(qs)]])))
        keep = rank < k
        qs, scores, docs, rank = qs[keep], scores[keep], docs[keep], rank[keep]
        conv, turn = offsets.doc_to_conv(docs)
        return pa.table({
            "query_id": pa.array(qs, pa.int64()),
            "rank": pa.array((rank + 1).astype(np.int32), pa.int32()),
            "doc_id": pa.array(docs, pa.int64()),
            "score": pa.array(scores, pa.float64()),
            "conv_id": pa.array(conv, pa.string()),
            "turn_idx": pa.array(turn, pa.int32()),
        }, schema=RESULT_SCHEMA)

    if rows_bound is not None and rows_bound <= 262_144:
        import ray
        # materialize() first: to_arrow_refs() on a LAZY dataset pays an
        # extra conversion pass (~0.6 s measured); on a materialized one
        # it hands back the existing block refs for free
        tbl = pa.concat_tables(
            ray.get(partials.materialize().to_arrow_refs()))
        if tbl.num_rows == 0:
            return rd.from_arrow(RESULT_SCHEMA.empty_table())
        return rd.from_arrow(multi_merge(tbl.combine_chunks()))

    return partials.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("_qb").map_groups(multi_merge, batch_format="pyarrow")


def search(index_dir: str, queries, cfg: QueryConfig | None = None,
           allow_docs: "dict[int, np.ndarray] | None" = None,
           search_after: "dict[int, tuple[float, int]] | None" = None
           ) -> rd.Dataset:
    """Top-k BM25 over the index. ``queries``: list[(query_id, text)] or a
    Dataset/Table with (query_id, text). Returns a Dataset of
    (query_id, rank, doc_id, score, conv_id, turn_idx).

    ``allow_docs``: optional per-query candidate restriction
    {query_id: sorted global docID array} (e.g. quoted-phrase filter
    sets) — broadcast once via ``ray.put``, sliced per shard inside the
    scorers, composed with any facet filter. A query absent from the
    dict is unrestricted; an EMPTY array means the filter matched
    nothing (zero results for that query).

    Scale note: the fan-out Dataset has n_queries x n_shards rows and is
    sorted by shard so consecutive batches hit a scorer actor's shard
    cache; the only shuffle is the tiny per-query merge.
    """
    cfg = cfg or QueryConfig()
    # collapse composes with both methods: under WAND the theta bound is
    # conv-granular (score_wand's collapse_starts path)
    if (cfg.weight_attr is not None or cfg.decay_attr is not None) \
            and (cfg.method != "exhaustive" or cfg.mode != "or"):
        raise ValueError('weight_attr/decay_attr (function score) require '
                         'method="exhaustive" in "or" mode (WAND block '
                         "bounds are not weight-aware)")
    if cfg.dismax_tie is not None and (cfg.method != "exhaustive"
                                       or cfg.mode != "or"):
        raise ValueError('dismax_tie requires method="exhaustive" in '
                         '"or" mode (WAND theta bounds assume summed '
                         "contributions)")
    if search_after is not None and (cfg.method != "exhaustive"
                                     or cfg.mode != "or" or cfg.collapse):
        raise ValueError('search_after requires method="exhaustive" in '
                         '"or" mode without collapse (the cursor cut '
                         "happens on raw per-doc scores)")
    if cfg.conv_score_mode is not None:
        if cfg.conv_score_mode != "sum":
            raise ValueError(f"unknown conv_score_mode "
                             f"{cfg.conv_score_mode!r} (only 'sum')")
        if cfg.method != "exhaustive" or cfg.mode != "or" or cfg.collapse \
                or cfg.offset or cfg.weight_attr is not None \
                or cfg.decay_attr is not None or search_after is not None:
            raise ValueError('conv_score_mode="sum" requires method='
                             '"exhaustive" in "or" mode, without collapse/'
                             "offset/function-score/search_after (the sum "
                             "aggregates raw per-turn BM25 over every match)")
    meta = IndexMeta(index_dir)
    offsets = ConvOffsets.load(index_dir)
    # always tokenize queries with the index's own tokenizer (seam:
    # stats.json records the build-time spec)
    from bge_m3_onnx_ray.tokenizer import make_tokenizer
    tok = make_tokenizer(meta.stats.get("tokenizer_spec", "deterministic"))

    if isinstance(queries, rd.Dataset):
        # unbounded query sets never land on the driver — stream them
        return search_bulk(index_dir, queries, cfg)
    if isinstance(queries, pa.Table):
        queries = zip(queries.column("query_id").to_pylist(),
                      queries.column("text").to_pylist())
    qlist = [(int(q), str(t)) for q, t in queries]

    qboost: dict[int, list[float]] = {}
    smap = dict(cfg.synonyms) if cfg.synonyms else {}
    if cfg.parse_negation or cfg.parse_prefix or cfg.parse_fuzzy \
            or cfg.parse_boost or cfg.parse_wildcard or cfg.parse_regex:
        # query syntax on the RAW text (the tokenizer drops '-'/'*'/'^'):
        # "-word" negates (candidate must not contain the term; OOV
        # negations are no-ops); "word*" expands to every dictionary
        # term with that prefix (disjunctive BM25 over the expansion);
        # parse_fuzzy expands every positive token to its Levenshtein-
        # distance-1 dictionary neighbourhood (negations stay exact);
        # "word^2.5" boosts every term the word contributes (a term
        # reached by several words takes the MAX boost; boosts scale the
        # term's idf, which is exact for all scorers — BM25 contributions
        # AND WAND's block upper bounds are linear in idf).
        qpos, qneg = {}, {}
        fuzzy_memo: dict[str, list[str]] = {}  # one dict scan per token
        for qid, text in qlist:
            words = text.split()
            if cfg.parse_negation:
                negs = [w[1:] for w in words
                        if w.startswith("-") and len(w) > 1]
                words = [w for w in words if not w.startswith("-")]
                qneg[qid] = sorted({t for w in negs for t in tok.tokenize(w)})
            else:
                qneg[qid] = []
            terms: set[str] = set()
            tboost: dict[str, float] = {}

            def _note(ts, b, _tb=tboost):
                for t in ts:
                    _tb[t] = max(_tb.get(t, 0.0), b)

            for w in words:
                boost = 1.0
                if cfg.parse_boost and "^" in w[1:]:
                    base, _, bs = w.rpartition("^")
                    try:
                        bv = float(bs)
                    except ValueError:
                        bv = None
                    if bv is not None and bv > 0.0:
                        w, boost = base, bv
                if cfg.parse_regex and len(w) > 2 and w.startswith("/") \
                        and w.endswith("/"):
                    # /pattern/ — anchored RE2 over the dictionary; the
                    # pattern is matched verbatim against normalized
                    # terms (NOT tokenized: regex metachars would mangle)
                    expanded = meta.expand_regex(
                        w[1:-1], cfg.max_prefix_expansion)
                    terms.update(expanded)
                    _note(expanded, boost)
                elif cfg.parse_wildcard and "*" in w and len(w) > 1:
                    # stars anywhere; literal pieces normalize through
                    # the index tokenizer (a piece yielding several
                    # tokens rejoins as one literal run)
                    pieces = ["".join(tok.tokenize(p))
                              for p in w.split("*")]
                    expanded = meta.expand_wildcard(
                        "*".join(pieces), cfg.max_prefix_expansion)
                    terms.update(expanded)
                    _note(expanded, boost)
                elif cfg.parse_prefix and w.endswith("*") and len(w) > 1:
                    ptoks = tok.tokenize(w[:-1])
                    if not ptoks:
                        continue
                    # multi-token prefixes ("data-qu*"): all but the last
                    # normalized token are literals, the last is the prefix
                    expanded = meta.expand_prefix(
                        ptoks[-1], cfg.max_prefix_expansion)
                    terms.update(ptoks[:-1])
                    terms.update(expanded)
                    _note(ptoks[:-1], boost)
                    _note(expanded, boost)
                elif cfg.parse_fuzzy:
                    for t in tok.tokenize(w):
                        got = fuzzy_memo.get(t)
                        if got is None:
                            got = fuzzy_memo[t] = meta.expand_fuzzy(
                                t, cfg.max_fuzzy_expansion)
                        terms.update(got)
                        _note(got, boost)
                else:
                    toks = tok.tokenize(w)
                    terms.update(toks)
                    _note(toks, boost)
            if smap:
                # one-hop query-time synonym expansion; a synonym
                # inherits the MAX boost of any source term
                for t in sorted(terms):
                    exp = smap.get(t)
                    if exp:
                        terms.update(exp)
                        _note(exp, tboost.get(t, 1.0))
            qpos[qid] = sorted(terms)
            qboost[qid] = [tboost[t] for t in qpos[qid]]
        qterms = qpos
    else:
        qterms = {}
        for qid, text in qlist:
            ts = set(tok.tokenize(text))
            if smap:
                for t in sorted(ts):
                    ts.update(smap.get(t, ()))
            qterms[qid] = sorted(ts)
        qneg = {qid: [] for qid, _ in qlist}
    all_terms = sorted({t for ts in qterms.values() for t in ts})
    dfs = meta.load_term_dfs(all_terms) if all_terms else {}
    if cfg.similarity == "classic":
        if cfg.method != "exhaustive" or cfg.mode != "or":
            raise ValueError('similarity="classic" requires '
                             'method="exhaustive", mode="or"')
        # classic weight = idf^2 (query idf x doc idf, Lucene 6+ shape);
        # the square is i*i, mirrored as (expr)*(expr) in the SQL oracle
        idfs = {}
        for t, d in dfs.items():
            i = classic_idf(d, meta.n_docs)
            idfs[t] = i * i
    elif cfg.similarity == "lmd":
        if cfg.method != "exhaustive" or cfg.mode != "or":
            raise ValueError('similarity="lmd" requires '
                             'method="exhaustive", mode="or"')
        # LM-Dirichlet weight = mu * p_c(t) = MU * cf / total_len —
        # collection frequency, not df; operand order mirrored by the
        # SQL oracle (MU * cf first, then / total)
        cfs = meta.load_term_cfs(all_terms) if all_terms else {}
        total = float(meta.total_len)
        idfs = {t: MU * float(c) / total for t, c in cfs.items()}
    else:
        idfs = {t: idf(d, meta.n_docs) for t, d in dfs.items()}

    if cfg.parse_boost:
        pairs = [{"query_id": qid, "terms": ts, "shard": s,
                  "neg": qneg[qid], "boosts": qboost[qid]}
                 for s in meta.shards
                 for qid, ts in qterms.items() if ts]
    else:
        pairs = [{"query_id": qid, "terms": ts, "shard": s,
                  "neg": qneg[qid]}
                 for s in meta.shards
                 for qid, ts in qterms.items() if ts]
    if not pairs:
        return rd.from_arrow(RESULT_SCHEMA.empty_table())
    allow_ref = None
    if allow_docs is not None:
        import ray
        allow_ref = ray.put({int(q): np.asarray(a, np.int64)
                             for q, a in allow_docs.items()})
    after_ref = None
    if search_after is not None:
        import ray
        after_ref = ray.put({int(q): (float(s), int(d))
                             for q, (s, d) in search_after.items()})
    fanout = rd.from_items(sorted(pairs, key=lambda r: r["shard"]))
    # pagination: fetch offset+k everywhere (per-shard partials AND the
    # merge), then drop ranks <= offset — ranks stay GLOBAL (offset+1..),
    # so page boundaries are stable under the deterministic tie-break
    fetch = cfg.k + cfg.offset
    # size the scorer pool to the WORK, not the autoscaler: a fixed pool
    # of min(batches, cap) actors skips the ramp-up rounds the (lo, hi)
    # autoscaling pool pays on every one-shot search (measured ~0.3 s on
    # a 10-batch fan-out), and a 1-batch search spawns exactly 1 actor
    conc = cfg.scorer_concurrency
    if isinstance(conc, tuple):
        n_batches = -(-len(pairs) // cfg.scorer_batch_size)
        conc = min(max(conc[0], n_batches), conc[1])
    partials = fanout.map_batches(
        ShardScorer,
        fn_constructor_kwargs={"index_dir": index_dir, "idfs": idfs,
                               "k": fetch, "method": cfg.method,
                               "cache_size": cfg.shard_cache_size,
                               "mode": cfg.mode,
                               "filter_attr": cfg.filter_attr,
                               "filter_value": cfg.filter_value,
                               "allow_docs_ref": allow_ref,
                               "msm": cfg.min_should_match,
                               "filter_range": cfg.filter_range,
                               "collapse": cfg.collapse,
                               "weight_attr": cfg.weight_attr,
                               "attr_weights": cfg.attr_weights,
                               "decay_attr": cfg.decay_attr,
                               "similarity": cfg.similarity,
                               "dismax_tie": cfg.dismax_tie,
                               "after_ref": after_ref,
                               "conv_sum": cfg.conv_score_mode == "sum"},
        batch_format="pyarrow", batch_size=cfg.scorer_batch_size,
        concurrency=conc, num_cpus=1)
    out = merge_topk(partials, offsets, fetch, collapse=cfg.collapse,
                     conv_sum=cfg.conv_score_mode == "sum",
                     # conv_sum emits one row per matched CONV per item
                     # (unbounded by k) — only the exchange path there
                     rows_bound=(None if cfg.conv_score_mode == "sum"
                                 else len(pairs) * fetch))
    if cfg.offset:
        out = out.map_batches(
            lambda t, _o=cfg.offset: t.filter(pc.greater(t.column("rank"), _o)),
            batch_format="pyarrow")
    return out


_TOK_CACHE: dict[str, object] = {}


def search_bulk(index_dir: str, queries: rd.Dataset,
                cfg: QueryConfig | None = None) -> rd.Dataset:
    """Streaming bulk search: ``queries`` is a Dataset of
    (query_id, text) that never materializes on the driver.

    The driver resolves nothing per query — tokenization happens inside
    the fan-out ``map_batches`` (per-worker cached tokenizer), global idf
    inside the scorer actors via the bucketed dictionary artifact
    (:class:`_DictDfLookup`), so a 10^9-row query table streams through
    with backpressure like any other Dataset. Results are identical to
    :func:`search` on the same queries: same tokenizer, same global df,
    same ascending-term accumulation and (score desc, doc_id asc) ties.

    Each query still visits every shard (partition-by-document layout);
    rows are emitted shard-major per batch so a scorer actor's shard LRU
    and per-batch decode memo get long same-shard runs."""
    cfg = cfg or QueryConfig()
    # collapse composes with both methods: under WAND the theta bound is
    # conv-granular (score_wand's collapse_starts path)
    if (cfg.weight_attr is not None or cfg.decay_attr is not None) \
            and (cfg.method != "exhaustive" or cfg.mode != "or"):
        raise ValueError('weight_attr/decay_attr (function score) require '
                         'method="exhaustive" in "or" mode (WAND block '
                         "bounds are not weight-aware)")
    # the streaming fan-out implements negation parsing only; refuse the
    # other query-syntax flags LOUDLY rather than silently ignoring them
    # (prefix/fuzzy need dictionary expansion, boosts/synonyms per-term
    # metadata the fan stage does not emit yet)
    unsupported = [f for f, on in (("parse_prefix", cfg.parse_prefix),
                                   ("parse_fuzzy", cfg.parse_fuzzy),
                                   ("parse_boost", cfg.parse_boost),
                                   ("parse_wildcard", cfg.parse_wildcard),
                                   ("parse_regex", cfg.parse_regex),
                                   ("synonyms", bool(cfg.synonyms))) if on]
    if unsupported:
        raise NotImplementedError(
            f"search_bulk does not support {unsupported}; use search() "
            f"with a materialized query list for these")
    meta = IndexMeta(index_dir)
    offsets = ConvOffsets.load(index_dir)
    spec = meta.stats.get("tokenizer_spec", "deterministic")
    shards = np.asarray(meta.shards, np.int64)

    parse_neg = cfg.parse_negation

    def fan(batch: pa.Table) -> pa.Table:
        from bge_m3_onnx_ray.tokenizer import make_tokenizer
        tok = _TOK_CACHE.get(spec)
        if tok is None:
            tok = _TOK_CACHE[spec] = make_tokenizer(spec)
        qids = batch.column("query_id").to_numpy()
        texts = batch.column("text").to_pylist()
        negs: list[list[str]]
        if parse_neg:  # same "-word" split as the driver path in search()
            pos_texts, negs = [], []
            for t in texts:
                words = (t or "").split()
                negs.append(sorted({x for w in words
                                    if w.startswith("-") and len(w) > 1
                                    for x in tok.tokenize(w[1:])}))
                pos_texts.append(" ".join(w for w in words
                                          if not w.startswith("-")))
            texts = pos_texts
        else:
            negs = [[] for _ in texts]
        terms = [sorted(set(tok.tokenize(t or ""))) for t in texts]
        keep = np.asarray([len(t) > 0 for t in terms], bool)
        if not keep.any():
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "terms": pa.array([], pa.list_(pa.string())),
                             "neg": pa.array([], pa.list_(pa.string())),
                             "shard": pa.array([], pa.int64())})
        qids = qids[keep].astype(np.int64)
        terms = [t for t, k_ in zip(terms, keep) if k_]
        negs = [n for n, k_ in zip(negs, keep) if k_]
        nq, ns = len(qids), len(shards)
        # shard-major: all queries of this batch for shard s are adjacent
        return pa.table({
            "query_id": pa.array(np.tile(qids, ns), pa.int64()),
            "terms": pa.array([terms[i] for _ in range(ns)
                               for i in range(nq)], pa.list_(pa.string())),
            "neg": pa.array([negs[i] for _ in range(ns)
                             for i in range(nq)], pa.list_(pa.string())),
            "shard": pa.array(np.repeat(shards, nq), pa.int64()),
        })

    fanout = queries.map_batches(fan, batch_format="pyarrow",
                                 batch_size=cfg.scorer_batch_size)
    fetch = cfg.k + cfg.offset
    partials = fanout.map_batches(
        ShardScorer,
        fn_constructor_kwargs={"index_dir": index_dir, "idfs": None,
                               "k": fetch, "method": cfg.method,
                               "cache_size": cfg.shard_cache_size,
                               "mode": cfg.mode,
                               "filter_attr": cfg.filter_attr,
                               "filter_value": cfg.filter_value,
                               "msm": cfg.min_should_match,
                               "filter_range": cfg.filter_range,
                               "collapse": cfg.collapse,
                               "weight_attr": cfg.weight_attr,
                               "attr_weights": cfg.attr_weights,
                               "decay_attr": cfg.decay_attr},
        batch_format="pyarrow", batch_size=cfg.scorer_batch_size,
        concurrency=cfg.scorer_concurrency, num_cpus=1)
    out = merge_topk(partials, offsets, fetch, collapse=cfg.collapse)
    if cfg.offset:
        out = out.map_batches(
            lambda t, _o=cfg.offset: t.filter(pc.greater(t.column("rank"), _o)),
            batch_format="pyarrow")
    return out


def search_bool(index_dir: str,
                queries: "list[tuple[int, str, str, str]]",
                cfg: QueryConfig | None = None) -> rd.Dataset:
    """Compound boolean search — the Lucene BooleanQuery / Elasticsearch
    bool query: ``queries`` rows are (query_id, must_text, should_text,
    must_not_text). Candidates contain EVERY must term and NO must_not
    term; the score is the plain BM25 sum over every present must-or-
    should term (should clauses boost ranking, never matching — SHOULD
    with a MUST present is purely additive, as in Lucene).

    Distribution is the standard fan-out: the must intersection runs
    per shard (smallest posting list first), becomes an `allowed` mask
    for the exhaustive scorer, and partials merge through the same tiny
    per-query top-k shuffle as every other mode."""
    cfg = cfg or QueryConfig()
    meta = IndexMeta(index_dir)
    offsets = ConvOffsets.load(index_dir)
    from bge_m3_onnx_ray.tokenizer import make_tokenizer
    tok = make_tokenizer(meta.stats.get("tokenizer_spec", "deterministic"))

    rows = []
    all_terms: set[str] = set()
    for qid, must_text, should_text, not_text in queries:
        must = sorted(set(tok.tokenize(must_text)))
        if not must:
            raise ValueError(f"query {qid}: empty must clause")
        should = sorted(set(tok.tokenize(should_text or "")))
        neg = sorted(set(tok.tokenize(not_text or "")))
        terms = sorted(set(must) | set(should))
        all_terms.update(terms)
        rows.append({"query_id": int(qid), "terms": terms, "must": must,
                     "neg": neg})
    dfs = meta.load_term_dfs(sorted(all_terms)) if all_terms else {}
    idfs = {t: idf(d, meta.n_docs) for t, d in dfs.items()}

    pairs = [dict(r, shard=s) for s in meta.shards for r in rows]
    if not pairs:
        return rd.from_arrow(RESULT_SCHEMA.empty_table())
    fanout = rd.from_items(sorted(pairs, key=lambda r: r["shard"]))
    partials = fanout.map_batches(
        ShardScorer,
        fn_constructor_kwargs={"index_dir": index_dir, "idfs": idfs,
                               "k": cfg.k, "method": "exhaustive",
                               "cache_size": cfg.shard_cache_size,
                               "mode": "bool"},
        batch_format="pyarrow", batch_size=cfg.scorer_batch_size,
        concurrency=cfg.scorer_concurrency, num_cpus=1)
    return merge_topk(partials, offsets, cfg.k,
                      rows_bound=len(pairs) * cfg.k)


def search_boosting(index_dir: str,
                    queries: "list[tuple[int, str, str]]",
                    cfg: QueryConfig | None = None,
                    negative_boost: float = 0.5) -> rd.Dataset:
    """Boosting search — the Elasticsearch/Lucene ``boosting`` query:
    ``queries`` rows are (query_id, positive_text, negative_text).
    Candidates and base scores come from the positive clause alone
    (plain BM25 OR); a candidate that ALSO matches any negative term is
    DEMOTED — score × ``negative_boost`` — not excluded (the contrast
    with bool must_not). Demotion applies inside the shard scorer
    BEFORE any top-k cut, so a demoted doc correctly drops below
    non-demoted docs that would otherwise miss the per-shard partial.

    ``negative_boost`` defaults to 0.5 (one FP exponent decrement) so
    demoted scores are bit-exact products, oracle-mirrorable. Fan-out,
    postings decode memo and the per-query top-k merge shuffle are the
    standard search machinery; the negative terms ride the same
    per-shard postings path as bool's must_not."""
    cfg = cfg or QueryConfig()
    meta = IndexMeta(index_dir)
    offsets = ConvOffsets.load(index_dir)
    from bge_m3_onnx_ray.tokenizer import make_tokenizer
    tok = make_tokenizer(meta.stats.get("tokenizer_spec", "deterministic"))

    rows = []
    all_terms: set[str] = set()
    for qid, pos_text, neg_text in queries:
        terms = sorted(set(tok.tokenize(pos_text)))
        if not terms:
            continue
        demote = sorted(set(tok.tokenize(neg_text or "")))
        all_terms.update(terms)
        rows.append({"query_id": int(qid), "terms": terms,
                     "demote": demote})
    dfs = meta.load_term_dfs(sorted(all_terms)) if all_terms else {}
    idfs = {t: idf(d, meta.n_docs) for t, d in dfs.items()}

    pairs = [dict(r, shard=s) for s in meta.shards for r in rows]
    if not pairs:
        return rd.from_arrow(RESULT_SCHEMA.empty_table())
    pairs.sort(key=lambda r: r["shard"])
    # explicit schema: an all-empty demote column must still be
    # list<string>, not the inferred list<null> (blocks would disagree)
    fanout = rd.from_arrow(pa.table({
        "query_id": pa.array([p["query_id"] for p in pairs], pa.int64()),
        "terms": pa.array([p["terms"] for p in pairs],
                          pa.list_(pa.string())),
        "demote": pa.array([p["demote"] for p in pairs],
                           pa.list_(pa.string())),
        "shard": pa.array([p["shard"] for p in pairs], pa.int64())}))
    partials = fanout.map_batches(
        ShardScorer,
        fn_constructor_kwargs={"index_dir": index_dir, "idfs": idfs,
                               "k": cfg.k, "method": "exhaustive",
                               "cache_size": cfg.shard_cache_size,
                               "demote_weight": float(negative_boost)},
        batch_format="pyarrow", batch_size=cfg.scorer_batch_size,
        concurrency=cfg.scorer_concurrency, num_cpus=1)
    return merge_topk(partials, offsets, cfg.k,
                      rows_bound=len(pairs) * cfg.k)


def rescore_search(index_dir: str, queries, cfg: QueryConfig | None = None,
                   window: int = 30, rescore_weight: float = 0.5
                   ) -> "pa.Table":
    """Two-phase window rescore (the Elasticsearch ``rescore`` shape):
    a cheap first pass (WAND BM25 by default, per ``cfg``) retrieves the
    top ``window`` documents per query; a second, more expensive model —
    classic TF-IDF via the pluggable similarity seam — re-scores ONLY
    those documents, and the final ranking is

        combined = bm25 + rescore_weight * classic

    (query_weight fixed at 1.0; operand grouping is the determinism
    contract mirrored by the SQL oracle). The second pass runs as a
    normal distributed search restricted to the window via per-query
    ``allow_docs`` sets, so no new scorer machinery exists: phase 2 is
    exactly the candidate-restriction path quoted-phrase queries use.

    Scale: phase-2 work is O(n_queries x window) postings lookups and
    the driver holds only n_queries x window result rows — the window is
    a per-query constant, so this is top-k-result-sized data, never
    corpus-sized. Returns an Arrow table (query_id, rank, doc_id, score,
    conv_id, turn_idx) with ranks 1..k by combined score.
    """
    cfg = cfg or QueryConfig()
    if cfg.similarity != "bm25":
        raise ValueError("rescore_search's first pass is BM25; the "
                         "rescorer is the classic similarity")
    if window < cfg.k:
        raise ValueError(f"window ({window}) must be >= k ({cfg.k})")
    from dataclasses import replace
    base = search(index_dir, queries,
                  replace(cfg, k=window)).to_pandas()
    if not len(base):
        return RESULT_SCHEMA.empty_table()
    allow = {int(qid): np.sort(g["doc_id"].to_numpy())
             for qid, g in base.groupby("query_id")}
    cls = search(index_dir, queries,
                 QueryConfig(k=window, method="exhaustive",
                             similarity="classic",
                             scorer_concurrency=cfg.scorer_concurrency,
                             scorer_batch_size=cfg.scorer_batch_size),
                 allow_docs=allow).to_pandas()
    m = base.merge(cls[["query_id", "doc_id", "score"]],
                   on=["query_id", "doc_id"], how="inner",
                   suffixes=("", "_rescore"))
    assert len(m) == len(base), "window doc missing a rescore score"
    m["score"] = (m["score"].to_numpy()
                  + rescore_weight * m["score_rescore"].to_numpy())
    m = m.sort_values(["query_id", "score", "doc_id"],
                      ascending=[True, False, True], kind="mergesort")
    m["rank"] = m.groupby("query_id").cumcount() + 1
    m = m[m["rank"] <= cfg.k].reset_index(drop=True)
    return pa.Table.from_pandas(
        m[["query_id", "rank", "doc_id", "score", "conv_id", "turn_idx"]],
        preserve_index=False).cast(pa.schema([
            ("query_id", pa.int64()), ("rank", pa.int32()),
            ("doc_id", pa.int64()), ("score", pa.float64()),
            ("conv_id", pa.string()), ("turn_idx", pa.int32())]))
