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
from bge_m3_onnx_ray.scoring import bm25_term_score, idf
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


def score_exhaustive(postings: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]],
                     qterms: list[str], idfs: dict[str, float],
                     avgdl: float, k1: float, b: float, k: int):
    """Exact scorer over fully-decoded postings (the parity fallback the
    reference keeps alongside its fast path). ``qterms`` must be sorted."""
    arrs = [(t,) + postings[t] for t in qterms if t in postings]
    if not arrs:
        return np.empty(0, np.float64), np.empty(0, np.int64)
    union = np.unique(np.concatenate([a[1] for a in arrs]))
    scores = np.zeros(len(union), np.float64)
    for t, docs, tfs, dls in arrs:  # ascending term order = summation order
        contrib = bm25_term_score(tfs.astype(np.float64), dls.astype(np.float64),
                                  idfs[t], avgdl, k1, b)
        scores[np.searchsorted(union, docs)] += contrib
    return _topk_merge(scores, union, k)


class _Cursor:
    __slots__ = ("enc", "block_size", "idf", "ub", "bi", "pos",
                 "bdocs", "btfs", "bdls", "done")

    def __init__(self, enc: EncodedPostings, block_size: int, idf_t: float,
                 avgdl: float, k1: float, b: float):
        self.enc = enc
        self.block_size = block_size
        self.idf = idf_t
        bounds = bm25_term_score(enc.max_tf.astype(np.float64),
                                 enc.min_dl.astype(np.float64),
                                 idf_t, avgdl, k1, b)
        self.ub = float(bounds.max())  # term-level upper bound
        self.bi = -1
        self.done = False
        self._load(0)

    def _load(self, bi: int):
        if bi >= len(self.enc.last_ids):
            self.done = True
            return
        self.bi = bi
        self.bdocs, self.btfs, self.bdls = decode_block(self.enc, bi, self.block_size)
        self.pos = 0

    @property
    def doc(self) -> int:
        return int(self.bdocs[self.pos]) if not self.done else 1 << 62

    def _block_at(self, d: int) -> int:
        """Index of the block that would contain doc ``d`` (>= current
        position), or n_blocks if the list ends before ``d``."""
        if self.done:
            return len(self.enc.last_ids)
        if self.enc.last_ids[self.bi] >= d:
            return self.bi
        return int(np.searchsorted(self.enc.last_ids, d))

    def block_bound_at(self, d: int, avgdl, k1, b) -> float:
        """Upper bound of this term's contribution to doc ``d`` — from the
        (max_tf, min_dl) of the block containing ``d``, NOT the cursor's
        current block (a lagging cursor may sit blocks earlier)."""
        bi = self._block_at(d)
        if bi >= len(self.enc.last_ids):
            return 0.0
        return bm25_term_score(float(self.enc.max_tf[bi]),
                               float(self.enc.min_dl[bi]), self.idf, avgdl, k1, b)

    def block_last_at(self, d: int) -> int:
        bi = self._block_at(d)
        if bi >= len(self.enc.last_ids):
            return 1 << 62
        return int(self.enc.last_ids[bi])

    def contribution(self, avgdl, k1, b) -> float:
        return bm25_term_score(float(self.btfs[self.pos]), float(self.bdls[self.pos]),
                               self.idf, avgdl, k1, b)

    def advance(self):
        self.pos += 1
        if self.pos >= len(self.bdocs):
            self._load(self.bi + 1)

    def seek(self, target: int):
        """Advance to the first posting with doc >= target (block-skipping)."""
        if self.done or self.doc >= target:
            return
        if self.enc.last_ids[self.bi] < target:
            bi = int(np.searchsorted(self.enc.last_ids, target))
            if bi >= len(self.enc.last_ids):
                self.done = True
                return
            self._load(bi)
        self.pos = int(np.searchsorted(self.bdocs, target))
        if self.pos >= len(self.bdocs):  # defensive; last_ids guarantee not
            self._load(self.bi + 1)


def score_wand(enc_postings: dict[str, EncodedPostings], qterms: list[str],
               idfs: dict[str, float], avgdl: float, k1: float, b: float,
               k: int, block_size: int):
    """Block-max WAND top-k. ``qterms`` sorted ascending; cursors carry the
    per-block (max_tf, min_dl) bounds from the codec. Pruning uses strict
    ``<`` against the heap threshold so equal-score/lower-docID candidates
    are never skipped (rank-identical guarantee incl. ties)."""
    import heapq
    cursors = {t: _Cursor(enc_postings[t], block_size, idfs[t], avgdl, k1, b)
               for t in qterms if t in enc_postings}
    if not cursors:
        return np.empty(0, np.float64), np.empty(0, np.int64)
    heap: list[tuple[float, int]] = []  # (score, -doc_id) min-heap of top-k
    live = [t for t in qterms if not cursors[t].done]
    while live:
        live.sort(key=lambda t: cursors[t].doc)
        theta = heap[0][0] if len(heap) == k else -1.0
        # pivot: first prefix whose summed term UBs reach theta
        acc = 0.0
        pivot_i = -1
        for i, t in enumerate(live):
            acc += cursors[t].ub
            if acc >= theta:
                pivot_i = i
                break
        if pivot_i < 0:
            break  # total upper bound below threshold — exhausted
        pivot_doc = cursors[live[pivot_i]].doc
        if cursors[live[0]].doc == pivot_doc:
            # all cursors up to (and possibly beyond) the pivot are ALIGNED
            # on pivot_doc here (sorted + live[0]==pivot ⇒ prefix equal).
            aligned = [t for t in live if cursors[t].doc == pivot_doc]
            # shallow block-max check: bound pivot_doc's total score by the
            # per-term (max_tf, min_dl) of the block CONTAINING pivot_doc
            bsum = 0.0
            for t in aligned:
                bsum += cursors[t].block_bound_at(pivot_doc, avgdl, k1, b)
            if len(heap) == k and bsum < theta:
                # BMW skip (Ding & Suel 2011): the bound stays valid up to
                # the earliest block end among aligned terms; beyond-pivot
                # cursors (> pivot) cap the skip — their docs still need
                # evaluation. Advance the highest-impact aligned term.
                nxt = min(cursors[t].block_last_at(pivot_doc) for t in aligned) + 1
                for t in live:
                    if cursors[t].doc > pivot_doc:
                        nxt = min(nxt, cursors[t].doc)
                        break
                tmax = max(aligned, key=lambda t: cursors[t].ub)
                cursors[tmax].seek(max(nxt, pivot_doc + 1))
            else:
                # full evaluation: ascending term order, from 0.0 (bit-
                # identical to the exhaustive scorer's accumulation)
                s = 0.0
                matched = [t for t in qterms
                           if t in cursors and not cursors[t].done
                           and cursors[t].doc == pivot_doc]
                for t in matched:
                    s += cursors[t].contribution(avgdl, k1, b)
                item = (s, -pivot_doc)
                if len(heap) < k:
                    heapq.heappush(heap, item)
                elif item > heap[0]:
                    heapq.heapreplace(heap, item)
                for t in matched:
                    cursors[t].advance()
        else:
            # advance the highest-impact lagging term up to the pivot
            lag = [t for t in live[: pivot_i + 1] if cursors[t].doc < pivot_doc]
            tmax = max(lag, key=lambda t: cursors[t].ub)
            cursors[tmax].seek(pivot_doc)
        live = [t for t in live if not cursors[t].done]
    out = sorted(heap, key=lambda it: (-it[0], -it[1]))
    return (np.array([s for s, _ in out], np.float64),
            np.array([-d for _, d in out], np.int64))


class ShardScorer:
    """Scoring actor: holds decoded postings per shard in a bounded LRU
    (loaded once per actor — the reference's sessions-in-__init__ pattern,
    ``samples/python/bge_m3_embedder.py:36-50``). Input batch rows are
    (query_id, terms list, shard); output partial top-k rows."""

    def __init__(self, index_dir: str, idfs: dict[str, float], k: int,
                 method: str, cache_size: int):
        self.meta = IndexMeta(index_dir)
        self.idfs = idfs
        self.k = k
        self.method = method
        self.cache: OrderedDict[int, dict[str, EncodedPostings]] = OrderedDict()
        self.cache_size = cache_size

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
        for qid, terms, shard in zip(qids, termss, shards):
            terms = [t for t in terms if self.idfs.get(t) is not None]
            if not terms:
                continue
            post = self._shard_postings(int(shard), terms)
            avail = {t: e for t in terms if (e := post.get(t)) is not None}
            if not avail:
                continue
            if self.method == "wand":
                scores, docs = score_wand(avail, sorted(avail), self.idfs,
                                          m.avgdl, m.k1, m.b, self.k, m.block_size)
            else:
                decoded = {t: decode_postings(e, m.block_size)
                           for t, e in avail.items()}
                scores, docs = score_exhaustive(decoded, sorted(decoded), self.idfs,
                                                m.avgdl, m.k1, m.b, self.k)
            out_q.extend([qid] * len(docs))
            out_d.extend(docs.tolist())
            out_s.extend(scores.tolist())
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "doc_id": pa.array(out_d, pa.int64()),
                         "score": pa.array(out_s, pa.float64())},
                        schema=_PARTIAL_SCHEMA)


def make_merge_topk_fn(offsets: ConvOffsets, k: int):
    def merge(group: pa.Table) -> pa.Table:
        qid = group.column("query_id")[0].as_py()
        scores = group.column("score").to_numpy()
        docs = group.column("doc_id").to_numpy()
        s, d = _topk_merge(scores, docs, k)
        conv, turn = offsets.doc_to_conv(d)
        return pa.table({
            "query_id": pa.array(np.full(len(d), qid), pa.int64()),
            "rank": pa.array(np.arange(1, len(d) + 1, dtype=np.int32), pa.int32()),
            "doc_id": pa.array(d, pa.int64()),
            "score": pa.array(s, pa.float64()),
            "conv_id": pa.array(conv, pa.string()),
            "turn_idx": pa.array(turn, pa.int32()),
        }, schema=RESULT_SCHEMA)
    return merge


def search(index_dir: str, queries, cfg: QueryConfig | None = None) -> rd.Dataset:
    """Top-k BM25 over the index. ``queries``: list[(query_id, text)] or a
    Dataset/Table with (query_id, text). Returns a Dataset of
    (query_id, rank, doc_id, score, conv_id, turn_idx).

    Scale note: the fan-out Dataset has n_queries x n_shards rows and is
    sorted by shard so consecutive batches hit a scorer actor's shard
    cache; the only shuffle is the tiny per-query merge.
    """
    cfg = cfg or QueryConfig()
    meta = IndexMeta(index_dir)
    offsets = ConvOffsets.load(index_dir)
    tok = DeterministicTokenizer()

    if isinstance(queries, rd.Dataset):
        queries = queries.to_pandas()[["query_id", "text"]].itertuples(index=False)
    elif isinstance(queries, pa.Table):
        queries = zip(queries.column("query_id").to_pylist(),
                      queries.column("text").to_pylist())
    qlist = [(int(q), str(t)) for q, t in queries]

    qterms = {qid: sorted(set(tok.tokenize(text))) for qid, text in qlist}
    all_terms = sorted({t for ts in qterms.values() for t in ts})
    dfs = meta.load_term_dfs(all_terms) if all_terms else {}
    idfs = {t: idf(d, meta.n_docs) for t, d in dfs.items()}

    pairs = [{"query_id": qid, "terms": ts, "shard": s}
             for s in meta.shards
             for qid, ts in qterms.items() if ts]
    if not pairs:
        return rd.from_arrow(RESULT_SCHEMA.empty_table())
    fanout = rd.from_items(sorted(pairs, key=lambda r: r["shard"]))
    partials = fanout.map_batches(
        ShardScorer,
        fn_constructor_kwargs={"index_dir": index_dir, "idfs": idfs,
                               "k": cfg.k, "method": cfg.method,
                               "cache_size": cfg.shard_cache_size},
        batch_format="pyarrow", batch_size=cfg.scorer_batch_size,
        concurrency=cfg.scorer_concurrency, num_cpus=1)
    return partials.groupby("query_id").map_groups(
        make_merge_topk_fn(offsets, cfg.k), batch_format="pyarrow")
