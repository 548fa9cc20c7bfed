"""Positional index + phrase queries.

The reference's data model carries per-token POSITIONS through its whole
pipeline (the tokenizer emits ``token_indices`` — position of each token
in the text — and the embedder re-sorts by them,
``samples/python/bge_m3_embedder.py:85-98``); its per-document sparse
dict then throws the positions away. A fulltext engine keeps them: a
positional posting list per term (doc → ascending in-doc positions)
is what answers exact PHRASE queries ("a b c" = docs where the terms
appear consecutively), scored with BM25 over the phrase frequency.

Layout (beside the main index in ``index_dir``)::

    positions/shard-SSSSS-bucket-BB.parquet   per-term occurrence lists
    positions_manifest.json                   fingerprint + files (resume)

Build is the same Ray-Data shape as the postings build
(``index/build.py``): a SPIMI ``map_batches`` stage emits
varint-compressed occurrence SEGMENTS (one row per (term, shard) per
batch), ONE ``groupby(gkey)`` shuffle co-partitioned by (docID-range
shard, term-hash bucket) merges them, per-group atomic parquet writes.
Occurrences cost ~2 bytes each (doc-gap + position-delta varints), so
the exchange is ~the size of the postings exchange.

Query: phrase terms' occurrence lists are loaded per shard
(predicate-pushdown parquet read), docs+positions packed into one int64
key, and the phrase match is a chain of sorted-set intersections —
``keys(w0) ∩ (keys(w1)-1) ∩ ... ∩ (keys(wm)-(m-1))`` — entirely in
numpy. Phrase tf = surviving start positions per doc; the score is the
standard BM25 term score with the phrase as the "term" (df = number of
matching docs, computed globally from the match set itself).
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from bge_m3_onnx_ray.config import IndexConfig
from bge_m3_onnx_ray.index.artifacts import (
    ConvOffsets,
    IndexMeta,
    atomic_write_json,
    atomic_write_parquet,
    doc_lens_file,
)
from bge_m3_onnx_ray.index.codec import decode_varints, encode_varints
from bge_m3_onnx_ray.scoring import bm25_term_score, idf

POSITIONS_SCHEMA = pa.schema([
    ("term", pa.string()),
    ("n", pa.int64()),        # total occurrences of the term in the shard
    ("blob", pa.binary()),    # encode_occ_segments stream (one segment)
])

_OCCROW_SCHEMA = pa.schema([
    ("term", pa.large_string()),
    ("gkey", pa.int64()),
    ("min_doc", pa.int64()),
    ("n", pa.int32()),
    ("blob", pa.large_binary()),
])


def positions_file(index_dir: str, shard: int, bucket: int) -> str:
    return os.path.join(index_dir, "positions",
                        f"shard-{shard:05d}-bucket-{bucket:02d}.parquet")


# ------------------------------------------------------------ occurrence codec

def encode_occ_segments(seg_bounds: np.ndarray, docs: np.ndarray,
                        poss: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Varint-encode MANY occurrence segments in one vectorized pass.

    Rows must be grouped by segment (``seg_bounds``: n_segs+1 boundaries)
    and sorted by (doc, pos) within each segment. Per segment the stream
    is ``varint(doc gaps) ++ varint(pos values)`` where the doc gap is
    ``doc+1`` for a segment's first row, else ``diff(doc)`` (0 = same
    doc), and the pos value is ``pos+1`` when the doc changed, else
    ``diff(pos)``. Returns (bytes, per-segment byte offsets).
    Same two-level shrinkage as the postings build: partial aggregation
    into segments, then varint compression BEFORE the merge shuffle.
    """
    n = len(docs)
    n_segs = len(seg_bounds) - 1
    if n == 0:
        return b"", np.zeros(n_segs + 1, np.int64)
    docs = np.ascontiguousarray(docs, np.int64)
    poss = np.ascontiguousarray(poss, np.int64)
    counts = np.diff(seg_bounds)
    rowpos = np.arange(n) - np.repeat(seg_bounds[:-1], counts)
    first = rowpos == 0
    dgap = np.empty(n, np.int64)
    dgap[1:] = docs[1:] - docs[:-1]
    dgap[first] = docs[first] + 1
    newdoc = dgap > 0                 # segment-first rows always qualify
    pval = np.empty(n, np.int64)
    pval[1:] = poss[1:] - poss[:-1]
    pval[newdoc] = poss[newdoc] + 1
    # stream order (segment, section, pos) via one composite key
    seg_of = np.repeat(np.arange(n_segs, dtype=np.int64), counts)
    maxlen = int(counts.max()) + 1
    key = np.concatenate([seg_of, seg_of]) * (2 * maxlen) \
        + np.repeat(np.arange(2, dtype=np.int64), n) * maxlen \
        + np.concatenate([rowpos, rowpos])
    order = np.argsort(key, kind="stable")
    vals2 = np.concatenate([dgap, pval]).astype(np.uint64)
    blob, nbytes = encode_varints(vals2[order])
    elem_starts = np.zeros(n_segs, np.int64)
    np.cumsum(2 * counts[:-1], out=elem_starts[1:])
    seg_sizes = np.add.reduceat(nbytes, elem_starts)
    offs = np.zeros(n_segs + 1, np.int64)
    np.cumsum(seg_sizes, out=offs[1:])
    return blob, offs


def decode_occ_rows(bdata: np.ndarray, boffs: np.ndarray, ns: np.ndarray,
                    row_order: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Decode MANY :func:`encode_occ_segments` segments in one vectorized
    pass and concatenate their (docs, positions) in ``row_order`` — the
    occurrence twin of ``codec.decode_segments_many``."""
    if not len(row_order):
        e = np.empty(0, np.int64)
        return e, e
    ns = np.ascontiguousarray(ns, np.int64)
    vals = decode_varints(bdata[boffs[0]:boffs[-1]], int(2 * ns.sum())) \
        .astype(np.int64)
    vstart = np.zeros(len(ns), np.int64)
    np.cumsum(2 * ns[:-1], out=vstart[1:])
    lr = ns[row_order]
    k = int(lr.sum())
    seg_start_pos = np.concatenate([[0], np.cumsum(lr[:-1])])
    within = np.arange(k) - np.repeat(seg_start_pos, lr)
    base = np.repeat(vstart[row_order], lr) + within
    dgap = vals[base]
    pval = vals[base + np.repeat(lr, lr)]
    # docs: segmented cumsum of gaps, reset at each segment start
    c = np.cumsum(dgap)
    c_exc = np.concatenate([[0], c[:-1]])
    docs = c - np.repeat(c_exc[seg_start_pos], lr) - 1
    # positions: segmented cumsum of pval, reset at each doc change
    # (newdoc rows carry pos+1; a segment's first row is always newdoc)
    newdoc = dgap > 0
    nd_idx = np.flatnonzero(newdoc)
    run_lens = np.diff(np.concatenate([nd_idx, [k]]))
    c2 = np.cumsum(pval)
    c2_exc = np.concatenate([[0], c2[:-1]])
    poss = c2 - np.repeat(c2_exc[nd_idx], run_lens) - 1
    return docs, poss


# ------------------------------------------------------------ build

class TokenizeOccurrences:
    """SPIMI occurrences stage: per batch, emit one varint segment row per
    (term, shard) holding the (doc, position) stream of every occurrence.
    Same broadcast-offsets docID assignment, shard/bucket keys and warm
    task-pool execution as ``build.TokenizePostings``."""

    def __init__(self, offsets_ref, docs_per_shard: int, term_buckets: int,
                 done_shards: tuple[int, ...] = (),
                 tokenizer_spec: str = "deterministic"):
        pa.set_cpu_count(1)
        from bge_m3_onnx_ray.index.build import get_broadcast
        from bge_m3_onnx_ray.tokenizer import make_tokenizer
        self.offsets: ConvOffsets = get_broadcast(offsets_ref)
        self.tok = make_tokenizer(tokenizer_spec)
        self.docs_per_shard = docs_per_shard
        self.nb = term_buckets
        self.done = np.array(sorted(done_shards), np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import zlib
        conv = batch.column("conv_id")
        turn = batch.column("turn_idx").to_numpy()
        doc_ids = self.offsets.doc_ids_for(conv, turn)
        shard = doc_ids // self.docs_per_shard
        texts = batch.column("text")
        if len(self.done):
            keep = ~np.isin(shard, self.done)
            if not keep.any():
                return _OCCROW_SCHEMA.empty_table()
            doc_ids, shard = doc_ids[keep], shard[keep]
            texts = texts.filter(pa.array(keep))
        flat, offs = self.tok.batch_token_lists(texts)
        if not len(flat):
            return _OCCROW_SCHEMA.empty_table()
        lens = np.diff(offs)
        doc_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        pos = np.arange(int(offs[-1]), dtype=np.int64) \
            - np.repeat(offs[:-1], lens)
        de = flat.dictionary_encode()
        codes = np.asarray(de.indices).astype(np.int64)
        uniques = de.dictionary
        p_doc = doc_ids[doc_of]
        p_shard = shard[doc_of]
        order = np.lexsort((pos, p_doc, codes, p_shard))
        skey = (p_shard[order] * (len(uniques) + 1) + codes[order])
        bounds = np.concatenate([[0], np.flatnonzero(np.diff(skey)) + 1,
                                 [len(skey)]])
        heads = bounds[:-1]
        blob, boffs = encode_occ_segments(bounds, p_doc[order], pos[order])
        blob_arr = pa.Array.from_buffers(
            pa.large_binary(), len(heads),
            [None, pa.py_buffer(np.ascontiguousarray(boffs, np.int64)),
             pa.py_buffer(blob)])
        ub = np.fromiter((zlib.crc32(u.encode()) % self.nb
                          for u in uniques.to_pylist()),
                         np.int64, len(uniques))
        oc, od = codes[order], p_doc[order]
        stride = self.nb + 1
        return pa.table({
            "term": uniques.take(pa.array(oc[heads])).cast(pa.large_string()),
            "gkey": pa.array(p_shard[order][heads] * stride
                             + ub[oc[heads]] + 1, pa.int64()),
            "min_doc": pa.array(od[heads], pa.int64()),
            "n": pa.array(np.diff(bounds).astype(np.int32), pa.int32()),
            "blob": blob_arr,
        }, schema=_OCCROW_SCHEMA)


def _make_merge_pos_group(index_dir: str, cfg_term_buckets: int):
    stride = cfg_term_buckets + 1

    def merge_group(group: pa.Table) -> pa.Table:
        import pandas as pd
        gkey = int(group.column("gkey")[0].as_py())
        shard, bucket = gkey // stride, gkey % stride - 1
        bcol = group.column("blob").combine_chunks()
        boffs = np.frombuffer(bcol.buffers()[1], np.int64)[
            bcol.offset:bcol.offset + len(bcol) + 1]
        bdata = np.frombuffer(bcol.buffers()[2] or b"", np.uint8)
        ns = group.column("n").to_numpy().astype(np.int64)
        terms = np.asarray(group.column("term").to_pylist(), dtype=object)
        seg_codes, uniques = pd.factorize(terms, sort=True)
        row_order = np.lexsort((group.column("min_doc").to_numpy(),
                                seg_codes))
        docs, poss = decode_occ_rows(bdata, boffs, ns, row_order)
        codes = np.repeat(seg_codes[row_order], ns[row_order])
        # safety net for overlapping batch doc-ranges: (term, doc, pos)
        # triples are unique, so a global lexsort restores the contract
        d = np.diff(docs)
        same_term = np.diff(codes) == 0
        ok = (d[same_term] > 0) | \
             ((d[same_term] == 0) & (np.diff(poss)[same_term] > 0))
        if len(d) and not ok.all():
            full = np.lexsort((poss, docs, codes))
            codes, docs, poss = codes[full], docs[full], poss[full]
        bounds = np.concatenate([[0], np.flatnonzero(np.diff(codes)) + 1,
                                 [len(codes)]])
        blob, offs = encode_occ_segments(bounds, docs, poss)
        if offs[-1] > np.iinfo(np.int32).max:
            raise OverflowError(
                "positions blob exceeds int32 binary offsets; raise "
                "term_buckets or lower docs_per_shard")
        t = pa.table({
            "term": pa.array(uniques, pa.string()),
            "n": pa.array(np.diff(bounds), pa.int64()),
            "blob": pa.Array.from_buffers(pa.binary(), len(uniques), [
                None,
                pa.py_buffer(np.ascontiguousarray(offs, np.int32)),
                pa.py_buffer(blob)]),
        }, schema=POSITIONS_SCHEMA)
        path = positions_file(index_dir, shard, bucket)
        nbytes = atomic_write_parquet(t, path)
        return pa.Table.from_pylist(
            [{"shard": shard, "bucket": bucket, "n_terms": len(uniques),
              "nbytes": nbytes, "file": os.path.relpath(path, index_dir)}])

    return merge_group


def _require_positions(index_dir: str) -> None:
    """Positional queries against a missing/stale artifact would silently
    return empty results — raise instead (the artifact goes stale when
    ``append_index`` changes the docID assignment)."""
    if not has_positions(index_dir):
        raise ValueError(
            f"no current positional artifact in {index_dir!r} — run "
            f"build_positions(transcripts, index_dir) first (an append "
            f"invalidates a previously built one)")


def has_positions(index_dir: str) -> bool:
    """True iff a complete positions artifact matching the index's config
    fingerprint AND current docID assignment exists (manifest check +
    files present; an ``append_index`` changes the offsets digest, so a
    stale positions artifact is detected and rebuilt)."""
    p = os.path.join(index_dir, "positions_manifest.json")
    if not os.path.exists(p):
        return False
    try:
        with open(p) as f:
            m = json.load(f)
    except (json.JSONDecodeError, OSError):
        return False
    with open(os.path.join(index_dir, "stats.json")) as f:
        fp = json.load(f).get("config_fingerprint")
    if m.get("config_fingerprint") != fp:
        return False
    from bge_m3_onnx_ray.index.build import _offsets_digest
    if m.get("offsets_digest") != _offsets_digest(ConvOffsets.load(index_dir)):
        return False
    return all(os.path.exists(os.path.join(index_dir, rel))
               for rel in m.get("files", []))


def build_positions(transcripts, index_dir: str) -> dict:
    """Build the positional artifact for an already-built index (reuses
    its ConvOffsets, tokenizer spec and shard/bucket geometry so
    positions co-partition with postings). Idempotent: a complete
    matching artifact is a no-op; a stale/partial one is rebuilt
    (atomic per-group writes make that safe)."""
    meta = IndexMeta(index_dir)
    if has_positions(index_dir):
        return {"skipped": True}
    offsets = ConvOffsets.load(index_dir)
    if isinstance(transcripts, str):
        ds = rd.read_parquet(transcripts,
                             columns=["conv_id", "turn_idx", "text"])
    else:
        ds = transcripts.select_columns(["conv_id", "turn_idx", "text"])
    import ray
    offsets_ref = ray.put(offsets)
    cfg = IndexConfig()  # defaults only for batch sizing below
    kwargs = {"offsets_ref": offsets_ref,
              "docs_per_shard": meta.docs_per_shard,
              "term_buckets": meta.term_buckets,
              "tokenizer_spec": meta.stats.get("tokenizer_spec",
                                               "deterministic")}
    from bge_m3_onnx_ray.index.build import _BROADCAST_CACHE

    def occ_fn(batch: pa.Table, _k=kwargs) -> pa.Table:
        worker = _BROADCAST_CACHE.get("__occ_stage__")
        if worker is None or worker._kargs != _k:  # type: ignore[attr-defined]
            worker = TokenizeOccurrences(**_k)
            worker._kargs = _k  # type: ignore[attr-defined]
            _BROADCAST_CACHE["__occ_stage__"] = worker
        return worker(batch)

    occ = ds.map_batches(occ_fn, batch_format="pyarrow",
                         zero_copy_batch=True,
                         batch_size=cfg.tokenize_batch_size, num_cpus=1)
    from ray.data import DataContext
    from ray.data.context import ShuffleStrategy
    ctx = DataContext.get_current()
    prev = ctx.shuffle_strategy
    try:
        ctx.shuffle_strategy = ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED
        entries = occ.groupby("gkey").map_groups(
            _make_merge_pos_group(index_dir, meta.term_buckets),
            batch_format="pyarrow").take_all()
    finally:
        ctx.shuffle_strategy = prev
    from bge_m3_onnx_ray.index.build import _offsets_digest
    atomic_write_json(
        {"config_fingerprint": meta.stats.get("config_fingerprint"),
         "offsets_digest": _offsets_digest(offsets),
         "files": sorted(e["file"] for e in entries),
         "n_terms": int(sum(e["n_terms"] for e in entries)),
         "nbytes": int(sum(e["nbytes"] for e in entries))},
        os.path.join(index_dir, "positions_manifest.json"))
    return {"groups": len(entries),
            "nbytes": int(sum(e["nbytes"] for e in entries))}


def append_positions(new_transcripts, index_dir: str) -> dict:
    """Delta-append for the positional artifact: run the occurrence
    build over ONLY the appended transcripts (their docIDs resolve to
    the fresh shards ``append_index`` created, so every written
    per-group file is new — existing files are never rewritten) and
    re-point the manifest at the post-append offsets digest. Call right
    after ``append_index`` with the same delta; phrase/NEAR results are
    then identical to positions built from scratch over the union
    (gated by the driver ledger)."""
    meta = IndexMeta(index_dir)
    man_path = os.path.join(index_dir, "positions_manifest.json")
    if not os.path.exists(man_path):
        raise FileNotFoundError(
            "no positions artifact to append to — run build_positions "
            "over the base corpus first")
    with open(man_path) as f:
        man = json.load(f)
    if man.get("config_fingerprint") != meta.stats.get("config_fingerprint"):
        raise ValueError("positions artifact belongs to a different index "
                         "config; rebuild with build_positions")
    offsets = ConvOffsets.load(index_dir)   # post-append merged offsets
    if isinstance(new_transcripts, str):
        ds = rd.read_parquet(new_transcripts,
                             columns=["conv_id", "turn_idx", "text"])
    else:
        ds = new_transcripts.select_columns(["conv_id", "turn_idx", "text"])
    import ray
    offsets_ref = ray.put(offsets)
    cfg = IndexConfig()
    kwargs = {"offsets_ref": offsets_ref,
              "docs_per_shard": meta.docs_per_shard,
              "term_buckets": meta.term_buckets,
              "tokenizer_spec": meta.stats.get("tokenizer_spec",
                                               "deterministic")}
    from bge_m3_onnx_ray.index.build import _BROADCAST_CACHE

    def occ_fn(batch: pa.Table, _k=kwargs) -> pa.Table:
        worker = _BROADCAST_CACHE.get("__occ_stage__")
        if worker is None or worker._kargs != _k:  # type: ignore[attr-defined]
            worker = TokenizeOccurrences(**_k)
            worker._kargs = _k  # type: ignore[attr-defined]
            _BROADCAST_CACHE["__occ_stage__"] = worker
        return worker(batch)

    occ = ds.map_batches(occ_fn, batch_format="pyarrow",
                         zero_copy_batch=True,
                         batch_size=cfg.tokenize_batch_size, num_cpus=1)
    from ray.data import DataContext
    from ray.data.context import ShuffleStrategy
    ctx = DataContext.get_current()
    prev = ctx.shuffle_strategy
    try:
        ctx.shuffle_strategy = ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED
        entries = occ.groupby("gkey").map_groups(
            _make_merge_pos_group(index_dir, meta.term_buckets),
            batch_format="pyarrow").take_all()
    finally:
        ctx.shuffle_strategy = prev
    from bge_m3_onnx_ray.index.build import _offsets_digest
    files = sorted(set(man["files"]) | {e["file"] for e in entries})
    atomic_write_json(
        {"config_fingerprint": man["config_fingerprint"],
         "offsets_digest": _offsets_digest(offsets),
         "files": files,
         "n_terms": int(man["n_terms"]
                        + sum(e["n_terms"] for e in entries)),
         "nbytes": int(man["nbytes"] + sum(e["nbytes"] for e in entries))},
        man_path)
    return {"groups": len(entries),
            "nbytes": int(sum(e["nbytes"] for e in entries))}


# ------------------------------------------------------------ phrase query

_MATCH_SCHEMA = pa.schema([
    ("query_id", pa.int64()), ("doc_id", pa.int64()),
    ("tf", pa.int64()), ("dl", pa.int64()),
])


class PhraseScorer:
    """Phrase-match actor: holds decoded occurrence lists per shard in a
    bounded LRU (state loaded once per actor, the reference's
    sessions-in-__init__ pattern). Input rows (query_id, terms, shard);
    output phrase-match rows (query_id, doc_id, tf, dl) — tf = number of
    phrase occurrences (consecutive-position matches) in the doc."""

    def __init__(self, index_dir: str, cache_size: int = 64):
        self.meta = IndexMeta(index_dir)
        from collections import OrderedDict
        self.cache: "OrderedDict[int, dict]" = OrderedDict()
        self.dl_cache: "OrderedDict[int, tuple]" = OrderedDict()
        self.cache_size = cache_size

    def _shard_occurrences(self, shard: int, terms: list[str]) -> dict:
        from bge_m3_onnx_ray.index.build import term_bucket
        got = self.cache.get(shard)
        if got is None:
            got = {}
            self.cache[shard] = got
            while len(self.cache) > self.cache_size:
                self.cache.popitem(last=False)
        else:
            self.cache.move_to_end(shard)
        missing = sorted({t for t in terms if t not in got})
        if missing:
            by_bucket: dict[int, list[str]] = {}
            buckets = term_bucket(np.asarray(missing, object),
                                  self.meta.term_buckets)
            for t, b in zip(missing, buckets):
                by_bucket.setdefault(int(b), []).append(t)
            for b, ts in by_bucket.items():
                path = positions_file(self.meta.index_dir, shard, b)
                try:
                    tab = pq.read_table(path, filters=[("term", "in", ts)])
                except (FileNotFoundError, OSError):
                    tab = None
                found: set[str] = set()
                if tab is not None and tab.num_rows:
                    bcol = tab.column("blob").combine_chunks()
                    boffs = np.frombuffer(bcol.buffers()[1], np.int32)[
                        bcol.offset:bcol.offset + len(bcol) + 1] \
                        .astype(np.int64)
                    bdata = np.frombuffer(bcol.buffers()[2] or b"", np.uint8)
                    ns = tab.column("n").to_numpy().astype(np.int64)
                    docs, poss = decode_occ_rows(
                        bdata, boffs, ns, np.arange(len(ns), dtype=np.int64))
                    starts = np.zeros(len(ns) + 1, np.int64)
                    np.cumsum(ns, out=starts[1:])
                    for i, t in enumerate(tab.column("term").to_pylist()):
                        got[t] = (docs[starts[i]:starts[i + 1]],
                                  poss[starts[i]:starts[i + 1]])
                        found.add(t)
                for t in ts:
                    if t not in found:
                        got[t] = None
        return got

    def _shard_dls(self, shard: int) -> tuple[np.ndarray, np.ndarray]:
        got = self.dl_cache.get(shard)
        if got is None:
            t = pq.read_table(doc_lens_file(self.meta.index_dir, shard))
            got = (t.column("doc_id").to_numpy().astype(np.int64),
                   t.column("dl").to_numpy().astype(np.int64))
            self.dl_cache[shard] = got
            while len(self.dl_cache) > self.cache_size:
                self.dl_cache.popitem(last=False)
        else:
            self.dl_cache.move_to_end(shard)
        return got

    @staticmethod
    def _phrase_hits(occ: dict, terms: list[str]
                     ) -> tuple[np.ndarray, np.ndarray]:
        """(docs, phrase_tf) for one phrase in one shard. ``occ`` maps
        term → (docs, positions) sorted by (doc, pos). Packs (doc, pos)
        into one int64 key and chains sorted-set intersections — the
        in-doc adjacency check never loops in Python."""
        per_term = [occ.get(t) for t in terms]
        if any(p is None for p in per_term):
            return np.empty(0, np.int64), np.empty(0, np.int64)
        m = len(terms)
        max_pos = max(int(p[1].max()) for p in per_term) + m + 2
        max_doc = max(int(p[0].max()) for p in per_term) + 1
        P = np.int64(1) << max(21, int(max_pos).bit_length())
        if int(max_doc) * int(P) >= (1 << 62):
            raise OverflowError(
                "phrase key packing overflow: document too long for the "
                "docID range (raise docs_per_shard granularity)")
        s = per_term[0][0] * P + per_term[0][1]
        for j in range(1, m):
            kj = per_term[j][0] * P + per_term[j][1] - j
            s = np.intersect1d(s, kj, assume_unique=True)
            if not len(s):
                return np.empty(0, np.int64), np.empty(0, np.int64)
        docs, tfs = np.unique(s // P, return_counts=True)
        return docs, tfs.astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_q, out_d, out_t, out_l = [], [], [], []
        qids = batch.column("query_id").to_pylist()
        termss = batch.column("terms").to_pylist()
        shards = batch.column("shard").to_pylist()
        hit_memo: dict[tuple[int, int], tuple] = {}
        for qid, terms, shard in zip(qids, termss, shards):
            shard = int(shard)
            got = hit_memo.get((shard, qid))
            if got is None:
                occ = self._shard_occurrences(shard, terms)
                got = self._phrase_hits(occ, terms)
                hit_memo[(shard, qid)] = got
            docs, tfs = got
            if not len(docs):
                continue
            dl_docs, dls = self._shard_dls(shard)
            dl = dls[np.searchsorted(dl_docs, docs)]
            out_q.extend([qid] * len(docs))
            out_d.extend(docs.tolist())
            out_t.extend(tfs.tolist())
            out_l.extend(dl.tolist())
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "doc_id": pa.array(out_d, pa.int64()),
                         "tf": pa.array(out_t, pa.int64()),
                         "dl": pa.array(out_l, pa.int64())},
                        schema=_MATCH_SCHEMA)


class PhrasePrefixScorer(PhraseScorer):
    """match_phrase_prefix actor: input rows (query_id, terms, alts,
    shard) — ``terms`` are the exact leading tokens, ``alts`` the
    dictionary expansion of the trailing PREFIX. A position holds
    exactly one token, so the union of the alternatives' (doc, pos)
    sets is still unique and drops straight into the same packed
    sorted-set intersection as the exact phrase kernel."""

    @staticmethod
    def _prefix_hits(occ: dict, terms: list[str], alts: list[str]
                     ) -> tuple[np.ndarray, np.ndarray]:
        empty = (np.empty(0, np.int64), np.empty(0, np.int64))
        per_term = [occ.get(t) for t in terms]
        if any(p is None for p in per_term):
            return empty
        alt_occ = [o for a in alts if (o := occ.get(a)) is not None]
        if not alt_occ:
            return empty
        ld = np.concatenate([o[0] for o in alt_occ])
        lp = np.concatenate([o[1] for o in alt_occ])
        if not terms:
            docs, tfs = np.unique(ld, return_counts=True)
            return docs, tfs.astype(np.int64)
        m = len(terms) + 1
        max_pos = max([int(p[1].max()) for p in per_term]
                      + [int(lp.max())]) + m + 2
        max_doc = max([int(p[0].max()) for p in per_term]
                      + [int(ld.max())]) + 1
        P = np.int64(1) << max(21, int(max_pos).bit_length())
        if int(max_doc) * int(P) >= (1 << 62):
            raise OverflowError(
                "phrase key packing overflow: document too long for the "
                "docID range (raise docs_per_shard granularity)")
        s = per_term[0][0] * P + per_term[0][1]
        for j in range(1, len(terms)):
            kj = per_term[j][0] * P + per_term[j][1] - j
            s = np.intersect1d(s, kj, assume_unique=True)
            if not len(s):
                return empty
        klast = ld * P + lp - len(terms)
        s = np.intersect1d(s, klast, assume_unique=True)
        if not len(s):
            return empty
        docs, tfs = np.unique(s // P, return_counts=True)
        return docs, tfs.astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_q, out_d, out_t, out_l = [], [], [], []
        qids = batch.column("query_id").to_pylist()
        termss = batch.column("terms").to_pylist()
        altss = batch.column("alts").to_pylist()
        shards = batch.column("shard").to_pylist()
        hit_memo: dict[tuple[int, int], tuple] = {}
        for qid, terms, alts, shard in zip(qids, termss, altss, shards):
            shard = int(shard)
            got = hit_memo.get((shard, qid))
            if got is None:
                occ = self._shard_occurrences(
                    shard, sorted(set(terms) | set(alts)))
                got = self._prefix_hits(occ, list(terms), list(alts))
                hit_memo[(shard, qid)] = got
            docs, tfs = got
            if not len(docs):
                continue
            dl_docs, dls = self._shard_dls(shard)
            dl = dls[np.searchsorted(dl_docs, docs)]
            out_q.extend([qid] * len(docs))
            out_d.extend(docs.tolist())
            out_t.extend(tfs.tolist())
            out_l.extend(dl.tolist())
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "doc_id": pa.array(out_d, pa.int64()),
                         "tf": pa.array(out_t, pa.int64()),
                         "dl": pa.array(out_l, pa.int64())},
                        schema=_MATCH_SCHEMA)


def phrase_prefix_search(index_dir: str, queries, k: int = 10,
                         max_expansions: int = 10_000,
                         batch_size: int = 64) -> rd.Dataset:
    """match_phrase_prefix (the Elasticsearch query / Lucene
    MultiPhraseQuery shape): the query's last token is a PREFIX —
    "slow qu" matches "slow query", "slow quack", … . The prefix
    expands once against the bucketed dictionary (a range-pruned scan,
    never a full read; > ``max_expansions`` raises rather than silently
    truncating, diverging from ES's quiet cap on purpose), the
    expansion rides the fan-out as per-query alternatives for the last
    position slot, and match df/score/top-k reuse the exact-phrase
    tail, so the SQL mirror is the phrase oracle with its last join
    condition swapped for LIKE 'prefix%'."""
    _require_positions(index_dir)
    meta = IndexMeta(index_dir)
    offsets = ConvOffsets.load(index_dir)
    from bge_m3_onnx_ray.tokenizer import make_tokenizer
    tok = make_tokenizer(meta.stats.get("tokenizer_spec", "deterministic"))
    rows = []
    for qid, text in queries:
        ts = tok.tokenize(str(text))
        if not ts:
            continue
        alts = meta.expand_prefix(ts[-1], limit=max_expansions)
        if not alts:
            continue                       # prefix matches no term
        rows.append({"query_id": int(qid), "terms": ts[:-1],
                     "alts": alts})
    pairs = [dict(r, shard=s) for s in meta.shards for r in rows]
    if not pairs:
        return rd.from_arrow(PHRASE_RESULT_SCHEMA.empty_table())
    pairs.sort(key=lambda r: r["shard"])
    from bge_m3_onnx_ray.stages._pool import task_stage
    fanout = rd.from_arrow(pa.table({
        "query_id": pa.array([p["query_id"] for p in pairs], pa.int64()),
        "terms": pa.array([p["terms"] for p in pairs],
                          pa.list_(pa.string())),
        "alts": pa.array([p["alts"] for p in pairs],
                         pa.list_(pa.string())),
        "shard": pa.array([p["shard"] for p in pairs], pa.int64())}))
    matches = fanout.map_batches(
        task_stage(PhrasePrefixScorer, index_dir=index_dir),
        batch_format="pyarrow", batch_size=batch_size,
        num_cpus=1).materialize()
    return _score_and_rank_matches(matches, meta, offsets, k)


class NearScorer(PhraseScorer):
    """Proximity-match actor: input rows (query_id, term_a, term_b,
    slop, shard); output (query_id, doc_id, tf, dl) where tf = number of
    ordered position PAIRS (i of term_a, j of term_b) with i != j and
    |i - j| <= slop — the contract a SQL windowed self-join mirrors
    exactly."""

    @staticmethod
    def _near_hits(occ: dict, ta: str, tb: str, slop: int,
                   in_order: bool = False
                   ) -> tuple[np.ndarray, np.ndarray]:
        a = occ.get(ta)
        bq = occ.get(tb)
        if a is None or bq is None:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        max_pos = max(int(a[1].max()), int(bq[1].max())) + slop + 2
        max_doc = max(int(a[0].max()), int(bq[0].max())) + 1
        P = np.int64(1) << max(21, int(max_pos).bit_length())
        if int(max_doc) * int(P) >= (1 << 62):
            raise OverflowError("near key packing overflow")
        kb = bq[0] * P + bq[1]
        base = a[0] * P
        if in_order:
            # SpanNear(inOrder): term_a strictly precedes term_b,
            # 0 < j - i <= slop — no self-pair by construction
            lo = base + a[1] + 1
            hi = base + a[1] + slop
        else:
            lo = base + np.maximum(a[1] - slop, 0)
            hi = base + a[1] + slop
        cnt = (np.searchsorted(kb, hi, side="right")
               - np.searchsorted(kb, lo, side="left")).astype(np.int64)
        if ta == tb and not in_order:
            cnt -= 1  # remove the self-pair i == j
        udocs, inv = np.unique(a[0], return_inverse=True)
        tfs = np.bincount(inv, weights=cnt).astype(np.int64)
        keep = tfs > 0
        return udocs[keep], tfs[keep]

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_q, out_d, out_t, out_l = [], [], [], []
        qids = batch.column("query_id").to_pylist()
        tas = batch.column("term_a").to_pylist()
        tbs = batch.column("term_b").to_pylist()
        slops = batch.column("slop").to_pylist()
        shards = batch.column("shard").to_pylist()
        orders = (batch.column("in_order").to_pylist()
                  if "in_order" in batch.column_names
                  else [0] * batch.num_rows)
        for qid, ta, tb, slop, shard, ordr in zip(qids, tas, tbs, slops,
                                                  shards, orders):
            shard = int(shard)
            occ = self._shard_occurrences(shard, [ta, tb])
            docs, tfs = self._near_hits(occ, ta, tb, int(slop),
                                        in_order=bool(ordr))
            if not len(docs):
                continue
            dl_docs, dls = self._shard_dls(shard)
            dl = dls[np.searchsorted(dl_docs, docs)]
            out_q.extend([qid] * len(docs))
            out_d.extend(docs.tolist())
            out_t.extend(tfs.tolist())
            out_l.extend(dl.tolist())
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "doc_id": pa.array(out_d, pa.int64()),
                         "tf": pa.array(out_t, pa.int64()),
                         "dl": pa.array(out_l, pa.int64())},
                        schema=_MATCH_SCHEMA)


class SpanNearScorer(PhraseScorer):
    """N-term ordered span actor (Lucene SpanNearQuery, inOrder=true,
    generalized beyond the 2-term :class:`NearScorer`): input rows
    (query_id, terms, slop, shard); a MATCH is a position chain
    p1 < p2 < ... < pn with every gap 0 < p_{j+1} - p_j <= slop, and
    tf counts the chains — exactly what a chained windowed self-join
    counts, so the SQL mirror is exact.

    Kernel: chain-counting dynamic programming over packed
    (doc << log2(P)) + pos keys — per term one searchsorted window
    (prefix-sum of chain counts ending in (q-slop .. q-1)), O(total
    occurrences · n_terms), no per-chain enumeration."""

    @staticmethod
    def _span_hits(occ: dict, terms: list[str], slop: int
                   ) -> tuple[np.ndarray, np.ndarray]:
        empty = (np.empty(0, np.int64), np.empty(0, np.int64))
        per_term = [occ.get(t) for t in terms]
        if not per_term or any(p is None for p in per_term):
            return empty
        max_pos = max(int(p[1].max()) for p in per_term) + slop + 2
        max_doc = max(int(p[0].max()) for p in per_term) + 1
        P = np.int64(1) << max(21, int(max_pos).bit_length())
        if int(max_doc) * int(P) >= (1 << 62):
            raise OverflowError("span key packing overflow")
        kprev = per_term[0][0] * P + per_term[0][1]
        w = np.ones(len(kprev), np.int64)
        for j in range(1, len(terms)):
            kj = per_term[j][0] * P + per_term[j][1]
            cum = np.concatenate([[0], np.cumsum(w)])
            # chains ending strictly before kj within the slop window;
            # P > max_pos + slop keeps the window inside the document
            lo = np.searchsorted(kprev, kj - slop, side="left")
            hi = np.searchsorted(kprev, kj, side="left")
            wj = cum[hi] - cum[lo]
            keep = wj > 0
            kprev, w = kj[keep], wj[keep]
            if not len(kprev):
                return empty
        docs, inv = np.unique(kprev // P, return_inverse=True)
        tfs = np.zeros(len(docs), np.int64)
        np.add.at(tfs, inv, w)
        return docs, tfs

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_q, out_d, out_t, out_l = [], [], [], []
        qids = batch.column("query_id").to_pylist()
        termss = batch.column("terms").to_pylist()
        slops = batch.column("slop").to_pylist()
        shards = batch.column("shard").to_pylist()
        for qid, terms, slop, shard in zip(qids, termss, slops, shards):
            shard = int(shard)
            occ = self._shard_occurrences(shard, sorted(set(terms)))
            docs, tfs = self._span_hits(occ, list(terms), int(slop))
            if not len(docs):
                continue
            dl_docs, dls = self._shard_dls(shard)
            dl = dls[np.searchsorted(dl_docs, docs)]
            out_q.extend([qid] * len(docs))
            out_d.extend(docs.tolist())
            out_t.extend(tfs.tolist())
            out_l.extend(dl.tolist())
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "doc_id": pa.array(out_d, pa.int64()),
                         "tf": pa.array(out_t, pa.int64()),
                         "dl": pa.array(out_l, pa.int64())},
                        schema=_MATCH_SCHEMA)


def span_near_search(index_dir: str, queries, k: int = 10,
                     batch_size: int = 64) -> rd.Dataset:
    """N-term ordered proximity top-k: ``queries`` = list[(query_id,
    text, slop)]; the text's tokens must appear IN ORDER with every
    consecutive gap <= ``slop``; tf = number of such position chains,
    scored by BM25 (same match -> df -> score -> merge plan as
    :func:`phrase_search`). slop=1 degenerates to the exact phrase."""
    _require_positions(index_dir)
    meta = IndexMeta(index_dir)
    offsets = ConvOffsets.load(index_dir)
    from bge_m3_onnx_ray.tokenizer import make_tokenizer
    tok = make_tokenizer(meta.stats.get("tokenizer_spec", "deterministic"))
    rows = []
    for qid, text, slop in queries:
        ts = tok.tokenize(str(text))
        if ts:
            rows.append({"query_id": int(qid), "terms": ts,
                         "slop": int(slop)})
    pairs = [dict(r, shard=s) for s in meta.shards for r in rows]
    if not pairs:
        return rd.from_arrow(PHRASE_RESULT_SCHEMA.empty_table())
    pairs.sort(key=lambda r: r["shard"])
    from bge_m3_onnx_ray.stages._pool import task_stage
    fanout = rd.from_arrow(pa.table({
        "query_id": pa.array([p["query_id"] for p in pairs], pa.int64()),
        "terms": pa.array([p["terms"] for p in pairs],
                          pa.list_(pa.string())),
        "slop": pa.array([p["slop"] for p in pairs], pa.int64()),
        "shard": pa.array([p["shard"] for p in pairs], pa.int64())}))
    matches = fanout.map_batches(
        task_stage(SpanNearScorer, index_dir=index_dir),
        batch_format="pyarrow", batch_size=batch_size,
        num_cpus=1).materialize()
    return _score_and_rank_matches(matches, meta, offsets, k)


_QUOTE_RE = None  # compiled lazily (module import stays cheap)


def search_quoted(index_dir: str, queries, cfg=None) -> rd.Dataset:
    """Search-box semantics: ``'"exact phrase" other terms'`` — every
    QUOTED span is a candidate FILTER (the document must contain the
    phrase consecutively; multiple quoted spans all must match), and
    ranking is plain BM25 over ALL terms (quoted words count as ordinary
    terms). Requires the positional artifact for the quoted spans.

    Plan: phrase spans match first (the positional fan-out; the match
    set is phrase-selectivity-bounded), their per-query docID
    intersections broadcast into the BM25 scorers as per-query allow
    sets (``search(..., allow_docs=...)``), composed with any facet
    filter. A phrase that matches nothing empties its query's result."""
    import re

    from bge_m3_onnx_ray.config import QueryConfig
    from bge_m3_onnx_ray.index.search import search
    global _QUOTE_RE
    if _QUOTE_RE is None:
        _QUOTE_RE = re.compile(r'"([^"]*)"')
    cfg = cfg or QueryConfig()
    meta = IndexMeta(index_dir)
    from bge_m3_onnx_ray.tokenizer import make_tokenizer
    tok = make_tokenizer(meta.stats.get("tokenizer_spec", "deterministic"))

    phrase_terms: dict[int, list[str]] = {}   # pid -> phrase tokens
    phrases_of: dict[int, list[int]] = {}     # qid -> [pid, ...]
    rank_queries: list[tuple[int, str]] = []
    pid = 0
    for qid, text in queries:
        qid = int(qid)
        rank_queries.append((qid, str(text).replace('"', ' ')))
        for span in _QUOTE_RE.findall(str(text)):
            ts = tok.tokenize(span)
            if not ts:
                continue  # empty quotes: no filter
            phrase_terms[pid] = ts
            phrases_of.setdefault(qid, []).append(pid)
            pid += 1

    allow: dict[int, np.ndarray] | None = None
    if phrase_terms:
        _require_positions(index_dir)
        from bge_m3_onnx_ray.stages._pool import task_stage
        rows = [{"query_id": p, "terms": ts, "shard": s}
                for s in meta.shards for p, ts in phrase_terms.items()]
        matches = rd.from_items(sorted(rows, key=lambda r: r["shard"])) \
            .map_batches(task_stage(PhraseScorer, index_dir=index_dir),
                         batch_format="pyarrow", num_cpus=1)
        docs_by_pid: dict[int, list[int]] = {}
        for row in matches.take_all():  # phrase-selectivity-bounded
            docs_by_pid.setdefault(int(row["query_id"]), []).append(
                int(row["doc_id"]))
        allow = {}
        for qid, pids in phrases_of.items():
            sets = [np.unique(np.asarray(docs_by_pid.get(p, []), np.int64))
                    for p in pids]
            a = sets[0]
            for s in sets[1:]:
                a = np.intersect1d(a, s, assume_unique=True)
            allow[qid] = a
    return search(index_dir, rank_queries, cfg, allow_docs=allow)


def near_search(index_dir: str, queries, k: int = 10,
                batch_size: int = 64, in_order: bool = False) -> rd.Dataset:
    """Proximity top-k: ``queries`` = list[(query_id, term_a, term_b,
    slop)] — documents where the two terms occur within ``slop`` token
    positions, scored by BM25 over the pair count (same
    match→df→score→merge plan as :func:`phrase_search`).
    ``in_order=True`` is the Lucene SpanNear(inOrder) contract: only
    pairs where term_a strictly PRECEDES term_b (0 < j - i <= slop)
    count."""
    _require_positions(index_dir)
    meta = IndexMeta(index_dir)
    offsets = ConvOffsets.load(index_dir)
    from bge_m3_onnx_ray.tokenizer import make_tokenizer
    tok = make_tokenizer(meta.stats.get("tokenizer_spec", "deterministic"))

    def norm(t: str) -> str:
        toks = tok.tokenize(t)
        return toks[0] if toks else ""

    rows = [{"query_id": int(q), "term_a": norm(a), "term_b": norm(b),
             "slop": int(s), "shard": sh, "in_order": int(in_order)}
            for sh in meta.shards
            for q, a, b, s in queries if norm(a) and norm(b)]
    if not rows:
        return rd.from_arrow(PHRASE_RESULT_SCHEMA.empty_table())
    from bge_m3_onnx_ray.stages._pool import task_stage
    fanout = rd.from_items(sorted(rows, key=lambda r: r["shard"]))
    matches = fanout.map_batches(
        task_stage(NearScorer, index_dir=index_dir),
        batch_format="pyarrow", batch_size=batch_size,
        num_cpus=1).materialize()
    return _score_and_rank_matches(matches, meta, offsets, k)


PHRASE_RESULT_SCHEMA = pa.schema([
    ("query_id", pa.int64()), ("rank", pa.int32()), ("doc_id", pa.int64()),
    ("tf", pa.int64()), ("score", pa.float64()),
    ("conv_id", pa.string()), ("turn_idx", pa.int32()),
])


def phrase_search(index_dir: str, phrases, k: int = 10,
                  batch_size: int = 64) -> rd.Dataset:
    """Top-k phrase search: ``phrases`` = list[(query_id, text)]; each
    text is one exact phrase (token order preserved — duplicates allowed,
    "data data" matches two consecutive 'data'). Returns a Dataset of
    (query_id, rank, doc_id, tf, score, conv_id, turn_idx), ranked by
    BM25 over the phrase frequency with (floor(score*1e6) desc, doc_id)
    tie-break (quantized ranking — the phrase score is a single product,
    so the quantization only collapses cross-engine ulp noise).

    Two-stage global plan: the phrase MATCH set (docs actually containing
    the phrase — sparse by nature) is materialized once; its per-query
    row COUNT aggregate (tiny) is the phrase df, so scoring is a
    broadcast-df ``map_batches`` over the match set and the final top-k
    is the same bucketed per-query merge the BM25 path uses. At 100 TB
    the match set is bounded by phrase selectivity, not corpus size; a
    stop-phrase matching a large corpus fraction would use the postings
    path with positional re-check per block instead (documented
    trade-off)."""
    _require_positions(index_dir)
    meta = IndexMeta(index_dir)
    offsets = ConvOffsets.load(index_dir)
    from bge_m3_onnx_ray.tokenizer import make_tokenizer
    tok = make_tokenizer(meta.stats.get("tokenizer_spec", "deterministic"))
    qterms = {int(q): tok.tokenize(str(t)) for q, t in phrases}
    pairs = [{"query_id": qid, "terms": ts, "shard": s}
             for s in meta.shards
             for qid, ts in qterms.items() if ts]
    if not pairs:
        return rd.from_arrow(PHRASE_RESULT_SCHEMA.empty_table())
    from bge_m3_onnx_ray.stages._pool import task_stage
    fanout = rd.from_items(sorted(pairs, key=lambda r: r["shard"]))
    # warm task pool (stages/_pool.py): the scorer's state is a small
    # per-shard read cache, not a model — actor-pool startup (~2.5 s per
    # call) would dominate interactive phrase latency
    matches = fanout.map_batches(
        task_stage(PhraseScorer, index_dir=index_dir),
        batch_format="pyarrow", batch_size=batch_size,
        num_cpus=1).materialize()
    return _score_and_rank_matches(matches, meta, offsets, k)


def _rank_match_table(t: pa.Table, meta: IndexMeta, offsets: ConvOffsets,
                      k: int) -> pa.Table:
    """Vectorized df/score/top-k over one in-memory match table — the
    same arithmetic and (floor(score*1e6) desc, doc_id) tie-break as the
    distributed tail (used by its small-match fast path)."""
    qs = t.column("query_id").to_numpy()
    docs = t.column("doc_id").to_numpy()
    tfs = t.column("tf").to_numpy()
    dls = t.column("dl").to_numpy()
    uq, inv, cnt = np.unique(qs, return_inverse=True, return_counts=True)
    idfs = np.array([idf(int(c), meta.n_docs) for c in cnt], np.float64)
    scores = bm25_term_score(tfs.astype(np.float64), dls.astype(np.float64),
                             1.0, meta.avgdl, meta.k1, meta.b) * idfs[inv]
    q6 = np.floor(scores * 1e6).astype(np.int64)
    order = np.lexsort((docs, -q6, qs))
    qs, docs, tfs, scores = (a[order] for a in (qs, docs, tfs, scores))
    brk = np.empty(len(qs), bool)
    brk[0] = True
    brk[1:] = np.diff(qs) != 0
    first = np.flatnonzero(brk)
    rank = np.arange(len(qs)) - np.repeat(
        first, np.diff(np.concatenate([first, [len(qs)]])))
    keep = rank < k
    qs, docs, tfs, scores, rank = (a[keep] for a in
                                   (qs, docs, tfs, scores, rank))
    conv, turn = offsets.doc_to_conv(docs)
    return pa.table({
        "query_id": pa.array(qs, pa.int64()),
        "rank": pa.array((rank + 1).astype(np.int32), pa.int32()),
        "doc_id": pa.array(docs, pa.int64()),
        "tf": pa.array(tfs, pa.int64()),
        "score": pa.array(scores, pa.float64()),
        "conv_id": pa.array(conv, pa.string()),
        "turn_idx": pa.array(turn, pa.int32()),
    }, schema=PHRASE_RESULT_SCHEMA)


def _score_and_rank_matches(matches: rd.Dataset, meta: IndexMeta,
                            offsets: ConvOffsets, k: int,
                            small_limit: int = 200_000) -> rd.Dataset:
    """Shared tail of the positional query paths (phrase / NEAR): the
    per-query row COUNT of the materialized match set is the df, scoring
    is a broadcast-df ``map_batches``, and the final top-k is the same
    bucketed per-query merge the BM25 path uses.

    Fast path: a match set under ``small_limit`` rows (the interactive
    regime — the set is bounded by phrase selectivity, same size class
    as a merge output) finishes df/score/rank in one vectorized driver
    pass instead of paying two more Dataset execution rounds."""
    n_match = matches.count()  # metadata-only on a materialized dataset
    if not n_match:
        return rd.from_arrow(PHRASE_RESULT_SCHEMA.empty_table())
    if n_match <= small_limit:
        t = pa.concat_tables(matches.iter_batches(batch_size=None,
                                                  batch_format="pyarrow"))
        return rd.from_arrow(_rank_match_table(t, meta, offsets, k))
    dfs: dict[int, int] = {}
    for row in matches.groupby("query_id").count().take_all():
        dfs[int(row["query_id"])] = int(row["count()"])
    n, avgdl, k1, b = meta.n_docs, meta.avgdl, meta.k1, meta.b
    idfs = {q: idf(d, n) for q, d in dfs.items()}

    def score_fn(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return t.append_column("score", pa.array([], pa.float64()))
        qs = t.column("query_id").to_numpy()
        w = np.array([idfs[int(q)] for q in qs], np.float64)
        tf = t.column("tf").to_numpy().astype(np.float64)
        dl = t.column("dl").to_numpy().astype(np.float64)
        score = bm25_term_score(tf, dl, 1.0, avgdl, k1, b) * w
        return t.append_column("score", pa.array(score, pa.float64()))

    scored = matches.map_batches(score_fn, batch_format="pyarrow")
    n_buckets = 256

    def add_bucket(t: pa.Table) -> pa.Table:
        q = t.column("query_id").to_numpy().astype(np.uint64)
        bkt = (q * np.uint64(2654435761)) % np.uint64(n_buckets)
        return t.append_column("_qb", pa.array(bkt.astype(np.int64)))

    def multi_merge(group: pa.Table) -> pa.Table:
        qs = group.column("query_id").to_numpy()
        docs = group.column("doc_id").to_numpy()
        tfs = group.column("tf").to_numpy()
        scores = group.column("score").to_numpy()
        q6 = np.floor(scores * 1e6).astype(np.int64)
        order = np.lexsort((docs, -q6, qs))
        qs, docs, tfs, scores = (a[order] for a in (qs, docs, tfs, scores))
        brk = np.empty(len(qs), bool)
        brk[0] = True
        brk[1:] = np.diff(qs) != 0
        first = np.flatnonzero(brk)
        rank = np.arange(len(qs)) - np.repeat(
            first, np.diff(np.concatenate([first, [len(qs)]])))
        keep = rank < k
        qs, docs, tfs, scores, rank = (a[keep] for a in
                                       (qs, docs, tfs, scores, rank))
        conv, turn = offsets.doc_to_conv(docs)
        return pa.table({
            "query_id": pa.array(qs, pa.int64()),
            "rank": pa.array((rank + 1).astype(np.int32), pa.int32()),
            "doc_id": pa.array(docs, pa.int64()),
            "tf": pa.array(tfs, pa.int64()),
            "score": pa.array(scores, pa.float64()),
            "conv_id": pa.array(conv, pa.string()),
            "turn_idx": pa.array(turn, pa.int32()),
        }, schema=PHRASE_RESULT_SCHEMA)

    return scored.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("_qb").map_groups(multi_merge, batch_format="pyarrow")
