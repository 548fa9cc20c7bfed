"""Distributed inverted-index build — the Ray-Data-native re-expression
of the reference's tokenize→extract pipeline
(``samples/python/bge_m3_embedder.py:100-155``) at corpus scale.

Pipeline (SURVEY.md §3.2):

    read_parquet(transcripts, columns=[conv_id, turn_idx, text])
      → [pass A] partial per-batch conv aggregation → driver prefix-sum
        → ConvOffsets (stable docIDs)
      → [pass B] map_batches(TokenizePostings, pyarrow, zero_copy; warm
        task pool by default): SPIMI stage emitting varint-compressed
        SEGMENT rows (term, gkey, min_doc, n, blob) — one row per
        (term, shard) per batch
      → groupby(gkey).map_groups(decode+merge+encode+write): THE one wide
        shuffle; gkey = shard * (B+1) + bucket, i.e. postings are
        co-partitioned by (docID-range shard, term-hash bucket)
      → per-group atomic parquet + per-group manifest entry (resume unit)
      → [pass C] per-bucket dictionary merge (no shuffle: partial df/cf
        files are already laid out by bucket)

Skew handling: a hot term (stopword-level df) never forms one giant
group — its postings are split across docID shards by construction
(deterministic salting by document range, north-rule "salted
repartitioning"); within a shard a bucket holds at most
``docs_per_shard * avg_dl / term_buckets`` postings. Long conversations
don't skew either: the unit of work is a TURN (bounded text), not a
conversation.

Scale notes (100 TB): pass A ships one small partial row per
(conv x batch); at 10^12 turns the driver-side offsets dict would be
replaced by a range-partitioned offsets table + broadcast per-range — the
ConvOffsets artifact is already that table. Pass B is embarrassingly
parallel; the groupby in the middle is the only all-to-all exchange and
its key (gkey) is uniform by construction.
"""

from __future__ import annotations

import glob
import json
import os
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from bge_m3_onnx_ray.config import IndexConfig
from bge_m3_onnx_ray.index.artifacts import (
    ConvOffsets,
    POSTINGS_SCHEMA,
    atomic_write_json,
    atomic_write_parquet,
    dict_partial_file,
    doc_lens_file,
    postings_file,
)
from bge_m3_onnx_ray.index.codec import encode_postings  # noqa: F401  (kept: public single-term API, tests)
from bge_m3_onnx_ray.tokenizer import DeterministicTokenizer

# SPIMI segment rows: ONE row per (term, shard) per input batch, the
# segment's postings varint-compressed into a binary blob (gaps/tfs/dls,
# codec.encode_segments). Two levels of shrinkage before the merge
# shuffle: ~20x fewer rows than per-token (partial aggregation) and ~4x
# fewer bytes than raw int64/int32 lists (SPIMI-run compression).
_POSTROW_SCHEMA = pa.schema([
    ("term", pa.large_string()),
    ("gkey", pa.int64()),
    ("min_doc", pa.int64()),
    ("n", pa.int32()),
    ("blob", pa.large_binary()),
])


def term_bucket(terms, n_buckets: int) -> np.ndarray:
    """Deterministic term→bucket hash (crc32; NEVER Python ``hash`` — it is
    per-process salted and would scatter a term across buckets)."""
    if isinstance(terms, pa.Array):
        return np.fromiter((zlib.crc32(t.encode()) % n_buckets
                            for t in terms.to_pylist()), np.int64, len(terms))
    codes, uniques = pd.factorize(terms, sort=False)
    ub = np.fromiter((zlib.crc32(u.encode()) % n_buckets for u in uniques),
                     np.int64, len(uniques))
    return ub[codes]


def _conv_partial(batch: pa.Table) -> pa.Table:
    # per-(conv x batch) summaries: count/min/max plus sums of two 31-bit
    # LANES of splitmix64(turn_idx) — all associative, so the driver (or a
    # Ray reduce) can finish them. The mixing-hash sums are the
    # duplicate/omission detectors: unlike raw power sums (sum, sum of
    # squares), which low-order multiset exchanges preserve (e.g.
    # [0,2,2,3,3,4,7,7] matches every moment of {0..7}), a multiset can
    # only fake both 31-bit hash-sum lanes with a ~2^-62 sum collision.
    import pyarrow.compute as pc
    from bge_m3_onnx_ray.hashing import splitmix64
    t64 = pc.cast(batch.column("turn_idx"), pa.int64())
    z = splitmix64(t64.to_numpy(zero_copy_only=False).astype(np.uint64))
    m31 = np.uint64(0x7FFFFFFF)
    b2 = pa.table({
        "conv_id": batch.column("conv_id"), "t": t64,
        "h1": pa.array((z & m31).astype(np.int64), pa.int64()),
        "h2": pa.array(((z >> np.uint64(31)) & m31).astype(np.int64),
                       pa.int64())})
    g = b2.group_by("conv_id").aggregate(
        [("t", "count"), ("t", "min"), ("t", "max"),
         ("h1", "sum"), ("h2", "sum")])
    return g.rename_columns(["conv_id", "n", "min_t", "max_t",
                             "sum_h1", "sum_h2"])


def _finish_conv_offsets(agg: pa.Table, ds: rd.Dataset) -> ConvOffsets:
    """Finish pass A from globally-aggregated per-conv summaries (sorted
    by conv_id): prefix-sum the counts, validate dense 0..n-1 turn ranges
    via count/min/max + two mixing-hash sum lanes, and exactly recheck
    every conversation that fails (non-dense turn numbering gets a rank
    map; duplicate (conv_id, turn_idx) keys raise — they would silently
    corrupt postings otherwise, two rows sharing one docID).

    Soundness: the dense test compares per-conv sums of two 31-bit lanes
    of ``splitmix64(turn_idx)`` against the precomputed prefix sums for
    {0..n-1}. Any multiset other than {0..n-1} fails unless both lane
    sums collide (~2^-62 per conv) — raw moments (sum/sumsq) were
    provably forgeable by duplicate+omission exchanges."""
    import pyarrow.compute as pc
    from bge_m3_onnx_ray.hashing import splitmix64
    conv_arrow = agg.column("conv_id").combine_chunks()
    counts = agg.column("n").to_numpy().astype(np.int64)
    starts = np.zeros(len(counts), np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    mx = agg.column("max_t").to_numpy().astype(np.int64)
    sum_h1 = agg.column("sum_h1").to_numpy().astype(np.int64)
    sum_h2 = agg.column("sum_h2").to_numpy().astype(np.int64)
    # expected lane sums for a dense conv of length n: prefix sums of the
    # hashed ramp 0..max(n)-1 (one vector op; conv length bounds the table)
    m31 = np.uint64(0x7FFFFFFF)
    max_n = int(counts.max()) if len(counts) else 0
    zr = splitmix64(np.arange(max_n, dtype=np.uint64))
    exp1 = np.zeros(max_n + 1, np.int64)
    np.cumsum((zr & m31).astype(np.int64), out=exp1[1:])
    exp2 = np.zeros(max_n + 1, np.int64)
    np.cumsum(((zr >> np.uint64(31)) & m31).astype(np.int64), out=exp2[1:])
    dense = ((agg.column("min_t").to_numpy() == 0) &
             (mx == counts - 1) &
             (sum_h1 == exp1[counts]) &
             (sum_h2 == exp2[counts]))
    nondense: dict[str, dict[int, int]] = {}
    if not dense.all():
        bad = conv_arrow.filter(pa.array(~dense))
        # exact path: collect the offending convs' turn indices (vectorized
        # arrow filter — no per-row Python predicate) and rank them
        sub = ds.select_columns(["conv_id", "turn_idx"]).map_batches(
            lambda t, _bad=bad: t.filter(
                pc.is_in(t.column("conv_id"), value_set=_bad.cast(t.schema.field("conv_id").type))),
            batch_format="pyarrow").to_pandas()
        for c, g in sub.groupby("conv_id"):
            ts = sorted(g["turn_idx"].tolist())
            dups = {t for a, t in zip(ts, ts[1:]) if a == t}
            if dups:
                raise ValueError(
                    f"duplicate (conv_id, turn_idx) keys in input: conv "
                    f"{c!r} has repeated turn_idx {sorted(dups)[:5]} — two "
                    f"rows would share one docID, corrupting postings")
            nondense[c] = {int(t): i for i, t in enumerate(ts)}
    return ConvOffsets(conv_arrow, starts, counts, nondense)


def compute_conv_offsets(ds: rd.Dataset,
                         driver_finish_limit: int = 16_000_000) -> ConvOffsets:
    """Pass A: stable docID assignment. Pre-aggregated per batch (one row
    per conv per batch) and finished on the driver with an arrow groupby —
    cheaper than a Ray sort shuffle for the partials, which are tiny
    relative to the input (a conv rarely spans two 64k-row batches).

    Scale path: when the partial row count exceeds ``driver_finish_limit``
    the finish itself runs as a Ray bucket-reduce, and the driver only
    streams the already-aggregated per-conv rows for the prefix sum (one
    small row per conversation — at 10^12 turns this is the
    conv-count-sized offsets table the artifact stores anyway). The limit
    bounds transient driver memory at ~driver_finish_limit x ~55 B/row
    (~0.9 GB at the 16M default — measured: skipping the conv-key
    shuffle under the limit cut the 64M-turn/4.5M-conv offsets pass from
    ~12 s to ~5 s); beyond it the reduce path takes over."""
    import pyarrow.compute as pc
    # materialize the partials: they are conv-count-sized (tiny next to
    # the input) and BOTH finish paths read them — without this, the
    # overflow path recomputed the whole pass-A map (measured at 64M
    # turns / 4.5M convs: the recompute was most of the offsets wall)
    partial_ds = ds.select_columns(["conv_id", "turn_idx"]).map_batches(
        _conv_partial, batch_format="pyarrow", batch_size=65536) \
        .materialize()
    # common path: STREAM the partials to the driver, folding them into
    # one arrow groupby as they arrive; if the stream exceeds
    # driver_finish_limit rows, abandon it and finish with a Ray
    # bucket-reduce over the SAME materialized partials.
    batches: list[pa.Table] = []
    n_rows = 0
    overflow = False
    for b in partial_ds.iter_batches(batch_size=None, batch_format="pyarrow"):
        batches.append(b)
        n_rows += b.num_rows
        if n_rows > driver_finish_limit:
            overflow = True
            break
    if not overflow:
        if n_rows == 0:
            return ConvOffsets(pa.array([], pa.large_string()),
                               np.empty(0, np.int64), np.empty(0, np.int64))
        tbl = pa.concat_tables(batches)
        agg = tbl.group_by("conv_id").aggregate(
            [("n", "sum"), ("min_t", "min"), ("max_t", "max"),
             ("sum_h1", "sum"), ("sum_h2", "sum")])
        agg = agg.rename_columns(
            ["conv_id", "n", "min_t", "max_t", "sum_h1", "sum_h2"])
        agg = agg.take(pc.sort_indices(agg.column("conv_id")))
    else:
        # Ray range-reduce finish: shuffle the partials by conv_id, merge
        # moments per conv, sort — the driver only streams the per-conv
        # result rows (one per conversation). Exercised by a
        # forced-threshold test.
        from bge_m3_onnx_ray.stages._groups import bucket_reduce
        del batches
        # bucket-reduce, not groupby(conv_id).aggregate: in the regime
        # where this path runs, groups ~= conversation count, and Ray's
        # per-group aggregate overhead would dominate (stages/_groups.py)
        agg_ds = bucket_reduce(partial_ds, ["conv_id"], [
            ("n", "sum", "n"), ("min_t", "min", "min_t"),
            ("max_t", "max", "max_t"), ("sum_h1", "sum", "sum_h1"),
            ("sum_h2", "sum", "sum_h2")])
        agg = pa.concat_tables(agg_ds.iter_batches(batch_size=None,
                                                   batch_format="pyarrow"))
        # ONE driver-side arrow sort of the conv-count-sized reduce
        # output — measured faster than a distributed Dataset.sort on
        # millions of short strings, and the rows must land on the
        # driver anyway for the prefix sum
        agg = agg.select(["conv_id", "n", "min_t", "max_t",
                          "sum_h1", "sum_h2"])
        agg = agg.take(pc.sort_indices(agg.column("conv_id")))
    return _finish_conv_offsets(agg, ds)


# Per-worker-process cache of deserialized broadcast objects: plain-task
# stages re-fetch constructor state per task; worker processes persist
# across tasks, so one ray.get + unpickle per worker, not per task.
_BROADCAST_CACHE: dict[str, object] = {}


def get_broadcast(ref):
    import ray
    if isinstance(ref, ray.ObjectRef):
        key = ref.hex()
        obj = _BROADCAST_CACHE.get(key)
        if obj is None:
            # evict prior ref-keyed objects: long sessions run many builds
            # and each ConvOffsets is corpus-conversation-count sized
            for k in [k for k in _BROADCAST_CACHE
                      if not k.startswith("__")]:
                del _BROADCAST_CACHE[k]
            obj = ray.get(ref)
            _BROADCAST_CACHE[key] = obj
        return obj
    return ref


class TokenizePostings:
    """SPIMI stage. Per batch: docIDs from the broadcast offsets, tokenize
    (vectorized, §tokenizer), per-doc tf counts, shard/bucket keys.

    Runs as a plain TASK pool by default (``IndexConfig.tokenize_compute``):
    our deterministic tokenizer has no heavy state, and a task pool reuses
    warm worker processes with zero pool-startup cost (measured 2.5x
    faster end-to-end than an actor pool at sandbox scale). A tokenizer
    that loads a real vocabulary (the reference's session-load pattern,
    ``samples/python/bge_m3_embedder.py:36-50``) flips the config to
    ``"actors"`` and this same class becomes the actor."""

    def __init__(self, offsets_ref, docs_per_shard: int, term_buckets: int,
                 done_shards: tuple[int, ...] = (),
                 tokenizer_spec: str = "deterministic"):
        # scheduled at num_cpus=1 — keep arrow's intra-op pool from
        # oversubscribing the machine across the pool
        pa.set_cpu_count(1)
        from bge_m3_onnx_ray.tokenizer import make_tokenizer
        self.offsets: ConvOffsets = get_broadcast(offsets_ref)
        self.tok = make_tokenizer(tokenizer_spec)
        self.docs_per_shard = docs_per_shard
        self.nb = term_buckets
        self.done = np.array(sorted(done_shards), np.int64)
        # term→bucket memo: the same (Zipf-head) terms recur every batch,
        # so the per-unique crc32 loop amortizes to near zero
        self._bucket_memo: dict[str, int] = {}

    def _buckets_for(self, uniques) -> np.ndarray:
        memo = self._bucket_memo
        out = np.empty(len(uniques), np.int64)
        for i, u in enumerate(uniques.to_pylist()):
            b = memo.get(u)
            if b is None:
                b = zlib.crc32(u.encode()) % self.nb
                memo[u] = b
            out[i] = b
        if len(memo) > 2_000_000:  # bound worker memory on huge vocabs
            memo.clear()
        return out

    @staticmethod
    def _segment_table(sort_keys, docs, tfs, dls, term_codes, uniques,
                       gkeys_arr):
        """Group consecutive equal sort_keys into varint-blob segment rows.
        ``term_codes``/``gkeys_arr`` are per-ROW; head values are taken —
        term STRINGS materialize only for the ~segment-count head rows
        (never one per posting)."""
        from bge_m3_onnx_ray.index.codec import encode_segments
        bounds = np.concatenate([[0], np.flatnonzero(np.diff(sort_keys)) + 1,
                                 [len(sort_keys)]])
        heads = bounds[:-1]
        blob, offs = encode_segments(bounds, docs, tfs, dls)
        # zero-copy large_binary column: the per-segment offsets ARE the
        # arrow offsets buffer — no per-segment bytes() slicing
        blob_arr = pa.Array.from_buffers(
            pa.large_binary(), len(heads),
            [None, pa.py_buffer(np.ascontiguousarray(offs, np.int64)),
             pa.py_buffer(blob)])
        return pa.table({
            "term": uniques.take(pa.array(term_codes[heads]))
                .cast(pa.large_string()),
            "gkey": pa.array(gkeys_arr[heads], pa.int64()),
            "min_doc": pa.array(docs[heads], pa.int64()),
            "n": pa.array(np.diff(bounds).astype(np.int32), pa.int32()),
            "blob": blob_arr,
        }, schema=_POSTROW_SCHEMA)

    def __call__(self, batch: pa.Table) -> pa.Table:
        conv = batch.column("conv_id")
        turn = batch.column("turn_idx").to_numpy()
        doc_ids = self.offsets.doc_ids_for(conv, turn)
        shard = doc_ids // self.docs_per_shard
        texts = batch.column("text")
        if len(self.done):
            keep = ~np.isin(shard, self.done)
            if not keep.any():
                return _POSTROW_SCHEMA.empty_table()
            doc_ids, shard = doc_ids[keep], shard[keep]
            texts = texts.filter(pa.array(keep))
        doc_idx, codes, uniques, tfs, doc_lens = \
            self.tok.batch_term_counts_coded(texts)
        stride = self.nb + 1
        tables = []

        if len(codes):
            p_doc = doc_ids[doc_idx]
            p_shard = shard[doc_idx]
            p_dl = doc_lens[doc_idx].astype(np.int64)
            # segment key = (shard, term code); docs ascending within
            order = np.lexsort((p_doc, codes, p_shard))
            skey = p_shard[order] * (len(uniques) + 1) + codes[order]
            ub = self._buckets_for(uniques)
            row_gkey = p_shard[order] * stride + ub[codes[order]] + 1
            tables.append(self._segment_table(
                skey, p_doc[order], tfs[order], p_dl[order],
                codes[order], uniques, row_gkey))

        if len(doc_ids):
            # one doc-length segment per shard (term "", bucket -1): becomes
            # the per-shard doc_lens table + corpus stats at merge time
            order = np.lexsort((doc_ids, shard))
            d_doc, d_shard = doc_ids[order], shard[order]
            d_dl = doc_lens[order].astype(np.int64)
            tables.append(self._segment_table(
                d_shard, d_doc, d_dl, d_dl,
                np.zeros(len(d_doc), np.int64),
                pa.array([""], pa.large_string()), d_shard * stride))

        if not tables:
            return _POSTROW_SCHEMA.empty_table()
        return pa.concat_tables(tables)


_META_SCHEMA = pa.schema([
    ("kind", pa.string()), ("shard", pa.int64()), ("bucket", pa.int64()),
    ("n_docs", pa.int64()), ("total_len", pa.int64()),
    ("n_terms", pa.int64()), ("nbytes", pa.int64()), ("file", pa.string()),
    ("dict_file", pa.string()),
])


def _input_fingerprint_path(transcripts) -> str | None:
    """Cheap input-identity digest for a parquet path/dir: sorted
    (relpath, size, num_rows) triples. Re-running build_index into an
    existing index_dir with CHANGED input must invalidate resume — a
    config-only fingerprint silently reuses stale conv_offsets and skips
    'done' shards, never indexing the new rows."""
    import hashlib
    if not isinstance(transcripts, str):
        return None
    files = sorted(glob.glob(os.path.join(transcripts, "*.parquet"))) \
        if os.path.isdir(transcripts) else [transcripts]
    import pyarrow.parquet as pq
    h = hashlib.sha256()
    for p in files:
        nrows = pq.ParquetFile(p).metadata.num_rows
        h.update(f"{os.path.basename(p)}:{os.path.getsize(p)}:{nrows};".encode())
    return h.hexdigest()[:16]


def _offsets_digest(offsets: ConvOffsets) -> str:
    """Content digest of the docID assignment — the input-identity check
    for Dataset inputs (where no file metadata exists): any change to the
    (conv_id, turn count) structure changes this digest."""
    import hashlib
    h = hashlib.sha256()
    h.update(str(offsets.n_docs).encode())
    h.update(np.ascontiguousarray(offsets.starts).tobytes())
    h.update(np.ascontiguousarray(offsets.counts).tobytes())
    # canonical string-array content (rebased offsets + exact data slice):
    # raw buffers differ in padding/offset between construction paths
    # (take() result vs parquet round-trip) for identical logical arrays
    a = offsets._conv_arrow
    if len(a):
        offs = np.frombuffer(a.buffers()[1], np.int64)[
            a.offset:a.offset + len(a) + 1]
        data = np.frombuffer(a.buffers()[2] or b"", np.uint8)
        h.update(np.ascontiguousarray(offs - offs[0]).tobytes())
        h.update(np.ascontiguousarray(data[offs[0]:offs[-1]]).tobytes())
    h.update(json.dumps(offsets.nondense, sort_keys=True).encode())
    return h.hexdigest()[:16]


def _manifest_entry_file(index_dir: str, shard: int, bucket: int) -> str:
    return os.path.join(index_dir, "_manifest", f"shard-{shard:05d}-bucket-{bucket:+03d}.json")


def make_encode_group_fn(index_dir: str, cfg: IndexConfig):
    stride = cfg.term_buckets + 1
    block_size = cfg.block_size

    def encode_group(group: pa.Table) -> pa.Table:
        from bge_m3_onnx_ray.index.codec import decode_segments_many
        gkey = int(group.column("gkey")[0].as_py())
        shard, bucket = gkey // stride, gkey % stride - 1
        # zero-copy segment access: slice the column's data buffer by its
        # offsets instead of materializing one Python bytes per segment
        bcol = group.column("blob").combine_chunks()
        boffs = np.frombuffer(bcol.buffers()[1], np.int64)[
            bcol.offset:bcol.offset + len(bcol) + 1]
        bdata = np.frombuffer(bcol.buffers()[2] or b"", np.uint8)
        ns = group.column("n").to_numpy()

        def gather(row_order):
            """Decode + concatenate segments in the given row order —
            ONE whole-buffer varint decode, not a per-segment loop."""
            return decode_segments_many(bdata, boffs, ns,
                                        np.asarray(row_order, np.int64))

        if bucket == -1:  # doc-length segments → per-shard doc table slice
            row_order = np.argsort(group.column("min_doc").to_numpy(),
                                   kind="stable")
            doc_id, dl, _ = gather(row_order)
            t = pa.table({"doc_id": pa.array(doc_id, pa.int64()),
                          "dl": pa.array(dl.astype(np.int32), pa.int32())})
            path = doc_lens_file(index_dir, shard)
            nbytes = atomic_write_parquet(t, path)
            entry = {"kind": "doc_lens", "shard": shard, "bucket": -1,
                     "n_docs": len(dl), "total_len": int(dl.sum()),
                     "n_terms": 0, "nbytes": nbytes, "file": path,
                     "dict_file": ""}
        else:
            terms = np.asarray(group.column("term").to_pylist(), dtype=object)
            seg_codes, uniques = pd.factorize(terms, sort=True)
            # segments of one term are disjoint doc ranges (input batches
            # are contiguous row slices) → ordering by (term, min_doc)
            # concatenates into a fully doc-sorted posting list
            row_order = np.lexsort((group.column("min_doc").to_numpy(),
                                    seg_codes))
            doc_id, tf, dl = gather(row_order)
            codes = np.repeat(seg_codes[row_order], ns[row_order])
            # safety net for unsorted inputs (batch doc-ranges overlap):
            # re-sort globally by (term, doc) — (term, doc) pairs are unique
            d = np.diff(doc_id)
            if len(d) and not (d[np.diff(codes) == 0] > 0).all():
                full = np.lexsort((doc_id, codes))
                codes, doc_id, tf, dl = codes[full], doc_id[full], tf[full], dl[full]
            bounds = np.concatenate([[0], np.flatnonzero(np.diff(codes)) + 1, [len(codes)]])
            from bge_m3_onnx_ray.index.codec import encode_postings_many
            enc = encode_postings_many(doc_id, tf, dl, bounds, block_size)
            if enc["blob_offsets"][-1] > np.iinfo(np.int32).max:
                raise OverflowError(
                    "group posting blob exceeds int32 binary offsets; "
                    "raise term_buckets or lower docs_per_shard")
            term_arr = pa.array(uniques, pa.string())
            loffs = pa.array(enc["list_offsets"].astype(np.int32))
            t = pa.Table.from_arrays([
                term_arr,
                pa.array(enc["df"], pa.int64()),
                pa.array(enc["cf"], pa.int64()),
                pa.array(enc["n_blocks"], pa.int32()),
                pa.ListArray.from_arrays(
                    loffs, pa.array(enc["last_ids_vals"], pa.int64())),
                pa.ListArray.from_arrays(
                    loffs, pa.array(enc["max_tf_vals"], pa.int32())),
                pa.ListArray.from_arrays(
                    loffs, pa.array(enc["min_dl_vals"], pa.int32())),
                pa.ListArray.from_arrays(
                    pa.array(enc["offs_list_offsets"].astype(np.int32)),
                    pa.array(enc["offs_vals"], pa.int32())),
                pa.Array.from_buffers(pa.binary(), len(uniques), [
                    None,
                    pa.py_buffer(np.ascontiguousarray(
                        enc["blob_offsets"], np.int32)),
                    pa.py_buffer(enc["blob"])]),
            ], schema=POSTINGS_SCHEMA)
            path = postings_file(index_dir, shard, bucket)
            nbytes = atomic_write_parquet(t, path)
            dp = pa.table({"term": term_arr,
                           "df": pa.array(enc["df"], pa.int64()),
                           "cf": pa.array(enc["cf"], pa.int64())})
            dpath = dict_partial_file(index_dir, shard, bucket)
            atomic_write_parquet(dp, dpath)
            # dict_file rides in the manifest entry: _merge_dictionary
            # re-reads the partials on every build, so a vouched-done shard
            # with missing partials must be detected and rebuilt (else the
            # global dictionary silently loses its df/cf)
            entry = {"kind": "postings", "shard": shard, "bucket": bucket,
                     "n_docs": 0, "total_len": 0, "n_terms": len(uniques),
                     "nbytes": nbytes, "file": path, "dict_file": dpath}
        atomic_write_json(entry, _manifest_entry_file(index_dir, shard, bucket))
        return pa.Table.from_pylist([entry], schema=_META_SCHEMA)

    return encode_group


def _merge_dictionary(index_dir: str, n_buckets: int) -> int:
    """Pass C: per-bucket df/cf merge. No shuffle — the partial files are
    already partitioned by term-hash bucket, so each bucket task reads
    only its own shard partials. Returns vocabulary size."""

    os.makedirs(os.path.join(index_dir, "dictionary"), exist_ok=True)

    def merge_bucket(batch: pa.Table) -> pa.Table:
        out = []
        for b in batch.column("bucket").to_pylist():
            paths = sorted(glob.glob(os.path.join(
                index_dir, "dict_partials", f"shard-*-bucket-{b:02d}.parquet")))
            if not paths:
                out.append({"bucket": b, "n_terms": 0})
                continue
            import pyarrow.parquet as pq
            frames = [pq.read_table(p).to_pandas() for p in paths]
            df = pd.concat(frames).groupby("term", sort=True).sum().reset_index()
            t = pa.table({"term": pa.array(df["term"], pa.string()),
                          "df": pa.array(df["df"], pa.int64()),
                          "cf": pa.array(df["cf"], pa.int64())})
            atomic_write_parquet(t, os.path.join(
                index_dir, "dictionary", f"bucket-{b:02d}.parquet"))
            out.append({"bucket": b, "n_terms": len(df)})
        return pa.Table.from_pylist(out)

    res = rd.from_items([{"bucket": b} for b in range(n_buckets)]) \
        .map_batches(merge_bucket, batch_format="pyarrow", batch_size=1) \
        .to_pandas()
    return int(res["n_terms"].sum())


def _load_done_shards(index_dir: str, cfg: IndexConfig) -> set[int]:
    """A shard is resumable-complete iff all of its B+1 per-group manifest
    entries AND the files they point at exist — OR a consolidated
    manifest.json from a completed run lists it with all files present
    (covers shards whose term-buckets were legitimately empty)."""
    entries = glob.glob(os.path.join(index_dir, "_manifest", "shard-*.json"))
    by_shard: dict[int, set[int]] = {}
    for p in entries:
        try:
            with open(p) as f:
                e = json.load(f)
        except (json.JSONDecodeError, OSError):
            continue
        if os.path.exists(e["file"]) and \
                (not e.get("dict_file") or os.path.exists(e["dict_file"])):
            by_shard.setdefault(e["shard"], set()).add(e["bucket"])
    want = set(range(-1, cfg.term_buckets))
    done = {s for s, got in by_shard.items() if got == want}
    mpath = os.path.join(index_dir, "manifest.json")
    if os.path.exists(mpath):
        try:
            with open(mpath) as f:
                m = json.load(f)
            if m.get("config_fingerprint") == cfg.fingerprint():
                for s, entry in m.get("shards", {}).items():
                    if all(os.path.exists(os.path.join(index_dir, rel))
                           for rel in entry.get("files", [])):
                        done.add(int(s))
        except (json.JSONDecodeError, OSError):
            pass
    return done


def build_index(transcripts, index_dir: str, cfg: IndexConfig | None = None,
                resume: bool = True) -> dict:
    """Build the index; returns build metrics. ``transcripts`` is a parquet
    path/dir or a ``ray.data.Dataset`` with the input_hint schema.

    Resumable: re-running after a partial build skips shards whose
    per-group manifest entries are complete and reproduces byte-identical
    artifacts for the rest (deterministic encode + atomic writes).
    """
    import time
    phases: dict[str, float] = {}
    t_start = time.perf_counter()
    cfg = cfg or IndexConfig()
    if isinstance(transcripts, str):
        ds = rd.read_parquet(transcripts, columns=["conv_id", "turn_idx", "text"])
    else:
        ds = transcripts.select_columns(["conv_id", "turn_idx", "text"])

    os.makedirs(index_dir, exist_ok=True)
    fp_path = os.path.join(index_dir, "config_fingerprint.json")
    done: set[int] = set()
    offsets = None
    prior = {}
    if os.path.exists(fp_path):
        try:
            with open(fp_path) as f:
                prior = json.load(f)
        except (json.JSONDecodeError, OSError):
            prior = {}
    input_fp = _input_fingerprint_path(transcripts)  # None for Dataset input
    cfg_ok = prior.get("fingerprint") == cfg.fingerprint()
    stale = bool(prior) and not cfg_ok
    if resume and cfg_ok and \
            os.path.exists(os.path.join(index_dir, "conv_offsets.parquet")):
        if input_fp is not None:
            # path input: cheap metadata identity check, no recompute
            input_ok = prior.get("input_fingerprint") == input_fp
        else:
            # Dataset input: no file identity exists — recompute the (cheap)
            # offsets pass and compare its content digest; a changed input
            # with a stale digest must NOT silently reuse done shards
            t0 = time.perf_counter()
            offsets = compute_conv_offsets(ds)
            phases["offsets"] = round(time.perf_counter() - t0, 2)
            input_ok = prior.get("offsets_digest") == _offsets_digest(offsets)
        if input_ok:
            if offsets is None:
                offsets = ConvOffsets.load(index_dir)
            done = _load_done_shards(index_dir, cfg)
        else:
            stale = True
    if stale:
        # config or input changed: stale artifacts (entry files, postings,
        # partials) would poison consolidation — wipe the build outputs
        import shutil
        done = set()
        for sub in ("_manifest", "postings", "doc_lens", "dict_partials",
                    "dictionary"):
            shutil.rmtree(os.path.join(index_dir, sub), ignore_errors=True)
        for fn in ("manifest.json", "stats.json"):
            try:
                os.remove(os.path.join(index_dir, fn))
            except OSError:
                pass

    if offsets is None:
        t0 = time.perf_counter()
        offsets = compute_conv_offsets(ds)
        phases["offsets"] = round(time.perf_counter() - t0, 2)
    offsets.save(index_dir)
    atomic_write_json({"fingerprint": cfg.fingerprint(),
                       "input_fingerprint": input_fp,
                       "offsets_digest": _offsets_digest(offsets)}, fp_path)

    import ray
    offsets_ref = ray.put(offsets)
    n_shards = (offsets.n_docs + cfg.docs_per_shard - 1) // cfg.docs_per_shard

    if len(done) < n_shards:
        kwargs = {
            "offsets_ref": offsets_ref,
            "docs_per_shard": cfg.docs_per_shard,
            "term_buckets": cfg.term_buckets,
            "done_shards": tuple(sorted(done)),
            "tokenizer_spec": cfg.tokenizer_spec,
        }
        if cfg.tokenize_compute == "actors":
            post = ds.map_batches(
                TokenizePostings, fn_constructor_kwargs=kwargs,
                batch_format="pyarrow", zero_copy_batch=True,
                batch_size=cfg.tokenize_batch_size,
                concurrency=cfg.tokenize_concurrency, num_cpus=1)
        else:  # warm task pool: per-worker cached state via get_broadcast
            def tokenize_fn(batch: pa.Table,
                            _k=kwargs) -> pa.Table:
                worker = _BROADCAST_CACHE.get("__tokenizer_stage__")
                if worker is None or worker._kargs != _k:  # type: ignore[attr-defined]
                    worker = TokenizePostings(**_k)
                    worker._kargs = _k  # type: ignore[attr-defined]
                    _BROADCAST_CACHE["__tokenizer_stage__"] = worker
                return worker(batch)

            post = ds.map_batches(
                tokenize_fn, batch_format="pyarrow", zero_copy_batch=True,
                batch_size=cfg.tokenize_batch_size, num_cpus=1)
        meta = post.groupby("gkey").map_groups(
            make_encode_group_fn(index_dir, cfg), batch_format="pyarrow")
        # push-based sort shuffle roughly halves the merge exchange cost
        # for the (small-row-count) segment tables; restore the strategy
        # afterwards — it is session-global state
        from ray.data import DataContext
        from ray.data.context import ShuffleStrategy
        ctx = DataContext.get_current()
        prev = ctx.shuffle_strategy
        t0 = time.perf_counter()
        try:
            # BM25_SHUFFLE_STRATEGY overrides for A/B experiments
            # (hash | push | pull); push-based measured fastest here
            strat = {"hash": ShuffleStrategy.HASH_SHUFFLE,
                     "pull": ShuffleStrategy.SORT_SHUFFLE_PULL_BASED,
                     "push": ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED}[
                os.environ.get("BM25_SHUFFLE_STRATEGY", "push")]
            ctx.shuffle_strategy = strat
            meta.materialize()  # drive the build; meta rows are tiny
        finally:
            ctx.shuffle_strategy = prev
        phases["tokenize_merge_encode"] = round(time.perf_counter() - t0, 2)

    # consolidate per-group entries → stats + manifest (idempotent).
    # Seed from a previous complete manifest: a resumed shard may have
    # been skipped via manifest.json with its per-group entry files gone.
    shards: dict[str, dict] = {}
    mpath = os.path.join(index_dir, "manifest.json")
    if resume and os.path.exists(mpath):
        try:
            with open(mpath) as f:
                old_m = json.load(f)
            if old_m.get("config_fingerprint") == cfg.fingerprint():
                shards = {s: e for s, e in old_m.get("shards", {}).items()
                          if int(s) in done}
        except (json.JSONDecodeError, OSError):
            pass  # corrupt manifest: rebuild accounting from entry files
    total_len = sum(e["total_len"] for e in shards.values())
    n_docs = sum(e["n_docs"] for e in shards.values())
    postings_bytes = sum(e["postings_bytes"] for e in shards.values())
    seen_doclens = {int(s) for s in shards}
    for p in sorted(glob.glob(os.path.join(index_dir, "_manifest", "shard-*.json"))):
        with open(p) as f:
            e = json.load(f)
        if int(e["shard"]) in seen_doclens:
            continue  # already accounted via the previous manifest
        s = shards.setdefault(str(e["shard"]), {
            "n_docs": 0, "total_len": 0, "postings_bytes": 0, "files": []})
        s["files"].append(os.path.relpath(e["file"], index_dir))
        if e.get("dict_file"):
            s["files"].append(os.path.relpath(e["dict_file"], index_dir))
        if e["kind"] == "doc_lens":
            s["n_docs"] = e["n_docs"]
            s["total_len"] = e["total_len"]
            n_docs += e["n_docs"]
            total_len += e["total_len"]
        else:
            s["postings_bytes"] += e["nbytes"]
            postings_bytes += e["nbytes"]

    t0 = time.perf_counter()
    n_terms = _merge_dictionary(index_dir, cfg.term_buckets)
    phases["dictionary"] = round(time.perf_counter() - t0, 2)
    phases["total"] = round(time.perf_counter() - t_start, 2)

    stats = {
        "n_docs": n_docs, "total_len": total_len,
        "avgdl": (total_len / n_docs) if n_docs else 0.0,
        "n_terms": n_terms, "n_shards": n_shards,
        "postings_bytes": postings_bytes,
        "k1": cfg.k1, "b": cfg.b, "block_size": cfg.block_size,
        "tokenizer_spec": cfg.tokenizer_spec,
        "term_buckets": cfg.term_buckets, "docs_per_shard": cfg.docs_per_shard,
        "config_fingerprint": cfg.fingerprint(),
    }
    atomic_write_json(stats, os.path.join(index_dir, "stats.json"))
    # per-partition lineage: a shard IS a docID range, and docIDs are a
    # pure function of the input's (conv_id, turn_idx) order — so
    # (input_fingerprint, offsets_digest, doc_lo/doc_hi) ties every
    # artifact file back to exactly the input rows that produced it
    dps = cfg.docs_per_shard
    for sid, e in shards.items():
        e["doc_lo"] = int(sid) * dps
        e["doc_hi"] = min((int(sid) + 1) * dps, offsets.n_docs)
    atomic_write_json({"shards": shards,
                       "config_fingerprint": cfg.fingerprint(),
                       "input_fingerprint": input_fp,
                       "offsets_digest": _offsets_digest(offsets),
                       "phases": phases},
                      os.path.join(index_dir, "manifest.json"))
    assert n_docs == offsets.n_docs, \
        f"doc count mismatch: merged {n_docs} vs offsets {offsets.n_docs}"
    return {"n_docs": n_docs, "n_terms": n_terms, "n_shards": n_shards,
            "avgdl": stats["avgdl"], "postings_bytes": postings_bytes,
            "resumed_shards": len(done), "phases": phases}
