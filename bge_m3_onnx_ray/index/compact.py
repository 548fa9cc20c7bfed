"""Index compaction — rewrite an appended (fragmented) index back into
the canonical dense-docID layout, from the index artifacts ALONE (the
source corpus may be in cold storage).

After ``append_index`` the docID space has holes at shard boundaries and
conversations are ordered by arrival, not lexicographically. Compaction
restores the fresh-build invariant — docID = dense rank of
(conv_id, turn_idx) — by:

1. recomputing dense offsets (sort convs lexicographically, prefix-sum
   their turn counts), which defines a piecewise-shift remap
   old docID → new docID;
2. streaming the OLD postings/doc_lens parquet through a ``map_batches``
   stage that decodes each term row (one whole-file varint pass,
   ``codec.decode_postings_file``), remaps and re-sorts doc ids, and
   emits the same SPIMI segment rows the build stage emits;
3. reusing the build's ``groupby(gkey)`` merge + per-group atomic
   encode into a FRESH index directory.

Because the encode path is deterministic, the compacted artifacts are
BYTE-IDENTICAL to a from-scratch build over the union corpus (the
parity test hashes both trees) — compaction provably loses nothing.
When the index carries tombstones (``index.delete``), compaction also
drops the deleted documents physically and recomputes N/total_len/avgdl,
byte-identical to a fresh build over the SURVIVING corpus
(tests/test_delete.py hashes that pair of trees too).
A positional artifact, if present and current, is compacted the same
way (decode → remap → re-segment → merge; also byte-identical to a
fresh ``build_positions``). Attrs side tables are not carried over
(rebuild from source).
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from bge_m3_onnx_ray.index.artifacts import ConvOffsets, atomic_write_json
from bge_m3_onnx_ray.index.build import (
    TokenizePostings,
    _merge_dictionary,
    _offsets_digest,
    make_encode_group_fn,
    term_bucket,
)


def _dense_offsets(old: ConvOffsets, keep_conv: np.ndarray | None = None
                   ) -> tuple[ConvOffsets, np.ndarray, np.ndarray]:
    """Dense lexicographic offsets + the old-row-order arrays needed for
    the docID remap: returns (new_offsets, old_starts_sorted_by_start,
    new_starts_in_old_start_order). ``keep_conv`` (bool per old conv
    row) drops tombstoned conversations from the new docID space; a
    dropped conv's slot in the remap array is poisoned (int64 min) —
    the remap stages filter its rows before the shift is applied."""
    n = len(old.counts)
    kept_idx = (np.arange(n, dtype=np.int64) if keep_conv is None
                else np.flatnonzero(keep_conv))
    kept_convs = old._conv_arrow.take(pa.array(kept_idx))
    order_k = pc.sort_indices(kept_convs).to_numpy().astype(np.int64)
    conv_sorted = kept_convs.take(pa.array(order_k))
    counts_sorted = old.counts[kept_idx][order_k]
    new_starts_sorted = np.zeros(len(counts_sorted), np.int64)
    np.cumsum(counts_sorted[:-1], out=new_starts_sorted[1:])
    # nondense rank maps carry over per surviving conversation unchanged
    nondense = dict(old.nondense)
    if nondense and keep_conv is not None:
        kept_set = set(conv_sorted.to_pylist())
        nondense = {c: m for c, m in nondense.items() if c in kept_set}
    new_off = ConvOffsets(conv_sorted, new_starts_sorted, counts_sorted,
                          nondense)
    # remap arrays in OLD start order (old.starts ascending by contract)
    new_starts_old_order = np.full(n, np.iinfo(np.int64).min, np.int64)
    new_starts_old_order[kept_idx[order_k]] = new_starts_sorted
    return new_off, old.starts, new_starts_old_order


def _make_remap_fn(old_starts: np.ndarray, new_starts_old_order: np.ndarray,
                   docs_per_shard: int, term_buckets: int, block_size: int,
                   keep_conv: np.ndarray | None = None):
    """Stage: old POSTINGS_SCHEMA rows → SPIMI segment rows with remapped,
    re-sorted docIDs (the exact contract `make_encode_group_fn` merges).
    ``keep_conv``: rows of tombstoned (dropped) conversations are
    filtered out before the shift — this is where deletes become
    physical."""

    def remap(batch: pa.Table) -> pa.Table:
        from bge_m3_onnx_ray.index.build import _POSTROW_SCHEMA
        from bge_m3_onnx_ray.index.codec import decode_postings_file
        if not batch.num_rows:
            return _POSTROW_SCHEMA.empty_table()
        counts, docs, tfs, dls = decode_postings_file(batch, block_size)
        terms = batch.column("term")
        n_rows = len(counts)
        term_codes = np.repeat(np.arange(n_rows, dtype=np.int64), counts)
        # piecewise shift: docID - old_conv_start + new_conv_start
        conv_i = np.searchsorted(old_starts, docs, side="right") - 1
        if keep_conv is not None:
            m = keep_conv[conv_i]
            docs, tfs, dls = docs[m], tfs[m], dls[m]
            term_codes, conv_i = term_codes[m], conv_i[m]
            if not len(docs):
                return _POSTROW_SCHEMA.empty_table()
        new_docs = docs - old_starts[conv_i] + new_starts_old_order[conv_i]
        shard = new_docs // docs_per_shard
        order = np.lexsort((new_docs, term_codes, shard))
        skey = shard[order] * (n_rows + 1) + term_codes[order]
        ub = term_bucket(terms.combine_chunks(), term_buckets)
        stride = term_buckets + 1
        row_gkey = shard[order] * stride + ub[term_codes[order]] + 1
        return TokenizePostings._segment_table(
            skey, new_docs[order], tfs[order], dls[order],
            term_codes[order], terms.combine_chunks().cast(pa.large_string()),
            row_gkey)

    def remap_doclens(batch: pa.Table) -> pa.Table:
        from bge_m3_onnx_ray.index.build import _POSTROW_SCHEMA
        if not batch.num_rows:
            return _POSTROW_SCHEMA.empty_table()
        docs = batch.column("doc_id").to_numpy().astype(np.int64)
        dls = batch.column("dl").to_numpy().astype(np.int64)
        conv_i = np.searchsorted(old_starts, docs, side="right") - 1
        if keep_conv is not None:
            m = keep_conv[conv_i]
            docs, dls, conv_i = docs[m], dls[m], conv_i[m]
            if not len(docs):
                return _POSTROW_SCHEMA.empty_table()
        new_docs = docs - old_starts[conv_i] + new_starts_old_order[conv_i]
        shard = new_docs // docs_per_shard
        order = np.lexsort((new_docs, shard))
        stride = term_buckets + 1
        return TokenizePostings._segment_table(
            shard[order], new_docs[order], dls[order], dls[order],
            np.zeros(len(docs), np.int64),
            pa.array([""], pa.large_string()), shard[order] * stride)

    return remap, remap_doclens


def _make_remap_positions_fn(old_starts: np.ndarray,
                             new_starts_old_order: np.ndarray,
                             docs_per_shard: int, term_buckets: int,
                             keep_conv: np.ndarray | None = None):
    """Stage: old POSITIONS_SCHEMA rows → occurrence segment rows with
    remapped, re-sorted docIDs (positions within a doc are unchanged)."""

    def remap_pos(batch: pa.Table) -> pa.Table:
        import zlib

        from bge_m3_onnx_ray.index.positions import (_OCCROW_SCHEMA,
                                                     decode_occ_rows,
                                                     encode_occ_segments)
        if not batch.num_rows:
            return _OCCROW_SCHEMA.empty_table()
        bcol = batch.column("blob").combine_chunks()
        boffs = np.frombuffer(bcol.buffers()[1], np.int32)[
            bcol.offset:bcol.offset + len(bcol) + 1].astype(np.int64)
        bdata = np.frombuffer(bcol.buffers()[2] or b"", np.uint8)
        ns = batch.column("n").to_numpy().astype(np.int64)
        docs, poss = decode_occ_rows(bdata, boffs, ns,
                                     np.arange(len(ns), dtype=np.int64))
        terms = batch.column("term")
        term_codes = np.repeat(np.arange(len(ns), dtype=np.int64), ns)
        conv_i = np.searchsorted(old_starts, docs, side="right") - 1
        if keep_conv is not None:
            m = keep_conv[conv_i]
            docs, poss = docs[m], poss[m]
            term_codes, conv_i = term_codes[m], conv_i[m]
            if not len(docs):
                return _OCCROW_SCHEMA.empty_table()
        new_docs = docs - old_starts[conv_i] + new_starts_old_order[conv_i]
        shard = new_docs // docs_per_shard
        order = np.lexsort((poss, new_docs, term_codes, shard))
        skey = shard[order] * (len(ns) + 1) + term_codes[order]
        bounds = np.concatenate([[0], np.flatnonzero(np.diff(skey)) + 1,
                                 [len(skey)]])
        heads = bounds[:-1]
        blob, offs = encode_occ_segments(bounds, new_docs[order], poss[order])
        blob_arr = pa.Array.from_buffers(
            pa.large_binary(), len(heads),
            [None, pa.py_buffer(np.ascontiguousarray(offs, np.int64)),
             pa.py_buffer(blob)])
        uniq = terms.combine_chunks()
        ub = np.fromiter((zlib.crc32(u.encode()) % term_buckets
                          for u in uniq.to_pylist()),
                         np.int64, len(uniq))
        oc = term_codes[order]
        stride = term_buckets + 1
        return pa.table({
            "term": uniq.take(pa.array(oc[heads])).cast(pa.large_string()),
            "gkey": pa.array(shard[order][heads] * stride + ub[oc[heads]] + 1,
                             pa.int64()),
            "min_doc": pa.array(new_docs[order][heads], pa.int64()),
            "n": pa.array(np.diff(bounds).astype(np.int32), pa.int32()),
            "blob": blob_arr,
        }, schema=_OCCROW_SCHEMA)

    return remap_pos


def compact_index(index_dir: str, out_dir: str) -> dict:
    """Compact ``index_dir`` into ``out_dir`` (must not exist or be
    empty). Returns compaction metrics. The output is a complete,
    self-sufficient index whose artifacts are byte-identical to a fresh
    build of the same corpus."""
    import ray
    import time
    t_start = time.perf_counter()
    with open(os.path.join(index_dir, "stats.json")) as f:
        stats = json.load(f)
    from bge_m3_onnx_ray.index.append import _config_from_stats
    cfg = _config_from_stats(stats)
    old = ConvOffsets.load(index_dir)
    if os.path.exists(out_dir) and os.listdir(out_dir):
        raise ValueError(f"compaction target {out_dir!r} is not empty")
    os.makedirs(out_dir, exist_ok=True)

    # tombstones (index.delete): drop the deleted documents physically.
    # Only whole-conversation deletions compact (a partial conv would
    # change its turn-rank maps — delete_convs is the granularity the
    # lifecycle supports end-to-end); raise rather than silently skew.
    from bge_m3_onnx_ray.index.delete import load_tombstones
    tombs = load_tombstones(index_dir)
    keep_conv = None
    if len(tombs):
        conv_i = np.searchsorted(old.starts, tombs, side="right") - 1
        per_conv = np.bincount(conv_i, minlength=len(old.counts))
        partial = (per_conv > 0) & (per_conv != old.counts)
        if partial.any():
            bad = old._conv_arrow.take(
                pa.array(np.flatnonzero(partial)[:5])).to_pylist()
            raise NotImplementedError(
                f"tombstones cover conversations partially ({bad}); "
                "compaction drops whole conversations only — use "
                "delete_convs, or rebuild from source")
        keep_conv = per_conv == 0

    new_off, old_starts, new_starts_old_order = _dense_offsets(old, keep_conv)
    new_off.save(out_dir)
    remap, remap_doclens = _make_remap_fn(
        old_starts, new_starts_old_order, cfg.docs_per_shard,
        cfg.term_buckets, cfg.block_size, keep_conv)

    post_files = sorted(glob.glob(os.path.join(index_dir, "postings",
                                               "*.parquet")))
    dl_files = sorted(glob.glob(os.path.join(index_dir, "doc_lens",
                                             "*.parquet")))
    seg_p = rd.read_parquet(post_files).map_batches(
        remap, batch_format="pyarrow", num_cpus=1)
    seg_d = rd.read_parquet(dl_files).map_batches(
        remap_doclens, batch_format="pyarrow", num_cpus=1)
    segs = seg_p.union(seg_d)
    from ray.data import DataContext
    from ray.data.context import ShuffleStrategy
    ctx = DataContext.get_current()
    prev = ctx.shuffle_strategy
    try:
        ctx.shuffle_strategy = ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED
        segs.groupby("gkey").map_groups(
            make_encode_group_fn(out_dir, cfg),
            batch_format="pyarrow").materialize()
    finally:
        ctx.shuffle_strategy = prev

    n_terms = _merge_dictionary(out_dir, cfg.term_buckets)

    # consolidate (fresh-build shape: every shard from its entry files)
    shards: dict[str, dict] = {}
    n_docs = total_len = postings_bytes = 0
    for p in sorted(glob.glob(os.path.join(out_dir, "_manifest",
                                           "shard-*.json"))):
        with open(p) as f:
            e = json.load(f)
        s = shards.setdefault(str(e["shard"]), {
            "n_docs": 0, "total_len": 0, "postings_bytes": 0, "files": []})
        s["files"].append(os.path.relpath(e["file"], out_dir))
        if e.get("dict_file"):
            s["files"].append(os.path.relpath(e["dict_file"], out_dir))
        if e["kind"] == "doc_lens":
            s["n_docs"] = e["n_docs"]
            s["total_len"] = e["total_len"]
            n_docs += e["n_docs"]
            total_len += e["total_len"]
        else:
            s["postings_bytes"] += e["nbytes"]
            postings_bytes += e["nbytes"]
    assert n_docs == new_off.n_docs, \
        f"compaction lost documents: {n_docs} vs {new_off.n_docs}"
    if keep_conv is None:
        assert n_docs == stats["n_docs"], "doc count drifted from stats"
        assert total_len == stats["total_len"], "compaction lost tokens"
    dps = cfg.docs_per_shard
    for sid, e in shards.items():
        e["doc_lo"] = int(sid) * dps
        e["doc_hi"] = min((int(sid) + 1) * dps, new_off.n_docs)

    # positional artifact: compact it the same way if present and current
    n_pos_groups = 0
    from bge_m3_onnx_ray.index.positions import (_make_merge_pos_group,
                                                 has_positions)
    if has_positions(index_dir):
        remap_pos = _make_remap_positions_fn(
            old_starts, new_starts_old_order, dps, cfg.term_buckets,
            keep_conv)
        pos_files = sorted(glob.glob(os.path.join(index_dir, "positions",
                                                  "*.parquet")))
        pos_segs = rd.read_parquet(pos_files).map_batches(
            remap_pos, batch_format="pyarrow", num_cpus=1)
        try:
            ctx.shuffle_strategy = ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED
            pos_entries = pos_segs.groupby("gkey").map_groups(
                _make_merge_pos_group(out_dir, cfg.term_buckets),
                batch_format="pyarrow").take_all()
        finally:
            ctx.shuffle_strategy = prev
        atomic_write_json(
            {"config_fingerprint": cfg.fingerprint(),
             "offsets_digest": _offsets_digest(new_off),
             "files": sorted(e["file"] for e in pos_entries),
             "n_terms": int(sum(e["n_terms"] for e in pos_entries)),
             "nbytes": int(sum(e["nbytes"] for e in pos_entries))},
            os.path.join(out_dir, "positions_manifest.json"))
        n_pos_groups = len(pos_entries)

    new_stats = dict(stats)
    new_stats["n_shards"] = (new_off.n_docs + dps - 1) // dps
    new_stats["n_terms"] = n_terms
    new_stats["postings_bytes"] = postings_bytes
    # after dropping tombstoned docs the corpus stats change: recompute
    # exactly as a fresh build does (build.py stats: avgdl = total/n)
    new_stats["n_docs"] = n_docs
    new_stats["total_len"] = total_len
    new_stats["avgdl"] = (total_len / n_docs) if n_docs else 0.0
    atomic_write_json(new_stats, os.path.join(out_dir, "stats.json"))
    digest = _offsets_digest(new_off)
    atomic_write_json({"shards": shards,
                       "config_fingerprint": cfg.fingerprint(),
                       "input_fingerprint": None,
                       "offsets_digest": digest,
                       "phases": {"total": round(
                           time.perf_counter() - t_start, 2)}},
                      os.path.join(out_dir, "manifest.json"))
    atomic_write_json({"fingerprint": cfg.fingerprint(),
                       "input_fingerprint": None,
                       "offsets_digest": digest},
                      os.path.join(out_dir, "config_fingerprint.json"))
    return {"n_docs": n_docs, "n_terms": n_terms,
            "n_shards": new_stats["n_shards"],
            "postings_bytes": postings_bytes,
            "positions_groups": n_pos_groups,
            "dropped_docs": int(len(tombs)),
            "seconds": round(time.perf_counter() - t_start, 2)}
