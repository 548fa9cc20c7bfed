"""Index resharding — the Elasticsearch ``_split`` / ``_shrink``
lifecycle: change an existing index's shard count WITHOUT re-reading or
re-tokenizing the corpus.

Because docID → shard is pure arithmetic (``doc_id // docs_per_shard``)
and posting lists are stored doc-ascending, resharding is a MAP over
(new_shard, term_bucket) pairs: each task decodes just the old postings
files whose doc range overlaps its new shard, slices every term's list
to the new boundaries, and re-encodes with the build's own batch codec
— no shuffle, no tokenization, no global pass. Global artifacts
(dictionary with corpus-wide df/cf, conv_offsets, corpus stats) are
copied verbatim: resharding never changes a score.

At 100 TB this is the shard-management story: doubling a hot tier's
parallelism costs one streaming decode+encode of the postings bytes
(each old file read by at most ceil(odps/ndps)+1 tasks), not an index
rebuild from text.

Scores after reshard are BIT-IDENTICAL to the source index (same
postings, same global stats), so the standard BM25 SQL oracle gates the
whole lifecycle end-to-end."""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from bge_m3_onnx_ray.index.artifacts import (
    POSTINGS_SCHEMA,
    IndexMeta,
    atomic_write_json,
    atomic_write_parquet,
    doc_lens_file,
    postings_file,
)
from bge_m3_onnx_ray.index.codec import (
    decode_postings_file,
    encode_postings_many,
)


def _postings_table(uniques: np.ndarray, enc: dict) -> pa.Table:
    """POSTINGS_SCHEMA table from encode_postings_many output — the same
    assembly as the build's encode_group (build.py:492-512)."""
    term_arr = pa.array(uniques.tolist(), pa.string())
    loffs = pa.array(enc["list_offsets"].astype(np.int32))
    return pa.Table.from_arrays([
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


def reshard_index(src_dir: str, dst_dir: str, new_docs_per_shard: int,
                  concurrency: int | None = None,
                  drop: tuple = ()) -> dict:
    """Write a ``new_docs_per_shard`` re-sharding of ``src_dir`` at
    ``dst_dir``. Split (smaller shards) and shrink (larger) both work;
    boundaries need not align. Returns the new index's summary dict.

    Optional artifacts (tombstones/attrs/positions) are not migrated:
    by default their presence RAISES so a reshard can't silently lose
    query capability; a caller that doesn't need one lists it in
    ``drop`` and the destination is written without it (positional /
    filtered queries against the new index will refuse as unbuilt)."""
    meta = IndexMeta(src_dir)
    odps = meta.docs_per_shard
    ndps = int(new_docs_per_shard)
    if ndps <= 0:
        raise ValueError("new_docs_per_shard must be positive")
    for d in ("tombstones", "attrs", "positions"):
        if d not in drop and os.path.isdir(os.path.join(src_dir, d)):
            raise NotImplementedError(
                f"reshard does not yet migrate the optional {d!r} "
                "artifact; compact/drop it first, or pass "
                f"drop=({d!r},) to reshard without it")
    n_docs = meta.n_docs
    n_new = (n_docs + ndps - 1) // ndps
    old_shards = meta.shards
    block_size = meta.block_size

    os.makedirs(os.path.join(dst_dir, "postings"), exist_ok=True)
    os.makedirs(os.path.join(dst_dir, "doc_lens"), exist_ok=True)
    # global artifacts are shard-independent: copy verbatim
    shutil.copytree(os.path.join(src_dir, "dictionary"),
                    os.path.join(dst_dir, "dictionary"),
                    dirs_exist_ok=True)
    co = os.path.join(src_dir, "conv_offsets.parquet")
    if os.path.exists(co):
        shutil.copy2(co, os.path.join(dst_dir, "conv_offsets.parquet"))

    def task(batch: pa.Table) -> pa.Table:
        out = []
        # per-invocation decoded-file cache: work items arrive sorted by
        # (bucket, new_shard), so every new shard cut from the same old
        # shard hits the same cache entry — a SPLIT (ndps < odps) decodes
        # each old file ~once per batch instead of once per new shard
        # (odps/ndps x fewer decodes; the dominant reshard cost)
        cache: dict = {}

        def decoded(s: int, b: int):
            got = cache.get((s, b))
            if got is None:
                if len(cache) >= 8:             # bound per-task heap
                    cache.clear()
                tbl = pq.read_table(postings_file(src_dir, s, b))
                vocab = np.asarray(tbl.column("term").to_pylist(), object)
                got = (vocab,) + decode_postings_file(tbl, block_size)
                cache[(s, b)] = got
            return got

        for t, b in zip(batch.column("new_shard").to_pylist(),
                        batch.column("bucket").to_pylist()):
            lo, hi = t * ndps, min((t + 1) * ndps, n_docs)
            olds = [s for s in old_shards
                    if s * odps < hi and (s + 1) * odps > lo]
            vocabs, code_parts, d_parts, tf_parts, dl_parts = \
                [], [], [], [], []
            voff = 0
            for s in olds:                      # ascending s = doc order
                p = postings_file(src_dir, s, b)
                if not os.path.exists(p):
                    continue
                fvocab, counts, dids, tfs, dls = decoded(s, b)
                m = (dids >= lo) & (dids < hi)
                if not m.any():
                    voff += len(fvocab)
                    vocabs.append(fvocab)
                    continue
                row_of = np.repeat(
                    np.arange(len(fvocab), dtype=np.int64), counts)
                vocabs.append(fvocab)
                code_parts.append(row_of[m] + voff)
                d_parts.append(dids[m])
                tf_parts.append(tfs[m])
                dl_parts.append(dls[m])
                voff += len(fvocab)
            path = postings_file(dst_dir, t, b)
            if not code_parts:
                nbytes = atomic_write_parquet(
                    POSTINGS_SCHEMA.empty_table(), path)
                out.append({"new_shard": int(t), "bucket": int(b),
                            "n_terms": 0, "nbytes": int(nbytes)})
                continue
            vocab = np.concatenate(vocabs)
            uniq, inv = np.unique(vocab, return_inverse=True)
            gcode = inv[np.concatenate(code_parts)]
            dids = np.concatenate(d_parts)
            tfs = np.concatenate(tf_parts)
            dls = np.concatenate(dl_parts)
            order = np.argsort(gcode, kind="stable")  # keeps doc order
            gcode, dids = gcode[order], dids[order]
            tfs, dls = tfs[order], dls[order]
            present = np.unique(gcode)
            bounds = np.concatenate(
                [[0], np.flatnonzero(np.diff(gcode)) + 1, [len(gcode)]])
            enc = encode_postings_many(dids, tfs, dls, bounds, block_size)
            nbytes = atomic_write_parquet(
                _postings_table(uniq[present], enc), path)
            out.append({"new_shard": int(t), "bucket": int(b),
                        "n_terms": int(len(present)),
                        "nbytes": int(nbytes)})
        return pa.Table.from_pylist(out, schema=pa.schema([
            ("new_shard", pa.int64()), ("bucket", pa.int64()),
            ("n_terms", pa.int64()), ("nbytes", pa.int64())]))

    def lens_task(batch: pa.Table) -> pa.Table:
        out = []
        lcache: dict = {}

        def lens_of(s: int) -> pa.Table:
            got = lcache.get(s)
            if got is None:
                if len(lcache) >= 8:
                    lcache.clear()
                got = lcache[s] = pq.read_table(doc_lens_file(src_dir, s))
            return got

        for t in batch.column("new_shard").to_pylist():
            lo, hi = t * ndps, min((t + 1) * ndps, n_docs)
            olds = [s for s in old_shards
                    if s * odps < hi and (s + 1) * odps > lo]
            parts = []
            for s in olds:
                tbl = lens_of(s)
                ids = tbl.column("doc_id").to_numpy()
                m = (ids >= lo) & (ids < hi)
                parts.append(tbl.filter(pa.array(m)))
            merged = pa.concat_tables(parts)
            atomic_write_parquet(merged, doc_lens_file(dst_dir, t))
            out.append({"new_shard": int(t),
                        "n_docs": int(merged.num_rows),
                        "total_len": int(np.sum(
                            merged.column("dl").to_numpy()))})
        return pa.Table.from_pylist(out, schema=pa.schema([
            ("new_shard", pa.int64()), ("n_docs", pa.int64()),
            ("total_len", pa.int64())]))

    buckets = meta.term_buckets
    # bucket-major, new_shard ascending: consecutive work items cut
    # their slices from the SAME old postings file, so the per-task
    # decode cache turns a split's odps/ndps re-decodes into ~1; batch
    # size spans one old shard's worth of new shards (x2 for boundary
    # straddle) so the cache actually sees the run
    pairs = rd.from_items([{"new_shard": t, "bucket": b}
                           for b in range(buckets) for t in range(n_new)])
    bs = max(4, min(256, 2 * ((odps + ndps - 1) // ndps)))
    pstats = pairs.map_batches(task, batch_format="pyarrow",
                               batch_size=bs).to_pandas()
    lens = rd.from_items([{"new_shard": t} for t in range(n_new)]) \
        .map_batches(lens_task, batch_format="pyarrow",
                     batch_size=bs).to_pandas()

    fp = meta.stats.get("config_fingerprint", "") + f"-reshard{ndps}"
    shards = {}
    pb_by_shard = pstats.groupby("new_shard")["nbytes"].sum()
    for _, r in lens.iterrows():
        t = int(r["new_shard"])
        shards[str(t)] = {
            "doc_lo": t * ndps, "doc_hi": min((t + 1) * ndps, n_docs),
            "n_docs": int(r["n_docs"]), "total_len": int(r["total_len"]),
            "postings_bytes": int(pb_by_shard.get(t, 0)),
            "files": [f"postings/shard-{t:05d}-bucket-{b:02d}.parquet"
                      for b in range(buckets)]
                     + [f"doc_lens/shard-{t:05d}.parquet"],
        }
    stats = dict(meta.stats)
    stats.update({"docs_per_shard": ndps, "n_shards": n_new,
                  "config_fingerprint": fp,
                  "postings_bytes": int(pstats["nbytes"].sum())})
    atomic_write_json(stats, os.path.join(dst_dir, "stats.json"))
    atomic_write_json({"config_fingerprint": fp,
                       "input_fingerprint":
                           meta.manifest.get("input_fingerprint", ""),
                       "resharded_from": os.path.abspath(src_dir),
                       "shards": shards},
                      os.path.join(dst_dir, "manifest.json"))
    return {"n_docs": n_docs, "n_shards": n_new,
            "docs_per_shard": ndps,
            "postings_bytes": int(pstats["nbytes"].sum())}
