"""Incremental (delta) index append — new documents enter an existing
index WITHOUT rewriting any existing artifact.

The 10^12-turn corpus is never rebuilt from scratch when a day's new
conversations arrive. This module appends them as FRESH SHARDS
(append-only segments, the standard inverted-index freshness model):

- new conversations get docIDs starting at the next shard boundary
  after the existing docID space, so no existing postings / doc_lens /
  dict_partials file is touched (a partially-full last shard keeps its
  gap — docID space is an ID space, not a count);
- the new rows run the SAME pass-B pipeline as a fresh build
  (``build.TokenizePostings`` → ``groupby(gkey)`` merge → per-group
  atomic parquet), producing only new-shard files;
- the global dictionary is re-merged per bucket from ALL shard partials
  (old partials are still on disk — no recompute of old postings), and
  ``stats.json`` is updated with the new real doc count / total length,
  so BM25's N, avgdl and per-term df are exactly what a full rebuild
  over the union corpus would produce. Scores after append are
  therefore IDENTICAL per (conv_id, turn_idx) to a from-scratch build —
  only docIDs (and docID tie-breaks between equal scores) differ, which
  the parity test checks.

Query side needs no changes: ``IndexMeta.shards`` comes from the
manifest (now including the appended shards), ``doc_to_conv`` works on
the start-ordered merged offsets table, and per-posting doc lengths are
stored inline so old postings score correctly under the new avgdl.

Constraints (raised, not silently mishandled): an appended batch must
not contain conv_ids already present in the index — new turns for an
EXISTING conversation would need that conversation's docID range to
grow, i.e. a shard rewrite; route such updates through a rebuild of the
affected shard instead (out of scope here). Attribute side tables
(``index.attrs``) and the positional artifact (``index.positions``)
cover only the pre-append corpus until rebuilt; ``has_positions``
detects this via the offsets digest.
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pyarrow as pa
import ray.data as rd

from bge_m3_onnx_ray.config import IndexConfig
from bge_m3_onnx_ray.index.artifacts import ConvOffsets, atomic_write_json
from bge_m3_onnx_ray.index.build import (
    TokenizePostings,
    _BROADCAST_CACHE,
    _merge_dictionary,
    _offsets_digest,
    compute_conv_offsets,
    make_encode_group_fn,
)


def _config_from_stats(stats: dict) -> IndexConfig:
    cfg = IndexConfig(
        k1=stats["k1"], b=stats["b"],
        tokenizer_spec=stats.get("tokenizer_spec", "deterministic"),
        docs_per_shard=stats["docs_per_shard"],
        term_buckets=stats["term_buckets"],
        block_size=stats["block_size"])
    if cfg.fingerprint() != stats.get("config_fingerprint"):
        raise ValueError(
            "stats.json config fields do not reproduce its fingerprint — "
            "index built by an incompatible engine version; rebuild")
    return cfg


def append_index(new_transcripts, index_dir: str) -> dict:
    """Append ``new_transcripts`` (parquet path/dir or Dataset with the
    input_hint schema, conversations NOT already in the index) to the
    index at ``index_dir``. Returns append metrics."""
    import ray
    import time
    t_start = time.perf_counter()
    with open(os.path.join(index_dir, "stats.json")) as f:
        stats = json.load(f)
    cfg = _config_from_stats(stats)
    old = ConvOffsets.load(index_dir)
    if isinstance(new_transcripts, str):
        ds = rd.read_parquet(new_transcripts,
                             columns=["conv_id", "turn_idx", "text"])
    else:
        ds = new_transcripts.select_columns(["conv_id", "turn_idx", "text"])

    new_off = compute_conv_offsets(ds)
    if new_off.n_docs == 0:
        return {"appended_docs": 0, "skipped": True}
    import pyarrow.compute as pc
    overlap = pc.index_in(new_off._conv_arrow, value_set=old._conv_arrow)
    if overlap.null_count != len(overlap):
        hits = new_off._conv_arrow.filter(pc.is_valid(overlap))
        raise ValueError(
            f"appended batch contains conv_ids already in the index "
            f"(e.g. {hits.to_pylist()[:5]!r}); appending turns to an "
            f"existing conversation requires rebuilding its shard")

    dps = cfg.docs_per_shard
    # fresh shard boundary: existing files are never rewritten
    new_start = ((old.n_docs + dps - 1) // dps) * dps
    merged = ConvOffsets(
        pa.concat_arrays([old._conv_arrow, new_off._conv_arrow]),
        np.concatenate([old.starts, new_off.starts + new_start]),
        np.concatenate([old.counts, new_off.counts]),
        {**old.nondense, **new_off.nondense})
    merged.save(index_dir)

    offsets_ref = ray.put(merged)
    kwargs = {"offsets_ref": offsets_ref, "docs_per_shard": dps,
              "term_buckets": cfg.term_buckets, "done_shards": (),
              "tokenizer_spec": cfg.tokenizer_spec}

    def tokenize_fn(batch: pa.Table, _k=kwargs) -> pa.Table:
        worker = _BROADCAST_CACHE.get("__tokenizer_stage__")
        if worker is None or worker._kargs != _k:  # type: ignore[attr-defined]
            worker = TokenizePostings(**_k)
            worker._kargs = _k  # type: ignore[attr-defined]
            _BROADCAST_CACHE["__tokenizer_stage__"] = worker
        return worker(batch)

    post = ds.map_batches(tokenize_fn, batch_format="pyarrow",
                          zero_copy_batch=True,
                          batch_size=cfg.tokenize_batch_size, num_cpus=1)
    meta = post.groupby("gkey").map_groups(
        make_encode_group_fn(index_dir, cfg), batch_format="pyarrow")
    from ray.data import DataContext
    from ray.data.context import ShuffleStrategy
    ctx = DataContext.get_current()
    prev = ctx.shuffle_strategy
    try:
        ctx.shuffle_strategy = ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED
        meta.materialize()
    finally:
        ctx.shuffle_strategy = prev

    n_terms = _merge_dictionary(index_dir, cfg.term_buckets)

    # consolidate: previous manifest + new shards' per-group entries
    mpath = os.path.join(index_dir, "manifest.json")
    with open(mpath) as f:
        manifest = json.load(f)
    shards: dict[str, dict] = manifest["shards"]
    first_new_shard = new_start // dps
    new_docs = new_len = new_bytes = 0
    for p in sorted(glob.glob(os.path.join(index_dir, "_manifest",
                                           "shard-*.json"))):
        with open(p) as f:
            e = json.load(f)
        if int(e["shard"]) < first_new_shard:
            continue
        s = shards.setdefault(str(e["shard"]), {
            "n_docs": 0, "total_len": 0, "postings_bytes": 0, "files": []})
        rel = os.path.relpath(e["file"], index_dir)
        if rel not in s["files"]:
            s["files"].append(rel)
            if e.get("dict_file"):
                s["files"].append(os.path.relpath(e["dict_file"], index_dir))
            if e["kind"] == "doc_lens":
                s["n_docs"] = e["n_docs"]
                s["total_len"] = e["total_len"]
                new_docs += e["n_docs"]
                new_len += e["total_len"]
            else:
                s["postings_bytes"] += e["nbytes"]
                new_bytes += e["nbytes"]
    assert new_docs == new_off.n_docs, \
        f"appended doc count mismatch: merged {new_docs} vs {new_off.n_docs}"
    for sid in shards:
        if int(sid) >= first_new_shard:
            shards[sid]["doc_lo"] = int(sid) * dps
            shards[sid]["doc_hi"] = min((int(sid) + 1) * dps, merged.n_docs)

    stats["n_docs"] += new_docs                  # REAL docs, not ID space
    stats["total_len"] += new_len
    stats["avgdl"] = stats["total_len"] / stats["n_docs"]
    stats["n_terms"] = n_terms
    stats["n_shards"] = (merged.n_docs + dps - 1) // dps
    stats["postings_bytes"] += new_bytes
    atomic_write_json(stats, os.path.join(index_dir, "stats.json"))
    digest = _offsets_digest(merged)
    manifest["offsets_digest"] = digest
    manifest["input_fingerprint"] = None         # union input: digest rules
    atomic_write_json(manifest, mpath)
    fp_path = os.path.join(index_dir, "config_fingerprint.json")
    atomic_write_json({"fingerprint": cfg.fingerprint(),
                       "input_fingerprint": None,
                       "offsets_digest": digest}, fp_path)
    return {"appended_docs": new_docs, "appended_len": new_len,
            "first_new_shard": first_new_shard,
            "n_docs": stats["n_docs"], "n_terms": n_terms,
            "avgdl": stats["avgdl"],
            "seconds": round(time.perf_counter() - t_start, 2)}
