"""Distributed inverted-index build — the Ray-Data-native re-expression
of the reference's tokenize→extract pipeline
(``samples/python/bge_m3_embedder.py:100-155``) at corpus scale.

Pipeline (SURVEY.md §3.2):

    read_parquet(transcripts, columns=[conv_id, turn_idx, text])
      → [pass A] partial per-batch conv aggregation → groupby(conv_id)
        → driver prefix-sum → ConvOffsets (stable docIDs)
      → [pass B] map_batches(TokenizePostings actor pool, pyarrow,
        zero_copy): SPIMI stage emitting (term, doc_id, tf, dl, gkey)
      → groupby(gkey).map_groups(encode+write): THE one wide shuffle;
        gkey = shard * (B+1) + bucket, i.e. postings are co-partitioned
        by (docID-range shard, term-hash bucket)
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
from ray.data.aggregate import Max, Min, Sum

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
from bge_m3_onnx_ray.index.codec import encode_postings
from bge_m3_onnx_ray.tokenizer import DeterministicTokenizer

_POSTROW_SCHEMA = pa.schema([
    ("term", pa.string()),
    ("doc_id", pa.int64()),
    ("tf", pa.int32()),
    ("dl", pa.int32()),
    ("gkey", pa.int64()),
])


def term_bucket(terms: np.ndarray, n_buckets: int) -> np.ndarray:
    """Deterministic term→bucket hash (crc32; NEVER Python ``hash`` — it is
    per-process salted and would scatter a term across buckets)."""
    codes, uniques = pd.factorize(terms, sort=False)
    ub = np.fromiter((zlib.crc32(u.encode()) % n_buckets for u in uniques),
                     np.int64, len(uniques))
    return ub[codes]


def _conv_partial(batch: pa.Table) -> pa.Table:
    g = batch.group_by("conv_id").aggregate(
        [("turn_idx", "count"), ("turn_idx", "min"), ("turn_idx", "max")])
    return g.rename_columns(["conv_id", "n", "min_t", "max_t"])


def compute_conv_offsets(ds: rd.Dataset) -> ConvOffsets:
    """Pass A: stable docID assignment. Pre-aggregated per batch so the
    groupby shuffles one row per (conv, batch), not one per turn."""
    partials = ds.select_columns(["conv_id", "turn_idx"]).map_batches(
        _conv_partial, batch_format="pyarrow", batch_size=65536)
    agg = partials.groupby("conv_id").aggregate(
        Sum("n", alias_name="n"),
        Min("min_t", alias_name="min_t"),
        Max("max_t", alias_name="max_t"))
    pdf = agg.to_pandas().sort_values("conv_id").reset_index(drop=True)
    counts = pdf["n"].to_numpy(np.int64)
    starts = np.zeros(len(counts), np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    dense = (pdf["min_t"].to_numpy() == 0) & \
            (pdf["max_t"].to_numpy(np.int64) == counts - 1)
    nondense: dict[str, dict[int, int]] = {}
    if not dense.all():
        bad = set(pdf["conv_id"][~dense])
        # rare path: collect the offending convs' turn indices and rank them
        sub = ds.select_columns(["conv_id", "turn_idx"]) \
                .filter(lambda r: r["conv_id"] in bad) \
                .to_pandas()
        for c, g in sub.groupby("conv_id"):
            ts = sorted(g["turn_idx"].tolist())
            nondense[c] = {int(t): i for i, t in enumerate(ts)}
    return ConvOffsets(pdf["conv_id"].to_numpy(dtype=object), starts, counts, nondense)


class TokenizePostings:
    """SPIMI stage (stateful actor pool). Per batch: docIDs from the
    broadcast offsets, tokenize (vectorized, §tokenizer), per-doc tf
    counts, shard/bucket keys. Setup cost (offsets ``ray.get``) is paid
    once per actor — the reference's load-sessions-in-``__init__``
    pattern (``samples/python/bge_m3_embedder.py:36-50``)."""

    def __init__(self, offsets_ref, docs_per_shard: int, term_buckets: int,
                 done_shards: tuple[int, ...] = ()):
        import ray
        self.offsets: ConvOffsets = ray.get(offsets_ref) \
            if not isinstance(offsets_ref, ConvOffsets) else offsets_ref
        self.tok = DeterministicTokenizer()
        self.docs_per_shard = docs_per_shard
        self.nb = term_buckets
        self.done = np.array(sorted(done_shards), np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        conv = np.asarray(batch.column("conv_id").to_pylist(), dtype=object)
        turn = batch.column("turn_idx").to_numpy()
        doc_ids = self.offsets.doc_ids_for(conv, turn)
        shard = doc_ids // self.docs_per_shard
        if len(self.done):
            keep = ~np.isin(shard, self.done)
            if not keep.any():
                return _POSTROW_SCHEMA.empty_table()
            doc_ids, shard = doc_ids[keep], shard[keep]
            texts = np.asarray(batch.column("text").to_pylist(), dtype=object)[keep]
        else:
            texts = batch.column("text").to_pylist()
        doc_idx, terms, tfs, doc_lens = self.tok.batch_term_counts(texts)
        stride = self.nb + 1
        # posting rows
        p_doc = doc_ids[doc_idx]
        p_shard = shard[doc_idx]
        p_bucket = term_bucket(terms, self.nb) if len(terms) else np.empty(0, np.int64)
        p_gkey = p_shard * stride + p_bucket + 1
        # one doc-length row per document (term "", bucket -1): becomes the
        # per-shard doc_lens table + corpus stats at merge time
        d_gkey = shard * stride
        n_p, n_d = len(p_doc), len(doc_ids)
        return pa.table({
            "term": pa.array(np.concatenate([terms, np.full(n_d, "", object)]), pa.string()),
            "doc_id": pa.array(np.concatenate([p_doc, doc_ids]), pa.int64()),
            "tf": pa.array(np.concatenate([tfs, doc_lens]).astype(np.int32), pa.int32()),
            "dl": pa.array(np.concatenate([doc_lens[doc_idx] if n_p else np.empty(0, np.int32),
                                           doc_lens]).astype(np.int32), pa.int32()),
            "gkey": pa.array(np.concatenate([p_gkey, d_gkey]), pa.int64()),
        })


_META_SCHEMA = pa.schema([
    ("kind", pa.string()), ("shard", pa.int64()), ("bucket", pa.int64()),
    ("n_docs", pa.int64()), ("total_len", pa.int64()),
    ("n_terms", pa.int64()), ("nbytes", pa.int64()), ("file", pa.string()),
])


def _manifest_entry_file(index_dir: str, shard: int, bucket: int) -> str:
    return os.path.join(index_dir, "_manifest", f"shard-{shard:05d}-bucket-{bucket:+03d}.json")


def make_encode_group_fn(index_dir: str, cfg: IndexConfig):
    stride = cfg.term_buckets + 1
    block_size = cfg.block_size

    def encode_group(group: pa.Table) -> pa.Table:
        gkey = int(group.column("gkey")[0].as_py())
        shard, bucket = gkey // stride, gkey % stride - 1
        doc_id = group.column("doc_id").to_numpy()
        if bucket == -1:  # doc-length rows → per-shard doc table slice
            order = np.argsort(doc_id, kind="stable")
            dl = group.column("dl").to_numpy()[order]
            t = pa.table({"doc_id": pa.array(doc_id[order], pa.int64()),
                          "dl": pa.array(dl.astype(np.int32), pa.int32())})
            path = doc_lens_file(index_dir, shard)
            nbytes = atomic_write_parquet(t, path)
            entry = {"kind": "doc_lens", "shard": shard, "bucket": -1,
                     "n_docs": len(dl), "total_len": int(dl.sum()),
                     "n_terms": 0, "nbytes": nbytes, "file": path}
        else:
            terms = np.asarray(group.column("term").to_pylist(), dtype=object)
            tf = group.column("tf").to_numpy()
            dl = group.column("dl").to_numpy()
            codes, uniques = pd.factorize(terms, sort=True)
            order = np.lexsort((doc_id, codes))
            codes, doc_id, tf, dl = codes[order], doc_id[order], tf[order], dl[order]
            bounds = np.concatenate([[0], np.flatnonzero(np.diff(codes)) + 1, [len(codes)]])
            rows = {k: [] for k in ("term", "df", "cf", "n_blocks", "last_ids",
                                    "max_tf", "min_dl", "offs", "blob")}
            for ti in range(len(uniques)):
                s, e = bounds[ti], bounds[ti + 1]
                enc = encode_postings(doc_id[s:e], tf[s:e], dl[s:e], block_size)
                rows["term"].append(uniques[ti])
                rows["df"].append(e - s)
                rows["cf"].append(int(tf[s:e].sum()))
                rows["n_blocks"].append(len(enc.last_ids))
                rows["last_ids"].append(enc.last_ids)
                rows["max_tf"].append(enc.max_tf)
                rows["min_dl"].append(enc.min_dl)
                rows["offs"].append(enc.offs)
                rows["blob"].append(enc.blob)
            t = pa.Table.from_pydict(rows, schema=POSTINGS_SCHEMA)
            path = postings_file(index_dir, shard, bucket)
            nbytes = atomic_write_parquet(t, path)
            dp = pa.table({"term": pa.array(rows["term"], pa.string()),
                           "df": pa.array(rows["df"], pa.int64()),
                           "cf": pa.array(rows["cf"], pa.int64())})
            atomic_write_parquet(dp, dict_partial_file(index_dir, shard, bucket))
            entry = {"kind": "postings", "shard": shard, "bucket": bucket,
                     "n_docs": 0, "total_len": 0, "n_terms": len(uniques),
                     "nbytes": nbytes, "file": path}
        atomic_write_json(entry, _manifest_entry_file(index_dir, shard, bucket))
        return pa.Table.from_pylist([entry], schema=_META_SCHEMA)

    return encode_group


def _merge_dictionary(index_dir: str, n_buckets: int) -> int:
    """Pass C: per-bucket df/cf merge. No shuffle — the partial files are
    already partitioned by term-hash bucket, so each bucket task reads
    only its own shard partials. Returns vocabulary size."""

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
    entries AND the files they point at exist."""
    entries = glob.glob(os.path.join(index_dir, "_manifest", "shard-*.json"))
    by_shard: dict[int, set[int]] = {}
    for p in entries:
        try:
            with open(p) as f:
                e = json.load(f)
        except (json.JSONDecodeError, OSError):
            continue
        if os.path.exists(e["file"]):
            by_shard.setdefault(e["shard"], set()).add(e["bucket"])
    want = set(range(-1, cfg.term_buckets))
    return {s for s, got in by_shard.items() if got == want}


def build_index(transcripts, index_dir: str, cfg: IndexConfig | None = None,
                resume: bool = True) -> dict:
    """Build the index; returns build metrics. ``transcripts`` is a parquet
    path/dir or a ``ray.data.Dataset`` with the input_hint schema.

    Resumable: re-running after a partial build skips shards whose
    per-group manifest entries are complete and reproduces byte-identical
    artifacts for the rest (deterministic encode + atomic writes).
    """
    cfg = cfg or IndexConfig()
    if isinstance(transcripts, str):
        ds = rd.read_parquet(transcripts, columns=["conv_id", "turn_idx", "text"])
    else:
        ds = transcripts.select_columns(["conv_id", "turn_idx", "text"])

    os.makedirs(index_dir, exist_ok=True)
    fp_path = os.path.join(index_dir, "config_fingerprint.json")
    done: set[int] = set()
    offsets = None
    if resume and os.path.exists(fp_path):
        with open(fp_path) as f:
            old = json.load(f)
        if old.get("fingerprint") == cfg.fingerprint() and \
                os.path.exists(os.path.join(index_dir, "conv_offsets.parquet")):
            offsets = ConvOffsets.load(index_dir)
            done = _load_done_shards(index_dir, cfg)
    atomic_write_json({"fingerprint": cfg.fingerprint()}, fp_path)

    if offsets is None:
        offsets = compute_conv_offsets(ds)
        offsets.save(index_dir)

    import ray
    offsets_ref = ray.put(offsets)
    n_shards = (offsets.n_docs + cfg.docs_per_shard - 1) // cfg.docs_per_shard

    if len(done) < n_shards:
        post = ds.map_batches(
            TokenizePostings,
            fn_constructor_kwargs={
                "offsets_ref": offsets_ref,
                "docs_per_shard": cfg.docs_per_shard,
                "term_buckets": cfg.term_buckets,
                "done_shards": tuple(sorted(done)),
            },
            batch_format="pyarrow", zero_copy_batch=True,
            batch_size=cfg.tokenize_batch_size,
            concurrency=cfg.tokenize_concurrency, num_cpus=1)
        meta = post.groupby("gkey").map_groups(
            make_encode_group_fn(index_dir, cfg), batch_format="pyarrow")
        meta.materialize()  # drive the build; meta rows are tiny

    # consolidate per-group entries → stats + manifest (idempotent)
    shards: dict[str, dict] = {}
    total_len = 0
    n_docs = 0
    postings_bytes = 0
    for p in sorted(glob.glob(os.path.join(index_dir, "_manifest", "shard-*.json"))):
        with open(p) as f:
            e = json.load(f)
        s = shards.setdefault(str(e["shard"]), {
            "n_docs": 0, "total_len": 0, "postings_bytes": 0, "files": []})
        s["files"].append(os.path.relpath(e["file"], index_dir))
        if e["kind"] == "doc_lens":
            s["n_docs"] = e["n_docs"]
            s["total_len"] = e["total_len"]
            n_docs += e["n_docs"]
            total_len += e["total_len"]
        else:
            s["postings_bytes"] += e["nbytes"]
            postings_bytes += e["nbytes"]

    n_terms = _merge_dictionary(index_dir, cfg.term_buckets)

    stats = {
        "n_docs": n_docs, "total_len": total_len,
        "avgdl": (total_len / n_docs) if n_docs else 0.0,
        "n_terms": n_terms, "n_shards": n_shards,
        "postings_bytes": postings_bytes,
        "k1": cfg.k1, "b": cfg.b, "block_size": cfg.block_size,
        "term_buckets": cfg.term_buckets, "docs_per_shard": cfg.docs_per_shard,
        "config_fingerprint": cfg.fingerprint(),
    }
    atomic_write_json(stats, os.path.join(index_dir, "stats.json"))
    atomic_write_json({"shards": shards, "config_fingerprint": cfg.fingerprint()},
                      os.path.join(index_dir, "manifest.json"))
    assert n_docs == offsets.n_docs, \
        f"doc count mismatch: merged {n_docs} vs offsets {offsets.n_docs}"
    return {"n_docs": n_docs, "n_terms": n_terms, "n_shards": n_shards,
            "avgdl": stats["avgdl"], "postings_bytes": postings_bytes,
            "resumed_shards": len(done)}
