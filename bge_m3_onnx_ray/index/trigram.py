"""Trigram substring index: grep-style ``contains`` search over raw
text at corpus scale — the pg_trgm / Google-Code-Search design
(Cox, "Regular Expression Matching with a Trigram Index", public).

Tokenized inverted indexes cannot answer substring queries that cross
token boundaries ("er sort" spans two words). The trigram index can:
every document is decomposed into its distinct byte trigrams
(UTF-8-safe: a UTF-8 substring match is exactly a byte substring
match), a query pattern needs ALL of its trigrams present, so the
candidate set is the intersection of a handful of posting lists and is
then verified exactly against the stored text — false positives are
filtered, false negatives are impossible.

Layout::

    <dir>/tri-bucket-BB.parquet    (tri:int32, doc_ids:list<int64>)
    <dir>/trigram_manifest.json    n_docs + buckets (resume/validity)

Build is one ``map_batches`` (vectorized byte-window extraction — no
per-document Python loop) + ONE ``groupby(bucket)`` shuffle whose
groups write atomically, the same shape as the attrs/positions builds.
Trigrams are packed into an int32 (3 bytes), so the exchange moves
12 bytes per distinct (doc, trigram). At 100 TB you would additionally
shard buckets by doc range (the postings build's gkey pattern);
single-level bucketing is documented as the small-corpus layout.

Query: per-pattern candidate generation is a predicate-pushdown read
of the pattern's trigram rows (``tri IN (...)`` hits only the pattern's
buckets) + sorted-array intersections; verification is a distributed
``map_batches`` over only the candidate rows (row-group pushdown on
doc_id), with the exact match done by ``pyarrow.compute.match_substring``.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import ray.data as rd

from bge_m3_onnx_ray.index.artifacts import atomic_write_json, \
    atomic_write_parquet


def tri_file(tri_dir: str, bucket: int) -> str:
    return os.path.join(tri_dir, f"tri-bucket-{bucket:02d}.parquet")


def _pack_trigrams(texts: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(packed int32 trigram, row index) pairs — DISTINCT per row — for
    a lowercased string array, via numpy byte windows (no Python loop)."""
    import pyarrow.compute as pc
    arr = pc.utf8_lower(texts)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    # normalize offsets for a possibly-sliced array
    off_dtype = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    offs = np.frombuffer(arr.buffers()[1], off_dtype)[
        arr.offset:arr.offset + len(arr) + 1].astype(np.int64)
    buf = np.frombuffer(arr.buffers()[2], np.uint8)
    lens = np.diff(offs)
    counts = np.maximum(lens - 2, 0)
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    cum = np.zeros(len(counts), np.int64)
    np.cumsum(counts[:-1], out=cum[1:])
    starts = np.repeat(offs[:-1] - cum, counts) + np.arange(total)
    tri = (buf[starts].astype(np.int64) << 16) \
        | (buf[starts + 1].astype(np.int64) << 8) | buf[starts + 2]
    row = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    upair = np.unique(row << 24 | tri)      # distinct per row
    return upair & 0xFFFFFF, upair >> 24


def pattern_trigrams(pattern: str) -> np.ndarray:
    """Distinct packed trigrams of a (lowercased) pattern; raises under
    3 bytes — a 1–2 byte pattern has no trigram and would need a full
    scan (pg_trgm documents the same restriction)."""
    b = pattern.lower().encode("utf-8")
    if len(b) < 3:
        raise ValueError(f"substring pattern {pattern!r} shorter than 3 "
                         "bytes: no trigram to index on")
    a = np.frombuffer(b, np.uint8).astype(np.int64)
    return np.unique((a[:-2] << 16) | (a[1:-1] << 8) | a[2:])


def build_trigram_index(ds: rd.Dataset, tri_dir: str,
                        n_buckets: int = 16) -> int:
    """Build the trigram index for a (doc_id, text) dataset. Returns the
    number of bucket files written. Idempotent per (n_docs, buckets) via
    the manifest."""
    man = os.path.join(tri_dir, "trigram_manifest.json")

    def extract(t: pa.Table) -> pa.Table:
        tri, row = _pack_trigrams(t.column("text"))
        doc = t.column("doc_id").to_numpy()[row]
        return pa.table({
            "tri": pa.array(tri.astype(np.int32), pa.int32()),
            "bucket": pa.array(tri % n_buckets, pa.int64()),
            "doc_id": pa.array(doc, pa.int64()),
        })

    def write_bucket(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        b = int(group.column("bucket")[0].as_py())
        g = group.take(pc.sort_indices(group, sort_keys=[
            ("tri", "ascending"), ("doc_id", "ascending")]))
        tri = g.column("tri").to_numpy()
        docs = g.column("doc_id").to_numpy()
        brk = np.empty(len(tri), bool)
        if len(tri):
            brk[0] = True
            brk[1:] = tri[1:] != tri[:-1]
        bounds = np.flatnonzero(brk)
        sizes = np.diff(np.concatenate([bounds, [len(tri)]]))
        t = pa.table({
            "tri": pa.array(tri[bounds], pa.int32()),
            "doc_ids": pa.ListArray.from_arrays(
                pa.array(np.concatenate([[0], np.cumsum(sizes)]),
                         pa.int32()),
                pa.array(docs, pa.int64())),
        })
        nbytes = atomic_write_parquet(t, tri_file(tri_dir, b))
        return pa.table({"bucket": pa.array([b], pa.int64()),
                         "bytes": pa.array([nbytes], pa.int64())})

    n_docs = ds.count()
    if os.path.exists(man):
        with open(man) as f:
            got = json.load(f)
        if got.get("n_docs") == n_docs and got.get("buckets") == n_buckets:
            return 0
    os.makedirs(tri_dir, exist_ok=True)
    out = ds.select_columns(["doc_id", "text"]) \
        .map_batches(extract, batch_format="pyarrow") \
        .groupby("bucket").map_groups(write_bucket, batch_format="pyarrow") \
        .materialize()
    n = out.count()
    atomic_write_json({"n_docs": n_docs, "buckets": n_buckets}, man)
    return n


def substring_candidates(tri_dir: str, pattern: str,
                         n_buckets: int = 16) -> np.ndarray:
    """Sorted doc_ids containing ALL trigrams of ``pattern`` (a superset
    of the true substring matches). One predicate-pushdown read per
    bucket touched by the pattern's trigrams."""
    import pyarrow.parquet as pq
    tris = pattern_trigrams(pattern)
    by_bucket: dict[int, list[int]] = {}
    for t in tris.tolist():
        by_bucket.setdefault(int(t % n_buckets), []).append(int(t))
    cand: np.ndarray | None = None
    for b, ts in sorted(by_bucket.items()):
        try:
            tab = pq.read_table(tri_file(tri_dir, b),
                                filters=[("tri", "in", ts)])
        except (FileNotFoundError, OSError):
            return np.empty(0, np.int64)
        found = {int(t): i for i, t in
                 enumerate(tab.column("tri").to_pylist())}
        for t in ts:
            i = found.get(t)
            if i is None:           # trigram absent anywhere: no matches
                return np.empty(0, np.int64)
            docs = np.asarray(tab.column("doc_ids")[i].as_py(), np.int64)
            cand = docs if cand is None else \
                np.intersect1d(cand, docs, assume_unique=True)
            if cand is not None and len(cand) == 0:
                return cand
    return cand if cand is not None else np.empty(0, np.int64)


class _VerifySubstring:
    """Exact verification: for a batch of (pattern_id, doc_id) candidate
    rows, read those docs' text (row-group pushdown) and keep true
    substring matches (case-insensitive, like the candidate step)."""

    def __init__(self, corpus_path: str, patterns: dict[int, str]):
        self.corpus_path = corpus_path
        self.patterns = {int(k): v.lower() for k, v in patterns.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        import pyarrow.dataset as pads
        doc = batch.column("doc_id").to_numpy()
        pid = batch.column("pattern_id").to_numpy()
        if not len(doc):
            return pa.table({"pattern_id": pa.array([], pa.int64()),
                             "doc_id": pa.array([], pa.int64())})
        dset = pads.dataset(self.corpus_path, format="parquet")
        t = dset.to_table(filter=pads.field("doc_id").isin(
            np.unique(doc).tolist()), columns=["doc_id", "text"])
        text_by_doc = dict(zip(t.column("doc_id").to_pylist(),
                               range(t.num_rows)))
        lower = pc.utf8_lower(t.column("text").combine_chunks())
        keep_p, keep_d = [], []
        for p in np.unique(pid):
            mask = pid == p
            rows = [text_by_doc[d] for d in doc[mask]]
            sub = lower.take(pa.array(rows))
            hit = pc.match_substring(sub, self.patterns[int(p)])
            hits = doc[mask][np.asarray(hit.to_numpy(zero_copy_only=False))]
            keep_p.extend([int(p)] * len(hits))
            keep_d.extend(hits.tolist())
        return pa.table({"pattern_id": pa.array(keep_p, pa.int64()),
                         "doc_id": pa.array(keep_d, pa.int64())})


def substring_search(tri_dir: str, corpus_path: str,
                     patterns: list[tuple[int, str]],
                     n_buckets: int = 16) -> rd.Dataset:
    """(pattern_id, doc_id) rows for docs whose text CONTAINS each
    pattern (case-insensitive). Candidates from the trigram index,
    verified exactly against the corpus in a distributed stage."""
    rows = []
    for pid, pat in patterns:
        for d in substring_candidates(tri_dir, pat, n_buckets).tolist():
            rows.append({"pattern_id": int(pid), "doc_id": int(d)})
    if not rows:
        return rd.from_arrow(pa.table({
            "pattern_id": pa.array([], pa.int64()),
            "doc_id": pa.array([], pa.int64())}))
    return rd.from_items(rows).map_batches(
        _VerifySubstring,
        fn_constructor_kwargs={"corpus_path": corpus_path,
                               "patterns": dict(patterns)},
        batch_format="pyarrow", concurrency=(1, 8), num_cpus=1,
        batch_size=8192)
