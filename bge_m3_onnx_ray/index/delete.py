"""Document deletion — tombstones over an immutable index.

Lucene's live-docs model (public knowledge; no reference analogue — the
reference embedder has no index lifecycle): a delete does NOT rewrite
postings. It appends the doc's global docID to a sorted side file
(``tombstones.parquet``); the scorers exclude tombstoned docIDs from
every candidate set, while the global statistics (N, avgdl, df) keep
their as-built values until the next compaction — exactly how Lucene
scores against segments with deletions. ``compact_index`` drops the
tombstoned documents physically and recomputes the statistics, after
which the artifacts are byte-identical to a fresh build over the
surviving corpus (gated in tests/test_delete.py).

Scale notes: the tombstone file is a single sorted int64 column, so a
scorer loads only its shard's docID range via row-group predicate
pushdown — the same access pattern as the attrs side tables; a 10⁹-doc
index with 1% deletions reads ~80 KB per shard, never the whole file.
Writes are read-union-replace through an atomic rename: one writer at a
time (the same single-writer contract the build manifest has).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def tombstones_file(index_dir: str) -> str:
    return os.path.join(index_dir, "tombstones.parquet")


def load_tombstones(index_dir: str) -> np.ndarray:
    """All tombstoned global docIDs, sorted (empty array if none)."""
    p = tombstones_file(index_dir)
    if not os.path.exists(p):
        return np.empty(0, np.int64)
    return pq.read_table(p, columns=["doc_id"]).column("doc_id").to_numpy()


def load_tombstones_range(index_dir: str, lo: int, hi: int) -> np.ndarray:
    """Tombstoned docIDs in [lo, hi) — predicate-pushdown read so a
    scorer touches only its shard's row groups."""
    p = tombstones_file(index_dir)
    if not os.path.exists(p):
        return np.empty(0, np.int64)
    t = pq.read_table(p, columns=["doc_id"],
                      filters=[("doc_id", ">=", lo), ("doc_id", "<", hi)])
    return t.column("doc_id").to_numpy()


def delete_docs(index_dir: str, doc_ids) -> dict:
    """Tombstone global docIDs (idempotent: re-deleting is a no-op).
    Raises on out-of-range ids — a silent accept would hide a caller
    bug where conv-relative ids leak in."""
    import json
    with open(os.path.join(index_dir, "stats.json")) as f:
        n_docs = json.load(f)["n_docs"]
    ids = np.unique(np.asarray(list(doc_ids), np.int64))
    if len(ids) and (ids[0] < 0 or ids[-1] >= n_docs):
        raise ValueError(
            f"docIDs out of range [0, {n_docs}): {ids[0]}..{ids[-1]}")
    prev = load_tombstones(index_dir)
    merged = np.union1d(prev, ids)
    p = tombstones_file(index_dir)
    tmp = p + ".tmp"
    pq.write_table(pa.table({"doc_id": pa.array(merged, pa.int64())}), tmp,
                   row_group_size=65536)
    os.replace(tmp, p)
    return {"n_tombstones": int(len(merged)),
            "n_new": int(len(merged) - len(prev))}


def delete_by_query(index_dir: str, query_text: str) -> dict:
    """Tombstone every live document matching the query (OR semantics —
    any query term; the Elasticsearch ``_delete_by_query`` shape). The
    match set comes from the same per-shard candidate machinery the
    aggregations use (``index.facets.matching_docs``), streamed and
    tombstoned in one pass; subsequent searches exclude the docs under
    the standard live-docs semantics until compaction drops them."""
    from bge_m3_onnx_ray.index.facets import matching_docs
    m = matching_docs(index_dir, [(0, query_text)])
    ids: list[int] = []
    for b in m.iter_batches(batch_format="pyarrow"):
        ids.extend(b.column("doc_id").to_pylist())
    if not ids:
        return {"n_matched": 0, "n_new": 0,
                "n_tombstones": int(len(load_tombstones(index_dir)))}
    out = delete_docs(index_dir, ids)
    out["n_matched"] = len(set(ids))
    return out


def delete_convs(index_dir: str, conv_ids) -> dict:
    """Tombstone every turn of the given conversations (whole-document
    deletion in the multi-turn model — the granularity compaction can
    always drop)."""
    from bge_m3_onnx_ray.index.artifacts import ConvOffsets
    off = ConvOffsets.load(index_dir)
    want = pa.array(sorted(set(map(str, conv_ids))), pa.string())
    pos = pc.index_in(want, value_set=off._conv_arrow)
    if pos.null_count:
        missing = [w.as_py() for w, i in zip(want, pos) if not i.is_valid]
        raise KeyError(f"conv_ids not in index: {missing[:5]}")
    idx = pos.to_numpy(zero_copy_only=False).astype(np.int64)
    ids = np.concatenate([
        np.arange(off.starts[i], off.starts[i] + off.counts[i],
                  dtype=np.int64) for i in idx]) if len(idx) else \
        np.empty(0, np.int64)
    return delete_docs(index_dir, ids)
