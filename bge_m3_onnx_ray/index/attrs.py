"""Per-shard doc-attribute artifact — the faceted-search side table.

Layout: ``index_dir/attrs/<col>/shard-SSSSS.parquet`` with columns
``(doc_id, <col>)``, doc_id-sorted, one file per index shard. Filtered
(faceted) queries load only the shard's attribute column once per scorer
actor — doc-partitioned like the postings, so no attribute data moves at
query time and adding nodes adds shards (same contract as
``index/search.py``'s partition-by-document layout).

Why a side table instead of columns in ``doc_lens``: attributes ride a
dedicated single shuffle keyed by shard (small rows: doc_id + attribute),
so the hot postings exchange of the build is untouched, and new facets
can be added to an EXISTING index without rebuilding it — the 100 TB
operational shape (re-index never; re-derive side tables freely).

The reference has no index and no metadata filters; this extends its
sparse-retrieval data model (SURVEY.md §2.4) the way every production
fulltext engine does (Lucene doc values).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from bge_m3_onnx_ray.index.artifacts import (ConvOffsets, IndexMeta,
                                             atomic_write_parquet)


def attrs_file(index_dir: str, col: str, shard: int) -> str:
    return os.path.join(index_dir, "attrs", col, f"shard-{shard:05d}.parquet")


def has_doc_attrs(index_dir: str, col: str) -> bool:
    d = os.path.join(index_dir, "attrs", col)
    return os.path.isdir(d) and bool(os.listdir(d))


def build_doc_attrs(ds: rd.Dataset, index_dir: str, col: str) -> int:
    """Derive the per-shard attribute table for ``col`` from the corpus
    dataset (same (conv_id, turn_idx) keying as the index build). One
    map stage (docID assignment from the broadcast offsets) + ONE shuffle
    keyed by shard, whose groups are written atomically — resumable by
    rerun (deterministic bytes, os.replace). Returns the number of shard
    files written."""
    from bge_m3_onnx_ray.index.build import get_broadcast

    meta = IndexMeta(index_dir)
    offsets = ConvOffsets.load(index_dir)
    dps = meta.docs_per_shard
    ref = ray.put(offsets)

    def assign(batch: pa.Table) -> pa.Table:
        off = get_broadcast(ref)
        doc_ids = off.doc_ids_for(batch.column("conv_id").combine_chunks(),
                                  batch.column("turn_idx").to_numpy())
        src = batch.column(col)
        # numeric attributes keep their type (range filters need ordered
        # predicate pushdown); everything else is stored as string
        if not (pa.types.is_integer(src.type) or pa.types.is_floating(src.type)):
            src = src.cast(pa.string())
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            col: src,
            "shard": pa.array(doc_ids // dps, pa.int64()),
        })

    def write_shard(group: pa.Table) -> pa.Table:
        shard = int(group.column("shard")[0].as_py())
        t = group.sort_by("doc_id").select(["doc_id", col])
        nbytes = atomic_write_parquet(t, attrs_file(index_dir, col, shard))
        return pa.table({"shard": pa.array([shard], pa.int64()),
                         "n_docs": pa.array([t.num_rows], pa.int64()),
                         "bytes": pa.array([nbytes], pa.int64())})

    out = ds.select_columns(["conv_id", "turn_idx", col]) \
        .map_batches(assign, batch_format="pyarrow") \
        .groupby("shard").map_groups(write_shard, batch_format="pyarrow") \
        .materialize()
    return out.count()


def load_allowed_docs(index_dir: str, col: str, shard: int,
                      value: str) -> np.ndarray:
    """Sorted docID array of the shard's docs with ``attr == value`` —
    the per-shard facet mask a scorer actor caches. A missing shard file
    means the shard has no rows with the attribute (empty mask)."""
    import pyarrow.parquet as pq
    path = attrs_file(index_dir, col, shard)
    try:
        t = pq.read_table(path, columns=["doc_id", col],
                          filters=[(col, "=", value)])
    except (FileNotFoundError, OSError):
        return np.empty(0, np.int64)
    return t.column("doc_id").to_numpy().astype(np.int64)


def load_attr_values(index_dir: str, col: str, shard: int
                     ) -> tuple[np.ndarray, list]:
    """(sorted docIDs, attr value per doc) for one shard's side table —
    the function-score loader (QueryConfig.weight_attr). A missing
    shard file means no attributed docs (empty arrays). The attrs files
    are written in ascending-docID order (build_doc_attrs), which the
    scorer's searchsorted lookup relies on."""
    import pyarrow.parquet as pq
    path = attrs_file(index_dir, col, shard)
    try:
        t = pq.read_table(path, columns=["doc_id", col])
    except (FileNotFoundError, OSError):
        return np.empty(0, np.int64), []
    return (t.column("doc_id").to_numpy().astype(np.int64),
            t.column(col).to_pylist())


def load_allowed_docs_range(index_dir: str, col: str, shard: int,
                            lo, hi) -> np.ndarray:
    """Sorted docID array of the shard's docs with ``lo <= attr <= hi``
    (inclusive both ends — SQL BETWEEN semantics) — the numeric-range
    facet mask. Predicate pushdown skips row groups whose min/max stats
    fall outside the range, so at scale a narrow range reads a fraction
    of the side table."""
    import pyarrow.parquet as pq
    path = attrs_file(index_dir, col, shard)
    try:
        t = pq.read_table(path, columns=["doc_id", col],
                          filters=[(col, ">=", lo), (col, "<=", hi)])
    except (FileNotFoundError, OSError):
        return np.empty(0, np.int64)
    return t.column("doc_id").to_numpy().astype(np.int64)
