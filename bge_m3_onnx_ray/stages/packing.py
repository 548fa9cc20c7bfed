"""Sequence packing: assign every document a (pack_id, pack_offset)
under a fixed token budget per pack — the layout step of LLM training
pipelines that concatenate documents into fixed-length training
sequences (documented publicly for GPT-style pretraining; documents
are laid head-to-tail in a deterministic order and split at sequence
boundaries).

Semantics (the SQL-expressible "pack with splitting" variant): documents
are ordered by ``doc_id``; ``start_offset(d)`` = total tokens of all
earlier documents; ``pack_id = start_offset // budget`` and
``pack_offset = start_offset % budget``. A document longer than the
budget simply spans packs (the trainer splits at pack boundaries) —
greedy no-split bin packing is inherently sequential and NOT computed
here.

Distribution (the 100-TB shape — a distributed prefix sum, the same
two-level pattern as the index's ConvOffsets docID assignment,
``index/build.py``):

1. one vectorized ``map_batches`` computes per-doc token counts;
2. per-doc rows shuffle ONCE on a coarse ``doc_id // bucket_docs`` key
   (16 bytes/row); per-bucket token sums are tiny;
3. the driver prefix-sums the per-bucket totals (one array of
   n_docs / bucket_docs entries — ~25k entries at 10^11 docs) and
   broadcasts the bucket start offsets;
4. each bucket group sorts its rows by doc_id, local-cumsums, and adds
   its bucket's start offset.

Step 3 is the only driver-resident state and shrinks with
``bucket_docs``; every other step is columnar.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from bge_m3_onnx_ray.stages._pool import task_stage
from bge_m3_onnx_ray.stages.text import TokenCount


def pack_sequences(ds: rd.Dataset, budget: int = 256,
                   bucket_docs: int = 4096) -> rd.Dataset:
    """(doc_id, n_tokens, pack_id, pack_offset) under ``budget`` tokens
    per pack, documents laid out in ascending-``doc_id`` order."""
    import ray

    counts = ds.select_columns(["doc_id", "text"]).map_batches(
        task_stage(TokenCount), batch_format="pyarrow", batch_size=4096)

    def add_bucket(t: pa.Table) -> pa.Table:
        b = t.column("doc_id").to_numpy() // bucket_docs
        return t.append_column("bucket", pa.array(b, pa.int64()))

    keyed = counts.map_batches(add_bucket, batch_format="pyarrow")

    # per-bucket totals -> driver prefix sum (tiny: n_docs / bucket_docs)
    from bge_m3_onnx_ray.stages._groups import bucket_reduce
    totals = bucket_reduce(keyed.select_columns(["bucket", "n_tokens"]),
                           ["bucket"], [("n_tokens", "sum", "total")]) \
        .to_pandas().sort_values("bucket")
    buckets = totals["bucket"].to_numpy()
    starts = np.zeros(len(buckets), np.int64)
    np.cumsum(totals["total"].to_numpy()[:-1], out=starts[1:])
    start_of = ray.put(dict(zip(buckets.tolist(), starts.tolist())))

    def assign(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        smap = ray.get(start_of)
        order = pc.sort_indices(group, sort_keys=[("doc_id", "ascending")])
        g = group.take(order)
        n = g.column("n_tokens").to_numpy()
        doc = g.column("doc_id").to_numpy()
        off = np.zeros(len(n), np.int64)
        np.cumsum(n[:-1], out=off[1:])
        off += smap[int(doc[0] // bucket_docs)]
        return pa.table({
            "doc_id": pa.array(doc, pa.int64()),
            "n_tokens": pa.array(n.astype(np.int64), pa.int64()),
            "pack_id": pa.array(off // budget, pa.int64()),
            "pack_offset": pa.array(off % budget, pa.int64()),
        })

    return keyed.groupby("bucket").map_groups(assign, batch_format="pyarrow")
