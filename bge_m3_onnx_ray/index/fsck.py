"""Index integrity checker (``fsck``) — decode-and-verify every
postings file against the index's own invariants, the operational
complement to the digest-based snapshot verifier (``index/snapshot``
proves bytes are unchanged; fsck proves the bytes MEAN a valid index,
catching encoder bugs, partial writes that dodged the manifest, and
bit-rot that landed after a snapshot).

Per-(shard, bucket) checks run as one distributed ``map_batches`` pass
(each task decodes one file with the batch varint machinery — the
serve-actor load path, so fsck doubles as a load-path smoke test):

- the blob decodes exactly (per-term posting counts match ``df``),
- docIDs are strictly increasing per term and inside the shard's range,
- every tf >= 1 and dl >= tf,
- per-term ``cf`` equals the decoded tf sum.

Global checks reduce tiny partials on the driver: the dictionary's
(df, cf) sums equal the postings' sums per bucket, ``n_docs`` /
``total_len`` equal the doc_lens tables, and every manifest shard has
its files on disk. Returns a report dict; raises ``IndexCorruption``
listing every violation found.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray.data as rd


class IndexCorruption(RuntimeError):
    pass


def fsck_index(index_dir: str) -> dict:
    import pyarrow.parquet as pq

    from bge_m3_onnx_ray.index.artifacts import (IndexMeta, doc_lens_file,
                                                 postings_file)
    from bge_m3_onnx_ray.index.codec import decode_postings_file

    meta = IndexMeta(index_dir)
    errors: list[str] = []
    jobs = []
    for shard in meta.shards:
        if not os.path.exists(doc_lens_file(index_dir, shard)):
            errors.append(f"shard {shard}: doc_lens file missing")
        for bucket in range(meta.term_buckets):
            p = postings_file(index_dir, shard, bucket)
            if os.path.exists(p):
                jobs.append({"shard": int(shard), "bucket": int(bucket),
                             "path": p})

    bs = meta.block_size
    dps = meta.docs_per_shard

    def check_file(batch: pa.Table) -> pa.Table:
        out_rows = []
        for row in batch.to_pylist():
            errs: list[str] = []
            tag = f"shard {row['shard']} bucket {row['bucket']}"
            t = pq.read_table(row["path"])
            try:
                counts, doc_ids, tfs, dls = decode_postings_file(t, bs)
            except Exception as e:  # noqa: BLE001 — report, don't die
                out_rows.append({"err": f"{tag}: decode failed: {e}",
                                 "df": 0, "cf": 0})
                continue
            lo = row["shard"] * dps
            if len(doc_ids):
                if doc_ids.min() < lo or doc_ids.max() >= lo + dps:
                    errs.append(f"{tag}: docID outside shard range")
                if (tfs < 1).any():
                    errs.append(f"{tag}: tf < 1")
                if (dls < tfs).any():
                    errs.append(f"{tag}: dl < tf")
                starts = np.zeros(len(counts) + 1, np.int64)
                np.cumsum(counts, out=starts[1:])
                d = np.diff(doc_ids)
                brk = starts[1:-1]           # term boundaries
                inner = np.ones(len(d), bool)
                inner[brk - 1] = False       # gaps across terms: skip
                if (d[inner] <= 0).any():
                    errs.append(f"{tag}: docIDs not strictly increasing")
                cf = np.add.reduceat(tfs, starts[:-1]) \
                    if len(counts) else np.empty(0, np.int64)
                cf[counts == 0] = 0
                if not np.array_equal(cf, t.column("cf").to_numpy()):
                    errs.append(f"{tag}: cf != decoded tf sum")
            out_rows.append({
                "err": "; ".join(errs),
                "df": int(counts.sum()),
                "cf": int(tfs.sum()) if len(doc_ids) else 0})
        return pa.Table.from_pylist(
            out_rows, schema=pa.schema([("err", pa.string()),
                                        ("df", pa.int64()),
                                        ("cf", pa.int64())]))

    checked = rd.from_items(jobs).map_batches(
        check_file, batch_format="pyarrow", batch_size=1).to_pandas() \
        if jobs else None
    post_df = post_cf = 0
    if checked is not None:
        errors.extend(e for e in checked["err"] if e)
        post_df = int(checked["df"].sum())
        post_cf = int(checked["cf"].sum())

    # dictionary totals vs postings totals
    dict_dir = os.path.join(index_dir, "dictionary")
    dict_df = dict_cf = 0
    for f in sorted(os.listdir(dict_dir)):
        t = pq.read_table(os.path.join(dict_dir, f))
        dict_df += int(pa.compute.sum(t.column("df")).as_py() or 0)
        dict_cf += int(pa.compute.sum(t.column("cf")).as_py() or 0)
    if dict_df != post_df:
        errors.append(f"dictionary df sum {dict_df} != postings {post_df}")
    if dict_cf != post_cf:
        errors.append(f"dictionary cf sum {dict_cf} != postings {post_cf}")

    # doc_lens vs stats
    n_docs = total_len = 0
    for shard in meta.shards:
        p = doc_lens_file(index_dir, shard)
        if os.path.exists(p):
            t = pq.read_table(p)
            n_docs += t.num_rows
            total_len += int(pa.compute.sum(t.column("dl")).as_py() or 0)
    if n_docs != meta.n_docs:
        errors.append(f"stats n_docs {meta.n_docs} != doc_lens {n_docs}")
    if total_len != meta.total_len:
        errors.append(f"stats total_len {meta.total_len} "
                      f"!= doc_lens {total_len}")

    report = {"n_shards": len(meta.shards), "n_postings_files": len(jobs),
              "postings_df": post_df, "postings_cf": post_cf,
              "n_docs": n_docs, "errors": errors}
    if errors:
        raise IndexCorruption("; ".join(errors))
    return report
