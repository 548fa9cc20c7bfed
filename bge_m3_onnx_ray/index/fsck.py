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


def fsck_positions(index_dir: str) -> dict:
    """Integrity check for the positional artifact, cross-verified
    against the lexical postings: for every (shard, bucket) the two
    files share the same term-bucket function, so one task decodes both
    and asserts that each term's occurrence DOC SET equals its postings
    docIDs and that each (term, doc) occurrence COUNT equals its tf —
    the strongest invariant the two artifacts share (phrase tf is
    derived data; raw position counts are not). Also checks per-doc
    position strict monotonicity. Raises IndexCorruption."""
    import pyarrow.parquet as pq

    from bge_m3_onnx_ray.index.artifacts import IndexMeta, postings_file
    from bge_m3_onnx_ray.index.codec import decode_postings_file
    from bge_m3_onnx_ray.index.positions import (decode_occ_rows,
                                                 positions_file)

    meta = IndexMeta(index_dir)
    jobs = []
    for shard in meta.shards:
        for bucket in range(meta.term_buckets):
            p = positions_file(index_dir, shard, bucket)
            q = postings_file(index_dir, shard, bucket)
            if os.path.exists(p):
                jobs.append({"shard": int(shard), "bucket": int(bucket),
                             "pos_path": p,
                             "post_path": q if os.path.exists(q) else ""})
    bs = meta.block_size

    def check(batch: pa.Table) -> pa.Table:
        errs_out = []
        for row in batch.to_pylist():
            tag = f"positions shard {row['shard']} bucket {row['bucket']}"
            errs: list[str] = []
            t = pq.read_table(row["pos_path"])
            ns = t.column("n").to_numpy().astype(np.int64)
            bc = t.column("blob").combine_chunks()
            off_dtype = np.int64 if pa.types.is_large_binary(bc.type) \
                else np.int32
            boffs = np.frombuffer(bc.buffers()[1], off_dtype)[
                bc.offset:bc.offset + len(bc) + 1].astype(np.int64)
            bdata = np.frombuffer(bc.buffers()[2] or b"", np.uint8)
            try:
                docs, poss = decode_occ_rows(bdata, boffs, ns,
                                             np.arange(len(ns)))
            except Exception as e:  # noqa: BLE001
                errs_out.append(f"{tag}: decode failed: {e}")
                continue
            if (poss < 0).any() or (docs < 0).any():
                errs.append(f"{tag}: negative doc/pos")
            # per-(term, doc) position strict monotonicity
            starts = np.zeros(len(ns) + 1, np.int64)
            np.cumsum(ns, out=starts[1:])
            term_of = np.repeat(np.arange(len(ns)), ns)
            if len(docs) > 1:
                same = (term_of[1:] == term_of[:-1]) \
                    & (docs[1:] == docs[:-1])
                if (np.diff(poss)[same] <= 0).any():
                    errs.append(f"{tag}: positions not strictly "
                                "increasing within a doc")
            if row["post_path"]:
                pt = pq.read_table(row["post_path"])
                counts, pdocs, ptfs, _ = decode_postings_file(pt, bs)
                # align terms by name (both files sort by term)
                pos_terms = t.column("term").to_pylist()
                post_terms = pt.column("term").to_pylist()
                pmap = {tm: i for i, tm in enumerate(post_terms)}
                pstarts = np.zeros(len(counts) + 1, np.int64)
                np.cumsum(counts, out=pstarts[1:])
                for i, tm in enumerate(pos_terms):
                    j = pmap.get(tm)
                    if j is None:
                        errs.append(f"{tag}: term {tm!r} missing from "
                                    "postings")
                        continue
                    od = docs[starts[i]:starts[i + 1]]
                    ud, uc = np.unique(od, return_counts=True)
                    pd_ = pdocs[pstarts[j]:pstarts[j + 1]]
                    pt_ = ptfs[pstarts[j]:pstarts[j + 1]]
                    if not (np.array_equal(ud, pd_)
                            and np.array_equal(uc, pt_)):
                        errs.append(f"{tag}: term {tm!r} occurrence "
                                    "docs/counts != postings docs/tfs")
            errs_out.extend(errs)
        return pa.table({"err": pa.array(errs_out, pa.string())})

    errors: list[str] = []
    if jobs:
        checked = rd.from_items(jobs).map_batches(
            check, batch_format="pyarrow", batch_size=1).to_pandas()
        # an all-clean run yields only empty blocks -> column may vanish
        errors = ([e for e in checked["err"] if e]
                  if "err" in checked.columns else [])
    report = {"n_position_files": len(jobs), "errors": errors}
    if errors:
        raise IndexCorruption("; ".join(errors))
    return report
