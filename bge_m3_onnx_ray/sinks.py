"""Resumable partitioned Parquet sink — the generic form of the index
build's per-shard atomic-write + manifest pattern, for PIPELINE outputs
(dedup survivor sets, SFT pair dumps, scored corpora): one directory
per partition value, each written atomically with a manifest entry, so
a failed 100 TB run re-runs and SKIPS finished partitions instead of
recomputing them (brief: "Resumable output — write partitioned Parquet
so a failed run can skip finished partitions; never one giant file").

Layout::

    out_dir/
      part=<value>/data.parquet      (atomic: tmp + rename)
      _manifest/<value>.json         ({value, rows, sha256})

Resume contract: a partition is complete iff its manifest entry exists
(the entry is written AFTER the data rename, so a crash between the
two leaves an orphan data file that the next run simply overwrites).
Rows whose partition is already complete are dropped at the FILTER
stage — they never reach the shuffle, so resuming a 99%-done run
shuffles 1% of the data.
"""

from __future__ import annotations

import hashlib
import json
import os
import re

import numpy as np
import pyarrow as pa
import ray.data as rd


def _safe(value) -> str:
    s = str(value)
    return re.sub(r"[^A-Za-z0-9_.-]", "_", s) or "_"


def write_partitioned(ds: rd.Dataset, out_dir: str, partition_col: str,
                      resume: bool = True) -> dict:
    """Write ``ds`` as one Parquet directory per distinct value of
    ``partition_col``. Returns {written: n, skipped: n, rows: n}.
    Deterministic content per partition: rows are sorted by all columns
    before writing, so a resumed run and a fresh run produce
    byte-identical partition files."""
    import pyarrow.parquet as pq

    import ray

    os.makedirs(out_dir, exist_ok=True)
    man_dir = os.path.join(out_dir, "_manifest")
    os.makedirs(man_dir, exist_ok=True)
    done: set[str] = set()
    if resume:
        done = {f[:-5] for f in os.listdir(man_dir) if f.endswith(".json")}
    done_ref = ray.put(frozenset(done))

    def drop_done(t: pa.Table) -> pa.Table:
        if not done:
            return t
        d: frozenset = ray.get(done_ref)
        keys = [_safe(v) for v in t.column(partition_col).to_pylist()]
        keep = np.fromiter((k not in d for k in keys), bool, len(keys))
        return t.filter(pa.array(keep))

    def write_group(g: pa.Table) -> pa.Table:
        val = g.column(partition_col)[0].as_py()
        key = _safe(val)
        g = g.take(pa.compute.sort_indices(
            g, sort_keys=[(c, "ascending") for c in g.column_names]))
        pdir = os.path.join(out_dir, f"part={key}")
        os.makedirs(pdir, exist_ok=True)
        final = os.path.join(pdir, "data.parquet")
        tmp = final + ".tmp"
        pq.write_table(g, tmp)
        os.replace(tmp, final)                  # atomic publish
        h = hashlib.sha256(open(final, "rb").read()).hexdigest()
        entry = {"value": str(val), "rows": g.num_rows, "sha256": h}
        mtmp = os.path.join(man_dir, key + ".json.tmp")
        with open(mtmp, "w") as f:
            json.dump(entry, f, sort_keys=True)
        os.replace(mtmp, os.path.join(man_dir, key + ".json"))
        return pa.table({"part": pa.array([key], pa.string()),
                         "rows": pa.array([g.num_rows], pa.int64())})

    written = ds.map_batches(drop_done, batch_format="pyarrow") \
        .groupby(partition_col).map_groups(write_group,
                                           batch_format="pyarrow") \
        .to_pandas()
    n_written = len(written) if "part" in getattr(written, "columns", []) \
        else 0
    rows = int(written["rows"].sum()) if n_written else 0
    return {"written": n_written, "skipped": len(done), "rows": rows}
