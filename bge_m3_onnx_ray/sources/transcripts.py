"""Transcript-table sources (reference S2, the test-dataset reader at
``samples/python/performance_test.py:213-223`` — generalized to the
engine's input formats).

``read_transcripts`` accepts a parquet file/dir (preferred: column-pruned
zero-copy scan) or JSON-lines (the reference's corpus format), and always
returns the input_hint schema subset needed by the build.
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray.data as rd

BUILD_COLUMNS = ["conv_id", "turn_idx", "text"]
FULL_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("text", pa.string()),
    ("tool", pa.string()),
    ("ts", pa.timestamp("us")),
])


def read_transcripts(path: str, columns: list[str] | None = None) -> rd.Dataset:
    columns = columns or BUILD_COLUMNS
    if os.path.isdir(path):
        files = os.listdir(path)
        if any(f.endswith(".json") or f.endswith(".jsonl") for f in files):
            ds = rd.read_json(path)
            return ds.select_columns(columns)
        return rd.read_parquet(path, columns=columns)
    if path.endswith((".json", ".jsonl")):
        return rd.read_json(path).select_columns(columns)
    return rd.read_parquet(path, columns=columns)
