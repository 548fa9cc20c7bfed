"""Ray-Data-native inverted-index build + BM25 query engine.

A from-scratch re-expression of the capabilities of
yuniko-software/bge-m3-onnx (reference at /root/reference) on Ray Data:
the reference's per-document neural sparse-lexical weights
(`samples/python/bge_m3_embedder.py:132-143`) become an exact Okapi BM25
inverted index built by a SPIMI-style ``map_batches`` stage, merged by a
``groupby`` shuffle into delta/varint-compressed postings with per-block
max-score metadata, and queried by block-max-WAND top-k scoring actors.

Nothing here calls ``ray.init`` — callers own the Ray session.
"""

from bge_m3_onnx_ray._malloc import tune_malloc
from bge_m3_onnx_ray.config import IndexConfig, QueryConfig

# every Ray worker imports this package before running a stage, so this
# runs once per process — see _malloc.py for why it's load-bearing here
tune_malloc()

# route >= 1 MiB numpy buffers to populated mmaps (free-list reuse);
# see _native/populate_alloc.c for the measured page-install pathology
from bge_m3_onnx_ray._native import install_populate_alloc  # noqa: E402

install_populate_alloc()


def _mute_schema_hash_noise() -> None:
    """Drop Ray Data's per-block "Failed to hash the schemas (for
    deduplication)" warning. It fires on EVERY block whose Arrow schema
    carries parquet pandas-metadata (a dict makes ``pa.Schema``
    unhashable — harmless: Ray just skips a dedup fast path), which
    floods worker logs thousands of times per run and buries real
    warnings. Scoped to that one message; everything else on the logger
    still passes. Runs in every worker via package import."""
    import logging

    class _Filter(logging.Filter):
        def filter(self, record: logging.LogRecord) -> bool:
            return "Failed to hash the schemas" not in record.getMessage()

    logging.getLogger(
        "ray.data._internal.arrow_ops.transform_pyarrow").addFilter(_Filter())


_mute_schema_hash_noise()

__all__ = ["IndexConfig", "QueryConfig", "build_index", "search",
           "append_index", "build_positions", "phrase_search",
           "compact_index"]


def __getattr__(name):  # lazy: keep `import bge_m3_onnx_ray` cheap
    if name == "build_index":
        from bge_m3_onnx_ray.index.build import build_index
        return build_index
    if name == "search":
        from bge_m3_onnx_ray.index.search import search
        return search
    if name == "append_index":
        from bge_m3_onnx_ray.index.append import append_index
        return append_index
    if name == "build_positions":
        from bge_m3_onnx_ray.index.positions import build_positions
        return build_positions
    if name == "phrase_search":
        from bge_m3_onnx_ray.index.positions import phrase_search
        return phrase_search
    if name == "compact_index":
        from bge_m3_onnx_ray.index.compact import compact_index
        return compact_index
    raise AttributeError(name)
