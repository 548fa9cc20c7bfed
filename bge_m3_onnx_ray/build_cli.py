"""CLI build entry point — ``ray job submit``-compatible.

    python -m bge_m3_onnx_ray.build_cli --input DIR --output DIR
        [--docs-per-shard N] [--term-buckets B] [--no-resume] [--num-cpus C]

Owns its Ray session (guarded init) because it IS a job entry point; the
library never calls ray.init.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="Build a BM25 index")
    ap.add_argument("--input", required=True, help="transcripts parquet path/dir")
    ap.add_argument("--output", required=True, help="index output dir")
    ap.add_argument("--docs-per-shard", type=int, default=None)
    ap.add_argument("--term-buckets", type=int, default=None)
    ap.add_argument("--tokenizer", default=None,
                    help='tokenizer spec: "deterministic" (default), '
                         '"vocab", or "vocab:<path>" (subword seam)')
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="only for local runs; under `ray job submit` the "
                         "cluster decides")
    args = ap.parse_args(argv)

    import ray
    if not ray.is_initialized():
        kw = {"include_dashboard": False, "logging_level": "ERROR"}
        if args.num_cpus:
            kw["num_cpus"] = args.num_cpus
        # no explicit address: Ray honours RAY_ADDRESS ("local" in this
        # sandbox; the cluster address under `ray job submit`)
        ray.init(**kw)
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from bge_m3_onnx_ray.config import IndexConfig
    from bge_m3_onnx_ray.index.build import build_index

    overrides = {}
    if args.docs_per_shard:
        overrides["docs_per_shard"] = args.docs_per_shard
    if args.term_buckets:
        overrides["term_buckets"] = args.term_buckets
    if args.tokenizer:
        overrides["tokenizer_spec"] = args.tokenizer
    cfg = IndexConfig(**overrides)
    res = build_index(args.input, args.output, cfg, resume=not args.no_resume)
    print(json.dumps(res))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
