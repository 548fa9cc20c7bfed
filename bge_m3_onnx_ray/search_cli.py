"""CLI search entry point.

    python -m bge_m3_onnx_ray.search_cli --index DIR --query "text" [-k 10]
    python -m bge_m3_onnx_ray.search_cli --index DIR --queries-file q.txt

Prints one JSON line per query: {"query_id", "hits": [{rank, doc_id,
score, conv_id, turn_idx}, ...]}.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="Query a BM25 index")
    ap.add_argument("--index", required=True)
    ap.add_argument("--query", action="append", default=[])
    ap.add_argument("--queries-file")
    ap.add_argument("-k", type=int, default=10)
    ap.add_argument("--method", default="exhaustive",
                    choices=["exhaustive", "wand"])
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args(argv)

    texts = list(args.query)
    if args.queries_file:
        with open(args.queries_file) as f:
            texts.extend(ln.rstrip("\n") for ln in f if ln.strip())
    if not texts:
        ap.error("no queries given")

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

    from bge_m3_onnx_ray.index.serve import Searcher

    s = Searcher(args.index)
    rows = s.search_batch(list(enumerate(texts)), args.k, args.method)
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(
            {k: r[k] for k in ("rank", "doc_id", "score", "conv_id", "turn_idx")})
    for qid, text in enumerate(texts):
        print(json.dumps({"query_id": qid, "text": text,
                          "hits": by_q.get(qid, [])}))
    s.shutdown()
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
