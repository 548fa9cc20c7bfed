"""Same tiny job at two in-session parallelism configurations → identical
output (the in-pytest stand-in for the two-cluster-size criterion; the
real two-process 8-vs-32-CPU evidence lives in ``bench.py --scaling``)."""

import glob
import hashlib
import os

from bge_m3_onnx_ray.config import IndexConfig, QueryConfig
from bge_m3_onnx_ray.index.build import build_index
from bge_m3_onnx_ray.index.search import search


def _h(index_dir):
    h = hashlib.sha256()
    for p in sorted(glob.glob(os.path.join(index_dir, "postings", "*"))):
        with open(p, "rb") as f:
            h.update(f.read())
    return h.hexdigest()


def test_output_independent_of_parallelism(ray_session, tiny_corpus, tmp_path):
    path, _, queries = tiny_corpus
    hashes, results = [], []
    # NOTE: pool size must stay < session CPUs (4) — a fixed pool that
    # reserves every CPU starves the groupby/write stages (ray_guide
    # "Stateful stages" sizing rule)
    for conc, bs in [(1, 4096), (2, 256)]:
        cfg = IndexConfig(docs_per_shard=64, term_buckets=4, block_size=8,
                          tokenize_batch_size=bs, tokenize_concurrency=conc)
        idx = str(tmp_path / f"idx-{conc}-{bs}")
        build_index(path, idx, cfg)
        hashes.append(_h(idx))
        out = search(idx, queries[:10], QueryConfig(k=10)).to_pandas()
        results.append(out.sort_values(["query_id", "rank"]).reset_index(drop=True))
    assert hashes[0] == hashes[1]
    assert results[0].equals(results[1])
