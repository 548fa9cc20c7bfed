"""Golden-file generator — the analogue of the reference's
``samples/python/generate_reference_embeddings.py`` (goldens first, then
cross-implementation comparison; ``run_tests.sh:27-89`` order).

Ray-free by design: the pure-Python oracle is the authority. Output:

- ``tests/golden/topk.json``      {query_id: [{rank, doc_id, conv_id,
                                   turn_idx, score}, ...]}  (17 sig digits)
- ``tests/golden/index_stats.json`` {n, seed, N, avgdl, total_len, n_terms,
                                   sample_dfs, sample_postings}

Regenerate with: ``python tools/make_golden.py``
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq

from bge_m3_onnx_ray.fixtures import gen_queries, transcripts_path
from bge_m3_onnx_ray.oracle import OracleIndex

N_TURNS = 2000
SEED = 42
K = 10
SAMPLE_TERMS = ["the", "data", "query", "fox", "distributed", "поиск", "数"]


def main() -> None:
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "tests", "golden")
    os.makedirs(out_dir, exist_ok=True)
    t = pq.read_table(transcripts_path(N_TURNS, SEED))
    rows = list(zip(t.column("conv_id").to_pylist(),
                    t.column("turn_idx").to_pylist(),
                    t.column("text").to_pylist()))
    oi = OracleIndex(rows)
    queries = gen_queries(50)
    golden = {}
    for qid, text in queries:
        hits = oi.search(text, K)
        golden[str(qid)] = {
            "text": text,
            "hits": [{"rank": i + 1, "doc_id": h["doc_id"], "conv_id": h["conv_id"],
                      "turn_idx": h["turn_idx"], "score": repr(h["score"])}
                     for i, h in enumerate(hits)],
        }
    with open(os.path.join(out_dir, "topk.json"), "w") as f:
        json.dump(golden, f, indent=1, ensure_ascii=False)

    stats = {
        "n_turns": N_TURNS, "seed": SEED,
        "N": oi.n_docs, "total_len": oi.total_len, "avgdl": repr(oi.avgdl),
        "n_terms": len(oi.postings),
        "sample_dfs": {t_: oi.df(t_) for t_ in SAMPLE_TERMS},
        "sample_postings": {t_: oi.postings.get(t_, [])[:20] for t_ in SAMPLE_TERMS},
    }
    with open(os.path.join(out_dir, "index_stats.json"), "w") as f:
        json.dump(stats, f, indent=1, ensure_ascii=False)
    print(f"wrote goldens for {len(queries)} queries, N={oi.n_docs}, "
          f"vocab={len(oi.postings)}")


if __name__ == "__main__":
    main()
