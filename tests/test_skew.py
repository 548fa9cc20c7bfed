"""Skew stress: the north rule calls out hot terms and long conversations
explicitly. Doc-range sharding bounds both: a term at ~100% df splits
across shards (deterministic salting by docID range), and a conversation
of any length is processed per TURN. Verified against the oracle."""

import numpy as np
import pyarrow as pa

from bge_m3_onnx_ray.config import IndexConfig, QueryConfig
from bge_m3_onnx_ray.index.build import build_index
from bge_m3_onnx_ray.index.search import search
from bge_m3_onnx_ray.oracle import OracleIndex


def _skewed_table(n: int = 3000) -> pa.Table:
    rng = np.random.default_rng(9)
    # ONE conversation holds 60% of all turns (long-conversation skew)
    n_big = int(n * 0.6)
    conv = ["conv-big"] * n_big
    turn = list(range(n_big))
    rest = n - n_big
    per = 3
    for i in range(0, rest, per):
        cid = f"conv-{i//per:06d}"
        for j in range(min(per, rest - i)):
            conv.append(cid)
            turn.append(j)
    words = ["alpha", "beta", "gamma", "delta", "epsilon"]
    texts = []
    for i in range(n):
        # "hot" appears in ~every doc (stopword-level df)
        k = int(rng.integers(1, 6))
        texts.append("hot " + " ".join(words[int(j)] for j in rng.integers(0, 5, k)))
    texts[5] = ""  # keep an empty doc in the mix
    return pa.table({"conv_id": pa.array(conv, pa.string()),
                     "turn_idx": pa.array(turn, pa.int32()),
                     "role": pa.array(["user"] * n, pa.string()),
                     "text": pa.array(texts, pa.string()),
                     "tool": pa.array([""] * n, pa.string()),
                     "ts": pa.array(np.arange(n, dtype=np.int64),
                                    pa.timestamp("us"))})


def test_hot_term_and_giant_conversation(ray_session, tmp_path):
    import ray.data as rd
    t = _skewed_table()
    idx = str(tmp_path / "skew_idx")
    cfg = IndexConfig(docs_per_shard=256, term_buckets=2, block_size=16)
    res = build_index(rd.from_arrow(t), idx, cfg)
    assert res["n_docs"] == t.num_rows
    # the hot term's postings are split across every shard — no single
    # merge group saw more than docs_per_shard entries
    assert res["n_shards"] == (t.num_rows + 255) // 256

    oi = OracleIndex(zip(t.column("conv_id").to_pylist(),
                         t.column("turn_idx").to_pylist(),
                         t.column("text").to_pylist()))
    assert oi.df("hot") > 0.9 * t.num_rows          # genuinely hot
    queries = [(0, "hot"), (1, "hot alpha"), (2, "epsilon delta"), (3, "hot hot")]
    for method in ("exhaustive", "wand"):
        out = search(idx, queries, QueryConfig(k=10, method=method)).to_pandas()
        for qid, text in queries:
            want = oi.search(text, 10)
            got = out[out.query_id == qid].sort_values("rank")
            assert got.doc_id.tolist() == [w["doc_id"] for w in want], (method, text)
            assert np.allclose(got.score.to_numpy(),
                               [w["score"] for w in want], rtol=0, atol=1e-12)
