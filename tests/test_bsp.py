"""Unit tests for the bucketed BSP task engine (stages/_bsp.py) — the
iterative-fixpoint substrate under pagerank and dup_clusters. The
engine's contract is bit-identical results at ANY bucket count and
interleaving (all reductions are integer min/sum), so the tests pin
B=1 vs many-bucket equality plus the empty/degenerate shapes the
higher-level tests never exercise directly."""

import numpy as np
import pyarrow as pa
import pytest


def _edges(pairs):
    import ray.data as rd
    a = np.asarray([x for x, _ in pairs], np.int64)
    b = np.asarray([y for _, y in pairs], np.int64)
    return rd.from_arrow(pa.table({
        "src": pa.array(np.concatenate([a, b]), pa.int64()),
        "dst": pa.array(np.concatenate([b, a]), pa.int64())}))


def test_pagerank_bsp_bucket_count_invariant(ray_session):
    """Identical ranks at B=1 and B=7 (awkward, non-power-of-two)."""
    from bge_m3_onnx_ray.stages._bsp import pagerank_bsp
    rng = np.random.RandomState(3)
    pairs = {(int(a), int(b)) for a, b in rng.randint(0, 50, (120, 2))
             if a != b}
    one = pagerank_bsp(_edges(pairs), 4, 1).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    many = pagerank_bsp(_edges(pairs), 4, 7).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert one.equals(many)
    assert len(one) == len({x for p in pairs for x in p})


def test_min_label_bsp_bucket_count_invariant(ray_session):
    """Same component labels at B=1 and B=5; two components land on
    their own min ids."""
    from bge_m3_onnx_ray.stages._bsp import min_label_bsp
    pairs = [(7, 3), (3, 9), (9, 12), (20, 25), (25, 21)]
    one = min_label_bsp(_edges(pairs), 64, 1).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    many = min_label_bsp(_edges(pairs), 64, 5).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert one.equals(many)
    lab = one.set_index("doc_id")["cluster_id"]
    assert all(lab[v] == 3 for v in (7, 3, 9, 12))
    assert all(lab[v] == 20 for v in (20, 25, 21))


def test_bsp_empty_graph(ray_session):
    """No edges → empty outputs with the right schemas, no crash."""
    import ray.data as rd

    from bge_m3_onnx_ray.stages._bsp import min_label_bsp, pagerank_bsp
    empty = rd.from_arrow(pa.table({
        "src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}))
    pr = pagerank_bsp(empty, 3, 8)
    assert pr.schema().names == ["doc_id", "rank_q9"] and pr.count() == 0
    cc = min_label_bsp(empty, 16, 8)
    assert cc.schema().names == ["doc_id", "cluster_id"] and cc.count() == 0


def test_min_label_bsp_long_path_round_bound(ray_session):
    """Pointer doubling: a 256-node path converges well inside the
    O(log n) bound, and every node labels to 0."""
    from bge_m3_onnx_ray.stages._bsp import min_label_bsp
    n = 256
    st = {}
    out = min_label_bsp(_edges([(i, i + 1) for i in range(n - 1)]),
                        64, 16, stats=st).to_pandas()
    assert (out.cluster_id == 0).all() and len(out) == n
    assert st["rounds"] <= int(np.log2(n)) + 2, st


def test_min_label_bsp_nonconvergence_raises(ray_session):
    """max_rounds=1 on a shape needing more rounds raises loudly
    instead of returning wrong labels."""
    from bge_m3_onnx_ray.stages._bsp import min_label_bsp
    with pytest.raises(RuntimeError, match="did not converge"):
        min_label_bsp(_edges([(i, i + 1) for i in range(63)]), 1, 4)
