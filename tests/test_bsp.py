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


def test_pagerank_bsp_weighted(ray_session):
    """Weighted recurrence: hand-run r' = 150e6 + Σ(850·r·w)//(1000·W)
    on a 3-node path with unequal weights; w≡1 must equal unweighted."""
    import ray.data as rd

    from bge_m3_onnx_ray.stages.dedup import pagerank
    pairs = rd.from_arrow(pa.table({
        "doc_a": pa.array([0, 1], pa.int64()),
        "doc_b": pa.array([1, 2], pa.int64()),
        "n_common": pa.array([3, 5], pa.int64())}))
    out = pagerank(pairs, n_iter=2, weighted=True).to_pandas() \
        .set_index("doc_id")["rank_q9"]
    r = {0: 10**9, 1: 10**9, 2: 10**9}
    w = {(0, 1): 3, (1, 0): 3, (1, 2): 5, (2, 1): 5}
    W = {0: 3, 1: 8, 2: 5}
    for _ in range(2):
        nr = {}
        for v, ins in {0: [1], 1: [0, 2], 2: [1]}.items():
            nr[v] = 150_000_000 + sum(
                (850 * r[u] * w[(u, v)]) // (1000 * W[u]) for u in ins)
        r = nr
    assert {k: int(v) for k, v in out.items()} == r
    ones = rd.from_arrow(pa.table({
        "doc_a": pa.array([0, 1], pa.int64()),
        "doc_b": pa.array([1, 2], pa.int64()),
        "n_common": pa.array([1, 1], pa.int64())}))
    a = pagerank(ones, n_iter=2, weighted=True).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = pagerank(ones.select_columns(["doc_a", "doc_b"]),
                 n_iter=2).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_minplus_bfs_depths(ray_session):
    """Path + branch graph: depths equal hand-computed BFS distances
    from the component min; B=1 equals many-bucket."""
    from bge_m3_onnx_ray.stages._bsp import minplus_bfs_bsp
    pairs = [(5, 9), (9, 2), (2, 7), (30, 40), (30, 50)]
    st = {}
    out = minplus_bfs_bsp(_edges(pairs), 64, 8, stats=st).to_pandas() \
        .set_index("doc_id")
    assert out.loc[2, "depth"] == 0 and out.loc[2, "cluster_id"] == 2
    assert out.loc[9, "depth"] == 1 and out.loc[7, "depth"] == 1
    assert out.loc[5, "depth"] == 2
    assert out.loc[30, "depth"] == 0 and out.loc[40, "depth"] == 1 \
        and out.loc[50, "depth"] == 1
    one = minplus_bfs_bsp(_edges(pairs), 64, 1).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    many = minplus_bfs_bsp(_edges(pairs), 64, 5).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert one.equals(many)
