"""Bucketed BSP task engine for ITERATIVE graph fixpoints.

Why not ``groupby`` rounds: Ray Data's streaming executor pays a fixed
per-execution cost (plan compile, executor spin-up, stats plumbing —
measured ~0.3-0.5 s here) and re-sorts the exchange every round, so a
k-round algorithm expressed as k (or 2-3k) groupby executions pays that
fixed cost 2-3k times for what is a STABLE hash partition of a static
edge set. This module is the sanctioned raw-task path (the "(c) raw Ray
tasks as a last resort" case): the iteration state lives as per-bucket
Arrow/numpy blocks pinned in the object store, co-partitioned with the
edges ONCE, and every round is two-to-four waves of B tiny tasks
(Pregel/BSP) — message tasks emit per-destination-bucket pre-aggregated
partials via ``num_returns=B``, fold tasks combine them into the next
bucket state. No driver-side data, no per-round executor, no sort.

Partitioning contract (identical to the groupby formulation it
replaces): a row with node key u lives in bucket ``splitmix64(u) % B``;
one bucket is processed by one task and must fit in a worker's heap.
``B`` scales with the CLUSTER (task slots), not with key cardinality —
the same rule as :mod:`bge_m3_onnx_ray.stages._groups`. Because every
undirected edge is stored in both directions, a node's complete
out-edge list is co-located with the node, and every destination node
exists as a source in its own bucket.

Determinism: all reductions here are integer min / integer sum —
order-free — so results are bit-identical to the groupby formulation
at any B and any task interleaving.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from bge_m3_onnx_ray.hashing import splitmix64


def bucket_of(keys: np.ndarray, n_buckets: int) -> np.ndarray:
    return (splitmix64(keys.astype(np.uint64))
            % np.uint64(n_buckets)).astype(np.int64)


@ray.remote
def _split_block(tbl: pa.Table, key_col: str, n_buckets: int):
    """One input block → n_buckets bucket slices (num_returns fan-out)."""
    b = bucket_of(tbl.column(key_col).to_numpy(), n_buckets)
    order = np.argsort(b, kind="stable")
    tb = tbl.take(pa.array(order))
    bs = b[order]
    bounds = np.searchsorted(bs, np.arange(n_buckets + 1))
    return tuple(tb.slice(int(bounds[i]), int(bounds[i + 1] - bounds[i]))
                 for i in range(n_buckets))


@ray.remote
def _untuple(x):
    """num_returns=1 hands the caller ONE ref to the whole 1-tuple a
    fan-out task returns — unwrap it so B=1 matches the B>1 shape."""
    return x[0]


@ray.remote
def _concat_bucket(*parts):
    parts = [p for p in parts if p is not None and p.num_rows]
    if not parts:
        return None
    return pa.concat_tables(parts).combine_chunks()


def partition_by(ds: rd.Dataset, key_col: str,
                 n_buckets: int) -> list:
    """Hash-partition a Dataset's blocks into n_buckets object-store
    tables (refs; a bucket with no rows is ``None``). One map wave over
    input blocks + one concat wave per bucket — the only data movement
    the whole iteration pays."""
    refs = ds.to_arrow_refs()
    outs = [_split_block.options(num_returns=n_buckets)
            .remote(r, key_col, n_buckets) for r in refs]
    if n_buckets == 1:
        outs = [[_untuple.remote(o)] for o in outs]
    return [_concat_bucket.remote(*[o[b] for o in outs])
            for b in range(n_buckets)]


def pick_buckets(ds: rd.Dataset, n_buckets: int) -> int:
    """Clamp the bucket count to the data: ~64 MB of exchange rows per
    bucket, at least 8, at most the caller's cap. B follows cluster
    scale through the cap; tiny inputs stop paying B-task waves."""
    try:
        nbytes = ds.size_bytes() or 0
    except Exception:
        nbytes = 0
    want = max(8, int(nbytes / (64 << 20)) + 1)
    return int(max(1, min(n_buckets, want)))


# --------------------------------------------------- integer PageRank

@ray.remote
def _pr_prep(tbl, n_buckets: int):
    """Per-bucket static edge state: sorted unique nodes, per-node total
    out-WEIGHT (= outdeg when the edge table has no ``w`` column), edge
    arrays (src index into nodes, dst, dst bucket, edge weight)."""
    if tbl is None or tbl.num_rows == 0:
        z = np.empty(0, np.int64)
        return (z, z, z, z, z, z)
    src = tbl.column("src").to_numpy()
    dst = tbl.column("dst").to_numpy()
    w = (tbl.column("w").to_numpy().astype(np.int64)
         if "w" in tbl.column_names
         else np.ones(len(src), np.int64))
    o = np.argsort(src, kind="stable")
    src, dst, w = src[o], dst[o], w[o]
    nodes, counts = np.unique(src, return_counts=True)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    wout = np.add.reduceat(w, starts)
    src_idx = np.repeat(np.arange(len(nodes), dtype=np.int64), counts)
    return (nodes, wout.astype(np.int64), src_idx, dst,
            bucket_of(dst, n_buckets), w)


@ray.remote
def _pr_init(prep):
    nodes = prep[0]
    return np.full(len(nodes), 1_000_000_000, np.int64)


@ray.remote
def _pr_contrib(rank, prep, n_buckets: int):
    """share(u→v) = (850·r(u)·w(u,v)) // (1000·W(u)) with W(u) the
    total out-weight (both reduce to the unweighted recurrence at
    w≡1, where the ·1 multiply cannot change a floor division),
    pre-summed per dst within this bucket, split per destination
    bucket (num_returns). Overflow bound: 850·r·w stays < 2^63 for
    r ~ 10^9-scale ranks and w < ~10^6 — shared-shingle counts are
    orders of magnitude below that."""
    nodes, wout, src_idx, dst, dstb, w = prep
    if not len(dst):
        e = (np.empty(0, np.int64), np.empty(0, np.int64))
        return tuple(e for _ in range(n_buckets))
    share = (850 * rank[src_idx] * w) // (1000 * wout[src_idx])
    order = np.lexsort((dst, dstb))
    d2, b2, s2 = dst[order], dstb[order], share[order]
    chg = np.empty(len(d2), bool)
    chg[0] = True
    chg[1:] = (d2[1:] != d2[:-1]) | (b2[1:] != b2[:-1])
    st = np.flatnonzero(chg)
    dsts, bks = d2[st], b2[st]
    sums = np.add.reduceat(s2, st)
    bounds = np.searchsorted(bks, np.arange(n_buckets + 1))
    return tuple((dsts[bounds[i]:bounds[i + 1]],
                  sums[bounds[i]:bounds[i + 1]])
                 for i in range(n_buckets))


@ray.remote
def _pr_fold(prep, *partials):
    """r'(v) = 150_000_000 + Σ incoming shares (integer sum: order-free)."""
    nodes = prep[0]
    acc = np.zeros(len(nodes), np.int64)
    for d, s in partials:
        if len(d):
            np.add.at(acc, np.searchsorted(nodes, d), s)
    return acc + 150_000_000


@ray.remote
def _pr_table(prep, rank) -> pa.Table:
    return pa.table({"doc_id": pa.array(prep[0], pa.int64()),
                     "rank_q9": pa.array(rank, pa.int64())})


def pagerank_bsp(edges: rd.Dataset, n_iter: int,
                 n_buckets: int) -> rd.Dataset:
    """Integer-exact PageRank (the :func:`stages.dedup.pagerank`
    recurrence, bit-identical) over a both-directions edge Dataset
    (src, dst). One co-partition of the edges, then ``n_iter`` rounds
    of two task waves; egress is per-bucket Arrow tables."""
    B = pick_buckets(edges, n_buckets)
    prep = [_pr_prep.remote(t, B)
            for t in partition_by(edges, "src", B)]
    ranks = [_pr_init.remote(p) for p in prep]
    for _ in range(n_iter):
        outs = [_pr_contrib.options(num_returns=B).remote(ranks[b], prep[b], B)
                for b in range(B)]
        if B == 1:
            outs = [[_untuple.remote(o)] for o in outs]
        ranks = [_pr_fold.remote(prep[b], *[outs[s][b] for s in range(B)])
                 for b in range(B)]
    return rd.from_arrow_refs(
        [_pr_table.remote(prep[b], ranks[b]) for b in range(B)])


# ------------------------------------- min-label connected components

@ray.remote
def _cc_prep(tbl, n_buckets: int):
    """Per-bucket static edge state + initial labels:
    label₀(u) = min(u, min out-neighbor)."""
    if tbl is None or tbl.num_rows == 0:
        z = np.empty(0, np.int64)
        return (z, z, z, z), z
    src = tbl.column("src").to_numpy()
    dst = tbl.column("dst").to_numpy()
    o = np.argsort(src, kind="stable")
    src, dst = src[o], dst[o]
    nodes, counts = np.unique(src, return_counts=True)
    src_idx = np.repeat(np.arange(len(nodes), dtype=np.int64), counts)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    lab0 = np.minimum(nodes, np.minimum.reduceat(dst, starts))
    return (nodes, src_idx, dst, bucket_of(dst, n_buckets)), lab0


@ray.remote
def _cc_msgs(label, prep, n_buckets: int):
    """Wave A: every edge u→v carries label(u); pre-min per dst within
    the bucket, split per destination bucket."""
    nodes, src_idx, dst, dstb = prep
    if not len(dst):
        e = (np.empty(0, np.int64), np.empty(0, np.int64))
        return tuple(e for _ in range(n_buckets))
    lab = label[src_idx]
    order = np.lexsort((dst, dstb))
    d2, b2, l2 = dst[order], dstb[order], lab[order]
    chg = np.empty(len(d2), bool)
    chg[0] = True
    chg[1:] = (d2[1:] != d2[:-1]) | (b2[1:] != b2[:-1])
    st = np.flatnonzero(chg)
    dsts, bks = d2[st], b2[st]
    mins = np.minimum.reduceat(l2, st)
    bounds = np.searchsorted(bks, np.arange(n_buckets + 1))
    return tuple((dsts[bounds[i]:bounds[i + 1]],
                  mins[bounds[i]:bounds[i + 1]])
                 for i in range(n_buckets))


@ray.remote
def _cc_fold(label, prep, *partials):
    """Wave B: t(v) = min(label(v), min incoming labels) — integer min,
    order-free."""
    nodes = prep[0]
    t = label.copy()
    for d, m in partials:
        if len(d):
            pos = np.searchsorted(nodes, d)
            np.minimum.at(t, pos, m)
    return t


@ray.remote
def _cc_query(label, prep, n_buckets: int):
    """Wave C: pointer-doubling queries (v, L=label(v)) routed to
    bucket(L) — every node asks its label target for ITS label."""
    nodes = prep[0]
    if not len(nodes):
        e = (np.empty(0, np.int64), np.empty(0, np.int64))
        return tuple(e for _ in range(n_buckets))
    lb = bucket_of(label, n_buckets)
    order = np.argsort(lb, kind="stable")
    v2, l2, b2 = nodes[order], label[order], lb[order]
    bounds = np.searchsorted(b2, np.arange(n_buckets + 1))
    return tuple((v2[bounds[i]:bounds[i + 1]],
                  l2[bounds[i]:bounds[i + 1]])
                 for i in range(n_buckets))


@ray.remote
def _cc_answer(label, prep, n_buckets: int, *queries):
    """Wave D: answer label(L) for each query (v, L) whose L lives
    here; route (v, label(L)) back to bucket(v)."""
    nodes = prep[0]
    vs = [q[0] for q in queries if len(q[0])]
    ls = [q[1] for q in queries if len(q[0])]
    if not vs:
        e = (np.empty(0, np.int64), np.empty(0, np.int64))
        return tuple(e for _ in range(n_buckets))
    v = np.concatenate(vs)
    l = np.concatenate(ls)
    ans = label[np.searchsorted(nodes, l)]
    vb = bucket_of(v, n_buckets)
    order = np.argsort(vb, kind="stable")
    v2, a2, b2 = v[order], ans[order], vb[order]
    bounds = np.searchsorted(b2, np.arange(n_buckets + 1))
    return tuple((v2[bounds[i]:bounds[i + 1]],
                  a2[bounds[i]:bounds[i + 1]])
                 for i in range(n_buckets))


@ray.remote
def _cc_apply(t_label, prep, old_label, *answers):
    """Wave E: label'(v) = label(label(v)) (≤ t(v) by monotonicity);
    returns (new label, changed-count vs the round's start)."""
    nodes = prep[0]
    new = t_label.copy()
    for v, a in answers:
        if len(v):
            pos = np.searchsorted(nodes, v)
            np.minimum.at(new, pos, a)
    return new, int((new != old_label).sum())


@ray.remote
def _cc_table(prep, label) -> pa.Table:
    return pa.table({"doc_id": pa.array(prep[0], pa.int64()),
                     "cluster_id": pa.array(label, pa.int64())})


def min_label_bsp(edges: rd.Dataset, max_rounds: int,
                  n_buckets: int, stats: dict | None = None) -> rd.Dataset:
    """Connected components by min-label propagation with pointer
    doubling (label ← label-of-label): O(log n) rounds on path graphs,
    each round four task waves (msgs → fold → query → answer/apply)
    over the static co-partitioned edges. Fixpoint = a round that
    changes no label (labels are monotone non-increasing, so stability
    is global convergence). Bit-identical final labels to the groupby
    formulation: cluster_id = component-min docID."""
    B = pick_buckets(edges, n_buckets)
    pairs = [_cc_prep.options(num_returns=2).remote(t, B)
             for t in partition_by(edges, "src", B)]
    prep = [p[0] for p in pairs]
    labels = [p[1] for p in pairs]
    rounds = 0
    converged = False
    for _ in range(max_rounds):
        rounds += 1
        old = labels
        msgs = [_cc_msgs.options(num_returns=B).remote(labels[b], prep[b], B)
                for b in range(B)]
        if B == 1:
            msgs = [[_untuple.remote(m)] for m in msgs]
        t_lab = [_cc_fold.remote(labels[b], prep[b],
                                 *[msgs[s][b] for s in range(B)])
                 for b in range(B)]
        qs = [_cc_query.options(num_returns=B).remote(t_lab[b], prep[b], B)
              for b in range(B)]
        if B == 1:
            qs = [[_untuple.remote(q)] for q in qs]
        ans = [_cc_answer.options(num_returns=B)
               .remote(t_lab[b], prep[b], B, *[qs[s][b] for s in range(B)])
               for b in range(B)]
        if B == 1:
            ans = [[_untuple.remote(a)] for a in ans]
        applied = [_cc_apply.options(num_returns=2)
                   .remote(t_lab[b], prep[b], old[b],
                           *[ans[s][b] for s in range(B)])
                   for b in range(B)]
        labels = [a[0] for a in applied]
        changed = sum(ray.get([a[1] for a in applied]))
        if changed == 0:
            converged = True
            break
    if stats is not None:
        stats["rounds"] = rounds
    if not converged:
        raise RuntimeError(
            f"min_label_bsp did not converge within {max_rounds} rounds "
            f"(component diameter too large); raise max_rounds")
    return rd.from_arrow_refs(
        [_cc_table.remote(prep[b], labels[b]) for b in range(B)])


# -------------------------------------- min-plus BFS (depth from root)

DIST_BITS = 20          # packed state: root * 2^20 + dist (dist < 2^20)


@ray.remote
def _mp_init(prep):
    nodes = prep[0]
    return nodes * np.int64(1 << DIST_BITS)


@ray.remote
def _mp_msgs(state, prep, n_buckets: int):
    """Wave A: every edge u→v carries state(u) + 1 (the +1 lands in the
    dist field — no carry while dist < 2^20); pre-min per dst within
    the bucket, split per destination bucket."""
    nodes, src_idx, dst, dstb = prep
    if not len(dst):
        e = (np.empty(0, np.int64), np.empty(0, np.int64))
        return tuple(e for _ in range(n_buckets))
    s = state[src_idx] + 1
    order = np.lexsort((dst, dstb))
    d2, b2, s2 = dst[order], dstb[order], s[order]
    chg = np.empty(len(d2), bool)
    chg[0] = True
    chg[1:] = (d2[1:] != d2[:-1]) | (b2[1:] != b2[:-1])
    st = np.flatnonzero(chg)
    dsts, bks = d2[st], b2[st]
    mins = np.minimum.reduceat(s2, st)
    bounds = np.searchsorted(bks, np.arange(n_buckets + 1))
    return tuple((dsts[bounds[i]:bounds[i + 1]],
                  mins[bounds[i]:bounds[i + 1]])
                 for i in range(n_buckets))


@ray.remote
def _mp_fold(state, prep, *partials):
    """Wave B: s'(v) = min(s(v), incoming mins) — integer min on the
    packed value IS lexicographic min on (root, dist). Returns
    (new state, changed count)."""
    nodes = prep[0]
    new = state.copy()
    for d, m in partials:
        if len(d):
            np.minimum.at(new, np.searchsorted(nodes, d), m)
    return new, int((new != state).sum())


@ray.remote
def _mp_table(prep, state) -> pa.Table:
    nodes = prep[0]
    return pa.table({
        "doc_id": pa.array(nodes, pa.int64()),
        "cluster_id": pa.array(state >> np.int64(DIST_BITS), pa.int64()),
        "depth": pa.array(state & np.int64((1 << DIST_BITS) - 1),
                          pa.int64())})


def minplus_bfs_bsp(edges: rd.Dataset, max_rounds: int,
                    n_buckets: int, stats: dict | None = None) -> rd.Dataset:
    """Unweighted BFS depth from each node to its component's MINIMUM
    node (the dup-cluster representative): the min-plus fixpoint of
    s(v) = min(v·2^20, min_{u→v} s(u) + 1) over packed (root, dist)
    int64 states — integer min is order-free, so results are
    bit-identical at any bucket count. O(diameter) rounds (pointer
    doubling would corrupt distances, so none here); raises past
    ``max_rounds`` rather than returning wrong depths. Packing bound:
    docIDs < 2^43, depths < 2^20."""
    B = pick_buckets(edges, n_buckets)
    pairs = [_cc_prep.options(num_returns=2).remote(t, B)
             for t in partition_by(edges, "src", B)]
    # reuse _cc_prep's (nodes, src_idx, dst, dstb) edge layout; its
    # initial labels (second return) are ignored
    prep = [p[0] for p in pairs]
    state = [_mp_init.remote(p) for p in prep]
    rounds = 0
    converged = False
    for _ in range(max_rounds):
        rounds += 1
        msgs = [_mp_msgs.options(num_returns=B).remote(state[b], prep[b], B)
                for b in range(B)]
        if B == 1:
            msgs = [[_untuple.remote(m)] for m in msgs]
        folded = [_mp_fold.options(num_returns=2)
                  .remote(state[b], prep[b], *[msgs[s][b] for s in range(B)])
                  for b in range(B)]
        state = [f[0] for f in folded]
        if sum(ray.get([f[1] for f in folded])) == 0:
            converged = True
            break
    if stats is not None:
        stats["rounds"] = rounds
    if not converged:
        raise RuntimeError(
            f"minplus_bfs_bsp did not converge within {max_rounds} "
            f"rounds (component diameter too large); raise max_rounds")
    return rd.from_arrow_refs(
        [_mp_table.remote(prep[b], state[b]) for b in range(B)])
