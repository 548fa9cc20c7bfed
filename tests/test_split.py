"""Stratified train/val/test split: the bucket-histogram engine path
must equal a pure-Python full-sort recompute exactly — including the
skewed and degenerate strata the sf tables don't exercise (singleton
and tiny strata, a stratum spanning many hash buckets, ids that
collide mod P31's LCG input)."""

import numpy as np
import pyarrow as pa

from bge_m3_onnx_ray.stages.split import _cutoffs, _lcg2, stratified_split


def _oracle(ids, strats, seed=29):
    h = _lcg2(np.asarray(ids, np.int64), seed)
    out = {}
    for s in sorted(set(strats)):
        rows = [(int(hh), int(i)) for i, st, hh in zip(ids, strats, h)
                if st == s]
        rows.sort()
        n = len(rows)
        c1, c2 = _cutoffs(n)
        for r, (_, i) in enumerate(rows):
            out[i] = ("train" if r < c1 else "val" if r < c2 else "test")
    return out


def test_split_matches_full_sort(ray_session):
    rng = np.random.default_rng(7)
    # skew: one huge stratum, several small, one singleton
    strats = (["big"] * 4000 + ["mid"] * 97 + ["small"] * 9 + ["one"])
    ids = rng.permutation(len(strats)).astype(np.int64) * 977 + 3
    import ray.data as rd
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "lang": pa.array(strats, pa.string())}))
    got = stratified_split(ds).to_pandas()
    want = _oracle(ids, strats)
    assert len(got) == len(ids)
    assert got.doc_id.nunique() == len(ids)
    got_map = dict(zip(got.doc_id.astype(int), got.split))
    assert got_map == want
    # exact proportions per stratum
    for s, g in got.groupby("lang"):
        n = len(g)
        c1, c2 = _cutoffs(n)
        vc = g.split.value_counts()
        assert vc.get("train", 0) == c1
        assert vc.get("val", 0) == c2 - c1
        assert vc.get("test", 0) == n - c2


def test_split_deterministic_across_runs(ray_session):
    import ray.data as rd
    ids = np.arange(0, 500, dtype=np.int64)
    t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "lang": pa.array(["x" if i % 3 else "y"
                                    for i in ids], pa.string())})
    a = stratified_split(rd.from_arrow(t)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = stratified_split(rd.from_arrow(t)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
