"""Reshard lifecycle: split and shrink an index (including non-aligned
boundaries) and prove search results are IDENTICAL to the source index
— same docs, same ranks, float-equal scores — plus artifact sanity."""

import json
import os
import shutil

import pytest


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    import bge_m3_onnx_ray as eng
    from bge_m3_onnx_ray.config import create_tiny_index_config
    from bge_m3_onnx_ray.fixtures import transcripts_path

    idx = str(tmp_path_factory.mktemp("reshard") / "src")
    eng.build_index(transcripts_path(2000), idx,
                    create_tiny_index_config())
    return idx


@pytest.mark.parametrize("new_dps", [48, 256])   # split (non-aligned) + shrink
def test_reshard_search_identical(built, new_dps):
    import bge_m3_onnx_ray as eng
    from bge_m3_onnx_ray.config import QueryConfig
    from bge_m3_onnx_ray.fixtures import gen_queries
    from bge_m3_onnx_ray.index.reshard import reshard_index

    dst = built + f"-r{new_dps}"
    shutil.rmtree(dst, ignore_errors=True)
    info = reshard_index(built, dst, new_dps)
    assert info["docs_per_shard"] == new_dps
    assert info["n_shards"] == (2000 + new_dps - 1) // new_dps

    q = gen_queries(10)
    a = eng.search(built, q, QueryConfig(k=10)).to_pandas() \
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    b = eng.search(dst, q, QueryConfig(k=10)).to_pandas() \
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert a.equals(b), "resharded search diverged from source"

    # WAND must agree too (block metadata was re-derived)
    bw = eng.search(dst, q, QueryConfig(k=10, method="wand")).to_pandas() \
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert a.equals(bw)

    # doc accounting conserved across the new manifest
    man = json.load(open(os.path.join(dst, "manifest.json")))
    assert sum(s["n_docs"] for s in man["shards"].values()) == 2000
    stats = json.load(open(os.path.join(dst, "stats.json")))
    src_stats = json.load(open(os.path.join(built, "stats.json")))
    assert stats["avgdl"] == src_stats["avgdl"]
    assert stats["n_docs"] == src_stats["n_docs"]


def test_reshard_refuses_optional_artifacts(built, tmp_path):
    from bge_m3_onnx_ray.index.reshard import reshard_index

    src2 = str(tmp_path / "with_tombs")
    shutil.copytree(built, src2)
    os.makedirs(os.path.join(src2, "tombstones"))
    with pytest.raises(NotImplementedError):
        reshard_index(src2, str(tmp_path / "dst"), 128)
    # explicit drop: reshard proceeds, destination has no tombstones
    reshard_index(src2, str(tmp_path / "dst2"), 128,
                  drop=("tombstones",))
    assert not os.path.isdir(os.path.join(str(tmp_path / "dst2"),
                                          "tombstones"))
