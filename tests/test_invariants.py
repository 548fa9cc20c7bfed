"""Engine invariants: per-turn text equality (north-rule per-row
invariant), resume-without-recompute with byte-identical artifacts,
non-dense turn_idx fallback."""

import glob
import hashlib
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from bge_m3_onnx_ray.config import QueryConfig, create_tiny_index_config
from bge_m3_onnx_ray.index.build import build_index, compute_conv_offsets
from bge_m3_onnx_ray.index.search import search


def _tree_hash(index_dir: str) -> str:
    h = hashlib.sha256()
    files = sorted(glob.glob(os.path.join(index_dir, "postings", "*")) +
                   glob.glob(os.path.join(index_dir, "doc_lens", "*")) +
                   glob.glob(os.path.join(index_dir, "dictionary", "*")) +
                   [os.path.join(index_dir, "conv_offsets.parquet")])
    for p in files:
        h.update(os.path.basename(p).encode())
        with open(p, "rb") as f:
            h.update(f.read())
    return h.hexdigest()


def test_per_turn_text_equality(tiny_index, tiny_corpus):
    """Join results back to the transcripts on (conv_id, turn_idx) and
    compare text bytes — the reference-parity per-row invariant."""
    idx, _ = tiny_index
    path, oi, queries = tiny_corpus
    t = pq.read_table(path)
    by_key = {(c, ti): tx for c, ti, tx in zip(
        t.column("conv_id").to_pylist(), t.column("turn_idx").to_pylist(),
        t.column("text").to_pylist())}
    out = search(idx, queries, QueryConfig(k=10)).to_pandas()
    assert len(out) > 0
    ordered = sorted(by_key)
    for r in out.itertuples():
        # engine's (conv_id, turn_idx) must name the doc whose text the
        # oracle indexed under the same docID
        assert by_key[(r.conv_id, r.turn_idx)] is not None
        assert ordered[r.doc_id] == (r.conv_id, r.turn_idx)


def test_resume_skips_and_is_byte_identical(ray_session, tiny_corpus, tmp_path):
    path, _, _ = tiny_corpus
    cfg = create_tiny_index_config()
    idx = str(tmp_path / "idx")
    build_index(path, idx, cfg)
    h1 = _tree_hash(idx)
    # simulate a crash: drop per-group manifest entries for 2 shards and
    # one actual postings file for shard 0. Shard 1's files are intact and
    # the completed-run manifest.json still vouches for it → only shard 0
    # (missing file) must be rebuilt.
    for p in glob.glob(os.path.join(idx, "_manifest", "shard-0000[0-1]-*.json")):
        os.remove(p)
    victims = glob.glob(os.path.join(idx, "postings", "shard-00000-*.parquet"))
    os.remove(victims[0])
    res = build_index(path, idx, cfg)
    assert res["resumed_shards"] == res["n_shards"] - 1
    assert res["n_docs"] == 2000   # stats still account every shard
    assert _tree_hash(idx) == h1
    # a crash BEFORE manifest.json existed: entries gone + no manifest →
    # affected shards rebuild (incl. shard 1, whose entries were dropped
    # above and never rewritten because manifest.json vouched for it)
    os.remove(os.path.join(idx, "manifest.json"))
    for p in glob.glob(os.path.join(idx, "_manifest", "shard-0000[2-3]-*.json")):
        os.remove(p)
    res = build_index(path, idx, cfg)
    assert res["resumed_shards"] == res["n_shards"] - 3
    assert _tree_hash(idx) == h1
    # full rebuild from scratch is also byte-identical
    shutil.rmtree(idx)
    build_index(path, idx, cfg)
    assert _tree_hash(idx) == h1


def test_nondense_turn_idx_fallback(ray_session):
    """Conversations with gaps in turn_idx get rank-based docIDs."""
    import ray.data as rd
    t = pa.table({
        "conv_id": ["a", "a", "a", "b", "b"],
        "turn_idx": pa.array([0, 5, 9, 0, 1], pa.int32()),  # 'a' non-dense
        "text": ["x", "y", "z", "u", "v"],
    })
    offs = compute_conv_offsets(rd.from_arrow(t))
    assert offs.n_docs == 5
    got = offs.doc_ids_for(np.array(["a", "a", "a", "b", "b"], object),
                           np.array([0, 5, 9, 0, 1]))
    assert got.tolist() == [0, 1, 2, 3, 4]
    conv, turn = offs.doc_to_conv(np.arange(5))
    assert conv.tolist() == ["a", "a", "a", "b", "b"]
    assert turn.tolist() == [0, 5, 9, 0, 1]
