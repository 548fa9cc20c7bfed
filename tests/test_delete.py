"""Tombstone deletion tests — `index.delete` + tombstone-dropping
compaction.

Contract (Lucene live-docs semantics): a delete never rewrites postings;
scorers exclude tombstoned docIDs from every candidate set while the
global statistics (N, avgdl, df) keep their as-built values. Compaction
drops the deleted documents physically and recomputes the statistics —
byte-identical to a fresh build over the surviving corpus.
"""

import glob
import hashlib
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from bge_m3_onnx_ray.config import QueryConfig, create_tiny_index_config
from bge_m3_onnx_ray.index.delete import (delete_convs, delete_docs,
                                          load_tombstones)


def _tree_hashes(idx, subdirs=("postings", "doc_lens", "dict_partials",
                               "dictionary")):
    out = {}
    for sub in subdirs:
        for p in sorted(glob.glob(os.path.join(idx, sub, "*.parquet"))):
            with open(p, "rb") as f:
                out[os.path.relpath(p, idx)] = hashlib.sha256(
                    f.read()).hexdigest()
    return out


@pytest.fixture(scope="module")
def del_index(ray_session, tiny_corpus, tmp_path_factory):
    """An index over the golden corpus with every third conversation
    tombstoned (whole convs, so compaction can drop them)."""
    from bge_m3_onnx_ray.index.build import build_index
    path, oi, queries = tiny_corpus
    idx = str(tmp_path_factory.mktemp("didx") / "index")
    build_index(path, idx, create_tiny_index_config())
    convs = sorted({c for c, _ in oi.doc_keys})
    dead_convs = set(convs[::3])
    delete_convs(idx, dead_convs)
    dead_docs = {i for i, (c, _) in enumerate(oi.doc_keys)
                 if c in dead_convs}
    return idx, dead_convs, dead_docs


@pytest.mark.parametrize("method", ["exhaustive", "wand"])
def test_deleted_never_surface_scores_unchanged(del_index, tiny_corpus,
                                                method):
    """Engine over the tombstoned index ≡ oracle's FULL-corpus ranking
    with the dead docs filtered out — deleted docs never surface AND
    surviving docs keep their as-built scores (live-docs stats)."""
    from bge_m3_onnx_ray.index.search import search
    idx, _dead_convs, dead_docs = del_index
    _, oi, queries = tiny_corpus
    got = search(idx, queries, QueryConfig(k=10, method=method)).to_pandas()
    for qid, text in queries:
        mine = got[got.query_id == qid].sort_values("rank")
        want = [h for h in oi.search(text, 10_000_000)
                if h["doc_id"] not in dead_docs][:10]
        assert len(mine) == len(want), (qid, text)
        for (_, r), h in zip(mine.iterrows(), want):
            assert int(r.doc_id) == h["doc_id"], (qid, text)
            assert r.score == pytest.approx(h["score"], abs=1e-12)
        assert not any(int(d) in dead_docs for d in mine.doc_id)


def test_delete_idempotent_and_validated(del_index, tiny_corpus):
    idx, dead_convs, dead_docs = del_index
    n0 = len(load_tombstones(idx))
    assert n0 == len(dead_docs)
    res = delete_convs(idx, dead_convs)         # re-delete: no-op
    assert res["n_new"] == 0 and res["n_tombstones"] == n0
    with pytest.raises(ValueError, match="out of range"):
        delete_docs(idx, [10**9])
    with pytest.raises(KeyError, match="not in index"):
        delete_convs(idx, ["no-such-conversation"])
    assert len(load_tombstones(idx)) == n0      # failed calls changed nothing


def test_compact_drops_deleted_byte_identical(del_index, tiny_corpus,
                                              tmp_path_factory):
    """compact(tombstoned index) ≡ fresh build over the surviving corpus:
    same artifact bytes, same stats.json, no tombstones carried over."""
    import json

    from bge_m3_onnx_ray.index.build import build_index
    from bge_m3_onnx_ray.index.compact import compact_index
    from bge_m3_onnx_ray.index.delete import tombstones_file
    idx, dead_convs, dead_docs = del_index
    path, _oi, _ = tiny_corpus
    out = str(tmp_path_factory.mktemp("dcout") / "compacted")
    r = compact_index(idx, out)
    assert r["dropped_docs"] == len(dead_docs)
    # fresh build over the survivors
    t = pq.read_table(path)
    keep = pc.invert(pc.is_in(t.column("conv_id"),
                              value_set=pa.array(sorted(dead_convs))))
    surv_dir = tmp_path_factory.mktemp("surv")
    pq.write_table(t.filter(keep), str(surv_dir / "s.parquet"))
    fresh = str(tmp_path_factory.mktemp("dfidx") / "fresh")
    build_index(str(surv_dir / "s.parquet"), fresh,
                create_tiny_index_config())
    a, b = _tree_hashes(out), _tree_hashes(fresh)
    assert a == b and len(a) > 0
    with open(os.path.join(out, "conv_offsets.parquet"), "rb") as f1, \
         open(os.path.join(fresh, "conv_offsets.parquet"), "rb") as f2:
        assert hashlib.sha256(f1.read()).digest() == \
            hashlib.sha256(f2.read()).digest()
    with open(os.path.join(out, "stats.json")) as f:
        sa = json.load(f)
    with open(os.path.join(fresh, "stats.json")) as f:
        sb = json.load(f)
    assert sa == sb
    assert not os.path.exists(tombstones_file(out))


def test_partial_conv_tombstone_compact_raises(ray_session, tiny_corpus,
                                               tmp_path_factory):
    """Tombstoning one turn of a multi-turn conversation must make
    compaction raise (it drops whole conversations only) — never skew
    silently."""
    from bge_m3_onnx_ray.index.build import build_index
    from bge_m3_onnx_ray.index.compact import compact_index
    path, oi, _ = tiny_corpus
    idx = str(tmp_path_factory.mktemp("pidx2") / "index")
    build_index(path, idx, create_tiny_index_config())
    # find a conversation with >= 2 turns; tombstone only its first doc
    from collections import Counter
    counts = Counter(c for c, _ in oi.doc_keys)
    conv = next(c for c in sorted(counts) if counts[c] >= 2)
    doc = next(i for i, (c, _) in enumerate(oi.doc_keys) if c == conv)
    delete_docs(idx, [doc])
    out = str(tmp_path_factory.mktemp("pout") / "compacted")
    with pytest.raises(NotImplementedError, match="partially"):
        compact_index(idx, out)


def test_delete_by_query(tiny_index, tiny_corpus, tmp_path, ray_session):
    """delete_by_query tombstones exactly the OR match set; searches
    then exclude those docs under live-docs semantics; a no-match query
    deletes nothing; re-running is idempotent."""
    import shutil

    from bge_m3_onnx_ray.config import QueryConfig
    from bge_m3_onnx_ray.index.delete import delete_by_query, load_tombstones
    from bge_m3_onnx_ray.index.search import search
    idx, _ = tiny_index
    _, oi, queries = tiny_corpus
    my = str(tmp_path / "idx")
    shutil.copytree(idx, my)
    vocab = sorted(oi.postings)
    target = max(vocab, key=lambda t: len(oi.postings[t]))
    expect = {d for d, _ in oi.postings[target]}
    r = delete_by_query(my, target)
    assert r["n_matched"] == len(expect)
    assert set(load_tombstones(my).tolist()) == expect
    r2 = delete_by_query(my, target)            # idempotent
    assert r2["n_new"] == 0
    r3 = delete_by_query(my, "zzzneverseen")
    assert r3["n_matched"] == 0
    out = search(my, queries, QueryConfig(k=1000)).to_pandas()
    assert not set(out.doc_id).intersection(expect)
