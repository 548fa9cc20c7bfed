"""Incremental (delta) append tests — `index.append.append_index`.

Contract: appending new conversations produces per-(conv_id, turn_idx)
BM25 scores IDENTICAL to a from-scratch build over the union corpus
(same N, avgdl, df), without rewriting any pre-existing artifact file.
"""

import hashlib
import glob
import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def split_corpus(tiny_corpus, tmp_path_factory):
    """The golden fixture corpus split by conversation into two parquet
    halves (A, B) + the full table."""
    path, oi, _ = tiny_corpus
    t = pa.concat_tables([pq.read_table(os.path.join(path, f))
                          for f in sorted(os.listdir(path))])
    convs = sorted(set(t.column("conv_id").to_pylist()))
    half = pa.array(convs[:len(convs) // 2])
    mask = pc.is_in(t.column("conv_id"), value_set=half)
    d = tmp_path_factory.mktemp("split")
    pq.write_table(t.filter(mask), str(d / "a.parquet"))
    pq.write_table(t.filter(pc.invert(mask)), str(d / "b.parquet"))
    return str(d / "a.parquet"), str(d / "b.parquet"), t, oi


def _tree_hashes(idx, subdirs=("postings", "doc_lens", "dict_partials")):
    out = {}
    for sub in subdirs:
        for p in sorted(glob.glob(os.path.join(idx, sub, "*.parquet"))):
            with open(p, "rb") as f:
                out[os.path.relpath(p, idx)] = hashlib.sha256(
                    f.read()).hexdigest()
    return out


@pytest.fixture(scope="module")
def appended_index(ray_session, split_corpus, tmp_path_factory):
    from bge_m3_onnx_ray.config import create_tiny_index_config
    from bge_m3_onnx_ray.index.append import append_index
    from bge_m3_onnx_ray.index.build import build_index
    pa_path, pb_path, _t, _oi = split_corpus
    idx = str(tmp_path_factory.mktemp("aidx") / "index")
    build_index(pa_path, idx, create_tiny_index_config())
    before = _tree_hashes(idx)
    res = append_index(pb_path, idx)
    return idx, res, before


def test_append_never_rewrites_existing_files(appended_index):
    idx, res, before = appended_index
    assert res["appended_docs"] > 0
    after = _tree_hashes(idx)
    for rel, h in before.items():
        assert after[rel] == h, f"append rewrote pre-existing file {rel}"
    assert len(after) > len(before)  # new shard files appeared


def test_append_scores_match_full_rebuild(appended_index, split_corpus,
                                          tiny_corpus):
    """Per-(conv_id, turn_idx) scores after append == a from-scratch
    build over the union corpus (the pure-Python oracle); rank sets
    equal up to docID tie-break permutations within equal scores."""
    from bge_m3_onnx_ray.config import QueryConfig
    from bge_m3_onnx_ray.fixtures import gen_queries
    from bge_m3_onnx_ray.index.search import search
    idx, _res, _ = appended_index
    _, oi, queries = tiny_corpus
    got = search(idx, queries, QueryConfig(k=10, method="wand")).to_pandas()
    for qid, text in queries:
        mine = got[got.query_id == qid]
        want = oi.search(text, k=10)
        assert len(mine) == len(want), (qid, text)
        ws = {(w["conv_id"], w["turn_idx"]): w["score"] for w in want}
        assert sorted(mine.score.tolist()) == pytest.approx(
            sorted(ws.values()), abs=1e-12)
        for _, r in mine.iterrows():
            key = (r.conv_id, int(r.turn_idx))
            if key in ws:  # same doc picked: score must be exact
                assert r.score == pytest.approx(ws[key], abs=1e-12)


def test_append_wand_equals_exhaustive(appended_index, tiny_corpus):
    from bge_m3_onnx_ray.config import QueryConfig
    from bge_m3_onnx_ray.index.search import search
    idx, _res, _ = appended_index
    _, _, queries = tiny_corpus
    w = search(idx, queries, QueryConfig(k=10, method="wand")).to_pandas() \
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    e = search(idx, queries,
               QueryConfig(k=10, method="exhaustive")).to_pandas() \
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert w.equals(e)


def test_append_overlap_rejected(appended_index, split_corpus):
    from bge_m3_onnx_ray.index.append import append_index
    idx, _res, _ = appended_index
    pa_path, _pb, _t, _oi = split_corpus
    with pytest.raises(ValueError, match="already in the index"):
        append_index(pa_path, idx)


def test_append_invalidates_positions(appended_index, split_corpus,
                                      tmp_path_factory):
    """A positions artifact built pre-append must be detected as stale
    (offsets digest) and a rebuild must serve the union corpus."""
    from bge_m3_onnx_ray.config import create_tiny_index_config
    from bge_m3_onnx_ray.index.append import append_index
    from bge_m3_onnx_ray.index.build import build_index
    from bge_m3_onnx_ray.index.positions import (build_positions,
                                                 has_positions,
                                                 phrase_search)
    pa_path, pb_path, t, oi = split_corpus
    idx = str(tmp_path_factory.mktemp("pidx") / "index")
    build_index(pa_path, idx, create_tiny_index_config())
    build_positions(pa_path, idx)
    assert has_positions(idx)
    append_index(pb_path, idx)
    assert not has_positions(idx)     # stale: pre-append corpus only
    # rebuild over the union (one dataset covering both halves)
    import ray.data as rd
    union = rd.from_arrow(t)
    build_positions(union, idx)
    assert has_positions(idx)
    phrase = " ".join(oi.doc_tokens[0][:2])
    got = phrase_search(idx, [(0, phrase)], k=10).to_pandas()
    want = oi.phrase_search(phrase, k=10)
    assert len(got) == len(want)
    # tie-robust: docIDs (and hence tie-break order among equal scores)
    # differ between the appended index and the oracle's dense ranks
    gset = {(r.conv_id, int(r.turn_idx), int(r.tf), round(r.score, 12))
            for _, r in got.iterrows()}
    wset = {(w["conv_id"], w["turn_idx"], w["tf"], round(w["score"], 12))
            for w in want}
    assert gset == wset


def test_compact_byte_identical_to_fresh_build(appended_index, split_corpus,
                                               tiny_corpus, tmp_path_factory):
    """compact(append(A, B)) must produce artifacts byte-identical to a
    from-scratch build over A∪B — compaction provably loses nothing and
    restores the dense-docID invariant. A current positions artifact is
    compacted too (same byte-identity vs a fresh build_positions)."""
    from bge_m3_onnx_ray.config import create_tiny_index_config
    from bge_m3_onnx_ray.index.build import build_index
    from bge_m3_onnx_ray.index.compact import compact_index
    from bge_m3_onnx_ray.index.positions import build_positions, has_positions
    idx, _res, _ = appended_index
    path, _oi, _ = tiny_corpus
    # give the appended index a CURRENT positions artifact (the appended
    # union corpus) so compaction must carry it over
    import pyarrow.parquet as _pq
    import ray.data as _rd
    pa_path, pb_path, t, _ = split_corpus
    build_positions(_rd.from_arrow(t), idx)
    assert has_positions(idx)
    out = str(tmp_path_factory.mktemp("cidx") / "compacted")
    r = compact_index(idx, out)
    assert r["positions_groups"] > 0
    fresh = str(tmp_path_factory.mktemp("fidx") / "fresh")
    build_index(path, fresh, create_tiny_index_config())
    build_positions(path, fresh)
    assert has_positions(out)
    subs = ("postings", "doc_lens", "dict_partials", "dictionary",
            "positions")
    a = _tree_hashes(out, subs)
    b = _tree_hashes(fresh, subs)
    assert a == b and len(a) > 0
    for fn in ("conv_offsets.parquet",):
        with open(os.path.join(out, fn), "rb") as f1, \
             open(os.path.join(fresh, fn), "rb") as f2:
            assert hashlib.sha256(f1.read()).digest() == \
                hashlib.sha256(f2.read()).digest()
    import json
    with open(os.path.join(out, "stats.json")) as f:
        sa = json.load(f)
    with open(os.path.join(fresh, "stats.json")) as f:
        sb = json.load(f)
    assert sa == sb
    assert r["n_docs"] == sb["n_docs"]


def test_compact_refuses_nonempty_target(appended_index, tmp_path_factory):
    from bge_m3_onnx_ray.index.compact import compact_index
    idx, _res, _ = appended_index
    d = tmp_path_factory.mktemp("nonempty")
    (d / "junk.txt").write_text("x")
    with pytest.raises(ValueError, match="not empty"):
        compact_index(idx, str(d))


def test_append_empty_noop(appended_index, tmp_path_factory):
    from bge_m3_onnx_ray.index.append import append_index
    idx, _res, _ = appended_index
    d = tmp_path_factory.mktemp("empty")
    t = pa.table({"conv_id": pa.array([], pa.string()),
                  "turn_idx": pa.array([], pa.int32()),
                  "text": pa.array([], pa.string())})
    pq.write_table(t, str(d / "e.parquet"))
    res = append_index(str(d / "e.parquet"), idx)
    assert res == {"appended_docs": 0, "skipped": True}


def test_upsert_chain_equals_fresh_build(tiny_corpus, tmp_path_factory,
                                         ray_session):
    """UPDATE = delete old versions -> compact -> delta-append revised
    texts: per-(conv, turn) BM25 scores must come out EXACTLY as a fresh
    build over the updated corpus (N, avgdl, every df)."""
    from bge_m3_onnx_ray.config import QueryConfig, create_tiny_index_config
    from bge_m3_onnx_ray.index.append import append_index
    from bge_m3_onnx_ray.index.build import build_index
    from bge_m3_onnx_ray.index.compact import compact_index
    from bge_m3_onnx_ray.index.delete import delete_convs
    from bge_m3_onnx_ray.index.search import search

    path, _, _ = tiny_corpus
    t = pa.concat_tables([pq.read_table(os.path.join(path, f))
                          for f in sorted(os.listdir(path))])
    convs = sorted(set(t.column("conv_id").to_pylist()))
    upd = convs[::17][:5]                   # a handful of revised convs
    cfg = create_tiny_index_config()
    d = tmp_path_factory.mktemp("upsert")

    mask = pc.is_in(t.column("conv_id"), value_set=pa.array(upd))
    revised = t.filter(mask)
    revised = revised.set_column(
        revised.schema.get_field_index("text"), "text",
        pc.binary_join_element_wise(revised.column("text").cast(pa.string()),
                                    " upsertrev", ""))
    rev_path = str(d / "revised.parquet")
    pq.write_table(revised, rev_path)

    # chain: build -> delete -> compact -> append
    base = str(d / "base")
    build_index(path, base, cfg)
    delete_convs(base, upd)
    chained = str(d / "chained")
    compact_index(base, chained)
    append_index(rev_path, chained)

    # fresh build over the UPDATED corpus
    upd_path = str(d / "updated.parquet")
    pq.write_table(pa.concat_tables(
        [t.filter(pc.invert(mask)), revised]), upd_path)
    fresh = str(d / "fresh")
    build_index(upd_path, fresh, cfg)

    queries = [(0, "data order"), (1, "upsertrev"), (2, "table filter")]
    qcfg = QueryConfig(k=10**6, method="exhaustive")
    key = ["conv_id", "turn_idx", "query_id"]
    a = search(chained, queries, qcfg).to_pandas() \
        .sort_values(key).reset_index(drop=True)
    b = search(fresh, queries, qcfg).to_pandas() \
        .sort_values(key).reset_index(drop=True)
    assert len(a) == len(b) and len(a[a.query_id == 1]) > 0
    assert a[key].equals(b[key])
    assert list(a.score) == list(b.score)   # bit-identical


def test_append_positions_matches_fresh(tiny_corpus, tmp_path, ray_session):
    """append_positions: phrase results over (base build + positional
    delta-append) are identical to positions built from scratch over
    the union; appending without a base artifact raises."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import pytest
    import ray.data as rd

    from bge_m3_onnx_ray.config import create_tiny_index_config
    from bge_m3_onnx_ray.index.append import append_index
    from bge_m3_onnx_ray.index.build import build_index
    from bge_m3_onnx_ray.index.positions import (append_positions,
                                                 build_positions,
                                                 phrase_search)
    path, oi, _ = tiny_corpus
    t = pq.read_table(path)
    convs = sorted(set(t.column("conv_id").to_pylist()))
    half = set(convs[: len(convs) // 2])
    mask = pa.array([c in half for c in t.column("conv_id").to_pylist()])
    a, b = t.filter(mask), t.filter(pc.invert(mask))

    fresh = str(tmp_path / "fresh")
    build_index(rd.from_arrow(t), fresh, create_tiny_index_config())
    build_positions(rd.from_arrow(t), fresh)

    inc = str(tmp_path / "inc")
    build_index(rd.from_arrow(a), inc, create_tiny_index_config())
    with pytest.raises(FileNotFoundError, match="positions"):
        append_positions(rd.from_arrow(b), inc)
    build_positions(rd.from_arrow(a), inc)
    append_index(rd.from_arrow(b), inc)
    append_positions(rd.from_arrow(b), inc)

    # phrases drawn from both halves of the corpus
    texts = t.column("text").to_pylist()
    phrases, qid = [], 0
    for x in texts[:50]:
        ws = oi.tok.tokenize(x)
        if len(ws) >= 2:
            phrases.append((qid, f"{ws[0]} {ws[1]}"))
            qid += 1
        if qid >= 6:
            break
    assert len(phrases) >= 3
    fa = phrase_search(fresh, phrases, 10).to_pandas()
    fb = phrase_search(inc, phrases, 10).to_pandas()
    cols = ["query_id", "conv_id", "turn_idx", "tf"]
    fa = fa.sort_values(cols).reset_index(drop=True)
    fb = fb.sort_values(cols).reset_index(drop=True)
    assert len(fa) == len(fb) > 0
    assert fa[cols].equals(fb[cols])
    assert fa.score.tolist() == fb.score.tolist()   # bit-identical
