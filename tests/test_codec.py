"""Varint/delta postings codec round-trip — property-based (SURVEY.md §5
``test_index_parity`` round-trip requirement)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from bge_m3_onnx_ray.index.codec import (
    decode_block,
    decode_postings,
    decode_varints,
    encode_postings,
    encode_varints,
)


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=500))
@settings(max_examples=50, deadline=None)
def test_varint_roundtrip(vals):
    a = np.array(vals, np.uint64)
    buf, nb = encode_varints(a)
    assert np.array_equal(decode_varints(buf), a)
    assert int(nb.sum()) == len(buf) if len(vals) else buf == b""


@given(st.lists(st.lists(st.integers(min_value=0, max_value=10**12),
                          min_size=1, max_size=60, unique=True),
                min_size=1, max_size=20))
@settings(max_examples=30, deadline=None)
def test_segments_roundtrip(segments):
    from bge_m3_onnx_ray.index.codec import decode_segment, encode_segments
    segs = [np.array(sorted(s), np.int64) for s in segments]
    docs = np.concatenate(segs)
    rng = np.random.default_rng(1)
    tfs = rng.integers(1, 100, len(docs)).astype(np.int64)
    dls = rng.integers(0, 5000, len(docs)).astype(np.int64)
    bounds = np.concatenate([[0], np.cumsum([len(s) for s in segs])])
    blob, offs = encode_segments(bounds, docs, tfs, dls)
    for i, seg in enumerate(segs):
        d, t, l = decode_segment(blob[offs[i]:offs[i + 1]], len(seg))
        s, e = bounds[i], bounds[i + 1]
        assert np.array_equal(d, seg)
        assert np.array_equal(t, tfs[s:e])
        assert np.array_equal(l, dls[s:e])


@given(
    st.lists(st.integers(min_value=0, max_value=10**12), min_size=1, max_size=400,
             unique=True),
    st.integers(min_value=1, max_value=64),
)
@settings(max_examples=40, deadline=None)
def test_postings_roundtrip(doc_ids, block_size):
    docs = np.array(sorted(doc_ids), np.int64)
    rng = np.random.default_rng(0)
    tfs = rng.integers(1, 1000, len(docs)).astype(np.int64)
    dls = rng.integers(0, 100000, len(docs)).astype(np.int64)
    enc = encode_postings(docs, tfs, dls, block_size)
    d, t, l = decode_postings(enc, block_size)
    assert np.array_equal(d, docs)
    assert np.array_equal(t, tfs)
    assert np.array_equal(l, dls)
    # per-block decode + metadata
    n_blocks = len(enc.last_ids)
    for bi in range(n_blocks):
        bd, bt, bl = decode_block(enc, bi, block_size)
        s, e = bi * block_size, min((bi + 1) * block_size, len(docs))
        assert np.array_equal(bd, docs[s:e])
        assert int(enc.max_tf[bi]) == int(tfs[s:e].max())
        assert int(enc.min_dl[bi]) == int(dls[s:e].min())
        assert int(enc.last_ids[bi]) == int(docs[e - 1])


@given(
    st.lists(st.lists(st.integers(min_value=0, max_value=10**12),
                      min_size=1, max_size=300, unique=True),
             min_size=1, max_size=12),
    st.integers(min_value=1, max_value=64),
)
@settings(max_examples=30, deadline=None)
def test_decode_postings_file_matches_per_term(term_lists, block_size):
    """Whole-file vectorized decode (the serve-actor load path) must be
    row-for-row identical to the per-term decode_postings loop."""
    import pyarrow as pa
    from bge_m3_onnx_ray.index.codec import decode_postings_file
    rng = np.random.default_rng(2)
    encs = []
    for lst in term_lists:
        docs = np.array(sorted(lst), np.int64)
        tfs = rng.integers(1, 1000, len(docs)).astype(np.int64)
        dls = rng.integers(0, 100000, len(docs)).astype(np.int64)
        encs.append((docs, tfs, dls, encode_postings(docs, tfs, dls,
                                                     block_size)))
    table = pa.table({
        "term": pa.array([f"t{i}" for i in range(len(encs))], pa.string()),
        "df": pa.array([e.n for *_, e in encs], pa.int64()),
        "last_ids": pa.array([e.last_ids.tolist() for *_, e in encs],
                             pa.list_(pa.int64())),
        "max_tf": pa.array([e.max_tf.tolist() for *_, e in encs],
                           pa.list_(pa.int32())),
        "min_dl": pa.array([e.min_dl.tolist() for *_, e in encs],
                           pa.list_(pa.int32())),
        "offs": pa.array([e.offs.tolist() for *_, e in encs],
                         pa.list_(pa.int32())),
        "blob": pa.array([e.blob for *_, e in encs], pa.binary()),
    })
    counts, d_all, t_all, l_all = decode_postings_file(table, block_size)
    pos = 0
    for i, (docs, tfs, dls, e) in enumerate(encs):
        assert int(counts[i]) == len(docs)
        z = pos + len(docs)
        assert np.array_equal(d_all[pos:z], docs)
        assert np.array_equal(t_all[pos:z], tfs)
        assert np.array_equal(l_all[pos:z], dls)
        pos = z
