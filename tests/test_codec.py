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
