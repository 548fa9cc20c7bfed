"""Posting-list codec: delta + LEB128 varint, fixed-size skip blocks,
per-block max-score metadata.

Per term the on-disk record is::

    n          total posting entries
    last_ids   int64[n_blocks]   last docID of each block (skip pointers)
    max_tf     int32[n_blocks]   max term frequency in block
    min_dl     int32[n_blocks]   min doc length in block
    offs       int32[n_blocks+1] byte offsets of blocks inside ``blob``
    blob       bytes             per block: varint(docID deltas) ++
                                 varint(tfs) ++ varint(dls)

``(max_tf, min_dl)`` give an exact-at-load-time upper bound for block-max
WAND: ``bm25_term_score`` is increasing in tf and decreasing in dl, so
``score(max_tf, min_dl)`` bounds every posting in the block. Storing the
two ints (instead of a float score) means global stats (N, avgdl) — which
are only known after the full build pass — are NOT needed at encode time:
no second sweep over the index (SURVEY.md §7.4 "global stats before
per-block max-scores"). Doc lengths are stored inline per posting so a
scorer needs no side doc-length table (at 10^12 docs a doc-length array
is not broadcastable); the ~1 byte/posting cost buys locality.

Encode/decode are numpy-vectorized (no per-value Python loop).
"""

from __future__ import annotations

import numpy as np


def encode_varints(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """LEB128-encode a uint64 array. Returns (bytes, per-value byte counts).

    Shrinking-subset formulation: byte position 0 is written for EVERY
    value with whole-array ops (no index gather — the scatter target
    ``starts`` is sorted and nearly contiguous), then each further byte
    position operates only on the still-multibyte subset. Posting streams
    are dominated by 1-byte values (small gaps/tfs/dls), so the tail
    passes touch a few percent of the data — measured ~3x over the
    previous all-values-per-position scatter."""
    a = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(a)
    if n == 0:
        return b"", np.empty(0, np.int64)
    # byte counts via threshold comparisons (no shifted copies)
    nb = np.ones(n, np.int64)
    t = np.uint64(1 << 7)
    mx = int(a.max())
    while mx >= int(t):
        nb += a >= t
        if int(t) >= (1 << 56):
            break  # t<<7 would overflow uint64; 2^63 is the last threshold
        t = t << np.uint64(7)
    out = np.empty(int(nb.sum()), np.uint8)
    starts = np.zeros(n, np.int64)
    np.cumsum(nb[:-1], out=starts[1:])
    out[starts] = (a & np.uint64(0x7F)).astype(np.uint8) \
        | ((nb > 1).astype(np.uint8) << 7)
    sel = np.flatnonzero(nb > 1)
    if len(sel):
        rem = a[sel] >> np.uint64(7)
        pos = starts[sel] + 1
        left = nb[sel] - 1
        while True:
            out[pos] = (rem & np.uint64(0x7F)).astype(np.uint8) \
                | ((left > 1).astype(np.uint8) << 7)
            keep = left > 1
            if not keep.any():
                break
            rem = rem[keep] >> np.uint64(7)
            pos = pos[keep] + 1
            left = left[keep] - 1
    return out.tobytes(), nb


def decode_varints(buf, count: int | None = None) -> np.ndarray:
    """Decode a LEB128 stream to uint64. Vectorized: byte position 0 is
    gathered for every value in one pass (the gather index is sorted and
    nearly contiguous for 1-byte-dominated posting streams), then each
    further position touches only the still-multibyte subset. ``buf``:
    bytes or a uint8 ndarray view (zero-copy path)."""
    b = buf if isinstance(buf, np.ndarray) else np.frombuffer(buf, np.uint8)
    if len(b) == 0:
        return np.empty(0, np.uint64)
    is_end = (b & 0x80) == 0
    ends = np.flatnonzero(is_end)
    if count is not None:
        ends = ends[:count]
    starts = np.empty(len(ends), np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    vals = (b[starts] & np.uint64(0x7F)).astype(np.uint64)
    sel = np.flatnonzero(lengths > 1)
    if len(sel):
        pos = starts[sel] + 1
        left = lengths[sel] - 1
        shift = np.uint64(7)
        while True:
            vals[sel] |= (b[pos].astype(np.uint64) & np.uint64(0x7F)) << shift
            keep = left > 1
            if not keep.any():
                break
            sel = sel[keep]
            pos = pos[keep] + 1
            left = left[keep] - 1
            shift += np.uint64(7)
    return vals


class EncodedPostings:
    __slots__ = ("n", "last_ids", "max_tf", "min_dl", "offs", "blob")

    def __init__(self, n, last_ids, max_tf, min_dl, offs, blob):
        self.n = n
        self.last_ids = last_ids
        self.max_tf = max_tf
        self.min_dl = min_dl
        self.offs = offs
        self.blob = blob


def encode_postings(doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray,
                    block_size: int = 128) -> EncodedPostings:
    """``doc_ids`` must be strictly increasing int64."""
    n = len(doc_ids)
    doc_ids = np.ascontiguousarray(doc_ids, np.int64)
    tfs = np.ascontiguousarray(tfs, np.int64)
    dls = np.ascontiguousarray(dls, np.int64)
    n_blocks = (n + block_size - 1) // block_size
    gaps = np.empty(n, np.int64)
    gaps[0] = doc_ids[0] + 1  # delta from implicit previous docID -1
    gaps[1:] = np.diff(doc_ids)
    # block boundaries: re-base the first gap of each block on the previous
    # block's last docID so blocks decode independently (skip support)
    bstarts = np.arange(1, n_blocks) * block_size
    gaps[bstarts] = doc_ids[bstarts] - doc_ids[bstarts - 1]
    # value stream: per block [gaps][tfs][dls]
    pieces = []
    for bi in range(n_blocks):
        s, e = bi * block_size, min((bi + 1) * block_size, n)
        pieces.append(gaps[s:e])
        pieces.append(tfs[s:e])
        pieces.append(dls[s:e])
    stream = np.concatenate(pieces).astype(np.uint64)
    blob, nbytes = encode_varints(stream)
    # byte offset of each block = cumsum of its 3 sections' byte counts
    offs = np.zeros(n_blocks + 1, np.int64)
    pos = 0
    vpos = 0
    for bi in range(n_blocks):
        cnt = min(block_size, n - bi * block_size)
        pos += int(nbytes[vpos:vpos + 3 * cnt].sum())
        vpos += 3 * cnt
        offs[bi + 1] = pos
    ends = np.minimum(np.arange(1, n_blocks + 1) * block_size, n) - 1
    last_ids = doc_ids[ends]
    idx = np.arange(n) // block_size
    max_tf = np.zeros(n_blocks, np.int64)
    np.maximum.at(max_tf, idx, tfs)
    min_dl = np.full(n_blocks, np.iinfo(np.int64).max)
    np.minimum.at(min_dl, idx, dls)
    if offs[-1] > np.iinfo(np.int32).max:
        raise OverflowError(
            f"posting blob of {offs[-1]} bytes exceeds int32 block offsets; "
            f"lower docs_per_shard so one term's shard-local postings stay "
            f"under 2 GiB")
    return EncodedPostings(n, last_ids.astype(np.int64), max_tf.astype(np.int32),
                           min_dl.astype(np.int32), offs.astype(np.int32), blob)


def encode_segments(seg_bounds: np.ndarray, doc_ids: np.ndarray,
                    tfs: np.ndarray, dls: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Varint-encode MANY posting segments in one vectorized pass.

    Rows must be grouped by segment (``seg_bounds``: n_segs+1 boundaries)
    with doc_ids ascending within each segment. Per segment the stream is
    ``varint(gaps from -1) ++ varint(tfs) ++ varint(dls)``. Returns the
    concatenated byte stream and per-segment byte offsets (n_segs+1).

    This is the SPIMI-run compression applied BEFORE the merge shuffle —
    it shrinks the exchanged bytes ~4x vs raw int64/int32 list columns.
    """
    n = len(doc_ids)
    n_segs = len(seg_bounds) - 1
    if n == 0:
        return b"", np.zeros(n_segs + 1, np.int64)
    doc_ids = np.ascontiguousarray(doc_ids, np.int64)
    counts = np.diff(seg_bounds)
    pos = np.arange(n) - np.repeat(seg_bounds[:-1], counts)
    gaps = np.empty(n, np.int64)
    gaps[1:] = doc_ids[1:] - doc_ids[:-1]
    first = pos == 0
    gaps[first] = doc_ids[first] + 1
    seg_of = np.repeat(np.arange(n_segs, dtype=np.int64), counts)
    # stream order: (segment, section, pos) via one composite int argsort
    maxlen = int(counts.max()) + 1
    base = np.concatenate([seg_of, seg_of, seg_of]) * (3 * maxlen)
    sec = np.repeat(np.arange(3, dtype=np.int64), n) * maxlen
    key = base + sec + np.concatenate([pos, pos, pos])
    order = np.argsort(key, kind="stable")
    vals3 = np.concatenate([gaps, tfs.astype(np.int64), dls.astype(np.int64)]) \
        .astype(np.uint64)
    blob, nbytes = encode_varints(vals3[order])
    elem_starts = np.zeros(n_segs, np.int64)
    np.cumsum(3 * counts[:-1], out=elem_starts[1:])
    seg_sizes = np.add.reduceat(nbytes, elem_starts)
    offs = np.zeros(n_segs + 1, np.int64)
    np.cumsum(seg_sizes, out=offs[1:])
    return blob, offs


def decode_segment(blob: bytes, n: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Inverse of one :func:`encode_segments` segment."""
    vals = decode_varints(blob, 3 * n).astype(np.int64)
    gaps, tfs, dls = vals[:n], vals[n:2 * n], vals[2 * n:]
    return np.cumsum(gaps) - 1, tfs, dls


def decode_block(enc: EncodedPostings, bi: int, block_size: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode one skip block → (doc_ids, tfs, dls)."""
    cnt = min(block_size, enc.n - bi * block_size)
    raw = enc.blob[enc.offs[bi]:enc.offs[bi + 1]]
    vals = decode_varints(raw, 3 * cnt).astype(np.int64)
    gaps, tfs, dls = vals[:cnt], vals[cnt:2 * cnt], vals[2 * cnt:]
    base = int(enc.last_ids[bi - 1]) if bi > 0 else -1
    doc_ids = np.cumsum(gaps) + base
    if bi == 0:
        pass  # first gap already encodes docID+1 relative to -1
    return doc_ids, tfs, dls


def decode_postings(enc: EncodedPostings, block_size: int = 128) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode all blocks → (doc_ids, tfs, dls)."""
    n_blocks = len(enc.offs) - 1
    vals = decode_varints(enc.blob, 3 * enc.n).astype(np.int64)
    doc_ids = np.empty(enc.n, np.int64)
    tfs = np.empty(enc.n, np.int64)
    dls = np.empty(enc.n, np.int64)
    vpos = 0
    for bi in range(n_blocks):
        s = bi * block_size
        cnt = min(block_size, enc.n - s)
        gaps = vals[vpos:vpos + cnt]
        tfs[s:s + cnt] = vals[vpos + cnt:vpos + 2 * cnt]
        dls[s:s + cnt] = vals[vpos + 2 * cnt:vpos + 3 * cnt]
        base = int(enc.last_ids[bi - 1]) if bi > 0 else -1
        doc_ids[s:s + cnt] = np.cumsum(gaps) + base
        vpos += 3 * cnt
    return doc_ids, tfs, dls


def decode_segments_many(bdata: np.ndarray, boffs: np.ndarray,
                         ns: np.ndarray, row_order: np.ndarray
                         ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode MANY :func:`encode_segments` segments in one vectorized pass
    and concatenate their (doc_ids, tfs, dls) in ``row_order``.

    ``bdata``: the full uint8 value buffer of a ``large_binary`` column
    whose row r occupies ``bdata[boffs[r]:boffs[r+1]]``; ``ns``: posting
    count per row. Replaces a per-row ``decode_segment`` Python loop
    (one decode_varints call total instead of one per segment)."""
    if not len(row_order):
        e = np.empty(0, np.int64)
        return e, e, e
    ns = np.ascontiguousarray(ns, np.int64)
    total_vals = int(3 * ns.sum())
    vals = decode_varints(bdata[boffs[0]:boffs[-1]], total_vals) \
        .astype(np.int64)
    vstart = np.zeros(len(ns), np.int64)
    np.cumsum(3 * ns[:-1], out=vstart[1:])
    lr = ns[row_order]
    k = int(lr.sum())
    within = np.arange(k) - np.repeat(
        np.concatenate([[0], np.cumsum(lr[:-1])]), lr)
    base = np.repeat(vstart[row_order], lr) + within
    gaps = vals[base]
    tfs = vals[base + np.repeat(lr, lr)]
    dls = vals[base + 2 * np.repeat(lr, lr)]
    c = np.cumsum(gaps)
    seg_start_pos = np.concatenate([[0], np.cumsum(lr[:-1])])
    c_exc = np.concatenate([[0], c[:-1]])
    docs = c - np.repeat(c_exc[seg_start_pos], lr) - 1
    return docs, tfs, dls


def decode_postings_file(table, block_size: int
                         ) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Decode EVERY term row of a POSTINGS_SCHEMA table in ONE vectorized
    pass → ``(counts, doc_ids, tfs, dls)`` with the three value arrays
    concatenated in (row, posting) order. Inverse of
    :func:`encode_postings_many` at file granularity: one
    ``decode_varints`` call for the whole file's blob column instead of
    one per (term, block) — built for serve-actor load, where a
    per-(term, shard) Python decode loop measured 9.6–16.5 s of actor
    startup at a 32M-doc index."""
    import pyarrow as pa
    counts = table.column("df").to_numpy().astype(np.int64)
    n_rows = len(counts)
    empty = np.empty(0, np.int64)
    if n_rows == 0 or int(counts.sum()) == 0:
        return counts, empty, empty, empty
    bc = table.column("blob").combine_chunks()
    off_dtype = np.int64 if pa.types.is_large_binary(bc.type) else np.int32
    boffs = np.frombuffer(bc.buffers()[1], off_dtype)[
        bc.offset:bc.offset + len(bc) + 1].astype(np.int64)
    bdata = np.frombuffer(bc.buffers()[2] or b"", np.uint8)
    total_vals = int(3 * counts.sum())
    vals = decode_varints(bdata[boffs[0]:boffs[-1]], total_vals) \
        .astype(np.int64)
    bs = block_size
    nb_t = (counts + bs - 1) // bs
    block_base = np.zeros(n_rows + 1, np.int64)
    np.cumsum(nb_t, out=block_base[1:])
    total_blocks = int(block_base[-1])
    term_of_block = np.repeat(np.arange(n_rows), nb_t)
    b_in_t = np.arange(total_blocks) - block_base[term_of_block]
    cnt_b = np.minimum(counts[term_of_block] - b_in_t * bs, bs)
    vstart = np.zeros(total_blocks, np.int64)
    np.cumsum(3 * cnt_b[:-1], out=vstart[1:])
    n = int(counts.sum())
    row_starts = np.zeros(n_rows + 1, np.int64)
    np.cumsum(counts, out=row_starts[1:])
    pos = np.arange(n) - np.repeat(row_starts[:-1], counts)
    gblock = np.repeat(block_base[:-1], counts) + pos // bs
    q = pos % bs
    gaps = vals[vstart[gblock] + q]
    tfs = vals[vstart[gblock] + cnt_b[gblock] + q]
    dls = vals[vstart[gblock] + 2 * cnt_b[gblock] + q]
    # block decode bases: -1 for a row's first block, else the previous
    # block's last docID (the skip pointer, flattened in block order)
    li = np.asarray(table.column("last_ids").combine_chunks().flatten())
    base_b = np.empty(total_blocks, np.int64)
    base_b[b_in_t == 0] = -1
    later = b_in_t > 0
    base_b[later] = li[np.flatnonzero(later) - 1]
    # segmented inclusive cumsum of gaps per block + base
    c = np.cumsum(gaps)
    c_exc = np.concatenate([[0], c[:-1]])
    blk_first = np.flatnonzero(q == 0)          # one per block, in order
    docs = c - np.repeat(c_exc[blk_first], cnt_b) + np.repeat(base_b, cnt_b)
    return counts, docs, tfs, dls


def encode_postings_many(doc_ids: np.ndarray, tfs: np.ndarray,
                         dls: np.ndarray, term_bounds: np.ndarray,
                         block_size: int = 128) -> dict:
    """Encode MANY terms' posting lists in one vectorized pass — the
    batch form of :func:`encode_postings` (bit-identical per-term output;
    one encode_varints call for the whole group instead of one per term,
    which at ~10^4 terms per merge group dominated the merge phase).

    Rows must be grouped by term (``term_bounds``: n_terms+1 boundaries)
    with doc_ids strictly ascending within each term. Returns numpy
    pieces keyed to POSTINGS_SCHEMA: df, cf, n_blocks, plus flat values +
    list offsets for last_ids/max_tf/min_dl/offs/blob columns."""
    n = len(doc_ids)
    doc_ids = np.ascontiguousarray(doc_ids, np.int64)
    tfs = np.ascontiguousarray(tfs, np.int64)
    dls = np.ascontiguousarray(dls, np.int64)
    term_bounds = np.ascontiguousarray(term_bounds, np.int64)
    counts = np.diff(term_bounds)
    n_terms = len(counts)
    assert n and n_terms and (counts > 0).all(), "empty term groups"
    pos = np.arange(n) - np.repeat(term_bounds[:-1], counts)
    gaps = np.empty(n, np.int64)
    gaps[1:] = doc_ids[1:] - doc_ids[:-1]
    first = pos == 0
    gaps[first] = doc_ids[first] + 1
    nb_t = (counts + block_size - 1) // block_size
    block_base = np.zeros(n_terms + 1, np.int64)
    np.cumsum(nb_t, out=block_base[1:])
    total_blocks = int(block_base[-1])
    term_of_block = np.repeat(np.arange(n_terms), nb_t)
    b_in_t = np.arange(total_blocks) - block_base[term_of_block]
    cnt_b = np.minimum(counts[term_of_block] - b_in_t * block_size,
                       block_size)
    gblock = np.repeat(block_base[:-1], counts) + pos // block_size
    pos_in_block = pos % block_size
    # stream order (block, section, pos): composite int key, stable sort
    key_base = gblock * (3 * block_size)
    sec = np.repeat(np.arange(3, dtype=np.int64), n) * block_size
    key = np.concatenate([key_base, key_base, key_base]) + sec \
        + np.concatenate([pos_in_block, pos_in_block, pos_in_block])
    order = np.argsort(key, kind="stable")
    vals3 = np.concatenate([gaps, tfs, dls]).astype(np.uint64)
    blob, nbytes = encode_varints(vals3[order])
    # per-block byte sizes → within-term byte offsets
    bstart_elems = np.zeros(total_blocks, np.int64)
    np.cumsum(3 * cnt_b[:-1], out=bstart_elems[1:])
    block_bytes = np.add.reduceat(nbytes, bstart_elems)
    c = np.cumsum(block_bytes)
    c_exc = c - block_bytes
    term_start_bytes = c_exc[block_base[:-1]]
    within_end = c - term_start_bytes[term_of_block]
    if within_end.max(initial=0) > np.iinfo(np.int32).max:
        raise OverflowError(
            "posting blob exceeds int32 block offsets; lower "
            "docs_per_shard so one term's shard-local postings stay "
            "under 2 GiB")
    # offs list column: per term [0, end_0, .., end_{nb-1}]
    offs_vals = np.zeros(total_blocks + n_terms, np.int32)
    offs_vals[np.arange(total_blocks) + term_of_block + 1] = \
        within_end.astype(np.int32)
    offs_list_offsets = block_base + np.arange(n_terms + 1)
    # per-block metadata in original (term, doc) order
    blk_start_idx = np.repeat(term_bounds[:-1], nb_t) + b_in_t * block_size
    last_ids = doc_ids[blk_start_idx + cnt_b - 1]
    max_tf = np.maximum.reduceat(tfs, blk_start_idx).astype(np.int32)
    min_dl = np.minimum.reduceat(dls, blk_start_idx).astype(np.int32)
    cf = np.add.reduceat(tfs, term_bounds[:-1])
    term_blob_offsets = np.zeros(n_terms + 1, np.int64)
    term_blob_offsets[1:] = c[block_base[1:] - 1]
    return {
        "df": counts, "cf": cf, "n_blocks": nb_t.astype(np.int32),
        "last_ids_vals": last_ids, "max_tf_vals": max_tf,
        "min_dl_vals": min_dl, "list_offsets": block_base,
        "offs_vals": offs_vals, "offs_list_offsets": offs_list_offsets,
        "blob": blob, "blob_offsets": term_blob_offsets,
    }
