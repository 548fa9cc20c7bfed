"""Engine index ≡ oracle index: dictionary, df/cf, decoded postings,
corpus stats (SURVEY.md §5 ``test_index_parity``)."""

import glob
import json
import os

import numpy as np
import pyarrow.parquet as pq

from bge_m3_onnx_ray.index.artifacts import ConvOffsets, IndexMeta
from bge_m3_onnx_ray.index.codec import EncodedPostings, decode_postings

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "index_stats.json")


def _load_all_postings(index_dir, block_size):
    """Decode the whole index back to {term: [(doc_id, tf), ...]}."""
    out = {}
    for p in sorted(glob.glob(os.path.join(index_dir, "postings", "*.parquet"))):
        t = pq.read_table(p)
        for i in range(t.num_rows):
            enc = EncodedPostings(
                int(t.column("df")[i].as_py()),
                np.asarray(t.column("last_ids")[i].as_py(), np.int64),
                np.asarray(t.column("max_tf")[i].as_py(), np.int32),
                np.asarray(t.column("min_dl")[i].as_py(), np.int32),
                np.asarray(t.column("offs")[i].as_py(), np.int32),
                t.column("blob")[i].as_py())
            docs, tfs, dls = decode_postings(enc, block_size)
            term = t.column("term")[i].as_py()
            out.setdefault(term, []).extend(zip(docs.tolist(), tfs.tolist(), dls.tolist()))
    for term in out:
        out[term].sort()
    return out


def test_stats_match_oracle_and_golden(tiny_index, tiny_corpus):
    idx, res = tiny_index
    _, oi, _ = tiny_corpus
    meta = IndexMeta(idx)
    assert meta.n_docs == oi.n_docs
    assert meta.total_len == oi.total_len
    assert meta.avgdl == oi.avgdl  # exact float: same division
    assert meta.stats["n_terms"] == len(oi.postings)
    with open(GOLDEN) as f:
        g = json.load(f)
    assert meta.n_docs == g["N"]
    assert meta.avgdl == float(g["avgdl"])


def test_dictionary_matches_oracle(tiny_index, tiny_corpus):
    idx, _ = tiny_index
    _, oi, _ = tiny_corpus
    rows = {}
    for p in glob.glob(os.path.join(idx, "dictionary", "*.parquet")):
        t = pq.read_table(p)
        for term, df, cf in zip(t.column("term").to_pylist(),
                                t.column("df").to_pylist(),
                                t.column("cf").to_pylist()):
            rows[term] = (df, cf)
    want = {t_: (len(pl), sum(tf for _, tf in pl)) for t_, pl in oi.postings.items()}
    assert rows == want


def test_postings_match_oracle(tiny_index, tiny_corpus):
    idx, _ = tiny_index
    _, oi, _ = tiny_corpus
    meta = IndexMeta(idx)
    got = _load_all_postings(idx, meta.block_size)
    assert set(got) == set(oi.postings)
    for term, plist in oi.postings.items():
        g = [(d, tf) for d, tf, _ in got[term]]
        assert g == plist, term
        # inline doc lengths must match the oracle's doc_lens
        for d, _, dl in got[term]:
            assert dl == oi.doc_lens[d]


def test_doc_lens_and_conv_offsets(tiny_index, tiny_corpus):
    idx, _ = tiny_index
    _, oi, _ = tiny_corpus
    offs = ConvOffsets.load(idx)
    assert offs.n_docs == oi.n_docs
    # doc_lens shards union == oracle doc_lens
    all_dl = {}
    for p in glob.glob(os.path.join(idx, "doc_lens", "*.parquet")):
        t = pq.read_table(p)
        all_dl.update(zip(t.column("doc_id").to_pylist(), t.column("dl").to_pylist()))
    assert len(all_dl) == oi.n_docs  # every doc present, incl. empty-text docs
    for d, dl in all_dl.items():
        assert dl == oi.doc_lens[d]
    # docID invariant: dense rank of (conv_id, turn_idx)
    doc_ids = np.arange(oi.n_docs, dtype=np.int64)
    conv, turn = offs.doc_to_conv(doc_ids)
    assert [(c, int(t)) for c, t in zip(conv, turn)] == oi.doc_keys
