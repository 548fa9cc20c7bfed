"""Block-max WAND must actually PRUNE on a skewed-tf corpus (and stay
bit-identical to exhaustive). The main synthetic corpus has near-flat tf
(max_tf ~ 3), where every segment bound ties and WAND degenerates to
exhaustive + bookkeeping; the Zipf-tf fixture (fixtures.gen_zipf_transcripts)
spreads per-block (max_tf, min_dl) so the theta cutoff skips segments."""

import glob
import os
import shutil

import numpy as np
import pyarrow.parquet as pq
import pytest

from bge_m3_onnx_ray.config import IndexConfig
from bge_m3_onnx_ray.index.artifacts import IndexMeta
from bge_m3_onnx_ray.index.codec import EncodedPostings, decode_postings
from bge_m3_onnx_ray.index.search import score_exhaustive, score_wand
from bge_m3_onnx_ray.scoring import idf


@pytest.fixture(scope="module")
def zipf_index(ray_session, tmp_path_factory):
    from bge_m3_onnx_ray.fixtures import zipf_transcripts_path
    from bge_m3_onnx_ray.index.build import build_index
    idx = str(tmp_path_factory.mktemp("zipf") / "index")
    shutil.rmtree(idx, ignore_errors=True)
    build_index(zipf_transcripts_path(20000), idx, IndexConfig())
    return idx


def _load_shard(index_dir, block_size):
    enc, dec = {}, {}
    for p in sorted(glob.glob(os.path.join(index_dir, "postings",
                                           "*.parquet"))):
        t = pq.read_table(p)
        for i in range(t.num_rows):
            e = EncodedPostings(
                int(t.column("df")[i].as_py()),
                np.asarray(t.column("last_ids")[i].as_py(), np.int64),
                np.asarray(t.column("max_tf")[i].as_py(), np.int32),
                np.asarray(t.column("min_dl")[i].as_py(), np.int32),
                np.asarray(t.column("offs")[i].as_py(), np.int32),
                t.column("blob")[i].as_py())
            term = t.column("term")[i].as_py()
            enc[term] = e
            dec[term] = decode_postings(e, block_size)
    return enc, dec


def test_wand_prunes_and_matches_exhaustive(zipf_index):
    meta = IndexMeta(zipf_index)
    enc, dec = _load_shard(zipf_index, meta.block_size)
    idfs = {t: idf(e.n, meta.n_docs) for t, e in enc.items()}
    vocab = sorted(enc, key=lambda t: -enc[t].n)
    pruned_any = False
    for qterms in ([vocab[0]], [vocab[0], vocab[5]],
                   [vocab[2], vocab[10], vocab[20]]):
        stats = {}
        s_w, d_w = score_wand(enc, qterms, idfs, meta.avgdl, meta.k1,
                              meta.b, 10, meta.block_size, stats=stats)
        s_e, d_e = score_exhaustive({t: dec[t] for t in qterms}, qterms,
                                    idfs, meta.avgdl, meta.k1, meta.b, 10)
        np.testing.assert_array_equal(d_w, d_e)
        np.testing.assert_array_equal(s_w, s_e)  # bit-identical
        assert stats["n_segments"] == stats["segments_scored"] + \
            stats["segments_pruned"]
        if stats["segments_pruned"] > 0:
            pruned_any = True
    assert pruned_any, "Zipf corpus produced no block-max pruning"


def test_zipf_corpus_is_skewed(zipf_index):
    """The fixture must actually have the impact skew it claims: a small
    set of very short docs (block min_dl <= 6) against a long-doc bulk
    (block min_dl >= 40), clustered so MOST blocks are long-only."""
    meta = IndexMeta(zipf_index)
    enc, _ = _load_shard(zipf_index, meta.block_size)
    mins = np.concatenate([e.min_dl for e in enc.values()])
    assert (mins <= 6).any(), "no short-doc blocks — skew lost"
    long_frac = float((mins >= 40).mean())
    assert long_frac > 0.5, f"only {long_frac:.0%} long-only blocks"
