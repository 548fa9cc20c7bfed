"""BPE training/encoding: the distributed word-count + merge loop must
equal a direct single-process recompute over the same corpus (catching
partitioning/reduce bugs), encoding must be exact, and both must be
deterministic across runs and partitionings."""

import collections

import numpy as np
import pyarrow as pa
import pytest


def _ref_bpe(texts, n_merges):
    from bge_m3_onnx_ray.tokenizer import tokenize
    wc = collections.Counter()
    for t in texts:
        wc.update(tokenize(t))
    seq = {w: list(w) + ["</w>"] for w in wc}
    merges = []
    for _ in range(n_merges):
        pairs = collections.Counter()
        for w, n in wc.items():
            s = seq[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break
        merges.append(best)
        a, b = best
        for w, s in seq.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seq[w] = out
    return merges, wc, seq


def _corpus():
    rng = np.random.default_rng(17)
    vocab = ["lower", "lowest", "newer", "newest", "wider", "widest",
             "low", "new", "wide", "sort", "sorting", "sorted"]
    return [" ".join(rng.choice(vocab, size=rng.integers(3, 14)))
            for _ in range(300)]


def test_bpe_train_matches_reference(ray_session):
    import ray.data as rd

    from bge_m3_onnx_ray.stages.bpe import bpe_train

    texts = _corpus()
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())})).repartition(7)
    got = bpe_train(ds, n_merges=40)
    want, _, _ = _ref_bpe(texts, 40)
    assert got == want
    assert len(got) > 10                       # the corpus supports merges
    # deterministic across a different partitioning
    ds2 = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())})).repartition(3)
    assert bpe_train(ds2, n_merges=40) == want


def test_bpe_encode_counts_exact(ray_session):
    import ray.data as rd

    from bge_m3_onnx_ray.stages.bpe import (bpe_encode_counts, bpe_train,
                                            encode_word)
    from bge_m3_onnx_ray.tokenizer import tokenize

    texts = _corpus()
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())}))
    merges = bpe_train(ds, n_merges=30)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    got = bpe_encode_counts(ds, merges).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    want = [sum(len(encode_word(w, ranks)) for w in tokenize(t))
            for t in texts]
    assert got.n_tokens.tolist() == want
    # merges strictly shrink the total token count vs raw characters
    raw = [sum(len(w) + 1 for w in tokenize(t)) for t in texts]
    assert sum(want) < sum(raw)


def test_encode_word_known_case():
    from bge_m3_onnx_ray.stages.bpe import encode_word
    ranks = {("a", "b"): 0, ("ab", "</w>"): 1}
    assert encode_word("aab", ranks) == ["a", "ab</w>"]
    assert encode_word("ba", ranks) == ["b", "a", "</w>"]
    assert encode_word("ab", ranks) == ["ab</w>"]
