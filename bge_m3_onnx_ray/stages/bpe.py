"""Byte-pair-encoding tokenizer TRAINING and ENCODING — the
vocabulary-fitting step of an LLM data pipeline (the reference ships a
pretrained XLM-R vocabulary, `bge_m3_embedder.py:114`; this is the
operator you run to CREATE such an artifact from a corpus).

Distribution shape (the one HF/SentencePiece-style trainers use):
the corpus collapses to a (word, count) table in ONE streaming pass
(per-batch partial counts + a bucket_reduce — words repeat heavily, so
the table is vocabulary-sized, not corpus-sized), and the merge loop
runs on that table: each iteration counts adjacent symbol pairs
WEIGHTED by word count (pure numpy over the symbol arrays) and merges
the most frequent pair. At 100 TB you bound the word table by fitting
on a deterministic hash-sample (stages/text.corpus_sample_hash) and/or
drop hapax words — both documented knobs, not silent caps.

Encoding back over the corpus is a map_batches pass with a per-batch
WORD memo: each distinct word is encoded once per batch (the merge
loop is per-word sequential by nature), then counts scatter to rows
vectorized.

Determinism: ties on pair frequency break lexicographically, so the
merge list is a pure function of the word-count table."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

_EOW = "</w>"


def word_counts(ds: rd.Dataset, col: str = "text",
                n_buckets: int = 64) -> "pa.Table":
    """(word, n) over the tokenized corpus — one streaming pass +
    one vocabulary-sized bucket_reduce."""
    from bge_m3_onnx_ray.stages._groups import bucket_reduce
    from bge_m3_onnx_ray.stages._pool import task_stage

    class _Partial:
        def __init__(self):
            from bge_m3_onnx_ray.tokenizer import DeterministicTokenizer
            self.tok = DeterministicTokenizer()

        def __call__(self, batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            flat, _ = self.tok.batch_token_lists(batch.column(col))
            if not len(flat):
                return pa.table({"word": pa.array([], pa.string()),
                                 "n": pa.array([], pa.int64())})
            vc = pc.value_counts(flat)
            return pa.table({
                "word": pc.cast(vc.field("values"), pa.string()),
                "n": pc.cast(vc.field("counts"), pa.int64())})

    part = ds.select_columns([col]).map_batches(
        task_stage(_Partial), batch_format="pyarrow", batch_size=8192)
    red = bucket_reduce(part, ["word"], [("n", "sum", "n")],
                        n_buckets=n_buckets).to_pandas()
    return pa.table({"word": pa.array(red["word"].tolist(), pa.string()),
                     "n": pa.array(red["n"].to_numpy(), pa.int64())})


def bpe_train(ds: rd.Dataset, n_merges: int = 50,
              col: str = "text") -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus. Returns the merge
    list in application order — the tokenizer artifact."""
    wc = word_counts(ds, col=col)
    words = wc.column("word").to_pylist()
    counts = wc.column("n").to_numpy().astype(np.int64)
    order = sorted(range(len(words)), key=lambda i: words[i])
    words = [words[i] for i in order]
    counts = counts[np.asarray(order)]
    # symbol sequences: characters + an end-of-word marker (classic BPE
    # word-boundary handling)
    seqs = [list(w) + [_EOW] for w in words]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_n: dict[tuple[str, str], int] = {}
        for s, n in zip(seqs, counts):
            for a, b in zip(s, s[1:]):
                pair_n[(a, b)] = pair_n.get((a, b), 0) + int(n)
        if not pair_n:
            break
        best = min(pair_n.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_n[best] < 2:
            break                         # nothing left worth merging
        merges.append(best)
        joined = best[0] + best[1]
        for si, s in enumerate(seqs):
            if len(s) < 2:
                continue
            out, i = [], 0
            while i < len(s):
                if (i + 1 < len(s) and s[i] == best[0]
                        and s[i + 1] == best[1]):
                    out.append(joined)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[si] = out
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges (lowest rank first) to one word — the standard
    greedy BPE encode."""
    s = list(word) + [_EOW]
    while len(s) > 1:
        best_i, best_r = -1, None
        for i in range(len(s) - 1):
            r = ranks.get((s[i], s[i + 1]))
            if r is not None and (best_r is None or r < best_r):
                best_i, best_r = i, r
        if best_r is None:
            break
        s[best_i:best_i + 2] = [s[best_i] + s[best_i + 1]]
    return s


def bpe_encode_counts(ds: rd.Dataset, merges: list[tuple[str, str]],
                      col: str = "text") -> rd.Dataset:
    """(doc_id, n_tokens): per-document BPE token count under the
    learned merges — the budget metric a packing/pricing pipeline needs.
    Per-batch word memo: each DISTINCT word encodes once per batch, then
    counts scatter to documents vectorized."""
    from bge_m3_onnx_ray.stages._pool import task_stage

    class _Encode:
        def __init__(self, merges: tuple):
            from bge_m3_onnx_ray.tokenizer import DeterministicTokenizer
            self.tok = DeterministicTokenizer()
            self.ranks = {tuple(p): i for i, p in enumerate(merges)}
            self.memo: dict[str, int] = {}

        def _len(self, w: str) -> int:
            got = self.memo.get(w)
            if got is None:
                if len(self.memo) > 1_000_000:   # bound worker memory
                    self.memo.clear()
                got = self.memo[w] = len(encode_word(w, self.ranks))
            return got

        def __call__(self, batch: pa.Table) -> pa.Table:
            flat, offsets = self.tok.batch_token_lists(batch.column(col))
            lens = np.diff(offsets)
            doc_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
            piece = np.fromiter(
                (self._len(w) for w in flat.to_pylist()),
                np.int64, len(flat)) if len(flat) else np.empty(0, np.int64)
            n_tok = np.zeros(len(lens), np.int64)
            np.add.at(n_tok, doc_of, piece)
            return pa.table({
                "doc_id": batch.column("doc_id"),
                "n_tokens": pa.array(n_tok, pa.int64())})

    return ds.select_columns(["doc_id", col]).map_batches(
        task_stage(_Encode, merges=tuple(tuple(p) for p in merges)),
        batch_format="pyarrow", batch_size=8192)
