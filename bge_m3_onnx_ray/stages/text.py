"""Text-analysis operators over a documents-style table
(doc_id, text, ...): token counting, corpus stats, df ranking, per-doc
top terms, length categorization (reference M9,
``generate_dataset.py:170-178``), language-ID heuristic (reference M10,
``:180-193``), quality scoring, fingerprinting.

All operators are vectorized ``map_batches`` transforms with partial
(per-batch) pre-aggregation before any ``groupby`` — the SPIMI pattern —
so the only shuffled rows are per-(term, batch) partials, not tokens.

Float outputs are quantized as ``floor(x * 1e6)`` int64 (``_q6``): floor
is exactly rounded in IEEE-754 and identical in every engine, which makes
results hash-comparable against a DuckDB oracle (ROUND is not — DuckDB
rounds half-away-from-zero, Python half-even).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Sum

from bge_m3_onnx_ray.stages._pool import task_stage
from bge_m3_onnx_ray.tokenizer import DeterministicTokenizer

# Fixed stopword lists for the language-ID heuristic (M10) and quality
# stop-ratio. These are part of the operator contract — the DuckDB oracle
# embeds the same lists.
STOPWORDS = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "los"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "mit", "ein"),
    "fr": ("le", "la", "de", "et", "les", "des", "un", "une"),
}
LANG_ORDER = ("en", "es", "de", "fr")


def q6(x: np.ndarray) -> np.ndarray:
    """floor(x*1e6) as int64 — the cross-engine-stable quantization."""
    return np.floor(np.asarray(x, np.float64) * 1e6).astype(np.int64)


class _TokenStage:
    """Base for actor-pool stages needing the tokenizer once per actor."""

    def __init__(self):
        self.tok = DeterministicTokenizer()

    def _token_lists(self, batch: pa.Table) -> list[list[str]]:
        return [self.tok.tokenize(t) if t is not None else []
                for t in batch.column("text").to_pylist()]


class TokenCount(_TokenStage):
    def __call__(self, batch: pa.Table) -> pa.Table:
        _, _, _, _, doc_lens = self.tok.batch_term_counts_coded(batch.column("text"))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_tokens": pa.array(doc_lens.astype(np.int64), pa.int64()),
        })


def token_count(ds: rd.Dataset) -> rd.Dataset:
    return ds.select_columns(["doc_id", "text"]).map_batches(
        task_stage(TokenCount), batch_format="pyarrow", batch_size=4096)


class _CorpusPartial(_TokenStage):
    def __call__(self, batch: pa.Table) -> pa.Table:
        _, _, _, _, doc_lens = self.tok.batch_term_counts_coded(batch.column("text"))
        return pa.table({"n_docs": pa.array([len(doc_lens)], pa.int64()),
                         "n_tokens": pa.array([int(doc_lens.sum())], pa.int64())})


def corpus_stats(ds: rd.Dataset) -> pa.Table:
    """One row: n_docs, n_tokens, avg_tokens_q6."""
    p = ds.select_columns(["doc_id", "text"]).map_batches(
        task_stage(_CorpusPartial), batch_format="pyarrow", batch_size=4096).to_pandas()
    n_docs, n_tokens = int(p.n_docs.sum()), int(p.n_tokens.sum())
    avg = n_tokens / n_docs if n_docs else 0.0
    return pa.table({"n_docs": pa.array([n_docs], pa.int64()),
                     "n_tokens": pa.array([n_tokens], pa.int64()),
                     "avg_tokens_q6": pa.array(q6(np.array([avg])), pa.int64())})


class _DfPartial(_TokenStage):
    """Per-batch partial (term, df, cf) — the pre-aggregation that keeps
    the groupby small (one row per term per batch, not per token)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        _, codes, uniques, tfs, _ = self.tok.batch_term_counts_coded(batch.column("text"))
        if not len(codes):
            return pa.table({"term": pa.array([], pa.string()),
                             "df": pa.array([], pa.int64()),
                             "cf": pa.array([], pa.int64())})
        df = np.bincount(codes, minlength=len(uniques))
        cf = np.bincount(codes, weights=tfs, minlength=len(uniques))
        return pa.table({"term": uniques.cast(pa.string()),
                         "df": pa.array(df.astype(np.int64), pa.int64()),
                         "cf": pa.array(cf.astype(np.int64), pa.int64())})


def term_df(ds: rd.Dataset, top_n: int = 100) -> pa.Table:
    """Top-N terms by (df desc, term asc) with global df and cf."""
    from bge_m3_onnx_ray.stages._groups import bucket_reduce
    agg = bucket_reduce(
        ds.select_columns(["doc_id", "text"]).map_batches(
            task_stage(_DfPartial), batch_format="pyarrow", batch_size=4096),
        ["term"], [("df", "sum", "df"), ("cf", "sum", "cf")])
    pdf = agg.to_pandas().sort_values(["df", "term"],
                                      ascending=[False, True]).head(top_n)
    return pa.Table.from_pandas(pdf.reset_index(drop=True), preserve_index=False)


class TopTermsPerDoc(_TokenStage):
    def __init__(self, k: int):
        super().__init__()
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        # numpy/Arrow all the way (no per-batch pandas round-trip): term
        # strings never materialize as Python objects — the (tf desc,
        # term asc) sort uses the dictionary codes' LEXICOGRAPHIC rank
        # (Arrow utf8 sort = code-point order = Python str order), and
        # only the kept top-k rows take their strings at the end
        import pyarrow.compute as pc
        doc_idx, codes, uniques, tfs, _ = self.tok.batch_term_counts_coded(
            batch.column("text"))
        doc_ids = batch.column("doc_id").to_numpy()
        if not len(codes):
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "term": pa.array([], pa.string()),
                             "tf": pa.array([], pa.int64()),
                             "term_rank": pa.array([], pa.int64())})
        lexrank = np.empty(len(uniques), np.int64)
        lexrank[np.asarray(pc.sort_indices(uniques)).astype(np.int64)] = \
            np.arange(len(uniques))
        d = doc_ids[doc_idx]
        order = np.lexsort((lexrank[codes], -tfs.astype(np.int64), d))
        d_s, codes_s, tf_s = d[order], codes[order], tfs[order]
        brk = np.empty(len(d_s), bool)
        brk[0] = True
        brk[1:] = np.diff(d_s) != 0
        starts = np.flatnonzero(brk)
        sizes = np.diff(np.concatenate([starts, [len(d_s)]]))
        rank = np.arange(len(d_s), dtype=np.int64) - np.repeat(starts, sizes)
        keep = rank < self.k
        return pa.table({
            "doc_id": pa.array(d_s[keep], pa.int64()),
            "term": uniques.take(pa.array(codes_s[keep])).cast(pa.string()),
            "tf": pa.array(tf_s[keep].astype(np.int64), pa.int64()),
            "term_rank": pa.array(rank[keep] + 1, pa.int64())})


def top_terms_per_doc(ds: rd.Dataset, k: int = 5,
                      max_doc_id: int | None = None) -> rd.Dataset:
    """Per-doc top-k terms by (tf desc, term asc) — the reference's
    top-5 sparse-token display (A3, ``Program.cs:54-60``) as a table op."""
    ds = ds.select_columns(["doc_id", "text"])
    if max_doc_id is not None:
        import pyarrow.compute as pc
        ds = ds.map_batches(lambda t: t.filter(pc.less(t["doc_id"], max_doc_id)),
                            batch_format="pyarrow")
    return ds.map_batches(task_stage(TopTermsPerDoc, k=k),
                          batch_format="pyarrow", batch_size=4096)


class LengthCategorize(_TokenStage):
    """Reference M9 (``generate_dataset.py:170-178``): word-count →
    short (<=10) / medium (<=30) / long."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        _, _, _, _, doc_lens = self.tok.batch_term_counts_coded(batch.column("text"))
        n = doc_lens.astype(np.int64)
        cat = np.where(n <= 10, "short", np.where(n <= 30, "medium", "long"))
        return pa.table({"doc_id": batch.column("doc_id"),
                         "n_words": pa.array(n, pa.int64()),
                         "category": pa.array(cat, pa.string())})


def length_categorize(ds: rd.Dataset) -> rd.Dataset:
    return ds.select_columns(["doc_id", "text"]).map_batches(
        task_stage(LengthCategorize), batch_format="pyarrow", batch_size=4096)


class LangId(_TokenStage):
    """Reference M10 heuristic re-expressed as stopword-hit voting with a
    fixed language priority for ties (en > es > de > fr; all-zero →
    'other'). Sets compiled once per actor."""

    def __init__(self):
        super().__init__()
        self.sets = {lang: frozenset(ws) for lang, ws in STOPWORDS.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text")
        doc_idx, codes, uniques, tfs, doc_lens = \
            self.tok.batch_term_counts_coded(texts)
        n = len(texts)
        uni = uniques.to_pylist()
        counts = {}
        for lang, s in self.sets.items():
            mask = np.fromiter((u in s for u in uni), bool, len(uni))
            w = tfs * mask[codes] if len(codes) else np.empty(0, np.int64)
            counts[lang] = np.bincount(doc_idx, weights=w, minlength=n) \
                .astype(np.int64) if len(codes) else np.zeros(n, np.int64)
        lang = np.full(n, "other", object)
        best = np.zeros(n, np.int64)
        for lg in reversed(LANG_ORDER):  # earlier langs win ties (>=)
            c = counts[lg]
            sel = (c > 0) & (c >= best)
            lang[sel] = lg
            best = np.maximum(best, c)
        return pa.table({"doc_id": batch.column("doc_id"),
                         "lang_guess": pa.array(lang, pa.string())})


def langid(ds: rd.Dataset) -> rd.Dataset:
    return ds.select_columns(["doc_id", "text"]).map_batches(
        task_stage(LangId), batch_format="pyarrow", batch_size=4096)


class QualityScore(_TokenStage):
    """Length/stopword quality signals: n_chars, n_words, avg word length
    and English-stopword ratio (both _q6-quantized)."""

    def __init__(self):
        super().__init__()
        self.stop = frozenset(STOPWORDS["en"])

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        texts = batch.column("text")
        doc_idx, codes, uniques, tfs, doc_lens = \
            self.tok.batch_term_counts_coded(texts)
        n = len(texts)
        n_words = doc_lens.astype(np.int64)
        if len(codes):
            ulen = np.asarray(pc.utf8_length(uniques), np.float64)
            tok_chars = np.bincount(doc_idx, weights=tfs * ulen[codes],
                                    minlength=n)
            smask = np.fromiter((u in self.stop for u in uniques.to_pylist()),
                                bool, len(uniques))
            n_stop = np.bincount(doc_idx, weights=tfs * smask[codes],
                                 minlength=n)
        else:
            tok_chars = np.zeros(n, np.float64)
            n_stop = np.zeros(n, np.float64)
        denom = np.maximum(n_words, 1).astype(np.float64)
        import pyarrow.compute as pc2
        n_chars = pc2.fill_null(pc2.utf8_length(batch.column("text")), 0) \
            .cast(pa.int64())
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_chars": n_chars,
            "n_words": pa.array(n_words, pa.int64()),
            "avg_word_len_q6": pa.array(q6(tok_chars / denom), pa.int64()),
            "stop_ratio_q6": pa.array(q6(n_stop / denom), pa.int64()),
        })


def quality_score(ds: rd.Dataset) -> rd.Dataset:
    return ds.select_columns(["doc_id", "text"]).map_batches(
        task_stage(QualityScore), batch_format="pyarrow", batch_size=4096)


def distribution_counts(ds: rd.Dataset) -> rd.Dataset:
    """Reference A7 (``generate_dataset.py:317-343``): per-(lang, source)
    group counts + n_chars min/max/avg over the documents table."""
    from ray.data.aggregate import Count, Max, Mean, Min

    agg = ds.select_columns(["lang", "source", "n_chars"]) \
        .groupby(["lang", "source"]).aggregate(
            Count(alias_name="n_docs"),
            Min("n_chars", alias_name="min_chars"),
            Max("n_chars", alias_name="max_chars"),
            Mean("n_chars", alias_name="avg_chars"))

    def finalize(batch: pa.Table) -> pa.Table:
        av = batch.column("avg_chars").to_numpy()
        return batch.drop_columns(["avg_chars"]).append_column(
            "avg_chars_q6", pa.array(q6(av), pa.int64()))

    return agg.map_batches(finalize, batch_format="pyarrow")


def corpus_sample(ds: rd.Dataset, n: int, seed: int = 42) -> rd.Dataset:
    """Reference A8+A9 (``generate_dataset.py:287-288``): seeded shuffle +
    truncate. Deterministic within the engine (seeded) but not
    SQL-matchable → rows-only driver check."""
    return ds.random_shuffle(seed=seed).limit(n)


def corpus_sample_hash(ds: rd.Dataset, rate_ppm: int = 200_000,
                       seed: int = 17) -> rd.Dataset:
    """Deterministic hash sampling: keep a row iff
    ``h(doc_id) < rate_ppm/1e6 * P53`` — the shuffle-FREE form of A8 a
    100 TB pipeline actually uses (a pure per-batch filter; no exchange,
    no order dependence, reproducible across any partitioning). The
    two-round LCG mod the Mersenne prime 2^31-1 keeps every intermediate
    below 2^62, so DuckDB BIGINT arithmetic reproduces it bit-for-bit
    (SQL-checked); the ~10^9 multiplier gives real avalanche for small
    ids (a small multiplier mod a 53-bit prime never wraps and degrades
    into a contiguous-prefix "sample")."""
    import numpy as np

    from bge_m3_onnx_ray.hashing import P31
    p = np.uint64(P31)
    a = np.uint64(1103515245)
    thresh = np.uint64((rate_ppm * int(P31)) // 1_000_000)
    s = np.uint64(seed)

    def keep(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy().astype(np.uint64)
        h = ((d % p) * a + s) % p
        h = (h * a + s) % p
        return t.filter(pa.array(h < thresh))

    return ds.map_batches(keep, batch_format="pyarrow")


def text_variations(ds: rd.Dataset) -> rd.Dataset:
    """Reference M8 (``generate_variations``, ``generate_dataset.py:
    153-168``): flat-map each doc to <=3 deterministic prefix/suffix
    variants with in-list dedup. Output (doc_id, variant_idx, text)."""

    def explode(batch: pa.Table) -> pa.Table:
        ids, vidx, texts = [], [], []
        for doc_id, text in zip(batch.column("doc_id").to_pylist(),
                                batch.column("text").to_pylist()):
            t = text or ""
            variants = []
            # strip(" ") == SQL trim() semantics (space only)
            for v in (t, t.strip(" "), f"{t} explained"):
                if v not in variants:        # in-list dedup, as the reference
                    variants.append(v)
            for i, v in enumerate(variants):
                ids.append(doc_id)
                vidx.append(i)
                texts.append(v)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "variant_idx": pa.array(vidx, pa.int64()),
                         "text": pa.array(texts, pa.string())})

    return ds.select_columns(["doc_id", "text"]).map_batches(
        explode, batch_format="pyarrow", batch_size=4096)


def doc_term_weights(ds: rd.Dataset, max_doc_id: int | None = None,
                     k1: float = 1.2, b: float = 0.75) -> rd.Dataset:
    """Per-document BM25 term weights — the table-operator form of the
    reference's per-document sparse-lexical extraction (M6,
    ``samples/python/bge_m3_embedder.py:132-143``): one row per
    (doc, term) with the exact BM25 weight the index's scorer would
    contribute for that term. Output (doc_id, term, tf, weight_q6).

    Two passes: a partial-df aggregation (small: one row per term per
    batch) collected into a broadcast idf map, then a vectorized per-doc
    weight pass. Scale note: the broadcast dictionary is fine to ~10^7
    terms; beyond that the idf lookup becomes a bucket join.
    """
    import ray

    from bge_m3_onnx_ray.scoring import bm25_term_score, idf as idf_fn

    src = ds.select_columns(["doc_id", "text"])
    from bge_m3_onnx_ray.stages._groups import bucket_reduce
    dfp = bucket_reduce(
        src.map_batches(task_stage(_DfPartial), batch_format="pyarrow",
                        batch_size=4096),
        ["term"], [("df", "sum", "df")]).to_pandas()
    cs = corpus_stats(src)
    n_docs = cs.column("n_docs")[0].as_py()
    avgdl = cs.column("n_tokens")[0].as_py() / n_docs if n_docs else 1.0
    # an all-empty corpus yields a column-less empty aggregate
    idfs = ({t: idf_fn(int(d), n_docs) for t, d in zip(dfp.term, dfp.df)}
            if "term" in dfp.columns else {})
    idf_ref = ray.put(idfs)

    out = src
    if max_doc_id is not None:
        import pyarrow.compute as pc
        out = out.map_batches(lambda t: t.filter(pc.less(t["doc_id"], max_doc_id)),
                              batch_format="pyarrow")
    return out.map_batches(
        task_stage(_WeightStage, idf_ref=idf_ref, avgdl=avgdl, k1=k1, b=b),
        batch_format="pyarrow", batch_size=4096)


class _WeightStage(_TokenStage):
    """Per-doc BM25 weight rows; idf map fetched from the object store
    once per worker (broadcast pattern — never re-shipped per batch)."""

    def __init__(self, idf_ref, avgdl: float, k1: float, b: float):
        import ray
        super().__init__()
        self.idfs = ray.get(idf_ref)
        self.avgdl, self.k1, self.b = avgdl, k1, b

    def __call__(self, batch: pa.Table) -> pa.Table:
        from bge_m3_onnx_ray.scoring import bm25_term_score
        doc_idx, codes, uniques, tfs, doc_lens = \
            self.tok.batch_term_counts_coded(batch.column("text"))
        doc_ids = batch.column("doc_id").to_numpy()
        uni = uniques.to_pylist()
        uidf = np.array([self.idfs.get(u, 0.0) for u in uni], np.float64)
        w = bm25_term_score(tfs.astype(np.float64),
                            doc_lens[doc_idx].astype(np.float64),
                            1.0, self.avgdl, self.k1, self.b) * uidf[codes] \
            if len(codes) else np.empty(0, np.float64)
        return pa.table({
            "doc_id": pa.array(doc_ids[doc_idx], pa.int64()),
            "term": uniques.take(pa.array(codes)).cast(pa.string()),
            "tf": pa.array(tfs.astype(np.int64), pa.int64()),
            "weight_q6": pa.array(q6(w), pa.int64()),
        })


class Fingerprint:
    """Order-sensitive document fingerprint: 53-bit polynomial rolling
    hash over the raw text's Unicode codepoints (``hashing.poly_hash``,
    one vectorized Horner sweep per batch — no per-byte Python loop).
    Content-defined identity that survives re-partitioning, and exactly
    reproducible in DuckDB SQL → value-hash-checked by the driver."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from bge_m3_onnx_ray.hashing import P53, poly_hash
        h = poly_hash(batch.column("text"), P53)
        return pa.table({"doc_id": batch.column("doc_id"),
                         "fingerprint": pa.array(h.astype(np.int64), pa.int64())})


def fingerprint(ds: rd.Dataset) -> rd.Dataset:
    return ds.select_columns(["doc_id", "text"]).map_batches(
        task_stage(Fingerprint), batch_format="pyarrow", batch_size=4096)


def top_docs_per_lang(ds: rd.Dataset, k: int = 3) -> rd.Dataset:
    """The top_hits aggregation: per language bucket, the k largest
    documents by (n_chars desc, doc_id asc), with rank.

    Distributed shape: each batch keeps its own per-lang top-k (a
    combiner — at most k x n_langs rows leave any batch), then ONE tiny
    groupby over lang finishes. Exact: the global top-k per lang is a
    subset of the union of per-batch top-ks."""

    def partial(batch: pa.Table) -> pa.Table:
        lang = batch.column("lang").combine_chunks().dictionary_encode()
        codes = np.asarray(lang.indices).astype(np.int64)
        nc = batch.column("n_chars").to_numpy()
        did = batch.column("doc_id").to_numpy()
        if not len(codes):
            return batch.select(["lang", "doc_id", "n_chars"])
        order = np.lexsort((did, -nc, codes))
        c = codes[order]
        brk = np.empty(len(c), bool)
        brk[0] = True
        brk[1:] = np.diff(c) != 0
        firsts = np.flatnonzero(brk)
        pos = np.arange(len(c)) - np.repeat(firsts, np.diff(
            np.concatenate([firsts, [len(c)]])))
        keep = order[pos < k]
        return pa.table({
            "lang": batch.column("lang").take(pa.array(keep)),
            "doc_id": pa.array(did[keep], pa.int64()),
            "n_chars": pa.array(nc[keep], pa.int64())})

    def final(g: pa.Table) -> pa.Table:
        nc = g.column("n_chars").to_numpy()
        did = g.column("doc_id").to_numpy()
        order = np.lexsort((did, -nc))[:k]
        return pa.table({
            "lang": g.column("lang").take(pa.array(order)),
            "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int32),
                             pa.int32()),
            "doc_id": pa.array(did[order], pa.int64()),
            "n_chars": pa.array(nc[order], pa.int64())})

    return ds.select_columns(["lang", "doc_id", "n_chars"]) \
        .map_batches(partial, batch_format="pyarrow", batch_size=65536) \
        .groupby("lang").map_groups(final, batch_format="pyarrow")


def histogram_n_chars(ds: rd.Dataset, interval: int = 200) -> rd.Dataset:
    """The histogram aggregation: fixed-interval buckets of a numeric
    field with counts. Per-batch partial bucket counts (a combiner — at
    most range/interval rows leave a batch), one bucket_reduce. Buckets
    with no documents are absent (the sparse convention; densify at the
    consumer if a chart needs empty bars)."""
    from bge_m3_onnx_ray.stages._groups import bucket_reduce

    def partial(batch: pa.Table) -> pa.Table:
        nc = batch.column("n_chars").to_numpy()
        if not len(nc):
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "n_docs": pa.array([], pa.int64())})
        b = (nc // interval) * interval
        u, c = np.unique(b, return_counts=True)
        return pa.table({"bucket": pa.array(u, pa.int64()),
                         "n_docs": pa.array(c.astype(np.int64), pa.int64())})

    return bucket_reduce(
        ds.select_columns(["n_chars"]).map_batches(
            partial, batch_format="pyarrow", batch_size=65536),
        ["bucket"], [("n_docs", "sum", "n_docs")], n_buckets=8)


def gopher_repetition(ds: rd.Dataset) -> rd.Dataset:
    """Gopher-style repetition/quality signals per document (Rae et al.
    2021 §A1.1 "repetition removal"), integer-exact so the DuckDB oracle
    hash-matches without quantization.

    Per doc (split on single spaces, the corpus's delimiter):
      n_words          — token count
      max_word_count   — occurrences of the most frequent word
      max_bigram_count — occurrences of the most frequent adjacent bigram
      sum_word_chars   — total characters across words
      keep             — 1 iff ALL of: n_words >= 5;
                         3*n_words <= sum_word_chars <= 10*n_words
                         (mean word length in [3, 10]);
                         5*max_word_count <= n_words (top word <= 20 %);
                         100*max_bigram_count <= 18*(n_words-1)
                         (top bigram <= 18 %).

    Shuffle-free: one vectorized map_batches pass. Per-(doc, word) and
    per-(doc, bigram) counts come from a single np.unique over composite
    int64 keys (doc-major, so one reduceat per batch yields the per-doc
    maxima). Key range is bounded by batch_rows * V^2 with V = distinct
    words in the batch; batch_size=2048 keeps that far under 2^63 for any
    plausible document length (2048 * (2^21)^2 < 2^63 tolerates ~2M
    distinct words per batch).
    """
    return ds.select_columns(["doc_id", "text"]).map_batches(
        gopher_stats, batch_format="pyarrow", batch_size=2048)


def gopher_stats(t: pa.Table) -> pa.Table:
    """Per-batch Gopher repetition kernel (see :func:`gopher_repetition`
    for the semantics and the composite-key bound)."""
    import pyarrow.compute as pc
    n = len(t)
    toks = pc.split_pattern(t.column("text"), " ")
    n_words = pc.list_value_length(toks).to_numpy().astype(np.int64)
    flat = pc.list_flatten(toks)
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), n_words)
    codes = np.unique(np.asarray(flat), return_inverse=True)[1]
    v = np.int64(codes.max() + 2) if len(codes) else np.int64(2)

    # per-(doc, word) max — composite key is doc-major so np.unique's
    # sorted output groups by doc and one reduceat gives the maxima
    out_w = np.zeros(n, np.int64)
    if len(codes):
        uk, kc = np.unique(doc_idx * v + codes, return_counts=True)
        udoc = uk // v
        b = np.flatnonzero(np.r_[True, udoc[1:] != udoc[:-1]])
        out_w[udoc[b]] = np.maximum.reduceat(kc, b)

    out_b = np.zeros(n, np.int64)
    if len(codes) > 1:
        same = doc_idx[1:] == doc_idx[:-1]
        if same.any():
            bk = (doc_idx[:-1][same] * v + codes[:-1][same]) * v \
                + codes[1:][same]
            ub, bc = np.unique(bk, return_counts=True)
            bdoc = ub // (v * v)
            bb = np.flatnonzero(np.r_[True, bdoc[1:] != bdoc[:-1]])
            out_b[bdoc[bb]] = np.maximum.reduceat(bc, bb)

    sum_chars = np.zeros(n, np.int64)
    if len(codes):
        lens = pc.utf8_length(flat).to_numpy().astype(np.int64)
        db = np.flatnonzero(np.r_[True, doc_idx[1:] != doc_idx[:-1]])
        sum_chars[doc_idx[db]] = np.add.reduceat(lens, db)

    keep = ((n_words >= 5)
            & (3 * n_words <= sum_chars) & (sum_chars <= 10 * n_words)
            & (5 * out_w <= n_words)
            & (100 * out_b <= 18 * (n_words - 1)))
    return pa.table({
        "doc_id": t.column("doc_id"),
        "n_words": pa.array(n_words, pa.int64()),
        "max_word_count": pa.array(out_w, pa.int64()),
        "max_bigram_count": pa.array(out_b, pa.int64()),
        "sum_word_chars": pa.array(sum_chars, pa.int64()),
        "keep": pa.array(keep.astype(np.int32), pa.int32()),
    })


def mixture_sample(ds: rd.Dataset, seed: int = 29) -> rd.Dataset:
    """Deterministic per-SOURCE-rate sampling — the domain-mixture
    resampling step of a training-data pipeline (each source kept at its
    own rate, e.g. upweight curated corpora, downsample crawl). Rate for
    source ``src<N>`` is ``(10 + 7*(N % 12))`` percent; keep a row iff
    ``h(doc_id) * 100 < rate * P31`` with the same two-round LCG mod
    2^31-1 as :func:`corpus_sample_hash` (SQL-reproducible bit-for-bit).

    Shuffle-free per-batch filter; the rate table is derived from the
    source string itself so nothing is broadcast. A real pipeline would
    ``ray.put`` a source→rate dict once and look it up here — same shape.
    """
    import pyarrow.compute as pc

    from bge_m3_onnx_ray.hashing import P31
    p = np.uint64(P31)
    a = np.uint64(1103515245)
    s = np.uint64(seed)

    def keep(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy().astype(np.uint64)
        h = ((d % p) * a + s) % p
        h = (h * a + s) % p
        num = pc.cast(pc.utf8_slice_codeunits(
            pc.cast(t.column("source"), pa.string()), 3, 32), pa.int64())
        rate = (10 + 7 * (num.to_numpy().astype(np.int64) % 12)).astype(np.uint64)
        return t.filter(pa.array(h * np.uint64(100) < rate * p))

    return ds.map_batches(keep, batch_format="pyarrow")


def unigram_surprise(ds: rd.Dataset, top_v: int = 1 << 16) -> rd.Dataset:
    """CCNet-shaped LM-quality scoring (Wenzek et al. 2020 use a KenLM
    perplexity filter; this is its integer-exact unigram analogue so the
    DuckDB oracle hash-matches with no float logs).

    Two stages — the canonical "train a small model, broadcast it, score
    the corpus" shape:
      1. corpus term frequencies ``cf`` (per-batch partials →
         ``bucket_reduce``); the model = top ``top_v`` terms by
         (cf desc, term asc) — the enforced bound on broadcast size.
      2. broadcast (sorted terms, surprise) once via ``ray.put``; a
         shuffle-free scoring pass computes per doc
         ``surprise_sum = Σ_tokens bits(total_tokens // cf(term))``
         (bits = bit_length, exact in numpy via power-table searchsorted
         and in DuckDB via ``length(bin(x))``); out-of-model terms score
         ``bits(total_tokens)`` (cf treated as 1).

    Output: (doc_id, n_tokens, surprise_sum) int64. High mean surprise =
    rare-term-heavy (OOV garbage); low = stopword soup — the two tails a
    perplexity filter trims.
    """
    import ray

    from bge_m3_onnx_ray.stages._groups import bucket_reduce

    agg = bucket_reduce(
        ds.select_columns(["doc_id", "text"]).map_batches(
            task_stage(_DfPartial), batch_format="pyarrow",
            batch_size=4096),
        ["term"], [("cf", "sum", "cf")])
    model = agg.to_pandas()
    total = int(model["cf"].sum())
    powers = np.left_shift(np.uint64(1), np.arange(63, dtype=np.uint64)) \
        .astype(np.int64)
    model = model.sort_values(["cf", "term"], ascending=[False, True]) \
        .head(top_v).sort_values("term")
    terms = pa.array(model["term"].to_numpy(), pa.string())
    bits = np.searchsorted(
        powers, total // model["cf"].to_numpy().astype(np.int64),
        side="right").astype(np.int64)
    default = int(np.searchsorted(powers, total, side="right"))
    ref = ray.put((terms, bits))

    class Score(_TokenStage):
        def __init__(self):
            super().__init__()
            self.terms, self.bits = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            n = len(batch)
            doc_idx, codes, uniques, tfs, doc_lens = \
                self.tok.batch_term_counts_coded(batch.column("text"))
            out = np.zeros(n, np.int64)
            if len(codes):
                pos = pc.index_in(uniques, value_set=self.terms) \
                    .to_numpy(zero_copy_only=False)
                sur = np.where(np.isnan(pos.astype(np.float64)), default,
                               self.bits[np.nan_to_num(pos).astype(np.int64)])
                contrib = tfs.astype(np.int64) * sur[codes]
                b = np.flatnonzero(np.r_[True, doc_idx[1:] != doc_idx[:-1]])
                out[doc_idx[b]] = np.add.reduceat(contrib, b)
            return pa.table({
                "doc_id": batch.column("doc_id"),
                "n_tokens": pa.array(doc_lens.astype(np.int64), pa.int64()),
                "surprise_sum": pa.array(out, pa.int64()),
            })

    return ds.select_columns(["doc_id", "text"]).map_batches(
        task_stage(Score), batch_format="pyarrow", batch_size=4096)


def collocations(ds: rd.Dataset, min_count: int = 5, k: int = 50) -> pa.Table:
    """Collocation (bigram) extraction ranked by pointwise mutual
    information: PMI = ln((c_xy * U * U) / (B * c_x * c_y)) with c_xy
    the bigram count, c_x/c_y unigram counts, U total tokens, B total
    bigrams — every input an exact integer, so the float PMI is a pure
    function of integers and the SQL oracle agrees bit-for-bit. Output:
    top ``k`` bigrams with count >= ``min_count`` by (pmi desc, x, y).

    Distributed shape: ONE bucket_reduce over per-batch pre-aggregated
    bigram counts; unigram counts reduce the same way and broadcast as
    a vocabulary-bounded dict (the same assumption the index dictionary
    tier makes); PMI + the top-k cut run vectorized over the reduced
    bigram table."""
    import pyarrow.compute as pc

    from bge_m3_onnx_ray.stages._groups import bucket_reduce
    from bge_m3_onnx_ray.tokenizer import DeterministicTokenizer

    def bigram_partial(t: pa.Table) -> pa.Table:
        tok = DeterministicTokenizer()
        flat, offsets = tok.batch_token_lists(t.column("text"))
        lens = np.diff(offsets)
        doc_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        n = len(doc_of)
        if n < 2:
            return pa.table({"x": pa.array([], pa.string()),
                             "y": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        same = doc_of[1:] == doc_of[:-1]
        xs = flat.slice(0, n - 1).filter(pa.array(same))
        ys = flat.slice(1, n - 1).filter(pa.array(same))
        # space separator: tokens are \w+ runs, so a space cannot occur
        # inside either side and the partition below is unambiguous
        pair = pc.binary_join_element_wise(
            xs, ys, pa.scalar(" ", pa.large_string()))
        u, c = np.unique(np.asarray(pair, dtype=object).astype(str),
                         return_counts=True)
        split = np.char.partition(u, " ")
        return pa.table({"x": pa.array(split[:, 0], pa.string()),
                         "y": pa.array(split[:, 2], pa.string()),
                         "c": pa.array(c.astype(np.int64), pa.int64())})

    def unigram_partial(t: pa.Table) -> pa.Table:
        tok = DeterministicTokenizer()
        _, codes, uniques, tfs, _ = tok.batch_term_counts_coded(
            t.column("text"))
        if not len(codes):
            return pa.table({"term": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        cf = np.bincount(codes, weights=tfs).astype(np.int64)
        return pa.table({"term": uniques.cast(pa.string()),
                         "c": pa.array(cf, pa.int64())})

    import ray

    src = ds.select_columns(["text"])
    bi = bucket_reduce(
        src.map_batches(bigram_partial, batch_format="pyarrow",
                        batch_size=8192),
        ["x", "y"], [("c", "sum", "c")]).materialize()
    uni = bucket_reduce(
        src.map_batches(unigram_partial, batch_format="pyarrow",
                        batch_size=8192),
        ["term"], [("c", "sum", "c")]).to_pandas()
    cf = dict(zip(uni["term"], uni["c"].astype(int)))
    n_uni = int(uni["c"].sum())
    n_bi = int(bi.sum("c") or 0)
    model = ray.put((cf, float(n_uni), float(n_bi)))

    def score_partial(t: pa.Table) -> pa.Table:
        cfm, u_f, b_f = ray.get(model)
        import pandas as pd
        d = t.to_pandas()
        d = d[d["c"] >= min_count]
        if not len(d):
            return pa.table({"x": pa.array([], pa.string()),
                             "y": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64()),
                             "pmi_q6": pa.array([], pa.int64())})
        cx = d["x"].map(cfm).to_numpy(np.float64)
        cy = d["y"].map(cfm).to_numpy(np.float64)
        cxy = d["c"].to_numpy(np.float64)
        pmi = np.log((cxy * u_f * u_f) / (b_f * cx * cy))
        d = d.assign(pmi_q6=np.floor(pmi * 1e6).astype(np.int64))
        # per-batch partial top-k (tie-safe: quantized key is exact)
        d = d.sort_values(["pmi_q6", "x", "y"],
                          ascending=[False, True, True]).head(k)
        return pa.Table.from_pandas(d[["x", "y", "c", "pmi_q6"]],
                                    preserve_index=False)

    parts = bi.map_batches(score_partial, batch_format="pyarrow",
                           batch_size=65536).to_pandas()
    parts = parts.sort_values(["pmi_q6", "x", "y"],
                              ascending=[False, True, True]).head(k)
    return pa.Table.from_pandas(parts.reset_index(drop=True),
                                preserve_index=False)


def weighted_sample(ds: rd.Dataset, k: int = 100,
                    seed: int = 17) -> pa.Table:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis–Spirtakis A-Res): each doc gets key = ln(u)/w with
    w = its token count and u a (0,1] uniform derived from the same
    two-round LCG-mod-2^31-1 hash the engine's SQL-mirrored sampler
    uses; the k largest keys ARE a weighted sample without replacement.
    Every input is an integer, the key expression is mirrored verbatim
    by the oracle, so the sample is bit-reproducible across engines and
    partitionings — the "sample training docs proportional to length/
    quality" step, with zero randomness at run time.

    Shuffle-free: per-batch keys + tie-safe partial top-k, one tiny
    driver merge. Zero-token docs carry no weight and never sample.
    Output (doc_id, n_words, key_q6) sorted by doc_id."""
    from bge_m3_onnx_ray.hashing import P31

    p = np.uint64(P31)
    a = np.uint64(1103515245)
    s = np.uint64(seed)

    def partial(t: pa.Table) -> pa.Table:
        tok = DeterministicTokenizer()
        _, _, _, _, dls = tok.batch_term_counts_coded(t.column("text"))
        d = t.column("doc_id").to_numpy().astype(np.uint64)
        h = ((d % p) * a + s) % p
        h = (h * a + s) % p
        w = dls.astype(np.float64)
        keep = w > 0
        key = np.log((h[keep].astype(np.float64) + 1.0) / 2147483648.0) \
            / w[keep]
        dd = d[keep].astype(np.int64)
        order = np.lexsort((dd, -key))
        if len(order) > k:                   # tie-safe pre-cut
            kth = key[order[k - 1]]
            order = order[key[order] >= kth]
        return pa.table({
            "doc_id": pa.array(dd[order], pa.int64()),
            "n_words": pa.array(dls[keep][order].astype(np.int64),
                                pa.int64()),
            "key_q6": pa.array(np.floor(key[order] * 1e6).astype(np.int64),
                               pa.int64()),
            "_key": pa.array(key[order], pa.float64())})

    parts = ds.select_columns(["doc_id", "text"]).map_batches(
        partial, batch_format="pyarrow", batch_size=8192).to_pandas()
    parts = parts.sort_values(["_key", "doc_id"],
                              ascending=[False, True]).head(k)
    parts = parts.sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(parts[["doc_id", "n_words", "key_q6"]],
                                preserve_index=False)


def distribution_rollup(ds: rd.Dataset) -> pa.Table:
    """GROUP BY ROLLUP(lang, source) over the documents table: the flat
    (lang, source) doc counts plus per-lang subtotals plus the grand
    total, NULL marking the rolled-up level (standard ROLLUP
    semantics; NULLs rendered as '(all)' so the gate's hash covers
    them). Distribution is the flat distributed aggregate — subtotals
    derive from the (small by construction) flat group table on the
    driver, exactly as a SQL engine computes ROLLUP from the finest
    grouping."""
    import pandas as pd

    from bge_m3_onnx_ray.stages._groups import bucket_reduce

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        lang = t.column("lang").combine_chunks().dictionary_encode()
        src = t.column("source").combine_chunks().dictionary_encode()
        lc = np.asarray(lang.indices).astype(np.int64)
        sc = np.asarray(src.indices).astype(np.int64)
        key = lc * (len(src.dictionary) + 1) + sc
        u, c = np.unique(key, return_counts=True)
        return pa.table({
            "lang": lang.dictionary.take(
                pa.array(u // (len(src.dictionary) + 1))).cast(pa.string()),
            "source": src.dictionary.take(
                pa.array(u % (len(src.dictionary) + 1))).cast(pa.string()),
            "n_docs": pa.array(c.astype(np.int64), pa.int64())})

    flat = bucket_reduce(
        ds.select_columns(["lang", "source"]).map_batches(
            partial, batch_format="pyarrow", batch_size=16384),
        ["lang", "source"], [("n_docs", "sum", "n_docs")],
        n_buckets=8).to_pandas()
    sub = flat.groupby("lang", as_index=False)["n_docs"].sum()
    sub["source"] = "(all)"
    total = pd.DataFrame([{"lang": "(all)", "source": "(all)",
                           "n_docs": int(flat["n_docs"].sum())}])
    out = pd.concat([flat, sub[["lang", "source", "n_docs"]], total],
                    ignore_index=True).sort_values(
        ["lang", "source"]).reset_index(drop=True)
    out["n_docs"] = out["n_docs"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


def distribution_cube(ds: rd.Dataset) -> pa.Table:
    """GROUP BY CUBE(lang, source): the ROLLUP result plus the
    per-SOURCE subtotal slice — all four grouping sets, NULL levels
    rendered '(all)'. Same scale shape as :func:`distribution_rollup`:
    ONE distributed flat aggregate; every coarser set derives from the
    (types x sources)-sized flat table on the driver."""
    import pandas as pd

    flat = distribution_rollup(ds).to_pandas()
    flat = flat[(flat.lang != "(all)") & (flat.source != "(all)")]
    sub_l = flat.groupby("lang", as_index=False)["n_docs"].sum()
    sub_l["source"] = "(all)"
    sub_s = flat.groupby("source", as_index=False)["n_docs"].sum()
    sub_s["lang"] = "(all)"
    total = pd.DataFrame([{"lang": "(all)", "source": "(all)",
                           "n_docs": int(flat["n_docs"].sum())}])
    out = pd.concat([flat, sub_l[["lang", "source", "n_docs"]],
                     sub_s[["lang", "source", "n_docs"]], total],
                    ignore_index=True).sort_values(
        ["lang", "source"]).reset_index(drop=True)
    out["n_docs"] = out["n_docs"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


def distribution_grouping_sets(ds) -> "pa.Table":
    """GROUP BY GROUPING SETS ((lang, source), (lang, chars_bucket),
    ()) over the documents table — the arbitrary-sets generalization
    that neither ROLLUP nor CUBE produces (it mixes two different
    dimension PAIRS plus the grand total). chars_bucket =
    (n_chars // 100) * 100; NULL levels render '(all)'. Output
    (lang, source, chars_bucket, n_docs) ordered by all three.

    Scale shape: ONE distributed flat aggregate over the finest
    grouping (lang x source x bucket — bounded by vocabulary, not
    rows, so the flat table is tiny by construction); every requested
    set derives from the flat table on the driver, exactly how a SQL
    engine computes grouping sets from the finest level."""
    import pandas as pd
    import pyarrow as pa

    from bge_m3_onnx_ray.stages._groups import bucket_reduce

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        lang = t.column("lang").combine_chunks().dictionary_encode()
        src_ = t.column("source").combine_chunks().dictionary_encode()
        bkt = (t.column("n_chars").to_numpy().astype(np.int64)
               // 100 * 100)
        lc = np.asarray(lang.indices).astype(np.int64)
        sc = np.asarray(src_.indices).astype(np.int64)
        ub, binv = np.unique(bkt, return_inverse=True)
        ns, nb = len(src_.dictionary), len(ub)
        key = (lc * ns + sc) * nb + binv
        u, c = np.unique(key, return_counts=True)
        return pa.table({
            "lang": lang.dictionary.take(
                pa.array(u // nb // ns)).cast(pa.string()),
            "source": src_.dictionary.take(
                pa.array(u // nb % ns)).cast(pa.string()),
            "chars_bucket": pa.array(ub[u % nb], pa.int64()),
            "n_docs": pa.array(c.astype(np.int64), pa.int64())})

    flat = bucket_reduce(
        ds.select_columns(["lang", "source", "n_chars"]).map_batches(
            partial, batch_format="pyarrow", batch_size=16384),
        ["lang", "source", "chars_bucket"],
        [("n_docs", "sum", "n_docs")], 16).to_pandas()
    flat["chars_bucket"] = flat["chars_bucket"].astype("int64")
    s1 = flat.groupby(["lang", "source"], as_index=False)["n_docs"].sum()
    s1["chars_bucket"] = "(all)"
    s2 = flat.groupby(["lang", "chars_bucket"],
                      as_index=False)["n_docs"].sum()
    s2["source"] = "(all)"
    s2["chars_bucket"] = s2["chars_bucket"].astype(str)
    total = pd.DataFrame([{"lang": "(all)", "source": "(all)",
                           "chars_bucket": "(all)",
                           "n_docs": int(flat["n_docs"].sum())}])
    out = pd.concat([s1[["lang", "source", "chars_bucket", "n_docs"]],
                     s2[["lang", "source", "chars_bucket", "n_docs"]],
                     total], ignore_index=True).sort_values(
        ["lang", "source", "chars_bucket"]).reset_index(drop=True)
    out["n_docs"] = out["n_docs"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


class CurationFlags:
    """Per-batch kernel for :func:`corpus_curation`: every curation
    signal in ONE pass over the text (language vote, Gopher repetition,
    stopword-quality, content hash) so the corpus is read exactly once.
    Emits per-doc cumulative pass flags p1 ⊇ p2 ⊇ p3 plus the
    106-bit content-hash lanes used by the dedup stage."""

    def __init__(self, min_words: int = 10,
                 min_stop_ratio_q6: int = 40_000):
        self.langid = LangId()
        self.quality = QualityScore()
        self.min_words = min_words
        self.min_stop = min_stop_ratio_q6

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from bge_m3_onnx_ray.hashing import P53, poly_hash
        lg = self.langid(t).column("lang_guess")
        q = self.quality(t)
        g = gopher_stats(t)
        p1 = pc.equal(lg, "en").to_numpy(zero_copy_only=False)
        p2 = p1 & g.column("keep").to_numpy().astype(bool)
        p3 = p2 & (q.column("n_words").to_numpy() >= self.min_words) \
            & (q.column("stop_ratio_q6").to_numpy() >= self.min_stop)
        h1 = poly_hash(t.column("text"), P53)
        h2 = poly_hash(t.column("text"), P53, base=np.uint64(257))
        return pa.table({
            "doc_id": t.column("doc_id"),
            "h1": pa.array(h1.astype(np.int64)),
            "h2": pa.array(h2.astype(np.int64)),
            "p1": pa.array(p1.astype(np.int8), pa.int8()),
            "p2": pa.array(p2.astype(np.int8), pa.int8()),
            "p3": pa.array(p3.astype(np.int8), pa.int8())})


def corpus_curation(ds: rd.Dataset, min_words: int = 10,
                    min_stop_ratio_q6: int = 40_000) -> pa.Table:
    """Composed training-data curation funnel — the RefinedWeb/FineWeb
    pipeline shape: language filter → Gopher repetition filter →
    stopword-quality filter → exact dedup, each stage over the previous
    stage's survivors. Output (stage_idx, stage, n_docs): five rows,
    the per-stage survivor counts a curation run reports.

    Scale shape: the corpus is read ONCE (all signals in one
    ``map_batches`` kernel); the flags table is ~40 B/row (≈3 orders
    smaller than the text) and is materialized so the count pass and
    the dedup pass don't re-read the corpus; the dedup count is a
    bucket-reduced distinct over the 106-bit content hash — one 16-byte
    exchange of stage-3 survivors, never the text."""
    from ray.data.aggregate import Count

    from bge_m3_onnx_ray.stages._groups import bucket_reduce

    flags = ds.select_columns(["doc_id", "text"]).map_batches(
        task_stage(CurationFlags, min_words=min_words,
                   min_stop_ratio_q6=min_stop_ratio_q6),
        batch_format="pyarrow", batch_size=2048).materialize()

    agg = flags.aggregate(Count(alias_name="n"),
                          Sum("p1", alias_name="c1"),
                          Sum("p2", alias_name="c2"),
                          Sum("p3", alias_name="c3"))
    survivors = flags.filter(expr="p3 == 1").select_columns(["h1", "h2"])
    n4 = bucket_reduce(survivors, ["h1", "h2"],
                       [(None, "count", "n")]).count()
    names = ["total", "lang_en", "gopher_keep", "quality", "exact_dedup"]
    counts = [int(agg["n"]), int(agg["c1"]), int(agg["c2"]),
              int(agg["c3"]), int(n4)]
    return pa.table({
        "stage_idx": pa.array(range(5), pa.int64()),
        "stage": pa.array(names, pa.string()),
        "n_docs": pa.array(counts, pa.int64())})


# ------------------------------------------------ source divergence

class _SourceTermPartial:
    """Per-batch (term, source, c) partials — one row per (term, source)
    per batch, the pre-aggregation that keeps the term shuffle
    vocabulary-sized instead of token-sized."""

    def __init__(self):
        self.tok = DeterministicTokenizer()

    def __call__(self, t: pa.Table) -> pa.Table:
        doc_idx, codes, uniques, tfs, _ = \
            self.tok.batch_term_counts_coded(t.column("text"))
        empty = pa.table({"term": pa.array([], pa.string()),
                          "source": pa.array([], pa.string()),
                          "c": pa.array([], pa.int64())})
        if not len(codes):
            return empty
        sd = t.column("source").combine_chunks().dictionary_encode()
        s_idx = np.asarray(sd.indices)[doc_idx].astype(np.int64)
        nsrc = len(sd.dictionary)
        k = codes.astype(np.int64) * nsrc + s_idx
        uk, inv = np.unique(k, return_inverse=True)
        c = np.bincount(inv, weights=tfs).astype(np.int64)
        return pa.table({
            "term": uniques.take(pa.array(uk // nsrc, pa.int64()))
                           .cast(pa.string()),
            "source": sd.dictionary.take(pa.array(uk % nsrc, pa.int64()))
                                   .cast(pa.string()),
            "c": pa.array(c, pa.int64())})


def source_divergence(ds: rd.Dataset, n_buckets: int = 256) -> pa.Table:
    """Per-source unigram-distribution drift vs the whole corpus, as the
    EXACT total-variation distance — the integer-exact stand-in for the
    KL/perplexity drift monitor a mixture-training pipeline runs per
    domain (the CCNet/Pile per-source quality-monitoring shape, kept
    log-free so the DuckDB oracle hash-matches; cf.
    :func:`unigram_surprise` for the same convention).

    TV(P_s, Q) = ½ Σ_t |c_st·N − c_t·N_s| / (N_s·N) with every product
    in int64 (guarded: raises when N_s·N approaches 2^62 — at that
    scale, split the numerator into high/low lanes) and the final
    division done in arbitrary-precision Python on ≤ n_sources rows.
    Output (source, n_tokens, tv_q9), tv quantized to 1e-9.

    Scale shape: tokens pre-aggregate per batch to (term, source)
    partials; ONE vocabulary-sized bucket_reduce finalizes counts (and
    is materialized — read twice, never re-tokenized); a tiny per-source
    total pass broadcasts (sources, N_s, N); a second term-bucketed
    exchange computes per-bucket per-source |·| partial sums fully
    vectorized (a term's every source row shares its bucket, so c_t is
    in-bucket; absent sources get their c_t·N_s term via a bucket-total
    baseline plus a per-present-row correction). The driver only ever
    holds n_buckets × n_sources partials."""
    import ray

    from bge_m3_onnx_ray.hashing import P53, poly_hash
    from bge_m3_onnx_ray.stages._groups import bucket_reduce

    counts = bucket_reduce(
        ds.select_columns(["source", "text"]).map_batches(
            task_stage(_SourceTermPartial), batch_format="pyarrow",
            batch_size=4096),
        ["term", "source"], [("c", "sum", "c")]).materialize()

    ns_df = bucket_reduce(counts, ["source"], [("c", "sum", "n")], 16) \
        .to_pandas().sort_values("source").reset_index(drop=True)
    srcs = ns_df["source"].to_numpy().astype(str)
    ns_arr = ns_df["n"].to_numpy().astype(np.int64)
    total = int(ns_arr.sum())
    if total and ns_arr.max() * total >= (1 << 62):
        raise ValueError("source_divergence int64 range exceeded: "
                         "split |c_st*N - c_t*N_s| into hi/lo lanes")
    ref = ray.put((srcs, ns_arr, total))

    def add_bucket(t: pa.Table) -> pa.Table:
        h = poly_hash(t.column("term"), P53)
        return t.append_column(
            "_bucket", pa.array((h % np.uint64(n_buckets)).astype(np.int64)))

    def kernel(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        srcs_l, ns_l, n_l = ray.get(ref)
        n = g.num_rows
        empty = pa.table({"source": pa.array([], pa.string()),
                          "s_partial": pa.array([], pa.int64())})
        if not n:
            return empty
        order = pc.sort_indices(g, sort_keys=[("term", "ascending")])
        tbl = g.take(order)
        c = tbl.column("c").to_numpy()
        term = tbl.column("term").combine_chunks()
        change = np.asarray(pc.not_equal(term.slice(1), term.slice(0, n - 1))
                            .to_numpy(zero_copy_only=False))
        starts = np.concatenate([[0], np.flatnonzero(change) + 1])
        c_t_run = np.add.reduceat(c, starts)            # per distinct term
        run_id = np.zeros(n, np.int64)
        run_id[starts[1:]] = 1
        run_id = np.cumsum(run_id)
        c_t = c_t_run[run_id]                           # per row
        # baseline: every source absent from every term in this bucket
        acc = int(c_t_run.sum()) * ns_l.astype(np.int64)
        # correction for the (term, source) rows actually present
        si = np.searchsorted(srcs_l, tbl.column("source")
                             .to_numpy(zero_copy_only=False).astype(str))
        adj = np.abs(c * n_l - c_t * ns_l[si]) - c_t * ns_l[si]
        np.add.at(acc, si, adj)
        return pa.table({"source": pa.array(srcs_l, pa.string()),
                         "s_partial": pa.array(acc, pa.int64())})

    parts = counts.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("_bucket").map_groups(kernel, batch_format="pyarrow") \
        .to_pandas()
    sums = parts.groupby("source")["s_partial"].sum()
    tv = []
    for s, n_s in zip(srcs, ns_arr):
        num = int(sums.get(s, 0)) * 1_000_000_000
        tv.append(num // (2 * int(n_s) * total) if total and n_s else 0)
    return pa.table({"source": pa.array(srcs, pa.string()),
                     "n_tokens": pa.array(ns_arr, pa.int64()),
                     "tv_q9": pa.array(tv, pa.int64())})


# ------------------------------------------------- feature hashing

class _HashedFeatures:
    """Per-batch hashing-trick featurizer: tokens → (doc_id, feat_idx,
    feat_val) long-form sparse vectors, fully vectorized (one poly-hash
    sweep over the batch's UNIQUE terms, one composite-key reduce for
    the per-(doc, idx) signed sums)."""

    def __init__(self, dim: int):
        self.tok = DeterministicTokenizer()
        self.dim = dim

    def __call__(self, t: pa.Table) -> pa.Table:
        from bge_m3_onnx_ray.hashing import P53, poly_hash
        doc_idx, codes, uniques, tfs, _ = \
            self.tok.batch_term_counts_coded(t.column("text"))
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "feat_idx": pa.array([], pa.int64()),
                          "feat_val": pa.array([], pa.int64())})
        if not len(codes):
            return empty
        h = poly_hash(uniques, P53)
        idx = (h % np.uint64(self.dim)).astype(np.int64)[codes]
        sign = np.where(((h // np.uint64(self.dim)) & np.uint64(1))
                        .astype(np.int64)[codes] == 0, 1, -1)
        k = doc_idx * self.dim + idx
        uk, inv = np.unique(k, return_inverse=True)
        vals = np.zeros(len(uk), np.int64)
        np.add.at(vals, inv, sign * tfs.astype(np.int64))
        docs = t.column("doc_id").to_numpy()
        keep = vals != 0            # signed collisions can cancel
        uk, vals = uk[keep], vals[keep]
        return pa.table({
            "doc_id": pa.array(docs[uk // self.dim], pa.int64()),
            "feat_idx": pa.array(uk % self.dim, pa.int64()),
            "feat_val": pa.array(vals, pa.int64())})


def hashed_features(ds: rd.Dataset, dim: int = 1024) -> rd.Dataset:
    """Feature hashing (Weinberger et al. 2009, "Feature hashing for
    large scale multitask learning" — the sklearn HashingVectorizer /
    VW shape): each doc becomes a ``dim``-dimensional sparse vector,
    feat_idx = hash(term) mod dim, value = Σ ±tf with the unbiasing
    sign bit drawn from the next hash bit. Stateless and vocabulary-
    free — the reason the trick exists at 100 TB: no dictionary to
    build, broadcast, or keep consistent across shards; the whole op
    is ONE map-only pass. Zero-sum features (signed collisions that
    cancel) are dropped on both sides. Output long-form
    (doc_id, feat_idx, feat_val)."""
    return ds.select_columns(["doc_id", "text"]).map_batches(
        task_stage(_HashedFeatures, dim=dim), batch_format="pyarrow",
        batch_size=4096)


def lang_length_pivot(ds: rd.Dataset) -> rd.Dataset:
    """PIVOT / crosstab: documents cross-tabulated as language rows ×
    length-category columns — the wide-format report shape (SQL PIVOT /
    pandas crosstab). Output (lang_guess, n_short, n_medium, n_long,
    n_total), one row per detected language.

    Scale shape: each batch computes langid + length category locally
    and pre-reduces to ≤ n_langs wide partial rows (the pivot happens
    BEFORE the exchange — a long-format groupby would shuffle
    n_langs × n_categories rows and still need the widening), then one
    tiny bucket_reduce sums the partials."""
    from bge_m3_onnx_ray.stages._groups import bucket_reduce

    class _PivotPartial:
        def __init__(self):
            self.langid = LangId()
            self.lencat = LengthCategorize()

        def __call__(self, t: pa.Table) -> pa.Table:
            lg = self.langid(t).column("lang_guess")
            cat = self.lencat(t).column("category")
            ld = lg.combine_chunks().dictionary_encode()
            li = np.asarray(ld.indices).astype(np.int64)
            cat_np = cat.to_numpy(zero_copy_only=False).astype(str)
            ci = np.select([cat_np == "short", cat_np == "medium"],
                           [0, 1], default=2)
            k = max(len(ld.dictionary), 1)
            counts = np.zeros((k, 3), np.int64)
            np.add.at(counts, (li, ci), 1)
            return pa.table({
                "lang_guess": ld.dictionary.cast(pa.string()),
                "n_short": pa.array(counts[:, 0], pa.int64()),
                "n_medium": pa.array(counts[:, 1], pa.int64()),
                "n_long": pa.array(counts[:, 2], pa.int64())})

    parts = ds.select_columns(["doc_id", "text"]).map_batches(
        task_stage(_PivotPartial), batch_format="pyarrow",
        batch_size=4096)
    agg = bucket_reduce(parts, ["lang_guess"],
                        [("n_short", "sum", "n_short"),
                         ("n_medium", "sum", "n_medium"),
                         ("n_long", "sum", "n_long")], 8)

    def add_total(t: pa.Table) -> pa.Table:
        tot = (t.column("n_short").to_numpy()
               + t.column("n_medium").to_numpy()
               + t.column("n_long").to_numpy())
        return t.append_column("n_total", pa.array(tot, pa.int64()))

    return agg.map_batches(add_total, batch_format="pyarrow")


def curated_corpus_write(ds: rd.Dataset, out_dir: str,
                         resume: bool = True) -> rd.Dataset:
    """The END-TO-END curation job: apply the full
    :func:`corpus_curation` filter chain (lang → Gopher → quality),
    exact-dedup the survivors keeping each text's smallest doc_id, and
    WRITE the curated corpus as resumable source-partitioned Parquet
    (:func:`bge_m3_onnx_ray.sinks.write_partitioned`) — then read the
    sink back and return it, so the gated result is what a downstream
    trainer would actually load. Output rows: (doc_id, lang, source,
    n_chars).

    Scale shape: the corpus is read once for flags (tiny rows), once
    more to materialize survivors — both streaming; the survivor-id
    set never sits on the driver (canonical ids come from a 16-byte
    bucket_reduce and reach the doc stream via the bucketed
    semi-join); the write is one directory per source with a manifest,
    so a re-run after a crash skips finished sources at the FILTER
    stage."""
    import os

    from bge_m3_onnx_ray.sinks import write_partitioned
    from bge_m3_onnx_ray.stages._groups import bucket_reduce
    from bge_m3_onnx_ray.stages.relational import semi_anti_join

    flags = ds.select_columns(["doc_id", "text"]).map_batches(
        task_stage(CurationFlags), batch_format="pyarrow",
        batch_size=2048)
    keep = bucket_reduce(
        flags.filter(expr="p3 == 1").select_columns(["h1", "h2",
                                                     "doc_id"]),
        ["h1", "h2"], [("doc_id", "min", "doc_id")]) \
        .select_columns(["doc_id"])
    kept = semi_anti_join(
        ds.select_columns(["doc_id", "lang", "source", "n_chars"]),
        keep, "doc_id", "doc_id")
    write_partitioned(kept, out_dir, "source", resume=resume)

    parts = sorted(d for d in os.listdir(out_dir)
                   if d.startswith("part="))
    # select away the hive "part=" column the reader infers from paths
    return rd.read_parquet([os.path.join(out_dir, d, "data.parquet")
                            for d in parts]) \
        .select_columns(["doc_id", "lang", "source", "n_chars"])


def quality_rank(ds: rd.Dataset, n_buckets: int = 256) -> rd.Dataset:
    """Global curriculum rank: every doc's exact ``row_number() OVER
    (ORDER BY stop_ratio_q6 DESC, doc_id)`` — the ordering a
    curriculum-learning data loader consumes — WITHOUT a global sort.
    Output (doc_id, stop_ratio_q6, rank).

    The TeraSort-rank decomposition: rank = (#docs with a strictly
    higher score) + (position among same-score docs by doc_id) + 1.
    The first term comes from a score HISTOGRAM (bucket_reduce →
    driver prefix-sum over distinct quantized scores — the q6 grid
    bounds distinct values independent of corpus size) broadcast once;
    the second from ONE score-keyed exchange whose kernel sorts each
    score group by doc_id. No stage ever holds the corpus ordered."""
    import ray

    from bge_m3_onnx_ray.hashing import splitmix64
    from bge_m3_onnx_ray.stages._groups import bucket_reduce

    scores = ds.select_columns(["doc_id", "text"]).map_batches(
        task_stage(QualityScore), batch_format="pyarrow",
        batch_size=4096).select_columns(["doc_id", "stop_ratio_q6"]) \
        .materialize()

    hist = bucket_reduce(scores, ["stop_ratio_q6"],
                         [(None, "count", "n")], 32).to_pandas() \
        .sort_values("stop_ratio_q6", ascending=False)
    vals = hist["stop_ratio_q6"].to_numpy().astype(np.int64)
    offs = np.concatenate([[0], hist["n"].to_numpy().cumsum()[:-1]]) \
        .astype(np.int64)
    # vals is DESC; store ascending for searchsorted
    order = np.argsort(vals)
    ref = ray.put((vals[order], offs[order]))

    def add_bucket(t: pa.Table) -> pa.Table:
        s = t.column("stop_ratio_q6").to_numpy().astype(np.uint64)
        return t.append_column("_qb", pa.array(
            (splitmix64(s) % np.uint64(n_buckets)).astype(np.int64)))

    def rank_kernel(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        v_l, o_l = ray.get(ref)
        n = g.num_rows
        if not n:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "stop_ratio_q6": pa.array([], pa.int64()),
                             "rank": pa.array([], pa.int64())})
        order = pc.sort_indices(g, sort_keys=[
            ("stop_ratio_q6", "ascending"), ("doc_id", "ascending")])
        tbl = g.take(order)
        s = tbl.column("stop_ratio_q6").to_numpy()
        starts = np.concatenate([[0], np.flatnonzero(np.diff(s)) + 1])
        run_id = np.zeros(n, np.int64)
        run_id[starts[1:]] = 1
        run_id = np.cumsum(run_id)
        pos_in_run = np.arange(n) - starts[run_id]
        base = o_l[np.searchsorted(v_l, s)]
        return pa.table({
            "doc_id": tbl.column("doc_id"),
            "stop_ratio_q6": tbl.column("stop_ratio_q6"),
            "rank": pa.array(base + pos_in_run + 1, pa.int64())})

    return scores.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("_qb").map_groups(rank_kernel, batch_format="pyarrow")


def sanitize_docs(ds: rd.Dataset, max_chars: int = 100_000) -> rd.Dataset:
    """Input hygiene — the stage a real 100 TB corpus hits FIRST: null
    texts become empty (flagged), C0 control characters (except
    tab/newline/CR) and DEL are stripped, and text is capped at
    ``max_chars`` codepoints. Output (doc_id, text_clean, was_null,
    n_ctrl_removed, was_truncated) — flags kept so the cleaning is
    auditable rather than silent.

    Map-only, all-Arrow: fill_null → one RE2 ``replace_substring_regex``
    → codepoint slice; the DuckDB oracle mirrors with coalesce /
    regexp_replace (RE2 on both sides) / substring, so the gate covers
    the exact byte behavior."""
    import pyarrow.compute as pc

    ctrl = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]"

    def clean(t: pa.Table) -> pa.Table:
        txt = t.column("text")
        was_null = pc.is_null(txt)
        filled = pc.fill_null(txt, "")
        len0 = pc.utf8_length(filled)
        stripped = pc.replace_substring_regex(filled, ctrl, "")
        len1 = pc.utf8_length(stripped)
        clipped = pc.utf8_slice_codeunits(stripped, 0, max_chars)
        return pa.table({
            "doc_id": t.column("doc_id").cast(pa.int64()),
            "text_clean": clipped.cast(pa.string()) if hasattr(
                clipped, "cast") else clipped,
            "was_null": pc.cast(was_null, pa.int64()),
            "n_ctrl_removed": pc.cast(pc.subtract(len0, len1), pa.int64()),
            "was_truncated": pc.cast(
                pc.greater(len1, max_chars), pa.int64())})

    return ds.select_columns(["doc_id", "text"]).map_batches(
        clean, batch_format="pyarrow", batch_size=8192)


# ------------------------------------------------ Poissonized bootstrap

# Poisson(1) CDF as exact uint64 thresholds (floor(cdf_k * 2^64),
# k = 0..12; residual mass ~1e-13 truncated identically on both sides).
# A row's bootstrap multiplicity in replicate b is the number of
# thresholds its splitmix64(doc_id*B + b) draw clears.
_POIS1_T = np.array([
    6786177901268885504, 13572355802537771008, 16965444753172213760,
    18096474403383695360, 18379231815936565248, 18435783298447138816,
    18445208545532233728, 18446555009401532416, 18446723317385195520,
    18446742018272268288, 18446743888360976384, 18446744058369040384,
    18446744072536379392], np.uint64)


def bootstrap_mean_chars(ds: rd.Dataset, n_replicates: int = 200
                         ) -> rd.Dataset:
    """Bootstrap uncertainty for a corpus statistic (mean n_chars),
    done the way 100 TB allows: the classic resample-with-replacement
    is Poissonized (Chamandy et al. 2012, "Estimating uncertainty for
    massive data streams" — each row independently contributes
    Poisson(1) copies to each replicate), so every replicate becomes a
    MAP-SIDE weighted partial sum — no random access, no row ever
    leaves its block; the exchange carries n_replicates tiny rows per
    batch. Multiplicities are DETERMINISTIC integers (splitmix64 draw
    vs exact uint64 CDF thresholds), so the DuckDB oracle reproduces
    every replicate bit-for-bit. Output (replicate, n_eff, sum_chars,
    mean_q6) — the driver of a real pipeline takes percentiles of
    mean_q6 for the CI."""
    from bge_m3_onnx_ray.hashing import splitmix64
    from bge_m3_onnx_ray.stages._groups import bucket_reduce

    B = int(n_replicates)

    def partial(t: pa.Table) -> pa.Table:
        doc = t.column("doc_id").to_numpy().astype(np.uint64)
        v = t.column("n_chars").to_numpy().astype(np.int64)
        reps = np.arange(B, dtype=np.uint64)
        h = splitmix64((doc[:, None] * np.uint64(B)
                        + reps[None, :]).ravel())
        w = np.searchsorted(_POIS1_T, h, side="right") \
            .reshape(len(doc), B).astype(np.int64)
        return pa.table({
            "replicate": pa.array(np.arange(B, dtype=np.int64)),
            "n_eff": pa.array(w.sum(axis=0)),
            "sum_chars": pa.array((w * v[:, None]).sum(axis=0))})

    agg = bucket_reduce(
        ds.select_columns(["doc_id", "n_chars"]).map_batches(
            partial, batch_format="pyarrow", batch_size=4096),
        ["replicate"], [("n_eff", "sum", "n_eff"),
                        ("sum_chars", "sum", "sum_chars")], 16)

    def finalize(t: pa.Table) -> pa.Table:
        n = t.column("n_eff").to_numpy()
        s = t.column("sum_chars").to_numpy()
        mean = np.where(n > 0, (s * 1_000_000) // np.maximum(n, 1), -1)
        return t.append_column("mean_q6", pa.array(mean, pa.int64()))

    return agg.map_batches(finalize, batch_format="pyarrow")


def chars_words_correlation(ds: rd.Dataset) -> pa.Table:
    """Corpus-level Pearson correlation between document length in
    characters and in tokens — the sanity statistic a data audit
    reports (r far from ~1 flags a tokenizer or encoding problem).
    Output one row (n_docs, r_q6), integer-exact: all five moments
    (n, Σx, Σy, Σx², Σy², Σxy) are int64 sums, and
    r = (n·Σxy − Σx·Σy) / (sqrt(n·Σx² − (Σx)²) · sqrt(n·Σy² − (Σy)²))
    is one IEEE expression evaluated identically by numpy and SQL
    before the q6 floor. Degenerate variance → r_q6 = 0.

    Scale shape: per-batch moment partials (6 ints), one tiny
    tree-reduce — no shuffle. Moment magnitudes: n·Σxy needs
    n·x·y·n < 2^63 — holds to ~10^9 docs at 10^5-char documents;
    beyond, split lanes."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        x = t.column("n_chars").to_numpy().astype(np.int64)
        _, _, _, _, dls = DeterministicTokenizer() \
            .batch_term_counts_coded(t.column("text"))
        y = dls.astype(np.int64)
        return pa.table({
            "n": pa.array([len(x)], pa.int64()),
            "sx": pa.array([int(x.sum())], pa.int64()),
            "sy": pa.array([int(y.sum())], pa.int64()),
            "sxx": pa.array([int((x * x).sum())], pa.int64()),
            "syy": pa.array([int((y * y).sum())], pa.int64()),
            "sxy": pa.array([int((x * y).sum())], pa.int64())})

    agg = ds.select_columns(["n_chars", "text"]).map_batches(
        partial, batch_format="pyarrow", batch_size=8192).aggregate(
        Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
        Sum("sy", alias_name="sy"), Sum("sxx", alias_name="sxx"),
        Sum("syy", alias_name="syy"), Sum("sxy", alias_name="sxy"))
    n, sx, sy = int(agg["n"]), int(agg["sx"]), int(agg["sy"])
    sxx, syy, sxy = int(agg["sxx"]), int(agg["syy"]), int(agg["sxy"])
    vx, vy = n * sxx - sx * sx, n * syy - sy * sy
    if vx > 0 and vy > 0:
        r = (n * sxy - sx * sy) / (np.sqrt(float(vx)) * np.sqrt(float(vy)))
        r_q6 = int(np.floor(r * 1e6))
    else:
        r_q6 = 0
    return pa.table({"n_docs": pa.array([n], pa.int64()),
                     "r_q6": pa.array([r_q6], pa.int64())})


class _LexicalDiversity:
    """Per-batch TTR/hapax kernel: distinct-type and hapax counts from
    the tokenizer's coded per-(doc, term) rows — one np.unique, no
    per-doc loop."""

    def __init__(self):
        self.tok = DeterministicTokenizer()

    def __call__(self, t: pa.Table) -> pa.Table:
        doc_idx, codes, _, tfs, doc_lens = \
            self.tok.batch_term_counts_coded(t.column("text"))
        n = t.num_rows
        types = np.zeros(n, np.int64)
        hapax = np.zeros(n, np.int64)
        if len(codes):
            np.add.at(types, doc_idx, 1)
            np.add.at(hapax, doc_idx, (tfs == 1).astype(np.int64))
        toks = doc_lens.astype(np.int64)
        den = np.maximum(toks, 1)
        return pa.table({
            "doc_id": t.column("doc_id").cast(pa.int64()),
            "n_tokens": pa.array(toks, pa.int64()),
            "n_types": pa.array(types, pa.int64()),
            "ttr_q6": pa.array(types * 1_000_000 // den, pa.int64()),
            "hapax_q6": pa.array(hapax * 1_000_000 // den, pa.int64())})


def lexical_diversity(ds: rd.Dataset) -> rd.Dataset:
    """Per-doc lexical-diversity quality signals: type-token ratio and
    hapax (once-only term) fraction — low TTR flags the repetitive
    template/spam tail that Gopher-style filters target, high hapax
    the OOV-garbage tail. Map-only; ratios are exact integer floor
    divisions on the 1e-6 grid (q6), token counts from the shared
    tokenizer so the SQL mirror is term-identical."""
    return ds.select_columns(["doc_id", "text"]).map_batches(
        task_stage(_LexicalDiversity), batch_format="pyarrow",
        batch_size=4096)


def source_dup_rate(ds: rd.Dataset) -> rd.Dataset:
    """Per-source WITHIN-source exact-duplicate rate — the curation
    dashboard's "which feed is spamming us" metric. Output (source,
    n_docs, n_distinct, dup_rate_q6) with dup_rate = 1 − distinct/docs
    on the exact integer grid.

    Scale shape: the exchange is the exact-dedup one — 16-byte content
    hash + source per row, counts pre-reduced per (source, hash)
    bucket; the per-source rollup is a second tiny reduce over
    source-keyed rows."""
    from bge_m3_onnx_ray.stages._groups import bucket_reduce

    def add_key(t: pa.Table) -> pa.Table:
        from bge_m3_onnx_ray.hashing import P53, poly_hash
        h1 = poly_hash(t.column("text"), P53)
        h2 = poly_hash(t.column("text"), P53, base=np.uint64(257))
        return pa.table({"source": t.column("source").cast(pa.string()),
                         "h1": pa.array(h1.astype(np.int64)),
                         "h2": pa.array(h2.astype(np.int64))})

    groups = bucket_reduce(
        ds.select_columns(["source", "text"]).map_batches(
            add_key, batch_format="pyarrow", batch_size=4096),
        ["source", "h1", "h2"], [(None, "count", "n")])

    def per_source(t: pa.Table) -> pa.Table:
        src = t.column("source").combine_chunks().dictionary_encode()
        codes = np.asarray(src.indices).astype(np.int64)
        n = t.column("n").to_numpy()
        k = max(len(src.dictionary), 1)
        docs = np.zeros(k, np.int64)
        np.add.at(docs, codes, n)
        dist = np.bincount(codes, minlength=k).astype(np.int64)
        return pa.table({"source": src.dictionary.cast(pa.string()),
                         "n_docs": pa.array(docs, pa.int64()),
                         "n_distinct": pa.array(dist, pa.int64())})

    agg = bucket_reduce(
        groups.map_batches(per_source, batch_format="pyarrow"),
        ["source"], [("n_docs", "sum", "n_docs"),
                     ("n_distinct", "sum", "n_distinct")], 8)

    def finalize(t: pa.Table) -> pa.Table:
        d = t.column("n_docs").to_numpy()
        u = t.column("n_distinct").to_numpy()
        rate = (d - u) * 1_000_000 // np.maximum(d, 1)
        return t.append_column("dup_rate_q6", pa.array(rate, pa.int64()))

    return agg.map_batches(finalize, batch_format="pyarrow")
