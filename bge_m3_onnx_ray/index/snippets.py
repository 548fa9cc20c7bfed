"""Snippet / highlight generation for top-k results.

The reference's demo surfaces the top sparse tokens of a result for
human inspection (``samples/dotnet/.../Program.cs:54-60`` sorts the
sparse dict and prints the top 5); a fulltext engine's equivalent is a
SNIPPET: the token window around the first query-term hit, plus hit
accounting. Deterministic token-level contract (mirrors exactly in
SQL): tokens are the engine tokenizer's output, ``first_hit`` is the
0-based position of the earliest query-term occurrence, ``n_hits`` the
number of token positions matching any query term, ``snippet`` the
space-joined tokens ``[max(0, first_hit - window), first_hit + window]``.

Scale shape: the corpus side is the big side — it streams through ONE
``map_batches`` scan that filters to the top-k result keys (vectorized
``is_in`` on conv_id, exact (conv_id, turn_idx) pair check per batch)
and tokenizes only the matched rows; the result side is k × queries
rows (driver-resident by construction, the same size class as the
top-k merge output).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

DEFAULT_WINDOW = 8


def _scan_matched_tokens(corpus, keys: set[tuple[str, int]],
                         tokenizer_spec: str) -> dict[tuple[str, int], list[str]]:
    """One streaming pass over the corpus: keep only rows whose
    (conv_id, turn_idx) is in ``keys``, tokenize them (vectorized), and
    return {key: tokens}. The filter prunes with a vectorized conv_id
    ``is_in`` before the exact pair check."""
    conv_set = pa.array(sorted({c for c, _ in keys}), pa.large_string())
    keyset = keys

    def scan(batch: pa.Table) -> pa.Table:
        m = pc.is_in(batch.column("conv_id").cast(pa.large_string()),
                     value_set=conv_set)
        t = batch.filter(m)
        if not t.num_rows:
            return pa.table({"conv_id": pa.array([], pa.string()),
                             "turn_idx": pa.array([], pa.int32()),
                             "tokens": pa.array([], pa.list_(pa.string()))})
        convs = t.column("conv_id").to_pylist()
        turns = t.column("turn_idx").to_pylist()
        keep = np.fromiter(((c, int(x)) in keyset
                            for c, x in zip(convs, turns)), bool, len(convs))
        t = t.filter(pa.array(keep))
        if not t.num_rows:
            return pa.table({"conv_id": pa.array([], pa.string()),
                             "turn_idx": pa.array([], pa.int32()),
                             "tokens": pa.array([], pa.list_(pa.string()))})
        from bge_m3_onnx_ray.tokenizer import make_tokenizer
        tok = make_tokenizer(tokenizer_spec)
        flat, offs = tok.batch_token_lists(t.column("text").combine_chunks())
        toks = pa.ListArray.from_arrays(
            pa.array(np.asarray(offs, np.int32)), flat.cast(pa.string()))
        return pa.table({"conv_id": t.column("conv_id").cast(pa.string()),
                         "turn_idx": t.column("turn_idx").cast(pa.int32()),
                         "tokens": toks})

    if isinstance(corpus, str):
        ds = rd.read_parquet(corpus, columns=["conv_id", "turn_idx", "text"])
    else:
        ds = corpus.select_columns(["conv_id", "turn_idx", "text"])
    out: dict[tuple[str, int], list[str]] = {}
    for row in ds.map_batches(scan, batch_format="pyarrow").take_all():
        out[(row["conv_id"], int(row["turn_idx"]))] = list(row["tokens"])
    return out


def attach_snippets(results: pa.Table, corpus,
                    query_terms: dict[int, list[str]],
                    window: int = DEFAULT_WINDOW,
                    tokenizer_spec: str = "deterministic") -> pa.Table:
    """Append (first_hit, n_hits, snippet) columns to a top-k result
    table carrying (query_id, conv_id, turn_idx). ``query_terms`` maps
    query_id → tokenized query terms. Every BM25 result row contains at
    least one query term by construction, so first_hit always exists."""
    qs = results.column("query_id").to_pylist()
    convs = results.column("conv_id").to_pylist()
    turns = results.column("turn_idx").to_pylist()
    keys = {(c, int(t)) for c, t in zip(convs, turns)}
    toks_by_key = _scan_matched_tokens(corpus, keys, tokenizer_spec)
    first_hit, n_hits, snippets = [], [], []
    for q, c, t in zip(qs, convs, turns):
        toks = toks_by_key[(c, int(t))]
        terms = set(query_terms[int(q)])
        hits = [i for i, w in enumerate(toks) if w in terms]
        f = hits[0]
        first_hit.append(f)
        n_hits.append(len(hits))
        snippets.append(" ".join(toks[max(0, f - window):f + window + 1]))
    return results \
        .append_column("first_hit", pa.array(first_hit, pa.int64())) \
        .append_column("n_hits", pa.array(n_hits, pa.int64())) \
        .append_column("snippet", pa.array(snippets, pa.string()))
