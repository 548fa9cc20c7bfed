"""Search-box suggestions over the dictionary artifact: prefix
completion (the Elasticsearch completion-suggester shape) and
"did you mean" spell correction (the term-suggester shape).

Both rank candidates by document frequency — the standard popularity
prior — with the deterministic (df desc, term asc) tie-break, and both
run off the bucketed dictionary exactly like the wildcard/fuzzy query
expansions (``IndexMeta.expand_prefix`` / ``expand_fuzzy``), so no new
artifact is needed: the dictionary IS the suggestion index. At
10^12-doc scale suggestion serving would hold the dictionary tier in
the ``_DictDfLookup`` bucket actors; here the per-call predicate-
pushdown scan is the honest small-corpus path.
"""

from __future__ import annotations

import pyarrow as pa

from bge_m3_onnx_ray.index.artifacts import IndexMeta

SUGGEST_SCHEMA = pa.schema([
    ("input_id", pa.int64()),
    ("term_rank", pa.int32()),
    ("term", pa.string()),
    ("df", pa.int64()),
])


def _rank(meta: IndexMeta, inputs: list[tuple[int, list[str]]],
          k: int) -> pa.Table:
    """Shared ranking: per input, its candidate terms ordered by
    (df desc, term asc), cut at ``k``."""
    all_terms = sorted({t for _, cands in inputs for t in cands})
    dfs = meta.load_term_dfs(all_terms) if all_terms else {}
    iid, rnk, terms, out_df = [], [], [], []
    for i, cands in inputs:
        scored = sorted(((-(dfs.get(t, 0)), t) for t in cands
                        if t in dfs))[:k]
        for r, (negdf, t) in enumerate(scored, 1):
            iid.append(int(i))
            rnk.append(r)
            terms.append(t)
            out_df.append(-negdf)
    return pa.table({"input_id": pa.array(iid, pa.int64()),
                     "term_rank": pa.array(rnk, pa.int32()),
                     "term": pa.array(terms, pa.string()),
                     "df": pa.array(out_df, pa.int64())},
                    schema=SUGGEST_SCHEMA)


def suggest_completions(index_dir: str, prefixes: list[tuple[int, str]],
                        k: int = 5) -> pa.Table:
    """Top-``k`` dictionary completions per prefix, ranked (df desc,
    term asc). An unmatched prefix yields no rows. Output
    (input_id, term_rank, term, df)."""
    meta = IndexMeta(index_dir)
    inputs = [(i, meta.expand_prefix(p)) for i, p in prefixes]
    return _rank(meta, inputs, k)


def suggest_corrections(index_dir: str, words: list[tuple[int, str]],
                        k: int = 3) -> pa.Table:
    """"Did you mean": top-``k`` dictionary terms within Levenshtein
    distance 1 of each word, ranked (df desc, term asc) — an
    in-vocabulary word suggests itself first when it is the most
    frequent candidate. No-neighbour words yield no rows. Output
    (input_id, term_rank, term, df)."""
    meta = IndexMeta(index_dir)
    inputs = [(i, meta.expand_fuzzy(w)) for i, w in words]
    return _rank(meta, inputs, k)
