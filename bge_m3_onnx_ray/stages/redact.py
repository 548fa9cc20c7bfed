"""PII redaction: scrub emails / IPv4s / phone-like numbers from a text
column and count what was removed.

A standard pre-training compliance pass over web-scale corpora (the C4 /
Dolma pipelines both document regex PII scrubbing — public reports).
The reference repo has no such operator; this is part of the
training-data operator set the engine brief adds.

Shape: a pure ``map_batches`` — no shuffle, no state beyond the pattern
constants, so it composes into any pipeline position for free. All
kernels are columnar (``pyarrow.compute`` replace/count with RE2
regexes); the same patterns run verbatim in the DuckDB oracle
(``regexp_replace(..., 'g')`` / ``regexp_extract_all`` — DuckDB is RE2
too, so the dialects agree by construction).
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

# RE2-compatible patterns, shared verbatim with the SQL oracle. Order
# matters and is fixed: emails first (an email's host part would
# otherwise be mangled by no other rule, but an IP-in-email should count
# once, as an email), then phones, then bare IPv4s.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[0-9a-z._%+-]+@[0-9a-z.-]+\.[a-z]{2,}", "<EMAIL>"),
    ("phone", r"\+[0-9][0-9 -]{5,14}[0-9]", "<PHONE>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
)


def _redact_batch(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc
    text = batch.column("text")
    cols: dict = {"doc_id": batch.column("doc_id")}
    counts = {}
    for name, pat, repl in PII_PATTERNS:
        counts[f"n_{name}"] = pc.count_substring_regex(text, pat)
        text = pc.replace_substring_regex(text, pat, repl)
    cols["text"] = text
    for k, v in counts.items():
        cols[k] = v.cast(pa.int64())
    return pa.table(cols)


def redact_pii(ds: rd.Dataset) -> rd.Dataset:
    """Redact PII from ``text``; output (doc_id, text, n_email, n_phone,
    n_ipv4) with the text rewritten (``<EMAIL>``/``<PHONE>``/``<IP>``
    placeholders) and per-pattern match counts. Patterns are applied in
    the fixed :data:`PII_PATTERNS` order on both the engine and the
    oracle side, so a span matched by an earlier rule is never
    re-counted by a later one."""
    return ds.select_columns(["doc_id", "text"]).map_batches(
        _redact_batch, batch_format="pyarrow")
