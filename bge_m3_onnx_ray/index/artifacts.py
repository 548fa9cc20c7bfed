"""On-disk index layout, manifests, and the shard reader.

Layout of ``index_dir``::

    stats.json                    {n_docs, total_len, avgdl, n_shards, config...}
    manifest.json                 per-shard lineage + metrics (resume gate)
    conv_offsets.parquet          conv_id (sorted), start_doc_id, n_turns
    doc_lens/shard-SSSSS.parquet  doc_id, dl            (one per shard)
    postings/shard-SSSSS-bucket-BB.parquet   per-term encoded postings
    dict_partials/shard-SSSSS-bucket-BB.parquet  term, df, cf  (per group)
    dictionary/*.parquet          term, df, cf (globally aggregated)

Resumability contract (north rule): every per-shard artifact is written
to a temp path and ``os.replace``d (atomic on POSIX), and ``manifest.json``
records, per shard, the input fingerprint, doc count, total length and
postings bytes. A re-run skips shards whose manifest entry is complete;
an interrupted shard is simply rewritten (same deterministic bytes).
"""

from __future__ import annotations

import json
import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

POSTINGS_SCHEMA = pa.schema([
    ("term", pa.string()),
    ("df", pa.int64()),
    ("cf", pa.int64()),
    ("n_blocks", pa.int32()),
    ("last_ids", pa.list_(pa.int64())),
    ("max_tf", pa.list_(pa.int32())),
    ("min_dl", pa.list_(pa.int32())),
    ("offs", pa.list_(pa.int32())),
    ("blob", pa.binary()),
])


def atomic_write_parquet(table: pa.Table, path: str) -> int:
    """Deterministic, atomic parquet write; returns file size in bytes."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.tmp-{uuid.uuid4().hex}"
    pq.write_table(table, tmp, compression="zstd", write_statistics=True)
    os.replace(tmp, path)
    return os.path.getsize(path)


def atomic_write_json(obj, path: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


def postings_file(index_dir: str, shard: int, bucket: int) -> str:
    return os.path.join(index_dir, "postings", f"shard-{shard:05d}-bucket-{bucket:02d}.parquet")


def dict_partial_file(index_dir: str, shard: int, bucket: int) -> str:
    return os.path.join(index_dir, "dict_partials", f"shard-{shard:05d}-bucket-{bucket:02d}.parquet")


def doc_lens_file(index_dir: str, shard: int) -> str:
    return os.path.join(index_dir, "doc_lens", f"shard-{shard:05d}.parquet")


class ConvOffsets:
    """docID assignment: docID = start(conv_id) + turn_idx, where ``start``
    is the prefix sum of per-conversation turn counts in lexicographic
    conv_id order. This makes docIDs a pure function of the data — stable
    under any partitioning / execution order (SURVEY.md §4.2 "ordering").

    Requires dense 0-based ``turn_idx`` per conversation (validated at
    build time); non-dense conversations get an explicit rank map.
    """

    def __init__(self, conv_ids, starts: np.ndarray, counts: np.ndarray,
                 nondense: dict[str, dict[int, int]] | None = None):
        # conv_ids: sorted; pa.Array (fast pickle, C++ lookups) or numpy
        # object array (accepted for convenience, converted once)
        if isinstance(conv_ids, (pa.Array, pa.ChunkedArray)):
            self._conv_arrow = (conv_ids.combine_chunks()
                                if isinstance(conv_ids, pa.ChunkedArray)
                                else conv_ids).cast(pa.large_string())
        else:
            self._conv_arrow = pa.array(conv_ids, pa.large_string())
        self._conv_np = None           # lazy numpy view for searchsorted
        self.starts = np.asarray(starts, np.int64)
        self.counts = np.asarray(counts, np.int64)
        self.nondense = nondense or {}
        self.n_docs = int(starts[-1] + counts[-1]) if len(starts) else 0

    @property
    def conv_ids(self) -> np.ndarray:
        if self._conv_np is None:
            self._conv_np = np.asarray(self._conv_arrow.to_pylist(), dtype=object)
        return self._conv_np

    def lookup(self, conv_id) -> int:
        i = np.searchsorted(self.conv_ids, conv_id)
        return int(self.starts[i])

    def _lex_sorted(self) -> bool:
        """Lazily cached: are conv_ids lexicographically sorted? True for
        a fresh build (docIDs assigned in conv order); False after
        ``append_index`` (rows ordered by start_doc_id instead)."""
        got = getattr(self, "_is_lex_sorted", None)
        if got is None:
            import pyarrow.compute as pc
            a = self._conv_arrow
            got = bool(len(a) < 2 or pc.all(pc.greater_equal(
                a.slice(1), a.slice(0, len(a) - 1))).as_py())
            self._is_lex_sorted = got
        return got

    def _hash_index(self):
        """Lazy per-process lookup state: sorted P53 polynomial hashes of
        the conv ids + the permutation back to table order, IF the hashes
        are collision-free over this table (checked once; ~1e-3 odds of a
        collision at 4M convs, in which case we fall back to
        ``pc.index_in``). Hashed searchsorted is ~7x faster per batch than
        index_in, which rebuilds its value-set hash table on every call.
        A lookup hit implies string equality for any conv drawn from the
        corpus the table was built on; a conv NOT in the table could
        false-hit only via a fresh hash collision (~1e-10/row) — the
        KeyError guard below is best-effort under hashing, exact under
        the fallback."""
        if getattr(self, "_hidx", None) is None:
            from bge_m3_onnx_ray.hashing import P53, poly_hash
            h = poly_hash(self._conv_arrow, P53)
            order = np.argsort(h, kind="stable")
            hs = h[order]
            if len(hs) > 1 and (hs[1:] == hs[:-1]).any():
                self._hidx = False          # collision: use index_in
            else:
                self._hidx = (hs, order)
        return self._hidx

    def doc_ids_for(self, conv_arr, turn_arr: np.ndarray) -> np.ndarray:
        """``conv_arr``: numpy object array OR pyarrow (Chunked)Array —
        the arrow path avoids per-row Python string comparisons."""
        import pyarrow.compute as pc
        if isinstance(conv_arr, (pa.Array, pa.ChunkedArray)):
            hidx = self._hash_index()
            if hidx:
                from bge_m3_onnx_ray.hashing import P53, poly_hash
                hs, order = hidx
                hb = poly_hash(conv_arr, P53)
                pos = np.searchsorted(hs, hb)
                ok = pos < len(hs)
                ok[ok] = hs[pos[ok]] == hb[ok]
                if not ok.all():
                    missing = conv_arr.filter(pa.array(~ok))
                    raise KeyError(
                        f"conv_ids absent from the offsets table (stale "
                        f"resume state or changed input): "
                        f"{missing.to_pylist()[:5]!r}")
                idx = order[pos]
                # spot-check a bounded sample of hash hits by STRING
                # equality: a conv_id NOT in the table could false-hit
                # only via a fresh P53 collision (~1e-10/row); this turns
                # that silent wrong-range resolution (the stale-resume
                # threat) into the same KeyError the exact path raises,
                # at O(16) string compares per batch
                n = len(idx)
                if n:
                    sample = np.unique(np.linspace(0, n - 1,
                                                   min(16, n)).astype(np.int64))
                    got = self._conv_arrow.take(pa.array(idx[sample]))
                    want = (conv_arr.combine_chunks()
                            if isinstance(conv_arr, pa.ChunkedArray)
                            else conv_arr).take(pa.array(sample))
                    if not pc.all(pc.equal(
                            got, want.cast(pa.large_string()))).as_py():
                        raise KeyError(
                            "conv_id hash collision detected against the "
                            "offsets table (stale resume state or changed "
                            "input)")
            else:
                raw = pc.index_in(conv_arr.cast(pa.large_string()),
                                  value_set=self._conv_arrow)
                if raw.null_count:
                    missing = conv_arr.filter(pc.is_null(raw))
                    raise KeyError(
                        f"conv_ids absent from the offsets table (stale "
                        f"resume state or changed input): "
                        f"{missing.to_pylist()[:5]!r}")
                idx = raw.to_numpy(zero_copy_only=False).astype(np.int64)
        elif not self._lex_sorted():
            # appended indexes store rows in docID-start order, which is
            # NOT conv-lexicographic — route plain-array input through the
            # order-independent arrow path
            return self.doc_ids_for(pa.array(list(conv_arr), pa.large_string()),
                                    turn_arr)
        else:
            idx = np.searchsorted(self.conv_ids, conv_arr)
            bad = (idx >= len(self.starts)) | (self.conv_ids[np.minimum(
                idx, len(self.starts) - 1)] != conv_arr)
            if bad.any():
                raise KeyError(
                    f"conv_ids absent from the offsets table: "
                    f"{np.asarray(conv_arr)[bad][:5]!r}")
        base = self.starts[idx]
        turn_np = np.asarray(turn_arr, np.int64)
        if self.nondense:
            out = base + turn_np
            conv_py = (conv_arr.to_pylist()
                       if isinstance(conv_arr, (pa.Array, pa.ChunkedArray))
                       else conv_arr)
            for j, c in enumerate(conv_py):
                m = self.nondense.get(c)
                if m is not None:
                    out[j] = base[j] + m[int(turn_np[j])]
            return out
        return base + turn_np

    def doc_to_conv(self, doc_ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Map docIDs back to (conv_id, turn_idx); dense convs only for the
        reverse of nondense maps (rare path handled by linear scan)."""
        i = np.searchsorted(self.starts, doc_ids, side="right") - 1
        conv = self.conv_ids[i]
        turn = (doc_ids - self.starts[i]).astype(np.int32)
        if self.nondense:
            for j, c in enumerate(conv):
                m = self.nondense.get(c)
                if m is not None:
                    inv = {v: k for k, v in m.items()}
                    turn[j] = inv[int(turn[j])]
        return conv, turn

    def __getstate__(self):
        return {"conv": self._conv_arrow, "starts": self.starts,
                "counts": self.counts, "nondense": self.nondense}

    def __setstate__(self, st):
        self.__init__(st["conv"], st["starts"], st["counts"], st["nondense"])

    def save(self, index_dir: str) -> None:
        t = pa.table({
            "conv_id": self._conv_arrow.cast(pa.string()),
            "start_doc_id": pa.array(self.starts, pa.int64()),
            "n_turns": pa.array(self.counts, pa.int64()),
        })
        atomic_write_parquet(t, os.path.join(index_dir, "conv_offsets.parquet"))
        if self.nondense:
            atomic_write_json(
                {c: {str(k): v for k, v in m.items()} for c, m in self.nondense.items()},
                os.path.join(index_dir, "nondense_turns.json"))

    @classmethod
    def load(cls, index_dir: str) -> "ConvOffsets":
        t = pq.read_table(os.path.join(index_dir, "conv_offsets.parquet"))
        nondense = {}
        p = os.path.join(index_dir, "nondense_turns.json")
        if os.path.exists(p):
            with open(p) as f:
                nondense = {c: {int(k): v for k, v in m.items()}
                            for c, m in json.load(f).items()}
        return cls(t.column("conv_id").combine_chunks(),
                   t.column("start_doc_id").to_numpy(),
                   t.column("n_turns").to_numpy(), nondense)


def _within_one_edit(a: str, b: str) -> bool:
    """Character-level Levenshtein(a, b) <= 1 without the full DP: equal
    lengths need at most one substitution; off-by-one lengths need the
    longer string minus one character to equal the shorter."""
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        seen = False
        for x, y in zip(a, b):
            if x != y:
                if seen:
                    return False
                seen = True
        return True
    if la > lb:
        a, b, la = b, a, lb
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1:]


class IndexMeta:
    """Loaded stats + manifest; the query-side handle on an index."""

    def __init__(self, index_dir: str):
        self.index_dir = index_dir
        with open(os.path.join(index_dir, "stats.json")) as f:
            self.stats = json.load(f)
        with open(os.path.join(index_dir, "manifest.json")) as f:
            self.manifest = json.load(f)
        self.n_docs = self.stats["n_docs"]
        self.total_len = self.stats["total_len"]
        self.avgdl = self.stats["avgdl"]
        self.k1 = self.stats["k1"]
        self.b = self.stats["b"]
        self.block_size = self.stats["block_size"]
        self.term_buckets = self.stats["term_buckets"]
        self.docs_per_shard = self.stats["docs_per_shard"]
        self.shards = sorted(int(s) for s in self.manifest["shards"])

    def expand_prefix(self, prefix: str, limit: int = 10_000) -> list[str]:
        """Every dictionary term starting with ``prefix`` (wildcard-query
        expansion): a range-pruned predicate-pushdown scan of the
        bucketed dictionary + an exact startswith filter — never a full
        dictionary read. Raises when the expansion exceeds ``limit``
        (silent truncation would diverge from user intent)."""
        import pyarrow.compute as pc
        import pyarrow.dataset as pads
        d = os.path.join(self.index_dir, "dictionary")
        if not prefix or not os.path.isdir(d) or not os.listdir(d):
            return []
        dset = pads.dataset(d, format="parquet")
        t = dset.to_table(
            filter=(pc.field("term") >= prefix)
            & (pc.field("term") < prefix + "￿"), columns=["term"])
        arr = t.column("term")
        arr = arr.filter(pc.starts_with(arr, prefix))
        terms = sorted(set(arr.to_pylist()))
        if len(terms) > limit:
            raise ValueError(
                f"prefix {prefix!r}* expands to {len(terms)} terms "
                f"(> max_prefix_expansion={limit}); narrow the prefix")
        return terms

    def expand_wildcard(self, pattern: str, limit: int = 10_000) -> list[str]:
        """Every dictionary term matching a ``*``-wildcard pattern with
        stars ANYWHERE (Lucene WildcardQuery / SQL ``LIKE`` with ``%``):
        ``mid*``, ``*fix``, ``*mid*``, ``a*b``. A literal head before the
        first star range-prunes the bucketed dictionary scan exactly like
        :meth:`expand_prefix`; the exact match is one anchored RE2 regex
        over the pruned term column (``pyarrow.compute`` — no Python
        loop). A leading-star pattern cannot range-prune and costs one
        columnar dictionary scan; Lucene documents the same caveat for
        leading wildcards. Raises past ``limit`` (silent truncation would
        diverge from user intent and from the SQL oracle)."""
        import re

        import pyarrow.compute as pc
        import pyarrow.dataset as pads
        if "*" not in pattern:
            raise ValueError(f"wildcard pattern {pattern!r} has no '*'")
        d = os.path.join(self.index_dir, "dictionary")
        if not os.path.isdir(d) or not os.listdir(d):
            return []
        pieces = pattern.split("*")
        rx = "^" + ".*".join(re.escape(p) for p in pieces) + "$"
        dset = pads.dataset(d, format="parquet")
        head = pieces[0]
        filt = ((pc.field("term") >= head) & (pc.field("term") < head + "￿")
                if head else None)
        t = dset.to_table(filter=filt, columns=["term"])
        arr = t.column("term").combine_chunks()
        terms = sorted(set(arr.filter(
            pc.match_substring_regex(arr, rx)).to_pylist()))
        if len(terms) > limit:
            raise ValueError(
                f"wildcard {pattern!r} expands to {len(terms)} terms "
                f"(> max_prefix_expansion={limit}); narrow the pattern")
        return terms

    def expand_regex(self, pattern: str, limit: int = 10_000) -> list[str]:
        """Every dictionary term FULLY matching an RE2 regex (Lucene
        RegexpQuery semantics — the pattern is anchored to the whole
        term). One columnar scan of the bucketed dictionary with
        ``pyarrow.compute.match_substring_regex`` on ``^(?:pat)$``; RE2
        on both sides of the gate (Arrow here, DuckDB's
        ``regexp_full_match`` in the oracle) so the dialects agree.
        Terms are stored NORMALIZED (tokenizer output), so patterns
        should be written in lowercase. Raises past ``limit``."""
        import re

        import pyarrow.compute as pc
        import pyarrow.dataset as pads
        try:
            re.compile(pattern)
        except re.error as e:
            raise ValueError(f"bad regex {pattern!r}: {e}") from e
        d = os.path.join(self.index_dir, "dictionary")
        if not pattern or not os.path.isdir(d) or not os.listdir(d):
            return []
        dset = pads.dataset(d, format="parquet")
        t = dset.to_table(columns=["term"])
        arr = t.column("term").combine_chunks()
        terms = sorted(set(arr.filter(
            pc.match_substring_regex(arr, f"^(?:{pattern})$")).to_pylist()))
        if len(terms) > limit:
            raise ValueError(
                f"regex /{pattern}/ expands to {len(terms)} terms "
                f"(> max_prefix_expansion={limit}); narrow the pattern")
        return terms

    def expand_fuzzy(self, term: str, limit: int = 10_000) -> list[str]:
        """Every dictionary term within Levenshtein distance 1 of
        ``term`` (fuzzy-query expansion; includes the term itself when
        indexed). The scan is length-banded (an edit-distance-1 match
        differs in length by at most one, pushed down as a
        ``utf8_length`` filter), then confirmed with the exact
        character-level one-edit check — character-level so multibyte
        (non-ASCII) terms count edits like DuckDB's ``levenshtein``
        does, not like a byte comparison would.

        Scale note: unlike prefix expansion this cannot range-prune on
        the sorted term column (a substitution at position 0 lands
        anywhere in the dictionary), so the cost is one columnar scan of
        the length band per unique query token — fine for the 1e6–1e7
        vocabularies real corpora have. A 1e8+-term dictionary would
        want a precomputed deletion-neighborhood (SymSpell) side table;
        not built here.
        """
        import pyarrow.compute as pc
        import pyarrow.dataset as pads
        d = os.path.join(self.index_dir, "dictionary")
        if not term or not os.path.isdir(d) or not os.listdir(d):
            return []
        dset = pads.dataset(d, format="parquet")
        n = len(term)
        t = dset.to_table(
            filter=(pc.utf8_length(pc.field("term")) >= n - 1)
            & (pc.utf8_length(pc.field("term")) <= n + 1),
            columns=["term"])
        out = sorted({c for c in set(t.column("term").to_pylist())
                      if _within_one_edit(term, c)})
        if len(out) > limit:
            raise ValueError(
                f"fuzzy term {term!r} expands to {len(out)} terms "
                f"(> max_fuzzy_expansion={limit}); raise the cap or use "
                "an exact query")
        return out

    def load_term_dfs(self, terms: list[str]) -> dict[str, int]:
        """Global df for a small set of query terms — predicate-pushdown
        scan of the dictionary (no broadcast of the full dictionary)."""
        import pyarrow.compute as pc
        import pyarrow.dataset as pads
        d = os.path.join(self.index_dir, "dictionary")
        # empty-corpus index: merge_bucket writes no files and the directory
        # may not exist — an empty result, not a FileNotFoundError
        if not os.path.isdir(d) or not os.listdir(d):
            return {}
        dset = pads.dataset(d, format="parquet")
        t = dset.to_table(filter=pc.field("term").isin(terms), columns=["term", "df"])
        return dict(zip(t.column("term").to_pylist(), t.column("df").to_pylist()))

    def load_term_cfs(self, terms: list[str]) -> dict[str, int]:
        """Global collection frequency (total occurrences, not doc count)
        for a small set of query terms — same predicate-pushdown scan as
        :meth:`load_term_dfs` over the dictionary's ``cf`` column. Used
        by the LM-Dirichlet similarity, whose smoothing mass is
        ``mu * cf / total_len``."""
        import pyarrow.compute as pc
        import pyarrow.dataset as pads
        d = os.path.join(self.index_dir, "dictionary")
        if not os.path.isdir(d) or not os.listdir(d):
            return {}
        dset = pads.dataset(d, format="parquet")
        t = dset.to_table(filter=pc.field("term").isin(terms), columns=["term", "cf"])
        return dict(zip(t.column("term").to_pylist(), t.column("cf").to_pylist()))
