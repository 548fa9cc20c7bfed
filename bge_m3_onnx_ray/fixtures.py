"""Deterministic synthetic transcript corpus + reference query set.

The engine's authoritative input shape (BASELINE.json ``input_hint``) is a
Parquet table of multi-turn conversation transcripts::

    conv_id: string, turn_idx: int32, role: string, text: string,
    tool: string, ts: timestamp[us]

The sandbox test data has no transcripts table, so this module
synthesises one — a pure function of ``(n_turns, seed)``, mirroring the
reference's seeded corpus generator
(``samples/performance_data/generate_dataset.py:363`` ``random.seed(42)``;
text mix modeled on its category pools ``:13-151``): short/medium/long
word-salad, multilingual rows (Latin/Cyrillic/CJK/Arabic), digit/symbol
rows (cf. ``samples/python/generate_reference_embeddings.py:67``), a few
EMPTY strings (cf. ``:64``), and deliberately hot terms (>10% document
frequency) to exercise the salted/sharded merge path. Conversation
lengths are Zipf-ish (1..max) so long-conversation skew is present.

Generated parquet is cached under ``/tmp/bm25_fixtures`` keyed by
``(n_turns, seed)`` and written atomically (temp dir + rename).
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

CACHE_ROOT = "/tmp/bm25_fixtures"
_EPOCH_US = 1_700_000_000_000_000  # fixed epoch; no wall clock anywhere

_EN = ("the quick brown fox jumps over lazy dog machine learning model "
       "pipeline data stream batch shuffle index query term score rank "
       "document conversation agent tool search engine distributed actor "
       "cluster memory block partition merge sort hash token text user "
       "assistant system answer question error retry plan code test run").split()
_RU = "данные поиск индекс запрос модель система ответ вопрос код тест".split()
_ZH = list("数据索引查询模型系统回答问题代码测试分布式集群")
_AR = "بيانات فهرس استعلام نموذج نظام جواب سؤال".split()
_HOT = ["the", "data", "query"]  # forced-hot terms (df > 10%)
_ROLES = ["user", "assistant", "system", "tool"]
_TOOLS = ["", "search", "python", "browser", "calculator"]


def gen_transcripts(n_turns: int, seed: int = 42) -> pa.Table:
    rng = np.random.default_rng(seed)
    # conversation lengths: zipf-ish, clipped to [1, 200]
    lens = []
    total = 0
    while total < n_turns:
        l = int(min(200, max(1, rng.zipf(1.6))))
        lens.append(l)
        total += l
    lens[-1] -= total - n_turns
    if lens[-1] == 0:
        lens.pop()
    lens = np.array(lens, np.int64)
    n_convs = len(lens)
    conv_ids = np.array([f"conv-{i:08d}" for i in range(n_convs)], dtype=object)
    conv_col = np.repeat(conv_ids, lens)
    turn_idx = np.concatenate([np.arange(l, dtype=np.int32) for l in lens])
    n = len(conv_col)

    role_col = np.array(_ROLES, dtype=object)[rng.integers(0, 4, n)]
    tool_col = np.where(role_col == "tool",
                        np.array(_TOOLS, dtype=object)[rng.integers(1, len(_TOOLS), n)],
                        "")

    # text: category per row
    cat = rng.random(n)
    word_counts = rng.integers(3, 15, n)
    long_rows = cat > 0.97
    word_counts[long_rows] = rng.integers(40, 120, int(long_rows.sum()))
    texts = np.empty(n, dtype=object)
    en_idx = rng.integers(0, len(_EN), int(word_counts.sum()) + n)
    pos = 0
    hot_draw = rng.random(n)
    ml_draw = rng.random(n)
    num_draw = rng.integers(0, 100000, n)
    for i in range(n):
        c = cat[i]
        if c < 0.005:
            texts[i] = ""  # empty-string docs (reference golden set includes "")
            continue
        wc = int(word_counts[i])
        words = [_EN[j] for j in en_idx[pos:pos + wc]]
        pos += wc
        if hot_draw[i] < 0.3:
            words.insert(0, _HOT[i % len(_HOT)])
        if ml_draw[i] < 0.06:
            words.append(_RU[i % len(_RU)])
            words.append(_ZH[i % len(_ZH)])
        elif ml_draw[i] < 0.08:
            words.append(_AR[i % len(_AR)])
        if c > 0.99:
            words.append(f"num{num_draw[i]} !@#$%^&*() 12345")
        texts[i] = " ".join(words)

    ts = _EPOCH_US + np.arange(n, dtype=np.int64) * 1_000_000 + turn_idx.astype(np.int64)
    return pa.table({
        "conv_id": pa.array(conv_col, pa.string()),
        "turn_idx": pa.array(turn_idx, pa.int32()),
        "role": pa.array(role_col, pa.string()),
        "text": pa.array(texts, pa.string()),
        "tool": pa.array(tool_col, pa.string()),
        "ts": pa.array(ts, pa.timestamp("us")),
    })


def gen_queries(n_queries: int = 50, seed: int = 43) -> list[tuple[int, str]]:
    """Reference query set: in-vocab single/multi-term, duplicate-term,
    hot-term-only, out-of-vocab, mixed-script, empty (FIXTURES.md §2)."""
    rng = np.random.default_rng(seed)
    out: list[tuple[int, str]] = []
    fixed = [
        "data query",             # hot terms only
        "zzzqx notinvocab",       # out-of-vocab → empty result
        "fox fox",                # duplicate term
        "поиск 索",               # mixed script
        "",                       # empty query → empty result
        "distributed actor cluster memory",
    ]
    for i, q in enumerate(fixed):
        out.append((i, q))
    for i in range(len(fixed), n_queries):
        k = int(rng.integers(1, 5))
        words = [_EN[int(j)] for j in rng.integers(0, len(_EN), k)]
        out.append((i, " ".join(words)))
    return out


def transcripts_path(n_turns: int, seed: int = 42) -> str:
    """Cached deterministic parquet DIRECTORY for (n_turns, seed).

    Written as multiple files with bounded row groups — a single-file
    single-row-group corpus is read by ONE Ray task and serializes the
    whole pipeline (observed: the read, not the tokenize, capped 32-CPU
    runs). Multiple files = parallel read, like any real corpus layout.
    """
    d = os.path.join(CACHE_ROOT, f"transcripts-v2-n{n_turns}-s{seed}")
    if os.path.isdir(d):
        return d
    os.makedirs(CACHE_ROOT, exist_ok=True)
    tmp = d + f".tmp-{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    t = gen_transcripts(n_turns, seed)
    rows_per_file = max(65536, n_turns // 32)
    i = 0
    start = 0
    while start < t.num_rows:
        pq.write_table(t.slice(start, rows_per_file),
                       os.path.join(tmp, f"part-{i:04d}.parquet"),
                       row_group_size=32768)
        start += rows_per_file
        i += 1
    try:
        os.rename(tmp, d)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)  # concurrent writer won
    return d


def gen_zipf_transcripts(n_turns: int, seed: int = 44,
                         vocab: int = 50, short_frac: float = 0.02) -> pa.Table:
    """Skewed-impact corpus for block-max WAND evidence: the synthetic
    main corpus has near-flat tf AND near-flat doc lengths, so every
    skip block's (max_tf, min_dl) score bound ties and WAND degenerates
    to exhaustive + bookkeeping. BM25's tf saturation (k1=1.2) means tf
    skew alone barely moves bounds — the lever is DOC LENGTH: a rare
    ``short_frac`` of turns are very short (focus term tf 3-5, dl 4-6,
    scoring far above everything) and the bulk are long (40-60 filler
    terms, tf<=3, dl 60-120). With a small vocab the per-term posting
    lists run to ~10^5 entries per shard while only ~10^2 of them are
    short docs, so ~90% of skip blocks are long-only and theta (set by
    the short docs) prunes them. Schema matches the input_hint
    transcripts shape."""
    rng = np.random.default_rng(seed)
    words = np.array([f"w{j:03d}" for j in range(vocab)], dtype=object)
    n_short = max(1, int(n_turns * short_frac))
    short_at = np.zeros(n_turns, bool)
    short_at[rng.choice(n_turns, n_short, replace=False)] = True

    texts = np.empty(n_turns, dtype=object)
    sidx = np.flatnonzero(short_at)
    focus = rng.integers(0, vocab, n_short)
    tf_s = rng.integers(3, 6, n_short)
    fill_s = rng.integers(0, vocab, n_short)
    for j, i in enumerate(sidx):
        texts[i] = " ".join([words[focus[j]]] * int(tf_s[j])
                            + [words[fill_s[j]]])
    lidx = np.flatnonzero(~short_at)
    n_long = len(lidx)
    n_dist = rng.integers(40, min(61, vocab + 1), n_long)
    tf_l = rng.integers(1, 4, int(n_dist.sum()))
    pos = 0
    for j, i in enumerate(lidx):
        nd = int(n_dist[j])
        terms = words[rng.choice(vocab, nd, replace=False)]
        reps = tf_l[pos:pos + nd]
        pos += nd
        texts[i] = " ".join(np.repeat(terms, reps))

    lens = []
    total = 0
    while total < n_turns:
        l = int(min(50, max(1, rng.zipf(1.7))))
        lens.append(l)
        total += l
    lens[-1] -= total - n_turns
    if lens[-1] == 0:
        lens.pop()
    lens = np.array(lens, np.int64)
    conv_ids = np.array([f"zconv-{i:08d}" for i in range(len(lens))],
                        dtype=object)
    conv_col = np.repeat(conv_ids, lens)
    turn_idx = np.concatenate([np.arange(l, dtype=np.int32) for l in lens])
    roles = np.array(_ROLES, dtype=object)[rng.integers(0, 4, n_turns)]
    ts = _EPOCH_US + np.arange(n_turns, dtype=np.int64) * 1_000_000
    return pa.table({
        "conv_id": pa.array(conv_col, pa.string()),
        "turn_idx": pa.array(turn_idx, pa.int32()),
        "role": pa.array(roles, pa.string()),
        "text": pa.array(texts, pa.string()),
        "tool": pa.array(np.full(n_turns, "", dtype=object), pa.string()),
        "ts": pa.array(ts, pa.timestamp("us")),
    })


def zipf_transcripts_path(n_turns: int, seed: int = 44) -> str:
    """Cached parquet directory for the Zipf-TF corpus."""
    d = os.path.join(CACHE_ROOT, f"zipf-n{n_turns}-s{seed}")
    if os.path.isdir(d):
        return d
    os.makedirs(CACHE_ROOT, exist_ok=True)
    tmp = d + f".tmp-{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    t = gen_zipf_transcripts(n_turns, seed)
    rows_per_file = max(65536, n_turns // 32)
    i = 0
    start = 0
    while start < t.num_rows:
        pq.write_table(t.slice(start, rows_per_file),
                       os.path.join(tmp, f"part-{i:04d}.parquet"),
                       row_group_size=32768)
        start += rows_per_file
        i += 1
    try:
        os.rename(tmp, d)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
    return d


def gen_clustered_embeddings(n: int = 50_000, dim: int = 32,
                             n_clusters: int = 64,
                             seed: int = 45) -> pa.Table:
    """Clusterable-embedding corpus for IVF evidence: real embedding
    spaces (sentence/image encoders) are strongly clustered, which is
    what makes IVF's probe-pruned scan pay; the sandbox ``embeddings``
    table is near-uniform (near-unclusterable — the bench's nprobe/recall
    curve on it needs full probe to reach 0.9 recall, by construction of
    the DATA, not the engine). This fixture draws ``n_clusters`` Gaussian
    centers and samples points at 0.15 relative noise — deterministic,
    seeded. Schema matches the embeddings table: (vec_id, embedding)."""
    import numpy as np
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.integers(0, n_clusters, n)
    vecs = centers[assign] + 0.15 * rng.normal(size=(n, dim)) / np.sqrt(dim)
    return pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs.astype(np.float32)],
                              pa.list_(pa.float32())),
    })


def transcripts_path_big(n_turns: int, seed: int = 42,
                         chunk_turns: int = 8_000_000) -> str:
    """Chunk-deterministic BIG-corpus fixture for capstone-scale builds
    (quarter-billion+ turns). The v2 generator (:func:`transcripts_path`)
    draws every random array for the WHOLE corpus before writing —
    ~60 GB of Python strings at 512M turns — so it cannot reach
    half-billion scale on a 128 GB node. This variant generates
    independent ``chunk_turns`` slices (per-chunk rng seeded by
    ``(seed, chunk)``, conv ids prefixed by chunk so they never
    collide), writing each chunk before generating the next — peak
    memory is ONE chunk. Still a pure function of
    ``(n_turns, seed, chunk_turns)``; NOT byte-compatible with the v2
    stream (golden/oracle-pinned tests stay on v2)."""
    import pyarrow.compute as pc
    d = os.path.join(CACHE_ROOT,
                     f"transcripts-v3big-n{n_turns}-s{seed}-c{chunk_turns}")
    if os.path.isdir(d):
        return d
    os.makedirs(CACHE_ROOT, exist_ok=True)
    tmp = d + f".tmp-{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    start = 0
    ci = 0
    while start < n_turns:
        n = min(chunk_turns, n_turns - start)
        t = gen_transcripts(n, seed + 1_000_003 * ci)
        conv = pc.binary_join_element_wise(
            pa.scalar(f"c{ci:04d}-"), t.column("conv_id").cast(pa.string()),
            "")
        t = t.set_column(t.schema.get_field_index("conv_id"),
                         "conv_id", conv)
        pq.write_table(t, os.path.join(tmp, f"part-{ci:05d}.parquet"),
                       row_group_size=32768)
        start += n
        ci += 1
    try:
        os.rename(tmp, d)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
    return d
