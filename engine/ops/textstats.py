"""Text-analysis operators over the documents table.

Language-ID (marker-word heuristic), quality scoring (length / token /
punctuation / stopword ratios), token counting, normalization (the M5
analog applied corpus-wide) and document fingerprinting.

Parity discipline (SURVEY SS2.9): every regex used here is RE2-compatible
and ASCII-\\S based, and the Python side compiles with ``re.ASCII``, so
the DuckDB oracle (`regexp_extract_all`) counts the exact same matches.
Ratios are rounded to 6 decimals on both sides.
"""

from __future__ import annotations

import hashlib
import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .._rayutil import ensure_serializable
from ..pipeline import normalize_arrow

TOKEN_PATTERN = r"[^ \t\n\r\f\v]+"       # ASCII \S+, spelled out for RE2/DuckDB parity
PUNCT_PATTERN = r"[!-/:-@\[-`{-~]"        # ASCII punctuation ranges
# GPT-2-style byte-pair pre-tokenizer pattern, RE2-compatible (the real
# GPT-2 regex uses a lookahead RE2 lacks; this ASCII variant keeps the
# contraction / letter-run / digit-run / symbol-run / whitespace-run
# structure that makes BPE counts ~proportional to real token counts).
BPE_PATTERN = (
    r"'(?:[sdmt]|ll|ve|re)"
    r"| ?[A-Za-z]+"
    r"| ?[0-9]+"
    r"| ?[^ \t\n\r\f\vA-Za-z0-9]+"
    r"|[ \t\n\r\f\v]+"
)
ROUND_DECIMALS = 6

# Marker-word profiles for the 5 corpus languages (FIXTURES-style
# deterministic heuristic; real systems use char n-gram models).
LANG_MARKERS = {
    "de": ["der", "die", "das", "und", "nicht", "ist"],
    "en": ["the", "and", "of", "to", "is", "that"],
    "es": ["el", "la", "los", "que", "de", "es"],
    "fr": ["le", "la", "les", "et", "est", "que"],
}
CJK_PATTERN = r"[一-鿿]"
STOPWORDS = ["the", "and", "of", "a", "to", "in"]


def _read_documents(sf_dir: str, columns):
    ensure_serializable()
    return ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=columns
    )


def quality_score(sf_dir: str) -> ray.data.Dataset:
    """Per-document quality features, fully vectorized with pyarrow."""

    def score(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        n_chars = pc.utf8_length(text)
        n_tokens = pc.count_substring_regex(text, TOKEN_PATTERN)
        n_punct = pc.count_substring_regex(text, PUNCT_PATTERN)
        stop_hits = None
        for w in STOPWORDS:
            hits = pc.count_substring_regex(text, rf"\b{w}\b")
            stop_hits = hits if stop_hits is None else pc.add(stop_hits, hits)
        denom = pc.max_element_wise(
            pc.cast(n_tokens, pa.float64()), pa.scalar(1.0)
        )
        denom_chars = pc.max_element_wise(
            pc.cast(n_chars, pa.float64()), pa.scalar(1.0)
        )
        # round_mode matches DuckDB's round() (half away from zero): ratios
        # like n/128 hit exact binary halves at 6 decimals, where numpy/
        # Arrow's default half-to-even would diverge from the SQL oracle.
        punct_ratio = pc.round(
            pc.divide(pc.cast(n_punct, pa.float64()), denom_chars),
            ndigits=ROUND_DECIMALS,
            round_mode="half_towards_infinity",
        )
        stop_ratio = pc.round(
            pc.divide(pc.cast(stop_hits, pa.float64()), denom),
            ndigits=ROUND_DECIMALS,
            round_mode="half_towards_infinity",
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_chars": pc.cast(n_chars, pa.int64()),
                "n_tokens": pc.cast(n_tokens, pa.int64()),
                "n_punct": pc.cast(n_punct, pa.int64()),
                "punct_ratio": punct_ratio,
                "stopword_ratio": stop_ratio,
            }
        )

    return _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True
    )


def _lang_predict(text_col):
    """Shared marker-word scoring kernel: lowercased text column ->
    (pred ndarray, {lang: int64 score array}, cjk score array).
    pred = lexicographically-first language among the max scorers
    ('zh' wins on any CJK presence)."""
    text = pc.utf8_lower(text_col)
    scores = {}
    for lang, markers in LANG_MARKERS.items():
        s = None
        for w in markers:
            hits = pc.count_substring_regex(text, rf"\b{w}\b")
            s = hits if s is None else pc.add(s, hits)
        scores[lang] = pc.cast(s, pa.int64())
    cjk = pc.cast(pc.count_substring_regex(text, CJK_PATTERN), pa.int64())
    score_mat = np.column_stack(
        [scores[lang].to_numpy(zero_copy_only=False) for lang in sorted(scores)]
    )
    langs = np.array(sorted(scores))
    best = langs[score_mat.argmax(axis=1)]  # argmax -> first max (lexicographic)
    pred = np.where(cjk.to_numpy(zero_copy_only=False) > 0, "zh", best)
    return pred, scores, cjk


def lang_id(sf_dir: str) -> ray.data.Dataset:
    """Marker-word language ID. pred_lang = lexicographically-first language
    among the max scorers ('zh' wins on any CJK presence)."""

    def predict(batch: pa.Table) -> pa.Table:
        pred, scores, cjk = _lang_predict(batch["text"])
        cols = {"doc_id": batch["doc_id"], "pred_lang": pa.array(pred, pa.string())}
        for lang in sorted(scores):
            cols[f"score_{lang}"] = scores[lang]
        cols["score_zh"] = cjk
        return pa.table(cols)

    return _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        predict, batch_format="pyarrow", zero_copy_batch=True
    )


def lang_id_accuracy(sf_dir: str) -> ray.data.Dataset:
    """Aggregate confusion counts of pred_lang vs the table's lang label.

    The label lives in the SAME table as the text, so this is one pass:
    predict + per-batch (lang, pred_lang) count partials + a tiny global
    Sum over |langs|^2 keys. (The previous version broadcast a full
    doc_id -> lang dict built driver-side — unbounded state at corpus
    scale, for a join the read can do for free.)"""
    from ray.data.aggregate import Sum

    def confuse(batch: pa.Table) -> pa.Table:
        pred, _, _ = _lang_predict(batch["text"])
        t = pa.table(
            {"lang": batch["lang"], "pred_lang": pa.array(pred, pa.string())}
        )
        return t.group_by(["lang", "pred_lang"]).aggregate(
            [("pred_lang", "count")]
        )

    partials = _read_documents(sf_dir, ["text", "lang"]).map_batches(
        confuse, batch_format="pyarrow", zero_copy_batch=True
    )
    return partials.groupby(["lang", "pred_lang"]).aggregate(
        Sum("pred_lang_count", alias_name="n_docs")
    )


def bpe_token_counts(sf_dir: str) -> ray.data.Dataset:
    """Per-document BPE-ish token counting (task brief: 'token counting —
    whitespace + a BPE-ish regex'): whitespace tokens AND GPT-2-style
    pre-tokenizer segments, both counted entirely in Arrow's RE2 (the
    same engine DuckDB uses, so the oracle is structurally identical)."""

    def count(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_ws_tokens": pc.cast(
                    pc.count_substring_regex(text, TOKEN_PATTERN), pa.int64()
                ),
                "n_bpe_tokens": pc.cast(
                    pc.count_substring_regex(text, BPE_PATTERN), pa.int64()
                ),
            }
        )

    return _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        count, batch_format="pyarrow", zero_copy_batch=True
    )


WORD_COUNT_K = 100


def _skyline_kernel(
    tokens: np.ndarray, punct: np.ndarray, ids: np.ndarray
) -> np.ndarray:
    """Indices of the 2-d Pareto frontier (maximize tokens, minimize
    punct). A point survives iff no other point has tokens >= AND
    punct <= with at least one strict; equal (tokens, punct) pairs do
    not dominate each other, so duplicates of a frontier point all
    survive. One lexsort: within a token group survivors carry the
    group-min punct; across groups punct must beat the exclusive
    running min of all STRICTLY-higher-token groups."""
    if tokens.size == 0:
        return np.empty(0, dtype=np.int64)
    order = np.lexsort((ids, punct, -tokens))
    t, p = tokens[order], punct[order]
    starts = np.empty(t.size, dtype=bool)
    starts[0] = True
    starts[1:] = t[1:] != t[:-1]
    gidx = np.cumsum(starts) - 1
    gmin = p[np.flatnonzero(starts)]  # punct sorted asc within group
    prefix = np.concatenate(
        ([np.iinfo(np.int64).max], np.minimum.accumulate(gmin)[:-1])
    )
    keep = (p == gmin[gidx]) & (p < prefix[gidx])
    return order[keep]


def pareto_docs(sf_dir: str) -> ray.data.Dataset:
    """Pareto frontier (skyline) of documents over (n_tokens max,
    n_punct min) — the multi-objective curation cut "no document is
    both shorter AND noisier than a kept one" that picks exemplars
    without collapsing two quality axes into one weighted score.

    Scale shape — skyline is ALGEBRAIC (skyline(A ∪ B) =
    skyline(skyline(A) ∪ skyline(B))), so each batch prunes its own
    dominated points locally with one vectorized lexsort kernel and
    only per-batch frontiers (bounded by the batch's distinct token
    counts, typically a handful of rows) reach the single-block final
    merge that reruns the identical kernel. The corpus never shuffles;
    the reduce input is partial frontiers only."""
    ensure_serializable()

    def features(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        return pa.table(
            {
                "doc_id": pc.cast(batch["doc_id"], pa.int64()),
                "n_tokens": pc.cast(
                    pc.count_substring_regex(text, TOKEN_PATTERN), pa.int64()
                ),
                "n_punct": pc.cast(
                    pc.count_substring_regex(text, PUNCT_PATTERN), pa.int64()
                ),
            }
        )

    def local_skyline(batch: pa.Table) -> pa.Table:
        keep = _skyline_kernel(
            batch["n_tokens"].to_numpy(zero_copy_only=False),
            batch["n_punct"].to_numpy(zero_copy_only=False),
            batch["doc_id"].to_numpy(zero_copy_only=False),
        )
        return batch.take(pa.array(keep))

    partial = (
        _read_documents(sf_dir, ["doc_id", "text"])
        .map_batches(features, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(local_skyline, batch_format="pyarrow", zero_copy_batch=True)
    )
    # batch_size=None: the merged partial frontiers must reach the final
    # kernel as ONE batch, not 1024-row slices of it
    return partial.repartition(1).map_batches(
        local_skyline, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    )


def word_counts(sf_dir: str, k: int = WORD_COUNT_K) -> ray.data.Dataset:
    """Corpus-wide top-k word frequencies over documents.text — the
    vocabulary/heavy-hitter roll-up every training-data pipeline runs.

    Tokenization is a literal single-space split (identical on both
    engines: Arrow ``split_pattern`` / DuckDB ``string_split``), empties
    dropped. Scale shape: per-batch ``group_by(word).count`` partials so
    the global shuffle moves one row per (word, batch) — vocabulary-
    bounded, not token-bounded; final ordering (count desc, word asc)
    makes the k-boundary deterministic."""
    from ray.data.aggregate import Sum as _Sum

    def partial(batch: pa.Table) -> pa.Table:
        words = pc.list_flatten(pc.split_pattern(batch["text"], " "))
        words = words.filter(pc.not_equal(words, ""))
        return (
            pa.table({"word": words})
            .group_by(["word"])
            .aggregate([("word", "count")])
        )

    partials = _read_documents(sf_dir, ["text"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    agg = partials.groupby("word").aggregate(
        _Sum("word_count", alias_name="n")
    )
    return agg.sort(["n", "word"], descending=[True, False]).limit(k)


TREND_K = 10


def trending_terms(sf_dir: str, k: int = TREND_K) -> ray.data.Dataset:
    """Per-source top-k terms over documents.text — the grouped
    heavy-hitter roll-up behind "trending terms by domain/day" reports
    (word_counts is the global cousin; this one keeps a group key).

    Scale shape: per-batch (source, word) count partials bound the
    shuffle by sources x vocabulary (never the token stream); the global
    sum is one bounded groupby; the per-source top-k finalize is ONE
    vectorized map_groups call per source (a handful of groups), each
    sorting only its own vocabulary slice — no global sort of counts.
    Tie-break (count desc, word asc) pins the k-boundary
    deterministically on both engines."""
    from ray.data.aggregate import Sum as _Sum

    def partial(batch: pa.Table) -> pa.Table:
        words_list = pc.split_pattern(pc.fill_null(batch["text"], ""), " ")
        flat = pc.list_flatten(words_list)
        src = batch["source"].take(pc.list_parent_indices(words_list))
        t = pa.table({"source": src, "word": flat})
        t = t.filter(pc.not_equal(t["word"], ""))
        grouped = t.group_by(["source", "word"]).aggregate([([], "count_all")])
        # select by name — pyarrow puts key columns first, aggregates after
        return pa.table(
            {
                "source": grouped["source"],
                "word": grouped["word"],
                "n": grouped["count_all"],
            }
        )

    def topk(group: pa.Table) -> pa.Table:
        return group.sort_by(
            [("n", "descending"), ("word", "ascending")]
        ).slice(0, k)

    partials = _read_documents(sf_dir, ["source", "text"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    counts = partials.groupby(["source", "word"]).aggregate(
        _Sum("n", alias_name="n")
    )
    return counts.groupby("source").map_groups(topk, batch_format="pyarrow")


def normalize_documents(sf_dir: str) -> ray.data.Dataset:
    """Corpus-wide normalize_text (M5 analog) using the pipeline's
    vectorized Arrow fast path."""

    def norm(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "normalized_text": normalize_arrow(batch["text"]),
            }
        )

    return _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        norm, batch_format="pyarrow", zero_copy_batch=True
    )


def doc_fingerprint(sf_dir: str) -> ray.data.Dataset:
    """md5 content fingerprint per document (exact-dedup key; SQL: md5())."""

    def fp(batch: pa.Table) -> pa.Table:
        hashes = [
            hashlib.md5(t.encode()).hexdigest() for t in batch["text"].to_pylist()
        ]
        return pa.table({"doc_id": batch["doc_id"], "fp": pa.array(hashes)})

    return _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        fp, batch_format="pyarrow", zero_copy_batch=True
    )


ROLL_WINDOW = 8
_ROLL_BASE = 257
_ROLL_MOD = (1 << 61) - 1
_M29 = (1 << 29) - 1


def _fold61(x: np.ndarray) -> np.ndarray:
    """Reduce uint64 values < 2^62 mod the Mersenne prime 2^61-1."""
    x = (x & np.uint64(_ROLL_MOD)) + (x >> np.uint64(61))
    return np.where(x >= _ROLL_MOD, x - np.uint64(_ROLL_MOD), x)


def _horner_step(h: np.ndarray, c: np.ndarray) -> np.ndarray:
    """(h * 257 + c) mod 2^61-1 without overflow, vectorized uint64.

    h < 2^61 so h*257 would overflow; split h = hi*2^32 + lo and use
    2^61 ≡ 1 (mod p): hi*257*2^32 ≡ (x >> 29) + (x & (2^29-1)) << 32
    with x = hi*257 < 2^38 — every intermediate stays under 2^62."""
    hi = h >> np.uint64(32)
    lo = h & np.uint64(0xFFFFFFFF)
    x = hi * np.uint64(_ROLL_BASE)
    t = (x >> np.uint64(29)) + ((x & np.uint64(_M29)) << np.uint64(32))
    return _fold61(t + lo * np.uint64(_ROLL_BASE) + c)


def rolling_fingerprint(sf_dir: str) -> ray.data.Dataset:
    """Rolling-hash document fingerprint: min of Rabin-Karp hashes over
    8-byte windows, computed mod 2^61-1 EXACTLY (Horner's rule with a
    modular reduction per step — the naive sum-of-products overflows
    int64 at 255*257^7 ~ 1.9e19; property-tested against a pure-Python
    big-int oracle in tests/test_ops.py). A winnowing-style content
    signature; robust to appends, unlike md5. Oracle-checked: DuckDB
    runs the same Horner fold in HUGEINT via list_reduce (codepoint ==
    byte on the all-ASCII corpus; the engine hashes true UTF-8 bytes)."""

    def fp(batch: pa.Table) -> pa.Table:
        out = []
        for t in batch["text"].to_pylist():
            data = t.encode()
            if len(data) < ROLL_WINDOW:
                out.append(int(int.from_bytes(data, "big") % _ROLL_MOD))
                continue
            arr = np.frombuffer(data, dtype=np.uint8)
            windows = np.lib.stride_tricks.sliding_window_view(arr, ROLL_WINDOW)
            h = np.zeros(len(windows), dtype=np.uint64)
            for k in range(ROLL_WINDOW):
                h = _horner_step(h, windows[:, k].astype(np.uint64))
            out.append(int(h.min()))
        return pa.table(
            {"doc_id": batch["doc_id"], "roll_fp": pa.array(out, pa.int64())}
        )

    return _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        fp, batch_format="pyarrow", zero_copy_batch=True
    )


TFIDF_SCALE = 1_000_000_000


def tfidf_top_terms(
    sf_dir: str, k: int = 3, num_buckets: int | None = None
) -> ray.data.Dataset:
    """Per-document top-k terms by tf·idf with a LINEAR idf (score =
    tf/df, fixed-point e9) — the keyword-extraction primitive, scored in
    exact integer arithmetic so the DuckDB oracle matches bit-for-bit
    (a log-idf would hinge on libm rounding parity; linear idf ranks
    documents' terms identically for fixed tf).

    Scale shape — two bucketed shuffles, no broadcast of the vocabulary:
    1. ``map_batches``: split + flatten (Arrow kernels), per-batch
       ``group_by(doc_id, word)`` → exact tf rows (a document lives in
       exactly one batch row, so batch-local tf is global tf).
    2. shuffle on hash(word): every row of a word co-locates, so df is a
       run length — no count-distinct machinery; score_e9 = tf·1e9 // df
       (all positive, so numpy floor == DuckDB trunc).
    3. shuffle on doc_id % buckets: per-doc top-k by (score desc, word
       asc) via one lexsort per bucket.
    Both shuffles carry int32 bucket keys (~|buckets| distinct values —
    the sort-shuffle scales with distinct keys, not bytes)."""
    from ..pipeline import _hash_conv_ids, resolve_num_buckets

    num_buckets = resolve_num_buckets(
        num_buckets, os.path.join(sf_dir, "documents.parquet")
    )

    def tf_partial(batch: pa.Table) -> pa.Table:
        words = pc.split_pattern(batch["text"], " ")
        flat = pc.list_flatten(words)
        doc = batch["doc_id"].take(pc.list_parent_indices(words))
        mask = pc.not_equal(flat, "")
        t = pa.table({"doc_id": doc.filter(mask), "word": flat.filter(mask)})
        tf = t.group_by(["doc_id", "word"]).aggregate([("doc_id", "count")])
        w = tf["word"].combine_chunks().to_numpy(zero_copy_only=False)
        bucket = (_hash_conv_ids(w) % num_buckets).astype(np.int32)
        return pa.table(
            {
                "doc_id": tf["doc_id"],
                "word": tf["word"],
                "tf": pc.cast(tf["doc_id_count"], pa.int64()),
                "_b": pa.array(bucket),
            }
        )

    def score_bucket(group: pa.Table) -> pa.Table:
        t = group.sort_by([("word", "ascending")]).combine_chunks()
        if t.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "word": pa.array([], pa.string()),
                    "tf": pa.array([], pa.int64()),
                    "df": pa.array([], pa.int64()),
                    "score_e9": pa.array([], pa.int64()),
                    "_b": pa.array([], pa.int32()),
                }
            )
        w = t["word"]
        n = t.num_rows
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = pc.not_equal(w.slice(1), w.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
        run_id = np.cumsum(new) - 1
        df = np.bincount(run_id)[run_id]  # run length = docs per word
        tf = t["tf"].to_numpy(zero_copy_only=False)
        doc = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "word": w,
                "tf": t["tf"],
                "df": pa.array(df.astype(np.int64)),
                "score_e9": pa.array(tf * TFIDF_SCALE // df),
                "_b": pa.array((doc % num_buckets).astype(np.int32)),
            }
        )

    def topk_bucket(group: pa.Table) -> pa.Table:
        t = group.combine_chunks()
        if t.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "word": pa.array([], pa.string()),
                    "tf": pa.array([], pa.int64()),
                    "df": pa.array([], pa.int64()),
                    "score_e9": pa.array([], pa.int64()),
                    "rank": pa.array([], pa.int64()),
                }
            )
        doc = t["doc_id"].to_numpy(zero_copy_only=False)
        score = t["score_e9"].to_numpy(zero_copy_only=False)
        word = t["word"].to_numpy(zero_copy_only=False)
        order = np.lexsort((word, -score, doc))
        d_sorted = doc[order]
        new = np.empty(len(order), dtype=bool)
        new[0] = True
        new[1:] = d_sorted[1:] != d_sorted[:-1]
        run_id = np.cumsum(new) - 1
        starts = np.flatnonzero(new)
        rank = np.arange(len(order)) - starts[run_id] + 1
        keep = order[rank <= k]
        return pa.table(
            {
                "doc_id": t["doc_id"].take(pa.array(keep)),
                "word": t["word"].take(pa.array(keep)),
                "tf": t["tf"].take(pa.array(keep)),
                "df": t["df"].take(pa.array(keep)),
                "score_e9": t["score_e9"].take(pa.array(keep)),
                "rank": pa.array(rank[rank <= k].astype(np.int64)),
            }
        )

    tf_rows = _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        tf_partial, batch_format="pyarrow", zero_copy_batch=True
    )
    scored = tf_rows.groupby("_b").map_groups(
        lambda g: score_bucket(g.drop_columns(["_b"])), batch_format="pyarrow"
    )
    return scored.groupby("_b").map_groups(
        lambda g: topk_bucket(g.drop_columns(["_b"])), batch_format="pyarrow"
    )


FILTER_MIN_TOKENS = 40
FILTER_MAX_TOKENS = 120
FILTER_STOP_PERMILLE = 120      # stop_hits/n_tokens <= 0.12


def filter_quality_docs(sf_dir: str) -> ray.data.Dataset:
    """C4-style quality cleaning filter: keep documents whose token count
    sits in [40, 120] and whose stopword ratio is <= 0.12 — the
    row-pruning pass a training-data pipeline runs before tokenization.

    The ratio threshold is evaluated as an exact integer cross-product
    (stop_hits * 1000 <= n_tokens * 120) so no float — and no rounding-
    parity question — exists anywhere in the predicate. Embarrassingly
    parallel Arrow kernels; the filter prunes rows INSIDE the batch, so
    downstream stages never see rejected documents."""

    def keep(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        n_tokens = pc.cast(
            pc.count_substring_regex(text, TOKEN_PATTERN), pa.int64()
        )
        stop_hits = None
        for w in STOPWORDS:
            hits = pc.count_substring_regex(text, rf"\b{w}\b")
            stop_hits = hits if stop_hits is None else pc.add(stop_hits, hits)
        stop_hits = pc.cast(stop_hits, pa.int64())
        mask = pc.and_(
            pc.and_(
                pc.greater_equal(n_tokens, FILTER_MIN_TOKENS),
                pc.less_equal(n_tokens, FILTER_MAX_TOKENS),
            ),
            pc.less_equal(
                pc.multiply(stop_hits, pa.scalar(1000, pa.int64())),
                pc.multiply(n_tokens, pa.scalar(FILTER_STOP_PERMILLE, pa.int64())),
            ),
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": n_tokens,
                "stop_hits": stop_hits,
            }
        ).filter(mask)

    return _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        keep, batch_format="pyarrow", zero_copy_batch=True
    )


BIGRAM_K = 50


def bigram_counts(sf_dir: str, k: int = BIGRAM_K) -> ray.data.Dataset:
    """Corpus-wide top-k BIGRAM frequencies over documents.text — the
    n-gram language-statistics pass (the n=2 cousin of ``word_counts``;
    shingle-based dedup uses the same adjacency machinery with hashes).

    Adjacent pairs never cross a document boundary: the flat word
    stream's list offsets mark each document's last word, and the pair
    arrays are two masked views of the same flat array — no per-row
    Python, no join. Tokenization is the literal single-space split
    shared with ``word_counts`` (empties kept: dropping them would
    change adjacency, and the SQL oracle keeps them too). Shuffle is
    vocabulary²-bounded via per-batch pair-count partials."""
    from ray.data.aggregate import Sum as _Sum

    def partial(batch: pa.Table) -> pa.Table:
        words_list = pc.split_pattern(pc.fill_null(batch["text"], ""), " ")
        lengths = pc.list_value_length(words_list).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(words_list)
        total = len(flat)
        if total == 0:
            return pa.table(
                {"w1": pa.array([], pa.string()), "w2": pa.array([], pa.string()),
                 "n": pa.array([], pa.int64())}
            )
        is_last = np.zeros(total, dtype=bool)
        ends = np.cumsum(lengths) - 1
        is_last[ends[lengths > 0]] = True
        first_idx = np.flatnonzero(~is_last)
        w1 = flat.take(pa.array(first_idx))
        w2 = flat.take(pa.array(first_idx + 1))
        return (
            pa.table({"w1": w1, "w2": w2})
            .group_by(["w1", "w2"])
            .aggregate([([], "count_all")])
            .rename_columns(["w1", "w2", "n"])
        )

    partials = _read_documents(sf_dir, ["text"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    agg = partials.groupby(["w1", "w2"]).aggregate(_Sum("n", alias_name="n"))
    return agg.sort(["n", "w1", "w2"], descending=[True, False, False]).limit(k)


REP_NGRAM = 3


def doc_repetition(sf_dir: str) -> ray.data.Dataset:
    """Intra-document repetition score: total vs distinct word 3-grams
    per document — the duplicated-n-gram quality rule public LM data
    reports filter on (boilerplate and looping text have low
    distinct/total ratios). Emits the two exact integers rather than a
    rounded ratio so the oracle compare stays engine-independent.

    Tokenization is the ``word_counts`` single-space split; docs with
    fewer than 3 words emit nothing (no grams exist), matching the
    oracle's GROUP BY over the gram set. Stateless per-batch map — the
    per-doc set build is inherent (grams are per-document state), but
    there is no shuffle and no cross-doc state."""

    def rep(batch: pa.Table) -> pa.Table:
        doc_ids, n_grams, n_distinct = [], [], []
        for did, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            words = (text or "").split(" ")
            n = len(words) - REP_NGRAM + 1
            if n <= 0:
                continue
            grams = {
                " ".join(words[i : i + REP_NGRAM]) for i in range(n)
            }
            doc_ids.append(did)
            n_grams.append(n)
            n_distinct.append(len(grams))
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "n_grams": pa.array(n_grams, pa.int64()),
                "n_distinct": pa.array(n_distinct, pa.int64()),
            }
        )

    return _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        rep, batch_format="pyarrow", zero_copy_batch=True
    )


MASK_MULT = 2654435761
MASK_MOD = 1 << 32
MASK_RATE = 5  # mask 1 token in 5
MASK_TOKEN = "<mask>"


def span_corruption(sf_dir: str) -> ray.data.Dataset:
    """Masked-LM EXAMPLE BUILDER (T5-style span corruption, single mask
    token): every ~5th token of each document is replaced by ``<mask>``
    in the input and collected into the target — the self-supervised
    pair construction step of an LM training pipeline.

    The mask is a DETERMINISTIC hash of (doc_id, token position) — the
    same Knuth multiplicative hash the sampling family uses, so the
    examples are reproducible across resumes, engines, and the SQL
    oracle (RNG masking would be none of those). Tokenization is the
    ``word_counts`` single-space split with empties kept (dropping them
    would shift positions).

    Scale shape: stateless per-batch map, no shuffle; the mask decision
    is one vectorized hash over the flattened token stream, only the
    final per-document string join is per-row (it builds the output
    value itself)."""

    def corrupt(batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        inputs, targets = [], []
        for did, text in zip(doc_ids, batch["text"].to_pylist()):
            words = (text or "").split(" ")
            pos = np.arange(len(words), dtype=np.int64)
            mask = ((did * 31 + pos) * MASK_MULT + 12345) % MASK_MOD % MASK_RATE == 0
            inputs.append(
                " ".join(
                    MASK_TOKEN if m else w for w, m in zip(words, mask)
                )
            )
            targets.append(" ".join(w for w, m in zip(words, mask) if m))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "input": pa.array(inputs, pa.string()),
                "target": pa.array(targets, pa.string()),
            }
        )

    return _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        corrupt, batch_format="pyarrow", zero_copy_batch=True
    )


OOV_VOCAB_SIZE = 20  # corpus vocabulary is ~31 words; 20 keeps real OOV mass


def oov_rate(sf_dir: str, vocab_size: int = OOV_VOCAB_SIZE) -> ray.data.Dataset:
    """Out-of-vocabulary scoring: per-document token and OOV counts
    against the corpus' own top-``vocab_size`` vocabulary — the
    tokenizer-coverage / gibberish filter of a training-data pipeline.

    Two passes, one broadcast, zero joins on the big side: pass 1 is
    the ``word_counts`` partial-aggregation roll-up whose top-V result
    (vocabulary-bounded, tiny) is ``ray.put`` once as a SORTED array;
    pass 2 streams documents and scores every token with one
    ``searchsorted`` membership probe over the flat token stream —
    per-doc counts come from ``np.add.at`` on the document index, no
    Python loop."""
    ensure_serializable()
    vocab_df = (
        word_counts(sf_dir, k=vocab_size).to_pandas()
    )  # vocabulary-bounded: |V| rows
    vocab = np.sort(vocab_df["word"].to_numpy().astype(object))
    vocab_ref = ray.put(vocab)

    class ScoreOOV:
        def __init__(self, ref):
            self._vocab = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            words = pc.split_pattern(batch["text"], " ")
            flat = words.combine_chunks().flatten()
            tokens = np.asarray(flat.to_pylist(), dtype=object)
            offsets = words.combine_chunks().offsets.to_numpy(zero_copy_only=False)
            widths = offsets[1:] - offsets[:-1]
            doc_idx = np.repeat(np.arange(len(widths)), widths)
            nonempty = tokens != ""
            n = len(batch)
            n_tokens = np.zeros(n, dtype=np.int64)
            np.add.at(n_tokens, doc_idx[nonempty], 1)
            if self._vocab.size and nonempty.any():
                t = tokens[nonempty]
                pos = np.clip(
                    np.searchsorted(self._vocab, t), 0, self._vocab.size - 1
                )
                oov = self._vocab[pos] != t
            else:
                oov = np.zeros(0, dtype=bool)
            n_oov = np.zeros(n, dtype=np.int64)
            np.add.at(n_oov, doc_idx[nonempty][oov], 1)
            return pa.table(
                {
                    "doc_id": batch["doc_id"],
                    "n_tokens": pa.array(n_tokens),
                    "n_oov": pa.array(n_oov),
                }
            )

    from .._rayutil import pool_size

    return _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        ScoreOOV,
        fn_constructor_args=(vocab_ref,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=pool_size(),
        num_cpus=1,
    )


def _global_bigram_counts(sf_dir: str) -> "pa.Table":
    """Distributed corpus bigram-frequency Dataset (the ``bigram_counts``
    partial machinery without the top-k cut). Never materialized whole:
    consumers cap it (``_top_bigrams``) before anything reaches the
    driver — distinct bigrams are NOT vocabulary²-bounded on real text."""
    from ray.data.aggregate import Sum as _Sum

    def partial(batch: pa.Table) -> pa.Table:
        words_list = pc.split_pattern(pc.fill_null(batch["text"], ""), " ")
        lengths = pc.list_value_length(words_list).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(words_list)
        total = len(flat)
        if total == 0:
            return pa.table(
                {"w1": pa.array([], pa.string()), "w2": pa.array([], pa.string()),
                 "n": pa.array([], pa.int64())}
            )
        is_last = np.zeros(total, dtype=bool)
        ends = np.cumsum(lengths) - 1
        is_last[ends[lengths > 0]] = True
        first_idx = np.flatnonzero(~is_last)
        return (
            pa.table(
                {
                    "w1": flat.take(pa.array(first_idx)),
                    "w2": flat.take(pa.array(first_idx + 1)),
                }
            )
            .group_by(["w1", "w2"])
            .aggregate([([], "count_all")])
            .rename_columns(["w1", "w2", "n"])
        )

    partials = _read_documents(sf_dir, ["text"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return partials.groupby(["w1", "w2"]).aggregate(_Sum("n", alias_name="n"))


# Broadcast-table bound for lm_score: only the LM_TOP_K most frequent
# bigrams (ties broken (n DESC, w1, w2) — deterministic) enter the
# scoring dict. Distinct bigrams grow ~linearly with corpus size on
# open-vocabulary text, so an uncapped table is an O(corpus) driver
# materialization at 100 TB; rare bigrams contribute negligible score
# mass, so the cap loses only tail transitions (they score 0). The
# DuckDB oracle applies the SAME cap; the fixture's closed vocabulary
# (~31 words -> <1k distinct bigrams) never reaches it, so capped ==
# exact at test scale.
LM_TOP_K = 65536


def _top_bigrams(sf_dir: str, k: int = LM_TOP_K) -> dict:
    """Global top-k bigram counts as a dict, with bounded driver
    materialization: the post-aggregate table holds each bigram exactly
    once, so a per-block local top-k (the heavy-hitter partial pattern)
    is a superset of the global top-k — the driver sees at most
    num_blocks x k rows, never the full distinct-bigram table."""
    order = [("n", "descending"), ("w1", "ascending"), ("w2", "ascending")]

    def local_topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows > k:
            batch = batch.sort_by(order).slice(0, k)
        return batch

    pruned = _global_bigram_counts(sf_dir).map_batches(
        local_topk, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    )
    df = pruned.to_pandas()  # <= num_blocks * k rows by construction
    df = df.sort_values(
        ["n", "w1", "w2"], ascending=[False, True, True], kind="mergesort"
    ).head(k)
    return {
        (a, b): int(n) for a, b, n in zip(df["w1"], df["w2"], df["n"])
    }


def lm_score(sf_dir: str, top_k: int = LM_TOP_K) -> ray.data.Dataset:
    """Count-based LM QUALITY PROXY (CCNet-style LM filtering, integer
    form): each document scores the sum of corpus-wide frequencies of
    its adjacent word bigrams — fluent in-distribution text rides the
    frequent-transition mass, gibberish and boilerplate-with-rare-joins
    score low per bigram. Integer sums keep the oracle compare exact
    (a log-prob variant is one vectorized transform away and float).

    Scale shape: pass 1 is the distributed bigram roll-up capped to the
    ``top_k`` heavy hitters (see LM_TOP_K — the broadcast is bounded,
    never the O(corpus) distinct-bigram table), broadcast ONCE via
    ``ray.put``; pass 2 streams documents and scores each against the
    dict — no shuffle on the big side. Bigrams outside the top-k score
    0 on both the engine and oracle side."""
    ensure_serializable()
    table = _top_bigrams(sf_dir, top_k)
    table_ref = ray.put(table)

    class Score:
        def __init__(self, ref):
            self._t = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            # adjacency over the flat word stream (bigram_counts' masked-
            # view trick), then ONE dict lookup per DISTINCT bigram in the
            # batch: words dictionary-encode to int codes (Arrow C++),
            # bigram codes pack into one int64, np.unique dedups them, and
            # only the unique pairs touch Python — token count no longer
            # bounds the Python work, vocabulary² does.
            words_list = pc.split_pattern(pc.fill_null(batch["text"], ""), " ")
            lengths = pc.list_value_length(words_list).to_numpy(
                zero_copy_only=False
            )
            flat = pc.dictionary_encode(
                pc.list_flatten(words_list).combine_chunks()
            )
            vocab = np.asarray(flat.dictionary.to_pylist(), dtype=object)
            codes = np.asarray(flat.indices, dtype=np.int64)
            total = len(codes)
            n = len(batch)
            out_n = np.maximum(lengths.astype(np.int64) - 1, 0)
            if total == 0 or not out_n.any():
                return pa.table(
                    {
                        "doc_id": pa.array([], pa.int64()),
                        "n_bigrams": pa.array([], pa.int64()),
                        "score": pa.array([], pa.int64()),
                    }
                )
            is_last = np.zeros(total, dtype=bool)
            ends = np.cumsum(lengths) - 1
            is_last[ends[lengths > 0]] = True
            first_idx = np.flatnonzero(~is_last)
            v = np.int64(len(vocab))
            pair_code = codes[first_idx] * v + codes[first_idx + 1]
            uniq, inv = np.unique(pair_code, return_inverse=True)
            t = self._t
            per_uniq = np.array(
                [t.get((vocab[c // v], vocab[c % v]), 0) for c in uniq],
                dtype=np.int64,
            )
            doc_idx = np.repeat(np.arange(n), out_n)
            scores = np.zeros(n, dtype=np.int64)
            np.add.at(scores, doc_idx, per_uniq[inv])
            keep = out_n > 0
            return pa.table(
                {
                    "doc_id": pc.cast(batch["doc_id"], pa.int64()).filter(
                        pa.array(keep)
                    ),
                    "n_bigrams": pa.array(out_n[keep]),
                    "score": pa.array(scores[keep]),
                }
            )

    from .._rayutil import pool_size

    return _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        Score,
        fn_constructor_args=(table_ref,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=pool_size(),
        num_cpus=1,
    )


# ---------------------------------------------------------------------------
# Gopher-style document quality rules (Rae et al. 2021, public heuristics)
# ---------------------------------------------------------------------------

GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WLEN = 3
GOPHER_MAX_MEAN_WLEN = 10
# The published rule uses the English closed-class set {the, be, to,
# of, and, that, have, with}; the fixture's synthetic vocabulary
# contains only "the"/"a"-family markers, so the corpus-adapted list
# below (same STOPWORDS the quality_score op uses) keeps the rule
# non-degenerate (64% of fixture docs satisfy it vs 0% with the
# published set). Swap the list for the published one on real text.
GOPHER_STOPWORDS = ["the", "and", "of", "a", "to", "in"]
GOPHER_MIN_STOPWORDS = 2
GOPHER_SYMBOLS = ["#", r"\.\.\."]  # symbol-to-word ratio <= 0.1


def gopher_rules(sf_dir: str) -> ray.data.Dataset:
    """Gopher-style quality gates per document, fully vectorized.

    Every rule is computed in EXACT integer arithmetic (cross-multiplied
    ratios — ``3 * n_words <= sum_word_len``, never a float division),
    so the Ray result hashes identically to the SQL oracle. Word
    semantics are pinned to DuckDB's ``string_split(text, ' ')``: split
    on every single space, empties included, hence
    ``n_words = count(' ') + 1`` and
    ``sum_word_len = length(text) - (n_words - 1)`` are exact
    identities shared by both engines. The line-based bullet/ellipsis
    rules of the published set are omitted: the corpus is single-line
    (no LF in any fixture document), which would make them
    tautologies rather than tested code."""

    def score(batch: pa.Table) -> pa.Table:
        cols = gopher_columns(batch["text"])
        return pa.table(
            {"doc_id": pc.cast(batch["doc_id"], pa.int64()), **cols}
        )

    return _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True
    )


def gopher_columns(text) -> dict:
    """The five Gopher gates as Arrow columns — ONE shared kernel used
    by both ``gopher_rules`` and the ``curate_documents`` funnel, per
    the parity-kernel discipline (SURVEY M8)."""
    n_words = pc.add(pc.count_substring(text, " "), 1)
    n_words64 = pc.cast(n_words, pa.int64())
    sum_wlen = pc.subtract(
        pc.cast(pc.utf8_length(text), pa.int64()),
        pc.subtract(n_words64, 1),
    )
    # words containing at least one ASCII letter (RE2, no lookahead)
    n_alpha = pc.cast(
        pc.count_substring_regex(text, r"(^| )[^ ]*[A-Za-z]"), pa.int64()
    )
    n_sym = None
    for s in GOPHER_SYMBOLS:
        c = pc.cast(pc.count_substring_regex(text, s), pa.int64())
        n_sym = c if n_sym is None else pc.add(n_sym, c)
    n_stop = None
    for w in GOPHER_STOPWORDS:
        present = pc.cast(
            pc.greater(pc.count_substring_regex(text, rf"\b{w}\b"), 0),
            pa.int64(),
        )
        n_stop = present if n_stop is None else pc.add(n_stop, present)

    i1 = lambda b: pc.cast(b, pa.int64())
    wc_ok = i1(
        pc.and_(
            pc.greater_equal(n_words64, GOPHER_MIN_WORDS),
            pc.less_equal(n_words64, GOPHER_MAX_WORDS),
        )
    )
    mwl_ok = i1(
        pc.and_(
            pc.less_equal(
                pc.multiply(pa.scalar(GOPHER_MIN_MEAN_WLEN), n_words64),
                sum_wlen,
            ),
            pc.less_equal(
                sum_wlen,
                pc.multiply(pa.scalar(GOPHER_MAX_MEAN_WLEN), n_words64),
            ),
        )
    )
    # >= 80% of words contain a letter: 5 * n_alpha >= 4 * n_words
    alpha_ok = i1(
        pc.greater_equal(
            pc.multiply(pa.scalar(5), n_alpha),
            pc.multiply(pa.scalar(4), n_words64),
        )
    )
    # symbol-to-word ratio <= 0.1: 10 * n_sym <= n_words
    sym_ok = i1(
        pc.less_equal(pc.multiply(pa.scalar(10), n_sym), n_words64)
    )
    stop_ok = i1(pc.greater_equal(n_stop, GOPHER_MIN_STOPWORDS))
    passes = i1(
        pc.equal(
            pc.add(pc.add(pc.add(pc.add(wc_ok, mwl_ok), alpha_ok), sym_ok),
                   stop_ok),
            5,
        )
    )
    return {
        "n_words": n_words64,
        "wc_ok": wc_ok,
        "mwl_ok": mwl_ok,
        "alpha_ok": alpha_ok,
        "sym_ok": sym_ok,
        "stop_ok": stop_ok,
        "gopher_pass": passes,
    }


# ---------------------------------------------------------------------------
# CCNet-style perplexity bucketing over the LM quality score
# ---------------------------------------------------------------------------

LM_BUCKETS = ("tail", "middle", "head")


def lm_score_buckets(sf_dir: str) -> ray.data.Dataset:
    """CCNet-style head/middle/tail split of the corpus by LM quality
    score — the published filtering recipe buckets documents by LM
    perplexity tertiles and trains on the head.

    Thresholds are EXACT order statistics (value at rank ceil(n/3) /
    ceil(2n/3) of the ascending score order), computed from a
    distributed per-score-value histogram: each batch pre-counts its
    scores, the global groupby sees |distinct scores| rows, and the
    driver cumsums that tiny table — no sort shuffle of the corpus, no
    float quantile interpolation (ties resolve identically on both
    engines because thresholds compare VALUES, not ranks). The score
    pass is ``lm_score`` materialized once (per-doc aggregate rows,
    not the corpus)."""
    from ray.data.aggregate import Sum as _Sum

    scored = lm_score(sf_dir).materialize()

    def hist_partial(batch: pa.Table) -> pa.Table:
        agg = (
            pa.table({"score": batch["score"]})
            .group_by(["score"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {"score": agg["score"], "n": pc.cast(agg["count_all"], pa.int64())}
        )

    hist = (
        scored.map_batches(hist_partial, batch_format="pyarrow",
                           zero_copy_batch=True)
        .groupby("score")
        .aggregate(_Sum("n", alias_name="n"))
        .to_pandas()  # |distinct scores| rows
        .sort_values("score")
    )
    counts = hist["n"].to_numpy()
    values = hist["score"].to_numpy()
    n = int(counts.sum())
    if n == 0:  # empty corpus: empty result with the NORMAL schema
        import pandas as pd

        return pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype=np.int64),
                "score": pd.Series([], dtype=np.int64),
                "bucket": pd.Series([], dtype=object),
            }
        )
    cum = np.cumsum(counts)
    # value at ascending rank ceil(n/3): first score whose cumulative
    # count reaches the rank (3*rank >= n <=> rank >= ceil(n/3))
    q1 = int(values[np.searchsorted(cum * 3, n)])
    q2 = int(values[np.searchsorted(cum * 3, 2 * n)])

    def assign(batch: pa.Table) -> pa.Table:
        s = batch["score"].to_numpy(zero_copy_only=False)
        bucket = np.where(s > q2, "head", np.where(s > q1, "middle", "tail"))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "score": batch["score"],
                "bucket": pa.array(bucket.tolist(), pa.string()),
            }
        )

    return scored.map_batches(assign, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# BM25-shaped retrieval in exact integer arithmetic
# ---------------------------------------------------------------------------

BM25_QUERY_TERMS = ("join", "merge", "window")
BM25_K = 10


def _word_stats(batch: pa.Table, terms) -> tuple:
    """Vectorized per-doc (dl, tf-per-term) via one split + flatten —
    word equality semantics identical to SQL ``word = term`` over
    ``string_split(text, ' ')`` (no regex boundary surprises)."""
    arr = batch["text"].combine_chunks() if isinstance(
        batch["text"], pa.ChunkedArray
    ) else batch["text"]
    words = pc.split_pattern(arr, " ")
    flat = words.flatten()
    offsets = words.offsets.to_numpy(zero_copy_only=False)
    doc_idx = np.repeat(
        np.arange(len(words)), offsets[1:] - offsets[:-1]
    )
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    dl = np.zeros(len(words), dtype=np.int64)
    np.add.at(dl, doc_idx, nonempty.astype(np.int64))
    tfs = []
    for t in terms:
        m = pc.equal(flat, t).to_numpy(zero_copy_only=False)
        tf = np.zeros(len(words), dtype=np.int64)
        np.add.at(tf, doc_idx, m.astype(np.int64))
        tfs.append(tf)
    return dl, tfs


def bm25_topk(sf_dir: str, k: int = BM25_K) -> "pd.DataFrame":
    """Top-k documents for a fixed query under a BM25-SHAPED score in
    EXACT integers: with k1 = 6/5 and b = 3/4, the per-term saturation
    tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl)) cross-multiplies by 20*L
    (L = corpus word count, avgdl = L/N) into
    44*L*tf / (20*L*tf + 6*L + 18*dl*N), and the idf is the same
    linear 1/df the tf-idf operator uses — every division is a single
    floor division of exact int64 products, bit-identical to the SQL
    oracle. (Log-idf BM25 is one transform away but float.)

    Scale shape: two streaming passes over documents (corpus stats,
    then scoring) with per-batch partial top-k; no shuffle except the
    final k-row sort. Query terms and corpus stats broadcast by value
    (a handful of ints)."""
    ensure_serializable()
    import pandas as pd

    terms = list(BM25_QUERY_TERMS)

    def stats_partial(batch: pa.Table) -> pa.Table:
        dl, tfs = _word_stats(batch, terms)
        row = {
            "n_docs": pa.array([len(dl)], pa.int64()),
            "sum_dl": pa.array([int(dl.sum())], pa.int64()),
        }
        for t, tf in zip(terms, tfs):
            row[f"df_{t}"] = pa.array([int((tf > 0).sum())], pa.int64())
        return pa.table(row)

    ds = _read_documents(sf_dir, ["doc_id", "text"])
    stats = ds.map_batches(
        stats_partial, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()  # one row per batch
    n_corpus = int(stats["n_docs"].sum())
    big_l = int(stats["sum_dl"].sum())
    df = {t: int(stats[f"df_{t}"].sum()) for t in terms}

    def score_partial(batch: pa.Table) -> pa.Table:
        dl, tfs = _word_stats(batch, terms)
        if dl.size == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "score_e9": pa.array([], pa.int64())}
            )
        score = np.zeros(len(dl), dtype=np.int64)
        # keep = "contains any query term" (NOT score > 0): the SQL
        # oracle's tf-join keeps a doc even when its score floors to 0
        keep = np.zeros(len(dl), dtype=bool)
        for t, tf in zip(terms, tfs):
            if df[t] == 0:
                continue
            keep |= tf > 0
            # Exact ARBITRARY-PRECISION scoring: 44*L*tf*1e9 exceeds
            # int64 once L*tf passes ~2.1e8 (numpy would wrap silently),
            # so the per-term score is computed with Python big ints on
            # the DISTINCT (tf, dl) combos of the batch (bounded by the
            # tf x dl value range, not the row count) and scattered
            # back; the oracle runs the same formula in HUGEINT.
            packed = tf.astype(np.int64) * (dl.max() + 1) + dl
            uniq, inv = np.unique(packed, return_inverse=True)
            base = int(dl.max() + 1)
            per_uniq = np.array(
                [
                    (44 * big_l * int(u // base) * 1_000_000_000)
                    // max(
                        (20 * big_l * int(u // base) + 6 * big_l
                         + 18 * int(u % base) * n_corpus) * df[t],
                        1,
                    )
                    if (u // base) > 0 else 0
                    for u in uniq
                ],
                dtype=np.int64,
            )
            score += per_uniq[inv]
        doc_id = pc.cast(batch["doc_id"], pa.int64()).to_numpy(
            zero_copy_only=False
        )[keep]
        sc = score[keep]
        if sc.size > k:  # partial top-k inside the batch
            order = np.lexsort((doc_id, -sc))[:k]
            doc_id, sc = doc_id[order], sc[order]
        return pa.table(
            {"doc_id": pa.array(doc_id), "score_e9": pa.array(sc)}
        )

    partials = ds.map_batches(
        score_partial, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()  # <= k rows per batch
    partials = partials.sort_values(
        ["score_e9", "doc_id"], ascending=[False, True]
    ).head(k).reset_index(drop=True)
    partials["rank"] = np.arange(1, len(partials) + 1, dtype=np.int64)
    return pd.DataFrame(
        {
            "doc_id": partials["doc_id"].astype(np.int64),
            "score_e9": partials["score_e9"].astype(np.int64),
            "rank": partials["rank"],
        }
    )


# ---------------------------------------------------------------------------
# End-to-end curation funnel: quality gates -> lang filter -> exact dedup
# ---------------------------------------------------------------------------

CURATE_LANG = "en"


def curate_documents(sf_dir: str) -> ray.data.Dataset:
    """The full curation funnel as ONE streaming plan — the composition
    a training-data pipeline actually runs: Gopher quality gates AND a
    language filter applied per batch (rows drop before any shuffle),
    then exact dedup keeping the lowest doc_id per distinct text via
    the hash-only shuffle + NATIVE Min/Count aggregate (the dedup_exact
    discipline: the shuffle moves (h1, h2, doc_id, n_words) integer
    rows, never text; no per-group Python).

    Output: one row per surviving distinct text —
    (doc_id, n_words, n_dups)."""
    from ray.data.aggregate import Count, Min

    from .dedup import text_hash128

    def gate(batch: pa.Table) -> pa.Table:
        cols = gopher_columns(batch["text"])
        keep = pc.and_(
            pc.equal(cols["gopher_pass"], 1),
            pc.equal(batch["lang"], CURATE_LANG),
        )
        t = batch.append_column("n_words", cols["n_words"]).filter(keep)
        if t.num_rows == 0:
            return pa.table(
                {"h1": pa.array([], pa.int64()), "h2": pa.array([], pa.int64()),
                 "doc_id": pa.array([], pa.int64()),
                 "n_words": pa.array([], pa.int64())}
            )
        h1, h2 = text_hash128(t["text"], "engine-curate-k")
        return pa.table(
            {
                "h1": pa.array(h1),
                "h2": pa.array(h2),
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "n_words": t["n_words"],
            }
        )

    ds = _read_documents(sf_dir, ["doc_id", "text", "lang"])
    gated = ds.map_batches(gate, batch_format="pyarrow", zero_copy_batch=True)
    agg = gated.groupby(["h1", "h2"]).aggregate(
        Min("doc_id", alias_name="doc_id"),
        # n_words is a function of the text, hence constant per group
        Min("n_words", alias_name="n_words"),
        Count(alias_name="n_dups"),
    )
    return agg.select_columns(["doc_id", "n_words", "n_dups"])


# ---------------------------------------------------------------------------
# training-sequence packing (global ordered prefix-scan)
# ---------------------------------------------------------------------------

PACK_SEQ_LEN = 2048
PACK_SPAN = 256  # contiguous doc_ids per scan bucket (see pack_sequences)


def pack_sequences(
    sf_dir: str, seq_len: int = PACK_SEQ_LEN, span: int = PACK_SPAN
) -> ray.data.Dataset:
    """GPT-style sequence PACKING: concatenate documents in doc_id order
    and slice the token stream into fixed ``seq_len`` windows — each doc
    gets its global token start offset, the id of the training sequence
    its first token lands in (``seq_id``) and the offset within it
    (``seq_offset``). Long docs simply span sequences; their start
    coordinates stay exact.

    This is the engine's GLOBAL ordered prefix-scan primitive — done
    WITHOUT a global sort: doc_ids bucket by CONTIGUOUS range
    (``doc_id // span``), so bucket order IS document order. The regex
    tokenizer (the dominant cost) runs ONCE: the per-doc int table
    (_sb, doc_id, n_tokens — ~24 B/doc, spillable) is materialized and
    feeds both passes. Pass 1 reduces each bucket to one token-total
    row (per-batch ``bincount`` combiner, then a native Sum groupby);
    the driver exclusive-cumsums the ~(max_doc_id / span) bucket totals
    — the only driver-side state, 16 B per bucket; size ``span`` so
    that stays small — and broadcasts the offset table via ``ray.put``.
    Pass 2 re-buckets the per-doc counts and adds the in-bucket cumsum
    to the bucket's base offset. Both shuffles move int64 rows only;
    text never leaves pass-1 batches."""
    ds = _read_documents(sf_dir, ["doc_id", "text"])

    def doc_tokens(batch: pa.Table) -> pa.Table:
        doc_id = batch["doc_id"].to_numpy(zero_copy_only=False)
        n_tok = pc.cast(
            pc.count_substring_regex(
                pc.fill_null(batch["text"], ""), TOKEN_PATTERN
            ),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "_sb": pa.array((doc_id // span).astype(np.int64)),
                "doc_id": pa.array(doc_id),
                "n_tokens": pa.array(n_tok),
            }
        )

    # tokenize ONCE; both scan passes read the materialized int table
    tok = ds.map_batches(
        doc_tokens, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    scanned, _total = _prefix_scan(tok, "n_tokens")

    def windows(batch: pa.Table) -> pa.Table:
        start = batch["start"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": batch["n_tokens"],
                "seq_id": pa.array(start // seq_len),
                "seq_offset": pa.array(start % seq_len),
            }
        )

    return scanned.map_batches(windows, batch_format="pyarrow", zero_copy_batch=True)


def _prefix_scan(tok: ray.data.Dataset, weight_col: str):
    """Distributed EXACT exclusive prefix scan over doc_id order: input
    rows (_sb, doc_id, <weight_col>) where ``_sb = doc_id // span`` is a
    CONTIGUOUS-range bucket (bucket order IS doc order); output adds
    ``start`` = sum of weights of all earlier doc_ids. Pass 1 reduces
    each bucket to one weight-total row (per-batch ``bincount`` combiner
    — float64 weights exact below 2^53 per batch — then a native int64
    Sum); the driver exclusive-cumsums the tiny bucket table (16 B per
    bucket) and ``ray.put``s it; pass 2 adds in-bucket cumsums to the
    bucket base. Returns (dataset, exact total weight)."""
    from ray.data.aggregate import Sum

    def bucket_partials(t: pa.Table) -> pa.Table:
        sb = t["_sb"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(sb, return_inverse=True)
        sums = np.bincount(inv, weights=t[weight_col].to_numpy(zero_copy_only=False))
        return pa.table(
            {"_sb": pa.array(uniq), "w": pa.array(sums.astype(np.int64))}
        )

    totals = (
        tok.map_batches(bucket_partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_sb")
        .aggregate(Sum("w", alias_name="w"))
        .to_pandas()
        .sort_values("_sb")
    )
    w = totals["w"].to_numpy().astype(np.int64)
    total = int(w.sum())
    bucket_ids = totals["_sb"].to_numpy().astype(np.int64)
    base = np.concatenate([[0], np.cumsum(w)[:-1]]).astype(np.int64)
    offsets_ref = ray.put((bucket_ids, base))

    def scan_bucket(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return group.schema.empty_table().append_column(
                "start", pa.array([], pa.int64())
            )
        _ids, _base = ray.get(offsets_ref)  # local object-store, zero-copy
        t = group.sort_by([("doc_id", "ascending")])
        sb = int(t["_sb"][0].as_py())
        pos = int(np.searchsorted(_ids, sb))
        if pos >= len(_ids) or _ids[pos] != sb:  # loud: pass-1/pass-2 drift
            raise ValueError(f"_prefix_scan: bucket {sb} missing from scan base")
        wv = t[weight_col].to_numpy(zero_copy_only=False)
        start = _base[pos] + np.concatenate([[0], np.cumsum(wv)[:-1]]).astype(
            np.int64
        )
        return t.append_column("start", pa.array(start))

    scanned = tok.groupby("_sb").map_groups(scan_bucket, batch_format="pyarrow")
    return scanned, total


# ---------------------------------------------------------------------------
# RAG-style overlapping document chunking
# ---------------------------------------------------------------------------

CHUNK_TOKENS = 64   # window size W
CHUNK_STRIDE = 48   # stride S (overlap = W - S = 16 tokens)


def chunk_documents(
    sf_dir: str, window: int = CHUNK_TOKENS, stride: int = CHUNK_STRIDE
) -> ray.data.Dataset:
    """Sliding-window CHUNKING for retrieval / embedding prep: each doc
    tokenizes (ASCII ``\\S+``) and emits chunks at starts ``k*stride``,
    stopping at the FIRST window that reaches the end of the doc (the
    standard chunker rule — no chunk is ever a strict suffix of its
    predecessor, so a RAG index gets no duplicate-content tail chunks).
    Chunk text = tokens ``[k*stride, k*stride+window)`` joined by single
    spaces (the detokenized form both engine and oracle define
    identically). Overlapping windows (stride < window, enforced) give
    every token ~window/stride chances to land mid-chunk; docs shorter
    than one window emit one chunk; empty docs emit nothing.

    Physical shape: a pure 1->N flat map — NO shuffle; chunk text is
    assembled inside an actor pool whose ``__init__`` compiles the
    tokenizer once. Per-doc Python here is output-bound (each chunk's
    string must be built regardless), the same rationale as
    ``user_journeys``."""
    from .._rayutil import pool_size

    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")
    if stride > window:
        # tokens between windows would silently land in NO chunk
        raise ValueError("stride must be <= window (gapless coverage)")
    ds = _read_documents(sf_dir, ["doc_id", "text"])

    class Chunker:
        def __init__(self):
            self._tok = re.compile(TOKEN_PATTERN, re.ASCII)

        def __call__(self, batch: pa.Table) -> pa.Table:
            out_doc, out_idx, out_text, out_n = [], [], [], []
            doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            for did, text in zip(doc_ids, batch["text"].to_pylist()):
                toks = self._tok.findall(text or "")
                n = len(toks)
                if n == 0:
                    continue
                n_chunks = (
                    1 if n <= window else (n - window + stride - 1) // stride + 1
                )
                for k in range(n_chunks):
                    piece = toks[k * stride : k * stride + window]
                    out_doc.append(did)
                    out_idx.append(k)
                    out_text.append(" ".join(piece))
                    out_n.append(len(piece))
            return pa.table(
                {
                    "doc_id": pa.array(np.asarray(out_doc, dtype=np.int64)),
                    "chunk_idx": pa.array(np.asarray(out_idx, dtype=np.int64)),
                    "chunk_text": pa.array(out_text, pa.string()),
                    "n_chunk_tokens": pa.array(np.asarray(out_n, dtype=np.int64)),
                }
            )

    return ds.map_batches(
        Chunker,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=pool_size(),
        num_cpus=1,
    )


# ---------------------------------------------------------------------------
# domain-mixing weights
# ---------------------------------------------------------------------------


def source_mix_weights(sf_dir: str):
    """DOMAIN MIXING: temperature-scaled (alpha = 0.5) sampling weights
    per source — w_s = sqrt(n_s) / sum(sqrt(n_s')) — the exponentiated
    smoothing used to up-weight small domains in multilingual / multi-
    source training mixes.

    Exactness discipline: sqrt quantizes to int64 micro-units FIRST
    (one IEEE sqrt + one pinned-mode round on each side), the sum runs
    over exact integers (order-free), and the final weight is a single
    identical float division + round on both sides — no cross-source
    float accumulation whose order could differ from the oracle's.

    Physical shape: per-batch count partials -> one tiny groupby; the
    result is bounded by the source domain (|sources| rows), so the
    weight arithmetic runs on the driver like ``stage_totals``."""
    from ray.data.aggregate import Sum

    ds = _read_documents(sf_dir, ["doc_id", "source"])

    def partial(batch: pa.Table) -> pa.Table:
        # NULL sources form their own group like SQL's GROUP BY: Ray's
        # groupby can't sort a null string key, so the key travels as
        # (fill_null(''), is_null) and count(*) parity uses count_all
        src = batch["source"]
        t = pa.table(
            {
                "source": pc.fill_null(src, ""),
                "_nul": pc.cast(pc.is_null(src), pa.int8()),
            }
        )
        g = t.group_by(["source", "_nul"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "source": g["source"],
                "_nul": g["_nul"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    counts = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["source", "_nul"])
        .aggregate(Sum("n", alias_name="n_docs"))
        .to_pandas()
    )
    import pandas as pd

    if counts.empty:  # empty corpus -> empty result, like the oracle
        return pd.DataFrame(
            {
                "source": pd.Series([], dtype=object),
                "n_docs": pd.Series([], dtype=np.int64),
                "sqrt_e6": pd.Series([], dtype=np.int64),
                "weight_e6": pd.Series([], dtype=np.int64),
            }
        )
    counts.loc[counts["_nul"] == 1, "source"] = None
    counts = counts.sort_values("source").reset_index(drop=True)
    n = pa.array(counts["n_docs"].to_numpy().astype(np.int64))
    sqrt_e6 = pc.cast(
        pc.round(
            pc.multiply(pc.sqrt(pc.cast(n, pa.float64())), 1e6),
            ndigits=0,
            round_mode="half_towards_infinity",
        ),
        pa.int64(),
    )
    total = pc.sum(sqrt_e6).as_py()  # exact int64 sum, order-free
    weight_e6 = pc.cast(
        pc.round(
            pc.divide(pc.multiply(pc.cast(sqrt_e6, pa.float64()), 1e6), float(total)),
            ndigits=0,
            round_mode="half_towards_infinity",
        ),
        pa.int64(),
    )
    return pd.DataFrame(
        {
            "source": counts["source"],
            "n_docs": counts["n_docs"].astype(np.int64),
            "sqrt_e6": sqrt_e6.to_numpy(),
            "weight_e6": weight_e6.to_numpy(),
        }
    )


# ---------------------------------------------------------------------------
# inverted index (retrieval artifact)
# ---------------------------------------------------------------------------


def inverted_index(sf_dir: str, num_buckets: int | None = None) -> ray.data.Dataset:
    """INVERTED INDEX construction: term -> (document frequency, posting
    list of doc_ids in ascending order, '|'-joined) — the retrieval
    artifact behind BM25/boolean search, materialized as a table.
    Tokenization is the same literal single-space split as
    ``word_counts`` (identical on both engines), empties dropped.

    Scale shape: per-batch DISTINCT (term, doc_id) pairs (an empty
    pyarrow group_by — the combiner discipline), ONE hash(term) bucket
    shuffle, then per bucket: one sort, cross-batch re-dedup via run
    detection, and posting strings assembled by ListArray offsets +
    ``pc.binary_join`` — no per-term Python. A corpus-scale deployment
    caps df (stopword terms would each produce one posting row of every
    doc_id — the same hot-key trade documented at dedup_jaccard's
    df-cap); uncapped here for oracle parity."""
    from pandas.util import hash_array

    from ..pipeline import default_num_buckets
    from .dedup import _run_starts  # driver-time import: the UDF closure
    # must capture the symbol (a worker-side relative import would fail
    # under serialize-by-value)

    if num_buckets is None:
        num_buckets = default_num_buckets()

    def pairs(batch: pa.Table) -> pa.Table:
        lists = pc.split_pattern(pc.fill_null(batch["text"], ""), " ")
        flat = pc.list_flatten(lists).combine_chunks()
        parent = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
        doc = batch["doc_id"].to_numpy(zero_copy_only=False)[parent]
        keep = pc.not_equal(flat, "")
        t = pa.table(
            {"term": flat.filter(keep), "doc_id": pa.array(doc).filter(keep)}
        )
        g = t.group_by(["term", "doc_id"]).aggregate([])  # batch-local distinct
        term_np = np.asarray(g["term"].to_pylist(), dtype=object)
        bucket = (hash_array(term_np) % num_buckets).astype(np.int32)
        return pa.table(
            {
                "_tb": pa.array(bucket),
                "term": g["term"],
                "doc_id": g["doc_id"],
            }
        )

    def index_bucket(group: pa.Table) -> pa.Table:
        t = group.sort_by(
            [("term", "ascending"), ("doc_id", "ascending")]
        ).combine_chunks()
        n = t.num_rows
        if n == 0:
            return pa.table(
                {
                    "term": pa.array([], pa.string()),
                    "df": pa.array([], pa.int64()),
                    "postings": pa.array([], pa.string()),
                }
            )
        term = np.asarray(t["term"].to_pylist(), dtype=object)
        doc = t["doc_id"].to_numpy(zero_copy_only=False)
        first = _run_starts(term, doc)  # defensive cross-batch distinct
        t = t.filter(pa.array(first))
        term = term[first]
        doc = doc[first]
        m = len(term)
        new_term = np.zeros(m, dtype=bool)
        new_term[0] = True
        new_term[1:] = term[1:] != term[:-1]
        starts = np.flatnonzero(new_term)
        df = np.diff(np.append(starts, m)).astype(np.int64)
        doc_str = pc.cast(t["doc_id"], pa.string()).combine_chunks()
        offsets = pa.array(np.append(starts, m).astype(np.int64))
        la = pa.LargeListArray.from_arrays(offsets, doc_str)
        return pa.table(
            {
                "term": pa.array(term[starts], pa.string()),
                "df": pa.array(df),
                "postings": pc.binary_join(la, "|"),
            }
        )

    ds = _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        pairs, batch_format="pyarrow", zero_copy_batch=True
    )
    return ds.groupby("_tb").map_groups(
        lambda g: index_bucket(g.drop_columns(["_tb"])), batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# fill-in-the-middle example construction
# ---------------------------------------------------------------------------

FIM_PRE, FIM_SUF, FIM_MID = "<PRE>", "<SUF>", "<MID>"
_FIM_M1, _FIM_A1 = 100_003, 40_503   # split-point mixers; doc_id reduced
_FIM_M2, _FIM_A2 = 99_991, 69_069    # mod first so products stay < 2^63


def fim_examples(sf_dir: str) -> ray.data.Dataset:
    """FILL-IN-THE-MIDDLE example construction (the code-model
    pretraining transform): each document splits at two deterministic
    char offsets into (prefix, middle, suffix) and re-serializes in PSM
    order — ``<PRE>prefix<SUF>suffix<MID>middle`` — so the model learns
    to infill. Split points derive from pure doc_id modular arithmetic
    (no RNG in the data path, O4 determinism): both mixers reduce
    doc_id mod a prime FIRST so every product stays far below 2^63 —
    numpy would wrap silently and DuckDB would error where they differ.

    Physical shape: embarrassingly parallel stateless map over pruned
    (doc_id, text); per-row Python is output-bound (three slices + one
    concat per example), same rationale as ``chunk_documents``."""
    ds = _read_documents(sf_dir, ["doc_id", "text"])

    def build(batch: pa.Table) -> pa.Table:
        doc_id = batch["doc_id"].to_numpy(zero_copy_only=False)
        texts = batch["text"].to_pylist()
        pre, mid, suf, fim = [], [], [], []
        for did, text in zip(doc_id, texts):
            t = text or ""
            n = len(t)
            a = (int(did) % _FIM_M1) * _FIM_A1 % (n + 1)
            b = a + (int(did) % _FIM_M2) * _FIM_A2 % (n - a + 1)
            p, m, s = t[:a], t[a:b], t[b:]
            pre.append(p)
            mid.append(m)
            suf.append(s)
            fim.append(f"{FIM_PRE}{p}{FIM_SUF}{s}{FIM_MID}{m}")
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "prefix": pa.array(pre, pa.string()),
                "middle": pa.array(mid, pa.string()),
                "suffix": pa.array(suf, pa.string()),
                "fim_text": pa.array(fim, pa.string()),
            }
        )

    return ds.map_batches(build, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# deterministic negative sampling (contrastive pairs)
# ---------------------------------------------------------------------------

CONTRASTIVE_SHIFT_FRAC = 2  # negative = doc at rank (r + N//2) mod N


def contrastive_pairs(sf_dir: str, span: int = PACK_SPAN) -> ray.data.Dataset:
    """NEGATIVE SAMPLING for contrastive training: each document pairs
    with the document halfway across the corpus in doc_id-rank order —
    negative_rank = (rank + N // CONTRASTIVE_SHIFT_FRAC) mod N — a
    deterministic, collision-free derangement (for N > 1) standing in
    for random negative mining (O4: no RNG in the data path; resumed
    runs re-derive identical pairs).

    Physical shape: ranks come from the shared ``_prefix_scan`` (weight
    1 per doc — the same contiguous-bucket scan as ``pack_sequences``);
    the int-only rank table MATERIALIZES once (Ray re-executes lineage
    per consumer, and three consumers read it), then the rank->rank
    self-join co-locates by hash(rank) buckets and matches with one
    vectorized searchsorted per bucket. Every shuffle row is int64;
    text never moves."""
    ds = _read_documents(sf_dir, ["doc_id"])

    def ones(batch: pa.Table) -> pa.Table:
        doc_id = batch["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "_sb": pa.array((doc_id // span).astype(np.int64)),
                "doc_id": pa.array(doc_id),
                "one": pa.array(np.ones(len(doc_id), dtype=np.int64)),
            }
        )

    tok = ds.map_batches(
        ones, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    ranked, total = _prefix_scan(tok, "one")
    if total == 0:
        import pandas as pd

        return pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype=np.int64),
                "neg_doc_id": pd.Series([], dtype=np.int64),
            }
        )
    ranked = ranked.materialize()  # read by both union branches
    shift = max(1, total // CONTRASTIVE_SHIFT_FRAC)
    nb = max(1, total // max(span, 1))

    def tag_anchor(batch: pa.Table) -> pa.Table:
        rank = batch["start"].to_numpy(zero_copy_only=False)
        want = (rank + shift) % total
        return pa.table(
            {
                "_rb": pa.array((want % nb).astype(np.int32)),
                "rank": pa.array(want),
                "doc_id": batch["doc_id"],
                "is_anchor": pa.array(np.ones(len(rank), dtype=np.int8)),
            }
        )

    def tag_member(batch: pa.Table) -> pa.Table:
        rank = batch["start"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "_rb": pa.array((rank % nb).astype(np.int32)),
                "rank": pa.array(rank),
                "doc_id": batch["doc_id"],
                "is_anchor": pa.array(np.zeros(len(rank), dtype=np.int8)),
            }
        )

    tagged = ranked.map_batches(
        tag_anchor, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        ranked.map_batches(tag_member, batch_format="pyarrow", zero_copy_batch=True)
    )

    def join_bucket(group: pa.Table) -> pa.Table:
        t = group.combine_chunks()
        anchor = t["is_anchor"].to_numpy(zero_copy_only=False) == 1
        a_rank = t["rank"].to_numpy(zero_copy_only=False)[anchor]
        a_doc = t["doc_id"].to_numpy(zero_copy_only=False)[anchor]
        m_rank = t["rank"].to_numpy(zero_copy_only=False)[~anchor]
        m_doc = t["doc_id"].to_numpy(zero_copy_only=False)[~anchor]
        order = np.argsort(m_rank)
        m_rank, m_doc = m_rank[order], m_doc[order]
        pos = np.searchsorted(m_rank, a_rank)
        if len(a_rank) and (
            pos.max(initial=0) >= len(m_rank)
            or not np.array_equal(m_rank[pos], a_rank)
        ):  # every wanted rank must exist exactly once in its bucket
            raise ValueError("contrastive_pairs: rank join missed a member")
        return pa.table(
            {
                "doc_id": pa.array(a_doc),
                "neg_doc_id": pa.array(m_doc[pos] if len(a_rank) else m_doc[:0]),
            }
        )

    return tagged.groupby("_rb").map_groups(
        lambda g: join_bucket(g.drop_columns(["_rb"])), batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# mixture-weighted corpus sampling
# ---------------------------------------------------------------------------


MIX_TARGET_DIV = 4  # sample the corpus down to ~1/4 its size


def mixture_sample(sf_dir: str) -> ray.data.Dataset:
    """Apply the alpha=0.5 domain-mixing weights as the
    temperature-sampling step a training mix runs after
    ``source_mix_weights``: downsample the corpus to ~1/MIX_TARGET_DIV
    with EXPECTED per-source counts proportional to the mix weights —
    keep a doc iff ``hash(doc_id) % 1e6 < thr_s`` where
    ``thr_s = min(1e6, (n_total // MIX_TARGET_DIV) * weight_e6_s //
    n_docs_s)`` (small domains keep a LARGER fraction; a domain whose
    target exceeds its size caps at keep-everything). Thresholds are
    all-integer (exact Python ints on the driver, exact HUGEINT in the
    oracle); the hash itself shares ``sample_events``' documented
    domain — exact for doc_id < ~3.4e9, beyond which numpy wraps where
    DuckDB errors. Deterministic in doc_id, so a resumed partition
    keeps the identical sample. Docs whose source is NULL drop (SQL
    inner-join-on-equality semantics).

    Physical shape: phase 1 is the bounded source-weight aggregate
    (driver-side, |sources| rows); phase 2 is a stateless fully
    vectorized filter per batch — ``pc.index_in`` against the tiny
    source list + ``np.take`` on the threshold array — and the big
    side never shuffles (rule 11)."""
    from .sketches import _sample_hash

    weights = source_mix_weights(sf_dir)
    n_total = int(weights["n_docs"].sum())
    target = n_total // MIX_TARGET_DIV
    known = weights[weights["source"].notna()]
    src_list = pa.array(list(known["source"]), pa.string())
    thr_arr = np.array(
        [
            min(1_000_000, target * int(w) // int(n))
            for w, n in zip(known["weight_e6"], known["n_docs"])
        ],
        dtype=np.int64,
    )

    ds = _read_documents(sf_dir, ["doc_id", "source"])

    def keep_weighted(batch: pa.Table) -> pa.Table:
        doc_id = batch["doc_id"].to_numpy(zero_copy_only=False)
        idx = pc.index_in(batch["source"], value_set=src_list)
        hit = pc.is_valid(idx).to_numpy(zero_copy_only=False)
        iv = pc.fill_null(idx, 0).to_numpy(zero_copy_only=False).astype(np.int64)
        thr = np.where(hit, thr_arr[iv] if len(thr_arr) else 0, -1)
        keep = hit & ((_sample_hash(doc_id) % 1_000_000) < thr)
        out = batch.filter(pa.array(keep))
        return pa.table(
            {
                "doc_id": out["doc_id"],
                "source": out["source"],
                "thr_e6": pa.array(thr[keep].astype(np.int64)),
            }
        )

    return ds.map_batches(
        keep_weighted, batch_format="pyarrow", zero_copy_batch=True
    )


# ---------------------------------------------------------------------------
# BPE merge training (iterative distributed pair counting)
# ---------------------------------------------------------------------------

BPE_MERGES = 8
BPE_EOW = "</w>"


def _bpe_apply(syms: list, merges) -> list:
    """Apply learned merges in rank order, greedy left-to-right within
    each rank — the canonical BPE application rule (Sennrich et al.
    2016). Pure and shared by every pair-count pass; the independent
    test reference implements its own copy."""
    for a, b in merges:
        out = []
        i = 0
        n = len(syms)
        while i < n:
            if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_train(sf_dir: str, n_merges: int = BPE_MERGES) -> pa.Table:
    """Learn the top-``n_merges`` BPE merges over documents.text ->
    (merge_rank, left, right, pair_count). Tokenization: single-space
    words, each word = its characters + one {BPE_EOW} end symbol.
    Tiebreak: highest count, then lexicographically smallest (left,
    right) — a strict total order, so the learned merge list is
    bit-identical at any parallelism (exact int64 counts).

    Scale shape — the standard two-level BPE trainer layout: the CORPUS
    is touched exactly once (word-count partials -> one vocabulary-
    bounded groupby); every training iteration then runs over the
    materialized DISTINCT-WORD table (cost scales with vocabulary x
    word length, never tokens). Per iteration: re-tokenize each word
    from scratch under the broadcast merge list (ray.put, fetched once
    per batch), count adjacent pairs x word frequency into per-batch
    partials, ONE pair-keyed groupby Sum, per-block argmax rows, and a
    driver reduce over <= num_blocks candidates (the kmeans partials
    pattern — the corpus never reaches the driver). Re-tokenizing from
    scratch each pass keeps the plan O(K) passes over the word table
    instead of a K-deep lazy chain that re-executes earlier passes.

    No SQL oracle (iterative argmax + re-tokenization is not
    practically SQL-expressible): rows-only in the driver gate, exact
    merge-list parity vs an independent pure-Python reference in
    pytest."""
    from ray.data.aggregate import Sum

    ensure_serializable()

    def word_partial(batch: pa.Table) -> pa.Table:
        words = pc.list_flatten(
            pc.split_pattern(pc.fill_null(batch["text"], ""), " ")
        )
        t = pa.table({"word": words})
        t = t.filter(pc.not_equal(t["word"], ""))
        agg = t.group_by(["word"]).aggregate([([], "count_all")])
        return pa.table(
            {"word": agg["word"], "n": pc.cast(agg["count_all"], pa.int64())}
        )

    words = (
        _read_documents(sf_dir, ["text"])
        .map_batches(word_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("word")
        .aggregate(Sum("n", alias_name="n"))
        .materialize()
    )

    def make_pair_partial(mref):
        def pair_partial(batch: pa.Table) -> pa.Table:
            merges = ray.get(mref)
            wlist = batch["word"].to_pylist()
            ns = batch["n"].to_numpy(zero_copy_only=False)
            counts: dict = {}
            for w, n in zip(wlist, ns):
                syms = _bpe_apply(list(w) + [BPE_EOW], merges)
                for a, b in zip(syms, syms[1:]):
                    counts[(a, b)] = counts.get((a, b), 0) + int(n)
            items = list(counts.items())
            return pa.table(
                {
                    "left": pa.array([k[0] for k, _ in items], pa.string()),
                    "right": pa.array([k[1] for k, _ in items], pa.string()),
                    "n": pa.array([v for _, v in items], pa.int64()),
                }
            )

        return pair_partial

    def block_argmax(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        n = batch["pair_count"].to_numpy(zero_copy_only=False)
        best = None
        left = batch["left"].to_pylist()
        right = batch["right"].to_pylist()
        for i in range(len(n)):
            key = (-int(n[i]), left[i], right[i])
            if best is None or key < best:
                best = key
        return pa.table(
            {
                "left": pa.array([best[1]], pa.string()),
                "right": pa.array([best[2]], pa.string()),
                "pair_count": pa.array([-best[0]], pa.int64()),
            }
        )

    merges: list = []
    merge_counts: list = []
    for _ in range(n_merges):
        mref = ray.put(tuple(merges))
        agg = (
            words.map_batches(
                make_pair_partial(mref), batch_format="pyarrow", zero_copy_batch=True
            )
            .groupby(["left", "right"])
            .aggregate(Sum("n", alias_name="pair_count"))
        )
        candidates = agg.map_batches(
            block_argmax, batch_format="pyarrow", zero_copy_batch=True
        ).take_all()
        if not candidates:
            break
        best = min(
            candidates, key=lambda r: (-r["pair_count"], r["left"], r["right"])
        )
        merges.append((best["left"], best["right"]))
        merge_counts.append(int(best["pair_count"]))
    return pa.table(
        {
            "merge_rank": pa.array(range(len(merges)), pa.int64()),
            "left": pa.array([a for a, _ in merges], pa.string()),
            "right": pa.array([b for _, b in merges], pa.string()),
            "pair_count": pa.array(merge_counts, pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# compression-ratio repetition signal
# ---------------------------------------------------------------------------

ZRATIO_LEVEL = 6


def compression_ratio(sf_dir: str) -> ray.data.Dataset:
    """Per-document zlib compression ratio -> (doc_id, raw_bytes,
    compressed_bytes, ratio_micro). The compressibility signal
    Gopher/RefinedWeb-class curation uses alongside explicit repetition
    rules (engine.ops.textstats.doc_repetition): templated or repeated
    text compresses far below natural prose, so a low ratio flags
    boilerplate the n-gram rules miss.

    ratio_micro = compressed*1e6 // raw in exact int64 micro-units (the
    repo-wide no-float-accumulation discipline). Per-row zlib.compress
    is one C call per document — the same inherent-per-row shape as
    doc_fingerprint's md5 — in an embarrassingly parallel map, no
    shuffle. Rows-only in the gate (no zlib in DuckDB): pytest pins
    exact parity with a local zlib replay, the repetitive<natural
    ordering, and the deterministic-level contract (level pinned at
    {ZRATIO_LEVEL}; zlib output is stable for a fixed level + library,
    the documented determinism assumption)."""
    import zlib

    def ratio(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        raw = np.empty(len(texts), dtype=np.int64)
        comp = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            b = (t or "").encode()
            raw[i] = len(b)
            comp[i] = len(zlib.compress(b, ZRATIO_LEVEL))
        ratio_micro = np.where(raw > 0, comp * 1_000_000 // np.maximum(raw, 1), -1)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "raw_bytes": pa.array(raw),
                "compressed_bytes": pa.array(comp),
                "ratio_micro": pa.array(ratio_micro.astype(np.int64)),
            }
        )

    return _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        ratio, batch_format="pyarrow", zero_copy_batch=True
    )


def tokenize_bpe(sf_dir: str, n_merges: int = BPE_MERGES) -> ray.data.Dataset:
    """Apply the merges learned by ``bpe_train`` back to the corpus ->
    (doc_id, n_tokens, n_chars_tokenized): the artifact-chaining
    pattern — phase 1 trains a bounded model (the merge list), phase 2
    is a stateless broadcast map over the stream (rule 11), the corpus
    shuffles ZERO times across both phases. The per-actor stage caches
    a word -> token-count memo (S5-style __init__ state + bounded memo)
    because corpus word frequency is Zipfian — the memo turns the
    per-occurrence re-tokenization into one `_bpe_apply` per DISTINCT
    word per actor.

    Rows-only in the gate (depends on the trained merges); pytest pins
    token counts against the independent reference tokenizer."""
    from .._rayutil import pool_size

    merges_tbl = bpe_train(sf_dir, n_merges)
    merges = tuple(
        zip(merges_tbl["left"].to_pylist(), merges_tbl["right"].to_pylist())
    )
    mref = ray.put(merges)
    return _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        _ApplyBPE,
        fn_constructor_args=(mref,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=pool_size(),
        num_cpus=1,
    )


class _ApplyBPE:
    """Broadcast-merge-list tokenizer stage: merges fetched once per
    actor, word -> token-count memo bounded at 1M entries (Zipfian
    corpora re-tokenize each distinct word once per actor, not per
    occurrence)."""

    def __init__(self, mref):
        self._merges = ray.get(mref)
        self._memo: dict = {}

    def _count(self, w: str) -> int:
        n = self._memo.get(w)
        if n is None:
            n = len(_bpe_apply(list(w) + [BPE_EOW], self._merges))
            if len(self._memo) < 1_000_000:  # bound actor memory
                self._memo[w] = n
        return n

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        out = np.empty(len(texts), dtype=np.int64)
        chars = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            total = 0
            nch = 0
            for w in (t or "").split(" "):
                if w:
                    total += self._count(w)
                    nch += len(w)
            out[i] = total
            chars[i] = nch
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array(out),
                "n_chars_tokenized": pa.array(chars),
            }
        )


# ---------------------------------------------------------------------------
# Gopher repetition signals (Rae et al. 2021, A1.1 repetition filters)
# ---------------------------------------------------------------------------

REP_TOP_N = 2   # "fraction of characters in the most frequent n-gram" rule
REP_DUP_N = 5   # "fraction of characters in duplicated n-grams" rule


def _explode_word_stream(batch: pa.Table):
    """Vectorized word explode over a batch: (doc_row_index, word_pos,
    flat word array). Words are maximal runs of non-space characters
    ('[^ ]+' — DuckDB ``regexp_extract_all`` parity); empty docs and
    runs of spaces contribute no words. Shared by ``repetition_signals``
    and ``dedup.dedup_substrings``."""
    lists = pc.split_pattern(pc.fill_null(batch["text"], ""), " ")
    flat = pc.list_flatten(lists)
    parent = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
    keep = pc.invert(pc.equal(flat, "")).to_numpy(zero_copy_only=False)
    flat = flat.filter(pa.array(keep))
    parent = parent[keep].astype(np.int64)
    n = len(parent)
    if n == 0:
        return parent, np.empty(0, np.int64), flat
    run_start = np.zeros(n, dtype=np.int64)
    starts = np.flatnonzero(np.diff(parent, prepend=parent[0] - 1))
    run_start[starts] = starts
    run_start = np.maximum.accumulate(run_start)
    pos = np.arange(n, dtype=np.int64) - run_start
    return parent, pos, flat


_GRAM_MIX = np.uint64(0x9E3779B97F4A7C15)


def _word_gram_hashes(h: np.ndarray, L: int) -> np.ndarray:
    """Polynomial combine of L consecutive word hashes into one window
    hash (uint64 wraparound); L vectorized passes over the flat word
    stream, never a Python loop over windows."""
    n = len(h) - L + 1
    if n <= 0:
        return np.empty(0, np.uint64)
    g = np.zeros(n, dtype=np.uint64)
    for j in range(L):
        g = g * _GRAM_MIX + h[j : j + n]
    return g


def _word_hash_pair(flat, key_prefix: str):
    """Two independent fixed-key 64-bit siphashes of a word column (same
    128-bit collision discipline as ``dedup.text_hash128``)."""
    from pandas.util import hash_array

    k1, k2 = f"{key_prefix}1", f"{key_prefix}2"
    if len(k1) != 16:
        raise ValueError(f"hash key prefix must be 15 chars, got {key_prefix!r}")
    texts = np.asarray(flat.to_pylist(), dtype=object)
    return hash_array(texts, hash_key=k1), hash_array(texts, hash_key=k2)


def repetition_signals(sf_dir: str) -> ray.data.Dataset:
    """Gopher A1.1 repetition filter signals per document, exact-integer:

    - ``top2_count`` / ``top2_pos`` / ``top2_chars`` — occurrence count,
      first position and character length of the document's most frequent
      word 2-gram (ties broken by earliest first occurrence — a total
      order, since a position holds exactly one gram). The published
      "fraction of characters in the most frequent n-gram" is
      ``top2_count * top2_chars / n_chars``; the three integers are
      emitted raw so the oracle compare stays float-free.
    - ``dup5_grams`` / ``dup5_chars`` — total occurrences of duplicated
      (count >= 2) word 5-grams and their summed ``count * gram_chars``
      character mass, the "fraction of characters in duplicated n-grams"
      numerator.

    Intra-document by definition -> pure ``map_batches``, no shuffle, no
    cross-doc state: the whole kernel is one lexsort + run arithmetic
    over the batch's flat word stream (window hashes via polynomial
    combine of per-word siphashes; gram char lengths from a word-length
    cumsum, never re-materializing gram strings). Scale cost is
    O(words * log words) per batch with ~5 numpy passes."""
    top_n, dup_n = REP_TOP_N, REP_DUP_N

    def signals(batch: pa.Table) -> pa.Table:
        parent, pos, flat = _explode_word_stream(batch)
        nrows = batch.num_rows
        wlen = (
            pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
        )
        h1, h2 = _word_hash_pair(flat, "engine-repsigke")
        cs = np.concatenate([[0], np.cumsum(wlen)])

        def gram_runs(L):
            """Per distinct (doc, gram): (doc, count, first_pos, chars)."""
            nwin = len(parent) - L + 1
            if nwin <= 0:
                e = np.empty(0, np.int64)
                return e, e, e, e
            ok = parent[:nwin] == parent[L - 1 :]
            g1 = _word_gram_hashes(h1, L)[ok]
            g2 = _word_gram_hashes(h2, L)[ok]
            doc = parent[:nwin][ok]
            p = pos[:nwin][ok]
            chars = (cs[L:][:nwin] - cs[:nwin] + (L - 1))[ok]
            order = np.lexsort((p, g2, g1, doc))
            doc, g1, g2 = doc[order], g1[order], g2[order]
            p, chars = p[order], chars[order]
            new = np.zeros(len(doc), bool)
            if len(doc):
                new[0] = True
                new[1:] = (
                    (doc[1:] != doc[:-1])
                    | (g1[1:] != g1[:-1])
                    | (g2[1:] != g2[:-1])
                )
            starts = np.flatnonzero(new)
            sizes = np.diff(np.append(starts, len(doc))).astype(np.int64)
            return doc[starts], sizes, p[starts], chars[starts]

        d2, cnt2, fpos2, chars2 = gram_runs(top_n)
        top_count = np.zeros(nrows, np.int64)
        top_pos = np.full(nrows, -1, np.int64)
        top_chars = np.zeros(nrows, np.int64)
        if len(d2):
            # last row per doc under (count asc, first_pos desc) = the
            # (count desc, first_pos asc) winner
            order = np.lexsort((-fpos2, cnt2, d2))
            dO = d2[order]
            last = np.flatnonzero(np.diff(dO, append=dO[-1] + 1))
            sel = order[last]
            top_count[d2[sel]] = cnt2[sel]
            top_pos[d2[sel]] = fpos2[sel]
            top_chars[d2[sel]] = chars2[sel]

        d5, cnt5, _, chars5 = gram_runs(dup_n)
        dup_grams = np.zeros(nrows, np.int64)
        dup_chars = np.zeros(nrows, np.int64)
        if len(d5):
            # np.add.at, not bincount-with-weights: bincount accumulates
            # in float64 and count*chars must stay exact int64
            m = cnt5 >= 2
            np.add.at(dup_grams, d5[m], cnt5[m])
            np.add.at(dup_chars, d5[m], cnt5[m] * chars5[m])

        n_chars = (
            pc.utf8_length(pc.fill_null(batch["text"], ""))
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        return pa.table(
            {
                "doc_id": pc.cast(batch["doc_id"], pa.int64()),
                "n_chars": pa.array(n_chars),
                "top2_count": pa.array(top_count),
                "top2_pos": pa.array(top_pos),
                "top2_chars": pa.array(top_chars),
                "dup5_grams": pa.array(dup_grams),
                "dup5_chars": pa.array(dup_chars),
            }
        )

    return _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        signals, batch_format="pyarrow", zero_copy_batch=True
    )


# ---------------------------------------------------------------------------
# DSIR-shaped data selection (Xie et al. 2023, "Data Selection for
# Language Models via Importance Resampling") — integer-exact surrogate
# ---------------------------------------------------------------------------

DSIR_TOP_K = 2048       # bounded feature table (the lm_score discipline)
DSIR_TARGET_LANG = "en"  # the in-domain corpus the selector steers toward


def _unigram_count_table(sf_dir: str):
    """Distributed (word, c_all, c_target) counts: ONE corpus pass with
    per-batch pre-aggregation, one vocabulary-bounded groupby. c_target
    counts only tokens of DSIR_TARGET_LANG documents."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        words_list = pc.split_pattern(pc.fill_null(batch["text"], ""), " ")
        flat = pc.list_flatten(words_list)
        keep = pc.invert(pc.equal(flat, ""))
        flat = flat.filter(keep)
        parent = pc.list_parent_indices(words_list).to_numpy(
            zero_copy_only=False
        )[keep.to_numpy(zero_copy_only=False)]
        is_t = (
            pc.equal(batch["lang"], DSIR_TARGET_LANG)
            .to_numpy(zero_copy_only=False)[parent]
            .astype(np.int64)
        )
        t = pa.table(
            {"w": flat, "c_all": pa.array(np.ones(len(parent), np.int64)),
             "c_t": pa.array(is_t)}
        )
        return t.group_by(["w"]).aggregate([("c_all", "sum"), ("c_t", "sum")])

    return (
        _read_documents(sf_dir, ["doc_id", "text", "lang"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("w")
        .aggregate(
            Sum("c_all_sum", alias_name="c_all"),
            Sum("c_t_sum", alias_name="c_t"),
        )
    )


def dsir_select(sf_dir: str, k: int = DSIR_TOP_K) -> ray.data.Dataset:
    """DSIR-shaped selection, integer-exact: score every document by the
    corpus-frequency MASS its tokens carry in the target (lang = 'en')
    vs the source (whole corpus) unigram distribution, and select docs
    whose average target mass exceeds their average source mass — the
    cross-multiplied integer form ``N_s * t_mass > N_t * s_mass`` of
    DSIR's positive-importance-weight test (the published estimator's
    log-ratio is float; the integer mass comparison keeps the oracle
    hash-exact and is one vectorized ``log`` away from the real weights).

    Scale shape: pass 1 builds the distributed unigram table (ONE
    corpus pass, vocabulary-bounded groupby), reduces exact corpus
    totals from the DISTRIBUTED table (never materializing it on the
    driver), and caps both lookup sides to the ``k`` heavy hitters —
    per-block local top-k partials mean the driver sees at most
    num_blocks x k rows (the ``_top_bigrams`` bound). Pass 2 streams
    documents against the two broadcast dicts; out-of-table words score
    0 on BOTH engines. No shuffle ever carries the corpus."""
    from ray.data.aggregate import Sum

    ensure_serializable()
    counts = _unigram_count_table(sf_dir).materialize()  # vocab-bounded
    tot = counts.aggregate(
        Sum("c_all", alias_name="n_s"), Sum("c_t", alias_name="n_t")
    )
    n_s, n_t = int(tot["n_s"]), int(tot["n_t"])

    def table_of(col: str) -> dict:
        order = [(col, "descending"), ("w", "ascending")]

        def local_topk(batch: pa.Table) -> pa.Table:
            batch = batch.filter(pc.greater(batch[col], 0))
            if batch.num_rows > k:
                batch = batch.sort_by(order).slice(0, k)
            return batch

        df = (
            counts.map_batches(
                local_topk, batch_format="pyarrow", zero_copy_batch=True,
                batch_size=None,
            )
            .to_pandas()  # <= num_blocks * k rows by construction
            .sort_values([col, "w"], ascending=[False, True], kind="mergesort")
            .head(k)
        )
        return {w: int(c) for w, c in zip(df["w"], df[col])}

    t_ref = ray.put(table_of("c_t"))
    s_ref = ray.put(table_of("c_all"))

    class Score:
        def __init__(self, tr, sr, n_t_, n_s_):
            self._t, self._s = ray.get(tr), ray.get(sr)
            self._n_t, self._n_s = n_t_, n_s_

        def __call__(self, batch: pa.Table) -> pa.Table:
            words_list = pc.split_pattern(pc.fill_null(batch["text"], ""), " ")
            flat = pc.list_flatten(words_list)
            keep = pc.invert(pc.equal(flat, ""))
            flat = pc.dictionary_encode(flat.filter(keep).combine_chunks())
            parent = pc.list_parent_indices(words_list).to_numpy(
                zero_copy_only=False
            )[keep.to_numpy(zero_copy_only=False)]
            n = batch.num_rows
            n_tokens = np.bincount(parent, minlength=n).astype(np.int64)
            t_mass = np.zeros(n, np.int64)
            s_mass = np.zeros(n, np.int64)
            if len(parent):
                vocab = np.asarray(flat.dictionary.to_pylist(), dtype=object)
                codes = np.asarray(flat.indices, dtype=np.int64)
                per_t = np.array(
                    [self._t.get(w, 0) for w in vocab], dtype=np.int64
                )
                per_s = np.array(
                    [self._s.get(w, 0) for w in vocab], dtype=np.int64
                )
                np.add.at(t_mass, parent, per_t[codes])
                np.add.at(s_mass, parent, per_s[codes])
            selected = (
                self._n_s * t_mass > self._n_t * s_mass
            ).astype(np.int64)
            return pa.table(
                {
                    "doc_id": pc.cast(batch["doc_id"], pa.int64()),
                    "n_tokens": pa.array(n_tokens),
                    "t_mass": pa.array(t_mass),
                    "s_mass": pa.array(s_mass),
                    "selected": pa.array(selected),
                }
            )

    from .._rayutil import pool_size

    return _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        Score,
        fn_constructor_args=(t_ref, s_ref, n_t, n_s),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=pool_size(),
        num_cpus=1,
    )


# ---------------------------------------------------------------------------
# Vocabulary growth (Heaps' law) and lexical-diversity gate
# ---------------------------------------------------------------------------

VOCAB_GROWTH_STEP = 50


def vocab_growth(sf_dir: str, step: int = VOCAB_GROWTH_STEP) -> ray.data.Dataset:
    """Heaps'-law vocabulary growth curve over word BIGRAMS: for each
    doc_id range ``[0, (b+1)*step)`` report how many distinct bigrams
    first appeared in bucket ``b`` and the cumulative vocabulary — the
    curve data engineers read to decide whether more crawl data still
    adds novel n-grams (Heaps 1978; the n-gram novelty companion of
    ``word_counts``/``bigram_counts``).

    Bigram convention is ``bigram_counts``' exactly (single-space split,
    empties KEPT so adjacency matches the SQL oracle). Scale shape:
    per-batch (bigram, min doc_id) partials, ONE vocabulary-bounded
    groupby Min — first-occurrence is an algebraic aggregate, so no
    doc-order scan exists anywhere; the bucket histogram is
    ``max_doc_id/step`` rows and the cumulative sum runs on that tiny
    table in a single block. At corpus scale pass ``step ~ n_docs/1000``
    (a 1000-point curve) so the final table stays single-block by
    construction; the fixture default 50 gives the sf0.01 corpus a
    10-bucket curve."""
    from ray.data.aggregate import Min as _Min, Sum as _Sum

    def partial(batch: pa.Table) -> pa.Table:
        words_list = pc.split_pattern(pc.fill_null(batch["text"], ""), " ")
        lengths = pc.list_value_length(words_list).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(words_list)
        total = len(flat)
        empty = pa.table(
            {"gram": pa.array([], pa.string()),
             "first_doc": pa.array([], pa.int64())}
        )
        if total == 0:
            return empty
        is_last = np.zeros(total, dtype=bool)
        ends = np.cumsum(lengths) - 1
        is_last[ends[lengths > 0]] = True
        first_idx = np.flatnonzero(~is_last)
        if first_idx.size == 0:
            return empty
        w1 = flat.take(pa.array(first_idx))
        w2 = flat.take(pa.array(first_idx + 1))
        gram = pc.binary_join_element_wise(w1, w2, " ")
        doc_of_word = np.repeat(
            batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64),
            lengths,
        )
        g = (
            pa.table({"gram": gram, "first_doc": pa.array(doc_of_word[first_idx])})
            .group_by(["gram"])
            .aggregate([("first_doc", "min")])
        )
        return pa.table({"gram": g["gram"], "first_doc": g["first_doc_min"]})

    firsts = (
        _read_documents(sf_dir, ["doc_id", "text"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("gram")
        .aggregate(_Min("first_doc", alias_name="first_doc"))
    )

    def bucketize(batch: pa.Table) -> pa.Table:
        fd = batch["first_doc"].to_numpy(zero_copy_only=False)
        bu, bc = np.unique(fd // step, return_counts=True)
        return pa.table(
            {"bucket": pa.array(bu.astype(np.int64)),
             "new_grams": pa.array(bc.astype(np.int64))}
        )

    hist = (
        firsts.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .aggregate(_Sum("new_grams", alias_name="new_grams"))
    )

    def cumulate(batch: pa.Table) -> pa.Table:
        # single block by construction (<= max_doc_id/step rows)
        t = batch.sort_by("bucket")
        new = t["new_grams"].to_numpy(zero_copy_only=False)
        bucket = t["bucket"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n_docs_ub": pa.array((bucket + 1) * step),
                "new_grams": pa.array(new),
                "vocab": pa.array(np.cumsum(new)),
            }
        )

    return hist.repartition(1).map_batches(
        cumulate, batch_format="pyarrow", zero_copy_batch=True
    )


TTR_NUM = 1
TTR_DEN = 2


def ttr_docs(sf_dir: str) -> ray.data.Dataset:
    """Per-document type-token ratio (lexical diversity) with an exact
    integer low-diversity gate: ``low_diversity = n_distinct * TTR_DEN
    < n_words * TTR_NUM`` (i.e. distinct/words < 1/2) — the
    lexical-diversity quality rule complementing ``doc_repetition``'s
    3-gram view (repeated-word spam has low TTR even when its 3-grams
    are distinct). Tokenization is ``word_counts``' single-space split
    with empties dropped; docs with zero words emit nothing on both
    engines.

    Scale shape: entirely batch-local (per-doc distinct via one
    group_by over (row, word) within the batch) — no shuffle, no
    cross-doc state, no Python loop."""

    def ttr(batch: pa.Table) -> pa.Table:
        words_list = pc.split_pattern(pc.fill_null(batch["text"], ""), " ")
        flat = pc.list_flatten(words_list)
        parent = pc.list_parent_indices(words_list).to_numpy(
            zero_copy_only=False
        )
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = pa.table({"row": pa.array(parent), "word": flat})
        t = t.filter(pc.not_equal(t["word"], ""))
        n_words = np.zeros(len(batch), dtype=np.int64)
        rows = t["row"].to_numpy(zero_copy_only=False)
        np.add.at(n_words, rows, 1)
        distinct = t.group_by(["row", "word"]).aggregate([])
        n_distinct = np.zeros(len(batch), dtype=np.int64)
        np.add.at(
            n_distinct, distinct["row"].to_numpy(zero_copy_only=False), 1
        )
        keep = n_words > 0
        return pa.table(
            {
                "doc_id": pa.array(ids[keep]),
                "n_words": pa.array(n_words[keep]),
                "n_distinct": pa.array(n_distinct[keep]),
                "low_diversity": pa.array(
                    (n_distinct[keep] * TTR_DEN < n_words[keep] * TTR_NUM)
                    .astype(np.int64)
                ),
            }
        )

    return _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        ttr, batch_format="pyarrow", zero_copy_batch=True
    )


# ---------------------------------------------------------------------------
# Reciprocal-rank fusion of relevance and quality rankings
# ---------------------------------------------------------------------------

RRF_C = 60                    # the standard RRF constant (Cormack'09)
RRF_SCALE = 1_000_000_000     # integer-exact 1/(c+r) at e9 resolution


def rrf_fuse_docs(sf_dir: str) -> "pd.DataFrame":
    """Reciprocal-rank fusion (Cormack/Clarke/Buettcher, SIGIR 2009) of
    two independent document rankings — BM25 relevance and LM-mass
    quality — over the BM25 candidate set: the standard hybrid-retrieval
    step every RAG / data-selection stack runs when it has both a
    lexical and a model score. Fused score is integer-exact:
    ``rrf_e9 = SCALE//(C+r_bm25) + SCALE//(C+r_quality)`` (ranks are
    small ints, so the floor divisions are bit-identical in SQL).

    Scale shape: ``bm25_topk`` reduces the corpus to K candidate rows
    on the driver; ``lm_score`` streams the corpus once against its
    bounded heavy-hitter broadcast, and only the K candidate ids (a
    closure-captured handful of ints, not a ray.put side) survive its
    filter — the final fuse is K-row driver arithmetic. Quality rank
    ties break (score desc, doc_id asc); fused ties (rrf desc, doc_id)."""
    import pandas as pd

    cand = bm25_topk(sf_dir)  # K rows: doc_id, score_e9, rank
    ids = np.sort(cand["doc_id"].to_numpy().astype(np.int64))

    def keep(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(ids, d)
        pos_c = np.clip(pos, 0, ids.size - 1)
        return batch.filter(pa.array(ids[pos_c] == d))

    lm = (
        lm_score(sf_dir)
        .map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()  # bounded: <= K candidate rows
    )
    merged = cand.rename(columns={"rank": "r_bm25"}).merge(
        lm[["doc_id", "score"]], on="doc_id", how="inner"
    )
    if len(merged) != len(cand):  # every candidate must carry a quality row
        raise ValueError("rrf_fuse_docs: candidate missing from lm_score")
    order = np.lexsort(
        (merged["doc_id"].to_numpy(), -merged["score"].to_numpy())
    )
    r_quality = np.empty(len(merged), dtype=np.int64)
    r_quality[order] = np.arange(1, len(merged) + 1)
    r_bm25 = merged["r_bm25"].to_numpy().astype(np.int64)
    rrf = RRF_SCALE // (RRF_C + r_bm25) + RRF_SCALE // (RRF_C + r_quality)
    forder = np.lexsort((merged["doc_id"].to_numpy(), -rrf))
    fused_rank = np.empty(len(merged), dtype=np.int64)
    fused_rank[forder] = np.arange(1, len(merged) + 1)
    out = pd.DataFrame(
        {
            "doc_id": merged["doc_id"].astype(np.int64),
            "r_bm25": r_bm25,
            "r_quality": r_quality,
            "rrf_e9": rrf,
            "fused_rank": fused_rank,
        }
    )
    return out.sort_values("fused_rank").reset_index(drop=True)


PACK_EFF_SEQ_LENS = (128, 256, 512, 1024)


def packing_efficiency(
    sf_dir: str, seq_lens: tuple = PACK_EFF_SEQ_LENS
) -> ray.data.Dataset:
    """Padding-waste report for the seq_len grid a trainer is choosing
    from: for each candidate sequence length, the padded-token waste of
    the two standard batching strategies — GPT-style concat-and-chunk
    (waste = the final window's remainder, plus nothing else) vs
    pad-each-doc-to-a-window-multiple (waste = sum over docs of
    ceil(n/L)*L - n) — and the corpus totals backing them. Exact
    integer aggregates, so the report is the decision table, not an
    estimate (the companion of ``pack_sequences``, which executes the
    concat strategy this table justifies).

    Scale shape: one streaming token-count pass; per batch emits ONE
    row per seq_len (padded-sum partials), reduced by a |grid|-keyed
    groupby — the corpus never shuffles."""
    from ray.data.aggregate import Sum as _Sum

    lens = np.asarray(sorted(seq_lens), dtype=np.int64)

    def partial(batch: pa.Table) -> pa.Table:
        n = pc.cast(
            pc.count_substring_regex(
                pc.fill_null(batch["text"], ""), TOKEN_PATTERN
            ),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        # per seq_len: sum of per-doc padded sizes, plus shared totals
        padded = (
            ((n[None, :] + lens[:, None] - 1) // lens[:, None])
            * lens[:, None]
        ).sum(axis=1)
        return pa.table(
            {
                "seq_len": pa.array(lens),
                "pad_each_sum": pa.array(padded),
                "total_tokens": pa.array(np.full(lens.size, int(n.sum()))),
                "n_docs": pa.array(np.full(lens.size, int(n.size))),
            }
        )

    agg = (
        _read_documents(sf_dir, ["text"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("seq_len")
        .aggregate(
            _Sum("pad_each_sum", alias_name="pad_each_sum"),
            _Sum("total_tokens", alias_name="total_tokens"),
            _Sum("n_docs", alias_name="n_docs"),
        )
    )

    def finalize(batch: pa.Table) -> pa.Table:
        L = batch["seq_len"].to_numpy(zero_copy_only=False)
        tot = batch["total_tokens"].to_numpy(zero_copy_only=False)
        pad = batch["pad_each_sum"].to_numpy(zero_copy_only=False)
        concat_waste = (L - tot % L) % L
        return pa.table(
            {
                "seq_len": pa.array(L),
                "total_tokens": pa.array(tot),
                "n_docs": batch["n_docs"],
                "waste_concat": pa.array(concat_waste),
                "waste_pad_each": pa.array(pad - tot),
            }
        )

    return agg.map_batches(
        finalize, batch_format="pyarrow", zero_copy_batch=True
    )
