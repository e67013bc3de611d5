"""Conversation-level statistics over the transcript table.

Two more operators of the transcript family (alongside extraction,
render_conversations and compact_history), both with exact DuckDB
oracles:

- ``conv_stats``: per-conversation roll-up (turn counts, tool-turn
  counts, char totals, time range) via the partial-aggregation pattern —
  `pyarrow.Table.group_by` inside ``map_batches`` emits one row per
  (conv_id, batch); the global groupby sums partials.
- ``turn_token_counts``: per-turn whitespace-token counts computed
  entirely in Arrow kernels (``pc.count_substring_regex`` — re2, the
  same regex engine DuckDB uses, so parity is structural).

The usage-counter analog of the reference (prompt/completion token
counts per request, /root/reference/crates/server/src/routes.rs:135-139).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .._rayutil import ensure_serializable, pool_size
from ..pipeline import _hash_conv_ids, resolve_num_buckets
from .dedup import _bucket_of, _run_starts, text_hash128

TOKEN_RE = r"\S+"


def _transcript_ds(transcript_paths, columns) -> ray.data.Dataset:
    """Parquet path list -> pruned read; an already-built Dataset (e.g.
    the engine.io JSONL source) passes through with a column projection,
    so every operator here runs on either ingestion format."""
    ensure_serializable()
    if isinstance(transcript_paths, ray.data.Dataset):
        return transcript_paths.select_columns(columns)
    return ray.data.read_parquet(transcript_paths, columns=columns)


def conv_stats(
    transcript_paths, num_buckets=None
) -> ray.data.Dataset:
    """Per-conversation: n_turns, n_tool_turns, n_chars, ts range (us).

    Combine shape: per-batch ``group_by(conv_id)`` partials (one row per
    conv per batch), then a BUCKETED reduce — a native
    ``groupby(conv_id)`` sort-shuffles on the string key itself, which
    measured 16s at sf0.1 (24k distinct conv ids); hashing convs into
    ``num_buckets`` and reducing each bucket with vectorized reduceat
    makes the shuffle key 64 distinct int32s (~6s). Same pattern as the
    dedup pair combine."""
    num_buckets = resolve_num_buckets(num_buckets, transcript_paths)
    ds = _transcript_ds(
        transcript_paths, ["conv_id", "role", "text", "ts"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "conv_id": batch["conv_id"],
                # fill_null first: count() skips nulls, so a null role would
                # silently undercount n_turns vs the oracle's count(*)
                "is_tool": pc.cast(
                    pc.equal(pc.fill_null(batch["role"], ""), "tool"), pa.int64()
                ),
                "n_chars": pc.cast(
                    pc.utf8_length(pc.fill_null(batch["text"], "")), pa.int64()
                ),
                "ts_us": pc.cast(batch["ts"], pa.int64()),
            }
        )
        agg = t.group_by(["conv_id"]).aggregate(
            [
                ("is_tool", "count"), ("is_tool", "sum"),
                ("n_chars", "sum"), ("ts_us", "min"), ("ts_us", "max"),
            ]
        )
        conv = agg["conv_id"].combine_chunks().to_numpy(zero_copy_only=False)
        bucket = (_hash_conv_ids(conv) % num_buckets).astype(np.int32)
        return agg.append_column("_b", pa.array(bucket))

    def reduce_bucket(group: pa.Table) -> pa.Table:
        t = group.sort_by([("conv_id", "ascending")]).combine_chunks()
        n = t.num_rows
        if n == 0:
            return pa.table(
                {
                    "conv_id": pa.array([], pa.string()),
                    "n_turns": pa.array([], pa.int64()),
                    "n_tool_turns": pa.array([], pa.int64()),
                    "n_chars": pa.array([], pa.int64()),
                    "first_ts_us": pa.array([], pa.int64()),
                    "last_ts_us": pa.array([], pa.int64()),
                }
            )
        conv = t.column("conv_id")
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = pc.not_equal(conv.slice(1), conv.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
        starts = np.flatnonzero(new)
        col = lambda name: t[name].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "conv_id": conv.take(pa.array(starts)),
                "n_turns": pa.array(
                    np.add.reduceat(col("is_tool_count"), starts)
                ),
                "n_tool_turns": pa.array(
                    np.add.reduceat(col("is_tool_sum"), starts)
                ),
                "n_chars": pa.array(np.add.reduceat(col("n_chars_sum"), starts)),
                "first_ts_us": pa.array(
                    np.minimum.reduceat(col("ts_us_min"), starts)
                ),
                "last_ts_us": pa.array(
                    np.maximum.reduceat(col("ts_us_max"), starts)
                ),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return partials.groupby("_b").map_groups(
        lambda g: reduce_bucket(g.drop_columns(["_b"])), batch_format="pyarrow"
    )


def turn_token_counts(transcript_paths) -> ray.data.Dataset:
    """(conv_id, turn_idx, n_tokens, n_chars) per turn — all Arrow kernels,
    zero Python in the hot path."""
    ds = _transcript_ds(transcript_paths, ["conv_id", "turn_idx", "text"])

    def counts(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch["text"], "")
        return pa.table(
            {
                "conv_id": batch["conv_id"],
                "turn_idx": batch["turn_idx"],
                "n_tokens": pc.cast(
                    pc.count_substring_regex(text, TOKEN_RE), pa.int64()
                ),
                "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
            }
        )

    return ds.map_batches(counts, batch_format="pyarrow", zero_copy_batch=True)


# PII-redaction patterns, applied in order. Every pattern is RE2 with no
# escape sequence that diverges between Arrow and DuckDB (both run RE2),
# so engine/oracle parity is structural. URL first: URLs contain digit
# runs the NUM pass would otherwise mangle.
REDACT_PATTERNS = [
    ("url", r'https?://[^ \t\n\r\f\v"<>]+', "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("num", r"\b\d\d+\b", "<NUM>"),
]


def redact_transcripts(transcript_paths) -> ray.data.Dataset:
    """PII/noise redaction over transcript turn text — the scrubbing pass
    a training-data pipeline runs before anything ships: URLs, email
    addresses and multi-digit runs (ids, phone fragments, page numbers)
    are masked with typed placeholders.

    Entirely ``pc.replace_substring_regex`` / ``pc.count_substring_regex``
    Arrow kernels — zero Python per row, embarrassingly parallel, no
    shuffle. Counts are taken per pass on the text as it stands BEFORE
    that pass (so a URL's digits count once, as a URL), matching the
    nested-``regexp_replace`` oracle structurally."""
    ds = _transcript_ds(transcript_paths, ["conv_id", "turn_idx", "text"])

    def redact(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch["text"], "")
        total = None
        for _, pat, rep in REDACT_PATTERNS:
            n = pc.count_substring_regex(text, pat)
            total = n if total is None else pc.add(total, n)
            text = pc.replace_substring_regex(text, pat, rep)
        return pa.table(
            {
                "conv_id": batch["conv_id"],
                "turn_idx": batch["turn_idx"],
                "redacted": text,
                "n_redactions": pc.cast(total, pa.int64()),
            }
        )

    return ds.map_batches(redact, batch_format="pyarrow", zero_copy_batch=True)


def dedup_turns(transcript_paths) -> ray.data.Dataset:
    """Turn-level exact dedup across the whole transcript corpus: one
    representative per distinct turn text plus its duplication count —
    repeated tool outputs and boilerplate turns are the bulk of
    transcript redundancy.

    Same scale shape as ``dedup.dedup_exact``: a vectorized 128-bit
    content hash (two independent fixed-key siphashes) inside
    ``map_batches`` means the shuffle moves (h1, h2, conv_id, turn_idx)
    only — never the text — and the reduce is a NATIVE Min/Count
    aggregate (no per-group Python). min(conv_id)/min(turn_idx) are
    independent aggregates (not one row's pair), matching the SQL
    oracle's min()/min()."""
    from pandas.util import hash_array

    from ray.data.aggregate import Count, Min

    ds = _transcript_ds(transcript_paths, ["conv_id", "turn_idx", "text"])

    def add_hash(batch: pa.Table) -> pa.Table:
        texts = np.asarray(
            pc.fill_null(batch["text"], "").to_pylist(), dtype=object
        )
        h1 = hash_array(texts, hash_key="engine-turndup01").view(np.int64)
        h2 = hash_array(texts, hash_key="engine-turndup02").view(np.int64)
        return pa.table(
            {
                "h1": pa.array(h1),
                "h2": pa.array(h2),
                "conv_id": batch["conv_id"],
                "turn_idx": pc.cast(batch["turn_idx"], pa.int64()),
            }
        )

    hashed = ds.map_batches(add_hash, batch_format="pyarrow", zero_copy_batch=True)
    agg = hashed.groupby(["h1", "h2"]).aggregate(
        Min("conv_id", alias_name="conv_id"),
        Min("turn_idx", alias_name="min_turn_idx"),
        Count(alias_name="n_dups"),
    )
    return agg.select_columns(["conv_id", "min_turn_idx", "n_dups"])


CHUNK_TOKENS = 256  # token budget per packed training chunk


def chunk_conversations(
    transcript_paths, num_buckets=None
) -> ray.data.Dataset:
    """SEQUENCE PACKING: assign each turn to a fixed-budget training
    chunk — chunk_id = floor(tokens_before_this_turn / CHUNK_TOKENS)
    within its conversation, turns in turn_idx order. The
    context-window chunking pass an LLM training pipeline runs between
    extraction and tokenized shard writing; deterministic (a pure
    function of the conversation prefix) so resumed runs re-derive
    identical chunk boundaries.

    Physical shape: token counts are an Arrow regex kernel per batch;
    the only shuffle buckets rows by hash(conv_id) — the engine's one
    transcript partitioning key — and each bucket sorts (conv_id,
    turn_idx) once and takes a cumsum-minus-run-base. No per-row or
    per-conversation Python."""
    num_buckets = resolve_num_buckets(num_buckets, transcript_paths)
    ds = _transcript_ds(transcript_paths, ["conv_id", "turn_idx", "text"])

    def counts(batch: pa.Table) -> pa.Table:
        conv = np.asarray(batch["conv_id"].to_pylist(), dtype=object)
        b = (_hash_conv_ids(conv) % num_buckets).astype(np.int32)
        return pa.table(
            {
                "conv_id": batch["conv_id"],
                "turn_idx": pc.cast(batch["turn_idx"], pa.int64()),
                "n_tokens": pc.cast(
                    pc.count_substring_regex(
                        pc.fill_null(batch["text"], ""), TOKEN_RE
                    ),
                    pa.int64(),
                ),
                "_b": pa.array(b),
            }
        )

    def pack_bucket(group: pa.Table) -> pa.Table:
        t = group.sort_by(
            [("conv_id", "ascending"), ("turn_idx", "ascending")]
        ).combine_chunks()
        n = t.num_rows
        if n == 0:
            return pa.table(
                {
                    "conv_id": pa.array([], pa.string()),
                    "turn_idx": pa.array([], pa.int64()),
                    "chunk_id": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                }
            )
        conv = np.asarray(t["conv_id"].to_pylist(), dtype=object)
        tok = t["n_tokens"].to_numpy(zero_copy_only=False)
        new = np.r_[True, conv[1:] != conv[:-1]]
        starts = np.flatnonzero(new)
        sizes = np.diff(np.append(starts, n))
        cum = np.cumsum(tok)
        before = cum - tok - np.repeat(cum[starts] - tok[starts], sizes)
        return pa.table(
            {
                "conv_id": t["conv_id"],
                "turn_idx": t["turn_idx"],
                "chunk_id": pa.array((before // CHUNK_TOKENS).astype(np.int64)),
                "n_tokens": t["n_tokens"],
            }
        )

    counted = ds.map_batches(counts, batch_format="pyarrow", zero_copy_batch=True)
    return counted.groupby("_b").map_groups(
        lambda g: pack_bucket(g.drop_columns(["_b"])), batch_format="pyarrow"
    )


_ROLE_CODES = {"user": 0, "assistant": 1, "system": 2, "tool": 3}


def valid_role_alternation(
    transcript_paths, num_buckets=None
) -> ray.data.Dataset:
    """Structural validation of conversations — the schema-level clean
    step run before any transcript enters a training mix: a conv is
    valid iff turn 0 is user or system, 'system' never appears after
    turn 0, and no two consecutive turns repeat a role (tool chains
    exempt — multi-tool-call turns are legal).

    Adjacency needs per-conversation order, so this rides the engine's
    one standard shuffle: roles compress to int8 codes, rows bucket on
    hash(conv), and each bucket lexsorts once and evaluates all three
    rules vectorized over run boundaries — no per-conv Python."""
    num_buckets = resolve_num_buckets(num_buckets, transcript_paths)
    ds = _transcript_ds(transcript_paths, ["conv_id", "turn_idx", "role"])

    def tag(batch: pa.Table) -> pa.Table:
        conv = batch["conv_id"].combine_chunks().to_numpy(zero_copy_only=False)
        role = batch["role"].to_pylist()
        codes = np.array([_ROLE_CODES.get(r, 4) for r in role], dtype=np.int8)
        return pa.table(
            {
                "_b": pa.array(
                    (_hash_conv_ids(conv) % num_buckets).astype(np.int32)
                ),
                "conv_id": batch["conv_id"],
                "turn_idx": pc.cast(batch["turn_idx"], pa.int32()),
                "role_code": pa.array(codes),
            }
        )

    def validate_bucket(group: pa.Table) -> pa.Table:
        t = group.sort_by(
            [("conv_id", "ascending"), ("turn_idx", "ascending")]
        ).combine_chunks()
        n = t.num_rows
        if n == 0:
            return pa.table(
                {
                    "conv_id": pa.array([], pa.string()),
                    "valid": pa.array([], pa.int64()),
                }
            )
        conv = t.column("conv_id")
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = pc.not_equal(conv.slice(1), conv.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
        code = t["role_code"].to_numpy(zero_copy_only=False)
        tidx = t["turn_idx"].to_numpy(zero_copy_only=False)
        rep = np.zeros(n, dtype=bool)
        rep[1:] = (~new[1:]) & (code[1:] == code[:-1]) & (code[1:] != 3)
        badstart = (tidx == 0) & (code != 0) & (code != 2)
        latesys = (tidx > 0) & (code == 2)
        bad = rep | badstart | latesys
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], n)
        any_bad = np.add.reduceat(bad.astype(np.int64), starts) > 0
        first_conv = conv.take(pa.array(starts))
        return pa.table(
            {
                "conv_id": first_conv,
                "valid": pa.array((~any_bad).astype(np.int64)),
            }
        )

    tagged = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    return tagged.groupby("_b").map_groups(
        lambda g: validate_bucket(g.drop_columns(["_b"])), batch_format="pyarrow"
    )


def sft_pairs(
    transcript_paths, num_buckets=None
) -> ray.data.Dataset:
    """SFT PAIR MINING — the dataset-construction step that turns raw
    transcripts into supervised (prompt, response) examples: every
    adjacent turn pair where a 'user' turn is immediately followed (in
    turn order, positionally) by an 'assistant' turn emits one training
    pair carrying the prompt's turn_idx.

    Same physical shape as ``valid_role_alternation``: rows bucket on
    hash(conv_id) — the engine's one partitioning key — each bucket
    lexsorts once, and the pair predicate evaluates as a vectorized
    shift-compare over run boundaries (a pair never crosses a conv
    boundary). Text rides the shuffle once; no per-conv Python."""
    num_buckets = resolve_num_buckets(num_buckets, transcript_paths)
    ds = _transcript_ds(transcript_paths, ["conv_id", "turn_idx", "role", "text"])

    def tag(batch: pa.Table) -> pa.Table:
        conv = batch["conv_id"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "_b": pa.array(
                    (_hash_conv_ids(conv) % num_buckets).astype(np.int32)
                ),
                "conv_id": batch["conv_id"],
                "turn_idx": pc.cast(batch["turn_idx"], pa.int32()),
                "role": batch["role"],
                "text": batch["text"],
            }
        )

    def pair_bucket(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "conv_id": pa.array([], pa.string()),
                "prompt_idx": pa.array([], pa.int32()),
                "prompt": pa.array([], pa.string()),
                "response": pa.array([], pa.string()),
            }
        )
        t = group.sort_by(
            [("conv_id", "ascending"), ("turn_idx", "ascending")]
        ).combine_chunks()
        n = t.num_rows
        if n < 2:
            return empty
        conv = t.column("conv_id")
        same_conv = pc.equal(conv.slice(1), conv.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
        role = t.column("role")
        is_user = pc.equal(pc.fill_null(role, ""), "user").to_numpy(
            zero_copy_only=False
        )
        is_asst = pc.equal(pc.fill_null(role, ""), "assistant").to_numpy(
            zero_copy_only=False
        )
        left = np.flatnonzero(is_user[:-1] & is_asst[1:] & same_conv)
        if len(left) == 0:
            return empty
        li = pa.array(left)
        ri = pa.array(left + 1)
        return pa.table(
            {
                "conv_id": conv.take(li),
                "prompt_idx": t.column("turn_idx").take(li),
                "prompt": t.column("text").take(li),
                "response": t.column("text").take(ri),
            }
        )

    tagged = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    return tagged.groupby("_b").map_groups(
        lambda g: pair_bucket(g.drop_columns(["_b"])), batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# link statistics (href extraction over embedded HTML payloads)
# ---------------------------------------------------------------------------

LINK_PATTERN = r'href="([^"]*)"'


class _LinkExtract:
    """Per-turn href extraction: the regex compiles once per actor
    (T-pattern), and a vectorized ``match_substring`` gate keeps rows
    without the literal ``href="`` marker out of Python entirely — the
    same sniff-gate shape as the flagship extractor (most turns carry
    no HTML payload). A (conv_id, turn_idx) lives on exactly ONE input
    row, so the per-row href counts emitted here are already complete
    per-turn aggregates; only (href, conv_id, n) triples reach the
    shuffle."""

    def __init__(self, num_buckets: int):
        import re

        self._re = re.compile(LINK_PATTERN)
        self._nb = num_buckets

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch.column("text"), "")
        gate = pc.match_substring(text, 'href="').to_numpy(zero_copy_only=False)
        idx = np.flatnonzero(gate)
        out_href: list[str] = []
        out_conv: list[str] = []
        out_n: list[int] = []
        if idx.size:
            conv = batch.column("conv_id").to_numpy(zero_copy_only=False)[idx]
            cand = text.take(pa.array(idx)).to_pylist()
            for cid, s in zip(conv, cand):
                counts: dict[str, int] = {}
                for h in self._re.findall(s):
                    counts[h] = counts.get(h, 0) + 1
                for h, n in counts.items():
                    out_href.append(h)
                    out_conv.append(cid)
                    out_n.append(n)
        href = pa.array(out_href, pa.string())
        h1, h2 = text_hash128(href, "engine-linkskey")
        return pa.table(
            {
                "_lb": pa.array(_bucket_of(h1, h2, num_buckets=self._nb)),
                "href": href,
                "conv_id": pa.array(out_conv, pa.string()),
                "n": pa.array(out_n, pa.int64()),
            }
        )


def link_stats(
    transcript_paths, num_buckets=None
) -> ray.data.Dataset:
    """Corpus-wide link popularity over the hrefs embedded in turn text
    -> (href, n_occurrences, n_turns, n_convs). This is the link-graph
    frequency signal a boilerplate stripper feeds on (nav/footer links
    recur across conversations; article links don't) — the corpus-level
    complement of the per-document link-density heuristic in
    engine/html_extract.py. Operates on the RAW turn text: hrefs inside
    a base64 data-URL payload are out of scope on BOTH the engine and
    the oracle side (same visibility contract).

    Scale shape: ONE shuffle, bucketed by a 128-bit href hash (the
    dedup_exact collision contract); rows are (href, conv_id, n) where
    the per-turn counting already happened batch-locally. One
    map_groups per BUCKET computes all three aggregates vectorized from
    run boundaries (sum n per href run = occurrences, rows per run =
    turns, (href, conv) sub-runs = distinct convs — every occurrence of
    an href shares its bucket, so in-bucket runs are global)."""
    num_buckets = resolve_num_buckets(num_buckets, transcript_paths)
    ensure_serializable()
    # turn_idx never leaves this op: a turn is one input row, so the
    # per-turn identity is the row itself — don't decode the column
    ds = _transcript_ds(transcript_paths, ["conv_id", "text"])
    tagged = ds.map_batches(
        _LinkExtract,
        fn_constructor_args=(num_buckets,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=pool_size(),
        num_cpus=1,
    )

    def stats_bucket(group: pa.Table) -> pa.Table:
        t = group.sort_by(
            [("href", "ascending"), ("conv_id", "ascending")]
        ).combine_chunks()
        if t.num_rows == 0:
            return pa.table(
                {
                    "href": pa.array([], pa.string()),
                    "n_occurrences": pa.array([], pa.int64()),
                    "n_turns": pa.array([], pa.int64()),
                    "n_convs": pa.array([], pa.int64()),
                }
            )
        href = np.asarray(t.column("href").to_pylist(), dtype=object)
        conv = np.asarray(t.column("conv_id").to_pylist(), dtype=object)
        n = t.column("n").to_numpy(zero_copy_only=False)
        new_h = _run_starts(href)
        hid = np.cumsum(new_h) - 1
        n_occ = np.bincount(hid, weights=n).astype(np.int64)
        n_turns = np.bincount(hid).astype(np.int64)
        conv_start = _run_starts(href, conv)
        n_convs = np.bincount(hid[conv_start]).astype(np.int64)
        return pa.table(
            {
                "href": pa.array(href[new_h]),
                "n_occurrences": pa.array(n_occ),
                "n_turns": pa.array(n_turns),
                "n_convs": pa.array(n_convs),
            }
        )

    return tagged.groupby("_lb").map_groups(
        lambda g: stats_bucket(g.drop_columns(["_lb"])), batch_format="pyarrow"
    )


def tool_chain_hist(transcript_paths, num_buckets=None) -> ray.data.Dataset:
    """Histogram of the LONGEST consecutive tool-turn chain per
    conversation — the agent-transcript analytics report (how deep do
    tool-call loops run before a model turn interrupts). Conversations
    with no tool turns are absent, matching the SQL oracle's island
    aggregation; this is the engine's gaps-and-islands shape: an island
    is a maximal run of turn_idx values with step exactly 1.

    Scale shape: the role filter is pushed INTO the scan (only tool
    turns leave storage — usually a small fraction); ONE hash(conv_id)
    bucket shuffle of (conv, turn_idx) int rows; per bucket a single
    sort + island run-length + per-conv max, emitting bounded
    (chain_len, count) partials; the final groupby is bounded by the
    longest chain."""
    import pyarrow.dataset as pads
    from ray.data.aggregate import Sum as _Sum

    ensure_serializable()
    num_buckets = resolve_num_buckets(num_buckets, transcript_paths)
    if isinstance(transcript_paths, ray.data.Dataset):
        ds = transcript_paths.select_columns(["conv_id", "turn_idx", "role"])
        def only_tool(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.equal(batch["role"], "tool"))
        ds = ds.map_batches(only_tool, batch_format="pyarrow", zero_copy_batch=True)
    else:
        ds = ray.data.read_parquet(
            transcript_paths,
            columns=["conv_id", "turn_idx"],
            filter=pads.field("role") == "tool",
        )

    def tag(batch: pa.Table) -> pa.Table:
        h = _hash_conv_ids(
            batch["conv_id"].to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "_b": pa.array((h % num_buckets).astype(np.int32)),
                "conv_hash": pa.array(h.astype(np.int64)),
                "turn_idx": pc.cast(batch["turn_idx"], pa.int64()),
            }
        )

    def chains(group: pa.Table) -> pa.Table:
        t = group.sort_by(
            [("conv_hash", "ascending"), ("turn_idx", "ascending")]
        ).combine_chunks()
        empty = pa.table(
            {"chain_len": pa.array([], pa.int64()),
             "n_convs": pa.array([], pa.int64())}
        )
        n = t.num_rows
        if n == 0:
            return empty
        ch = t["conv_hash"].to_numpy(zero_copy_only=False)
        ti = t["turn_idx"].to_numpy(zero_copy_only=False)
        new_island = np.empty(n, dtype=bool)
        new_island[0] = True
        new_island[1:] = (ch[1:] != ch[:-1]) | (ti[1:] != ti[:-1] + 1)
        starts = np.flatnonzero(new_island)
        lens = np.diff(np.append(starts, n))
        # per-conversation MAX island: islands of one conv are adjacent
        conv_of_island = ch[starts]
        conv_start = np.flatnonzero(_run_starts(conv_of_island))
        max_chain = np.maximum.reduceat(lens, conv_start)
        cu, cc = np.unique(max_chain, return_counts=True)
        return pa.table(
            {"chain_len": pa.array(cu.astype(np.int64)),
             "n_convs": pa.array(cc.astype(np.int64))}
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_b")
        .map_groups(
            lambda g: chains(g.drop_columns(["_b"])), batch_format="pyarrow"
        )
        .groupby("chain_len")
        .aggregate(_Sum("n_convs", alias_name="n_convs"))
    )


def conv_first_response_latency(
    transcript_paths, num_buckets=None
) -> ray.data.Dataset:
    """Per-conversation first-response latency: microseconds from the
    conversation's FIRST user turn to the first assistant turn AT OR
    AFTER it — the agent-responsiveness metric every transcript
    dashboard plots. Conversations without a user turn, or whose every
    assistant turn precedes the first user turn, are absent (matching
    the oracle's join semantics).

    Scale shape: min/conditional-min are algebraic, so per-batch
    ``group_by(conv)`` partials carry three int64s per conversation per
    batch (first-user ts, and the two-pass trick for
    "first assistant >= first user": per-bucket resolution against the
    conversation's GLOBAL first-user ts — all of a conversation's rows
    co-locate in its hash bucket, so the bucket pass sees every
    candidate). One conv-bucket shuffle; text never moves."""
    ensure_serializable()
    num_buckets = resolve_num_buckets(num_buckets, transcript_paths)
    ds = _transcript_ds(transcript_paths, ["conv_id", "role", "ts"])

    def tag(batch: pa.Table) -> pa.Table:
        role = batch["role"].to_numpy(zero_copy_only=False)
        keep = (role == "user") | (role == "assistant")
        t = batch.filter(pa.array(keep))
        cid = t["conv_id"].to_numpy(zero_copy_only=False)
        h = _hash_conv_ids(cid)
        return pa.table(
            {
                "_b": pa.array((h % num_buckets).astype(np.int32)),
                "conv_id": t["conv_id"],
                "is_user": pc.equal(t["role"], "user"),
                "ts_us": pc.cast(t["ts"], pa.int64()),
            }
        )

    def latency_bucket(group: pa.Table) -> pa.Table:
        t = group.combine_chunks()
        empty = pa.table(
            {"conv_id": pa.array([], pa.string()),
             "latency_us": pa.array([], pa.int64())}
        )
        if t.num_rows == 0:
            return empty
        cid = t["conv_id"].to_numpy(zero_copy_only=False)
        is_user = t["is_user"].to_numpy(zero_copy_only=False)
        ts = t["ts_us"].to_numpy(zero_copy_only=False)
        # all rows of a conversation are in this bucket: group by conv
        # (mins are order-independent within the run)
        order = np.argsort(cid, kind="stable")
        cid_s = cid[order]
        heads = np.flatnonzero(_run_starts(cid_s))
        sizes = np.diff(np.append(heads, cid_s.size))
        iu = is_user[order]
        ts_s = ts[order]
        out_c, out_l = [], []
        big = np.iinfo(np.int64).max
        # vectorized per-run: first user ts = min over user rows;
        # first assistant >= that = min over assistant rows >= threshold
        u_ts = np.where(iu, ts_s, big)
        a_ts = np.where(~iu, ts_s, big)
        first_user = np.minimum.reduceat(u_ts, heads)
        # conditional min needs the threshold per row:
        thr = np.repeat(first_user, sizes)
        a_ok = np.where((~iu) & (ts_s >= thr), ts_s, big)
        first_resp = np.minimum.reduceat(a_ok, heads)
        valid = (first_user != big) & (first_resp != big)
        conv_heads = cid_s[heads]
        return pa.table(
            {
                "conv_id": pa.array(conv_heads[valid]),
                "latency_us": pa.array(
                    (first_resp - first_user)[valid].astype(np.int64)
                ),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_b")
        .map_groups(
            lambda g: latency_bucket(g.drop_columns(["_b"])),
            batch_format="pyarrow",
        )
    )
