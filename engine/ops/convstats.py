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

from .._rayutil import ensure_serializable

TOKEN_RE = r"\S+"


def _transcript_ds(transcript_paths, columns) -> ray.data.Dataset:
    ensure_serializable()
    return ray.data.read_parquet(transcript_paths, columns=columns)


def conv_stats(transcript_paths) -> ray.data.Dataset:
    """Per-conversation: n_turns, n_tool_turns, n_chars, ts range (us)."""
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
        return t.group_by(["conv_id"]).aggregate(
            [
                ("is_tool", "count"), ("is_tool", "sum"),
                ("n_chars", "sum"), ("ts_us", "min"), ("ts_us", "max"),
            ]
        )

    from ray.data.aggregate import Max, Min, Sum

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return partials.groupby("conv_id").aggregate(
        Sum("is_tool_count", alias_name="n_turns"),
        Sum("is_tool_sum", alias_name="n_tool_turns"),
        Sum("n_chars_sum", alias_name="n_chars"),
        Min("ts_us_min", alias_name="first_ts_us"),
        Max("ts_us_max", alias_name="last_ts_us"),
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
