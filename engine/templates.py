"""Conversation-template rendering (SURVEY M1/M2 analog).

The reference renders (role, message) lists through a registry of named
separator-style templates with override semantics
(/root/reference/crates/core/src/conversation/mod.rs:53-145,166-191).
Here the registry is a module-level dict of pure functions; rendering is
a per-conversation grouped stage over the transcript table using the
same bucketed shuffle as the flagship ordering stage.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

Turn = Tuple[str, str]  # (role, text)


def _render_plain(turns: List[Turn]) -> str:
    # (text or "") — null text is legal input (M15 posture); the grouped
    # stage also fills nulls, but the registry functions are public surface
    return "\n".join(
        f"{role}: {text}" for role, text in turns if (text or "").strip()
    )


def _render_chatml(turns: List[Turn]) -> str:
    return "".join(
        f"<|im_start|>{role}\n{text}<|im_end|>\n"
        for role, text in turns
        if (text or "").strip()
    )


def _render_compact(turns: List[Turn]) -> str:
    """System + latest-user render — the history-compaction template
    (generation.rs:192-236: 'OCR models aren't conversation-trained')."""
    kept = compact_turns(turns)
    return "\n".join(f"{role}: {text}" for role, text in kept)


def compact_turns(turns: List[Turn]) -> List[Turn]:
    """Keep system turns before, and the latest user turn (M3 semantics)."""
    last_user = None
    for i, (role, _text) in enumerate(turns):
        if role == "user":
            last_user = i
    if last_user is None:
        return [t for t in turns if t[0] == "system"]
    return [
        t for i, t in enumerate(turns)
        if (t[0] == "system" and i < last_user) or i == last_user
    ]


# ---------------------------------------------------------------------------
# separator-style templates (M2): the reference ships four styles —
# DeepSeek / DeepSeekV2 / Plain / Alignment — parameterized by
# (system_template, roles, sep, sep2), where sep/sep2 ALTERNATE on the
# 0-based message index and the system message is injected through
# system_template before the first separator
# (/root/reference/crates/core/src/conversation/mod.rs:53-145; tests at
# crates/core/tests/conversation_templates.rs:1-18). Re-expressed here
# as a config dataclass + one renderer per style over (role, text)
# turn lists: the FIRST system turn supplies the system message; all
# system turns are excluded from the alternating message list.
# ---------------------------------------------------------------------------

from dataclasses import dataclass  # noqa: E402

from .normalize import SENTINEL  # noqa: E402

SFT_MARKER = "<|sft_begin|>\n"      # v2-style user-turn opener (analog)
PAYLOAD_MARKER = "<payload>\n"      # alignment-style even-slot marker


@dataclass(frozen=True)
class SepTemplate:
    """Separator-style template config (ConversationTemplate analog)."""

    style: str                       # deepseek | deepseek_v2 | sep_plain | alignment
    system_template: str = "{system_message}"
    roles: tuple = ("User", "Assistant")
    sep: str = "\n\n"
    sep2: str = ""


def _split_system(turns: List[Turn]) -> tuple:
    """(system_message, non-system messages). First system turn wins the
    system slot; system turns never join the alternating message list."""
    system_message = ""
    msgs: List[Turn] = []
    seen_system = False
    for role, text in turns:
        role = role or ""
        text = text or ""
        if role == "system":
            if not seen_system:
                system_message = text
                seen_system = True
            continue
        msgs.append((role, text))
    return system_message, msgs


def _display_role(cfg: SepTemplate, role: str) -> str:
    if role == "user":
        return cfg.roles[0]
    if role == "assistant":
        return cfg.roles[1]
    return role


def _system_prefix(cfg: SepTemplate, system_message: str) -> str:
    rendered = cfg.system_template.replace("{system_message}", system_message)
    return rendered + cfg.sep if rendered else ""


def render_sep_style(cfg: SepTemplate, turns: List[Turn]) -> str:
    """Render one conversation through a separator-style template.

    Semantics per style (matching the reference's four renderers):
    - deepseek:    "Role: content" + sep/sep2 alternating on message
                   index parity; empty-after-strip content renders the
                   bare "Role:" with NO separator; system prefix + sep.
    - deepseek_v2: user turns open with SFT_MARKER and close with sep;
                   other turns emit bare content + sep2; empties skipped;
                   system prefix + sep.
    - sep_plain:   content + sep/sep2 alternating; no roles, no system.
    - alignment:   even-index slots emit PAYLOAD_MARKER + sep (content
                   ignored); odd emit content + sep2; empties skipped.
    Index parity counts ALL messages (skipped ones still consume an
    index), exactly like the reference's enumerate-then-filter order.
    """
    system_message, msgs = _split_system(turns)
    out: List[str] = []
    if cfg.style in ("deepseek", "deepseek_v2"):
        prefix = _system_prefix(cfg, system_message)
        if prefix:
            out.append(prefix)
    seps = (cfg.sep, cfg.sep2)
    for idx, (role, text) in enumerate(msgs):
        content = text.strip()
        if cfg.style == "deepseek":
            if content:
                out.append(f"{_display_role(cfg, role)}: {content}{seps[idx % 2]}")
            else:
                out.append(f"{_display_role(cfg, role)}:")
        elif cfg.style == "deepseek_v2":
            if not content:
                continue
            if role == "user":
                out.append(f"{SFT_MARKER}{content}{cfg.sep}")
            else:
                out.append(f"{content}{cfg.sep2}")
        elif cfg.style == "sep_plain":
            if content:
                out.append(f"{content}{seps[idx % 2]}")
        elif cfg.style == "alignment":
            if not content:
                continue
            if idx % 2 == 0:
                out.append(f"{PAYLOAD_MARKER}{seps[0]}")
            else:
                out.append(f"{content}{seps[1]}")
        else:  # pragma: no cover
            raise ValueError(f"unknown separator style {cfg.style!r}")
    return "".join(out)


SEP_TEMPLATES: Dict[str, SepTemplate] = {
    "deepseek": SepTemplate(style="deepseek", sep="\n\n", sep2=SENTINEL),
    "deepseek_v2": SepTemplate(style="deepseek_v2", sep="", sep2=SENTINEL),
    "sep_plain": SepTemplate(style="sep_plain", sep="\n", sep2="\n"),
    "alignment": SepTemplate(style="alignment", sep="\n", sep2="\n"),
}


def _sep_renderer(name: str) -> Callable[[List[Turn]], str]:
    cfg = SEP_TEMPLATES[name]
    return lambda turns: render_sep_style(cfg, turns)


TEMPLATES: Dict[str, Callable[[List[Turn]], str]] = {
    "plain": _render_plain,
    "chatml": _render_chatml,
    "compact": _render_compact,
    **{name: _sep_renderer(name) for name in SEP_TEMPLATES},
}


def register_template(name: str, fn: Callable[[List[Turn]], str],
                      override: bool = False) -> None:
    """Registry with override semantics (conversation/mod.rs:176-184)."""
    if name in TEMPLATES and not override:
        raise ValueError(f"template {name!r} already registered")
    TEMPLATES[name] = fn


def _bucketed(ds: ray.data.Dataset, num_buckets: int = 64) -> ray.data.Dataset:
    from .pipeline import _hash_conv_ids

    def add_bucket(batch: pa.Table) -> pa.Table:
        conv = batch.column("conv_id").to_numpy(zero_copy_only=False)
        bucket = (_hash_conv_ids(conv) % num_buckets).astype(np.int32)
        return batch.append_column("_bucket", pa.array(bucket))

    return ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)


def render_conversations(
    transcript_paths, template: str = "plain", num_buckets: int = 64
) -> ray.data.Dataset:
    """One rendered prompt string per conversation.

    Same partitioning contract as the flagship ordering stage: bucketed
    by hash(conv_id), turns sorted within conversation before rendering.
    """
    from ._rayutil import ensure_serializable

    ensure_serializable()
    render = TEMPLATES[template]
    ds = ray.data.read_parquet(
        transcript_paths, columns=["conv_id", "turn_idx", "role", "text"]
    )

    def render_bucket(group: pa.Table) -> pa.Table:
        t = group.sort_by(
            [("conv_id", "ascending"), ("turn_idx", "ascending")]
        ).combine_chunks()
        ids = t.column("conv_id").to_numpy(zero_copy_only=False)
        roles = pc.fill_null(t.column("role"), "").to_pylist()
        texts = pc.fill_null(t.column("text"), "").to_pylist()
        n = len(ids)
        if n == 0:
            return pa.table(
                {"conv_id": pa.array([], pa.string()),
                 "rendered": pa.array([], pa.string()),
                 "n_turns": pa.array([], pa.int64())}
            )
        new_conv = np.empty(n, dtype=bool)
        new_conv[0] = True
        new_conv[1:] = ids[1:] != ids[:-1]
        starts = np.flatnonzero(new_conv)
        ends = np.append(starts[1:], n)
        out_ids, out_text, out_n = [], [], []
        for s, e in zip(starts, ends):
            out_ids.append(ids[s])
            out_text.append(render(list(zip(roles[s:e], texts[s:e]))))
            out_n.append(e - s)
        return pa.table(
            {"conv_id": pa.array(out_ids, pa.string()),
             "rendered": pa.array(out_text, pa.string()),
             "n_turns": pa.array([int(x) for x in out_n], pa.int64())}
        )

    return _bucketed(ds, num_buckets).groupby("_bucket").map_groups(
        lambda g: render_bucket(g.drop_columns(["_bucket"])),
        batch_format="pyarrow",
    )


def compact_history(transcript_paths, num_buckets: int = 64) -> ray.data.Dataset:
    """M3 as a standalone operator: per conversation emit only the system
    turns preceding the latest user turn, plus that user turn."""
    from ._rayutil import ensure_serializable

    ensure_serializable()
    ds = ray.data.read_parquet(
        transcript_paths, columns=["conv_id", "turn_idx", "role", "text"]
    )

    def compact_bucket(group: pa.Table) -> pa.Table:
        t = group.sort_by(
            [("conv_id", "ascending"), ("turn_idx", "ascending")]
        ).combine_chunks()
        ids = t.column("conv_id").to_numpy(zero_copy_only=False)
        roles = np.asarray(pc.fill_null(t.column("role"), "").to_pylist())
        n = len(ids)
        keep = np.zeros(n, dtype=bool)
        if n:
            new_conv = np.empty(n, dtype=bool)
            new_conv[0] = True
            new_conv[1:] = ids[1:] != ids[:-1]
            starts = np.flatnonzero(new_conv)
            ends = np.append(starts[1:], n)
            is_user = roles == "user"
            is_system = roles == "system"
            for s, e in zip(starts, ends):
                user_idx = np.flatnonzero(is_user[s:e])
                if len(user_idx):
                    last = s + user_idx[-1]
                    keep[last] = True
                    keep[s:last] |= is_system[s:last]
                else:
                    keep[s:e] = is_system[s:e]
        return t.drop_columns(["_bucket"]).filter(pa.array(keep))

    return _bucketed(ds, num_buckets).groupby("_bucket").map_groups(
        compact_bucket, batch_format="pyarrow"
    )
