"""Conversation-template rendering (SURVEY M1/M2 analog).

The reference renders (role, message) lists through a registry of named
separator-style templates with override semantics
(/root/reference/crates/core/src/conversation/mod.rs:53-145,166-191).
Here the registry is a module-level dict of pure functions; rendering is
a per-conversation grouped stage over the transcript table using the
same bucketed shuffle as the flagship ordering stage.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Tuple

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


# ---------------------------------------------------------------------------
# vectorized renderers — Arrow-kernel parity twins of the Python registry
# ---------------------------------------------------------------------------
# The Python functions above stay the public/extension surface and the
# differential-test comparator (same discipline as normalize_text /
# normalize_arrow); the grouped stage renders whole buckets through the
# kernels below — measured 34s -> ~12s at sf0.1 (620k turns), because a
# per-conversation Python loop paid one interpreter call per turn.
# Custom templates registered via register_template() (including
# override=True on a builtin name) automatically fall back to the loop.

_KERNEL_SET = {
    "plain", "chatml", "compact",
    "deepseek", "deepseek_v2", "sep_plain", "alignment",
}


def _run_bounds(col: pa.Array, n: int):
    """(run starts, run sizes) over an already-sorted key column, compared
    in Arrow (no per-row Python string compare)."""
    new = np.empty(n, dtype=bool)
    new[0] = True
    new[1:] = pc.not_equal(col.slice(1), col.slice(0, n - 1)).to_numpy(
        zero_copy_only=False
    )
    starts = np.flatnonzero(new)
    return starts, np.diff(np.append(starts, n))


def _cat(*parts) -> pa.Array:
    """Element-wise concatenation (strings and broadcast scalars)."""
    return pc.binary_join_element_wise(*parts, "")


def _join_per_conv(
    pieces: pa.Array, keep: np.ndarray, starts: np.ndarray, n: int, sep: str
) -> pa.Array:
    """Join each conversation's kept pieces with ``sep``: filter, build a
    zero-copy ListArray from per-conv kept counts, one binary_join."""
    kept = pieces.filter(pa.array(keep))
    csum = np.concatenate(([0], np.cumsum(keep.astype(np.int64))))
    bounds = np.append(starts, n)
    offsets = csum[bounds].astype(np.int32)
    lists = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), kept)
    return pc.binary_join(lists, sep)


def _last_user_keep(roles: pa.Array, starts, sizes, n: int) -> np.ndarray:
    """compact_turns as a mask: system turns before the latest user turn,
    plus that user turn; all system turns when a conv has no user turn."""
    is_user = pc.equal(roles, "user").to_numpy(zero_copy_only=False)
    is_sys = pc.equal(roles, "system").to_numpy(zero_copy_only=False)
    arange = np.arange(n)
    upos = np.where(is_user, arange, -1)
    last_user = np.repeat(np.maximum.reduceat(upos, starts), sizes)
    return np.where(
        last_user >= 0,
        (is_sys & (arange < last_user)) | (arange == last_user),
        is_sys,
    )


def _render_bucket_kernels(name: str, t: pa.Table) -> pa.Table:
    """One sorted bucket -> (conv_id, rendered, n_turns) per conversation,
    entirely in Arrow kernels + numpy run arithmetic."""
    n = t.num_rows
    empty = pa.table(
        {
            "conv_id": pa.array([], pa.string()),
            "rendered": pa.array([], pa.string()),
            "n_turns": pa.array([], pa.int64()),
        }
    )
    if n == 0:
        return empty
    conv = t.column("conv_id").combine_chunks()
    role = pc.fill_null(t.column("role"), "").combine_chunks()
    text = pc.fill_null(t.column("text"), "").combine_chunks()
    starts, sizes = _run_bounds(conv, n)
    stripped = pc.utf8_trim_whitespace(text)
    nonempty = pc.not_equal(stripped, "")
    nonempty_np = nonempty.to_numpy(zero_copy_only=False)

    prefix = None
    if name == "plain":
        keep, join_sep = nonempty_np, "\n"
        pieces = _cat(role, ": ", text)
    elif name == "chatml":
        keep, join_sep = nonempty_np, ""
        pieces = _cat("<|im_start|>", role, "\n", text, "<|im_end|>\n")
    elif name == "compact":
        keep, join_sep = _last_user_keep(role, starts, sizes, n), "\n"
        pieces = _cat(role, ": ", text)
    else:
        cfg = SEP_TEMPLATES[name]
        is_msg = pc.not_equal(role, "system").to_numpy(zero_copy_only=False)
        c = np.cumsum(is_msg)
        base = np.repeat(c[starts] - is_msg[starts], sizes)
        even = pa.array((c - 1 - base) % 2 == 0)
        sep_choice = pc.if_else(even, cfg.sep, cfg.sep2)
        join_sep = ""
        if name == "deepseek":
            disp = pc.if_else(
                pc.equal(role, "user"),
                cfg.roles[0],
                pc.if_else(pc.equal(role, "assistant"), cfg.roles[1], role),
            )
            pieces = pc.if_else(
                nonempty,
                _cat(disp, ": ", stripped, sep_choice),
                _cat(disp, ":"),
            )
            keep = is_msg
        elif name == "deepseek_v2":
            pieces = pc.if_else(
                pc.equal(role, "user"),
                _cat(SFT_MARKER, stripped, cfg.sep),
                _cat(stripped, cfg.sep2),
            )
            keep = is_msg & nonempty_np
        elif name == "sep_plain":
            pieces = _cat(stripped, sep_choice)
            keep = is_msg & nonempty_np
        else:  # alignment
            pieces = pc.if_else(
                even, pa.scalar(PAYLOAD_MARKER + cfg.sep), _cat(stripped, cfg.sep2)
            )
            keep = is_msg & nonempty_np
        if name in ("deepseek", "deepseek_v2"):
            # system prefix: first system turn's text through system_template
            is_sys = pc.equal(role, "system").to_numpy(zero_copy_only=False)
            spos = np.where(is_sys, np.arange(n), n)
            first = np.minimum.reduceat(spos, starts)
            valid = pa.array(first < np.append(starts[1:], n))
            sys_text = pc.if_else(
                valid, text.take(pa.array(np.where(first < n, first, 0))), ""
            )
            pre, _, post = cfg.system_template.partition("{system_message}")
            rendered_tpl = _cat(pre, sys_text, post)
            prefix = pc.if_else(
                pc.not_equal(rendered_tpl, ""), _cat(rendered_tpl, cfg.sep), ""
            )

    joined = _join_per_conv(pieces, keep, starts, n, join_sep)
    if prefix is not None:
        joined = _cat(prefix, joined)
    return pa.table(
        {
            "conv_id": conv.take(pa.array(starts)),
            "rendered": joined,
            "n_turns": pa.array(sizes.astype(np.int64)),
        }
    )


_BUILTIN_TEMPLATES: Dict[str, Callable] = dict(TEMPLATES)  # pre-override snapshot


def _read_for_buckets(
    transcript_paths, columns, num_buckets: int
) -> ray.data.Dataset:
    """Pruned transcript read sized for a downstream
    ``groupby("_bucket")``: the read block count is pinned to the bucket
    count. Ray's sort-based groupby creates one output range PER INPUT
    BLOCK, with boundaries sampled from the key values — when ranges
    greatly outnumber the key's cardinality the sampled quantiles
    degenerate (duplicate boundaries ⇒ empty ranges, off-quantile
    boundaries ⇒ ranges holding several whole buckets), turning a
    balanced 64-bucket exchange into a few 2×-sized straggler blocks
    whose reduce+render tasks serialize the tail. Measured on the
    620k-turn bench tier (alternated A/B, same session): default 224
    read blocks over 64 buckets = 9.4–30.1s; 64 blocks over 64 buckets
    = 4.6–12.9s. At cluster scale the same rule holds by raising BOTH
    together: buckets ≈ blocks ≈ corpus_bytes / target_block_size."""
    return ray.data.read_parquet(
        transcript_paths, columns=columns, override_num_blocks=num_buckets
    )


def _resolve_buckets(num_buckets, transcript_paths) -> int:
    """None -> cluster- and input-scaled default (pipeline
    resolve_num_buckets); a hard-coded constant here would cap every
    template/SFT shuffle at 64 reducers on a 256-node cluster."""
    from .pipeline import resolve_num_buckets

    return resolve_num_buckets(num_buckets, transcript_paths)


def _bucketed(ds: ray.data.Dataset, num_buckets: int) -> ray.data.Dataset:
    from .pipeline import _hash_conv_ids

    def add_bucket(batch: pa.Table) -> pa.Table:
        conv = batch.column("conv_id").to_numpy(zero_copy_only=False)
        bucket = (_hash_conv_ids(conv) % num_buckets).astype(np.int32)
        return batch.append_column("_bucket", pa.array(bucket))

    return ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)


def render_conversations(
    transcript_paths, template: str = "plain",
    num_buckets: Optional[int] = None,
) -> ray.data.Dataset:
    """One rendered prompt string per conversation.

    Same partitioning contract as the flagship ordering stage: bucketed
    by hash(conv_id), turns sorted within conversation before rendering.
    """
    from ._rayutil import ensure_serializable

    ensure_serializable()
    num_buckets = _resolve_buckets(num_buckets, transcript_paths)
    render = TEMPLATES[template]
    # kernel fast path only while the name still maps to the builtin —
    # a register_template(..., override=True) re-binding falls back to
    # the Python loop so extension semantics win over speed
    use_kernels = (
        template in _KERNEL_SET
        and TEMPLATES[template] is _BUILTIN_TEMPLATES.get(template)
    )
    ds = _read_for_buckets(
        transcript_paths, ["conv_id", "turn_idx", "role", "text"], num_buckets
    )

    def render_bucket(group: pa.Table) -> pa.Table:
        t = group.sort_by(
            [("conv_id", "ascending"), ("turn_idx", "ascending")]
        ).combine_chunks()
        if use_kernels:
            return _render_bucket_kernels(template, t)
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


def compact_history(
    transcript_paths, num_buckets: Optional[int] = None
) -> ray.data.Dataset:
    """M3 as a standalone operator: per conversation emit only the system
    turns preceding the latest user turn, plus that user turn."""
    from ._rayutil import ensure_serializable

    ensure_serializable()
    num_buckets = _resolve_buckets(num_buckets, transcript_paths)
    ds = _read_for_buckets(
        transcript_paths, ["conv_id", "turn_idx", "role", "text"], num_buckets
    )

    def compact_bucket(group: pa.Table) -> pa.Table:
        t = group.sort_by(
            [("conv_id", "ascending"), ("turn_idx", "ascending")]
        ).combine_chunks()
        n = t.num_rows
        if n == 0:
            return t.drop_columns(["_bucket"])
        starts, sizes = _run_bounds(t.column("conv_id"), n)
        roles = pc.fill_null(t.column("role"), "")
        keep = _last_user_keep(roles, starts, sizes, n)
        return t.drop_columns(["_bucket"]).filter(pa.array(keep))

    return _bucketed(ds, num_buckets).groupby("_bucket").map_groups(
        compact_bucket, batch_format="pyarrow"
    )


# RE2's ASCII \s class — [\t\n\f\r ], note NO \v — pinned so the numpy
# token counter and the DuckDB regexp_extract_all oracle agree.
_RE2_SPACE_CODES = np.array([9, 10, 12, 13, 32], dtype=np.uint32)


def _assistant_spans(t: pa.Table):
    """Shared span arithmetic for the SFT family (sft_masks /
    sft_token_spans / sft_pack) over one SORTED bucket table: the kept
    predicate, the segmented exclusive offset cumsum (+1 separator per
    preceding kept turn) and the assistant char-span projection live in
    exactly ONE place so the render rule can never drift between the
    three ops. Returns None when the bucket has no kept assistant
    turns, else a dict of parallel arrays (all assistant-filtered
    except k_conv/starts, which describe the kept rows)."""
    conv = t.column("conv_id").combine_chunks()
    role = pc.fill_null(t.column("role"), "").combine_chunks()
    text = pc.fill_null(t.column("text"), "").combine_chunks()
    kept = pc.not_equal(pc.utf8_trim_whitespace(text), "").to_numpy(
        zero_copy_only=False
    )
    if not kept.any():
        return None
    role_len = pc.utf8_length(role).to_numpy(zero_copy_only=False)
    text_len = pc.utf8_length(text).to_numpy(zero_copy_only=False)
    seg_len = (role_len + 2 + text_len)[kept]
    k_conv = conv.filter(pa.array(kept))
    m = len(seg_len)
    starts, sizes = _run_bounds(k_conv, m)
    cum = np.cumsum(seg_len)
    g = np.empty(m, dtype=np.int64)
    g[0] = 0
    g[1:] = cum[:-1]
    run_id = np.repeat(np.arange(len(starts)), sizes)
    offset = (g - g[starts][run_id]) + (np.arange(m) - starts[run_id])
    is_asst = pc.equal(role, "assistant").to_numpy(zero_copy_only=False)[kept]
    if not is_asst.any():
        return None
    span_start = (offset + role_len[kept] + 2)[is_asst]
    span_end = span_start + text_len[kept][is_asst]
    return {
        "k_conv": k_conv,
        "starts": starts,
        "a_run": run_id[is_asst],
        "a_conv": k_conv.filter(pa.array(is_asst)),
        "span_start": span_start.astype(np.int64),
        "span_end": span_end.astype(np.int64),
        "tidx": t.column("turn_idx")
        .to_numpy(zero_copy_only=False)[kept][is_asst]
        .astype(np.int64),
    }


def _token_prefix_counter(texts: list):
    """Rendered strings -> (count_prefix(rows, p), per-string totals):
    vectorized \\S+-run counting over the FLAT utf-32 codepoint buffer
    (token-start indicator + cumsum; one gather per queried prefix).
    count_prefix(rows, p) = number of nonspace runs intersecting
    texts[rows][:p] — the definitional spec shared with the DuckDB
    ``regexp_extract_all(substr(...), '\\S+')`` oracles."""
    codes = [np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32) for s in texts]
    lens = np.fromiter((c.size for c in codes), dtype=np.int64, count=len(codes))
    off = np.concatenate(([0], np.cumsum(lens)))
    flat = np.concatenate(codes) if codes else np.empty(0, dtype=np.uint32)
    nonspace = ~np.isin(flat, _RE2_SPACE_CODES)
    tok_flag = nonspace.copy()
    if flat.size:
        tok_flag[1:] &= ~nonspace[:-1]
        # conv boundary: position 0 of each string starts a token iff
        # nonspace, regardless of the previous string's last char
        cs = off[:-1][off[:-1] < flat.size]
        tok_flag[cs] = nonspace[cs]
    C = np.cumsum(tok_flag, dtype=np.int64)

    def count_prefix(rows: np.ndarray, p: np.ndarray) -> np.ndarray:
        o = off[rows]
        idx = o + p
        out = np.zeros(len(p), dtype=np.int64)
        nz = (idx > 0) & (p > 0)
        base = np.where(o > 0, C[np.maximum(o, 1) - 1], 0)
        out[nz] = C[idx[nz] - 1] - base[nz]
        return out

    totals = count_prefix(np.arange(len(texts), dtype=np.int64), lens)
    return count_prefix, totals


def _token_prefix_counts(
    texts: list, rows: np.ndarray, starts: np.ndarray, ends: np.ndarray
):
    """Batched form of ``_token_prefix_counter`` for a KNOWN query set —
    identical results (differential-fuzzed against it), a fraction of
    the memory traffic. Returns ``(tok_start, tok_end, totals)`` where
    ``tok_start[i]`` = tokens in ``texts[rows[i]][:starts[i]]`` (ditto
    ``ends``) and ``totals[j]`` = tokens in ``texts[j]``.

    The spec implementation materializes a full int64 running count
    (8 B/char written+read) over a concatenated utf-32 buffer
    (4 B/char, plus an np.isin pass); at ~43 M chars per bucket that is
    the dominant memory traffic of the whole SFT family. Here
    token-START POSITIONS are extracted per string (all intermediates
    cache-resident: explicit byte-value compares, no isin, no
    concatenated codepoint buffer, no flag array) into one sorted int64
    position list (~chars/6 entries), and every prefix count is a
    searchsorted difference against it — measured ~17x less wall on a
    bandwidth-throttled host, bit-equal by differential fuzz."""
    lens = np.fromiter((len(s) for s in texts), dtype=np.int64, count=len(texts))
    off = np.concatenate(([0], np.cumsum(lens)))
    pos_parts = []
    for i, s in enumerate(texts):
        c = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
        ns = ~((c == 9) | (c == 10) | (c == 12) | (c == 13) | (c == 32))
        f = ns.copy()
        if f.size:
            f[1:] &= ~ns[:-1]
        p = np.flatnonzero(f)
        if p.size:
            pos_parts.append(p + off[i])
    pos = (
        np.concatenate(pos_parts) if pos_parts
        else np.empty(0, dtype=np.int64)
    )

    rows = np.asarray(rows, dtype=np.int64)
    starts = np.asarray(starts, dtype=np.int64)
    ends = np.asarray(ends, dtype=np.int64)
    # token-start flags are string-local, so the count of tokens in
    # texts[r][:p] = #positions in [off[r], off[r]+p)
    o = off[rows]
    tok_start = np.searchsorted(pos, o + starts) - np.searchsorted(pos, o)
    tok_end = np.searchsorted(pos, o + ends) - np.searchsorted(pos, o)
    totals = np.searchsorted(pos, off[1:]) - np.searchsorted(pos, off[:-1])
    return tok_start, tok_end, totals


def _render_aligned(t: pa.Table, k_uniq: np.ndarray, who: str):
    """Plain-render the bucket and align kept-run conv ids onto the
    render rows (which include all-blank convs, rendered ''); loud
    ValueError on drift (M13 discipline). Returns (rendered table,
    r_conv object array, rpos: kept-run index -> render row)."""
    rendered = _render_bucket_kernels("plain", t)
    r_conv = np.asarray(rendered.column("conv_id").to_pylist(), dtype=object)
    rpos = np.searchsorted(r_conv, k_uniq)
    if (rpos >= len(r_conv)).any() or (r_conv[rpos] != k_uniq).any():
        raise ValueError(f"{who}: render/span conv alignment drift")
    return rendered, r_conv, rpos


def sft_masks(
    transcript_paths, num_buckets: Optional[int] = None
) -> ray.data.Dataset:
    """Loss-mask spans for SFT training -> one row per ASSISTANT turn:
    (conv_id, turn_idx, span_start, span_end), the char offsets of that
    turn's text inside the conversation's 'plain' render. An SFT
    trainer masks everything OUTSIDE these spans out of the loss; the
    span arithmetic is the flagship's M12-M14 discipline (char offsets,
    slice-back verifiable: rendered[start:end] == text) applied to
    example construction instead of payload extraction.

    Same physical shape as render_conversations: hash(conv_id) bucket
    shuffle, one vectorized pass per bucket — kept-segment lengths via
    utf8_length, a segmented EXCLUSIVE cumsum (+1 per preceding
    separator) gives every kept turn its render offset, and assistant
    rows project (offset + len(role) + 2, + len(text)). SQL oracle:
    the same arithmetic as window sums over the kept turns."""
    from ._rayutil import ensure_serializable

    ensure_serializable()
    num_buckets = _resolve_buckets(num_buckets, transcript_paths)
    ds = _read_for_buckets(
        transcript_paths, ["conv_id", "turn_idx", "role", "text"], num_buckets
    )

    def mask_bucket(group: pa.Table) -> pa.Table:
        t = group.sort_by(
            [("conv_id", "ascending"), ("turn_idx", "ascending")]
        ).combine_chunks()
        empty = pa.table(
            {
                "conv_id": pa.array([], pa.string()),
                "turn_idx": pa.array([], pa.int64()),
                "span_start": pa.array([], pa.int64()),
                "span_end": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        s = _assistant_spans(t)
        if s is None:
            return empty
        return pa.table(
            {
                "conv_id": s["a_conv"],
                "turn_idx": pa.array(s["tidx"]),
                "span_start": pa.array(s["span_start"]),
                "span_end": pa.array(s["span_end"]),
            }
        )

    return _bucketed(ds, num_buckets).groupby("_bucket").map_groups(
        mask_bucket, batch_format="pyarrow"
    )


def sft_token_spans(
    transcript_paths, num_buckets: Optional[int] = None
) -> ray.data.Dataset:
    """sft_masks' char spans projected into whitespace-TOKEN space ->
    (conv_id, turn_idx, tok_start, tok_end): tok_start / tok_end are
    the number of maximal nonspace runs intersecting
    rendered[:span_start] / rendered[:span_end] — i.e. exactly
    ``len(regexp_extract_all(substr(rendered, 1, p), '\\S+'))``, the
    definitional spec shared with the oracle. This is the form a
    trainer consumes (mask token ranges, not char ranges).

    One conv-bucket shuffle; per bucket the plain render is assembled
    with the same Arrow kernels render_conversations uses, the span
    arithmetic is sft_masks', and token counting is one vectorized
    pass: a token-start indicator over the bucket's FLAT rendered
    codepoint buffer, cumsum, then one gather per span endpoint.
    Space class pinned to RE2's ASCII \\s (no \\v) to match the
    oracle's regex engine."""
    from ._rayutil import ensure_serializable

    ensure_serializable()
    num_buckets = _resolve_buckets(num_buckets, transcript_paths)
    ds = _read_for_buckets(
        transcript_paths, ["conv_id", "turn_idx", "role", "text"], num_buckets
    )

    def token_bucket(group: pa.Table) -> pa.Table:
        t = group.sort_by(
            [("conv_id", "ascending"), ("turn_idx", "ascending")]
        ).combine_chunks()
        empty = pa.table(
            {
                "conv_id": pa.array([], pa.string()),
                "turn_idx": pa.array([], pa.int64()),
                "tok_start": pa.array([], pa.int64()),
                "tok_end": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        s = _assistant_spans(t)
        if s is None:
            return empty
        k_uniq = np.asarray(s["k_conv"].to_pylist(), dtype=object)[s["starts"]]
        rendered, _r_conv, rpos = _render_aligned(t, k_uniq, "sft_token_spans")
        a_rows = rpos[s["a_run"]]
        tok_start, tok_end, _totals = _token_prefix_counts(
            rendered.column("rendered").to_pylist(),
            a_rows, s["span_start"], s["span_end"],
        )
        return pa.table(
            {
                "conv_id": s["a_conv"],
                "turn_idx": pa.array(s["tidx"]),
                "tok_start": pa.array(tok_start),
                "tok_end": pa.array(tok_end),
            }
        )

    return _bucketed(ds, num_buckets).groupby("_bucket").map_groups(
        token_bucket, batch_format="pyarrow"
    )


SFT_SEQ_LEN = 256     # packed training-sequence length (tokens)
SFT_PACK_SPAN = 4096  # contiguous conv-int range per scan bucket


def _conv_int(conv_ids: np.ndarray) -> np.ndarray:
    """Parse the transcript fixture's 'conv-NNNNNNN' ids to int64 —
    the documented INPUT CONTRACT for the ordered pack scan (the same
    posture as kmeans' contiguous-seed contract: a different id scheme
    must fail loudly here, never silently mis-order the stream)."""
    out = np.empty(len(conv_ids), dtype=np.int64)
    for i, c in enumerate(conv_ids):
        if not c.startswith("conv-"):
            raise ValueError(f"sft_pack conv-id contract: {c!r}")
        out[i] = int(c[5:])
    return out


def sft_pack(
    transcript_paths, seq_len: int = SFT_SEQ_LEN,
    num_buckets: Optional[int] = None,
) -> ray.data.Dataset:
    """Pack every conversation's plain-render token stream (conv-int
    order, concatenated) into fixed ``seq_len`` windows and emit each
    assistant turn's loss-mask interval PER WINDOW ->
    (conv_id, turn_idx, seq_id, mask_start, mask_end). Spans straddling
    a window boundary split into one row per window — the final
    trainer-facing artifact composed from three engine primitives:
    sft_token_spans' token arithmetic, pack_sequences' global ordered
    prefix scan (contiguous conv-int buckets, driver cumsum of one tiny
    row per bucket, ray.put broadcast), and the rank-join co-location
    pattern for attaching conv start offsets to span rows.

    Shuffle inventory (all int-only rows + short conv ids): one
    conv-hash bucket pass computes per-conv token totals AND token
    spans together (materialized — feeds both scan passes, the
    pack_sequences precedent); the scan's two tiny passes; one
    contiguous-range bucket join+expand. The corpus text itself is
    touched exactly once."""
    from ._rayutil import ensure_serializable
    from .ops.textstats import _prefix_scan

    ensure_serializable()
    num_buckets = _resolve_buckets(num_buckets, transcript_paths)
    ds = _read_for_buckets(
        transcript_paths, ["conv_id", "turn_idx", "role", "text"], num_buckets
    )

    def prep_bucket(group: pa.Table) -> pa.Table:
        """Per conv-hash bucket: kind=0 rows carry (cid, n_tokens) per
        conv; kind=1 rows carry (cid, turn_idx, tok_start, tok_end) per
        assistant span — same machinery as sft_token_spans."""
        t = group.sort_by(
            [("conv_id", "ascending"), ("turn_idx", "ascending")]
        ).combine_chunks()
        empty = pa.table(
            {
                "kind": pa.array([], pa.int8()),
                "conv_id": pa.array([], pa.string()),
                "cid": pa.array([], pa.int64()),
                "turn_idx": pa.array([], pa.int64()),
                "tok_start": pa.array([], pa.int64()),
                "tok_end": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        rendered = _render_bucket_kernels("plain", t)
        r_conv = np.asarray(rendered.column("conv_id").to_pylist(), dtype=object)
        r_cid = _conv_int(r_conv)
        s = _assistant_spans(t)
        if s is None:
            a_rows = np.empty(0, dtype=np.int64)
            sp_start = sp_end = np.empty(0, dtype=np.int64)
        else:
            k_uniq = np.asarray(s["k_conv"].to_pylist(), dtype=object)[s["starts"]]
            rpos = np.searchsorted(r_conv, k_uniq)
            if (rpos >= len(r_conv)).any() or (r_conv[rpos] != k_uniq).any():
                raise ValueError("sft_pack: render/span conv alignment drift")
            a_rows = rpos[s["a_run"]]
            sp_start, sp_end = s["span_start"], s["span_end"]
        tok_start, tok_end, n_tok = _token_prefix_counts(
            rendered.column("rendered").to_pylist(), a_rows, sp_start, sp_end
        )
        totals = pa.table(
            {
                "kind": pa.array(np.zeros(len(r_conv), dtype=np.int8)),
                "conv_id": pa.array(r_conv, pa.string()),
                "cid": pa.array(r_cid),
                "turn_idx": pa.array(np.full(len(r_conv), -1, dtype=np.int64)),
                "tok_start": pa.array(np.zeros(len(r_conv), dtype=np.int64)),
                "tok_end": pa.array(n_tok),
            }
        )
        if s is None:
            return totals
        spans = pa.table(
            {
                "kind": pa.array(np.ones(a_rows.size, dtype=np.int8)),
                "conv_id": pa.array(r_conv[a_rows], pa.string()),
                "cid": pa.array(r_cid[a_rows]),
                "turn_idx": pa.array(s["tidx"]),
                "tok_start": pa.array(tok_start),
                "tok_end": pa.array(tok_end),
            }
        )
        return pa.concat_tables([totals, spans])

    prep = (
        _bucketed(ds, num_buckets)
        .groupby("_bucket")
        .map_groups(prep_bucket, batch_format="pyarrow")
        .materialize()  # feeds the scan passes AND the span join
    )

    def to_scan_rows(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch["kind"], 0))
        cid = t["cid"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "_sb": pa.array((cid // SFT_PACK_SPAN).astype(np.int64)),
                "doc_id": pa.array(cid),
                "n_tokens": t["tok_end"],
            }
        )

    scan_in = prep.map_batches(
        to_scan_rows, batch_format="pyarrow", zero_copy_batch=True
    )
    scanned, _total = _prefix_scan(scan_in, "n_tokens")

    def scanned_rows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "_sb": batch["_sb"],
                "conv_id": pa.array([""] * batch.num_rows, pa.string()),
                "cid": batch["doc_id"],
                "turn_idx": pa.array(np.full(batch.num_rows, -1, np.int64)),
                "tok_start": batch["start"],     # conv's global token offset
                "tok_end": pa.array(np.full(batch.num_rows, -1, np.int64)),
                "kind": pa.array(np.zeros(batch.num_rows, dtype=np.int8)),
            }
        )

    def span_rows(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch["kind"], 1))
        cid = t["cid"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "_sb": pa.array((cid // SFT_PACK_SPAN).astype(np.int64)),
                "conv_id": t["conv_id"],
                "cid": t["cid"],
                "turn_idx": t["turn_idx"],
                "tok_start": t["tok_start"],
                "tok_end": t["tok_end"],
                "kind": pa.array(np.ones(t.num_rows, dtype=np.int8)),
            }
        )

    both = scanned.map_batches(
        scanned_rows, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        prep.map_batches(span_rows, batch_format="pyarrow", zero_copy_batch=True)
    )

    def expand_bucket(group: pa.Table) -> pa.Table:
        t = group.combine_chunks()
        kind = t["kind"].to_numpy(zero_copy_only=False)
        cid = t["cid"].to_numpy(zero_copy_only=False)
        is_off = kind == 0
        o_cid = cid[is_off]
        o_start = t["tok_start"].to_numpy(zero_copy_only=False)[is_off]
        order = np.argsort(o_cid)
        o_cid, o_start = o_cid[order], o_start[order]
        s_cid = cid[~is_off]
        empty = pa.table(
            {
                "conv_id": pa.array([], pa.string()),
                "turn_idx": pa.array([], pa.int64()),
                "seq_id": pa.array([], pa.int64()),
                "mask_start": pa.array([], pa.int64()),
                "mask_end": pa.array([], pa.int64()),
            }
        )
        if s_cid.size == 0:
            return empty
        pos = np.clip(np.searchsorted(o_cid, s_cid), 0, max(o_cid.size - 1, 0))
        if o_cid.size == 0 or (o_cid[pos] != s_cid).any():
            raise ValueError("sft_pack: span's conv offset missing in bucket")
        base = o_start[pos]
        abs_s = base + t["tok_start"].to_numpy(zero_copy_only=False)[~is_off]
        abs_e = base + t["tok_end"].to_numpy(zero_copy_only=False)[~is_off]
        w_lo = abs_s // seq_len
        w_hi = (abs_e - 1) // seq_len
        counts = (w_hi - w_lo + 1).astype(np.int64)
        total = int(counts.sum())
        src = np.repeat(np.arange(s_cid.size), counts)
        block = np.concatenate(([0], np.cumsum(counts)[:-1]))
        w = w_lo[src] + (np.arange(total) - block[src])
        lo = w * seq_len
        mask_start = np.maximum(abs_s[src], lo) - lo
        mask_end = np.minimum(abs_e[src], lo + seq_len) - lo
        conv_sp = t["conv_id"].filter(pa.array(~is_off))
        tidx_sp = t["turn_idx"].to_numpy(zero_copy_only=False)[~is_off]
        return pa.table(
            {
                "conv_id": conv_sp.take(pa.array(src)),
                "turn_idx": pa.array(tidx_sp[src]),
                "seq_id": pa.array(w.astype(np.int64)),
                "mask_start": pa.array(mask_start.astype(np.int64)),
                "mask_end": pa.array(mask_end.astype(np.int64)),
            }
        )

    return both.groupby("_sb").map_groups(
        lambda g: expand_bucket(g.drop_columns(["_sb"])), batch_format="pyarrow"
    )


def dedup_convs(
    transcript_paths, num_buckets: Optional[int] = None
) -> ray.data.Dataset:
    """Conversation-level exact dedup: one representative per distinct
    PLAIN RENDER (the whole-conversation content key — the dedup an SFT
    pipeline runs before sft_pack so repeated conversations don't bias
    the mix) -> (conv_id = min id, n_dups). Same physical shape as
    dedup_exact: render (the one text pass), 128-bit content hash per
    conv, native Min/Count aggregates on int keys — rendered text never
    shuffles."""
    from ray.data.aggregate import Count, Min

    from .ops.dedup import text_hash128

    num_buckets = _resolve_buckets(num_buckets, transcript_paths)
    rendered = render_conversations(transcript_paths, num_buckets=num_buckets)

    def add_hash(batch: pa.Table) -> pa.Table:
        h1, h2 = text_hash128(batch["rendered"], "engine-convdkey")
        return pa.table(
            {
                "h1": pa.array(h1),
                "h2": pa.array(h2),
                "conv_id": batch["conv_id"],
            }
        )

    hashed = rendered.map_batches(
        add_hash, batch_format="pyarrow", zero_copy_batch=True
    )
    agg = hashed.groupby(["h1", "h2"]).aggregate(
        Min("conv_id", alias_name="conv_id"), Count(alias_name="n_dups")
    )
    return agg.select_columns(["conv_id", "n_dups"])
