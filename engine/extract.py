"""Per-turn extraction entry point — pure, shared by pipeline and oracle.

This is the engine's ``decode()`` analog (the per-record entry of the
reference's OcrEngine trait, /root/reference/crates/core/src/
inference.rs:101-121): one turn in, normalized clean text + block spans
out. The Ray pipeline calls it per row inside ``map_batches``; the
oracle calls it row-at-a-time — by construction they cannot diverge.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

# Module-level imports only: this module is cloudpickled BY VALUE into
# Ray workers that cannot import ``engine`` by name (_rayutil docstring);
# a lazy relative import inside a function dies there with
# ModuleNotFoundError.
from .html_extract import extract_html, node_text, parse_html_fast
from .noise import filter_tool_output, strip_ansi
from .normalize import collapse_ws, normalize_text
from .pdf_extract import dehyphenate, extract_pdfish_blocks, parse_blocks
from .sniff import segment_turn
from .spans import SEPARATOR, Part, assemble

# User-extension surface: payload kind -> extractor, the analog of the
# OcrEngine registry dispatch (/root/reference/crates/cli/src/app.rs:87-91,
# SURVEY SS2.11). register_extractor() adds/overrides a kind.
#
# Extractor protocol: fn(payload) -> iterable of blocks, where a block is
# either a plain ``str`` (no layout coordinates) or a
# ``(text, page, y, x)`` tuple whose coordinates reach the output
# schema's ``blocks`` column (position-metadata analog, M10).
EXTRACTORS = {
    "html": extract_html,
    "pdfish": extract_pdfish_blocks,
    "tool": filter_tool_output,
}

# (page, y, x) for blocks with no layout position (HTML / tool output).
NO_COORDS = (-1, -1, -1)

BlockMeta = Tuple[str, int, int, int]  # (kind, page, y, x)

# Debug rule-slice (M16 analog of the reference's partial-layer env spec,
# /root/reference/crates/infer-deepseek/src/transformer/decoder.rs:22-41):
# ENGINE_EXTRACT_SLICE="a..b" keeps only extractor kinds [a, b) of
# sorted(EXTRACTORS); payloads of disabled kinds pass through as
# normalized literal text. Unset = all extractors active.
RULE_SLICE_ENV = "ENGINE_EXTRACT_SLICE"


def parse_rule_slice(spec: str) -> Tuple[int, int]:
    """Parse an 'a..b' slice spec (half-open, like the reference's)."""
    import re

    m = re.fullmatch(r"\s*(\d+)\.\.(\d+)\s*", spec)
    if not m:
        raise ValueError(f"bad {RULE_SLICE_ENV} spec {spec!r}; want 'a..b'")
    a, b = int(m.group(1)), int(m.group(2))
    if b < a:
        raise ValueError(f"bad {RULE_SLICE_ENV} spec {spec!r}: end < start")
    return a, b


def _active_kinds():
    import os

    spec = os.environ.get(RULE_SLICE_ENV)
    if not spec:
        return None  # all kinds active
    a, b = parse_rule_slice(spec)
    return frozenset(sorted(EXTRACTORS)[a:b])


def register_extractor(kind: str, fn) -> None:
    """Register (or override) an extractor — conv-template-registry analog
    (/root/reference/crates/core/src/conversation/mod.rs:176-184)."""
    EXTRACTORS[kind] = fn


# ---------------------------------------------------------------------------
# document-level canonicalization (M6: build_global_view analog)
# ---------------------------------------------------------------------------

def _global_html(payload: str) -> str:
    """Whole-document text view — every text node, NO candidate selection,
    so nav/sidebar/footer text the block extractor drops is retained."""
    return collapse_ws(node_text(parse_html_fast(payload)))


def _global_pdfish(payload: str) -> str:
    """All blocks in PAYLOAD order (no reading-order sort, no running
    header/footer removal) — the whole-page view."""
    texts = (
        collapse_ws(dehyphenate(t)) for _p, _y, _x, t in parse_blocks(payload)
    )
    return " ".join(t for t in texts if t)


def _global_tool(payload: str) -> str:
    """ANSI-stripped raw tool output, whitespace-collapsed — progress bars
    and traceback frames that the noise filter drops stay visible."""
    return collapse_ws(strip_ansi(payload))


# Whole-payload viewers per kind (the letterboxed global view of the
# reference, computed ALONGSIDE the per-region split —
# /root/reference/crates/infer-deepseek/src/model/mod.rs:1934-1956).
GLOBAL_VIEWERS = {
    "html": _global_html,
    "pdfish": _global_pdfish,
    "tool": _global_tool,
}


def build_global_view(text: str, role: str) -> str:
    """One turn -> its document-level canonical view: markup stripped,
    entities unescaped, whitespace collapsed — but boilerplate KEPT.

    This is the M6 analog of the reference's ``build_global_view``: a
    whole-document canonicalization computed alongside (not instead of)
    the per-region extraction. Downstream use: dedup/fingerprinting over
    the full content, where dropping boilerplate would make two pages
    with different nav bars but identical articles collide."""
    parts = []
    for kind, seg in segment_turn(text, role):
        view = (
            normalize_text(seg) if kind == "literal"
            else GLOBAL_VIEWERS[kind](seg)
        )
        if view:
            parts.append(view)
    return SEPARATOR.join(parts)


def extract_turn_full(
    text: str, role: str
) -> Tuple[str, List[Tuple[int, int]], List[BlockMeta]]:
    """One turn -> (extracted_text, spans, blocks).

    ``blocks[i]`` = (kind, page, y, x) for the block at ``spans[i]`` —
    the per-region structure of the reference's output (tile-grid order,
    /root/reference/baselines/README.md:71-73). Turns with no extractable
    payload pass through with normalized text and empty spans/blocks
    (missing-image fallback analog, routes.rs:282-288).
    """
    parts: List[Part] = []
    metas: List[BlockMeta] = []
    active = _active_kinds()
    for kind, seg in segment_turn(text, role):
        if kind == "literal" or (active is not None and kind not in active):
            parts.append((normalize_text(seg), False))
        else:
            for block in EXTRACTORS[kind](seg):
                if isinstance(block, str):
                    btext, coords = block, NO_COORDS
                else:
                    btext, coords = block[0], tuple(block[1:4])
                parts.append((btext, True))
                metas.append((kind, *coords))
    extracted, spans = assemble(parts)
    # M13-style accounting: one meta per surviving (non-empty) block part.
    block_texts = [t for t, is_b in parts if is_b]
    kept = [m for t, m in zip(block_texts, metas) if t]
    if len(kept) != len(spans):  # pragma: no cover - invariant
        raise AssertionError(
            f"block-meta count {len(kept)} != span count {len(spans)}"
        )
    return extracted, spans, kept


def extract_turn(text: str, role: str) -> Tuple[str, List[Tuple[int, int]], int]:
    """One turn -> (extracted_text, spans, n_blocks). Thin wrapper over
    extract_turn_full for callers that don't need block coordinates."""
    extracted, spans, _blocks = extract_turn_full(text, role)
    return extracted, spans, len(spans)


def extract_turn_record(conv_id: str, turn_idx: int, role: str, text: str) -> Dict:
    """Row-shaped wrapper used by the oracle and tests."""
    extracted, spans, blocks = extract_turn_full(text, role)
    return {
        "conv_id": conv_id,
        "turn_idx": turn_idx,
        "role": role,
        "extracted_text": extracted,
        "spans": [{"start": s, "end": e} for s, e in spans],
        "blocks": [
            {"kind": k, "page": p, "y": y, "x": x} for k, p, y, x in blocks
        ],
        "n_blocks": len(spans),
    }
