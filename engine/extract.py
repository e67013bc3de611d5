"""Per-turn extraction entry point — pure, shared by pipeline and oracle.

This is the engine's ``decode()`` analog (the per-record entry of the
reference's OcrEngine trait, /root/reference/crates/core/src/
inference.rs:101-121): one turn in, normalized clean text + block spans
out. The Ray pipeline calls it per row inside ``map_batches``; the
oracle calls it row-at-a-time — by construction they cannot diverge.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

from .html_extract import extract_html
from .noise import filter_tool_output
from .normalize import normalize_text
from .pdf_extract import extract_pdfish
from .sniff import segment_turn
from .spans import Part, assemble

# User-extension surface: payload kind -> extractor, the analog of the
# OcrEngine registry dispatch (/root/reference/crates/cli/src/app.rs:87-91,
# SURVEY SS2.11). register_extractor() adds/overrides a kind.
EXTRACTORS = {
    "html": extract_html,
    "pdfish": extract_pdfish,
    "tool": filter_tool_output,
}


def register_extractor(kind: str, fn) -> None:
    """Register (or override) an extractor — conv-template-registry analog
    (/root/reference/crates/core/src/conversation/mod.rs:176-184)."""
    EXTRACTORS[kind] = fn


def extract_turn(text: str, role: str) -> Tuple[str, List[Tuple[int, int]], int]:
    """One turn -> (extracted_text, spans, n_blocks).

    Turns with no extractable payload pass through with normalized text
    and empty spans (missing-image fallback analog,
    /root/reference/crates/server/src/routes.rs:282-288).
    """
    parts: List[Part] = []
    for kind, seg in segment_turn(text, role):
        if kind == "literal":
            parts.append((normalize_text(seg), False))
        else:
            for block in EXTRACTORS[kind](seg):
                parts.append((block, True))
    extracted, spans = assemble(parts)
    return extracted, spans, len(spans)


def extract_turn_record(conv_id: str, turn_idx: int, role: str, text: str) -> Dict:
    """Row-shaped wrapper used by the oracle and tests."""
    extracted, spans, n_blocks = extract_turn(text, role)
    return {
        "conv_id": conv_id,
        "turn_idx": turn_idx,
        "role": role,
        "extracted_text": extracted,
        "spans": [{"start": s, "end": e} for s, e in spans],
        "n_blocks": n_blocks,
    }
