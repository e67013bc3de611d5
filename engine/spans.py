"""Span assembly: interleave literal text and extracted blocks, emit offsets.

Analog of the reference's prompt splicing + placeholder accounting:
``build_prompt_tokens`` interleaves literal token runs with per-image
placeholder runs and records the contiguous spans where injected content
sits (/root/reference/crates/infer-deepseek/src/model/mod.rs:2154-2222);
``build_image_placeholders`` enforces a hard equality between expected
and produced placeholder counts (model/mod.rs:2224-2279). We replicate
both: (start, end) CHAR offsets into the final extracted text for every
extracted block, and a loud invariant that every span slices back to its
block text (drift fails loudly, never silently — SURVEY SS7.6).

Offsets are character (not byte) offsets — the UTF-8 boundary discipline
of ``extract_delta`` (/root/reference/crates/core/src/streaming.rs:4-18).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

SEPARATOR = "\n\n"

Part = Tuple[str, bool]  # (text, is_extracted_block)


def assemble(parts: Sequence[Part]) -> Tuple[str, List[Tuple[int, int]]]:
    """Join non-empty parts with SEPARATOR; spans cover extracted blocks.

    Returns (extracted_text, [(start, end), ...]) where
    ``extracted_text[start:end] == block_text`` for every span —
    enforced here as a hard invariant (M13 analog).
    """
    pieces: List[str] = []
    spans: List[Tuple[int, int]] = []
    pos = 0
    for text, is_block in parts:
        if not text:
            continue
        if pieces:
            pos += len(SEPARATOR)
        if is_block:
            spans.append((pos, pos + len(text)))
        pieces.append(text)
        pos += len(text)
    out = SEPARATOR.join(pieces)
    for (start, end), expect in zip(
        spans, [t for t, b in parts if t and b]
    ):
        if out[start:end] != expect:
            raise AssertionError(
                f"span invariant violated: [{start}:{end}] != block text"
            )
    return out, spans
