"""PDF-lite layout parsing into reading-order text blocks.

Analog of the reference's tile decomposition + position metadata:
``dynamic_preprocess`` crops row-major tiles whose order IS the reading
order (/root/reference/crates/infer-deepseek/src/vision/preprocess.rs:60-76)
and ``build_position_metadata`` carries per-patch (pos, h, w) coordinates
(/root/reference/crates/infer-paddleocr/src/vision/preprocess.rs:178-235).

The PDF-lite container (FIXTURES.md SS1) is a textual stand-in for a real
PDF content stream — positioned text blocks with explicit layout
coordinates:

    %PDF-LITE 1.0
    @block page=1 y=72 x=36
    ACME Quarterly - Confidential
    @endblock
    @block page=1 y=144 x=36
    The merger was announced in Febru-
    ary and closed on time.
    @endblock
    %%EOF

Semantics (deterministic, shared with the oracle):

1. blocks sort into reading order by (page, y, x) — stable sort, so
   equal coordinates keep payload order;
2. running header/footer removal: a block whose cleaned text repeats on
   >= 2 distinct pages is boilerplate and dropped everywhere;
3. de-hyphenation: a line ending in ``-`` whose next line starts with a
   lowercase letter joins without the hyphen, otherwise lines join with
   a single space;
4. block text is whitespace-collapsed.
"""

from __future__ import annotations

import re
from typing import List, Tuple

from .normalize import collapse_ws

_BLOCK_RE = re.compile(
    r"@block page=(\d+) y=(\d+) x=(\d+)\n(.*?)\n?@endblock", re.DOTALL
)


def dehyphenate(text: str) -> str:
    """Join hard-wrapped lines, healing hyphenated breaks."""
    out: List[str] = []
    for line in text.split("\n"):
        line = line.strip()
        if not line:
            continue
        if out and out[-1].endswith("-") and line[:1].islower():
            out[-1] = out[-1][:-1] + line
        else:
            out.append(line)
    return " ".join(out)


def parse_blocks(payload: str) -> List[Tuple[int, int, int, str]]:
    """Parse (page, y, x, raw_text) tuples in payload order."""
    return [
        (int(m.group(1)), int(m.group(2)), int(m.group(3)), m.group(4))
        for m in _BLOCK_RE.finditer(payload)
    ]


def extract_pdfish_blocks(payload: str) -> List[Tuple[str, int, int, int]]:
    """PDF-lite payload -> reading-order (text, page, y, x) blocks.

    The coordinates survive into the output schema's ``blocks`` column
    (per-region structure like the reference's tile-grid order +
    position metadata, /root/reference/baselines/README.md:71-73,
    crates/infer-paddleocr/src/vision/preprocess.rs:178-235)."""
    raw = parse_blocks(payload)
    if not raw:
        return []
    cleaned = [
        (page, y, x, collapse_ws(dehyphenate(text))) for page, y, x, text in raw
    ]
    # Running header/footer detection: same text on >= 2 distinct pages.
    pages_by_text: dict = {}
    for page, _y, _x, text in cleaned:
        if text:
            pages_by_text.setdefault(text, set()).add(page)
    repeated = {t for t, pages in pages_by_text.items() if len(pages) >= 2}

    ordered = sorted(cleaned, key=lambda b: (b[0], b[1], b[2]))  # stable
    return [
        (text, p, y, x)
        for p, y, x, text in ordered
        if text and text not in repeated
    ]


def extract_pdfish(payload: str) -> List[str]:
    """PDF-lite payload -> reading-order list of cleaned text blocks."""
    return [text for text, _p, _y, _x in extract_pdfish_blocks(payload)]
