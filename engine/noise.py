"""Rule-based noise filters for tool-output payloads.

Analog of the reference's history compaction + missing-image fallback
(/root/reference/crates/server/src/generation.rs:192-236,
/root/reference/crates/server/src/routes.rs:282-288): role/tool-aware
filtering that decides which content carries signal. Tool output is
log-shaped text polluted with ANSI escapes, progress bars and repeated
traceback frames; the filter keeps the informative lines and groups
them into paragraph blocks.

Rules (deterministic, order matters):

1. strip ANSI escape sequences;
2. drop progress-bar / spinner / download-status lines;
3. collapse a traceback to its first line + the final exception line;
4. consecutive kept lines form one block; dropped or blank lines break
   blocks (so a tool turn can emit several spans).
"""

from __future__ import annotations

import re
from typing import List

from .normalize import collapse_ws

ANSI_RE = re.compile(r"\x1b\[[0-9;]*[A-Za-z]")

_DROP_RES = (
    re.compile(r"^\s*\d{1,3}%\|"),              # tqdm-style "45%|████..."
    re.compile(r"\[=*>?\s*\]"),                  # "[====>    ]" bars
    re.compile(r"^\s*[▀-▟]+\s*$"),     # bare block-glyph bars
    re.compile(r"^\s*(Downloading|Fetching|Extracting|Collecting)\b.*(\.\.\.|\d+%)\s*$"),
    re.compile(r"^\s*[-\\|/]\s*$"),              # spinner frames
    re.compile(r"^\s*\.+\s*$"),                  # "....." keepalive lines
)

_TB_HEAD = re.compile(r"^Traceback \(most recent call last\):\s*$")
_TB_FRAME = re.compile(r'^\s+(File "|at |\S)')  # indented frame/source lines


def strip_ansi(s: str) -> str:
    return ANSI_RE.sub("", s)


def _is_noise_line(line: str) -> bool:
    return any(rx.search(line) for rx in _DROP_RES)


def filter_tool_output(payload: str) -> List[str]:
    """Tool-output payload -> list of cleaned paragraph blocks."""
    lines = strip_ansi(payload).replace("\r\n", "\n").replace("\r", "\n").split("\n")

    kept: List[str] = []  # "" acts as a paragraph break marker
    i = 0
    n = len(lines)
    while i < n:
        line = lines[i]
        if _TB_HEAD.match(line):
            # Collapse the traceback: head line + final exception line.
            j = i + 1
            while j < n and _TB_FRAME.match(lines[j]):
                j += 1
            # lines[j-1] is the last frame-ish line; the exception message is
            # the first following non-indented, non-empty line if present.
            exc = None
            if j < n and lines[j].strip() and not lines[j].startswith(" "):
                exc = lines[j].strip()
                j += 1
            kept.append(line.strip())
            if exc is not None:
                kept.append(exc)
            i = j
            continue
        stripped = line.strip()
        if not stripped or _is_noise_line(line):
            kept.append("")  # paragraph break
        else:
            kept.append(stripped)
        i += 1

    blocks: List[str] = []
    cur: List[str] = []
    for item in kept:
        if item == "":
            if cur:
                blocks.append(collapse_ws("\n".join(cur)))
                cur = []
        else:
            cur.append(item)
    if cur:
        blocks.append(collapse_ws("\n".join(cur)))
    return [b for b in blocks if b]
