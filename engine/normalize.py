"""Exactness-critical text normalization shared by pipeline and oracle.

Analog of the reference's ``normalize_text`` (CRLF fold, sentinel strip,
trim — /root/reference/crates/core/src/inference.rs:142-147) and its
whitespace/trim conventions (SURVEY.md SS2.9). The reference's hardest
lesson (its fixed-point bicubic resampler exists solely for PIL parity)
is encoded here as: every rule lives in exactly ONE pure function used
by both the Ray pipeline and the oracle, and — where the pipeline has a
vectorized pyarrow fast path — the fast path is unit-tested for parity
against these functions (tests/test_normalize.py).
"""

from __future__ import annotations

import html as _html
import re

# Our analog of the reference's end-of-sentence sentinel
# ``<|end_of_sentence|>`` stripped by normalize_text
# (/root/reference/crates/core/src/inference.rs:144).
SENTINEL = "<|end_of_text|>"

_WS_RUN = re.compile(r"\s+")


def normalize_text(s: str) -> str:
    """CRLF/CR fold to LF, strip the eos sentinel, trim outer whitespace.

    Mirrors the semantics (not the code) of the reference's
    ``normalize_text`` at crates/core/src/inference.rs:142-147.
    """
    s = s.replace("\r\n", "\n").replace("\r", "\n")
    if SENTINEL in s:
        s = s.replace(SENTINEL, "")
    return s.strip()


def collapse_ws(s: str) -> str:
    """Collapse every whitespace run to a single space and trim.

    Applied to extracted block text (HTML/PDF blocks) so offsets are
    stable regardless of source formatting.

    ``" ".join(s.split())`` is semantically identical to
    ``re.sub(r"\\s+", " ", s).strip()`` (verified over every codepoint
    <= 0x11000: str.split's whitespace set equals re's \\s for str
    patterns) and ~4x faster — this is the hottest scalar in the HTML
    extractor after the parser itself.
    """
    return " ".join(s.split())


def unescape_entities(s: str) -> str:
    """HTML entity unescape (&amp; &#x27; ...) — single authority."""
    return _html.unescape(s)
