"""Payload-kind detection and turn-text segmentation.

Analog of the reference's ``flatten_content`` / ``prompt.split("<image>")``
slot discipline (/root/reference/crates/server/src/generation.rs:238-261,
/root/reference/crates/infer-deepseek/src/model/mod.rs:2154-2222): a turn's
``text`` is an interleaving of literal text and embedded payloads; the
payloads are detected by content sniffing rather than explicit markers.

Payload kinds (FIXTURES.md SS1):

- ``html``   — ``<!DOCTYPE html> ... </html>`` documents
- ``pdfish`` — ``%PDF-LITE ... %%EOF`` synthetic page layouts
- ``tool``   — a turn whose ``role`` is ``"tool"`` is one whole tool-output
  payload (role/tool-aware dispatch, the analog of history compaction's
  role awareness at /root/reference/crates/server/src/generation.rs:192-236)
- everything else is literal text.

The cheap marker predicates (``HTML_MARKER`` / ``PDF_MARKER``) exist so the
Ray pipeline can vectorize the "no payload at all" fast path with
``pyarrow.compute.match_substring`` and only run the Python segmenting
parser on rows that actually contain a payload.
"""

from __future__ import annotations

import base64
import binascii
import os
import re
from typing import List, Tuple

# bad-payload policy env (see segment_turn): unset/"" = fail-fast,
# "passthrough" = leave undecodable data-URL blobs as literal text
BAD_PAYLOAD_ENV = "ENGINE_BAD_PAYLOAD"

HTML_MARKER = "<!DOCTYPE html>"
PDF_MARKER = "%PDF-LITE"
# The reference's SECOND ingestion path: payloads arrive inline as
# data:<media-type>;base64,<payload> URLs and are decoded before
# dispatch; invalid base64 is rejected loudly
# (/root/reference/crates/server/src/generation.rs:263-290).
DATA_URL_MARKER = "data:"
DATA_HTML_MARKER = "data:text/html;base64,"
DATA_PDF_MARKER = "data:application/pdf-lite;base64,"

_HTML_RE = re.compile(r"<!DOCTYPE html>.*?</html\s*>", re.DOTALL | re.IGNORECASE)
_PDF_RE = re.compile(r"%PDF-LITE.*?%%EOF", re.DOTALL)
# the base64 run ends at the first non-alphabet char (whitespace, quote, ...)
_DATA_HTML_RE = re.compile(r"data:text/html;base64,([A-Za-z0-9+/=]*)")
_DATA_PDF_RE = re.compile(r"data:application/pdf-lite;base64,([A-Za-z0-9+/=]*)")

# A payload larger than this is truncated before parsing — the analog of
# the reference's smart_resize pixel budget bounding per-record work
# (/root/reference/crates/infer-paddleocr/src/vision/preprocess.rs:261-300).
MAX_PAYLOAD_CHARS = 2_000_000

Segment = Tuple[str, str]  # (kind, text); kind in {"literal","html","pdfish","tool"}


def has_payload(text: str, role: str) -> bool:
    """Cheap predicate mirrored vectorized in the pipeline fast path."""
    return (
        role == "tool"
        or HTML_MARKER in text
        or PDF_MARKER in text
        or DATA_HTML_MARKER in text
        or DATA_PDF_MARKER in text
    )


def decode_data_url_b64(b64: str, where: str) -> str:
    """Strict base64 -> UTF-8 decode; rejects invalid payloads loudly,
    mirroring the reference's BadRequest on a bad inline payload
    (generation.rs:276-290) — fail-fast beats silently emitting the
    undecoded blob as literal text."""
    try:
        raw = base64.b64decode(b64, validate=True)
    except (binascii.Error, ValueError) as err:
        raise ValueError(f"invalid base64 {where} payload: {err}") from None
    try:
        return raw.decode("utf-8")
    except UnicodeDecodeError as err:
        raise ValueError(f"{where} data-URL payload is not UTF-8: {err}") from None


def clamp_payload(payload: str) -> str:
    """Deterministic size-budget clamp (M9 analog)."""
    if len(payload) > MAX_PAYLOAD_CHARS:
        return payload[:MAX_PAYLOAD_CHARS]
    return payload


def segment_turn(text: str, role: str) -> List[Segment]:
    """Split a turn's text into ordered literal / payload segments.

    Non-overlapping payload matches are taken in document order (first
    match wins on overlap), mirroring the slot-order-defines-output-order
    invariant of the reference's prompt splicing
    (/root/reference/crates/infer-deepseek/src/model/mod.rs:2169-2210).
    """
    if role == "tool":
        return [("tool", clamp_payload(text))] if text else []

    matches = []
    for kind, rx in (("html", _HTML_RE), ("pdfish", _PDF_RE)):
        for m in rx.finditer(text):
            matches.append((m.start(), m.end(), kind, m.group(0)))
    # data-URL matches carry the DECODED payload; the base64 blob itself
    # never reaches an extractor (S3 analog — second ingestion path).
    # Default policy is fail-fast (reject loudly, like the reference's
    # BadRequest); ENGINE_BAD_PAYLOAD=passthrough downgrades a decode
    # failure to leaving the blob as literal text — for 100TB production
    # runs where one malformed row must not kill an hour-long job.
    lenient = os.environ.get(BAD_PAYLOAD_ENV, "") == "passthrough"
    for kind, rx in (("html", _DATA_HTML_RE), ("pdfish", _DATA_PDF_RE)):
        for m in rx.finditer(text):
            try:
                decoded = decode_data_url_b64(m.group(1), kind)
            except ValueError:
                if lenient:
                    continue  # blob stays inside the literal text
                raise
            matches.append((m.start(), m.end(), kind, decoded))
    matches.sort(key=lambda t: (t[0], t[1]))

    segments: List[Segment] = []
    pos = 0
    last_end = 0
    for start, end, kind, payload in matches:
        if start < last_end:  # overlap with an earlier match: first wins
            continue
        if start > pos:
            segments.append(("literal", text[pos:start]))
        segments.append((kind, clamp_payload(payload)))
        pos = end
        last_end = end
    if pos < len(text):
        segments.append(("literal", text[pos:]))
    return segments
