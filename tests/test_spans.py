"""Span assembly invariants (SURVEY M12/M13 analogs)."""

import pytest

from engine.extract import extract_turn
from engine.spans import SEPARATOR, assemble


def test_assemble_offsets():
    text, spans = assemble([("intro", False), ("block one", True), ("block two", True)])
    assert text == f"intro{SEPARATOR}block one{SEPARATOR}block two"
    assert spans == [(7, 16), (18, 27)]
    for s, e in spans:
        assert text[s:e] in ("block one", "block two")


def test_empty_parts_skipped():
    text, spans = assemble([("", False), ("a", True), ("", True), ("b", False)])
    assert text == f"a{SEPARATOR}b"
    assert spans == [(0, 1)]


def test_all_empty():
    assert assemble([]) == ("", [])
    assert assemble([("", False)]) == ("", [])


def test_spans_are_char_offsets_not_bytes():
    block = "数据🚀处理"
    text, spans = assemble([("héllo", False), (block, True)])
    (s, e), = spans
    assert text[s:e] == block  # char slicing, UTF-8-boundary safe


def test_extract_turn_plain_passthrough():
    text, spans, n = extract_turn("  plain text\r\nwith lines  ", "user")
    assert text == "plain text\nwith lines"
    assert spans == [] and n == 0


def test_extract_turn_span_invariant_on_payload():
    html = (
        "<!DOCTYPE html><html><body><div class='content'>"
        "<p>A long enough paragraph, with commas, to be selected as content.</p>"
        "</div></body></html>"
    )
    text, spans, n = extract_turn(f"prefix {html} suffix", "user")
    assert n == len(spans) == 1
    s, e = spans[0]
    assert text[s:e] == "A long enough paragraph, with commas, to be selected as content."
    assert text.startswith("prefix")
    assert text.endswith("suffix")


def test_extract_turn_empty():
    assert extract_turn("", "user") == ("", [], 0)
    assert extract_turn("", "tool") == ("", [], 0)
