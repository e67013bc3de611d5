"""Unit tests for exactness-critical scalar functions (SURVEY SS2.9) and
parity between the Python normalize path and the pipeline's vectorized
Arrow fast path."""

import pyarrow as pa

from engine.normalize import SENTINEL, collapse_ws, normalize_text, unescape_entities
from engine.pipeline import normalize_arrow

EDGE_TEXTS = [
    "",
    "   \t  ",
    "line one\r\nline two\r\nend",
    "数据处理引擎 🚀 café naïve",
    f"trailing sentinel {SENTINEL}",
    "\r\r\n mixed \r endings \r\n",
    "  leading and trailing  ",
    "no change needed",
    f"{SENTINEL}{SENTINEL}double",
    "tab\tseparated\tvalues\n",
]


def test_normalize_text_semantics():
    assert normalize_text("a\r\nb") == "a\nb"
    assert normalize_text("a\rb") == "a\nb"
    assert normalize_text(f"x {SENTINEL} y") == "x  y"
    assert normalize_text("  padded  ") == "padded"
    assert normalize_text("") == ""
    assert normalize_text(" \t\n ") == ""


def test_collapse_ws():
    assert collapse_ws("a  b\t\nc") == "a b c"
    assert collapse_ws("  x  ") == "x"
    assert collapse_ws("") == ""


def test_unescape_entities():
    assert unescape_entities("a &amp; b") == "a & b"
    assert unescape_entities("it&#x27;s") == "it's"
    assert unescape_entities("&lt;p&gt;") == "<p>"


def test_arrow_fast_path_parity():
    """The pipeline's pyarrow normalize must agree with normalize_text on
    every text shape the synthesizer emits (SURVEY SS7.6 risk #1)."""
    arr = pa.chunked_array([pa.array(EDGE_TEXTS, pa.string())])
    fast = normalize_arrow(arr).combine_chunks().to_pylist()
    slow = [normalize_text(t) for t in EDGE_TEXTS]
    assert fast == slow


def test_arrow_fast_path_parity_on_synth_corpus():
    from engine import synth

    cols = synth.generate_rows(30)
    texts = [t for t in cols["text"]]
    arr = pa.chunked_array([pa.array(texts, pa.string())])
    fast = normalize_arrow(arr).combine_chunks().to_pylist()
    slow = [normalize_text(t) for t in texts]
    assert fast == slow
