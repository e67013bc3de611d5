"""Per-run smoke of the large-scale parity fuzz campaign.

`scripts/fuzz_parity.py` runs millions of cases as a one-off audit
(recorded in COVERAGE.md); this keeps a deterministic slice of the same
generators + comparisons in every pytest run so the fast-vs-spec pairs
(HTML tokenizer vs HTMLParser, Arrow normalize vs Python, RE2 sniff vs
Python) cannot silently drift between campaigns.
"""

import importlib.util
import os

_SPEC = importlib.util.spec_from_file_location(
    "fuzz_parity",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "scripts", "fuzz_parity.py"),
)
fz = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(fz)


def test_fuzz_slice_has_no_divergences():
    r = fz._worker((0, 6000))
    assert r["fails"] == [], r["fails"]


def test_fuzz_detects_injected_parser_mutation(monkeypatch):
    """The comparison path must actually be able to fail: a mutated fast
    parser that drops a child node on some inputs is reported."""
    import engine.html_extract as hx

    orig = hx.parse_html_fast

    def broken(payload):
        node = orig(payload)
        if node.children and "commas" in payload:
            node.children.pop()
        return node

    monkeypatch.setattr(hx, "parse_html_fast", broken)
    r = fz._worker((0, 6000))
    assert any(kind == "parser" for kind, _ in r["fails"])
