"""Unit tests for the three payload extractors (SURVEY SS2.3 analogs)."""

from engine.html_extract import extract_html, link_density, parse_html
from engine.noise import filter_tool_output, strip_ansi
from engine.pdf_extract import dehyphenate, extract_pdfish
from engine.sniff import MAX_PAYLOAD_CHARS, clamp_payload, segment_turn


HTML_DOC = (
    "<!DOCTYPE html><html><head><title>T</title>"
    "<script>var x=1;</script><style>.a{}</style></head><body>"
    '<div class="nav"><a href="/a">home</a> <a href="/b">about</a></div>'
    '<div id="header"><h1>Site Title</h1></div>'
    '<div class="content">'
    "<p>This is the main article paragraph, with enough commas, text, and substance to score well.</p>"
    "<p>A second paragraph, also long enough, with an &amp; entity and it&#x27;s fine.</p>"
    "<ul><li>first item text here</li><li>second item text here</li></ul>"
    "</div>"
    '<div class="sidebar"><a href="/x">link</a> <a href="/y">link</a></div>'
    '<div class="footer">Copyright 2026 <a href="/z">terms</a></div>'
    "</body></html>"
)


class TestHtml:
    def test_main_content_selected(self):
        blocks = extract_html(HTML_DOC)
        assert any("main article paragraph" in b for b in blocks)
        joined = " ".join(blocks)
        assert "home" not in joined and "Copyright" not in joined
        assert "Site Title" not in joined  # header div is boilerplate

    def test_entities_unescaped(self):
        blocks = extract_html(HTML_DOC)
        joined = " ".join(blocks)
        assert "&" in joined and "&amp;" not in joined
        assert "it's fine" in joined

    def test_list_items_are_blocks(self):
        blocks = extract_html(HTML_DOC)
        assert "first item text here" in blocks
        assert "second item text here" in blocks

    def test_script_style_skipped(self):
        assert "var x" not in " ".join(extract_html(HTML_DOC))

    def test_link_dense_block_dropped(self):
        doc = (
            "<!DOCTYPE html><html><body><div class='content'>"
            "<p>Real paragraph with plenty of genuine text, commas, and length to be the candidate.</p>"
            "<p><a href='/1'>one</a> <a href='/2'>two</a> <a href='/3'>three</a></p>"
            "</div></body></html>"
        )
        blocks = extract_html(doc)
        assert len(blocks) == 1 and "Real paragraph" in blocks[0]

    def test_no_body_fallback(self):
        doc = "<!DOCTYPE html><html><p>just a bare paragraph of text</p></html>"
        blocks = extract_html(doc)
        assert blocks == ["just a bare paragraph of text"]

    def test_empty_doc(self):
        assert extract_html("<!DOCTYPE html><html></html>") == []

    def test_link_density(self):
        node = parse_html("<div><a>abc</a>def</div>")
        assert abs(link_density(node) - 0.5) < 1e-9

    def test_malformed_html_no_crash(self):
        blocks = extract_html(
            "<!DOCTYPE html><html><body><div><p>unclosed everywhere"
        )
        assert blocks == ["unclosed everywhere"]


PDF_DOC = """%PDF-LITE 1.0
@block page=1 y=500 x=10
later block on page one
@endblock
@block page=1 y=40 x=10
Running Header
@endblock
@block page=1 y=100 x=10
first body text with a hyphen-
ated continuation line
@endblock
@block page=2 y=40 x=10
Running Header
@endblock
@block page=2 y=100 x=10
page two body text
@endblock
%%EOF"""


class TestPdf:
    def test_reading_order(self):
        blocks = extract_pdfish(PDF_DOC)
        assert blocks == [
            "first body text with a hyphenated continuation line",
            "later block on page one",
            "page two body text",
        ]

    def test_header_removed_everywhere(self):
        assert "Running Header" not in extract_pdfish(PDF_DOC)

    def test_dehyphenate(self):
        assert dehyphenate("hyphen-\nated word") == "hyphenated word"
        assert dehyphenate("dash-\nCapital stays") == "dash- Capital stays"
        assert dehyphenate("one\ntwo\nthree") == "one two three"

    def test_single_page_header_kept(self):
        doc = "%PDF-LITE 1.0\n@block page=1 y=40 x=10\nHead\n@endblock\n%%EOF"
        assert extract_pdfish(doc) == ["Head"]

    def test_empty(self):
        assert extract_pdfish("%PDF-LITE 1.0\n%%EOF") == []

    def test_stable_tie_order(self):
        doc = (
            "%PDF-LITE 1.0\n"
            "@block page=1 y=100 x=10\nfirst\n@endblock\n"
            "@block page=1 y=100 x=10\nsecond\n@endblock\n%%EOF"
        )
        assert extract_pdfish(doc) == ["first", "second"]


class TestTool:
    def test_ansi_and_progress_dropped(self):
        out = filter_tool_output(
            "\x1b[32mOK\x1b[0m built target\n45%|████████| downloading\nresult: done"
        )
        assert out == ["OK built target"] or out == ["OK built target", "result: done"]

    def test_paragraph_split_on_noise(self):
        out = filter_tool_output("alpha\n55%|██| x\nbeta")
        assert out == ["alpha", "beta"]

    def test_traceback_collapsed(self):
        payload = (
            "before\n"
            "Traceback (most recent call last):\n"
            '  File "a.py", line 1, in <module>\n'
            "    boom()\n"
            "ValueError: boom\n"
            "after"
        )
        out = filter_tool_output(payload)
        joined = "\n".join(out)
        assert "boom()" not in joined
        assert "ValueError: boom" in joined
        assert "Traceback (most recent call last):" in joined

    def test_strip_ansi(self):
        assert strip_ansi("\x1b[1;31mred\x1b[0m") == "red"

    def test_empty(self):
        assert filter_tool_output("") == []
        assert filter_tool_output("\n\n42%|█| x\n\n") == []


class TestSniff:
    def test_literal_only(self):
        assert segment_turn("plain text", "user") == [("literal", "plain text")]

    def test_tool_role_is_one_payload(self):
        assert segment_turn("any output", "tool") == [("tool", "any output")]

    def test_interleaving_order(self):
        text = f"before {HTML_DOC} middle {PDF_DOC} after"
        kinds = [k for k, _ in segment_turn(text, "user")]
        assert kinds == ["literal", "html", "literal", "pdfish", "literal"]

    def test_adjacent_payloads(self):
        kinds = [k for k, _ in segment_turn(HTML_DOC + PDF_DOC, "user")]
        assert kinds == ["html", "pdfish"]

    def test_clamp(self):
        assert len(clamp_payload("x" * (MAX_PAYLOAD_CHARS + 10))) == MAX_PAYLOAD_CHARS

    def test_data_url_html_decodes_to_same_segments(self):
        import base64

        b64 = base64.b64encode(HTML_DOC.encode()).decode()
        got = segment_turn(f"see data:text/html;base64,{b64} thanks", "user")
        assert [k for k, _ in got] == ["literal", "html", "literal"]
        # the decoded payload equals the literal-embedding payload
        assert got[1][1] == HTML_DOC

    def test_data_url_pdf_and_extraction_parity(self):
        import base64

        from engine.extract import extract_turn

        b64 = base64.b64encode(PDF_DOC.encode()).decode()
        via_data_url = extract_turn(
            f"pre\ndata:application/pdf-lite;base64,{b64}\npost", "user"
        )
        via_literal = extract_turn(f"pre\n{PDF_DOC}\npost", "user")
        assert via_data_url == via_literal

    def test_invalid_base64_rejected_loudly(self):
        import pytest

        with pytest.raises(ValueError, match="invalid base64"):
            segment_turn("data:text/html;base64,AB=C=", "user")

    def test_non_utf8_payload_rejected(self):
        import base64

        import pytest

        b64 = base64.b64encode(b"\xff\xfe\x00bad").decode()
        with pytest.raises(ValueError, match="not UTF-8"):
            segment_turn(f"data:text/html;base64,{b64}", "user")


def _canon_tree(node):
    """(tag, sorted attrs, children with consecutive text merged) — chunking
    of text nodes differs between parsers and is semantically irrelevant."""
    out = []
    buf = []
    for child in node.children:
        if isinstance(child, str):
            buf.append(child)
        else:
            if buf:
                out.append("".join(buf))
                buf = []
            out.append(_canon_tree(child))
    if buf:
        out.append("".join(buf))
    return (node.tag, tuple(sorted(node.attrs.items())), tuple(out))


def test_fast_parser_matches_spec_parser():
    """parse_html_fast must build the same tree as the HTMLParser-based
    spec parser over every fixture payload pool plus adversarial
    fragments (truncations, entities, cdata, comments, mis-nesting)."""
    from engine import synth
    from engine.html_extract import parse_html, parse_html_fast

    cases = []
    for heavy in (False, True):
        pools = synth.PayloadPools(n_html=40, n_pdf=2, n_tool=2, heavy=heavy)
        cases += pools.html
    cases += [
        "",
        "plain text no tags",
        "a < b and c > d",
        "&amp; &#x27; &unknown; &",
        "<p>one<p>two</p>three",                       # implicit close
        "<div><span>x</div>y</span>",                  # mis-nesting
        "<script>if (a<b && c>d) {}</script><p>after</p>",
        "<style>.x>{color:red}</style>tail",
        "<script>no close tag",
        "<!-- <p>commented</p> --><p>real</p>",
        "<!DOCTYPE html><?pi stuff?><p>x</p>",
        "<br/><img src='a.png'/><p a='1' b=\"2\" c=3 d>t</p>",
        "<p class='a&amp;b'>entity attr</p>",
        "<div class='content'><p>trunc",
        "<div class='x",                               # unterminated tag
        "<P CLASS='UP'>case</P>",
        "< notatag>text</ notatag>",
        "<a href='/x'>link<a href='/y'>nested</a></a>",
    ]
    for payload in cases:
        spec = _canon_tree(parse_html(payload))
        fast = _canon_tree(parse_html_fast(payload))
        assert fast == spec, f"parser divergence on: {payload[:80]!r}"


class TestGlobalView:
    """M6: document-level canonicalization keeps what block extraction
    drops — boilerplate, running headers, noise lines."""

    def test_html_global_view_keeps_boilerplate(self):
        from engine.extract import build_global_view, extract_turn

        html = (
            "<!DOCTYPE html><html><body>"
            '<div class="nav"><a href="/x">navlink</a></div>'
            "<div class=\"content\"><p>Main article text, long enough to "
            "score, with commas, plenty of them.</p></div>"
            '<div class="footer">Copyright footertext</div>'
            "</body></html>"
        )
        extracted, _s, _n = extract_turn(html, "user")
        view = build_global_view(html, "user")
        assert "navlink" not in extracted and "footertext" not in extracted
        assert "navlink" in view and "footertext" in view
        assert "Main article text" in view

    def test_pdf_global_view_keeps_running_headers(self):
        from engine.extract import build_global_view, extract_turn

        pdf = (
            "%PDF-LITE 1.0\n"
            "@block page=1 y=40 x=36\nRunning Header\n@endblock\n"
            "@block page=1 y=100 x=36\nBody one.\n@endblock\n"
            "@block page=2 y=40 x=36\nRunning Header\n@endblock\n"
            "@block page=2 y=100 x=36\nBody two.\n@endblock\n"
            "%%EOF"
        )
        extracted, _s, _n = extract_turn(pdf, "user")
        view = build_global_view(pdf, "user")
        assert "Running Header" not in extracted
        assert view.count("Running Header") == 2

    def test_tool_global_view_keeps_noise_strips_ansi(self):
        from engine.extract import build_global_view

        view = build_global_view("\x1b[32mOK\x1b[0m done\n42%|██| bar", "tool")
        assert "\x1b" not in view
        assert "42%|" in view  # noise lines kept in the whole view

    def test_literal_turns_match_normalize(self):
        from engine.extract import build_global_view
        from engine.normalize import normalize_text

        s = "plain \r\n text <|end_of_text|>"
        assert build_global_view(s, "user") == normalize_text(s)


def test_bad_payload_policy_passthrough(monkeypatch):
    """ENGINE_BAD_PAYLOAD=passthrough downgrades an undecodable data-URL
    to literal text instead of aborting — the 100TB don't-kill-the-job
    policy; default stays fail-fast."""
    import pytest

    from engine.extract import extract_turn
    from engine.sniff import BAD_PAYLOAD_ENV

    bad = "before data:text/html;base64,AB=C= after"
    with pytest.raises(ValueError):
        segment_turn(bad, "user")

    monkeypatch.setenv(BAD_PAYLOAD_ENV, "passthrough")
    segs = segment_turn(bad, "user")
    assert segs == [("literal", bad)]
    extracted, spans, n = extract_turn(bad, "user")
    assert n == 0 and "AB=C=" in extracted


def test_md5_hex_buffer_kernel_matches_hashlib():
    """GlobalViewTurns._md5_hex hashes Arrow buffer slices in place; the
    hexdigests must be byte-identical to the decode+encode hashlib path
    for sliced chunks, large_string, unicode, and empty arrays (the
    golden-parquet global_fp oracle depends on exact md5 parity)."""
    import hashlib

    import pyarrow as pa

    from engine.pipeline import GlobalViewTurns

    f = GlobalViewTurns._md5_hex
    a = pa.array(["héllo", "", "naïve ünïcode ✓", "x" * 1000], pa.string())
    for arr in (
        a,
        a.slice(1, 3),
        pa.chunked_array([a, a.slice(2)]),
        pa.array(["a", "ß∂ƒ", ""], pa.large_string()).slice(1),
        pa.chunked_array([], pa.string()),
    ):
        want = [hashlib.md5(v.encode()).hexdigest() for v in arr.to_pylist()]
        assert f(arr) == want
