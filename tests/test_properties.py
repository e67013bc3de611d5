"""Property-based invariants of the extraction core (hypothesis).

The reference ships no randomized testing (SURVEY SS5 item 5); these
properties pin the invariants the pipeline's correctness rests on, over
adversarial inputs no fixture would contain: arbitrary unicode, nested
markers, truncated payloads, whitespace pathologies.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from engine.extract import extract_turn
from engine.normalize import collapse_ws, normalize_text
from engine.sniff import segment_turn
from engine.spans import assemble

# Text that may embed payload-ish fragments.
_fragments = st.lists(
    st.one_of(
        st.text(max_size=80),
        st.just("<!DOCTYPE html><html><body><p>x, y</p></body></html>"),
        st.just("<!DOCTYPE html><html><div class='content'><p>"),  # truncated
        st.just("%PDF-LITE 1.0\n@block page=1 y=5 x=1\nhi\n@endblock\n%%EOF"),
        st.just("%PDF-LITE"),                                      # truncated
        st.just("</html>"),
        st.just("<|end_of_text|>"),
        st.just("\r\n \t"),
    ),
    max_size=6,
)
_texts = _fragments.map("".join)
_roles = st.sampled_from(["user", "assistant", "system", "tool"])


@settings(max_examples=300, deadline=None)
@given(_texts, _roles)
def test_extract_turn_invariants(text, role):
    extracted, spans, n_blocks = extract_turn(text, role)
    # span discipline: char offsets, ascending, non-overlapping, in-bounds
    prev_end = -1
    for s, e in spans:
        assert 0 <= s < e <= len(extracted)
        assert s > prev_end
        prev_end = e
    assert n_blocks == len(spans)
    # every span slices to non-empty text with no outer whitespace
    for s, e in spans:
        seg = extracted[s:e]
        assert seg == seg.strip()
        assert seg
    # determinism
    assert extract_turn(text, role) == (extracted, spans, n_blocks)


@settings(max_examples=300, deadline=None)
@given(_texts, _roles)
def test_segment_turn_partitions_text(text, role):
    """Segments cover the turn text in order with no gaps or overlaps
    (the slot-splicing invariant, reference model/mod.rs:2169-2210)."""
    segs = segment_turn(text, role)
    if role == "tool":
        assert "".join(s for _, s in segs) == (text if text else "")
        return
    assert "".join(s for _, s in segs) == text


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=200))
def test_normalize_idempotent(s):
    once = normalize_text(s)
    assert normalize_text(once) == once
    c = collapse_ws(s)
    assert collapse_ws(c) == c
    assert "\r" not in once


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.tuples(st.text(max_size=40), st.booleans()),
        max_size=8,
    )
)
def test_assemble_spans_slice_back(parts):
    extracted, spans = assemble(parts)
    blocks = [p for p, is_block in parts if is_block and p]
    # one span per non-empty block, each slicing back to its block text
    assert len(spans) <= len(blocks)
    # ascending, in-bounds
    prev = -1
    for s, e in spans:
        assert 0 <= s < e <= len(extracted)
        assert s > prev
        prev = e


@settings(max_examples=400, deadline=None)
@given(
    st.lists(
        st.sampled_from(
            [
                "<p>", "</p>", "<div class='a'>", "</div>", "<a href=x>",
                "</a>", "text ", "&amp;", "&", "<", ">", "<script>",
                "</script>", "<!--", "-->", "<br/>", "'", '"', "=",
                "<span", " id=1>", "</", "<!DOCTYPE html>", "x<y>z",
                "<P >", "</ p>", "<img src='a'>", "\n", "&#65;", "&bogus;",
            ]
        ),
        max_size=14,
    ).map("".join)
)
def test_fast_parser_total_on_tag_soup(soup):
    """parse_html_fast must terminate without error on arbitrary tag soup
    and be deterministic; extraction over it must keep the span
    discipline. (Tree equality with HTMLParser is pinned separately on
    well-formed inputs; on pathological soup the fast tokenizer's
    treat-as-text behavior is the spec.)"""
    from engine.html_extract import parse_html_fast
    from engine.extract import extract_turn

    def canon(node):
        out, buf = [], []
        for child in node.children:
            if isinstance(child, str):
                buf.append(child)
            else:
                if buf:
                    out.append("".join(buf))
                    buf = []
                out.append(canon(child))
        if buf:
            out.append("".join(buf))
        return (node.tag, tuple(sorted(node.attrs.items())), tuple(out))

    assert canon(parse_html_fast(soup)) == canon(parse_html_fast(soup))
    payload = "<!DOCTYPE html><html><body>" + soup + "</body></html>"
    extracted, spans, nb = extract_turn(payload, "user")
    prev = -1
    for s, e in spans:
        assert 0 <= s < e <= len(extracted) and s > prev
        prev = e
    assert nb == len(spans)


# data-URL fragments: valid (fixed payload encoded) and invalid (bad base64)
_B64_HTML = __import__("base64").b64encode(
    b"<!DOCTYPE html><html><body><p>inner, doc, here.</p></body></html>"
).decode()
_data_url_fragments = st.lists(
    st.one_of(
        st.text(max_size=60),
        st.just(f"data:text/html;base64,{_B64_HTML}"),
        st.just("data:text/html;base64,!!notb64!!"),   # invalid chars stay literal
        st.just("data:text/html;base64,"),             # empty payload
        st.just("data:application/pdf-lite;base64,"),
        st.just(" data:text/html;base64"),             # marker-less prefix
    ),
    max_size=5,
)


@settings(max_examples=300, deadline=None)
@given(_data_url_fragments.map(" ".join), st.sampled_from(["user", "assistant"]))
def test_data_url_extraction_total_and_deterministic(text, role):
    """Totality + span discipline + determinism over adversarial data-URL
    mixes. Invalid-but-matching payloads raise ValueError (fail-fast
    contract) — anything else must extract cleanly; whenever the valid
    data URL is present its decoded content appears in the output."""
    from engine.extract import extract_turn

    try:
        extracted, spans, nb = extract_turn(text, role)
    except ValueError as err:
        assert "base64" in str(err) or "UTF-8" in str(err)
        return
    prev = -1
    for s, e in spans:
        assert 0 <= s < e <= len(extracted) and s > prev
        prev = e
    assert nb == len(spans)
    assert extract_turn(text, role) == (extracted, spans, nb)
    if f"data:text/html;base64,{_B64_HTML}" in text:
        assert "inner, doc, here." in extracted


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=0, max_value=10_000))
def test_data_url_equals_literal_embedding(seed):
    """For any generated HTML document, wrapping it in a base64 data URL
    must extract identically to embedding it literally."""
    import base64

    import numpy as np

    from engine.extract import extract_turn
    from engine.synth import gen_html

    doc = gen_html(np.random.default_rng(seed))
    b64 = base64.b64encode(doc.encode()).decode()
    assert extract_turn(f"pre\ndata:text/html;base64,{b64}\npost", "user") == \
        extract_turn(f"pre\n{doc}\npost", "user")
