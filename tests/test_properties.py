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


def test_repetition_signals_kernel_matches_bruteforce():
    """Differential fuzz: the vectorized repetition kernel (lexsort + run
    arithmetic over hashed word grams) vs a dict-based pure-Python oracle
    on 300 random docs incl. empty text, double spaces and exact
    copies."""
    import random

    import pyarrow as pa

    from engine.ops.textstats import REP_DUP_N, REP_TOP_N, repetition_signals

    random.seed(41)
    vocab = ["aa", "bb", "cc", "dd", "e", "fff"]
    texts = []
    for i in range(300):
        n = random.randrange(0, 24)
        t = " ".join(random.choice(vocab) for _ in range(n))
        if random.random() < 0.25:
            t = t + "  " + t  # double space + self-repetition
        texts.append(t)
    texts[3] = ""
    texts[5] = texts[4]

    batch = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()),
         "text": pa.array(texts)}
    )
    # write a one-file fixture and run the public pipeline via Ray,
    # comparing against the dict-based brute oracle below
    import pyarrow.parquet as pq
    import tempfile, os

    d = tempfile.mkdtemp()
    pq.write_table(batch, os.path.join(d, "documents.parquet"))
    got = repetition_signals(d).to_pandas().set_index("doc_id").sort_index()

    for i, t in enumerate(texts):
        ws = [w for w in t.split(" ") if w]
        grams = {}
        for j in range(len(ws) - REP_TOP_N + 1):
            g = " ".join(ws[j : j + REP_TOP_N])
            c, f = grams.get(g, (0, j))
            grams[g] = (c + 1, f)
        if grams:
            best = max(grams.items(), key=lambda kv: (kv[1][0], -kv[1][1]))
            want = (best[1][0], best[1][1], len(best[0]))
        else:
            want = (0, -1, 0)
        row = got.loc[i]
        assert (row["top2_count"], row["top2_pos"], row["top2_chars"]) == want
        g5 = {}
        for j in range(len(ws) - REP_DUP_N + 1):
            g = " ".join(ws[j : j + REP_DUP_N])
            g5[g] = g5.get(g, 0) + 1
        assert row["dup5_grams"] == sum(c for c in g5.values() if c >= 2)
        assert row["dup5_chars"] == sum(
            c * len(g) for g, c in g5.items() if c >= 2
        )
        assert row["n_chars"] == len(t)


def test_dedup_substrings_matches_bruteforce():
    """Differential fuzz: the two-shuffle span-cut pipeline vs a
    dict-based keep-first oracle over 120 random docs with heavy overlap
    (small vocab forces cross-doc duplicate windows). The oracle runs on
    the SAME dup_corpus expansion the engine reads."""
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq
    import tempfile, os

    from engine.ops.dedup import (
        EXACT_DUP_OFFSET, NEAR_DUP_OFFSET, SUBSTR_L, dedup_substrings,
    )

    random.seed(43)
    vocab = ["x1", "x2", "x3"]
    texts = {}
    for i in range(120):
        n = random.randrange(0, 16)
        texts[i] = " ".join(random.choice(vocab) for _ in range(n))
    d = tempfile.mkdtemp()
    pq.write_table(
        pa.table(
            {"doc_id": pa.array(sorted(texts), pa.int64()),
             "text": pa.array([texts[i] for i in sorted(texts)])}
        ),
        os.path.join(d, "documents.parquet"),
    )
    got = dedup_substrings(d).to_pandas().set_index("doc_id").sort_index()

    # brute oracle over the dup_corpus expansion
    full = dict(texts)
    import re

    for i, t in texts.items():
        full[i + EXACT_DUP_OFFSET] = t
        if i % 2 == 0:
            # dup_corpus's exact trim rule: drop trailing whitespace+token
            # (a no-op on single-word / empty docs)
            full[i + NEAR_DUP_OFFSET] = re.sub(r"\s+\S+$", "", t)
    occ = {}
    for did in sorted(full):
        ws = [w for w in full[did].split(" ") if w]
        for j in range(len(ws) - SUBSTR_L + 1):
            occ.setdefault(" ".join(ws[j : j + SUBSTR_L]), []).append((did, j))
    removed = {}
    for lst in occ.values():
        if len(lst) >= 2:
            for did, j in lst[1:]:
                removed.setdefault(did, set()).update(range(j, j + SUBSTR_L))
    assert len(got) == len(full)
    for did in sorted(full):
        ws = [w for w in full[did].split(" ") if w]
        rm = removed.get(did, set())
        want_clean = " ".join(w for j, w in enumerate(ws) if j not in rm)
        row = got.loc[did]
        assert row["clean_text"] == want_clean, did
        assert row["n_words"] == len(ws)
        assert row["n_removed"] == len(rm & set(range(len(ws))))
