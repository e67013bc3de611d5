"""Large-scale one-off fuzz campaign over the engine's fast-vs-spec pairs.

The per-turn equality gate rests on three "same semantics, two
implementations" pairs; a divergence in any of them is a silent parity
bug the curated fixtures might miss:

1. `parse_html_fast` (regex tokenizer) vs `parse_html` (stdlib
   HTMLParser spec) — tree equality on WELL-FORMED documents (on
   pathological soup the fast tokenizer's treat-as-text behavior is the
   spec, pinned separately by the hypothesis tests).
2. `pipeline.normalize_arrow` (Arrow kernels) vs `normalize.normalize_text`
   (pure Python) — string equality on arbitrary unicode.
3. `pipeline._sniff_payload` (RE2 alternation) vs `sniff.has_payload`
   (Python) — boolean equality.

Plus `extract_turn` span discipline (sorted, non-overlapping,
slice-back) on arbitrary marker-bearing soup.

Deterministic seeds; a worker pool shards the case count. On any
divergence the worker prints a repr repro and the campaign exits 1.

Usage: python scripts/fuzz_parity.py [n_cases_total] [n_procs]
       (defaults 200_000 cases, cpu_count-2 procs)
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEED = 42

_TAGS = ["div", "p", "span", "a", "ul", "li", "h1", "h2", "table", "td",
         "article", "section", "main", "blockquote", "pre", "em", "strong"]
_VOID = ["br", "img", "hr", "input"]
_RAWTEXT = ["script", "style"]
_TEXT_BITS = [
    "plain words here", "x", "", "  spaced  out  ", "commas, several, here",
    "&amp;", "&#x27;", "&#65;", "&unknown;", "&", "unicode é中文",
    "tabs\tand\nnewlines", "punctuation! (lots?) of... it;",
]
_ATTR_NAMES = ["class", "id", "href", "data-x", "title"]
_ATTR_VALS = ["content", "nav", "sidebar", "footer", "main-body", "x y z",
              "a&amp;b", "UPPER", "123"]
_WS = [" ", "\t", "\n", "\r", "\r\n", "\x0b", "\x0c", "\x1c", "\x1d",
       "\x1e", "\x1f", "\x85", " ", " ", " ", " ",
       "　"]
_NORM_BITS = ["word", "", "<|end_of_text|>", "end_of", "|>", "<|",
              "é中", "á", "\U0001f600"]
_SOUP_BITS = [
    "<!DOCTYPE html><html><body><p>x</p></body></html>",
    "<!DOCTYPE html><html><div class='content'><p>trunc",
    "%PDF-LITE 1.0\n@block page=1 y=5 x=1\nhi\n@endblock\n%%EOF",
    "%PDF-LITE", "</html>", "<|end_of_text|>", "\r\n \t", "plain",
    "data:text/html;base64,", "data:application/pdf-lite;base64,",
    "PGh0bWw+", "!!!notbase64!!!",
]


def _gen_text(rng: random.Random) -> str:
    return "".join(
        rng.choice(_TEXT_BITS) + rng.choice(_WS) * rng.randint(0, 2)
        for _ in range(rng.randint(0, 4))
    )


def _gen_html(rng: random.Random, depth: int) -> str:
    """Random WELL-FORMED fragment: balanced tags, quoted attrs, text
    free of < and > (entities allowed — both parsers must agree)."""
    kind = rng.random()
    if depth <= 0 or kind < 0.35:
        return _gen_text(rng)
    if kind < 0.42:
        return "<" + rng.choice(_VOID) + rng.choice(["", "/"]) + ">"
    if kind < 0.47:
        t = rng.choice(_RAWTEXT)
        return f"<{t}>if (a && b) {{ x = 1; }}</{t}>"
    if kind < 0.52:
        return "<!-- a comment, ignored -->"
    tag = rng.choice(_TAGS)
    attrs = "".join(
        f" {rng.choice(_ATTR_NAMES)}='{rng.choice(_ATTR_VALS)}'"
        for _ in range(rng.randint(0, 2))
    )
    inner = "".join(
        _gen_html(rng, depth - 1) for _ in range(rng.randint(0, 4))
    )
    return f"<{tag}{attrs}>{inner}</{tag}>"


def _gen_soup(rng: random.Random) -> str:
    return "".join(rng.choice(_SOUP_BITS) for _ in range(rng.randint(0, 5)))


def _canon(node) -> tuple:
    out, buf = [], []
    for child in node.children:
        if isinstance(child, str):
            buf.append(child)
        else:
            if buf:
                out.append("".join(buf))
                buf = []
            out.append(_canon(child))
    if buf:
        out.append("".join(buf))
    return (node.tag, tuple(sorted(node.attrs.items())), tuple(out))


def _worker(args) -> dict:
    wid, n_cases = args
    import pyarrow as pa

    from engine.extract import extract_turn
    from engine.html_extract import parse_html, parse_html_fast
    from engine.normalize import normalize_text
    from engine.pipeline import _sniff_payload, normalize_arrow
    from engine.sniff import has_payload

    rng = random.Random(SEED * 1_000_003 + wid)
    fails = []
    norm_batch, sniff_batch = [], []
    for i in range(n_cases):
        which = i % 4
        if which == 0:  # parser differential on well-formed doc
            doc = (
                "<html><body>"
                + _gen_html(rng, rng.randint(2, 8))
                + "</body></html>"
            )
            if _canon(parse_html(doc)) != _canon(parse_html_fast(doc)):
                fails.append(("parser", doc))
        elif which == 1:  # normalize twin (batched below)
            norm_batch.append(
                "".join(
                    rng.choice(_NORM_BITS) + rng.choice(_WS)
                    for _ in range(rng.randint(0, 6))
                )
            )
        elif which == 2:  # sniff twin (batched below)
            sniff_batch.append(
                (_gen_soup(rng), rng.choice(["user", "assistant", "tool"]))
            )
        else:  # span discipline over soup
            text = _gen_soup(rng)
            try:
                extracted, spans, _nb = extract_turn(text, "user")
            except ValueError:
                # loud rejection of malformed base64 payloads is the
                # documented contract (sniff data-URL path)
                continue
            prev = -1
            for s, e in spans:
                if not (0 <= s <= e <= len(extracted)) or s < prev:
                    fails.append(("spans", text))
                    break
                prev = e
        if fails[5:]:
            break

    if norm_batch:
        arrow = normalize_arrow(
            pa.chunked_array([pa.array(norm_batch, pa.string())])
        )
        for s, a in zip(norm_batch, arrow.to_pylist()):
            if normalize_text(s) != a:
                fails.append(("normalize", s))
                if fails[5:]:
                    break
    if sniff_batch:
        texts = pa.chunked_array(
            [pa.array([t for t, _ in sniff_batch], pa.string())]
        )
        roles = pa.chunked_array(
            [pa.array([r for _, r in sniff_batch], pa.string())]
        )
        vec = _sniff_payload(texts, roles).to_pylist()
        for (t, r), v in zip(sniff_batch, vec):
            if has_payload(t, r) != bool(v):
                fails.append(("sniff", (t, r)))
                if fails[5:]:
                    break
    return {"worker": wid, "cases": n_cases, "fails": fails[:5]}


def main() -> int:
    total = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    procs = int(sys.argv[2]) if len(sys.argv) > 2 else max(
        2, (os.cpu_count() or 4) - 2
    )
    per = total // procs
    t0 = time.perf_counter()
    with mp.Pool(procs) as pool:
        results = pool.map(_worker, [(w, per) for w in range(procs)])
    wall = time.perf_counter() - t0
    fails = [f for r in results for f in r["fails"]]
    for kind, repro in fails[:10]:
        print(f"DIVERGENCE {kind}: {repro!r}"[:500], file=sys.stderr)
    print(json.dumps({
        "cases": per * procs,
        "procs": procs,
        "wall_sec": round(wall, 2),
        "divergences": len(fails),
        "ok": not fails,
    }))
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
