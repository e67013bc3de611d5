"""Deterministic synthetic transcript generator (seed=42, FIXTURES.md SS1).

Plays the role of the reference's fixture capture script
(/root/reference/scripts/capture_baseline.py): a seeded single process
materializes the golden inputs; everything downstream is replayed
against them. No external data; all content is synthesized.

Design notes for speed at bench scale (~600k turns): payloads are drawn
from seeded POOLS of pre-generated HTML / PDF-lite / tool documents, so
the per-turn loop is cheap; the pools are large enough (hundreds of
distinct documents) to exercise every extraction rule. Rows are written
globally shuffled across conversations into multiple Parquet files so
tests exercise order restoration (arrival order never defines output
order — the reference's placeholder-order invariant,
/root/reference/crates/infer-deepseek/src/model/mod.rs:2169-2210).
"""

from __future__ import annotations

import base64
import json
import os
from typing import Dict, List

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .schema import TRANSCRIPTS

SEED = 42
CACHE_ROOT = "/tmp/ray_transcripts"

_WORDS = (
    "the quick brown fox jumps over a lazy dog while seventeen analysts "
    "review quarterly merger filings before the deadline and the committee "
    "votes on revised guidance for supply chain resilience across regional "
    "markets with moderate confidence in updated projections about energy "
    "storage deployment throughout winter operations planning cycles"
).split()

_CJK = "数据处理引擎按批次流式执行并保持回压"
_EMOJI = "🚀📊✨"


def _sentence(rng: np.random.Generator, lo: int = 8, hi: int = 22) -> str:
    n = int(rng.integers(lo, hi))
    words = [_WORDS[int(i)] for i in rng.integers(0, len(_WORDS), n)]
    # sprinkle commas so Readability content scoring has signal
    for k in range(3, n - 1, 5):
        if rng.random() < 0.5:
            words[k] = words[k] + ","
    s = " ".join(words)
    return s[0].upper() + s[1:] + "."


def _paragraph(rng: np.random.Generator, n_sent: int = 3) -> str:
    return " ".join(_sentence(rng) for _ in range(n_sent))


def _links(rng: np.random.Generator, n: int) -> str:
    return " ".join(
        f'<a href="/x{int(rng.integers(0, 999))}">{_WORDS[int(rng.integers(0, len(_WORDS)))]}</a>'
        for _ in range(n)
    )


def gen_html(rng: np.random.Generator, n_paras_lo: int = 2, n_paras_hi: int = 6) -> str:
    """Nav/header/footer boilerplate + scored article body (FIXTURES SS1)."""
    n_paras = int(rng.integers(n_paras_lo, n_paras_hi))
    paras = []
    for _ in range(n_paras):
        p = _paragraph(rng, int(rng.integers(1, 4)))
        if rng.random() < 0.3:
            p = p.replace(" and ", " &amp; ", 1)
        if rng.random() < 0.2:
            p = p + " It&#x27;s final."
        if rng.random() < 0.25:
            p += f' See {_links(rng, 1)} for details.'
        paras.append(f"<p>{p}</p>")
    items = "".join(
        f"<li>{_sentence(rng, 4, 9)}</li>" for _ in range(int(rng.integers(0, 4)))
    )
    lst = f"<ul>{items}</ul>" if items else ""
    heading = f"<h2>{_sentence(rng, 3, 7)}</h2>" if rng.random() < 0.6 else ""
    content_cls = ["content", "article-body", "main-text", "post entry"][
        int(rng.integers(0, 4))
    ]
    return (
        "<!DOCTYPE html><html><head><title>Page</title>"
        "<style>.x{color:red}</style><script>var t=1;</script></head><body>"
        f'<div class="nav">{_links(rng, int(rng.integers(4, 9)))}</div>'
        f'<div id="header"><h1>{_sentence(rng, 3, 6)}</h1></div>'
        f'<div class="{content_cls}">{heading}{paras[0]}{lst}'
        + "".join(paras[1:])
        + "</div>"
        f'<div class="sidebar">{_links(rng, int(rng.integers(3, 7)))}</div>'
        f'<div class="footer">Copyright {_links(rng, 2)}</div>'
        "</body></html>"
    )


def _wrap_hyphen(rng: np.random.Generator, text: str, width: int = 42) -> str:
    """Hard-wrap with occasional mid-word hyphen breaks."""
    lines: List[str] = []
    cur = ""
    for word in text.split(" "):
        if len(cur) + len(word) + 1 <= width or not cur:
            cur = f"{cur} {word}".strip()
            continue
        if len(word) > 6 and rng.random() < 0.3 and word[1:-2].isalpha():
            cut = int(rng.integers(2, len(word) - 2))
            head, tail = word[:cut], word[cut:]
            if tail[:1].islower():
                lines.append(f"{cur} {head}-".strip())
                cur = tail
                continue
        lines.append(cur)
        cur = word
    if cur:
        lines.append(cur)
    return "\n".join(lines)


def gen_pdfish(rng: np.random.Generator, n_pages_hi: int = 4, n_body_hi: int = 4) -> str:
    n_pages = int(rng.integers(1, n_pages_hi))
    header = _sentence(rng, 3, 6)
    footer = f"Page footer {int(rng.integers(1, 99))}"
    parts = ["%PDF-LITE 1.0"]
    for page in range(1, n_pages + 1):
        blocks = []
        if n_pages > 1:  # running header/footer only repeat on multi-page docs
            blocks.append((40, 36, header))
            blocks.append((900, 36, footer))
        n_body = int(rng.integers(1, n_body_hi))
        ys = sorted(int(y) for y in rng.integers(100, 800, n_body))
        for y in ys:
            blocks.append((y, int(rng.integers(30, 60)), _wrap_hyphen(rng, _paragraph(rng, 2))))
        order = rng.permutation(len(blocks))  # payload order != reading order
        for i in order:
            y, x, text = blocks[int(i)]
            parts.append(f"@block page={page} y={y} x={x}\n{text}\n@endblock")
    parts.append("%%EOF")
    return "\n".join(parts)


def gen_tool(rng: np.random.Generator) -> str:
    lines: List[str] = []
    n = int(rng.integers(3, 10))
    for _ in range(n):
        r = rng.random()
        if r < 0.25:
            lines.append(f"{int(rng.integers(1, 100))}%|{'█' * int(rng.integers(2, 20))}| downloading")
        elif r < 0.35:
            lines.append(f"Downloading shard-{int(rng.integers(0, 99))} ... {int(rng.integers(0, 100))}%")
        elif r < 0.45:
            lines.append(f"\x1b[32mOK\x1b[0m step {int(rng.integers(0, 50))} finished in {rng.integers(1, 900) / 10:.1f}s")
        elif r < 0.55:
            lines.append("")
        else:
            lines.append(f"result[{int(rng.integers(0, 9))}]: {_sentence(rng, 4, 10)}")
    if rng.random() < 0.3:
        lines += [
            "Traceback (most recent call last):",
            '  File "job.py", line 10, in <module>',
            "    run()",
            '  File "job.py", line 7, in run',
            "    raise ValueError('bad shard')",
            "ValueError: bad shard",
        ]
    return "\n".join(lines)


class PayloadPools:
    """Seeded pools of pre-generated payloads (speed at bench scale).

    ``heavy=True`` (bench tier) generates article-sized HTML and multi-page
    PDF-lite documents so the benchmark's per-turn extraction cost is
    representative of real web pages, not toy snippets."""

    def __init__(self, seed: int = SEED, n_html: int = 400, n_pdf: int = 250,
                 n_tool: int = 250, heavy: bool = False):
        rng = np.random.default_rng(seed + 1000)
        if heavy:
            self.html = [gen_html(rng, 18, 42) for _ in range(n_html)]
            self.pdf = [gen_pdfish(rng, 7, 10) for _ in range(n_pdf)]
        else:
            self.html = [gen_html(rng) for _ in range(n_html)]
            self.pdf = [gen_pdfish(rng) for _ in range(n_pdf)]
        self.tool = [gen_tool(rng) for _ in range(n_tool)]


def _conv_lengths(rng: np.random.Generator, n_convs: int) -> np.ndarray:
    """Zipf-skewed: mostly 2-20 turns, some 50-200, every 500th is 1000+."""
    lens = np.where(
        rng.random(n_convs) < 0.9,
        rng.integers(2, 21, n_convs),
        rng.integers(50, 201, n_convs),
    ).astype(np.int64)
    for i in range(250, n_convs, 500):
        lens[i] = int(rng.integers(1000, 2500))
    return lens


_EDGE_TEXTS = [
    "",                                     # empty
    "   \t  ",                              # whitespace-only
    "line one\r\nline two\r\nend",          # CRLF
    f"{_CJK} {_EMOJI} café naïve",          # non-ASCII
    "trailing sentinel <|end_of_text|>",    # sentinel strip
]


def generate_rows(
    n_convs: int,
    seed: int = SEED,
    pools: PayloadPools | None = None,
    html_p: float = 0.12,
    pdf_p: float = 0.08,
) -> Dict[str, list]:
    """Generate all turn rows (conversation-ordered; caller shuffles)."""
    pools = pools or PayloadPools(seed)
    t_html = html_p
    t_pdf = html_p + pdf_p
    t_b64 = t_pdf + 0.02     # base64 data-URL wrapped payloads (S3 path)
    t_adj = t_b64 + 0.015
    t_edge = t_adj + 0.015
    rng = np.random.default_rng(seed)
    lens = _conv_lengths(rng, n_convs)
    cols: Dict[str, list] = {k: [] for k in ("conv_id", "turn_idx", "role", "text", "tool", "ts")}
    base_ts = 1_700_000_000_000_000  # us epoch
    for c in range(n_convs):
        conv_id = f"conv-{c:07d}"
        n_turns = int(lens[c])
        has_system = rng.random() < 0.2
        for t in range(n_turns):
            if t == 0 and has_system:
                role = "system"
            elif rng.random() < 0.12 and t > 0:
                role = "tool"
            else:
                role = "user" if t % 2 == (0 if not has_system else 1) else "assistant"
            tool = ""
            if role == "tool":
                tool = ["search", "shell", "browser"][int(rng.integers(0, 3))]
                text = pools.tool[int(rng.integers(0, len(pools.tool)))]
            else:
                r = rng.random()
                if r < t_html:
                    payload = pools.html[int(rng.integers(0, len(pools.html)))]
                    text = _place_payload(rng, payload)
                elif r < t_pdf:
                    payload = pools.pdf[int(rng.integers(0, len(pools.pdf)))]
                    text = _place_payload(rng, payload)
                elif r < t_b64:
                    # data-URL encoded payload — the reference's second
                    # ingestion path (generation.rs:263-290)
                    if rng.random() < 0.5:
                        payload = pools.html[int(rng.integers(0, len(pools.html)))]
                        media = "text/html"
                    else:
                        payload = pools.pdf[int(rng.integers(0, len(pools.pdf)))]
                        media = "application/pdf-lite"
                    b64 = base64.b64encode(payload.encode()).decode()
                    text = _place_payload(rng, f"data:{media};base64,{b64}")
                elif r < t_adj:
                    # adjacent payloads edge case
                    text = (
                        pools.html[int(rng.integers(0, len(pools.html)))]
                        + pools.pdf[int(rng.integers(0, len(pools.pdf)))]
                    )
                elif r < t_edge:
                    text = _EDGE_TEXTS[int(rng.integers(0, len(_EDGE_TEXTS)))]
                else:
                    text = _paragraph(rng, int(rng.integers(1, 3)))
            cols["conv_id"].append(conv_id)
            cols["turn_idx"].append(t)
            cols["role"].append(role)
            cols["text"].append(text)
            cols["tool"].append(tool)
            cols["ts"].append(base_ts + c * 1_000_000_000 + t * 7_000_000)
    return cols


def _place_payload(rng: np.random.Generator, payload: str) -> str:
    """Embed a payload at start / middle / end of literal text."""
    pre = _sentence(rng, 4, 10)
    post = _sentence(rng, 4, 10)
    r = rng.random()
    if r < 0.25:
        return f"{payload}\n{post}"
    if r < 0.5:
        return f"{pre}\n{payload}"
    if r < 0.9:
        return f"{pre}\n{payload}\n{post}"
    return payload


def rows_to_table(cols: Dict[str, list]) -> pa.Table:
    return pa.Table.from_pydict(
        {
            "conv_id": pa.array(cols["conv_id"], pa.string()),
            "turn_idx": pa.array(cols["turn_idx"], pa.int32()),
            "role": pa.array(cols["role"], pa.string()),
            "text": pa.array(cols["text"], pa.string()),
            "tool": pa.array(cols["tool"], pa.string()),
            "ts": pa.array(cols["ts"], pa.timestamp("us")),
        },
        schema=TRANSCRIPTS,
    )


def write_transcripts(
    out_dir: str,
    n_convs: int,
    n_files: int,
    seed: int = SEED,
    heavy: bool = False,
    html_p: float = 0.12,
    pdf_p: float = 0.08,
) -> List[str]:
    """Synthesize, globally shuffle rows across conversations, write N files.

    Idempotent: a ``_COMPLETE`` marker with matching params short-circuits
    (the atomic-finalize discipline of the reference's DSQ writer,
    /root/reference/crates/dsq-writer/src/lib.rs:410+).
    """
    params = {
        "n_convs": n_convs, "n_files": n_files, "seed": seed, "v": 4,
        "heavy": heavy, "html_p": html_p, "pdf_p": pdf_p,
    }
    marker = os.path.join(out_dir, "_COMPLETE")
    if os.path.exists(marker):
        with open(marker) as f:
            if json.load(f) == params:
                return sorted(
                    os.path.join(out_dir, p)
                    for p in os.listdir(out_dir)
                    if p.endswith(".parquet")
                )
    os.makedirs(out_dir, exist_ok=True)
    for p in os.listdir(out_dir):
        if p.endswith(".parquet"):
            os.remove(os.path.join(out_dir, p))
    pools = PayloadPools(seed, heavy=heavy)
    table = rows_to_table(
        generate_rows(n_convs, seed, pools=pools, html_p=html_p, pdf_p=pdf_p)
    )
    perm = np.random.default_rng(seed + 7).permutation(table.num_rows)
    paths = []
    rows_per = (table.num_rows + n_files - 1) // n_files
    # take via large_string (then cast each sub-2GB file chunk back):
    # scattered-index take concatenates the text chunks and overflows
    # Arrow's int32 string offsets once the corpus passes ~2 GB
    ti = table.schema.get_field_index("text")
    big = table.set_column(ti, "text", table["text"].cast(pa.large_string()))
    # ONE scattered gather for the whole shuffle, then a CONTIGUOUS take
    # per file: scattered per-file takes re-scan the entire corpus per
    # file (O(n_files x corpus) — ~2h for the 128-file stress tier),
    # while a contiguous take copies only that file's rows into fresh
    # sub-2GB buffers (a plain slice can't be cast back to string: the
    # view keeps the parent's >2GB offsets). File i still receives
    # exactly perm[i*r:(i+1)*r] in that order.
    shuffled = big.take(pa.array(perm))
    n_rows = shuffled.num_rows
    for i in range(n_files):
        lo = i * rows_per
        idx = np.arange(lo, min(lo + rows_per, n_rows))
        chunk = shuffled.take(pa.array(idx))
        chunk = chunk.set_column(ti, "text", chunk["text"].cast(pa.string()))
        path = os.path.join(out_dir, f"transcripts-{i:04d}.parquet")
        pq.write_table(chunk, path)
        paths.append(path)
    with open(marker, "w") as f:
        json.dump(params, f)
    return paths


# Fixture tiers (FIXTURES.md SS4): conv counts tuned to the turn targets.
# The bench tier uses heavy (article-sized) payloads at a higher payload
# fraction so the scaling measurement is compute-dominated like the real
# 100TB workload, not startup/coordination-dominated like a toy corpus.
TIERS = {
    "t1": {"n_convs": 50, "n_files": 2},        # ~1k turns
    "t2": {"n_convs": 2000, "n_files": 8},      # ~60k turns
    "bench": {
        "n_convs": 24000, "n_files": 32,        # ~620k turns
        "heavy": True, "html_p": 0.32, "pdf_p": 0.15,
    },
    # scale-validation tier (~2.5M turns, ~2.5 GB): 4x bench, used to
    # verify the flagship streams (stable memory, linear wall) rather
    # than for recorded benchmarks — see BASELINE.md 'Scale validation'
    "stress": {
        "n_convs": 96000, "n_files": 128,
        "heavy": True, "html_p": 0.32, "pdf_p": 0.15,
    },
}


def tier_for_sf_dir(sf_dir: str) -> str:
    name = os.path.basename(os.path.normpath(sf_dir))
    return {"sf0.001": "t1", "sf0.01": "t2", "sf0.1": "bench"}.get(name, "t2")


def fixture_dir(tier: str) -> str:
    """Materialize (once) and return the cached fixture dir for a tier."""
    cfg = dict(TIERS[tier])
    out = os.path.join(CACHE_ROOT, tier)
    write_transcripts(out, seed=SEED, **cfg)
    return out


def write_clustered_embeddings(
    out_dir: str,
    n: int = 2000,
    n_clusters: int = 16,
    dim: int = 64,
    noise: float = 0.02,
    seed: int = 20260820,
) -> str:
    """Seeded mixture-of-Gaussians embedding fixture (VERDICT r4 #5).

    The driver's uniform synthetic embeddings have NO cluster structure,
    which caps sign-LSH recall (~0.38 measured at 6 planes + Hamming-1
    probes) — an artifact of the fixture, not the plan. Real embedding
    corpora concentrate on a low-dimensional manifold; this generator
    reproduces that shape (unit-norm cluster centers + small isotropic
    noise, within-cluster cosine ~0.99) so IVF/LSH recall tests can pin
    the recall the scale path actually delivers on realistic data.

    Writes ``embeddings.parquet`` with the driver schema (vec_id int64,
    embedding list<float32>, label int32) into ``out_dir``."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    label = rng.integers(0, n_clusters, size=n)
    pts = (centers[label] + noise * rng.standard_normal((n, dim))).astype(
        np.float32
    )
    tab = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(
                list(pts), pa.list_(pa.float32())
            ),
            "label": pa.array(label.astype(np.int32)),
        }
    )
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "embeddings.parquet")
    pq.write_table(tab, path)
    return path
