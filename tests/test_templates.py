"""Conversation-template rendering + history compaction (SURVEY M1-M3)."""

import pytest

from engine.templates import (
    TEMPLATES,
    compact_turns,
    register_template,
)


def test_plain_render():
    out = TEMPLATES["plain"]([("user", "hi"), ("assistant", "hello")])
    assert out == "user: hi\nassistant: hello"


def test_chatml_render():
    out = TEMPLATES["chatml"]([("user", "hi")])
    assert out == "<|im_start|>user\nhi<|im_end|>\n"


def test_empty_turns_skipped():
    assert TEMPLATES["plain"]([("user", "  "), ("assistant", "x")]) == "assistant: x"


def test_compact_turns_semantics():
    turns = [
        ("system", "s0"), ("user", "u0"), ("assistant", "a0"),
        ("system", "s1"), ("user", "u1"), ("assistant", "a1"),
    ]
    # system turns BEFORE the latest user turn + that user turn
    assert compact_turns(turns) == [("system", "s0"), ("system", "s1"), ("user", "u1")]


def test_compact_no_user():
    assert compact_turns([("system", "s"), ("assistant", "a")]) == [("system", "s")]


def test_register_override_semantics():
    register_template("x_test", lambda t: "x", override=False)
    with pytest.raises(ValueError):
        register_template("x_test", lambda t: "y", override=False)
    register_template("x_test", lambda t: "y", override=True)
    assert TEMPLATES["x_test"]([]) == "y"
    del TEMPLATES["x_test"]


def test_render_conversations_grouped(t1_files):
    from engine.templates import render_conversations
    import pyarrow.parquet as pq
    import pyarrow as pa

    out = render_conversations(t1_files, template="plain").to_pandas()
    raw = pa.concat_tables([pq.read_table(p) for p in t1_files])
    n_convs = len(set(raw["conv_id"].to_pylist()))
    assert len(out) == n_convs
    # spot-check one conversation against a driver-side render
    conv = out.iloc[0]["conv_id"]
    turns = (
        raw.filter(pa.compute.equal(raw["conv_id"], conv))
        .sort_by([("turn_idx", "ascending")])
    )
    expect = TEMPLATES["plain"](
        list(zip(turns["role"].to_pylist(), turns["text"].to_pylist()))
    )
    assert out[out["conv_id"] == conv].iloc[0]["rendered"] == expect


def test_compact_history_grouped(t1_files):
    from engine.templates import compact_history
    import pyarrow.parquet as pq
    import pyarrow as pa

    out = compact_history(t1_files).to_pandas()
    raw = pa.concat_tables([pq.read_table(p) for p in t1_files]).to_pandas()
    # per conversation: kept turns == compact_turns of the ordered turns
    for conv, grp in raw.groupby("conv_id"):
        grp = grp.sort_values("turn_idx")
        want = compact_turns(list(zip(grp["role"], grp["text"])))
        got = out[out["conv_id"] == conv].sort_values("turn_idx")
        assert list(zip(got["role"], got["text"])) == want


# ---------------------------------------------------------------------------
# separator-style templates (M2): four styles, sep/sep2 alternation,
# system-template injection — hand-computed expected strings
# ---------------------------------------------------------------------------

SEP_TURNS = [
    ("system", "be brief"),
    ("user", "Hello!"),
    ("assistant", "Hi there."),
    ("user", "Who are you?"),
    ("assistant", ""),
]


def test_deepseek_style_alternates_seps_and_injects_system():
    from engine.normalize import SENTINEL

    out = TEMPLATES["deepseek"](SEP_TURNS)
    assert out == (
        "be brief\n\n"
        "User: Hello!\n\n"                      # idx 0 -> sep
        f"Assistant: Hi there.{SENTINEL}"       # idx 1 -> sep2
        "User: Who are you?\n\n"                # idx 2 -> sep
        "Assistant:"                            # empty -> bare role, no sep
    )


def test_deepseek_style_no_system_no_prefix():
    out = TEMPLATES["deepseek"]([("user", "hi")])
    assert out == "User: hi\n\n"


def test_deepseek_v2_style_sft_marker():
    from engine.normalize import SENTINEL
    from engine.templates import SFT_MARKER

    out = TEMPLATES["deepseek_v2"](SEP_TURNS)
    assert out == (
        "be brief"                               # system prefix, sep=""
        f"{SFT_MARKER}Hello!"                    # user: marker + content + sep("")
        f"Hi there.{SENTINEL}"                   # other: content + sep2
        f"{SFT_MARKER}Who are you?"
        # empty assistant turn skipped entirely
    )


def test_sep_plain_style_contents_only():
    out = TEMPLATES["sep_plain"]([("user", "a"), ("assistant", "b"), ("user", "")])
    assert out == "a\nb\n"


def test_alignment_style_even_slots_masked():
    from engine.templates import PAYLOAD_MARKER

    out = TEMPLATES["alignment"](
        [("user", "ignored payload turn"), ("assistant", "the answer")]
    )
    assert out == f"{PAYLOAD_MARKER}\nthe answer\n"


def test_alignment_empty_consumes_index():
    # an empty even-slot message is skipped but still consumes idx parity
    from engine.templates import PAYLOAD_MARKER

    out = TEMPLATES["alignment"]([("user", ""), ("assistant", "odd")])
    assert out == "odd\n"


def test_only_first_system_turn_wins_the_slot():
    out = TEMPLATES["deepseek"](
        [("system", "first"), ("system", "second"), ("user", "q")]
    )
    assert out.startswith("first\n\n")
    assert "second" not in out


def test_kernel_renders_match_python_renderers(t1_files):
    """Differential: the Arrow-kernel bucket renderer must be bit-identical
    to the Python registry function for EVERY builtin template over the
    whole t1 fixture (same parity-twin discipline as normalize_arrow)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from engine.templates import _KERNEL_SET, render_conversations

    full = (
        pa.concat_tables(
            [
                pq.read_table(p, columns=["conv_id", "turn_idx", "role", "text"])
                for p in t1_files
            ]
        )
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
    )
    for name in sorted(_KERNEL_SET):
        fn = TEMPLATES[name]
        want = (
            full.groupby("conv_id", sort=True)
            .apply(
                lambda g: fn(
                    list(zip(g["role"].fillna(""), g["text"].fillna("")))
                )
            )
            .rename("rendered")
            .reset_index()
        )
        got = (
            render_conversations(t1_files, template=name)
            .to_pandas()
            .sort_values("conv_id")
            .reset_index(drop=True)
        )
        assert len(got) == len(want), name
        assert (got["rendered"].values == want["rendered"].values).all(), name


def test_overridden_builtin_falls_back_to_python_path(t1_files):
    """register_template(..., override=True) on a builtin name must win
    over the kernel fast path."""
    from engine.templates import register_template, render_conversations

    register_template("plain", lambda turns: f"N={len(turns)}", override=True)
    try:
        out = render_conversations(t1_files, template="plain").to_pandas()
        assert out["rendered"].str.match(r"N=\d+").all()
        assert (
            out["rendered"] == "N=" + out["n_turns"].astype(str)
        ).all()
    finally:
        from engine.templates import _BUILTIN_TEMPLATES

        register_template("plain", _BUILTIN_TEMPLATES["plain"], override=True)


def test_kernel_render_tolerates_null_role_and_text(tmp_path):
    """Null role/text rows must render as empty strings (M15 posture) on
    the kernel path, identically to the Python fallback."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from engine.templates import TEMPLATES, _KERNEL_SET, render_conversations

    t = pa.table(
        {
            "conv_id": pa.array(["c1"] * 4 + ["c2"] * 2),
            "turn_idx": pa.array([0, 1, 2, 3, 0, 1], pa.int32()),
            "role": pa.array(["system", None, "user", "assistant", None, "user"]),
            "text": pa.array(["sys msg", "tool out", None, "answer", None, "  q  "]),
            "tool": pa.array([""] * 6),
            "ts": pa.array([0, 1, 2, 3, 4, 5], pa.timestamp("us")),
        }
    )
    pq.write_table(t, str(tmp_path / "part.parquet"))
    files = [str(tmp_path / "part.parquet")]
    df = t.to_pandas()
    for name in sorted(_KERNEL_SET):
        got = (
            render_conversations(files, template=name)
            .to_pandas()
            .sort_values("conv_id")
            .reset_index(drop=True)
        )
        fn = TEMPLATES[name]
        want = (
            df.sort_values(["conv_id", "turn_idx"])
            .groupby("conv_id", sort=True)
            .apply(lambda g: fn(list(zip(g["role"].fillna(""), g["text"].fillna("")))))
            .rename("rendered")
            .reset_index()
        )
        assert (got["rendered"].values == want["rendered"].values).all(), (
            name, got["rendered"].tolist(), want["rendered"].tolist()
        )


def test_token_prefix_counts_matches_spec_impl():
    """The batched token counter (one reduceat pass, per-string
    cache-resident flags) must agree exactly with the spec
    implementation (full running count over the concatenated utf-32
    buffer) — unicode, empty strings, zero-length and full-length
    prefixes included."""
    import numpy as np

    from engine.templates import _token_prefix_counter, _token_prefix_counts

    rng = np.random.default_rng(7)
    alphabet = list("ab c\t\nde\f\rxyz  ") + ["é", "中", "𝄞", " ", "|"]
    for _ in range(300):
        n = int(rng.integers(1, 8))
        texts = [
            "".join(rng.choice(alphabet, size=int(rng.integers(0, 40))))
            for _ in range(n)
        ]
        if sum(map(len, texts)) == 0:
            continue  # all-empty corpus is outside the spec impl's domain
        nq = int(rng.integers(0, 10))
        rows = rng.integers(0, n, size=nq)
        lens = np.array([len(texts[r]) for r in rows], dtype=np.int64)
        starts = (rng.random(nq) * (lens + 1)).astype(np.int64)
        ends = starts + (rng.random(nq) * (lens - starts + 1)).astype(np.int64)
        cp, totals_ref = _token_prefix_counter(texts)
        ts, te, totals = _token_prefix_counts(texts, rows, starts, ends)
        assert np.array_equal(ts, cp(rows, starts))
        assert np.array_equal(te, cp(rows, ends))
        assert np.array_equal(totals, totals_ref)
