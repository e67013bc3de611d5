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
