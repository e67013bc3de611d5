"""End-to-end per-turn equality of the Ray pipeline against the oracle —
the engine's flagship parity test, mirroring the reference's
baseline_generation_matches_reference
(/root/reference/crates/infer-deepseek/tests/baseline.rs:481)."""

import pandas as pd
import pytest

from engine.pipeline import extraction_plan


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


@pytest.fixture(scope="module")
def pipeline_out(t1_files):
    return _sorted(extraction_plan(t1_files, batch_size=256).to_pandas())


@pytest.fixture(scope="module")
def expected(t1_expected):
    return _sorted(t1_expected.to_pandas())


def test_row_count_and_no_dups(pipeline_out, expected):
    assert len(pipeline_out) == len(expected)
    keys = pipeline_out[["conv_id", "turn_idx"]].apply(tuple, axis=1)
    assert keys.is_unique


def test_per_turn_text_equality(pipeline_out, expected):
    mism = (pipeline_out["extracted_text"] != expected["extracted_text"]).sum()
    assert mism == 0, f"{mism} turns differ from oracle"


def test_per_turn_span_equality(pipeline_out, expected):
    for got, want in zip(pipeline_out["spans"], expected["spans"]):
        assert list(got) == list(want)


def test_n_blocks_matches_spans(pipeline_out):
    for nb, spans in zip(pipeline_out["n_blocks"], pipeline_out["spans"]):
        assert nb == len(spans)


def test_per_turn_block_metadata_equality(pipeline_out, expected):
    """blocks[i] (kind + layout coords) must match the oracle and align
    1:1 with spans — the per-region output structure (schema v2)."""
    for got, want in zip(pipeline_out["blocks"], expected["blocks"]):
        assert list(got) == list(want)
    for spans, blocks in zip(pipeline_out["spans"], pipeline_out["blocks"]):
        assert len(spans) == len(blocks)


def test_pdf_blocks_carry_reading_order_coords(pipeline_out):
    """PDF-lite blocks expose (page, y, x) sorted in reading order within
    each turn; position-free kinds carry (-1, -1, -1)."""
    saw_pdf = False
    for blocks in pipeline_out["blocks"]:
        coords = [
            (b["page"], b["y"], b["x"]) for b in blocks if b["kind"] == "pdfish"
        ]
        if coords:
            saw_pdf = True
            assert all(c >= (1, 0, 0) for c in coords)
            assert coords == sorted(coords)
        for b in blocks:
            if b["kind"] != "pdfish":
                assert (b["page"], b["y"], b["x"]) == (-1, -1, -1)
    assert saw_pdf


def test_spans_slice_back_to_blocks(pipeline_out):
    for text, spans in zip(pipeline_out["extracted_text"], pipeline_out["spans"]):
        prev_end = -1
        for sp in spans:
            assert 0 <= sp["start"] < sp["end"] <= len(text)
            assert sp["start"] > prev_end  # non-overlapping, ascending
            prev_end = sp["end"]


def test_conv_n_turns(pipeline_out):
    sizes = pipeline_out.groupby("conv_id")["turn_idx"].max() + 1
    for conv_id, grp in pipeline_out.groupby("conv_id"):
        assert (grp["conv_n_turns"] == sizes[conv_id]).all()


def test_salted_equals_unsalted(t1_files, pipeline_out):
    """Salting the group key must not change any output value (SURVEY SS7.6)."""
    salted = _sorted(
        extraction_plan(t1_files, batch_size=256, salt_block=8).to_pandas()
    )
    cols = ["conv_id", "turn_idx", "role", "extracted_text", "n_blocks", "conv_n_turns"]
    pd.testing.assert_frame_equal(salted[cols], pipeline_out[cols])
    for got, want in zip(salted["spans"], pipeline_out["spans"]):
        assert list(got) == list(want)


def test_salted_conv_with_more_blocks_than_buckets(tmp_path):
    """A conversation with MORE salt blocks than shuffle buckets (the
    10^6-turn case salting exists for) necessarily lands two of its
    blocks in the same bucket. That fragmentation is legal — the gap
    check applies within a salt block only — and the output must equal
    the unsalted plan's. Regression: this aborted with 'gap in
    turn_idx' before the in-block restriction."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    n_giant, n_small = 300, 12
    conv = np.concatenate(
        [np.full(n_giant, "conv-giant")]
        + [np.full(6, f"conv-{i:03d}") for i in range(n_small)]
    )
    turn = np.concatenate(
        [np.arange(n_giant)] + [np.arange(6)] * n_small
    ).astype(np.int32)
    text = np.array([f"turn text {i}" for i in range(len(conv))], dtype=object)
    t = pa.table(
        {
            "conv_id": pa.array(conv, pa.string()),
            "turn_idx": pa.array(turn, pa.int32()),
            "role": pa.array(np.where(turn % 2 == 0, "user", "assistant")),
            "text": pa.array(text, pa.string()),
        }
    )
    path = str(tmp_path / "giant.parquet")
    pq.write_table(t, path)

    # salt_block=4 -> 75 blocks for conv-giant vs 8 buckets: guaranteed
    # same-bucket fragmentation
    salted = _sorted(
        extraction_plan(
            [path], batch_size=64, salt_block=4, num_buckets=8
        ).to_pandas()
    )
    plain = _sorted(
        extraction_plan([path], batch_size=64, num_buckets=8).to_pandas()
    )
    cols = ["conv_id", "turn_idx", "extracted_text", "conv_n_turns"]
    pd.testing.assert_frame_equal(salted[cols], plain[cols])
    assert (
        salted.loc[salted["conv_id"] == "conv-giant", "conv_n_turns"]
        == n_giant
    ).all()


def test_salted_boundary_gap_still_aborts(tmp_path):
    """A genuine missing turn AT a salt-block boundary must still abort in
    salted mode: only block-ALIGNED cross-block pairs (earlier turn ends
    its block, later turn starts its block) are legal fragmentation.
    Regression: a blanket cross-block exemption silently accepted e.g.
    turns 3 -> 5 at salt_block=4 (turn 4 missing)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    for name, turns in (
        ("missing_block_start", [0, 1, 2, 3, 5, 6, 7]),  # 4 absent: 3->5
        ("missing_block_end", [0, 1, 2, 4, 5, 6, 7]),    # 3 absent: 2->4
    ):
        t = pa.table(
            {
                "conv_id": pa.array(["c1"] * len(turns)),
                "turn_idx": pa.array(turns, pa.int32()),
                "role": pa.array(["user"] * len(turns)),
                "text": pa.array([f"t{i}" for i in turns]),
            }
        )
        p = str(tmp_path / f"{name}.parquet")
        pq.write_table(t, p)
        # num_buckets=1 forces the straddling pair adjacent in one bucket
        with pytest.raises(Exception, match="dense and 0-based"):
            extraction_plan(
                [p], batch_size=64, salt_block=4, num_buckets=1
            ).materialize()


def test_null_text_tolerated_null_keys_abort(tmp_path):
    """Null text extracts as empty (M15 fallback posture); a null ordering
    key aborts loudly rather than silently mis-bucketing."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    ok = pa.table(
        {
            "conv_id": pa.array(["c1", "c1"]),
            "turn_idx": pa.array([0, 1], pa.int32()),
            "role": pa.array(["user", None]),
            "text": pa.array(["hello", None]),
        }
    )
    p = str(tmp_path / "ok.parquet")
    pq.write_table(ok, p)
    out = _sorted(extraction_plan([p], batch_size=64).to_pandas())
    assert list(out["extracted_text"]) == ["hello", ""]
    assert [len(s) for s in out["spans"]] == [0, 0]

    bad = pa.table(
        {
            "conv_id": pa.array(["c1", None]),
            "turn_idx": pa.array([0, 1], pa.int32()),
            "role": pa.array(["user", "user"]),
            "text": pa.array(["a", "b"]),
        }
    )
    pb = str(tmp_path / "bad.parquet")
    pq.write_table(bad, pb)
    with pytest.raises(Exception, match="null conv_id"):
        extraction_plan([pb], batch_size=64).materialize()


def test_sparse_turn_idx_aborts_loudly(tmp_path):
    """conv_n_turns relies on dense 0-based turn_idx — previously a silent
    assumption of the synthesizer, now a loud input contract."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    for name, idxs in (("gap", [0, 2]), ("offset", [1, 2])):
        t = pa.table(
            {
                "conv_id": pa.array(["c1", "c1"]),
                "turn_idx": pa.array(idxs, pa.int32()),
                "role": pa.array(["user", "assistant"]),
                "text": pa.array(["a", "b"]),
            }
        )
        p = str(tmp_path / f"{name}.parquet")
        pq.write_table(t, p)
        with pytest.raises(Exception, match="dense and 0-based"):
            extraction_plan([p], batch_size=64).materialize()


def test_groups_emitted_ordered(t1_files):
    """Within each output block, a conversation's turns appear sorted —
    the stable-turn-ordering contract of the grouped emission stage."""
    ds = extraction_plan(t1_files, batch_size=256)
    for batch in ds.iter_batches(batch_size=None, batch_format="pandas"):
        for _conv, grp in batch.groupby("conv_id"):
            assert grp["turn_idx"].is_monotonic_increasing


def test_cluster_sized_defaults():
    """Pool and bucket defaults scale with the cluster instead of constants
    (a hard-coded cap would strangle a 256-node deployment)."""
    import ray

    from engine._rayutil import pool_size
    from engine.pipeline import default_num_buckets

    ncpu = int(ray.cluster_resources().get("CPU", 0))
    lo, hi = pool_size()
    assert lo == 1 and hi == max(2, ncpu - 1)
    assert default_num_buckets() == max(64, 2 * ncpu)


def test_read_blocks_match_ordering_buckets(t1_files):
    """Exchange-shape regression guard: the block count entering the
    bucket-keyed ordering groupby must track the bucket count. Ray's
    sort-based groupby creates one range per input block with boundaries
    sampled from the key values; ranges >> distinct buckets degenerate
    the quantiles into empty ranges + merged-bucket straggler blocks
    (2-10x measured on the bench tier — BENCH/BASELINE.md round 3)."""
    from engine.pipeline import resolve_num_buckets

    ds = extraction_plan(t1_files, batch_size=256, ordered=False)
    # The unordered plan ends at the extraction map, whose block count
    # tracks the read block count. override_num_blocks is a hint — a
    # tiny input can't split that far (harmless: FEWER blocks than
    # buckets never degenerates the exchange) — so guard the harmful
    # direction only: blocks must never exceed the bucket count.
    assert ds.materialize().num_blocks() <= resolve_num_buckets(
        None, t1_files
    )

    # At a tier big enough to actually split (t2: ~60k rows, 8 files),
    # the hint is honored up to Ray's per-file ceil rounding (an
    # override of B over n files yields ceil(B/n) splits per file, so
    # at most B + n - 1 blocks — never the 224-block default that
    # degenerates the exchange).
    import os

    from engine import synth

    d = synth.fixture_dir("t2")
    t2_files = sorted(
        os.path.join(d, p) for p in os.listdir(d) if p.endswith(".parquet")
    )
    ds2 = extraction_plan(t2_files, batch_size=256, ordered=False)
    hint = resolve_num_buckets(None, t2_files)
    got = ds2.materialize().num_blocks()
    assert hint <= got < hint + len(t2_files)

def test_input_scaled_buckets(tmp_path):
    """default_num_buckets(paths) scales with INPUT SIZE too: plans pin
    read blocks to the bucket count, so a cluster-only constant would
    grow per-block bytes linearly with corpus size (per-block OOM at
    extreme corpus-to-cluster ratios). buckets >= est_in_memory_bytes /
    target_max_block_size."""
    import ray.data

    from engine.pipeline import (
        PARQUET_INMEM_EXPANSION,
        default_num_buckets,
        resolve_num_buckets,
    )

    floor = default_num_buckets()

    # A sparse 10 GiB "parquet" file: on-disk bytes drive the estimate.
    big = tmp_path / "big.parquet"
    with open(big, "wb") as f:
        f.truncate(10 << 30)
    target = int(
        ray.data.DataContext.get_current().target_max_block_size or (128 << 20)
    )
    expected = max(floor, -(-(10 << 30) * PARQUET_INMEM_EXPANSION // target))
    assert default_num_buckets(str(big)) == expected
    assert expected > floor  # 10 GiB * 5 / 128 MiB = 400 >> 64

    # Directory + glob forms resolve the same file.
    assert default_num_buckets(str(tmp_path)) == expected
    assert default_num_buckets(str(tmp_path / "*.parquet")) == expected

    # Sub-floor inputs (VERDICT r4 #8): a KB-sized corpus gets one
    # bucket per MiB of estimated in-memory input instead of carrying a
    # 64-way exchange; the cap is a no-op from ~64 MiB up, so every
    # bench/driver tier keeps the cluster-scaled count.
    small = tmp_path / "small.parquet"
    small.write_bytes(b"x" * 1024)
    assert default_num_buckets(str(small)) == 1
    mid = tmp_path / "mid" / "mid.parquet"
    mid.parent.mkdir()
    mid.write_bytes(b"x" * (16 << 20))  # 16 MiB disk -> 80 MiB in-mem
    assert default_num_buckets(str(mid)) == floor

    # Explicit values always win; Dataset inputs use the cluster floor.
    assert resolve_num_buckets(17, str(big)) == 17
    ds = ray.data.range(4)
    assert resolve_num_buckets(None, ds) == floor


def test_template_family_buckets_scale_with_cluster(t1_files, monkeypatch):
    """The render/SFT/convstats family defaults num_buckets=None ->
    resolve_num_buckets, NOT a hard-coded 64: on a 256-core cluster the
    resolved count must follow 2x cores (the round-3 fixed-64 scale
    bug). Verified by monkeypatching the cluster size and capturing the
    count each pipeline passes to its bucketing stage."""
    import inspect

    import ray

    import engine.ops.convstats as convstats
    import engine.pipeline as pipeline
    import engine.templates as templates

    monkeypatch.setattr(
        ray, "cluster_resources", lambda: {"CPU": 256.0}
    )
    # Pretend the input is 1 GiB on disk so the cluster term dominates
    # (t1's real KB-size would trip the sub-floor cap and hide the
    # cluster scaling this test pins).
    monkeypatch.setattr(
        pipeline, "_estimate_input_bytes", lambda paths: 1 << 30
    )
    assert pipeline.default_num_buckets() == 512

    seen = {}
    real_bucketed = templates._bucketed

    def spy_bucketed(ds, num_buckets):
        seen["templates"] = num_buckets
        return real_bucketed(ds, num_buckets)

    monkeypatch.setattr(templates, "_bucketed", spy_bucketed)
    templates.render_conversations(t1_files)  # lazy: plan build suffices
    assert seen["templates"] == 512

    real_resolve = convstats.resolve_num_buckets

    def spy_resolve(num_buckets, paths):
        out = real_resolve(num_buckets, paths)
        seen["convstats"] = out
        return out

    monkeypatch.setattr(convstats, "resolve_num_buckets", spy_resolve)
    convstats.conv_stats(t1_files)
    assert seen["convstats"] == 512

    # Every public pipeline in the family advertises the scaled default.
    for fn in (
        templates.render_conversations,
        templates.compact_history,
        templates.sft_masks,
        templates.sft_token_spans,
        templates.sft_pack,
        templates.dedup_convs,
        convstats.conv_stats,
        convstats.chunk_conversations,
        convstats.valid_role_alternation,
        convstats.sft_pairs,
        convstats.link_stats,
    ):
        default = inspect.signature(fn).parameters["num_buckets"].default
        assert default is None, fn.__name__
