"""Golden expected-output parquet (engine.oracle.oracle_expected_dir) —
the driver-gate oracle surface for the flagship extraction family,
mirroring the reference's materialize-then-compare fixture posture
(/root/reference/baselines/README.md:15-168)."""

import json
import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

from engine.oracle import LINEAGE_NUM_PARTITIONS, oracle_expected_dir


@pytest.fixture(scope="module")
def golden(t1_files):
    return oracle_expected_dir("t1")


def test_golden_files_written(golden):
    for name in ("extracted.parquet", "global_views.parquet",
                 "lineage.parquet", "_COMPLETE"):
        assert os.path.exists(os.path.join(golden, name))


def test_golden_matches_driver_projection(golden, t1_files):
    """The golden extracted.parquet must equal the driver-visible
    extract_transcripts projection (spans/blocks JSON-serialized) of the
    actual Ray pipeline output — this equality IS the driver gate."""
    import __ray_entry__ as em

    got = (
        em.queries()["extract_transcripts"]("/root/testdata/sf0.001")
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want = (
        pq.read_table(os.path.join(golden, "extracted.parquet"))
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert sorted(got.columns) == sorted(want.columns)
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)],
        check_dtype=False,
    )


def test_golden_global_views_match_pipeline(golden, t1_files):
    from engine.pipeline import global_view_plan

    got = (
        global_view_plan(t1_files)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want = (
        pq.read_table(os.path.join(golden, "global_views.parquet"))
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_golden_lineage_matches_runner(golden, t1_files, tmp_path):
    from engine.checkpoint import run_partitioned

    recs = run_partitioned(
        t1_files, str(tmp_path / "out"),
        num_partitions=LINEAGE_NUM_PARTITIONS, batch_size=512,
    )
    got = pd.DataFrame(
        [
            {k: r[k] for k in ("partition_id", "input_fingerprint",
                               "rows_in", "rows_out", "status")}
            for r in recs
        ]
    ).sort_values("partition_id").reset_index(drop=True)
    want = (
        pq.read_table(os.path.join(golden, "lineage.parquet"))
        .to_pandas()
        .sort_values("partition_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_golden_cache_invalidates_on_key_change(golden):
    """A stale marker (e.g. after a code change) must force a rebuild —
    a poisoned golden cache would silently grade the wrong expectation."""
    marker = os.path.join(golden, "_COMPLETE")
    with open(marker) as f:
        key = json.load(f)
    stale = dict(key, code="0" * 16)
    with open(marker, "w") as f:
        json.dump(stale, f)
    mtime = os.path.getmtime(os.path.join(golden, "extracted.parquet"))
    out = oracle_expected_dir("t1")
    assert out == golden
    assert os.path.getmtime(os.path.join(golden, "extracted.parquet")) > mtime
    with open(marker) as f:
        assert json.load(f) == key
