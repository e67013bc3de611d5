"""JSONL source/sink round-trip: the second ingestion format must be
bit-equal to parquet through the full schema and through an operator."""

import os
import sys

import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def jsonl_dir(tmp_path_factory):
    import ray.data

    from engine import synth
    from engine.io import write_transcripts_jsonl

    d = synth.fixture_dir("t1")
    files = sorted(
        os.path.join(d, p) for p in os.listdir(d) if p.endswith(".parquet")
    )
    out = tmp_path_factory.mktemp("jsonl")
    write_transcripts_jsonl(ray.data.read_parquet(files), str(out))
    return files, str(out)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def test_jsonl_roundtrip_full_schema(jsonl_dir):
    import ray.data

    from engine.io import TRANSCRIPT_SCHEMA, read_transcripts_jsonl

    files, out = jsonl_dir
    paths = sorted(
        os.path.join(out, p) for p in os.listdir(out) if p.endswith(".json")
    )
    got_ds = read_transcripts_jsonl(paths)
    assert got_ds.schema().base_schema == TRANSCRIPT_SCHEMA
    got = _canon(got_ds.to_pandas())
    want = _canon(ray.data.read_parquet(files).to_pandas())
    pd.testing.assert_frame_equal(got, want)


def test_operator_parity_across_sources(jsonl_dir):
    from engine.io import read_transcripts_jsonl
    from engine.ops.convstats import conv_stats

    files, out = jsonl_dir
    paths = sorted(
        os.path.join(out, p) for p in os.listdir(out) if p.endswith(".json")
    )
    got = (
        conv_stats(read_transcripts_jsonl(paths))
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    want = (
        conv_stats(files).to_pandas().sort_values("conv_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


@pytest.fixture(scope="module")
def csv_dir(tmp_path_factory):
    import ray.data

    from engine import synth
    from engine.io import write_transcripts_csv

    d = synth.fixture_dir("t1")
    files = sorted(
        os.path.join(d, p) for p in os.listdir(d) if p.endswith(".parquet")
    )
    out = tmp_path_factory.mktemp("csv")
    write_transcripts_csv(ray.data.read_parquet(files), str(out))
    return files, str(out)


def test_csv_roundtrip_full_schema(csv_dir):
    """Third ingestion format: CSV round-trip must be bit-equal to the
    parquet source — including payload turns with embedded newlines and
    commas, which exercise quoted-field parsing (newlines_in_values)."""
    import ray.data

    from engine.io import TRANSCRIPT_SCHEMA, read_transcripts_csv

    files, out = csv_dir
    paths = sorted(
        os.path.join(out, p) for p in os.listdir(out) if p.endswith(".csv")
    )
    got_ds = read_transcripts_csv(paths)
    assert got_ds.schema().base_schema == TRANSCRIPT_SCHEMA
    got = _canon(got_ds.to_pandas())
    want = _canon(ray.data.read_parquet(files).to_pandas())
    # multi-line payloads must survive: at least one text has a newline
    assert want["text"].str.contains("\n").any()
    pd.testing.assert_frame_equal(got, want)


def test_jsonl_gz_roundtrip_full_schema(tmp_path):
    """Compressed (gzip) JSONL round-trip: the .jsonl.gz shards must be
    bit-equal to the parquet source through the SAME reader as plain
    JSONL (codec inferred from the extension), and the files must
    actually be gzip (magic bytes), not plain text with a .gz name."""
    import gzip

    import ray.data

    from engine import synth
    from engine.io import (
        TRANSCRIPT_SCHEMA,
        read_transcripts_jsonl,
        write_transcripts_jsonl_gz,
    )

    d = synth.fixture_dir("t1")
    files = sorted(
        os.path.join(d, p) for p in os.listdir(d) if p.endswith(".parquet")
    )
    out = str(tmp_path / "gz")
    write_transcripts_jsonl_gz(ray.data.read_parquet(files), out)
    paths = sorted(
        os.path.join(out, p) for p in os.listdir(out) if p.endswith(".jsonl.gz")
    )
    assert paths, "no .jsonl.gz shards written"
    with open(paths[0], "rb") as f:
        assert f.read(2) == b"\x1f\x8b"  # gzip magic
    with gzip.open(paths[0], "rt") as f:  # decompresses cleanly
        assert f.readline().startswith("{")
    got_ds = read_transcripts_jsonl(paths)
    assert got_ds.schema().base_schema == TRANSCRIPT_SCHEMA
    got = _canon(got_ds.to_pandas())
    want = _canon(ray.data.read_parquet(files).to_pandas())
    pd.testing.assert_frame_equal(got, want)
