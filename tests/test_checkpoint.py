"""Checkpoint / lineage / resume semantics (north rule; SURVEY SS4)."""

import json
import os
import shutil

import pandas as pd
import pyarrow.parquet as pq
import pytest

from engine.checkpoint import (
    config_hash,
    input_fingerprint,
    partition_files,
    read_manifest,
    run_partitioned,
)


@pytest.fixture()
def out_dir(tmp_path):
    return str(tmp_path / "out")


def _read_all(out_dir):
    frames = []
    for name in sorted(os.listdir(out_dir)):
        if name.startswith("part="):
            for f in os.listdir(os.path.join(out_dir, name)):
                if f.endswith(".parquet"):
                    frames.append(
                        pq.read_table(os.path.join(out_dir, name, f)).to_pandas()
                    )
    return (
        pd.concat(frames).sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )


def test_full_run_matches_oracle(t1_files, t1_expected, out_dir):
    recs = run_partitioned(t1_files, out_dir, num_partitions=2, batch_size=256)
    assert all(r["status"] == "complete" for r in recs)
    assert sum(r["rows_in"] for r in recs) == t1_expected.num_rows
    assert sum(r["rows_out"] for r in recs) == t1_expected.num_rows
    got = _read_all(out_dir)
    want = t1_expected.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert (got["extracted_text"] == want["extracted_text"]).all()


def test_resume_skips_complete_partitions(t1_files, out_dir):
    run_partitioned(t1_files, out_dir, num_partitions=2, batch_size=256)
    mtimes = {
        name: os.path.getmtime(os.path.join(out_dir, name))
        for name in os.listdir(out_dir)
        if name.startswith("part=")
    }
    # Simulate a crash that lost partition 1.
    shutil.rmtree(os.path.join(out_dir, "part=1"))
    recs = run_partitioned(t1_files, out_dir, num_partitions=2, batch_size=256)
    assert {r["partition_id"] for r in recs} == {0, 1}
    # Partition 0 untouched (resume skipped it) ...
    assert os.path.getmtime(os.path.join(out_dir, "part=0")) == mtimes["part=0"]
    # ... partition 1 rebuilt.
    assert os.path.isdir(os.path.join(out_dir, "part=1"))
    # Manifest now holds two entries for pid 1 (old + new), latest wins.
    done = read_manifest(out_dir)
    assert done[1]["status"] == "complete"


def test_max_partitions_kill_and_resume(t1_files, t1_expected, out_dir):
    """max_partitions caps PROCESSED partitions (the deterministic
    stand-in for a mid-run kill / budgeted window): pass 1 leaves the
    manifest a killed job would; pass 2 resumes — skips the completed
    half untouched, processes the rest — and the merged output equals an
    uninterrupted run's."""
    recs1 = run_partitioned(
        t1_files, out_dir, num_partitions=2, batch_size=256,
        max_partitions=1,
    )
    assert [r["partition_id"] for r in recs1] == [0]
    assert not os.path.isdir(os.path.join(out_dir, "part=1"))
    mtimes = {
        name: os.path.getmtime(os.path.join(out_dir, name))
        for name in ("part=0",)
    }
    recs2 = run_partitioned(
        t1_files, out_dir, num_partitions=2, batch_size=256
    )
    assert [r["partition_id"] for r in recs2] == [0, 1]
    assert all(r["status"] == "complete" for r in recs2)
    for name, mt in mtimes.items():  # completed half untouched by resume
        assert os.path.getmtime(os.path.join(out_dir, name)) == mt
    got = _read_all(out_dir)
    want = (
        t1_expected.to_pandas()
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    assert (got["extracted_text"] == want["extracted_text"]).all()


def test_config_change_invalidates_fingerprint(t1_files, out_dir):
    run_partitioned(t1_files, out_dir, num_partitions=2, batch_size=256)
    before = read_manifest(out_dir)
    recs = run_partitioned(
        t1_files, out_dir, num_partitions=2, batch_size=256,
        config_extra={"rule_family": "v2"},
    )
    after = read_manifest(out_dir)
    assert all(
        after[p]["input_fingerprint"] != before[p]["input_fingerprint"]
        for p in before
    )
    assert all(r["status"] == "complete" for r in recs)


def test_fingerprint_covers_config_and_files(t1_files):
    a = input_fingerprint(t1_files, config_hash())
    b = input_fingerprint(t1_files, config_hash({"x": 1}))
    assert a != b
    assert input_fingerprint(t1_files, config_hash()) == a  # deterministic


def test_partition_files_round_robin():
    files = [f"f{i}" for i in range(5)]
    parts = partition_files(files, 2)
    assert sorted(sum(parts, [])) == files
    assert len(parts) == 2
    parts1 = partition_files(files, 10)  # more partitions than files
    assert len(parts1) == 5


def test_resolved_config_artifact_written(t1_files, out_dir):
    """The run writes its resolved config (K6 analog) next to the outputs,
    and the artifact's hash matches the fingerprint's config hash."""
    run_partitioned(
        t1_files, out_dir, num_partitions=2, batch_size=256,
        config_extra={"rule_family": "default"},
    )
    with open(os.path.join(out_dir, "_config.json")) as f:
        resolved = json.load(f)
    assert resolved["config_hash"] == config_hash({"rule_family": "default"})
    assert resolved["num_partitions"] == 2
    assert resolved["config_extra"] == {"rule_family": "default"}
    assert sorted(resolved["input_files"]) == sorted(t1_files)


def test_stale_partitions_removed_on_shrink(t1_files, out_dir):
    """Shrinking the partition count must delete orphaned part dirs and
    their manifest entries — otherwise readers of out_dir/** mix stale
    rows with fresh output."""
    run_partitioned(t1_files, out_dir, num_partitions=2, batch_size=256)
    assert os.path.isdir(os.path.join(out_dir, "part=1"))
    # leave a stray tmp dir from a "crashed" run too
    os.makedirs(os.path.join(out_dir, ".tmp-part=7"))
    recs = run_partitioned(t1_files, out_dir, num_partitions=1, batch_size=256)
    assert [r["partition_id"] for r in recs] == [0]
    names = set(os.listdir(out_dir))
    assert "part=1" not in names and ".tmp-part=7" not in names
    assert read_manifest(out_dir).keys() == {0}
    # total rows unchanged: everything now lives in part=0
    total = sum(r["rows_out"] for r in recs)
    assert total == sum(
        pq.ParquetFile(os.path.join(out_dir, "part=0", f)).metadata.num_rows
        for f in os.listdir(os.path.join(out_dir, "part=0"))
        if f.endswith(".parquet")
    )


def test_manifest_lines_are_lineage_records(t1_files, out_dir):
    run_partitioned(t1_files, out_dir, num_partitions=2, batch_size=256)
    with open(os.path.join(out_dir, "_manifest.jsonl")) as f:
        recs = [json.loads(line) for line in f if line.strip()]
    for rec in recs:
        assert set(rec) == {
            "partition_id", "input_fingerprint", "rows_in", "rows_out",
            "extraction_ms", "stages", "status",
        }
        assert rec["extraction_ms"] > 0
        # per-stage attribution (SURVEY SS6): every pipeline stage timed
        assert {"read_s", "extract_s", "order_s", "write_s"} <= set(rec["stages"])


def test_actor_crash_mid_stream_recovers(tmp_path):
    """Simulated worker death: one actor-pool worker os._exit(1)s on its
    first batch (machine-failure class, not an application exception).
    Ray Data must restart the actor, retry the lost tasks, and produce
    output identical to a crash-free run — the single-node stand-in for
    the north rule's fixed-cluster fault tolerance, and evidence that
    every stage being deterministic makes retries invisible."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray
    import ray.data

    flag = str(tmp_path / "crash_once")

    class CrashOnce:
        def __init__(self, flag_path):
            self._flag = flag_path

        def __call__(self, batch):
            try:
                fd = os.open(self._flag, os.O_CREAT | os.O_EXCL)
                os.close(fd)
                os._exit(1)  # simulate sudden worker/machine death, once
            except FileExistsError:
                pass
            return pa.table({"y": pc.multiply(batch["x"], 2)})

    ds = ray.data.from_arrow(
        pa.table({"x": pa.array(range(10_000), pa.int64())})
    ).repartition(8)
    out = ds.map_batches(
        CrashOnce,
        fn_constructor_args=(flag,),
        batch_format="pyarrow",
        concurrency=2,
        num_cpus=1,
    ).to_pandas()
    assert os.path.exists(flag)  # the crash really happened
    assert sorted(out["y"]) == [2 * x for x in range(10_000)]


def test_keep_going_records_failure_and_rerun_retries(t1_files, out_dir, tmp_path):
    """100 TB posture: one corrupt shard must not kill the job. With
    keep_going=True the bad partition gets a status=failed lineage
    record (error string included), the good partition completes, and a
    rerun with the shard repaired retries ONLY the failed partition."""
    # copy inputs so one can be corrupted
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    files = []
    for f in t1_files:
        dst = str(in_dir / os.path.basename(f))
        shutil.copy(f, dst)
        files.append(dst)
    files = sorted(files)
    bad = files[1]  # round-robin: files[1] -> partition 1
    good_bytes = open(bad, "rb").read()
    with open(bad, "wb") as fh:
        fh.write(b"not a parquet file at all")

    recs = run_partitioned(
        files, out_dir, num_partitions=2, batch_size=256, keep_going=True
    )
    by_pid = {r["partition_id"]: r for r in recs}
    assert by_pid[0]["status"] == "complete"
    assert by_pid[1]["status"] == "failed" and by_pid[1]["error"]
    assert os.path.isdir(os.path.join(out_dir, "part=0"))
    assert not os.path.isdir(os.path.join(out_dir, "part=1"))
    assert not os.path.isdir(os.path.join(out_dir, ".tmp-part=1"))
    # manifest's last word per pid reflects the failure
    assert read_manifest(out_dir)[1]["status"] == "failed"

    # repair the shard; rerun retries only partition 1
    with open(bad, "wb") as fh:
        fh.write(good_bytes)
    m0 = os.path.getmtime(os.path.join(out_dir, "part=0"))
    recs2 = run_partitioned(
        files, out_dir, num_partitions=2, batch_size=256, keep_going=True
    )
    assert all(r["status"] == "complete" for r in recs2)
    assert os.path.getmtime(os.path.join(out_dir, "part=0")) == m0
    assert read_manifest(out_dir)[1]["status"] == "complete"

    # default posture still fails loudly (after recording)
    with open(bad, "wb") as fh:
        fh.write(b"corrupt again")
    out2 = str(tmp_path / "out2")
    with pytest.raises(Exception):
        run_partitioned(files, out2, num_partitions=2, batch_size=256)
    failed = [r for r in read_manifest(out2).values() if r["status"] == "failed"]
    assert failed and failed[0]["error"]


def test_finalize_partitioned_equals_flagship(tmp_path):
    """A conversation whose rows span input files in DIFFERENT partitions
    gets a shard-local conv_n_turns from run_partitioned (documented);
    finalize_partitioned re-runs the ordering exchange globally and the
    result is bit-equal to the single-plan flagship output."""
    import numpy as np
    import pyarrow as pa

    from engine.checkpoint import finalize_partitioned
    from engine.pipeline import extraction_plan

    # conv-span has turns 0-9 in file a, 10-19 in file b (diff partitions)
    def mk(path, conv_rows):
        conv, turn = [], []
        for cid, turns in conv_rows:
            conv += [cid] * len(turns)
            turn += list(turns)
        t = pa.table(
            {
                "conv_id": pa.array(conv, pa.string()),
                "turn_idx": pa.array(turn, pa.int32()),
                "role": pa.array(
                    ["user" if i % 2 == 0 else "assistant" for i in turn]
                ),
                "text": pa.array([f"text {c}/{i}" for c, i in zip(conv, turn)]),
            }
        )
        pq.write_table(t, path)

    fa = str(tmp_path / "a.parquet")
    fb = str(tmp_path / "b.parquet")
    mk(fa, [("conv-span", range(0, 10)), ("conv-a", range(4))])
    mk(fb, [("conv-span", range(10, 20)), ("conv-b", range(6))])

    out = str(tmp_path / "parts")
    recs = run_partitioned([fa, fb], out, num_partitions=2, batch_size=64)
    assert all(r["status"] == "complete" for r in recs)
    # shard-local sizes: the spanning conversation reads 10 in each part
    local = _read_all(out)
    span_sizes = set(
        local.loc[local["conv_id"] == "conv-span", "conv_n_turns"]
    )
    assert span_sizes == {10}

    final = str(tmp_path / "final")
    finalize_partitioned(out, final)
    got = (
        pq.read_table(final)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want = (
        extraction_plan([fa, fb], batch_size=64)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[want.columns.tolist()], want
    )
    assert (
        got.loc[got["conv_id"] == "conv-span", "conv_n_turns"] == 20
    ).all()


def test_job_config_layering(tmp_path):
    """defaults <- file <- CLI, with unknown keys refused loudly (the
    reference's AppConfig stack, config.rs:17-173)."""
    from engine.checkpoint import (
        JOB_DEFAULTS, load_job_config, resolve_job_config,
    )

    toml = tmp_path / "job.toml"
    toml.write_text(
        'input = "/data/in"\noutput = "/data/out"\nnum_partitions = 8\n'
        '[extractor]\nruleset = "v2"\n'
    )
    file_cfg = load_job_config(str(toml))
    r = resolve_job_config(file_cfg, {"num_partitions": 16, "input": None})
    assert r["num_partitions"] == 16          # CLI wins over file
    assert r["input"] == "/data/in"           # None CLI does not override
    assert r["output"] == "/data/out"
    assert r["batch_size"] == JOB_DEFAULTS["batch_size"]  # default survives
    assert r["extractor"] == {"ruleset": "v2"}

    js = tmp_path / "job.json"
    js.write_text(json.dumps({"salt_block": 512}))
    assert resolve_job_config(load_job_config(str(js)))["salt_block"] == 512

    bad = tmp_path / "bad.toml"
    bad.write_text('nmu_partitions = 8\n')
    with pytest.raises(ValueError, match="unknown job-config keys"):
        load_job_config(str(bad))
    with pytest.raises(ValueError, match="unknown job-config key"):
        resolve_job_config(None, {"typo": 1})
    # ADVICE r4: a non-dict extractor override must be a loud
    # ValueError, not a TypeError from dict.update
    with pytest.raises(ValueError, match="extractor must be a mapping"):
        resolve_job_config(None, None, {"extractor": 5})
    # ... and the resolved extractor dict must never alias JOB_DEFAULTS
    r = resolve_job_config()
    r["extractor"]["mutated"] = True
    assert "mutated" not in JOB_DEFAULTS["extractor"]


def test_extractor_config_change_reprocesses(t1_files, out_dir):
    """The extractor section participates in partition fingerprints: an
    unchanged config resumes as a no-op; a changed one reprocesses —
    outputs produced under different extraction semantics never mix."""
    extra = {"extractor": {"ruleset": "v1"}}
    run_partitioned(t1_files, out_dir, num_partitions=2, batch_size=256,
                    config_extra=extra)
    mtimes = {
        n: os.path.getmtime(os.path.join(out_dir, n))
        for n in os.listdir(out_dir) if n.startswith("part=")
    }
    run_partitioned(t1_files, out_dir, num_partitions=2, batch_size=256,
                    config_extra=extra)
    for n, m in mtimes.items():
        assert os.path.getmtime(os.path.join(out_dir, n)) == m  # no-op
    run_partitioned(t1_files, out_dir, num_partitions=2, batch_size=256,
                    config_extra={"extractor": {"ruleset": "v2"}})
    for n, m in mtimes.items():
        assert os.path.getmtime(os.path.join(out_dir, n)) > m  # reprocessed


def test_finalize_refuses_without_config(t1_files, out_dir, tmp_path):
    """finalize must fail loudly when _config.json is absent (foreign or
    legacy out_dir): completeness cannot be verified, so an incomplete
    corpus could otherwise be finalized silently."""
    from engine.checkpoint import CONFIG_NAME, finalize_partitioned

    run_partitioned(t1_files, out_dir, num_partitions=2, batch_size=256)
    os.remove(os.path.join(out_dir, CONFIG_NAME))
    with pytest.raises(ValueError, match="_config.json is missing"):
        finalize_partitioned(out_dir, str(tmp_path / "final"))


def test_failure_record_keeps_computed_rows_in(out_dir, tmp_path):
    """A failure AFTER the input row count (here: a null ordering key
    aborting extraction) must record the real rows_in, not -1 — triage
    telemetry the lineage consumer needs."""
    import pyarrow as pa

    t = pa.table(
        {
            "conv_id": pa.array(["c1", None, "c1"]),
            "turn_idx": pa.array([0, 1, 2], pa.int32()),
            "role": pa.array(["user"] * 3),
            "text": pa.array(["a", "b", "c"]),
        }
    )
    p = str(tmp_path / "nullkey.parquet")
    pq.write_table(t, p)
    recs = run_partitioned(
        [p], out_dir, num_partitions=1, batch_size=64, keep_going=True
    )
    assert recs[0]["status"] == "failed"
    assert recs[0]["rows_in"] == 3


def test_finalize_refuses_partial_run(t1_files, out_dir, tmp_path):
    """finalize over a run with a failed partition must refuse loudly —
    silently finalizing would emit an incomplete corpus."""
    from engine.checkpoint import finalize_partitioned

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    files = []
    for f in t1_files:
        dst = str(in_dir / os.path.basename(f))
        shutil.copy(f, dst)
        files.append(dst)
    files = sorted(files)
    keep = open(files[1], "rb").read()
    with open(files[1], "wb") as fh:
        fh.write(b"corrupt")
    run_partitioned(files, out_dir, num_partitions=2, batch_size=256,
                    keep_going=True)
    with pytest.raises(ValueError, match="not +complete|are not"):
        finalize_partitioned(out_dir, str(tmp_path / "final"))
    # repaired rerun -> finalize succeeds
    with open(files[1], "wb") as fh:
        fh.write(keep)
    run_partitioned(files, out_dir, num_partitions=2, batch_size=256,
                    keep_going=True)
    finalize_partitioned(out_dir, str(tmp_path / "final"))
    assert os.path.isdir(str(tmp_path / "final"))


def test_set_override_layer(tmp_path):
    """Fourth config layer: per-run --set overrides merge ABOVE the CLI
    (the reference's per-request override layer, routes.rs:164-176),
    with JSON-parsed values, extractor dict-merge, and loud errors."""
    from engine.checkpoint import (
        load_job_config, parse_set_overrides, resolve_job_config,
    )

    toml = tmp_path / "job.toml"
    toml.write_text(
        'input = "/data/in"\noutput = "/data/out"\nnum_partitions = 8\n'
        '[extractor]\nruleset = "v2"\nlang = "en"\n'
    )
    ov = parse_set_overrides(
        ["num_partitions=128", "keep_going=true", "extractor.ruleset=v3"]
    )
    assert ov == {
        "num_partitions": 128,
        "keep_going": True,
        "extractor": {"ruleset": "v3"},
    }
    r = resolve_job_config(
        load_job_config(str(toml)), {"num_partitions": 16}, ov
    )
    assert r["num_partitions"] == 128          # override beats CLI
    assert r["keep_going"] is True
    # extractor DICT-merges: the file's other keys survive the override
    assert r["extractor"] == {"ruleset": "v3", "lang": "en"}

    with pytest.raises(ValueError, match="key=value"):
        parse_set_overrides(["num_partitions"])
    with pytest.raises(ValueError, match="extractor"):
        parse_set_overrides(["foo.bar=1"])
    with pytest.raises(ValueError, match="unknown job-config key"):
        resolve_job_config(None, None, parse_set_overrides(["typo=1"]))


def test_set_override_reprocesses_only_semantic_changes(t1_files, out_dir):
    """An extractor --set override flows into partition fingerprints
    (everything it governs reprocesses); a non-semantic override
    (batch_size) leaves fingerprints — and the finished partitions —
    untouched on rerun."""
    from engine.checkpoint import parse_set_overrides, resolve_job_config

    def run_with(sets, batch_size=256):
        cfg = resolve_job_config(None, None, parse_set_overrides(sets))
        return run_partitioned(
            t1_files, out_dir, num_partitions=2, batch_size=batch_size,
            config_extra=(
                {"extractor": cfg["extractor"]} if cfg["extractor"] else None
            ),
        )

    run_with(["extractor.ruleset=v1"])
    mtimes = {
        n: os.path.getmtime(os.path.join(out_dir, n))
        for n in os.listdir(out_dir) if n.startswith("part=")
    }
    # non-semantic override: physical knob only — no reprocessing
    run_with(["extractor.ruleset=v1"], batch_size=512)
    for n, m in mtimes.items():
        assert os.path.getmtime(os.path.join(out_dir, n)) == m
    # semantic override: new fingerprint — all governed partitions redo
    run_with(["extractor.ruleset=v2"])
    for n, m in mtimes.items():
        assert os.path.getmtime(os.path.join(out_dir, n)) > m
