"""Worker-loss recovery: a pipeline must produce row-identical output
when a worker process dies mid-run — on a 256-node cluster, worker and
node loss is routine, and Ray's lineage-based task retry is the
mechanism the engine relies on instead of application-level retries
(the reference's analog is request-level retry in the server loop,
/root/reference/crates/server — here recovery lives a layer down, in
the execution engine).

The injected failure is a hard ``os._exit(1)`` (a SYSTEM_ERROR worker
death, same failure class as OOM-kill or node loss), NOT a Python
exception: Ray Data deliberately fails the dataset on application
errors (``max_errored_blocks=0``) and we keep that fail-fast posture.
A marker file arms exactly one crash per test; ``os.unlink`` is the
atomic claim so precisely one worker dies no matter how many race.

Everything a worker deserializes (UDFs, actor classes) is defined
INSIDE each test so cloudpickle serializes it by value — a module-level
helper here would pickle by reference to this test module, which is on
the driver's sys.path (pytest prepends tests/) but NOT on the workers',
and the resulting ModuleNotFoundError inside an actor constructor
retries forever instead of failing the test.
"""

import os

import pandas as pd
import pytest
import ray
import ray.data

from engine.pipeline import extraction_plan


def _arm(tmp_path) -> str:
    marker = str(tmp_path / "crash-armed")
    open(marker, "w").close()
    return marker


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def test_task_stage_survives_worker_death(tmp_path):
    marker = _arm(tmp_path)

    def passthrough(batch):
        import os as _os

        try:
            _os.unlink(marker)  # atomic claim: exactly one winner dies
            _os._exit(1)
        except FileNotFoundError:
            pass
        return batch

    ds = ray.data.range(20_000, override_num_blocks=8)
    got = sorted(
        r["id"]
        for r in ds.map_batches(passthrough, batch_format="pyarrow").take_all()
    )
    assert not os.path.exists(marker), "the injected crash never fired"
    assert got == list(range(20_000))


def test_actor_stage_survives_actor_death(tmp_path):
    marker = _arm(tmp_path)

    class Passthrough:
        def __init__(self, marker):
            self.marker = marker

        def __call__(self, batch):
            import os as _os

            try:
                _os.unlink(self.marker)
                _os._exit(1)
            except FileNotFoundError:
                pass
            return batch

    ds = ray.data.range(20_000, override_num_blocks=8)
    got = sorted(
        r["id"]
        for r in ds.map_batches(
            Passthrough,
            fn_constructor_kwargs={"marker": marker},
            concurrency=2,
            batch_format="pyarrow",
        ).take_all()
    )
    assert not os.path.exists(marker), "the injected crash never fired"
    assert got == list(range(20_000))


def test_flagship_survives_extract_actor_death(
    tmp_path, t1_files, t1_expected, monkeypatch
):
    """The full flagship plan (read -> ExtractTurns actor pool -> ordering
    exchange) with one ExtractTurns actor killed mid-extraction must still
    match the oracle per turn, bit for bit."""
    import engine.pipeline as pipeline_mod

    marker = _arm(tmp_path)
    base = pipeline_mod.ExtractTurns  # importable on workers; subclass isn't,
    # so the subclass must be defined here (pickled by value).

    class CrashingExtractTurns(base):
        def __call__(self, batch):
            import os as _os

            try:
                _os.unlink(marker)
                _os._exit(1)
            except FileNotFoundError:
                pass
            return super().__call__(batch)

    monkeypatch.setattr(pipeline_mod, "ExtractTurns", CrashingExtractTurns)
    # Small batches so multiple extract tasks exist and the crash lands
    # mid-stream, not on the only task.
    got = _sorted(extraction_plan(t1_files, batch_size=64).to_pandas())
    expected = _sorted(t1_expected.to_pandas())

    assert not os.path.exists(marker), "the injected crash never fired"
    assert len(got) == len(expected)
    assert (got["extracted_text"] != expected["extracted_text"]).sum() == 0
    # conv_n_turns isn't an oracle column; check its global invariant.
    sizes = got.groupby("conv_id")["turn_idx"].max() + 1
    for conv_id, grp in got.groupby("conv_id"):
        assert (grp["conv_n_turns"] == sizes[conv_id]).all()
