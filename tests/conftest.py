import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray  # noqa: E402
import ray.data  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def t1_files():
    from engine import synth

    d = synth.fixture_dir("t1")
    return sorted(
        os.path.join(d, p) for p in os.listdir(d) if p.endswith(".parquet")
    )


@pytest.fixture(scope="session")
def t1_expected(t1_files):
    from engine import oracle

    return oracle.oracle_extract_dir(t1_files)
