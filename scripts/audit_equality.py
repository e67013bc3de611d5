"""One-shot per-turn equality audit: Ray pipeline vs single-process oracle
at ANY synthesized tier (default: the 620k-turn bench tier — ~10x the
scale the e2e pytest gate runs at).

The judged invariant is per-turn text equality under stable turn ordering
(BASELINE.json north_rule); the pytest gate pins it on the t1 tier. This
script re-proves it at bench/stress scale: the full extraction plan runs
under Ray at RAY_GRAFT_CPUS, the oracle (engine/oracle.py — the same pure
per-turn functions run row-at-a-time, no Ray) runs in a multiprocessing
pool over the same files, and EVERY turn's (extracted_text, spans,
blocks, n_blocks) is compared. Prints one JSON line:

    {"tier": ..., "turns": N, "mismatched_turns": 0, "pipeline_sec": ...,
     "oracle_sec": ..., "equal": true}

Usage: python scripts/audit_equality.py [tier]   (default "bench")
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa


def _oracle_one(path: str) -> "pa.Table":
    from engine.oracle import oracle_extract_dir

    return oracle_extract_dir([path])


def main() -> int:
    tier = sys.argv[1] if len(sys.argv) > 1 else "bench"
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from engine import synth
    from engine.pipeline import extraction_plan

    fdir = synth.fixture_dir(tier)
    files = sorted(
        os.path.join(fdir, p) for p in os.listdir(fdir) if p.endswith(".parquet")
    )

    t0 = time.perf_counter()
    got = (
        extraction_plan(files, batch_size=1024,
                        concurrency=max(2, (3 * num_cpus) // 4))
        .to_arrow_refs()
    )
    got = pa.concat_tables(
        [ray.get(r) for r in got], promote_options="permissive"
    )
    pipeline_sec = time.perf_counter() - t0

    ray.shutdown()  # free CPUs; also: forking a Ray-initialized (threaded)
    # process deadlocks — the oracle pool must use spawn regardless
    t0 = time.perf_counter()
    with mp.get_context("spawn").Pool(min(len(files), num_cpus)) as pool:
        parts = pool.map(_oracle_one, files)
    want = pa.concat_tables(parts, promote_options="permissive")
    oracle_sec = time.perf_counter() - t0

    cols = ["extracted_text", "spans", "blocks", "n_blocks"]
    keys = [("conv_id", "ascending"), ("turn_idx", "ascending")]
    got_s = got.sort_by(keys)
    want_s = want.sort_by(keys)
    assert got_s.num_rows == want_s.num_rows, (got_s.num_rows, want_s.num_rows)

    mismatched = 0
    for c in cols:
        ta = got_s.select([c])
        tb = want_s.select([c])
        if ta.schema != tb.schema:
            tb = tb.cast(ta.schema)
        if not ta.equals(tb):
            # slow path only on failure: count and name the first few
            a, b = ta.column(c).to_pylist(), tb.column(c).to_pylist()
            bad = [i for i, (x, y) in enumerate(zip(a, b)) if x != y]
            mismatched = max(mismatched, len(bad))
            for i in bad[:3]:
                row = got_s.slice(i, 1).to_pylist()[0]
                print(
                    f"MISMATCH col={c} conv={row['conv_id']} "
                    f"turn={row['turn_idx']}", file=sys.stderr,
                )

    print(json.dumps({
        "tier": tier,
        "turns": got_s.num_rows,
        "files": len(files),
        "num_cpus": num_cpus,
        "mismatched_turns": mismatched,
        "pipeline_sec": round(pipeline_sec, 3),
        "oracle_sec": round(oracle_sec, 3),
        "equal": mismatched == 0,
    }))
    return 0 if mismatched == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
