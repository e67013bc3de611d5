"""Streaming-posture evidence: the flagship must finish under an object
store far smaller than the corpus it moves.

At 100 TB no node holds a meaningful fraction of the dataset; the
engine's claim is that its plan is a STREAM (read -> extract -> one
bounded ordering exchange -> write) whose live footprint is bounded by
block size x concurrency, not input size. This probe runs the bench-tier
flagship job (~620k turns, ~1.3 GB extracted text in flight) against a
deliberately tiny object store and reports:

- completion + output row count (must equal input),
- object-store spill/restore bytes from ray's memory summary (spilling
  is ALLOWED — the claim is graceful degradation, not zero spill),
- wall time vs an uncapped reference run in the same process state.

Usage:
    python scripts/stream_probe.py [--tier bench] [--store-mb 512]

Owns its Ray session (script), like bench.py — library code never inits.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "/tmp/stream_probe_out"


def run_once(files, num_cpus: int, store_bytes: int | None) -> dict:
    import ray

    kw = {}
    if store_bytes is not None:
        kw["object_store_memory"] = store_bytes
    ray.init(
        address="local", num_cpus=num_cpus, include_dashboard=False,
        logging_level="ERROR", **kw,
    )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    from engine.pipeline import extraction_plan

    shutil.rmtree(OUT, ignore_errors=True)
    t0 = time.perf_counter()
    ds = extraction_plan(
        files, batch_size=1024,
        concurrency=max(2, num_cpus - 1 if num_cpus <= 16 else (3 * num_cpus) // 4),
        num_blocks=64, num_buckets=32,
    )
    ds.write_parquet(OUT)
    wall = time.perf_counter() - t0

    import pyarrow.parquet as pq

    rows_out = sum(
        pq.ParquetFile(os.path.join(OUT, f)).metadata.num_rows
        for f in os.listdir(OUT) if f.endswith(".parquet")
    )
    # spill telemetry: the raylet logs cumulative "Spilled N MiB" /
    # "Restored N MiB" progress lines into the session's raylet.out; the
    # memory_summary() API string only shows LIVE spilled objects, which is
    # 0 after restores complete — so read the log for the cumulative totals.
    spilled_mb = restored_mb = 0
    try:
        session_dir = ray._private.worker._global_node.get_session_dir_path()
        raylet_log = os.path.join(session_dir, "logs", "raylet.out")
        with open(raylet_log, "r", errors="replace") as fh:
            for line in fh:
                if "Spilled" in line and "MiB" in line:
                    spilled_mb = int(
                        line.split("Spilled")[1].split("MiB")[0].strip())
                if "Restored" in line and "MiB" in line:
                    restored_mb = int(
                        line.split("Restored")[1].split("MiB")[0].strip())
    except Exception:  # noqa: BLE001 — telemetry only, never fail the probe
        pass
    ray.shutdown()
    return {
        "wall_s": round(wall, 3),
        "rows_out": rows_out,
        "spilled_mb": spilled_mb,
        "restored_mb": restored_mb,
        "object_store_mb": (store_bytes or 0) // (1024 * 1024) or None,
    }


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--tier", default="bench")
    ap.add_argument("--store-mb", type=int, default=512)
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "16")))
    args = ap.parse_args()

    # fixture synth needs a Ray-free import path
    from engine import synth

    fdir = synth.fixture_dir(args.tier)
    files = sorted(
        os.path.join(fdir, p) for p in os.listdir(fdir) if p.endswith(".parquet")
    )
    import pyarrow.parquet as pq

    rows_in = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    input_mb = sum(os.path.getsize(f) for f in files) // (1024 * 1024)

    capped = run_once(files, args.num_cpus, args.store_mb * 1024 * 1024)
    uncapped = run_once(files, args.num_cpus, None)

    ok = capped["rows_out"] == rows_in and uncapped["rows_out"] == rows_in
    print(json.dumps({
        "tier": args.tier,
        "rows_in": rows_in,
        "input_parquet_mb": input_mb,
        "capped": capped,
        "uncapped": uncapped,
        "rows_complete": ok,
        "slowdown": round(capped["wall_s"] / max(uncapped["wall_s"], 1e-9), 3),
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
