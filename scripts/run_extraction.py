"""Cluster job entrypoint for the flagship extraction pipeline.

The ``ray job submit`` form of the engine (north rule): on a cluster,

    ray job submit --working-dir . -- \
        python scripts/run_extraction.py \
            --input '/data/transcripts/*.parquet' --output /data/extracted \
            --num-partitions 64 --salt-block 512

and locally the same command runs against a local Ray (`RAY_ADDRESS=local`).
This script OWNS its Ray session (init if absent, shutdown at exit) —
library code in `engine/` never does (driver contract).

Resume: rerunning with the same input + output skips partitions whose
lineage manifest entry is complete with a matching fingerprint; a changed
input file or extractor config reprocesses only the affected partitions.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True,
                    help="parquet file, glob, or directory of transcript shards")
    ap.add_argument("--output", required=True, help="output directory")
    ap.add_argument("--num-partitions", type=int, default=64,
                    help="checkpoint partitions (resume granularity)")
    ap.add_argument("--salt-block", type=int, default=None,
                    help="salt skewed conversations every N turns")
    ap.add_argument("--batch-size", type=int, default=2048)
    ap.add_argument("--concurrency", type=int, default=None,
                    help="extraction actor-pool size (default: cluster CPUs - 1)")
    ap.add_argument("--keep-going", action="store_true",
                    help="record failed partitions in the manifest and "
                         "continue (rerun retries only the failed set)")
    args = ap.parse_args()

    if os.path.isdir(args.input):
        files = sorted(glob.glob(os.path.join(args.input, "*.parquet")))
    else:
        files = sorted(glob.glob(args.input))
    if not files:
        print(f"no parquet inputs match {args.input!r}", file=sys.stderr)
        return 2

    import ray

    if not ray.is_initialized():
        # On a cluster, RAY_ADDRESS is set by the job runtime; locally it
        # defaults to a fresh local session.
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    concurrency = args.concurrency
    if concurrency is None:
        concurrency = max(2, int(ray.cluster_resources().get("CPU", 4)) - 1)

    from engine.checkpoint import run_partitioned

    records = run_partitioned(
        files,
        args.output,
        num_partitions=args.num_partitions,
        salt_block=args.salt_block,
        batch_size=args.batch_size,
        concurrency=concurrency,
        keep_going=args.keep_going,
    )
    done = sum(1 for r in records if r["status"] == "complete")
    failed = sum(1 for r in records if r["status"] == "failed")
    rows = sum(r["rows_out"] for r in records)
    print(json.dumps({"partitions": len(records), "complete": done,
                      "failed": failed, "rows_out": rows,
                      "output": args.output}))
    ray.shutdown()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
