"""Cluster job entrypoint for the flagship extraction pipeline.

The ``ray job submit`` form of the engine (north rule): on a cluster,

    ray job submit --working-dir . -- \
        python scripts/run_extraction.py \
            --input '/data/transcripts/*.parquet' --output /data/extracted \
            --num-partitions 64 --salt-block 512

and locally the same command runs against a local Ray (`RAY_ADDRESS=local`).
This script OWNS its Ray session (init if absent, shutdown at exit) —
library code in `engine/` never does (driver contract).

Configuration layers like the reference's AppConfig (defaults -> TOML
file -> CLI flags, /root/reference/crates/config/src/config.rs:17-173):
``--config job.toml`` (or .json) supplies any of the knobs below plus an
``[extractor]`` table hashed into partition fingerprints; explicit CLI
flags override the file. Example TOML:

    input = "/data/transcripts"
    output = "/data/extracted"
    num_partitions = 64
    salt_block = 512
    [extractor]
    ruleset = "v2"

Resume: rerunning with the same input + output + config skips partitions
whose lineage manifest entry is complete with a matching fingerprint; a
changed input file reprocesses its partition only, and a changed
``extractor`` section reprocesses everything it governs — never a silent
mix of old and new semantics.
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
    ap.add_argument("--config", default=None,
                    help="JSON/TOML job config; CLI flags override it")
    ap.add_argument("--input", default=None,
                    help="parquet file, glob, or directory of transcript shards")
    ap.add_argument("--output", default=None, help="output directory")
    ap.add_argument("--num-partitions", type=int, default=None,
                    help="checkpoint partitions (resume granularity; default 64)")
    ap.add_argument("--salt-block", type=int, default=None,
                    help="salt skewed conversations every N turns")
    ap.add_argument("--batch-size", type=int, default=None,
                    help="extraction batch size (default 2048)")
    ap.add_argument("--concurrency", type=int, default=None,
                    help="extraction actor-pool size (default: cluster CPUs - 1)")
    ap.add_argument("--keep-going", action="store_const", const=True,
                    default=None,
                    help="record failed partitions in the manifest and "
                         "continue (rerun retries only the failed set)")
    ap.add_argument("--max-partitions", type=int, default=None,
                    help="process at most N partitions this invocation "
                         "(budgeted window; rerun resumes where it left "
                         "off)")
    ap.add_argument("--set", dest="overrides", action="append", default=None,
                    metavar="KEY=VALUE",
                    help="per-run override above config file and flags; "
                         "repeatable; values JSON-parsed (--set "
                         "num_partitions=128, --set extractor.ruleset=v3)")
    args = ap.parse_args()

    from engine.checkpoint import (
        load_job_config,
        parse_set_overrides,
        resolve_job_config,
        run_partitioned,
    )

    file_cfg = load_job_config(args.config) if args.config else None
    cfg = resolve_job_config(
        file_cfg,
        {
            "input": args.input,
            "output": args.output,
            "num_partitions": args.num_partitions,
            "salt_block": args.salt_block,
            "batch_size": args.batch_size,
            "concurrency": args.concurrency,
            "keep_going": args.keep_going,
            "max_partitions": args.max_partitions,
        },
        parse_set_overrides(args.overrides),
    )
    if not cfg["input"] or not cfg["output"]:
        print("input and output are required (flag or config file)",
              file=sys.stderr)
        return 2

    if os.path.isdir(cfg["input"]):
        files = sorted(glob.glob(os.path.join(cfg["input"], "*.parquet")))
    else:
        files = sorted(glob.glob(cfg["input"]))
    if not files:
        print(f"no parquet inputs match {cfg['input']!r}", file=sys.stderr)
        return 2

    import ray

    if not ray.is_initialized():
        # On a cluster, RAY_ADDRESS is set by the job runtime; locally it
        # defaults to a fresh local session.
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    concurrency = cfg["concurrency"]
    if concurrency is None:
        concurrency = max(2, int(ray.cluster_resources().get("CPU", 4)) - 1)

    records = run_partitioned(
        files,
        cfg["output"],
        num_partitions=cfg["num_partitions"],
        # the extractor section participates in partition fingerprints;
        # None when absent preserves fingerprints of pre-config runs
        config_extra=(
            {"extractor": cfg["extractor"]} if cfg["extractor"] else None
        ),
        salt_block=cfg["salt_block"],
        batch_size=cfg["batch_size"],
        concurrency=concurrency,
        keep_going=cfg["keep_going"],
        max_partitions=cfg["max_partitions"],
    )
    done = sum(1 for r in records if r["status"] == "complete")
    failed = sum(1 for r in records if r["status"] == "failed")
    rows = sum(r["rows_out"] for r in records)
    print(json.dumps({"partitions": len(records), "complete": done,
                      "failed": failed, "rows_out": rows,
                      "output": cfg["output"]}))
    ray.shutdown()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
