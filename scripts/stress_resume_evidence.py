"""Scale-tier resume-after-kill evidence (VERDICT r4 #6).

Runs the flagship extraction over the STRESS corpus (~2.49M turns)
through the per-partition checkpoint runner with a simulated mid-run
kill: pass 1 is budget-capped at half the partitions (its manifest is
byte-for-byte what a killed job leaves), pass 2 resumes. Verifies that

  - the completed half is NOT reprocessed (part-dir mtimes unchanged),
  - every partition ends complete with rows_in == rows_out,
  - total rows out == total rows in the input corpus,

then prints ONE JSON line with the lineage summary for BASELINE.md.

Usage: python scripts/stress_resume_evidence.py [tier] (default stress)
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tier = sys.argv[1] if len(sys.argv) > 1 else "stress"
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    import pyarrow.parquet as pq
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from engine import synth
    from engine.checkpoint import run_partitioned

    d = synth.fixture_dir(tier)
    files = sorted(
        os.path.join(d, p) for p in os.listdir(d) if p.endswith(".parquet")
    )
    rows_total = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    out = f"/tmp/stress_resume_evidence_{tier}"
    shutil.rmtree(out, ignore_errors=True)
    n_parts = 16

    t0 = time.perf_counter()
    recs1 = run_partitioned(
        files, out, num_partitions=n_parts, batch_size=2048,
        max_partitions=n_parts // 2,
    )
    t_kill = time.perf_counter() - t0
    done1 = sorted(r["partition_id"] for r in recs1)
    mtimes = {
        p: os.path.getmtime(os.path.join(out, f"part={p}")) for p in done1
    }

    t0 = time.perf_counter()
    recs2 = run_partitioned(
        files, out, num_partitions=n_parts, batch_size=2048
    )
    t_resume = time.perf_counter() - t0

    untouched = all(
        os.path.getmtime(os.path.join(out, f"part={p}")) == mtimes[p]
        for p in done1
    )
    all_complete = all(r["status"] == "complete" for r in recs2)
    rows_out = sum(r["rows_out"] for r in recs2)
    rows_in = sum(r["rows_in"] for r in recs2)
    summary = {
        "tier": tier,
        "num_partitions": n_parts,
        "killed_after": len(done1),
        "pass1_sec": round(t_kill, 3),
        "resume_sec": round(t_resume, 3),
        "completed_half_untouched_on_resume": untouched,
        "all_complete": all_complete,
        "rows_in": rows_in,
        "rows_out": rows_out,
        "rows_corpus": rows_total,
        "row_complete": rows_out == rows_total and rows_in == rows_total,
        "resumed_partitions": sorted(
            r["partition_id"] for r in recs2
            if r["partition_id"] not in set(done1)
        ),
        "manifest": os.path.join(out, "_manifest.jsonl"),
    }
    print(json.dumps(summary))
    ok = untouched and all_complete and summary["row_complete"]
    ray.shutdown()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
