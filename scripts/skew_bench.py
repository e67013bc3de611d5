"""Skew-handling evidence: salted vs unsalted ordering on a pathological
conversation-length distribution.

The north rule calls for "explicit repartitioning keyed on conv_id with
salting for skewed long conversations". The regular bench tiers carry a
Zipf tail (every 500th conversation 1000-2500 turns) which the default
pipeline absorbs; THIS fixture is the adversarial case — ONE conversation
holds half the corpus rows (fat ~2 KB turns), so the unsalted ordering
exchange must sort and emit half the corpus bytes in a single reducer
while salting (``salt_block``) spreads the giant conversation across
contiguous-turn-range salt blocks, one reducer each.

Runs both configurations on the same input in one Ray session, verifies
the outputs are IDENTICAL row-for-row (the salted path is an execution
strategy, never a semantics change), and prints one JSON line:

    {"rows": N, "giant_rows": G, "unsalted_sec": ..., "salted_sec": ...,
     "hot_bucket_mb": ..., "speedup": ...}

Usage: python scripts/skew_bench.py   (RAY_GRAFT_CPUS honored, default 16)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

FIXTURE_DIR = "/tmp/skew_fixture"
OUT_A = "/tmp/skew_out_unsalted"
OUT_B = "/tmp/skew_out_salted"
SEED = 42
N_FILES = 16
N_SMALL_CONVS = 25_000
GIANT_ROWS = 1_000_000   # the 10^6-turn conversation the north rule names
SALT_BLOCK = 4096        # -> 245 salt blocks, > num_buckets: fragmentation



def _pool_texts(rng: np.random.Generator, n: int = 64, kb: float = 2.0):
    """n distinct ~kb-sized plain paragraphs (no payload markers — this
    bench isolates the ordering exchange, not the extractors)."""
    words = np.array(
        "the quick corpus turn conversation extraction ray data arrow "
        "shuffle bucket salt order span block text stream batch actor "
        "partition lineage manifest checkpoint resume skew giant".split()
    )
    out = []
    target = int(kb * 1024)
    for _ in range(n):
        parts = []
        size = 0
        while size < target:
            w = " ".join(rng.choice(words, 12))
            parts.append(w + ".")
            size += len(w) + 2
        out.append(" ".join(parts))
    return out


def build_fixture() -> list:
    marker = os.path.join(FIXTURE_DIR, "_COMPLETE")
    params = {"seed": SEED, "files": N_FILES, "small": N_SMALL_CONVS,
              "giant": GIANT_ROWS, "v": 1}
    if os.path.exists(marker) and json.load(open(marker)) == params:
        return sorted(
            os.path.join(FIXTURE_DIR, f) for f in os.listdir(FIXTURE_DIR)
            if f.endswith(".parquet")
        )
    shutil.rmtree(FIXTURE_DIR, ignore_errors=True)
    os.makedirs(FIXTURE_DIR)
    rng = np.random.default_rng(SEED)
    pool = _pool_texts(rng)

    conv_ids, turn_idx = [], []
    # the giant conversation: GIANT_ROWS dense turns
    conv_ids.append(np.full(GIANT_ROWS, "conv-giant"))
    turn_idx.append(np.arange(GIANT_ROWS, dtype=np.int32))
    # small conversations: 10-30 turns each
    lens = rng.integers(10, 31, N_SMALL_CONVS)
    small_ids = np.repeat(
        np.array([f"conv-{i:06d}" for i in range(N_SMALL_CONVS)]), lens
    )
    small_turns = (
        np.arange(lens.sum()) - np.repeat(np.cumsum(lens) - lens, lens)
    ).astype(np.int32)
    conv_ids.append(small_ids)
    turn_idx.append(small_turns)

    conv = np.concatenate(conv_ids)
    turn = np.concatenate(turn_idx)
    n = len(conv)
    role = np.where(turn % 2 == 0, "user", "assistant")
    text = np.array(pool, dtype=object)[rng.integers(0, len(pool), n)]
    ts = np.int64(1_700_000_000_000_000) + np.arange(n, dtype=np.int64)

    # global shuffle so the giant conversation spreads over every file
    # (as it would across input shards at 100 TB)
    perm = rng.permutation(n)
    table = pa.table(
        {
            "conv_id": pa.array(conv[perm], pa.string()),
            "turn_idx": pa.array(turn[perm], pa.int32()),
            "role": pa.array(role[perm], pa.string()),
            "text": pa.array(text[perm], pa.string()),
            "tool": pa.array(np.full(n, ""), pa.string()),
            "ts": pa.array(ts[perm], pa.timestamp("us")),
        }
    )
    per = n // N_FILES
    paths = []
    for i in range(N_FILES):
        lo = i * per
        hi = n if i == N_FILES - 1 else (i + 1) * per
        p = os.path.join(FIXTURE_DIR, f"part-{i:02d}.parquet")
        pq.write_table(table.slice(lo, hi - lo), p)
        paths.append(p)
    json.dump(params, open(marker, "w"))
    return paths


def main() -> None:
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "16"))
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    from engine.pipeline import extraction_plan

    files = build_fixture()
    total_rows = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    conc = max(2, num_cpus - 1 if num_cpus <= 16 else (3 * num_cpus) // 4)

    def run(out_dir: str, salt_block):
        walls = []
        for _ in range(2):
            shutil.rmtree(out_dir, ignore_errors=True)
            t0 = time.perf_counter()
            ds = extraction_plan(
                files, batch_size=1024, concurrency=conc,
                num_blocks=32, num_buckets=32, salt_block=salt_block,
            )
            ds.write_parquet(out_dir)
            walls.append(time.perf_counter() - t0)
        return min(walls)

    t_unsalted = run(OUT_A, None)
    t_salted = run(OUT_B, SALT_BLOCK)

    # semantics must be identical: salting is an execution strategy
    cols = ["conv_id", "turn_idx", "extracted_text", "conv_n_turns"]
    a = pq.read_table(OUT_A, columns=cols).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    b = pq.read_table(OUT_B, columns=cols).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    assert a.num_rows == b.num_rows == total_rows, (a.num_rows, b.num_rows)
    assert a.equals(b), "salted output differs from unsalted"

    hot_mb = GIANT_ROWS * 2.1 / 1024  # ~2KB text rows in one reducer
    print(json.dumps({
        "rows": total_rows,
        "giant_rows": GIANT_ROWS,
        "giant_fraction": round(GIANT_ROWS / total_rows, 3),
        "num_cpus": num_cpus,
        "salt_block": SALT_BLOCK,
        "unsalted_sec": round(t_unsalted, 3),
        "salted_sec": round(t_salted, 3),
        "speedup": round(t_unsalted / t_salted, 3),
        "hot_bucket_mb_unsalted": round(hot_mb, 1),
        "outputs_identical": True,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
