"""Single-process oracle extractor — the engine's "Python original".

Plays the role of the reference's stage-by-stage Python capture
(/root/reference/scripts/capture_baseline.py + tests/baseline.rs:481):
a row-at-a-time run of the SAME pure functions the Ray pipeline uses,
producing the golden expected table pytest compares against per
(conv_id, turn_idx). It deliberately contains zero Ray / batching /
ordering machinery — any pipeline divergence (row loss, duplication,
mis-ordering, batch-boundary bugs) shows up as an equality failure.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from .extract import extract_turn_full
from .schema import EXTRACTED, SCHEMA_VERSION


def oracle_extract_table(transcripts: pa.Table) -> pa.Table:
    """Extract every turn row-at-a-time; output sorted by (conv_id, turn_idx)."""
    transcripts = transcripts.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    conv_ids = transcripts["conv_id"].to_pylist()
    turn_idxs = transcripts["turn_idx"].to_pylist()
    roles = transcripts["role"].to_pylist()
    texts = transcripts["text"].to_pylist()

    out_text, out_spans, out_blocks, out_nblocks = [], [], [], []
    for role, text in zip(roles, texts):
        extracted, spans, blocks = extract_turn_full(text or "", role or "")
        out_text.append(extracted)
        out_spans.append([{"start": s, "end": e} for s, e in spans])
        out_blocks.append(
            [{"kind": k, "page": p, "y": y, "x": x} for k, p, y, x in blocks]
        )
        out_nblocks.append(len(spans))

    n = len(conv_ids)
    return pa.Table.from_pydict(
        {
            "conv_id": pa.array(conv_ids, pa.string()),
            "turn_idx": pa.array(turn_idxs, pa.int32()),
            "role": pa.array(roles, pa.string()),
            "extracted_text": pa.array(out_text, pa.string()),
            "spans": pa.array(out_spans, EXTRACTED.field("spans").type),
            "blocks": pa.array(out_blocks, EXTRACTED.field("blocks").type),
            "n_blocks": pa.array(out_nblocks, pa.int32()),
            "schema_version": pa.array([SCHEMA_VERSION] * n, pa.int32()),
        },
        schema=EXTRACTED,
    )


def oracle_extract_dir(in_dir_or_files) -> pa.Table:
    if isinstance(in_dir_or_files, str):
        table = pq.read_table(in_dir_or_files)
    else:
        table = pa.concat_tables([pq.read_table(p) for p in in_dir_or_files])
    return oracle_extract_table(table)


# ---------------------------------------------------------------------------
# Golden expected-output parquet for the driver's DuckDB oracle replay
# ---------------------------------------------------------------------------
#
# The reference's own correctness posture: capture the Python original's
# output to disk once, then compare runs against the materialized fixture
# (/root/reference/baselines/README.md:15-168,
#  /root/reference/scripts/capture_baseline.py:677-845). Here the
# "capture" is this module's row-at-a-time oracle run over the synthetic
# transcript fixture, written to parquet so the flagship extraction
# queries get a real ``oracle_sql()`` replay (SELECT ... FROM the golden
# parquet) instead of a rows-only check.

# partition count used by the checkpointed_lineage driver query AND its
# golden replay — one constant so they can never drift
LINEAGE_NUM_PARTITIONS = 4


def _code_fingerprint() -> str:
    """Hash of every engine/*.py source that can affect oracle output —
    a stale golden cache after a code change would poison the compare,
    so the cache key covers the code itself."""
    import glob
    import hashlib
    import os

    here = os.path.dirname(os.path.abspath(__file__))
    h = hashlib.sha256()
    for path in sorted(glob.glob(os.path.join(here, "*.py"))):
        with open(path, "rb") as f:
            h.update(os.path.basename(path).encode())
            h.update(f.read())
    return h.hexdigest()[:16]


def oracle_expected_dir(tier: str) -> str:
    """Materialize (once, cached) the golden expected outputs for the
    flagship query family at a fixture tier; returns the directory.

    Files written:
    - ``extracted.parquet``    — per-turn golden extraction in the
      driver-visible projection (spans/blocks serialized to JSON text
      exactly like ``__ray_entry__._spans_to_json``) + ``conv_n_turns``;
    - ``global_views.parquet`` — M6 canonical view + md5 fingerprint;
    - ``lineage.parquet``      — deterministic lineage projection for a
      ``run_partitioned(num_partitions=LINEAGE_NUM_PARTITIONS)`` run:
      partition assignment, input fingerprints (same pure function the
      runner uses over the same on-disk files), per-partition row counts
      (rows_out = rows_in is the 1-row-in-1-row-out invariant), status.

    Pure single-process Python — zero Ray/batching machinery, so any
    pipeline divergence (row loss, mis-ordering, batch-boundary bugs)
    fails the driver's hash compare.
    """
    import glob
    import hashlib
    import json
    import os

    import numpy as np

    from . import synth
    from .checkpoint import config_hash, input_fingerprint, partition_files
    from .extract import build_global_view

    fixture = synth.fixture_dir(tier)
    files = sorted(glob.glob(os.path.join(fixture, "*.parquet")))
    cfg = config_hash(None)
    key = {
        "v": 1,
        "code": _code_fingerprint(),
        "input": input_fingerprint(files, cfg),
        "lineage_partitions": LINEAGE_NUM_PARTITIONS,
    }
    out = os.path.join(synth.CACHE_ROOT, f"{tier}_oracle")
    marker = os.path.join(out, "_COMPLETE")
    if os.path.exists(marker):
        with open(marker) as f:
            if json.load(f) == key:
                return out
    os.makedirs(out, exist_ok=True)

    table = oracle_extract_table(
        pa.concat_tables([pq.read_table(p) for p in files])
    )

    # conv_n_turns under the dense 0-based contract: last turn_idx + 1,
    # broadcast to every row of the conversation (table is sorted).
    conv = np.asarray(table["conv_id"].to_pylist(), dtype=object)
    turn = table["turn_idx"].to_numpy(zero_copy_only=False)
    n = len(conv)
    new_conv = np.empty(n, dtype=bool)
    new_conv[0] = True
    new_conv[1:] = conv[1:] != conv[:-1]
    starts = np.flatnonzero(new_conv)
    ends = np.append(starts[1:], n)
    sizes = turn[ends - 1].astype(np.int64) + 1
    conv_n = np.repeat(sizes, ends - starts).astype(np.int32)

    spans_json = pa.array(
        [json.dumps(s) for s in table["spans"].to_pylist()], pa.string()
    )
    blocks_json = pa.array(
        [json.dumps(b) for b in table["blocks"].to_pylist()], pa.string()
    )
    extracted = pa.table(
        {
            "conv_id": table["conv_id"],
            "turn_idx": table["turn_idx"],
            "role": table["role"],
            "extracted_text": table["extracted_text"],
            "spans_json": spans_json,
            "blocks_json": blocks_json,
            "n_blocks": table["n_blocks"],
            "schema_version": table["schema_version"],
            "conv_n_turns": pa.array(conv_n),
        }
    )
    pq.write_table(extracted, os.path.join(out, "extracted.parquet"))

    # M6 golden: whole-payload canonical view + md5, same row loop.
    roles = table["role"].to_pylist()
    raw = pa.concat_tables([pq.read_table(p) for p in files]).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    texts = raw["text"].to_pylist()
    views = [
        build_global_view(t or "", r or "") for t, r in zip(texts, roles)
    ]
    fps = [hashlib.md5(v.encode()).hexdigest() for v in views]
    pq.write_table(
        pa.table(
            {
                "conv_id": table["conv_id"],
                "turn_idx": table["turn_idx"],
                "global_view": pa.array(views, pa.string()),
                "global_fp": pa.array(fps, pa.string()),
            }
        ),
        os.path.join(out, "global_views.parquet"),
    )

    # Lineage golden: replicate the runner's deterministic surface with
    # the same pure helpers over the same on-disk inputs.
    parts = partition_files(files, LINEAGE_NUM_PARTITIONS)
    pids, fprints, rows_in = [], [], []
    for pid, part in enumerate(parts):
        pids.append(pid)
        fprints.append(input_fingerprint(part, cfg))
        rows_in.append(
            sum(pq.ParquetFile(f).metadata.num_rows for f in part)
        )
    pq.write_table(
        pa.table(
            {
                "partition_id": pa.array(pids, pa.int64()),
                "input_fingerprint": pa.array(fprints, pa.string()),
                "rows_in": pa.array(rows_in, pa.int64()),
                "rows_out": pa.array(rows_in, pa.int64()),
                "status": pa.array(["complete"] * len(pids), pa.string()),
            }
        ),
        os.path.join(out, "lineage.parquet"),
    )

    tmp = marker + ".tmp"
    with open(tmp, "w") as f:
        json.dump(key, f)
    os.replace(tmp, marker)
    return out
