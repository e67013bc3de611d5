"""Per-partition checkpointed execution with lineage manifests.

The resumability surface required by the north rule, modeled on the
reference's finalize discipline (the DSQ writer streams blocks into a
temp layout and backpatches the header only on ``finalize()``, making
completion atomic-ish — /root/reference/crates/dsq-writer/src/lib.rs:410+):

- the input file list is split into P partitions (one output directory
  per input shard — a failed run skips finished partitions);
- each partition runs the streaming extraction plan end-to-end and
  writes to ``<out>/.tmp-part=<pid>``, atomically renamed to
  ``<out>/part=<pid>`` on success;
- a lineage manifest line (partition id, input fingerprint, rows in/out,
  extraction latency, status) is appended per completed partition
  (FIXTURES.md SS3);
- the input fingerprint covers file identity (path, size, mtime) AND the
  extractor-config hash, so a rule change can never silently mix old and
  new outputs (SURVEY SS7.6; the reference versions its fixture schema
  for the same reason, baselines/README.md:62-63).
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import shutil
import time
from typing import Dict, List, Optional, Sequence

import pyarrow.parquet as pq

from . import __version__ as ENGINE_VERSION
from .schema import SCHEMA_VERSION
from .pipeline import extraction_plan

MANIFEST_NAME = "_manifest.jsonl"
CONFIG_NAME = "_config.json"

# ---------------------------------------------------------------------------
# layered job configuration (defaults -> file -> CLI), the analog of the
# reference's AppConfig stack (defaults -> TOML -> flags -> overrides,
# /root/reference/crates/config/src/config.rs:17-173,213-232). The
# resolved values feed run_partitioned, and the ``extractor`` section is
# hashed into partition fingerprints via ``config_extra`` — templating
# many similar jobs from one file can never silently mix outputs
# produced under different extraction semantics.
# ---------------------------------------------------------------------------

JOB_DEFAULTS: Dict = {
    "input": None,
    "output": None,
    "num_partitions": 64,
    "salt_block": None,
    "batch_size": 2048,
    "concurrency": None,
    "keep_going": False,
    "max_partitions": None,
    "extractor": {},
}


def load_job_config(path: str) -> Dict:
    """Parse a JSON (.json) or TOML job-config file; unknown keys are an
    error (a typo'd knob must not silently fall back to a default)."""
    with open(path, "rb") as f:
        if path.endswith(".json"):
            cfg = json.load(f)
        else:
            import tomllib

            cfg = tomllib.load(f)
    unknown = sorted(set(cfg) - set(JOB_DEFAULTS))
    if unknown:
        raise ValueError(
            f"unknown job-config keys {unknown} in {path!r} "
            f"(known: {sorted(JOB_DEFAULTS)})"
        )
    return cfg


def parse_set_overrides(items) -> Dict:
    """Parse ``--set key=value`` items into an override dict — the
    reference's per-request override layer (its HTTP handlers merge
    request fields above the TOML/CLI config,
    /root/reference/crates/server/src/routes.rs:164-176) re-expressed
    for a batch engine as per-RUN overrides above the CLI. Values are
    JSON-parsed when possible (``--set num_partitions=128`` is an int,
    ``--set keep_going=true`` a bool) and fall back to strings; dotted
    keys address the nested extractor section
    (``--set extractor.ruleset=v3``)."""
    out: Dict = {}
    for item in items or ():
        key, sep, raw = item.partition("=")
        if not sep or not key:
            raise ValueError(f"--set expects key=value, got {item!r}")
        try:
            val = json.loads(raw)
        except ValueError:
            val = raw
        if "." in key:
            head, _, rest = key.partition(".")
            if head != "extractor" or not rest or "." in rest:
                raise ValueError(
                    f"only extractor.<key> dotted overrides are supported, "
                    f"got {key!r}"
                )
            out.setdefault("extractor", {})[rest] = val
        else:
            out[key] = val
    return out


def resolve_job_config(
    file_cfg: Optional[Dict] = None,
    cli: Optional[Dict] = None,
    overrides: Optional[Dict] = None,
) -> Dict:
    """defaults <- file <- CLI <- per-run overrides (``--set k=v``).
    Only entries explicitly set (value is not None) override; keys in
    every layer must be known. The extractor section DICT-MERGES across
    layers (an override of one extractor key keeps the file's others),
    and — like any extractor change — flows into partition fingerprints
    via ``config_extra``, so an overridden run can never silently mix
    with outputs produced under different extraction semantics."""
    resolved = dict(JOB_DEFAULTS)
    # copy the nested dict so callers mutating the resolved config can
    # never corrupt JOB_DEFAULTS process-wide (ADVICE r4)
    resolved["extractor"] = dict(JOB_DEFAULTS["extractor"])
    for layer in (file_cfg or {}), (cli or {}), (overrides or {}):
        for k, v in layer.items():
            if k not in JOB_DEFAULTS:
                raise ValueError(f"unknown job-config key {k!r}")
            if v is None:
                continue
            if k == "extractor":
                if not isinstance(v, dict):
                    raise ValueError(
                        f"extractor must be a mapping of extractor keys, "
                        f"got {type(v).__name__}: {v!r}"
                    )
                merged = dict(resolved["extractor"])
                merged.update(v)
                resolved[k] = merged
            else:
                resolved[k] = v
    return resolved


def write_resolved_config(out_dir: str, resolved: Dict) -> None:
    """Write the resolved run configuration next to the outputs (K6
    analog: the reference round-trips its layered config to disk,
    /root/reference/crates/config/src/config.rs:523-534) so a resumed or
    audited run can see exactly WHAT configuration produced part=N.
    Temp-write + atomic rename, like every other finalize here."""
    tmp = os.path.join(out_dir, f".{CONFIG_NAME}.tmp")
    with open(tmp, "w") as f:
        json.dump(resolved, f, indent=2, sort_keys=True)
    os.replace(tmp, os.path.join(out_dir, CONFIG_NAME))


def _partition_dir_ids(out_dir: str):
    """(pid, dirname) for every part=N / .tmp-part=N directory present."""
    for name in os.listdir(out_dir):
        for prefix in ("part=", ".tmp-part="):
            if name.startswith(prefix):
                try:
                    yield int(name[len(prefix):]), name
                except ValueError:
                    pass
                break


def clean_stale_partitions(out_dir: str, current_pids) -> List[str]:
    """Remove part dirs (and their manifest entries) whose pid is not in
    the current partition set. Without this, shrinking num_partitions or
    the input file list between runs leaves orphaned part=N dirs that
    downstream readers of out_dir/** silently mix with fresh output —
    defeating the config-hash no-mixing guarantee."""
    current = set(current_pids)
    removed: List[str] = []
    for pid, name in list(_partition_dir_ids(out_dir)):
        if pid not in current:
            shutil.rmtree(os.path.join(out_dir, name))
            removed.append(name)
    if removed:
        kept = {
            pid: rec for pid, rec in read_manifest(out_dir).items()
            if pid in current
        }
        tmp = os.path.join(out_dir, f".{MANIFEST_NAME}.tmp")
        with open(tmp, "w") as f:
            for pid in sorted(kept):
                f.write(json.dumps(kept[pid]) + "\n")
        os.replace(tmp, os.path.join(out_dir, MANIFEST_NAME))
    return removed


def config_hash(extra: Optional[Dict] = None) -> str:
    """Hash of everything that affects extraction semantics."""
    payload = {
        "engine_version": ENGINE_VERSION,
        "schema_version": SCHEMA_VERSION,
        **(extra or {}),
    }
    return hashlib.sha256(
        json.dumps(payload, sort_keys=True).encode()
    ).hexdigest()[:16]


def input_fingerprint(files: Sequence[str], cfg_hash: str) -> str:
    h = hashlib.sha256()
    for path in sorted(files):
        st = os.stat(path)
        h.update(f"{path}|{st.st_size}|{int(st.st_mtime)}\n".encode())
    h.update(cfg_hash.encode())
    return h.hexdigest()[:16]


def partition_files(files: Sequence[str], num_partitions: int) -> List[List[str]]:
    files = sorted(files)
    num_partitions = min(num_partitions, len(files))
    out: List[List[str]] = [[] for _ in range(num_partitions)]
    for i, f in enumerate(files):
        out[i % num_partitions].append(f)
    return out


def read_manifest(out_dir: str) -> Dict[int, Dict]:
    path = os.path.join(out_dir, MANIFEST_NAME)
    done: Dict[int, Dict] = {}
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    rec = json.loads(line)
                    done[rec["partition_id"]] = rec
    return done


def _append_manifest(out_dir: str, rec: Dict) -> None:
    with open(os.path.join(out_dir, MANIFEST_NAME), "a") as f:
        f.write(json.dumps(rec) + "\n")


_STAGE_KEYS = (
    ("ReadParquet", "read_s"),
    ("ExtractTurns", "extract_s"),
    ("Sort", "order_s"),
    ("Write", "write_s"),
)


def _stage_seconds(stats_text: str) -> Dict[str, float]:
    """Per-operator wall seconds from ``Dataset.stats()`` — the SURVEY SS6
    per-stage timing columns, so a scaling-efficiency regression is
    attributable to read / extract / order / write rather than a single
    opaque total. Operator wall spans overlap under streaming execution;
    they locate the bottleneck, they do not sum to the job wall."""
    out: Dict[str, float] = {}
    for m in re.finditer(
        r"Operator \d+ (.+?): (?:.*?in|executed in) ([0-9.]+)s", stats_text
    ):
        label, secs = m.group(1), float(m.group(2))
        for needle, key in _STAGE_KEYS:
            if needle in label:
                out[key] = out.get(key, 0.0) + secs
    return out


def _count_parquet_rows(directory: str) -> int:
    total = 0
    for root, _dirs, names in os.walk(directory):
        for name in names:
            if name.endswith(".parquet"):
                total += pq.ParquetFile(os.path.join(root, name)).metadata.num_rows
    return total


def finalize_partitioned(
    out_dir: str,
    final_dir: str,
    *,
    salt_block: Optional[int] = None,
    num_buckets: Optional[int] = None,
):
    """Global ordering fixup over a partitioned run's output.

    ``run_partitioned`` computes ``conv_n_turns`` shard-locally (a
    partition holds an input shard, not whole conversations), so its
    output differs from the single-plan flagship for conversations that
    span partitions. This pass streams the completed ``part=N`` dirs
    back through the ordering exchange (the one shuffle, int-keyed as
    ever) with globally-dense sizes — the result is bit-equal to running
    ``extraction_plan`` over the whole input at once, at the cost of one
    extra shuffle over the EXTRACTED rows (no re-extraction). Returns
    the written Dataset.
    """
    import glob as _glob

    import ray.data

    from .pipeline import order_stage

    # Refuse a partial run: finalizing while partitions are failed or
    # missing would silently emit an incomplete corpus (and compute wrong
    # global sizes for the conversations the missing shards held).
    cfg_path = os.path.join(out_dir, CONFIG_NAME)
    if not os.path.exists(cfg_path):
        raise ValueError(
            f"cannot finalize {out_dir!r}: {CONFIG_NAME} is missing — "
            f"not a run_partitioned output dir (or a pre-config legacy "
            f"run); completeness cannot be verified, refusing to emit a "
            f"possibly-partial final corpus"
        )
    with open(cfg_path) as f:
        cfg_doc = json.load(f)
    if "num_partitions" not in cfg_doc:
        raise ValueError(
            f"cannot finalize {out_dir!r}: {CONFIG_NAME} lacks "
            f"'num_partitions' — refusing to guess the expected "
            f"partition set"
        )
    expected = set(range(cfg_doc["num_partitions"]))
    manifest = read_manifest(out_dir)
    bad = sorted(
        pid for pid in expected
        if manifest.get(pid, {}).get("status") != "complete"
        or not os.path.isdir(os.path.join(out_dir, f"part={pid}"))
    )
    if bad:
        raise ValueError(
            f"cannot finalize {out_dir!r}: partitions {bad} are not "
            f"complete — rerun run_partitioned first"
        )

    files = sorted(_glob.glob(os.path.join(out_dir, "part=*", "*.parquet")))
    if not files:
        raise ValueError(f"no part=N parquet outputs under {out_dir!r}")
    # Read block count pinned to the ordering bucket count — the same
    # sort-range/key-cardinality matching as extraction_plan (see its
    # docstring): ranges ≫ distinct buckets degenerate the exchange into
    # empty + merged-bucket straggler blocks.
    from .pipeline import default_num_buckets

    eff_buckets = num_buckets if num_buckets else default_num_buckets(files)
    ds = ray.data.read_parquet(files, override_num_blocks=eff_buckets)
    drop = [c for c in ("conv_n_turns", "part") if c in ds.schema().names]
    if drop:
        ds = ds.drop_columns(drop)
    ordered = order_stage(
        ds, salt_block=salt_block, num_buckets=num_buckets, sizes_mode="dense"
    )
    # Temp-write + atomic rename, matching the part=N finalize discipline:
    # a crash mid-write must not leave a final_dir that readers cannot
    # distinguish from a complete corpus.
    parent = os.path.dirname(os.path.abspath(final_dir)) or "."
    tmp_final = os.path.join(
        parent, f".tmp-final-{os.path.basename(os.path.abspath(final_dir))}"
    )
    if os.path.isdir(tmp_final):
        shutil.rmtree(tmp_final)
    if os.path.isdir(final_dir):
        shutil.rmtree(final_dir)
    ordered.write_parquet(tmp_final)
    os.rename(tmp_final, final_dir)
    return ordered


def run_partitioned(
    in_files: Sequence[str],
    out_dir: str,
    *,
    num_partitions: int = 8,
    config_extra: Optional[Dict] = None,
    salt_block: Optional[int] = None,
    batch_size: int = 2048,
    concurrency=None,
    keep_going: bool = False,
    max_partitions: Optional[int] = None,
) -> List[Dict]:
    """Run extraction per input partition with resume-on-restart.

    Returns the list of lineage records (completed prior + this run).
    Partitions whose manifest entry matches (id, fingerprint, complete)
    are skipped at plan time; a fingerprint mismatch (input or extractor
    config changed) forces reprocessing of that partition only.

    ``max_partitions=N`` caps the number of partitions PROCESSED (not
    skipped) this invocation, then returns — the budgeted-window
    posture for 100 TB runs (process what fits the maintenance window,
    resume tomorrow), and the deterministic stand-in for a mid-run kill
    in tests: a capped run's manifest is byte-for-byte what a job killed
    after N partitions leaves behind (partitions past the cap have no
    record and no part dir; the next run resumes exactly there).

    ``keep_going=True`` is the 100 TB operational posture: a partition
    that raises (corrupt shard, invariant abort) gets a
    ``status="failed"`` lineage record with the error string and the
    run continues — one bad shard out of thousands must not kill an
    hour-long job. Failed partitions leave no ``part=N`` dir (the temp
    dir is removed), so a plain rerun retries exactly the failed set.
    With ``keep_going=False`` (default) the first failure propagates
    after its failure record is appended.
    """
    os.makedirs(out_dir, exist_ok=True)
    cfg = config_hash(config_extra)
    parts = partition_files(in_files, num_partitions)
    # Drop orphans from a prior run with a different partition count BEFORE
    # reading the manifest — stale part dirs must never reach readers.
    clean_stale_partitions(out_dir, range(len(parts)))
    write_resolved_config(
        out_dir,
        {
            "engine_version": ENGINE_VERSION,
            "schema_version": SCHEMA_VERSION,
            "config_extra": config_extra or {},
            "config_hash": cfg,
            "num_partitions": len(parts),
            "salt_block": salt_block,
            "batch_size": batch_size,
            "input_files": sorted(in_files),
        },
    )
    done = read_manifest(out_dir)
    records: List[Dict] = []
    processed = 0

    for pid, files in enumerate(parts):
        fp = input_fingerprint(files, cfg)
        final = os.path.join(out_dir, f"part={pid}")
        prior = done.get(pid)
        if (
            prior
            and prior.get("input_fingerprint") == fp
            and prior.get("status") == "complete"
            and os.path.isdir(final)
        ):
            records.append(prior)
            continue
        if max_partitions is not None and processed >= max_partitions:
            break  # budget exhausted; next invocation resumes here
        processed += 1

        tmp = os.path.join(out_dir, f".tmp-part={pid}")
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
        if os.path.isdir(final):
            shutil.rmtree(final)

        start = time.perf_counter()
        rows_in = -1  # -1 = failed before the input count; a later failure
        # (extraction/write) keeps the computed count for triage
        try:
            rows_in = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
            # local_count: a partition holds an input shard, not whole
            # conversations (rows are shard-distributed), so conv_n_turns is
            # the locally-present row count and the dense-turn_idx contract is
            # not enforced shard-locally (duplicates still abort); a consumer
            # merging partitions recomputes global sizes.
            ds = extraction_plan(
                files,
                batch_size=batch_size,
                concurrency=concurrency,
                salt_block=salt_block,
                sizes_mode="local_count",
            )
            ds.write_parquet(tmp)
        except Exception as exc:  # noqa: BLE001 — recorded, then re-raised
            # unless keep_going
            shutil.rmtree(tmp, ignore_errors=True)  # rerun retries this pid
            rec = {
                "partition_id": pid,
                "input_fingerprint": fp,
                "rows_in": rows_in,
                "rows_out": 0,
                "extraction_ms": round(
                    (time.perf_counter() - start) * 1000.0, 3
                ),
                "status": "failed",
                "error": f"{type(exc).__name__}: {exc}"[:500],
            }
            _append_manifest(out_dir, rec)
            records.append(rec)
            if not keep_going:
                raise
            continue
        elapsed_ms = (time.perf_counter() - start) * 1000.0
        rows_out = _count_parquet_rows(tmp)
        os.rename(tmp, final)  # atomic finalize

        rec = {
            "partition_id": pid,
            "input_fingerprint": fp,
            "rows_in": rows_in,
            "rows_out": rows_out,
            "extraction_ms": round(elapsed_ms, 3),
            "stages": {
                k: round(v, 3) for k, v in _stage_seconds(ds.stats()).items()
            },
            "status": "complete",
        }
        _append_manifest(out_dir, rec)
        records.append(rec)
    return records
