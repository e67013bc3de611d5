"""JSONL source/sink for the transcript schema — the engine's second
ingestion format.

The reference accepts the same payloads over two encodings (parquet-like
batch files for offline runs and JSON request bodies on the server path,
/root/reference/crates/server/src/generation.rs:248-290); this module is
the batch-engine analog: newline-delimited JSON shards that normalize
into the exact arrow schema the parquet fixtures carry, so EVERY
downstream operator (extraction, conv_stats, templates, validation) runs
unchanged on either source.

Timestamps ride as int64 epoch microseconds (``ts_us``) in the JSON —
ISO-string round-trips differ across strftime/strptime implementations
(fractional-second support varies), while epoch micros are exact and
sortable in any engine. The reader also accepts an ISO-8601 ``ts``
string column (Arrow's string→timestamp cast) for hand-authored files.

Scale shape: ``ray.data.read_json`` streams shards exactly like
``read_parquet`` (per-file read tasks, no driver materialization); the
normalize step is a stateless Arrow-kernel ``map_batches``.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ._rayutil import ensure_serializable

TRANSCRIPT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)


def _normalize(batch: pa.Table) -> pa.Table:
    if "ts_us" in batch.column_names:
        ts = pc.cast(pc.cast(batch["ts_us"], pa.int64()), pa.timestamp("us"))
    else:
        ts = pc.cast(batch["ts"], pa.timestamp("us"))  # ISO-8601 string
    return pa.table(
        {
            "conv_id": pc.cast(batch["conv_id"], pa.string()),
            "turn_idx": pc.cast(batch["turn_idx"], pa.int32()),
            "role": pc.fill_null(pc.cast(batch["role"], pa.string()), ""),
            "text": pc.fill_null(pc.cast(batch["text"], pa.string()), ""),
            "tool": pc.fill_null(pc.cast(batch["tool"], pa.string()), ""),
            "ts": ts,
        }
    )


def read_transcripts_jsonl(paths) -> ray.data.Dataset:
    """JSONL shard(s) -> Dataset with the canonical transcript schema.

    Accepts anything ``ray.data.read_json`` accepts (file, list, dir)."""
    ensure_serializable()
    return ray.data.read_json(paths).map_batches(
        _normalize, batch_format="pyarrow", zero_copy_batch=True
    )


def write_transcripts_jsonl(ds: ray.data.Dataset, out_dir: str) -> None:
    """Dataset with the transcript schema -> JSONL shards under
    ``out_dir`` (one file per block, resumable like the parquet sink)."""

    def encode(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "conv_id": batch["conv_id"],
                "turn_idx": batch["turn_idx"],
                "role": batch["role"],
                "text": batch["text"],
                "tool": batch["tool"],
                "ts_us": pc.cast(batch["ts"], pa.int64()),
            }
        )

    ds.map_batches(encode, batch_format="pyarrow", zero_copy_batch=True).write_json(
        out_dir
    )


def read_transcripts_csv(paths) -> ray.data.Dataset:
    """CSV shard(s) -> Dataset with the canonical transcript schema —
    the engine's THIRD ingestion format. ``newlines_in_values`` is on:
    turn text embeds newlines (payloads!), which the Arrow CSV writer
    quotes and the reader must be told to expect; without it a quoted
    multi-line turn shears into garbage rows."""
    import pyarrow.csv as pacsv

    ensure_serializable()
    # Pin string column types: CSV inference would silently coerce
    # numeric-looking text/tool values ('007' -> 7, '1.50' -> 1.5) and
    # break the bit-equal source-parity contract. Types apply only to
    # columns present in the file, so ts-vs-ts_us variants both work.
    convert = pacsv.ConvertOptions(
        column_types={
            "conv_id": pa.string(),
            "role": pa.string(),
            "text": pa.string(),
            "tool": pa.string(),
            "turn_idx": pa.int32(),
            "ts_us": pa.int64(),
        }
    )
    return ray.data.read_csv(
        paths,
        parse_options=pacsv.ParseOptions(newlines_in_values=True),
        convert_options=convert,
    ).map_batches(_normalize, batch_format="pyarrow", zero_copy_batch=True)


def write_transcripts_csv(ds: ray.data.Dataset, out_dir: str) -> None:
    """Dataset with the transcript schema -> CSV shards under
    ``out_dir`` (ts as int64 epoch micros, same rationale as JSONL)."""

    def encode(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "conv_id": batch["conv_id"],
                "turn_idx": batch["turn_idx"],
                "role": batch["role"],
                "text": batch["text"],
                "tool": batch["tool"],
                "ts_us": pc.cast(batch["ts"], pa.int64()),
            }
        )

    ds.map_batches(encode, batch_format="pyarrow", zero_copy_batch=True).write_csv(
        out_dir
    )


def partitioned_sink(sf_dir: str) -> "ray.data.Dataset":
    """Hive-partitioned parquet sink + partition-discovering read-back:
    ``write_parquet(out, partition_cols=["source"])`` lays documents out
    as ``out/source=<v>/*.parquet`` (the resumable/prunable layout the
    output contract requires — a reader filtering one source opens ONE
    directory and a failed run re-writes only its partition), then the
    roll-up re-reads the hive tree, letting Ray reconstruct the
    partition column from directory names. Returns per-source
    (n_docs, sum_chars) computed FROM THE READ-BACK, so the oracle
    equality proves the sink/source round-trip, not just the groupby.

    Scale: the write is one streaming pass (each task splits its blocks
    by partition value); no shuffle is needed for the layout. The
    read-back prunes columns to the two the roll-up needs."""
    import os
    import shutil

    import ray
    from ray.data.aggregate import Count, Sum

    ensure_serializable()
    out = f"/tmp/ray_part_sink/{os.path.basename(os.path.normpath(sf_dir))}"
    shutil.rmtree(out, ignore_errors=True)
    ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "source", "n_chars"],
    ).write_parquet(out, partition_cols=["source"])
    back = ray.data.read_parquet(out, columns=["source", "n_chars"])
    return back.groupby("source").aggregate(
        Count(alias_name="n_docs"), Sum("n_chars", alias_name="sum_chars")
    )


def write_transcripts_jsonl_gz(ds: ray.data.Dataset, out_dir: str) -> None:
    """Dataset with the transcript schema -> GZIP-compressed JSONL
    shards (``*.jsonl.gz``) — the compressed variant of
    ``write_transcripts_jsonl`` for the crawl-dump interchange format
    (WET/CC dumps ship as .gz lines). ``read_transcripts_jsonl`` reads
    them back unchanged: Arrow infers gzip from the extension, so ONE
    reader serves both encodings.

    Scale shape: identical streaming write (one shard per block);
    compression happens inside each write task's output stream — no
    extra pass, no driver involvement."""
    from ray.data.datasource import FilenameProvider

    ensure_serializable()

    class _Names(FilenameProvider):
        # .jsonl.gz extension so every reader infers the codec
        def get_filename_for_block(
            self, block, write_uuid, task_index, block_index
        ):
            return (
                f"part-{write_uuid}-{task_index:05d}-{block_index:05d}.jsonl.gz"
            )

    def encode(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "conv_id": batch["conv_id"],
                "turn_idx": batch["turn_idx"],
                "role": batch["role"],
                "text": batch["text"],
                "tool": batch["tool"],
                "ts_us": pc.cast(batch["ts"], pa.int64()),
            }
        )

    ds.map_batches(encode, batch_format="pyarrow", zero_copy_batch=True).write_json(
        out_dir,
        arrow_open_stream_args={"compression": "gzip"},
        filename_provider=_Names(),
    )
