"""Arrow schemas for the engine's tables (FIXTURES.md SS1-3).

Input shape per BASELINE.json ``input_hint``; output shape mirrors the
reference's DecodeOutcome (normalized text + counters,
/root/reference/crates/core/src/inference.rs:74-80) plus the span list
(image_token_ranges analog, /root/reference/baselines/README.md:71-73).
"""

from __future__ import annotations

import pyarrow as pa

# v2: + blocks column (per-block kind and layout coordinates)
# v3: extracted_text string -> large_string (64-bit offsets; on-disk Arrow
#     schema metadata changes, so old part=N dirs must not mix with new)
SCHEMA_VERSION = 3

TRANSCRIPTS = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

SPAN_TYPE = pa.list_(pa.struct([("start", pa.int64()), ("end", pa.int64())]))

# blocks[i] describes the block at spans[i]: payload kind + layout
# coordinates ((page, y, x) for PDF-lite blocks, (-1, -1, -1) for
# position-free HTML/tool blocks) — the per-region structure of the
# reference's output (tile grid order, baselines/README.md:71-73).
BLOCK_TYPE = pa.list_(
    pa.struct(
        [
            ("kind", pa.string()),
            ("page", pa.int32()),
            ("y", pa.int32()),
            ("x", pa.int32()),
        ]
    )
)

EXTRACTED = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        # large_string (64-bit offsets): an ordering bucket holding a
        # 10^6-turn conversation's extracted text exceeds the 2 GB int32
        # offset limit, and the sort exchange's reduce step concatenates
        # a bucket into one block — 32-bit offsets overflow there
        # (ArrowInvalid) before any user code runs. +4 B/row buys
        # arbitrarily large per-bucket text. Parquet round-trips it as
        # ordinary string.
        ("extracted_text", pa.large_string()),
        ("spans", SPAN_TYPE),
        ("blocks", BLOCK_TYPE),
        ("n_blocks", pa.int32()),
        ("schema_version", pa.int32()),
    ]
)

# Ordered output adds per-conversation fields computed in the grouped stage.
EXTRACTED_ORDERED = pa.schema(
    list(EXTRACTED) + [("conv_n_turns", pa.int32())]
)

LINEAGE = pa.schema(
    [
        ("partition_id", pa.int32()),
        ("input_fingerprint", pa.string()),
        ("rows_in", pa.int64()),
        ("rows_out", pa.int64()),
        ("extraction_ms", pa.float64()),
        ("status", pa.string()),
    ]
)
