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
