"""Ray Data plan assembly for the transcript extraction engine.

Pipeline shape (SURVEY.md SS3.1 "Ray shape"):

    read_parquet (column-pruned)
      -> map_batches(ExtractTurns actor pool, zero-copy Arrow)   # per-turn extraction
      -> groupby(conv_id).map_groups(order restore)              # the ONLY shuffle
      -> write_parquet / iter_batches

Scale notes:

- Extraction runs BEFORE the shuffle so the exchange moves small
  extracted rows, not raw payloads (SURVEY SS7.5).
- The per-batch body is vectorized for the common case: rows with no
  payload markers take a pure-pyarrow normalize path
  (``pc.replace_substring`` + ``utf8_trim_whitespace``); the Python
  parser runs only on rows that sniff positive. Parity between the two
  paths is unit-tested (tests/test_normalize.py).
- Skewed long conversations are handled by SALTING the group key on
  ``turn_idx // salt_block`` (SURVEY SS7.6): per-turn extraction is group
  independent, so a giant conversation's blocks order independently and
  only conversation-level fields need the (tiny) skew-tail count
  aggregate, which touches ONLY rows of oversized conversations.
"""

from __future__ import annotations

from typing import Iterable, Optional, Sequence, Union

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .extract import extract_turn
from .normalize import SENTINEL
from .schema import SCHEMA_VERSION, SPAN_TYPE
from .sniff import HTML_MARKER, PDF_MARKER

READ_COLUMNS = ["conv_id", "turn_idx", "role", "text"]  # prune tool/ts at the read
DEFAULT_BATCH_SIZE = 2048


def normalize_arrow(text: pa.ChunkedArray) -> pa.ChunkedArray:
    """Vectorized normalize_text (fast path; parity-tested vs normalize.py)."""
    out = pc.replace_substring(text, pattern="\r\n", replacement="\n")
    out = pc.replace_substring(out, pattern="\r", replacement="\n")
    out = pc.replace_substring(out, pattern=SENTINEL, replacement="")
    return pc.utf8_trim_whitespace(out)


class ExtractTurns:
    """Actor-pool per-batch extractor (SURVEY T1 analog).

    Stateful setup (compiled regex/selector tables — held at module level
    in the extractor modules) is touched once per actor in ``__init__``;
    ``__call__`` handles one zero-copy Arrow batch.
    """

    def __init__(self) -> None:
        # Bind the per-turn extractor once per actor. The compiled state
        # (regex/selector tables in the extractor modules) travels with the
        # function via by-value serialization (_rayutil.ensure_serializable)
        # and is built during actor construction, once per worker — the
        # model-load-once analog
        # (/root/reference/crates/infer-deepseek/src/model/mod.rs:857-860).
        self._extract_turn = extract_turn
        # Warm the dispatch path so first-batch latency excludes setup.
        self._extract_turn("warmup", "user")

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        text = batch.column("text")
        role = batch.column("role")

        # Vectorized payload sniff (mirrors sniff.has_payload).
        needs = pc.or_(
            pc.or_(
                pc.match_substring(text, HTML_MARKER),
                pc.match_substring(text, PDF_MARKER),
            ),
            pc.equal(role, "tool"),
        )
        needs_np = needs.combine_chunks().to_numpy(zero_copy_only=False)
        payload_idx = np.flatnonzero(needs_np)

        # Fast path: vectorized normalize for every row; payload rows are
        # overwritten below via if_else.
        norm = normalize_arrow(text)

        spans_py: list = [[]] * n
        n_blocks = np.zeros(n, dtype=np.int32)
        if len(payload_idx):
            texts = text.combine_chunks()
            roles = role.combine_chunks()
            spans_py = [[] for _ in range(n)]
            py_text: list = [None] * n
            fn = self._extract_turn
            for i in payload_idx:
                i = int(i)
                extracted, spans, nb = fn(texts[i].as_py(), roles[i].as_py())
                py_text[i] = extracted
                spans_py[i] = [{"start": s, "end": e} for s, e in spans]
                n_blocks[i] = nb
            extracted_text = pc.if_else(needs, pa.array(py_text, pa.string()), norm)
        else:
            extracted_text = norm

        return pa.table(
            {
                "conv_id": batch.column("conv_id"),
                "turn_idx": batch.column("turn_idx"),
                "role": role,
                "extracted_text": extracted_text,
                "spans": pa.array(spans_py, SPAN_TYPE),
                "n_blocks": pa.array(n_blocks),
                "schema_version": pa.array(
                    np.full(n, SCHEMA_VERSION, dtype=np.int32)
                ),
            }
        )


def _order_group(group: pa.Table) -> pa.Table:
    """Sort one conversation's turns; enforce the ordering invariant loudly."""
    group = group.sort_by([("turn_idx", "ascending")])
    idx = group.column("turn_idx").to_numpy(zero_copy_only=False)
    if len(idx) > 1 and not (np.diff(idx) > 0).all():
        conv = group.column("conv_id")[0].as_py()
        raise ValueError(f"duplicate turn_idx within conversation {conv!r}")
    n_turns = np.full(len(idx), int(idx[-1]) + 1 if len(idx) else 0, dtype=np.int32)
    return group.append_column("conv_n_turns", pa.array(n_turns))


def _make_salted_order_group(salt_block: int, conv_sizes_ref):
    """Group fn for salted mode: group key is (conv_id, salt); conversation
    size comes from the broadcast skew-tail aggregate for salted convs."""

    def order_group(group: pa.Table) -> pa.Table:
        group = group.sort_by([("turn_idx", "ascending")])
        idx = group.column("turn_idx").to_numpy(zero_copy_only=False)
        if len(idx) > 1 and not (np.diff(idx) > 0).all():
            conv = group.column("conv_id")[0].as_py()
            raise ValueError(f"duplicate turn_idx within conversation {conv!r}")
        conv = group.column("conv_id")[0].as_py() if len(idx) else ""
        sizes = ray.get(conv_sizes_ref)
        n = sizes.get(conv, int(idx[-1]) + 1 if len(idx) else 0)
        out = group.append_column(
            "conv_n_turns", pa.array(np.full(len(idx), n, dtype=np.int32))
        )
        return out.drop_columns(["salt"])

    return order_group


def order_stage(
    ds: ray.data.Dataset, salt_block: Optional[int] = None
) -> ray.data.Dataset:
    """Restore stable per-conversation turn order (the only shuffle).

    Unsalted (default): ``groupby(conv_id)`` — one group per conversation.

    Salted (``salt_block=S``): group key is ``(conv_id, turn_idx // S)`` so
    a skewed 10^6-turn conversation spreads over many reducers; ordering
    composes because salt blocks are contiguous turn ranges. Conversation
    sizes for salted convs come from a pre-aggregated count over ONLY the
    skew tail (rows with ``turn_idx >= S``), broadcast via ``ray.put``.
    """
    if salt_block is None:
        return ds.groupby("conv_id").map_groups(
            _order_group, batch_format="pyarrow"
        )

    s = int(salt_block)

    # Skew-tail size aggregate: tiny by construction (only oversized convs).
    tail_max = (
        ds.filter(expr=f"turn_idx >= {s}")
        .groupby("conv_id")
        .max("turn_idx")
        .to_pandas()
    )
    conv_sizes = {
        row["conv_id"]: int(row["max(turn_idx)"]) + 1
        for _, row in tail_max.iterrows()
    }
    conv_sizes_ref = ray.put(conv_sizes)

    def add_salt(batch: pa.Table) -> pa.Table:
        salt = pc.divide(batch.column("turn_idx"), s)
        return batch.append_column("salt", pc.cast(salt, pa.int32()))

    salted = ds.map_batches(add_salt, batch_format="pyarrow", zero_copy_batch=True)
    return salted.groupby(["conv_id", "salt"]).map_groups(
        _make_salted_order_group(s, conv_sizes_ref), batch_format="pyarrow"
    )


def extraction_plan(
    paths: Union[str, Sequence[str]],
    *,
    batch_size: int = DEFAULT_BATCH_SIZE,
    concurrency=None,
    salt_block: Optional[int] = None,
    ordered: bool = True,
) -> ray.data.Dataset:
    """Build the full lazy extraction plan over transcript Parquet paths."""
    from ._rayutil import ensure_serializable

    ensure_serializable()
    ds = ray.data.read_parquet(paths, columns=READ_COLUMNS)
    ds = ds.map_batches(
        ExtractTurns,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency if concurrency is not None else (1, 8),
        num_cpus=1,
    )
    if ordered:
        ds = order_stage(ds, salt_block=salt_block)
    return ds
