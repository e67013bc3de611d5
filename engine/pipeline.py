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

import re
from typing import Iterable, Optional, Sequence, Union

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .extract import build_global_view, extract_turn_full
from .normalize import SENTINEL
from .schema import SCHEMA_VERSION, SPAN_TYPE
from .sniff import DATA_HTML_MARKER, DATA_PDF_MARKER, HTML_MARKER, PDF_MARKER

READ_COLUMNS = ["conv_id", "turn_idx", "role", "text"]  # prune tool/ts at the read
DEFAULT_BATCH_SIZE = 2048

# ONE RE2 alternation scan instead of four match_substring passes over
# the text column (markers are literals, so the compiled automaton walks
# each string once — measured ~3x cheaper than sequential scans).
_ANY_MARKER_RE = "|".join(
    re.escape(m)
    for m in (HTML_MARKER, PDF_MARKER, DATA_HTML_MARKER, DATA_PDF_MARKER)
)


def _sniff_payload(text, role):
    """Vectorized mirror of sniff.has_payload."""
    return pc.or_(
        pc.match_substring_regex(text, _ANY_MARKER_RE),
        pc.equal(role, "tool"),
    )


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

    def __init__(self, num_buckets: Optional[int] = None,
                 salt_block: Optional[int] = None) -> None:
        # Bind the per-turn extractor once per actor. The compiled state
        # (regex/selector tables in the extractor modules) travels with the
        # function via by-value serialization (_rayutil.ensure_serializable)
        # and is built during actor construction, once per worker — the
        # model-load-once analog
        # (/root/reference/crates/infer-deepseek/src/model/mod.rs:857-860).
        self._extract_turn = extract_turn_full
        # When set, the ordering-shuffle partition key is computed here —
        # fused into this stage so the plan has no extra map operator.
        self._num_buckets = num_buckets
        self._salt_block = salt_block
        # Warm the dispatch path so first-batch latency excludes setup.
        self._extract_turn("warmup", "user")

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        # Null text is legal input (treated as empty — the reference's
        # missing-image fallback posture, SURVEY M15); null keys are not
        # and abort in the ordering stage.
        text = pc.fill_null(batch.column("text"), "")
        role = pc.fill_null(batch.column("role"), "")

        # Vectorized payload sniff (mirrors sniff.has_payload).
        needs = _sniff_payload(text, role)
        needs_np = needs.combine_chunks().to_numpy(zero_copy_only=False)
        payload_idx = np.flatnonzero(needs_np)

        # Fast path: vectorized normalize for every row; payload rows are
        # overwritten below via if_else.
        norm = normalize_arrow(text)

        n_blocks = np.zeros(n, dtype=np.int32)
        span_counts = np.zeros(n, dtype=np.int64)
        if len(payload_idx):
            # Vectorized take of only the sniff-positive rows, then one
            # Python loop over them. Spans and block metadata go straight
            # into flat buffers -> ListArray.from_arrays instead of
            # millions of per-span Python dicts — allocation pressure in
            # this loop showed up as per-core slowdown at high actor
            # counts, so everything below is a SINGLE pass per row.
            idx_pa = pa.array(payload_idx)
            sub_texts = text.take(idx_pa).to_pylist()
            sub_roles = role.take(idx_pa).to_pylist()
            py_text: list = [None] * n
            flat_start: list = []
            flat_end: list = []
            flat_kind: list = []
            flat_page: list = []
            flat_y: list = []
            flat_x: list = []
            fn = self._extract_turn
            for k, i in enumerate(payload_idx):
                extracted, spans, blocks = fn(sub_texts[k], sub_roles[k])
                py_text[i] = extracted
                span_counts[i] = len(spans)
                n_blocks[i] = len(spans)
                for s, e in spans:
                    flat_start.append(s)
                    flat_end.append(e)
                for bk, bp, by, bx in blocks:
                    flat_kind.append(bk)
                    flat_page.append(bp)
                    flat_y.append(by)
                    flat_x.append(bx)
            extracted_text = pc.if_else(needs, pa.array(py_text, pa.string()), norm)
        else:
            flat_start = flat_end = []
            flat_kind = flat_page = flat_y = flat_x = []
            extracted_text = norm

        offsets = np.zeros(n + 1, dtype=np.int32)
        np.cumsum(span_counts, out=offsets[1:])
        offsets_arr = pa.array(offsets, pa.int32())
        spans_arr = pa.ListArray.from_arrays(
            offsets_arr,
            pa.StructArray.from_arrays(
                [pa.array(flat_start, pa.int64()), pa.array(flat_end, pa.int64())],
                ["start", "end"],
            ),
        )
        blocks_arr = pa.ListArray.from_arrays(
            offsets_arr,
            pa.StructArray.from_arrays(
                [
                    pa.array(flat_kind, pa.string()),
                    pa.array(flat_page, pa.int32()),
                    pa.array(flat_y, pa.int32()),
                    pa.array(flat_x, pa.int32()),
                ],
                ["kind", "page", "y", "x"],
            ),
        )
        out = pa.table(
            {
                "conv_id": batch.column("conv_id"),
                "turn_idx": batch.column("turn_idx"),
                "role": role,
                # 64-bit offsets: a >2GB ordering bucket (10^6-turn
                # conversation) overflows int32 string offsets inside the
                # sort exchange's block concat (see schema.EXTRACTED)
                "extracted_text": pc.cast(extracted_text, pa.large_string()),
                "spans": spans_arr,
                "blocks": blocks_arr,
                "n_blocks": pa.array(n_blocks),
                "schema_version": pa.array(
                    np.full(n, SCHEMA_VERSION, dtype=np.int32)
                ),
            }
        )
        if self._num_buckets is not None:
            if (
                batch.column("conv_id").null_count
                or batch.column("turn_idx").null_count
            ):
                raise ValueError(
                    "null conv_id/turn_idx in input — ordering keys must be "
                    "non-null (null text is tolerated; null keys are not)"
                )
            conv = batch.column("conv_id").to_numpy(zero_copy_only=False)
            h = _hash_conv_ids(conv)
            if self._salt_block is not None:
                salt = (
                    batch.column("turn_idx").to_numpy(zero_copy_only=False)
                    // self._salt_block
                ).astype(np.uint64)
                h = h ^ (salt * np.uint64(0x9E3779B97F4A7C15))
            bucket = (h % self._num_buckets).astype(np.int32)
            out = out.append_column("_bucket", pa.array(bucket))
        return out


class GlobalViewTurns:
    """Actor-pool stage for the M6 document-level canonicalization pass:
    (conv_id, turn_idx, global_view, global_fp) per turn, where
    global_view is the whole-payload canonical text (boilerplate KEPT —
    see extract.build_global_view) and global_fp its md5. Same vectorized
    sniff fast path as ExtractTurns: payload-free rows never touch
    Python."""

    def __init__(self) -> None:
        # module-level import (not a lazy relative import here): the class
        # is cloudpickled by value into workers that cannot import
        # ``engine`` by name (_rayutil module docstring)
        self._build = build_global_view
        self._build("warmup", "user")

    @staticmethod
    def _md5_hex(arr) -> list:
        """md5 hexdigest per row, hashing the UTF-8 bytes IN PLACE via
        memoryview slices of the Arrow data buffer — no to_pylist()
        decode + re-encode round trip (measured ~1.6x on 100k mixed-len
        strings; output byte-identical, so the golden-parquet oracle is
        unchanged). Handles string/large_string, chunk offsets, and
        validity (null hashes as empty — callers fill_null first)."""
        import hashlib

        if isinstance(arr, pa.ChunkedArray):
            chunks = arr.chunks
        else:
            chunks = [arr]
        md5 = hashlib.md5
        out: list = []
        for chunk in chunks:
            n = len(chunk)
            if not n:
                continue
            bufs = chunk.buffers()
            width = 8 if pa.types.is_large_string(chunk.type) else 4
            dt = np.int64 if width == 8 else np.int32
            off = chunk.offset
            offsets = np.frombuffer(
                bufs[1], dtype=dt, count=n + 1 + off
            )[off:]
            data = memoryview(bufs[2])
            out.extend(
                md5(data[offsets[i]:offsets[i + 1]]).hexdigest()
                for i in range(n)
            )
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch.column("text"), "")
        role = pc.fill_null(batch.column("role"), "")
        needs = _sniff_payload(text, role)
        needs_np = needs.combine_chunks().to_numpy(zero_copy_only=False)
        payload_idx = np.flatnonzero(needs_np)
        views = normalize_arrow(text)
        if len(payload_idx):
            idx_pa = pa.array(payload_idx)
            sub_texts = text.take(idx_pa).to_pylist()
            sub_roles = role.take(idx_pa).to_pylist()
            py_views: list = [None] * batch.num_rows
            for k, i in enumerate(payload_idx):
                py_views[i] = self._build(sub_texts[k], sub_roles[k])
            views = pc.if_else(needs, pa.array(py_views, pa.string()), views)
        fps = self._md5_hex(views)
        return pa.table(
            {
                "conv_id": batch.column("conv_id"),
                "turn_idx": batch.column("turn_idx"),
                "global_view": views,
                "global_fp": pa.array(fps, pa.string()),
            }
        )


def global_view_plan(
    paths: Union[str, Sequence[str]],
    *,
    batch_size: int = DEFAULT_BATCH_SIZE,
    concurrency=None,
) -> ray.data.Dataset:
    """Lazy plan: transcript Parquet -> per-turn document-level canonical
    views (M6 operator). No shuffle — embarrassingly parallel."""
    from ._rayutil import ensure_serializable
    from ._rayutil import pool_size as _pool_size

    ensure_serializable()
    ds = ray.data.read_parquet(paths, columns=READ_COLUMNS)
    return ds.map_batches(
        GlobalViewTurns,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency if concurrency is not None else _pool_size(),
        num_cpus=1,
    )


DEFAULT_NUM_BUCKETS = 64  # floor; default_num_buckets() scales with cluster

# On-disk snappy parquet of transcript text expands ~3-5x when decoded to
# in-memory Arrow; 5 is the conservative end so the per-block bound errs
# toward MORE blocks, never an OOM-sized one.
PARQUET_INMEM_EXPANSION = 5


def _estimate_input_bytes(paths) -> int:
    """Total on-disk bytes of the parquet inputs (files, dirs, globs).
    Best-effort: non-local / unresolvable paths contribute 0 — callers
    fall back to the cluster-derived bucket floor."""
    import glob as _glob
    import os

    total = 0
    items = [paths] if isinstance(paths, (str, os.PathLike)) else list(paths)
    for p in items:
        p = os.fspath(p)
        try:
            if os.path.isdir(p):
                for root, _dirs, names in os.walk(p):
                    for name in names:
                        if name.endswith(".parquet"):
                            total += os.path.getsize(os.path.join(root, name))
            elif os.path.isfile(p):
                total += os.path.getsize(p)
            else:  # glob pattern
                for m in _glob.glob(p):
                    if os.path.isfile(m):
                        total += os.path.getsize(m)
        except OSError:  # pragma: no cover — races with concurrent writers
            continue
    return total


def default_num_buckets(paths=None) -> int:
    """Ordering-shuffle partitions: O(2x cluster cores), floored at 64.
    A constant would under-partition a 256-node cluster (one reducer per
    bucket bounds the shuffle's parallelism).

    With ``paths``, the count ALSO scales with the input so per-block
    bytes stay bounded by the DataContext block-size target: plans pin
    the read block count to the bucket count (see extraction_plan), and
    pinning to a cluster-only constant would make per-block bytes grow
    linearly with corpus size — at extreme corpus-to-cluster ratios
    that's per-block OOM / object-store thrash. buckets = max(cluster
    floor, est_in_memory_bytes / target_max_block_size), so both the
    64/64 range-matching property AND the block-size bound hold at any
    scale."""
    try:
        import ray

        ncpu = int(ray.cluster_resources().get("CPU", 0) or 0)
    except Exception:  # pragma: no cover
        ncpu = 0
    base = max(DEFAULT_NUM_BUCKETS, 2 * ncpu)
    if paths is not None:
        est = _estimate_input_bytes(paths) * PARQUET_INMEM_EXPANSION
        if not est:
            # remote (s3://, gcs://) or unresolvable paths stat to 0 —
            # the per-block byte bound below does NOT hold then; make
            # the cluster-floor fallback visible (ADVICE r4)
            import logging

            logging.getLogger(__name__).warning(
                "default_num_buckets: could not size input %r locally; "
                "falling back to the cluster-derived bucket floor (%d) — "
                "per-block byte bound not enforced",
                paths, base,
            )
        else:
            try:
                import ray.data

                target = int(
                    ray.data.DataContext.get_current().target_max_block_size
                    or (128 << 20)
                )
            except Exception:  # pragma: no cover
                target = 128 << 20
            base = max(base, -(-est // target))  # ceil div
            # sub-floor inputs (VERDICT r4 #8): a KB-sized test corpus
            # should not carry a 64-way exchange — cap at one bucket per
            # MiB of estimated in-memory input. No-op from ~64 MiB up,
            # so every bench/driver tier keeps the cluster-scaled count.
            base = min(base, max(1, -(-est // (1 << 20))))
    return int(base)


def resolve_num_buckets(num_buckets, paths=None) -> int:
    """Shared bucket-count resolution for every conv-bucketed pipeline:
    an explicit value wins; ``None`` scales with the cluster AND (for
    path inputs) the input size via default_num_buckets. A Dataset
    input (no priceable paths) uses the cluster floor."""
    if num_buckets is not None:
        return int(num_buckets)
    try:
        import ray.data

        if isinstance(paths, ray.data.Dataset):
            paths = None
    except Exception:  # pragma: no cover
        pass
    return default_num_buckets(paths)


def _hash_conv_ids(conv_ids: np.ndarray) -> np.ndarray:
    """Deterministic cross-process 64-bit hash of the conv_id strings
    (pandas' fixed-key siphash; NEVER Python's salted hash())."""
    from pandas.util import hash_array

    return hash_array(conv_ids)


def _add_bucket(num_buckets: int, salt_block: Optional[int]):
    """Vectorized repartition key: hash(conv_id) [+ salt for skewed tails]
    mod num_buckets. The explicit partitioning step of the north rule — the
    shuffle moves an int32 key, not the conv_id string."""

    def add_bucket(batch: pa.Table) -> pa.Table:
        conv = batch.column("conv_id").to_numpy(zero_copy_only=False)
        h = _hash_conv_ids(conv)
        if salt_block is not None:
            salt = (
                batch.column("turn_idx").to_numpy(zero_copy_only=False)
                // salt_block
            ).astype(np.uint64)
            h = h ^ (salt * np.uint64(0x9E3779B97F4A7C15))
        bucket = (h % num_buckets).astype(np.int32)
        return batch.append_column("_bucket", pa.array(bucket))

    return add_bucket


def _order_bucket_fn(conv_sizes_ref=None, sizes_mode: str = "dense",
                     salt_block: Optional[int] = None):
    """Per-bucket ordering: sort by (conv_id, turn_idx), enforce the
    duplicate-turn invariant, compute conv_n_turns — all vectorized
    (no per-conversation Python calls).

    ``sizes_mode``:
    - "dense" (whole-input plans): conv_n_turns = last turn_idx + 1,
      with the dense-0-based input contract VALIDATED loudly;
    - "local_count" (partitioned/resumable runs over input shards, where
      a partition legitimately sees a subset of a conversation's turns):
      conv_n_turns = number of rows present locally; no density check
      beyond the duplicate invariant — a consumer merging partitions
      recomputes global sizes.

    ``conv_sizes_ref`` (salted mode) is a broadcast {conv_id: n_turns}
    for conversations split across buckets by salting; everyone else's
    size comes from the local run. In salted mode the gap check applies
    WITHIN a salt block only: a conversation with more salt blocks than
    shuffle buckets necessarily lands two (non-adjacent) blocks in the
    same bucket — e.g. a 10^6-turn conversation at salt_block=4096 has
    245 blocks vs 64 buckets — which is legal fragmentation, not a
    density violation (each block's turn range is still contiguous and
    fully present; conv_n_turns comes from the broadcast)."""

    salted = conv_sizes_ref is not None

    def order_bucket(group: pa.Table) -> pa.Table:
        t = group.sort_by(
            [("conv_id", "ascending"), ("turn_idx", "ascending")]
        ).combine_chunks()
        n = t.num_rows
        if n == 0:
            return t.drop_columns(["_bucket"]).append_column(
                "conv_n_turns", pa.array([], pa.int32())
            )
        ids = t.column("conv_id").to_numpy(zero_copy_only=False)
        turn = t.column("turn_idx").to_numpy(zero_copy_only=False)
        new_conv = np.empty(n, dtype=bool)
        new_conv[0] = True
        if n > 1:
            new_conv[1:] = ids[1:] != ids[:-1]
            steps = np.diff(turn)
            dup = (~new_conv[1:]) & (steps <= 0)
            if dup.any():
                bad = ids[1 + int(np.flatnonzero(dup)[0])]
                raise ValueError(
                    f"duplicate turn_idx within conversation {bad!r}"
                )
            if sizes_mode == "dense":
                # INPUT CONTRACT (loud, M13 discipline): turn_idx is dense
                # and 0-based per conversation — conv_n_turns = last_idx+1
                # relies on it. Within a bucket that means strictly
                # consecutive indices (and, unsalted, a 0 start); a gap
                # aborts with the conversation named rather than silently
                # emitting a wrong size.
                gap = (~new_conv[1:]) & (steps > 1)
                if salted and salt_block:
                    # Two salt blocks of one conversation sharing a bucket is
                    # legal fragmentation — but ONLY when the pair is
                    # block-aligned (earlier turn ends its block, later turn
                    # starts its block): dense input puts a whole salt block
                    # in one bucket, so any present block is contiguous and
                    # complete. A cross-block pair that is NOT aligned (e.g.
                    # 4094 -> 4096 at salt_block=4096, 4095 missing) is a
                    # genuine density violation and must still abort — a
                    # blanket cross-block exemption would let it pass and
                    # emit an overstated conv_n_turns from the skew-tail
                    # broadcast.
                    legal_cross = (
                        (turn[:-1] + 1) % salt_block == 0
                    ) & (turn[1:] % salt_block == 0)
                    gap &= ~legal_cross
                if gap.any():
                    bad = ids[1 + int(np.flatnonzero(gap)[0])]
                    raise ValueError(
                        f"gap in turn_idx within conversation {bad!r} "
                        f"(turn_idx must be dense and 0-based per "
                        f"conversation; partitioned runs use local_count)"
                    )
        starts = np.flatnonzero(new_conv)
        ends = np.append(starts[1:], n)
        if sizes_mode == "dense":
            if not salted and (turn[starts] != 0).any():
                bad = ids[starts[int(np.flatnonzero(turn[starts] != 0)[0])]]
                raise ValueError(
                    f"conversation {bad!r} does not start at turn_idx 0 "
                    f"(turn_idx must be dense and 0-based per conversation)"
                )
            sizes = turn[ends - 1].astype(np.int64) + 1
        else:
            sizes = (ends - starts).astype(np.int64)
        if conv_sizes_ref is not None:
            lookup = ray.get(conv_sizes_ref)
            if lookup:
                run_ids = ids[starts]
                for k, conv in enumerate(run_ids):
                    if conv in lookup:
                        sizes[k] = lookup[conv]
        conv_n = np.repeat(sizes, ends - starts).astype(np.int32)
        return t.drop_columns(["_bucket"]).append_column(
            "conv_n_turns", pa.array(conv_n)
        )

    return order_bucket


def order_stage(
    ds: ray.data.Dataset,
    salt_block: Optional[int] = None,
    num_buckets: Optional[int] = None,
    conv_sizes_ref=None,
    pre_bucketed: bool = False,
    sizes_mode: str = "dense",
) -> ray.data.Dataset:
    """Restore stable per-conversation turn order (the only shuffle).

    Keyed on ``hash(conv_id) % num_buckets`` — an int32 key, so the
    sort-based exchange samples/partitions cheap integers and the grouped
    stage runs once per bucket (vectorized over many conversations), not
    once per conversation.

    Salted (``salt_block=S``): the bucket key also mixes
    ``turn_idx // S``, so a skewed 10^6-turn conversation spreads over
    many reducers; ordering composes because salt blocks are contiguous
    turn ranges. Conversation sizes for salted conversations come from a
    pre-aggregated max over ONLY the skew tail (rows with
    ``turn_idx >= S``), broadcast via ``ray.put`` — the extra pass
    touches only the skewed-tail rows, never the full corpus.
    """
    if num_buckets is None:
        num_buckets = default_num_buckets()
    if (
        salt_block is not None
        and conv_sizes_ref is None
        and sizes_mode == "dense"
    ):
        conv_sizes_ref = ray.put(_skew_tail_sizes(ds, int(salt_block)))

    if pre_bucketed:
        bucketed = ds
    else:
        bucketed = ds.map_batches(
            _add_bucket(num_buckets, salt_block),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    return bucketed.groupby("_bucket").map_groups(
        _order_bucket_fn(conv_sizes_ref, sizes_mode, salt_block),
        batch_format="pyarrow",
    )


def _skew_tail_sizes(ds: ray.data.Dataset, salt_block: int) -> dict:
    """{conv_id: n_turns} for conversations in the skew tail (any row with
    turn_idx >= salt_block) — tiny by construction."""
    tail_max = (
        ds.filter(expr=f"turn_idx >= {salt_block}")
        .groupby("conv_id")
        .max("turn_idx")
        .to_pandas()
    )
    return {
        row["conv_id"]: int(row["max(turn_idx)"]) + 1
        for _, row in tail_max.iterrows()
    }


def extraction_plan(
    paths: Union[str, Sequence[str]],
    *,
    batch_size: int = DEFAULT_BATCH_SIZE,
    concurrency=None,
    salt_block: Optional[int] = None,
    ordered: bool = True,
    num_blocks: Optional[int] = None,
    num_buckets: Optional[int] = None,
    sizes_mode: str = "dense",
) -> ray.data.Dataset:
    """Build the full lazy extraction plan over transcript Parquet paths.

    ``num_blocks``: read parallelism. Defaults to ``num_buckets`` so the
    ordering exchange's range count matches the bucket key's
    cardinality: Ray's sort-based groupby creates one output range per
    input block with boundaries sampled from the key values, and when
    ranges greatly outnumber distinct keys the quantiles degenerate
    (duplicate boundaries ⇒ empty ranges; off-quantile boundaries ⇒
    merged-bucket straggler blocks that serialize the tail — Ray's
    default 224 blocks over 64 buckets measured 2-5x slower than 64/64
    on the bench tier). Both scale together via default_num_buckets(),
    which takes max(2x cluster cores, est_input_bytes / target block
    size) — so per-block bytes stay bounded at extreme
    corpus-to-cluster ratios instead of growing with the corpus."""
    from ._rayutil import ensure_serializable
    from ._rayutil import pool_size as _pool_size

    ensure_serializable()
    if num_buckets is None:
        num_buckets = default_num_buckets(paths)
    read_kwargs = {"override_num_blocks": num_blocks if num_blocks is not None
                   else num_buckets}

    conv_sizes_ref = None
    if ordered and salt_block is not None and sizes_mode == "dense":
        # Conversation sizes for the skew tail come from a column-pruned
        # read of the RAW input (conv_id, turn_idx only) — never a second
        # pass through extraction.
        raw = ray.data.read_parquet(paths, columns=["conv_id", "turn_idx"])
        conv_sizes_ref = ray.put(_skew_tail_sizes(raw, int(salt_block)))

    ds = ray.data.read_parquet(paths, columns=READ_COLUMNS, **read_kwargs)
    ds = ds.map_batches(
        ExtractTurns,
        fn_constructor_kwargs={
            "num_buckets": num_buckets if ordered else None,
            "salt_block": salt_block,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        # Default pool scales with the CLUSTER (ncpu-1 cap), never a
        # constant — a hard-coded cap strangles a 256-node deployment.
        concurrency=concurrency if concurrency is not None else _pool_size(),
        num_cpus=1,
    )
    if ordered:
        ds = order_stage(
            ds,
            salt_block=salt_block,
            num_buckets=num_buckets,
            conv_sizes_ref=conv_sizes_ref,
            pre_bucketed=True,
            sizes_mode=sizes_mode,
        )
    return ds
