"""Relational operators expressed Ray-Data-first.

Scale pattern used throughout: PARTIAL AGGREGATION — each
``map_batches`` call pre-aggregates its batch with pyarrow
``Table.group_by`` (a combiner), so the global ``groupby`` shuffle
moves one row per (key, batch) instead of every input row
(ray_guide "Aggregation at scale"; the reference's analog is the
per-stage count/total/min/max roll-up of bench events,
/root/reference/crates/cli/src/bench.rs:139-172).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

from .._rayutil import ensure_serializable, pool_size
from .sketches import _splitmix64


def _fixed_point(col, scale: int):
    """Quantize a float column to int64 fixed point PER ELEMENT.

    The engine's exact-aggregate discipline: distributed float sums drift
    in the last bits with accumulation order (and even round(sum, 2)
    yields engine-dependent doubles at 1e8 magnitude), so every
    oracle-compared aggregate quantizes its INPUTS to integers — a
    per-element round of the same double is deterministic on both
    engines, and int64 sums are exact in any order. Never quantize after
    summing: the float sum's error is at the same scale as the input's
    decimal resolution, so round(sum * scale) is engine-dependent.

    round_mode pins DuckDB's round() (half away from zero) — Arrow's
    default half_to_even silently diverges the first time value*scale
    lands exactly on .5 (same discipline as textstats.quality_score)."""
    return pc.cast(
        pc.round(
            pc.multiply(col, float(scale)), round_mode="half_towards_infinity"
        ),
        pa.int64(),
    )


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    ensure_serializable()
    return ray.data.read_parquet(
        os.path.join(sf_dir, f"{table}.parquet"), columns=columns
    )


def pricing_summary(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q1-shaped pricing summary over lineitem (usage-counter analog,
    SURVEY A2). Predicate pushed to the read; partial sums per batch."""
    ensure_serializable()
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=[
            "l_returnflag", "l_linestatus", "l_quantity",
            "l_extendedprice", "l_discount", "l_tax", "l_shipdate",
        ],
        filter=(pc.field("l_shipdate") <= pa.scalar(np.datetime64("1998-09-02", "us"))),
    )

    def partial(batch: pa.Table) -> pa.Table:
        # Exact integer domain (see _fixed_point): qty is integral, money
        # has 2 decimals, discount/tax are whole percents — so cents /
        # percent units make every product and sum exact in int64
        # (max charge_e6 term ~1.1e11/row; 9.2e18 headroom).
        qty = _fixed_point(batch["l_quantity"], 1)
        cents = _fixed_point(batch["l_extendedprice"], 100)
        disc_pct = _fixed_point(batch["l_discount"], 100)
        tax_pct = _fixed_point(batch["l_tax"], 100)
        disc_e4 = pc.multiply(cents, pc.subtract(pa.scalar(100), disc_pct))
        charge_e6 = pc.multiply(disc_e4, pc.add(pa.scalar(100), tax_pct))
        batch = pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "qty": qty,
                "base_cents": cents,
                "disc_e4": disc_e4,
                "charge_e6": charge_e6,
                "disc_pct": disc_pct,
            }
        )
        return batch.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [
                ("qty", "sum"), ("base_cents", "sum"), ("disc_e4", "sum"),
                ("charge_e6", "sum"), ("disc_pct", "sum"), ("qty", "count"),
            ]
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    agg = partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("qty_sum", alias_name="sum_qty"),
        Sum("base_cents_sum", alias_name="sum_base_price_cents"),
        Sum("disc_e4_sum", alias_name="sum_disc_price_e4"),
        Sum("charge_e6_sum", alias_name="sum_charge_e6"),
        Sum("disc_pct_sum", alias_name="_sum_disc_pct"),
        Sum("qty_count", alias_name="count_order"),
    )

    def finalize(batch: pa.Table) -> pa.Table:
        # Averages by INTEGER division of the exact integer sums — no
        # float ever touches an oracle-compared column.
        n = batch["count_order"].to_numpy(zero_copy_only=False)
        i64 = lambda name: batch[name].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "sum_qty": batch["sum_qty"],
                "sum_base_price_cents": batch["sum_base_price_cents"],
                "sum_disc_price_e4": batch["sum_disc_price_e4"],
                "sum_charge_e6": batch["sum_charge_e6"],
                "avg_qty_micro": pa.array(i64("sum_qty") * 1_000_000 // n),
                "avg_price_micro": pa.array(
                    i64("sum_base_price_cents") * 10_000 // n
                ),
                "avg_disc_micro": pa.array(i64("_sum_disc_pct") * 10_000 // n),
                "count_order": batch["count_order"],
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


def _stage_partials(batch: pa.Table) -> pa.Table:
    return (
        pa.table(
            {
                "event_type": batch["event_type"],
                "value": batch["value"],
                "v_micro": _fixed_point(batch["value"], 1_000_000),
            }
        )
        .group_by(["event_type"])
        .aggregate(
            [("value", "count"), ("v_micro", "sum"), ("value", "min"), ("value", "max")]
        )
    )


def stage_totals(sf_dir: str) -> ray.data.Dataset:
    """Per-stage count/total/min/max over events — the bench stage roll-up
    verbatim (SURVEY A1; /root/reference/crates/cli/src/bench.rs:139-172)."""
    ds = _read(sf_dir, "events", columns=["event_type", "value"])
    partials = ds.map_batches(_stage_partials, batch_format="pyarrow", zero_copy_batch=True)
    agg = partials.groupby("event_type").aggregate(
        Sum("value_count", alias_name="n_events"),
        Sum("v_micro_sum", alias_name="total_value_micro"),
        Min("value_min", alias_name="min_value"),
        Max("value_max", alias_name="max_value"),
    )
    return agg.select_columns(
        ["event_type", "n_events", "total_value_micro", "min_value", "max_value"]
    )


def top_stages(sf_dir: str, k: int = 3) -> ray.data.Dataset:
    """Top-k stages by total value desc (SURVEY O3: bench top-10)."""
    return stage_totals(sf_dir).sort("total_value_micro", descending=True).limit(k)


def distinct_event_types(sf_dir: str) -> ray.data.Dataset:
    """Global distinct (SURVEY A7): per-batch unique combiner, then a tiny
    groupby over the already-distinct partials."""
    ds = _read(sf_dir, "events", columns=["event_type"])

    def per_batch_unique(batch: pa.Table) -> pa.Table:
        return pa.table({"event_type": pc.unique(batch["event_type"])})

    partials = ds.map_batches(per_batch_unique, batch_format="pyarrow", zero_copy_batch=True)
    agg = partials.groupby("event_type").aggregate(Count(alias_name="_n"))
    return agg.map_batches(
        lambda t: t.select(["event_type"]), batch_format="pyarrow"
    )


class _SegmentLookup:
    """Broadcast-join actor: the small side (customer -> mktsegment) is
    ray.put once on the driver and fetched once per actor in __init__
    (registry-lookup analog J2, never re-shipped per batch)."""

    def __init__(self, lookup_ref):
        lookup = ray.get(lookup_ref)
        self._keys = lookup["keys"]        # sorted int64 custkeys
        self._segments = lookup["segments"]  # dictionary-encoded segments

    def __call__(self, batch: pa.Table) -> pa.Table:
        cust = batch["o_custkey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(self._keys, cust)
        pos = np.clip(pos, 0, len(self._keys) - 1)
        seg = self._segments[pos]
        seg = np.where(self._keys[pos] == cust, seg, "__missing__")
        out = pa.table(
            {
                "c_mktsegment": pa.array(seg, pa.string()),
                "price_cents": _fixed_point(batch["o_totalprice"], 100),
            }
        )
        return (
            out.group_by(["c_mktsegment"])
            .aggregate([("price_cents", "count"), ("price_cents", "sum")])
        )


def orders_by_segment(sf_dir: str) -> ray.data.Dataset:
    """orders JOIN customer (broadcast small side) -> revenue per segment."""
    ensure_serializable()
    import pyarrow.parquet as pq

    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_mktsegment"]
    )
    order = pc.sort_indices(cust["c_custkey"])
    keys = cust["c_custkey"].take(order).to_numpy()
    segments = np.asarray(cust["c_mktsegment"].take(order).to_pylist())
    lookup_ref = ray.put({"keys": keys, "segments": segments})

    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    partials = ds.map_batches(
        _SegmentLookup,
        fn_constructor_args=(lookup_ref,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=pool_size(),
        num_cpus=1,
    )
    return partials.groupby("c_mktsegment").aggregate(
        Sum("price_cents_count", alias_name="n_orders"),
        Sum("price_cents_sum", alias_name="revenue_cents"),
    )


def distinct_users_per_type(sf_dir: str) -> ray.data.Dataset:
    """Grouped COUNT DISTINCT — count of distinct users per event_type.

    The two-level distinct shape: per-batch ``unique`` over (type, user)
    pairs is the combiner (the shuffle moves one row per distinct pair
    per batch, never raw events), a groupby over the pair dedups
    globally, and a per-batch re-aggregation + tiny second groupby
    counts pairs per type. Distinct-heavy columns never meet a
    high-cardinality sort: the pair groupby's key count is bounded by
    (types x users), and the count groupby by types alone."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "events", columns=["event_type", "user_id"])

    def pair_partial(batch: pa.Table) -> pa.Table:
        return (
            pa.table(
                {"event_type": batch["event_type"], "user_id": batch["user_id"]}
            )
            .group_by(["event_type", "user_id"])
            .aggregate([])
        )

    pairs = ds.map_batches(pair_partial, batch_format="pyarrow", zero_copy_batch=True)
    distinct_pairs = pairs.groupby(["event_type", "user_id"]).aggregate(
        Count(alias_name="_n")
    )

    def count_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "event_type": batch["event_type"],
                "one": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            }
        )
        return t.group_by(["event_type"]).aggregate([("one", "sum")])

    counted = distinct_pairs.map_batches(
        count_partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return counted.groupby("event_type").aggregate(
        Sum("one_sum", alias_name="n_users")
    )


class _SegmentEnrich:
    """Row-level broadcast LEFT-join actor: sorted custkey -> segment
    arrays fetched once per actor from the object store (J2 lookup shape,
    like _SegmentLookup, but emitting enriched ROWS instead of an
    aggregate — the reusable dimension-attach primitive)."""

    def __init__(self, lookup_ref):
        lookup = ray.get(lookup_ref)
        self._keys = lookup["keys"]
        self._segments = lookup["segments"]

    def __call__(self, batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(self._keys, uid), 0, len(self._keys) - 1)
        hit = self._keys[pos] == uid
        seg = pa.array(self._segments[pos], pa.string())
        return pa.table(
            {
                "event_id": batch["event_id"],
                "user_id": batch["user_id"],
                "event_type": batch["event_type"],
                "c_mktsegment": pc.if_else(
                    pa.array(hit), seg, pa.scalar(None, pa.string())
                ),
            }
        )


def enrich_events_with_segment(sf_dir: str) -> ray.data.Dataset:
    """Events LEFT JOIN customer on user_id — the row-level broadcast
    enrichment join (attach a dimension attribute to every fact row).
    The dimension ships once via ``ray.put``; unmatched users keep a
    null segment (left semantics). No shuffle at all: enrichment is
    embarrassingly parallel once the small side is broadcast."""
    ensure_serializable()
    import pyarrow.parquet as pq

    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_mktsegment"],
    )
    order = pc.sort_indices(cust["c_custkey"])
    keys = cust["c_custkey"].take(order).to_numpy()
    segments = np.asarray(cust["c_mktsegment"].take(order).to_pylist())
    lookup_ref = ray.put({"keys": keys, "segments": segments})

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "event_type"])
    return ds.map_batches(
        _SegmentEnrich,
        fn_constructor_args=(lookup_ref,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=pool_size(),
        num_cpus=1,
    )


WINDOW_US = 3_600_000_000  # 1h tumbling window in microseconds


def windowed_events(sf_dir: str) -> ray.data.Dataset:
    """Tumbling 1h window per user over the events stream — the engine's
    windowed-aggregate operator (streaming analog, SURVEY SS2.10).

    Partitioning assumption: windows are keyed on (user_id, window); a
    tumbling window needs no cross-window state, so per-batch partial
    aggregation + one small groupby implements it exactly."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        ts_us = pc.cast(batch["ts"], pa.int64())
        window = pc.multiply(pc.divide(ts_us, WINDOW_US), pa.scalar(3600, pa.int64()))
        t = pa.table(
            {
                "user_id": batch["user_id"],
                "window_start": window,
                "v_micro": _fixed_point(batch["value"], 1_000_000),
            }
        )
        return t.group_by(["user_id", "window_start"]).aggregate(
            [("v_micro", "count"), ("v_micro", "sum")]
        )

    # batch_size=None: partial-aggregate whole blocks — 1024-row slices
    # re-emit the same (user, window) keys once per slice, inflating the
    # exchange when keys repeat within a block (and costing extra
    # group_by calls when they don't)
    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    )
    return partials.groupby(["user_id", "window_start"]).aggregate(
        Sum("v_micro_count", alias_name="n_events"),
        Sum("v_micro_sum", alias_name="sum_value_micro"),
    )


SESSION_GAP_US = 1_800_000_000  # 30 min


def sessionized_events(sf_dir: str, num_buckets: int | None = None) -> ray.data.Dataset:
    """Gap-based sessionization (the streaming-shaped workload pattern from
    the Ray guide): events bucketed by hash(user_id), per-bucket vectorized
    session assignment over (user_id, ts)-sorted rows. A new session starts
    at the first event of a user or after a >30min gap.

    Partitioning assumption: all of a user's events co-locate in one
    bucket; session numbering is per user (1-based), matching the SQL
    window-function oracle exactly."""
    from ..pipeline import default_num_buckets

    if num_buckets is None:
        num_buckets = default_num_buckets()
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "value"])

    def add_bucket(batch: pa.Table) -> pa.Table:
        from pandas.util import hash_array

        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        bucket = (hash_array(uid) % num_buckets).astype(np.int32)
        return batch.append_column("_ub", pa.array(bucket))

    def sessionize(group: pa.Table) -> pa.Table:
        t = group.sort_by(
            [("user_id", "ascending"), ("ts", "ascending")]
        ).combine_chunks()
        n = t.num_rows
        if n == 0:
            return pa.table(
                {"user_id": pa.array([], pa.int64()),
                 "session_seq": pa.array([], pa.int64()),
                 "session_start_us": pa.array([], pa.int64()),
                 "n_events": pa.array([], pa.int64()),
                 "sum_value_micro": pa.array([], pa.int64())}
            )
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        val = (
            _fixed_point(t.column("value"), 1_000_000)
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        new_user = np.empty(n, dtype=bool)
        new_user[0] = True
        new_user[1:] = uid[1:] != uid[:-1]
        gap = np.empty(n, dtype=bool)
        gap[0] = True
        gap[1:] = (ts[1:] - ts[:-1]) > SESSION_GAP_US
        is_new = new_user | gap
        cum = np.cumsum(is_new)
        user_starts = np.flatnonzero(new_user)
        base = np.repeat(
            cum[user_starts] - 1, np.diff(np.append(user_starts, n))
        )
        seq = cum - base  # per-user 1-based session number
        sess_starts = np.flatnonzero(is_new)
        sess_ends = np.append(sess_starts[1:], n)
        lens = sess_ends - sess_starts
        sums = np.add.reduceat(val, sess_starts)
        return pa.table(
            {
                "user_id": pa.array(uid[sess_starts], pa.int64()),
                "session_seq": pa.array(seq[sess_starts], pa.int64()),
                "session_start_us": pa.array(ts[sess_starts], pa.int64()),
                "n_events": pa.array(lens, pa.int64()),
                "sum_value_micro": pa.array(sums.astype(np.int64)),
            }
        )

    bucketed = ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
    return bucketed.groupby("_ub").map_groups(
        lambda g: sessionize(g.drop_columns(["_ub"])), batch_format="pyarrow"
    )


def asof_join_events_orders(sf_dir: str, num_buckets: int | None = None) -> ray.data.Dataset:
    """AS-OF JOIN — an operator Ray Data lacks, composed from the engine's
    bucketed-groupby machinery: for every event, attach the user's most
    recent order at-or-before the event time (left join semantics; events
    before any order keep nulls).

    Physical shape: BOTH sides bucket by hash(user_id) (one partitioning
    key, reused — the single-key discipline) and union into one stream;
    one vectorized map_groups per bucket sorts (user, time, order-first)
    and FORWARD-FILLS the last-seen order row index via
    np.maximum.accumulate — a row's fill is valid only if it lands at or
    after the row's user-run start, which makes per-user reset free.
    Ties (several orders on one date) are pre-deduped to the max order
    key on both sides so the result is deterministic (SQL ASOF leaves
    the tie unspecified)."""
    from ..pipeline import default_num_buckets

    if num_buckets is None:
        num_buckets = default_num_buckets()
    ensure_serializable()

    events = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])

    def tag_events(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        n = len(uid)
        from pandas.util import hash_array

        return pa.table(
            {
                "_b": pa.array((hash_array(uid) % num_buckets).astype(np.int32)),
                "user_id": batch["user_id"],
                "t_us": pc.cast(batch["ts"], pa.int64()),
                "is_order": pa.array(np.zeros(n, dtype=np.int8)),
                "event_id": batch["event_id"],
                "order_key": pa.array(np.zeros(n, dtype=np.int64)),
                "order_cents": pa.array(np.zeros(n, dtype=np.int64)),
            }
        )

    def tag_orders(batch: pa.Table) -> pa.Table:
        uid = batch["o_custkey"].to_numpy(zero_copy_only=False)
        n = len(uid)
        from pandas.util import hash_array

        return pa.table(
            {
                "_b": pa.array((hash_array(uid) % num_buckets).astype(np.int32)),
                "user_id": batch["o_custkey"],
                "t_us": pc.cast(
                    pc.cast(batch["o_orderdate"], pa.timestamp("us")), pa.int64()
                ),
                "is_order": pa.array(np.ones(n, dtype=np.int8)),
                "event_id": pa.array(np.zeros(n, dtype=np.int64)),
                "order_key": batch["o_orderkey"],
                "order_cents": _fixed_point(batch["o_totalprice"], 100),
            }
        )

    tagged = events.map_batches(
        tag_events, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        orders.map_batches(tag_orders, batch_format="pyarrow", zero_copy_batch=True)
    )

    def asof_bucket(group: pa.Table) -> pa.Table:
        t = group.combine_chunks()
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        tus = t.column("t_us").to_numpy(zero_copy_only=False)
        is_order = t.column("is_order").to_numpy(zero_copy_only=False)
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        okey = t.column("order_key").to_numpy(zero_copy_only=False)
        ocents = t.column("order_cents").to_numpy(zero_copy_only=False)
        n = len(uid)
        if n == 0:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "ts_us": pa.array([], pa.int64()),
                    "order_key": pa.array([], pa.int64()),
                    "order_cents": pa.array([], pa.int64()),
                }
            )
        # sort: user, time, orders-before-events at equal time (ts >= date
        # is inclusive), max order_key last among same-date ties
        order = np.lexsort((okey, 1 - is_order, tus, uid))
        uid, tus, is_order = uid[order], tus[order], is_order[order]
        eid, okey, ocents = eid[order], okey[order], ocents[order]
        # forward-fill last-seen order row; user boundary reset is free:
        # a fill from an earlier user lands before this user's run start
        order_pos = np.where(is_order == 1, np.arange(n), -1)
        ff = np.maximum.accumulate(order_pos)
        new_user = np.empty(n, dtype=bool)
        new_user[0] = True
        new_user[1:] = uid[1:] != uid[:-1]
        starts = np.flatnonzero(new_user)
        run_start = np.repeat(starts, np.diff(np.append(starts, n)))
        valid = ff >= run_start
        ev = is_order == 0
        fill = np.where(valid[ev], ff[ev], 0)
        ok = pa.array(valid[ev])
        null64 = pa.scalar(None, pa.int64())
        return pa.table(
            {
                "event_id": pa.array(eid[ev]),
                "user_id": pa.array(uid[ev]),
                "ts_us": pa.array(tus[ev]),
                "order_key": pc.if_else(ok, pa.array(okey[fill]), null64),
                "order_cents": pc.if_else(ok, pa.array(ocents[fill]), null64),
            }
        )

    return tagged.groupby("_b").map_groups(
        lambda g: asof_bucket(g.drop_columns(["_b"])), batch_format="pyarrow"
    )


def grouped_topn_events(sf_dir: str, n: int = 3) -> ray.data.Dataset:
    """Top-N per user by value (A5 argmax generalized to ranked top-N).

    Same two-level shape as ``top_event_per_user``: per-batch partial
    top-N keeps at most N rows per (user, batch), so the per-user reduce
    never sees the raw table. The final stage emits the 1-based rank so
    downstream consumers get the ordering without re-sorting. Tie-break:
    value desc, then event_id asc (deterministic, mirrors the oracle's
    ROW_NUMBER ORDER BY)."""
    from .sketches import _bottom_k_per_group

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "value"])

    def partial_topn(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        val = batch["value"].to_numpy(zero_copy_only=False)
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        idx = _bottom_k_per_group(uid, -val, eid, n)
        return batch.take(pa.array(idx))

    partials = ds.map_batches(
        partial_topn, batch_format="pyarrow", zero_copy_batch=True
    )

    def final_topn(group: pa.Table) -> pa.Table:
        t = group.combine_chunks()
        val = t["value"].to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, -val))[:n]
        out = t.take(pa.array(order))
        return out.append_column(
            "rank", pa.array(np.arange(1, len(order) + 1, dtype=np.int64))
        )

    return partials.groupby("user_id").map_groups(
        final_topn, batch_format="pyarrow"
    )


def anti_join_customers(sf_dir: str, num_buckets: int | None = None) -> ray.data.Dataset:
    """Customers with NO urgent order — a bucketed ANTI JOIN.

    Both sides are large at scale, so neither broadcasts: the probe side
    (urgent orders; predicate pushed into the read so non-matching row
    groups never leave storage) reduces to per-batch DISTINCT custkeys
    first (the combiner discipline), then both sides hash-bucket on
    custkey — the one shared partitioning key — and each bucket filters
    its customers against its probe-key set with one vectorized
    ``np.isin``. Shuffle weight: customer rows once plus one int64 key
    per (distinct custkey, batch) for orders."""
    from ..pipeline import default_num_buckets

    if num_buckets is None:
        num_buckets = default_num_buckets()
    ensure_serializable()

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name"])
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey"],
        filter=(pc.field("o_orderpriority") == "1-URGENT"),
    )

    def tag_cust(batch: pa.Table) -> pa.Table:
        key = batch["c_custkey"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "_b": pa.array((key % num_buckets).astype(np.int32)),
                "key": pa.array(key.astype(np.int64)),
                "c_name": batch["c_name"],
                "is_probe": pa.array(np.zeros(len(key), dtype=np.int8)),
            }
        )

    def tag_orders(batch: pa.Table) -> pa.Table:
        key = pc.unique(batch["o_custkey"]).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "_b": pa.array((key % num_buckets).astype(np.int32)),
                "key": pa.array(key.astype(np.int64)),
                "c_name": pa.array([""] * len(key), pa.string()),
                "is_probe": pa.array(np.ones(len(key), dtype=np.int8)),
            }
        )

    tagged = cust.map_batches(
        tag_cust, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        orders.map_batches(tag_orders, batch_format="pyarrow", zero_copy_batch=True)
    )

    def anti_bucket(group: pa.Table) -> pa.Table:
        t = group.combine_chunks()
        key = t["key"].to_numpy(zero_copy_only=False)
        probe = t["is_probe"].to_numpy(zero_copy_only=False) == 1
        keep = ~probe & ~np.isin(key, key[probe])
        out = t.filter(pa.array(keep))
        return pa.table({"c_custkey": out["key"], "c_name": out["c_name"]})

    return tagged.groupby("_b").map_groups(
        lambda g: anti_bucket(g.drop_columns(["_b"])), batch_format="pyarrow"
    )


INTERVAL_WIDTH_US = 7 * 86_400_000_000  # orders attract events for 7 days


def interval_join_events_orders(
    sf_dir: str, num_buckets: int | None = None
) -> ray.data.Dataset:
    """INTERVAL (range) JOIN, aggregated: for every order, the number of
    the customer's events with ts in [o_orderdate, o_orderdate + 7d) —
    an operator Ray Data lacks, composed from the asof-join machinery.

    Physical shape: events and per-order interval BOUNDARIES (start with
    weight -1, end with weight +1) bucket by hash(user_id) — the shared
    partitioning key again — and one vectorized pass per bucket sorts
    (user, time, boundary-before-event) and takes the running event
    count at each boundary: count(order) = c[end] - c[start]. The
    interval join never materializes a pair list; cost is sort + cumsum,
    independent of match multiplicity. Boundary priority encodes the
    half-open interval exactly: at t_start the boundary precedes events
    (inclusive), at t_end it also precedes them (exclusive)."""
    from pandas.util import hash_array

    from ..pipeline import default_num_buckets

    if num_buckets is None:
        num_buckets = default_num_buckets()
    ensure_serializable()

    events = _read(sf_dir, "events", columns=["user_id", "ts"])
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def tag_events(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        n = len(uid)
        return pa.table(
            {
                "_b": pa.array((hash_array(uid) % num_buckets).astype(np.int32)),
                "user_id": batch["user_id"],
                "t_us": pc.cast(batch["ts"], pa.int64()),
                "is_event": pa.array(np.ones(n, dtype=np.int8)),
                "order_key": pa.array(np.zeros(n, dtype=np.int64)),
                "sign": pa.array(np.zeros(n, dtype=np.int8)),
            }
        )

    def tag_order_bounds(batch: pa.Table) -> pa.Table:
        uid = batch["o_custkey"].to_numpy(zero_copy_only=False)
        start = (
            pc.cast(pc.cast(batch["o_orderdate"], pa.timestamp("us")), pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        okey = batch["o_orderkey"].to_numpy(zero_copy_only=False)
        n = len(uid)
        uid2 = np.concatenate([uid, uid])
        t2 = np.concatenate([start, start + INTERVAL_WIDTH_US])
        okey2 = np.concatenate([okey, okey])
        sign2 = np.concatenate(
            [np.full(n, -1, dtype=np.int8), np.ones(n, dtype=np.int8)]
        )
        return pa.table(
            {
                "_b": pa.array((hash_array(uid2) % num_buckets).astype(np.int32)),
                "user_id": pa.array(uid2),
                "t_us": pa.array(t2),
                "is_event": pa.array(np.zeros(2 * n, dtype=np.int8)),
                "order_key": pa.array(okey2),
                "sign": pa.array(sign2),
            }
        )

    tagged = events.map_batches(
        tag_events, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        orders.map_batches(tag_order_bounds, batch_format="pyarrow", zero_copy_batch=True)
    )

    def count_bucket(group: pa.Table) -> pa.Table:
        t = group.combine_chunks()
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        tus = t["t_us"].to_numpy(zero_copy_only=False)
        is_event = t["is_event"].to_numpy(zero_copy_only=False)
        okey = t["order_key"].to_numpy(zero_copy_only=False)
        sign = t["sign"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(uid) == 0:
            return pa.table(
                {
                    "o_orderkey": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                }
            )
        # boundaries (is_event=0) sort before events at equal (uid, t):
        # start inclusive, end exclusive — both want boundary-first.
        order = np.lexsort((is_event, tus, uid))
        uid, tus, is_event = uid[order], tus[order], is_event[order]
        okey, sign = okey[order], sign[order]
        c_excl = np.cumsum(is_event, dtype=np.int64) - is_event
        b = is_event == 0
        contrib = pa.table(
            {
                "o_orderkey": pa.array(okey[b]),
                "user_id": pa.array(uid[b]),
                "part": pa.array(sign[b] * c_excl[b]),
            }
        )
        agg = contrib.group_by(["o_orderkey", "user_id"]).aggregate(
            [("part", "sum")]
        )
        return pa.table(
            {
                "o_orderkey": agg["o_orderkey"],
                "user_id": agg["user_id"],
                "n_events": pc.cast(agg["part_sum"], pa.int64()),
            }
        )

    return tagged.groupby("_b").map_groups(
        lambda g: count_bucket(g.drop_columns(["_b"])), batch_format="pyarrow"
    )


Q3_CUTOFF = np.datetime64("1998-06-01", "us")


def q3_shipping_priority(
    sf_dir: str, num_buckets: int | None = None, k: int = 10
) -> ray.data.Dataset:
    """TPC-H-Q3-shaped three-table join: top-k unshipped BUILDING-segment
    orders by revenue — the canonical big-big join benchmark.

    Join strategy by side size: customer (small) BROADCASTS its
    BUILDING custkeys (``ray.put`` once, read in every orders batch —
    a semi-join filter, not a shuffle); lineitem (largest) pre-aggregates
    revenue per orderkey per batch so the shuffle carries one
    (orderkey, revenue_e4) row per batch instead of line items; then
    orders and the revenue partials co-locate by hash(orderkey) — the
    single shared partitioning key — and each bucket joins with one
    searchsorted. Revenue is exact int64 e4 fixed point (cents x
    (100 - disc_pct)); the final top-k is a sort over at most
    (qualifying orders) aggregated rows."""
    from ..pipeline import default_num_buckets

    if num_buckets is None:
        num_buckets = default_num_buckets()
    ensure_serializable()
    import pyarrow.parquet as pq

    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_mktsegment"],
    )
    keys = np.sort(
        cust.filter(pc.equal(cust["c_mktsegment"], "BUILDING"))["c_custkey"]
        .to_numpy(zero_copy_only=False)
    )
    keys_ref = ray.put(keys)

    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
        filter=(pc.field("o_orderdate") < pa.scalar(Q3_CUTOFF)),
    )
    lineitem = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=(pc.field("l_shipdate") > pa.scalar(Q3_CUTOFF)),
    )

    class TagOrders:
        def __init__(self, ref):
            self._keys = ray.get(ref)  # sorted BUILDING custkeys

        def __call__(self, batch: pa.Table) -> pa.Table:
            ckey = batch["o_custkey"].to_numpy(zero_copy_only=False)
            if len(self._keys) == 0:
                hit = np.zeros(len(ckey), dtype=bool)
            else:
                pos = np.clip(
                    np.searchsorted(self._keys, ckey), 0, len(self._keys) - 1
                )
                hit = self._keys[pos] == ckey
            t = batch.filter(pa.array(hit))
            okey = t["o_orderkey"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "_b": pa.array((okey % num_buckets).astype(np.int32)),
                    "okey": pa.array(okey.astype(np.int64)),
                    "odate_us": pc.cast(t["o_orderdate"], pa.int64()),
                    "prio": t["o_orderpriority"],
                    "rev_e4": pa.array(np.zeros(len(okey), dtype=np.int64)),
                    "is_order": pa.array(np.ones(len(okey), dtype=np.int8)),
                }
            )

    def revenue_partial(batch: pa.Table) -> pa.Table:
        cents = _fixed_point(batch["l_extendedprice"], 100)
        disc_pct = _fixed_point(batch["l_discount"], 100)
        rev = pc.multiply(cents, pc.subtract(pa.scalar(100), disc_pct))
        agg = (
            pa.table({"okey": batch["l_orderkey"], "rev_e4": rev})
            .group_by(["okey"])
            .aggregate([("rev_e4", "sum")])
        )
        okey = agg["okey"].to_numpy(zero_copy_only=False)
        n = len(okey)
        return pa.table(
            {
                "_b": pa.array((okey % num_buckets).astype(np.int32)),
                "okey": pa.array(okey.astype(np.int64)),
                "odate_us": pa.array(np.zeros(n, dtype=np.int64)),
                "prio": pa.array([""] * n, pa.string()),
                "rev_e4": agg["rev_e4_sum"],
                "is_order": pa.array(np.zeros(n, dtype=np.int8)),
            }
        )

    tagged = orders.map_batches(
        TagOrders,
        fn_constructor_args=(keys_ref,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=pool_size(),
        num_cpus=1,
    ).union(
        lineitem.map_batches(
            revenue_partial, batch_format="pyarrow", zero_copy_batch=True
        )
    )

    def join_bucket(group: pa.Table) -> pa.Table:
        t = group.combine_chunks()
        is_order = t["is_order"].to_numpy(zero_copy_only=False) == 1
        okey = t["okey"].to_numpy(zero_copy_only=False)
        rev = t["rev_e4"].to_numpy(zero_copy_only=False)
        o_keys, r_keys = okey[is_order], okey[~is_order]
        if len(o_keys) == 0 or len(r_keys) == 0:
            return pa.table(
                {
                    "o_orderkey": pa.array([], pa.int64()),
                    "revenue_e4": pa.array([], pa.int64()),
                    "o_orderdate_us": pa.array([], pa.int64()),
                    "o_orderpriority": pa.array([], pa.string()),
                }
            )
        order_sort = np.argsort(o_keys)
        o_sorted = o_keys[order_sort]
        # merge the lineitem revenue partials per orderkey, then probe
        ru, inv = np.unique(r_keys, return_inverse=True)
        rsum = np.zeros(len(ru), dtype=np.int64)
        np.add.at(rsum, inv, rev[~is_order])
        pos = np.searchsorted(o_sorted, ru)
        pos_c = np.clip(pos, 0, len(o_sorted) - 1)
        hit = o_sorted[pos_c] == ru
        sel = order_sort[pos_c[hit]]
        odate = t["odate_us"].to_numpy(zero_copy_only=False)[is_order][sel]
        prio = t["prio"].to_numpy(zero_copy_only=False)[is_order][sel]
        return pa.table(
            {
                "o_orderkey": pa.array(ru[hit]),
                "revenue_e4": pa.array(rsum[hit]),
                "o_orderdate_us": pa.array(odate),
                "o_orderpriority": pa.array(prio, pa.string()),
            }
        )

    joined = tagged.groupby("_b").map_groups(
        lambda g: join_bucket(g.drop_columns(["_b"])), batch_format="pyarrow"
    )
    return joined.sort(
        ["revenue_e4", "o_orderkey"], descending=[True, False]
    ).limit(k)


SLIDE_US = 900_000_000          # 15-min slide
SLIDES_PER_WINDOW = 4           # 1h window = 4 slides exactly


def sliding_window_events(sf_dir: str) -> ray.data.Dataset:
    """SLIDING 1h window, 15-min slide, over the events stream (completes
    the §2.10 streaming-analog family: tumbling / session / sliding).

    Because the window width is an exact multiple of the slide, an event
    at t belongs to precisely the windows floor(t/slide) - k for
    k in 0..3 — so the operator is a 4x in-batch expansion (vectorized
    concat, no per-row work) followed by the same partial-aggregate +
    tiny-groupby shape as the tumbling window. Nothing streams state
    across batches; the shuffle moves one row per (window, batch)."""
    ds = _read(sf_dir, "events", columns=["ts", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        ts_us = pc.cast(batch["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        w0 = ts_us // SLIDE_US
        v = _fixed_point(batch["value"], 1_000_000).to_numpy(zero_copy_only=False)
        ks = np.arange(SLIDES_PER_WINDOW, dtype=np.int64)
        windows = (w0[:, None] - ks[None, :]).ravel() * 900
        vals = np.repeat(v, SLIDES_PER_WINDOW)
        t = pa.table(
            {
                "window_start_s": pa.array(windows),
                "v_micro": pa.array(vals),
            }
        )
        return t.group_by(["window_start_s"]).aggregate(
            [("v_micro", "count"), ("v_micro", "sum")]
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return partials.groupby("window_start_s").aggregate(
        Sum("v_micro_count", alias_name="n_events"),
        Sum("v_micro_sum", alias_name="sum_value_micro"),
    )


def _per_user_ordered(sf_dir: str, num_buckets: int | None, finalize, sort_keys=None):
    """Shared machinery for per-user ordered window functions (running
    totals, lag, ranks): bucket events by hash(user_id) — the engine's
    one partitioning key for the events stream — and hand each bucket,
    sorted by ``sort_keys`` (default (user_id, ts, event_id)), to a
    vectorized ``finalize`` along with its per-user run starts. One
    shuffle, no per-row or per-user Python."""
    from pandas.util import hash_array

    from ..pipeline import default_num_buckets

    if num_buckets is None:
        num_buckets = default_num_buckets()
    if sort_keys is None:
        sort_keys = [
            ("user_id", "ascending"), ("ts", "ascending"), ("event_id", "ascending")
        ]
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])

    def add_bucket(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        bucket = (hash_array(uid) % num_buckets).astype(np.int32)
        return batch.append_column("_ub", pa.array(bucket))

    def run(group: pa.Table) -> pa.Table:
        t = group.sort_by(list(sort_keys)).combine_chunks()
        n = t.num_rows
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        new_user = np.empty(n, dtype=bool)
        if n:
            new_user[0] = True
            new_user[1:] = uid[1:] != uid[:-1]
        starts = np.flatnonzero(new_user)
        return finalize(t, starts, n)

    bucketed = ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
    return bucketed.groupby("_ub").map_groups(
        lambda g: run(g.drop_columns(["_ub"])), batch_format="pyarrow"
    )


def running_total_events(
    sf_dir: str, num_buckets: int | None = None
) -> ray.data.Dataset:
    """Per-user RUNNING TOTALS ordered by time (the cumulative window
    function: SUM ... OVER (PARTITION BY user ORDER BY ts ROWS UNBOUNDED
    PRECEDING)): each event carries its 1-based position and the exact
    int64 cumulative value so far. Global cumsum minus the per-user-run
    base makes the reset free — the same trick as sessionization."""

    def finalize(t: pa.Table, starts: np.ndarray, n: int) -> pa.Table:
        if n == 0:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "cum_n": pa.array([], pa.int64()),
                    "cum_value_micro": pa.array([], pa.int64()),
                }
            )
        sizes = np.diff(np.append(starts, n))
        v = _fixed_point(t.column("value"), 1_000_000).combine_chunks()
        v = v.to_numpy(zero_copy_only=False)
        cum = np.cumsum(v)
        base = np.repeat(cum[starts] - v[starts], sizes)
        pos = np.arange(n) - np.repeat(starts, sizes) + 1
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "cum_n": pa.array(pos.astype(np.int64)),
                "cum_value_micro": pa.array(cum - base),
            }
        )

    return _per_user_ordered(sf_dir, num_buckets, finalize)


def event_gaps(sf_dir: str, num_buckets: int | None = None) -> ray.data.Dataset:
    """Per-user LAG: microseconds since the user's previous event (null
    for each user's first event) — the gap feature sessionization
    thresholds on, exposed as its own operator."""

    def finalize(t: pa.Table, starts: np.ndarray, n: int) -> pa.Table:
        if n == 0:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "gap_us": pa.array([], pa.int64()),
                }
            )
        ts = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        gap = np.empty(n, dtype=np.int64)
        gap[0] = 0
        gap[1:] = ts[1:] - ts[:-1]
        first = np.zeros(n, dtype=bool)
        first[starts] = True
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "gap_us": pc.if_else(
                    pa.array(first), pa.scalar(None, pa.int64()), pa.array(gap)
                ),
            }
        )

    return _per_user_ordered(sf_dir, num_buckets, finalize)


def top_event_per_user(sf_dir: str) -> ray.data.Dataset:
    """Per-user argmax by value (SURVEY A5's greedy-argmax as a grouped
    operator): per-batch partial argmax, then a tiny per-user reduce.
    Tie-break: lowest event_id (deterministic, matches the SQL oracle)."""
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "value"])

    def partial_argmax(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        val = batch["value"].to_numpy(zero_copy_only=False)
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, -val, uid))  # by user, value desc, event asc
        u_sorted = uid[order]
        first = np.empty(len(order), dtype=bool)
        if len(order):
            first[0] = True
            first[1:] = u_sorted[1:] != u_sorted[:-1]
        return batch.take(pa.array(order[first]))

    partials = ds.map_batches(
        partial_argmax, batch_format="pyarrow", zero_copy_batch=True
    )

    def final_argmax(group: pa.Table) -> pa.Table:
        return partial_argmax(group)

    return partials.groupby("user_id").map_groups(
        final_argmax, batch_format="pyarrow"
    )


HOUR_US = 3_600_000_000
HIST_BIN_CENTI = 2_500          # 25.00-unit value bins


def grouped_stats_events(sf_dir: str) -> ray.data.Dataset:
    """Per-event-type sufficient statistics for mean / variance /
    correlation between value and hour-of-day — the distributed-stats
    primitive (count, Σx, Σx², Σy, Σy², Σxy) every downstream moment
    derives from without a second pass.

    Exact-aggregate discipline: value is quantized to int64 centi units
    PER ELEMENT (see ``_fixed_point``), hour-of-day is already integral,
    so every sum and cross-moment is an int64 sum of int64 products —
    exact in any accumulation order on any number of workers. Combine
    shape: per-batch ``group_by(event_type)`` partials, then a global
    groupby over ~|event types| rows per batch. int64 headroom: centi ≤
    ~5e4 → x² ≤ 2.5e9/row → overflows int64 only past ~3.7e9 rows per
    event type; at larger scale drop to e1 units (documented contract).

    Analog of the reference's per-stage count/total/min/max bench rollup
    (/root/reference/crates/cli/src/bench.rs:139-172) widened to second
    moments."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        x = _fixed_point(batch["value"], 100).to_numpy(zero_copy_only=False)
        ts_us = pc.cast(batch["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        y = (ts_us // HOUR_US) % 24
        t = pa.table(
            {
                "event_type": batch["event_type"],
                "x": pa.array(x),
                "xx": pa.array(x * x),
                "y": pa.array(y),
                "yy": pa.array(y * y),
                "xy": pa.array(x * y),
            }
        )
        return t.group_by(["event_type"]).aggregate(
            [
                ("x", "count"), ("x", "sum"), ("xx", "sum"),
                ("y", "sum"), ("yy", "sum"), ("xy", "sum"),
            ]
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return partials.groupby("event_type").aggregate(
        Sum("x_count", alias_name="n"),
        Sum("x_sum", alias_name="sum_x_centi"),
        Sum("xx_sum", alias_name="sum_xx_centi2"),
        Sum("y_sum", alias_name="sum_y_hour"),
        Sum("yy_sum", alias_name="sum_yy_hour2"),
        Sum("xy_sum", alias_name="sum_xy"),
    )


def histogram_events(sf_dir: str) -> ray.data.Dataset:
    """Fixed-width value histogram over the events stream: bin =
    floor(value_centi / 2500) (25-unit bins). The classic
    distribution-sketch primitive; per-batch bincount partials mean the
    shuffle carries one row per (bin, batch) — a few dozen rows — no
    matter how many events stream through.

    floor semantics match the oracle exactly: numpy ``//`` floors, and
    the SQL uses CAST(floor(x / 2500.0) AS BIGINT) (DuckDB's integer
    ``//`` truncates toward zero, which diverges on negatives)."""
    ds = _read(sf_dir, "events", columns=["value"])

    def partial(batch: pa.Table) -> pa.Table:
        centi = _fixed_point(batch["value"], 100).to_numpy(zero_copy_only=False)
        bins = centi // HIST_BIN_CENTI
        u, c = np.unique(bins, return_counts=True)
        return pa.table(
            {"bin": pa.array(u), "n": pa.array(c.astype(np.int64))}
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    agg = partials.groupby("bin").aggregate(Sum("n", alias_name="n_events"))

    def finalize(batch: pa.Table) -> pa.Table:
        b = batch["bin"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bin": batch["bin"],
                "lo_centi": pa.array(b * HIST_BIN_CENTI),
                "hi_centi": pa.array((b + 1) * HIST_BIN_CENTI),
                "n_events": batch["n_events"],
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)


Q5_LO = np.datetime64("1996-01-01", "us")
Q5_HI = np.datetime64("1997-01-01", "us")


def q5_region_revenue(
    sf_dir: str, region: str = "ASIA", num_buckets: int | None = None
) -> ray.data.Dataset:
    """TPC-H-Q5-shaped six-table join: revenue per nation for orders
    whose customer AND line-item supplier sit in the same nation of one
    region, within a one-year order-date window.

    Join strategy by side size (the engine's standing rule): region,
    nation, customer and supplier are DIMENSIONS — region/nation resolve
    driver-side (a handful of rows); customer→nation and supplier→nation
    become two sorted int64 lookup arrays broadcast once via ``ray.put``
    and probed with searchsorted inside every batch (no shuffle). The
    two FACT tables co-locate on the single shared partitioning key
    hash(orderkey): orders ships (okey, cust_nation) for region hits
    only, lineitem pre-aggregates revenue_e4 per (okey, supp_nation) per
    batch, and each bucket joins with one searchsorted, keeps
    cust_nation == supp_nation rows, and emits per-nation partials. The
    final groupby moves ~|nations| rows per bucket. Revenue is exact
    int64 e4 fixed point (cents × (100 − disc_pct)), same as q3."""
    from ..pipeline import default_num_buckets

    if num_buckets is None:
        num_buckets = default_num_buckets()
    ensure_serializable()
    import pyarrow.parquet as pq

    nation = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name", "n_regionkey"],
    )
    reg = pq.read_table(
        os.path.join(sf_dir, "region.parquet"),
        columns=["r_regionkey", "r_name"],
    )
    rkeys = reg.filter(pc.equal(reg["r_name"], region))["r_regionkey"]
    nat = nation.filter(pc.is_in(nation["n_regionkey"], value_set=rkeys))
    nat_keys = nat["n_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    nat_names = nat["n_name"].to_pylist()

    def _sorted_lookup(table: str, key: str, val: str) -> tuple:
        t = pq.read_table(os.path.join(sf_dir, f"{table}.parquet"),
                          columns=[key, val])
        t = t.filter(pc.is_in(pc.cast(t[val], pa.int64()),
                              value_set=pa.array(nat_keys)))
        k = t[key].to_numpy(zero_copy_only=False).astype(np.int64)
        v = t[val].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(k)
        return k[order], v[order]

    cust_ref = ray.put(_sorted_lookup("customer", "c_custkey", "c_nationkey"))
    supp_ref = ray.put(_sorted_lookup("supplier", "s_suppkey", "s_nationkey"))

    def _probe(keys_sorted, vals, probe):
        """searchsorted hit-test: returns (hit mask, value per hit)."""
        if len(keys_sorted) == 0:
            return np.zeros(len(probe), dtype=bool), np.array([], np.int64)
        pos = np.clip(np.searchsorted(keys_sorted, probe), 0, len(keys_sorted) - 1)
        hit = keys_sorted[pos] == probe
        return hit, vals[pos[hit]]

    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(
            (pc.field("o_orderdate") >= pa.scalar(Q5_LO))
            & (pc.field("o_orderdate") < pa.scalar(Q5_HI))
        ),
    )
    lineitem = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    class TagOrders:
        def __init__(self, ref):
            self._keys, self._nat = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ckey = batch["o_custkey"].to_numpy(zero_copy_only=False)
            hit, cnat = _probe(self._keys, self._nat, ckey)
            okey = batch["o_orderkey"].to_numpy(zero_copy_only=False)[hit]
            n = len(okey)
            return pa.table(
                {
                    "_b": pa.array((okey % num_buckets).astype(np.int32)),
                    "okey": pa.array(okey.astype(np.int64)),
                    "nat": pa.array(cnat),
                    "rev_e4": pa.array(np.zeros(n, dtype=np.int64)),
                    "is_order": pa.array(np.ones(n, dtype=np.int8)),
                }
            )

    class TagLineitem:
        def __init__(self, ref):
            self._keys, self._nat = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            skey = batch["l_suppkey"].to_numpy(zero_copy_only=False)
            hit, snat = _probe(self._keys, self._nat, skey)
            t = batch.filter(pa.array(hit))
            cents = _fixed_point(t["l_extendedprice"], 100)
            disc_pct = _fixed_point(t["l_discount"], 100)
            rev = pc.multiply(cents, pc.subtract(pa.scalar(100), disc_pct))
            agg = (
                pa.table(
                    {
                        "okey": t["l_orderkey"],
                        "nat": pa.array(snat),
                        "rev_e4": rev,
                    }
                )
                .group_by(["okey", "nat"])
                .aggregate([("rev_e4", "sum")])
            )
            okey = agg["okey"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "_b": pa.array((okey % num_buckets).astype(np.int32)),
                    "okey": pa.array(okey.astype(np.int64)),
                    "nat": agg["nat"],
                    "rev_e4": agg["rev_e4_sum"],
                    "is_order": pa.array(np.zeros(len(okey), dtype=np.int8)),
                }
            )

    tagged = orders.map_batches(
        TagOrders,
        fn_constructor_args=(cust_ref,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=pool_size(),
        num_cpus=1,
    ).union(
        lineitem.map_batches(
            TagLineitem,
            fn_constructor_args=(supp_ref,),
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=pool_size(),
            num_cpus=1,
        )
    )

    def join_bucket(group: pa.Table) -> pa.Table:
        t = group.combine_chunks()
        is_order = t["is_order"].to_numpy(zero_copy_only=False) == 1
        okey = t["okey"].to_numpy(zero_copy_only=False)
        nat_col = t["nat"].to_numpy(zero_copy_only=False)
        rev = t["rev_e4"].to_numpy(zero_copy_only=False)
        o_keys, o_nat = okey[is_order], nat_col[is_order]
        if len(o_keys) == 0 or not (~is_order).any():
            return pa.table(
                {
                    "nat": pa.array([], pa.int64()),
                    "rev_e4": pa.array([], pa.int64()),
                }
            )
        order_sort = np.argsort(o_keys)
        o_sorted = o_keys[order_sort]
        l_keys, l_nat, l_rev = okey[~is_order], nat_col[~is_order], rev[~is_order]
        pos = np.clip(np.searchsorted(o_sorted, l_keys), 0, len(o_sorted) - 1)
        hit = o_sorted[pos] == l_keys
        cust_nat = o_nat[order_sort[pos[hit]]]
        same = cust_nat == l_nat[hit]
        nat_hit = l_nat[hit][same]
        rev_hit = l_rev[hit][same]
        u, inv = np.unique(nat_hit, return_inverse=True)
        sums = np.zeros(len(u), dtype=np.int64)
        np.add.at(sums, inv, rev_hit)
        return pa.table({"nat": pa.array(u), "rev_e4": pa.array(sums)})

    joined = tagged.groupby("_b").map_groups(
        lambda g: join_bucket(g.drop_columns(["_b"])), batch_format="pyarrow"
    )
    agg = joined.groupby("nat").aggregate(Sum("rev_e4", alias_name="revenue_e4"))

    name_by_key = dict(zip(nat_keys.tolist(), nat_names))

    def finalize(batch: pa.Table) -> pa.Table:
        keys = batch["nat"].to_pylist()
        return pa.table(
            {
                "n_name": pa.array(
                    [name_by_key[k] for k in keys], pa.string()
                ),
                "revenue_e4": batch["revenue_e4"],
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)


Q14_LO = np.datetime64("1996-01-01", "us")
Q14_HI = np.datetime64("1996-02-01", "us")


def q14_promo_revenue(sf_dir: str) -> ray.data.Dataset:
    """TPC-H-Q14-shaped promo-revenue share: of one month's lineitem
    revenue, how much came from PROMO-type parts. First consumer of the
    part table.

    Join strategy: part is the small side — its PROMO partkeys broadcast
    once as a sorted int64 array (``ray.put`` + searchsorted per batch, a
    semi-join flag with no shuffle); lineitem is pruned at the read
    (columns + shipdate row filter) and pre-aggregates a TWO-number
    partial (promo_e4, total_e4) per batch, so the "shuffle" is a
    single-group sum of batch partials. The share is an exact integer
    permille (numerator*1000 // denominator) — no float anywhere."""
    ensure_serializable()
    import pyarrow.parquet as pq

    part = pq.read_table(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_type"]
    )
    promo = np.sort(
        part.filter(pc.equal(part["p_type"], "PROMO"))["p_partkey"]
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    promo_ref = ray.put(promo)

    lineitem = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=(
            (pc.field("l_shipdate") >= pa.scalar(Q14_LO))
            & (pc.field("l_shipdate") < pa.scalar(Q14_HI))
        ),
    )

    class Partial:
        def __init__(self, ref):
            self._promo = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            cents = _fixed_point(batch["l_extendedprice"], 100)
            disc_pct = _fixed_point(batch["l_discount"], 100)
            rev = pc.multiply(
                cents, pc.subtract(pa.scalar(100), disc_pct)
            ).to_numpy(zero_copy_only=False)
            pkey = batch["l_partkey"].to_numpy(zero_copy_only=False)
            if len(self._promo):
                pos = np.clip(
                    np.searchsorted(self._promo, pkey), 0, len(self._promo) - 1
                )
                is_promo = self._promo[pos] == pkey
            else:
                is_promo = np.zeros(len(pkey), dtype=bool)
            return pa.table(
                {
                    "promo_e4": pa.array([int(rev[is_promo].sum())]),
                    "total_e4": pa.array([int(rev.sum())]),
                }
            )

    partials = lineitem.map_batches(
        Partial,
        fn_constructor_args=(promo_ref,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=pool_size(),
        num_cpus=1,
    )
    agg = partials.sum(["promo_e4", "total_e4"])

    import ray.data as rd

    promo_e4 = int(agg["sum(promo_e4)"])
    total_e4 = int(agg["sum(total_e4)"])
    return rd.from_arrow(
        pa.table(
            {
                "promo_revenue_e4": pa.array([promo_e4], pa.int64()),
                "total_revenue_e4": pa.array([total_e4], pa.int64()),
                "promo_permille": pa.array(
                    [promo_e4 * 1000 // max(total_e4, 1)], pa.int64()
                ),
            }
        )
    )


PROPS_K_RE = r'"k":\s*(-?\d+)'


def parse_event_props(sf_dir: str) -> ray.data.Dataset:
    """Semi-structured field extraction: pull the integer ``k`` out of the
    events table's JSON ``props`` column — the log-pipeline staple of
    parsing a JSON payload column without a Python json.loads per row.

    ``pc.extract_regex`` runs the RE2 capture over the whole batch in C;
    rows whose props lack a parsable k yield null (never an error).
    Embarrassingly parallel, no shuffle."""
    ds = _read(sf_dir, "events", columns=["event_id", "event_type", "props"])

    def parse(batch: pa.Table) -> pa.Table:
        m = pc.extract_regex(
            pc.fill_null(batch["props"], ""), PROPS_K_RE.replace("(-?", "(?P<k>-?", 1)
        )
        k = pc.cast(pc.struct_field(m, "k"), pa.int64())
        return pa.table(
            {
                "event_id": batch["event_id"],
                "event_type": batch["event_type"],
                "k": k,
            }
        )

    return ds.map_batches(parse, batch_format="pyarrow", zero_copy_batch=True)


Q4_LO = np.datetime64("1996-07-01", "us")
Q4_HI = np.datetime64("1996-10-01", "us")
Q4_LATE_US = 30 * 86_400_000_000  # "late" = shipped >30 days after order


def q4_order_priority(sf_dir: str, num_buckets: int | None = None) -> ray.data.Dataset:
    """TPC-H-Q4-shaped EXISTS semi-join: per order priority, how many
    orders placed in 1996Q3 have at least one lineitem shipped more than
    30 days after the order date.

    EXISTS collapses to a max-reduction — ``EXISTS(l_shipdate > d)`` ⟺
    ``max(l_shipdate) > d`` — so the lineitem side never ships rows:
    each batch pre-reduces to one (orderkey, max_shipdate) row (combiner
    discipline), both sides hash-bucket on orderkey (the shared
    partitioning key of the whole Q-family), and each bucket re-reduces
    the max per orderkey with one sort + ``np.maximum.reduceat``, then
    emits per-priority partial counts. Final shuffle: ~|priorities|
    rows per bucket. Analog of the reference's request-dispatch
    fan-in counting (SURVEY J*/A1 family)."""
    from ..pipeline import default_num_buckets

    if num_buckets is None:
        num_buckets = default_num_buckets()
    ensure_serializable()

    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
        filter=(
            (pc.field("o_orderdate") >= Q4_LO) & (pc.field("o_orderdate") < Q4_HI)
        ),
    )
    lineitem = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])

    def tag_orders(batch: pa.Table) -> pa.Table:
        key = batch["o_orderkey"].to_numpy(zero_copy_only=False)
        od = pc.cast(batch["o_orderdate"], pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "_b": pa.array((key % num_buckets).astype(np.int32)),
                "key": pa.array(key.astype(np.int64)),
                "t_us": pa.array(od + Q4_LATE_US),
                "priority": batch["o_orderpriority"],
                "is_probe": pa.array(np.zeros(len(key), dtype=np.int8)),
            }
        )

    def tag_lineitem(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "key": batch["l_orderkey"],
                "ship_us": pc.cast(batch["l_shipdate"], pa.int64()),
            }
        ).group_by(["key"]).aggregate([("ship_us", "max")])
        key = t["key"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "_b": pa.array((key % num_buckets).astype(np.int32)),
                "key": pa.array(key.astype(np.int64)),
                "t_us": t["ship_us_max"],
                "priority": pa.array([""] * len(key), pa.string()),
                "is_probe": pa.array(np.ones(len(key), dtype=np.int8)),
            }
        )

    tagged = orders.map_batches(
        tag_orders, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        lineitem.map_batches(tag_lineitem, batch_format="pyarrow", zero_copy_batch=True)
    )

    def semi_bucket(group: pa.Table) -> pa.Table:
        t = group.combine_chunks()
        key = t["key"].to_numpy(zero_copy_only=False)
        tus = t["t_us"].to_numpy(zero_copy_only=False)
        probe = t["is_probe"].to_numpy(zero_copy_only=False) == 1
        pk, pt = key[probe], tus[probe]
        if pk.size:
            order = np.argsort(pk, kind="stable")
            pk, pt = pk[order], pt[order]
            starts = np.flatnonzero(np.r_[True, pk[1:] != pk[:-1]])
            uk = pk[starts]
            umax = np.maximum.reduceat(pt, starts)
        else:
            uk = np.empty(0, dtype=np.int64)
            umax = np.empty(0, dtype=np.int64)
        ok, odeadline = key[~probe], tus[~probe]
        pos = np.searchsorted(uk, ok)
        pos_ok = pos < uk.size
        hit = np.zeros(ok.size, dtype=bool)
        hit[pos_ok] = (uk[pos[pos_ok]] == ok[pos_ok]) & (
            umax[pos[pos_ok]] > odeadline[pos_ok]
        )
        pr = t.filter(pa.array(~probe))["priority"].filter(pa.array(hit))
        u = pa.table({"o_orderpriority": pr}).group_by(
            ["o_orderpriority"]
        ).aggregate([([], "count_all")])
        return u.rename_columns(["o_orderpriority", "n"])

    partials = tagged.groupby("_b").map_groups(
        lambda g: semi_bucket(g.drop_columns(["_b"])), batch_format="pyarrow"
    )
    return partials.groupby("o_orderpriority").aggregate(
        Sum("n", alias_name="order_count")
    )


def q13_customer_distribution(
    sf_dir: str, num_buckets: int | None = None
) -> ray.data.Dataset:
    """TPC-H-Q13-shaped LEFT OUTER JOIN distribution: for every customer,
    their count of non-urgent orders (zero included — the LEFT-ness),
    then the distribution custdist(c_count) = how many customers share
    each order count.

    Physical shape: the orders side pre-reduces to per-batch (custkey,
    partial count) — never rows; customers ship one key each; both
    bucket on hash(custkey); each bucket sums counts per custkey,
    fills absent customers with zero via one ``np.searchsorted`` probe,
    and bincounts the per-customer totals, so the final shuffle carries
    one (c_count, partial custdist) row per distinct count per bucket."""
    from ..pipeline import default_num_buckets

    if num_buckets is None:
        num_buckets = default_num_buckets()
    ensure_serializable()

    cust = _read(sf_dir, "customer", columns=["c_custkey"])
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey"],
        filter=(pc.field("o_orderpriority") != "1-URGENT"),
    )

    def tag_cust(batch: pa.Table) -> pa.Table:
        key = batch["c_custkey"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "_b": pa.array((key % num_buckets).astype(np.int32)),
                "key": pa.array(key.astype(np.int64)),
                "n": pa.array(np.zeros(len(key), dtype=np.int64)),
                "is_cust": pa.array(np.ones(len(key), dtype=np.int8)),
            }
        )

    def tag_orders(batch: pa.Table) -> pa.Table:
        t = pa.table({"key": batch["o_custkey"]}).group_by(["key"]).aggregate(
            [([], "count_all")]
        )
        key = t["key"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "_b": pa.array((key % num_buckets).astype(np.int32)),
                "key": pa.array(key.astype(np.int64)),
                "n": t.column(1).cast(pa.int64()),
                "is_cust": pa.array(np.zeros(len(key), dtype=np.int8)),
            }
        )

    tagged = cust.map_batches(
        tag_cust, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        orders.map_batches(tag_orders, batch_format="pyarrow", zero_copy_batch=True)
    )

    def dist_bucket(group: pa.Table) -> pa.Table:
        t = group.combine_chunks()
        key = t["key"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False)
        is_cust = t["is_cust"].to_numpy(zero_copy_only=False) == 1
        ck = np.unique(key[is_cust])
        ok, on = key[~is_cust], n[~is_cust]
        order = np.argsort(ok, kind="stable")
        ok, on = ok[order], on[order]
        starts = np.flatnonzero(np.r_[True, ok[1:] != ok[:-1]]) if ok.size else np.empty(0, dtype=np.int64)
        uk = ok[starts] if ok.size else ok
        totals = np.add.reduceat(on, starts) if ok.size else on
        counts = np.zeros(ck.size, dtype=np.int64)
        pos = np.searchsorted(uk, ck)
        pos_ok = pos < uk.size
        match = np.zeros(ck.size, dtype=bool)
        match[pos_ok] = uk[pos[pos_ok]] == ck[pos_ok]
        counts[match] = totals[pos[match]]
        u, c = np.unique(counts, return_counts=True)
        return pa.table(
            {"c_count": pa.array(u), "custdist": pa.array(c.astype(np.int64))}
        )

    partials = tagged.groupby("_b").map_groups(
        lambda g: dist_bucket(g.drop_columns(["_b"])), batch_format="pyarrow"
    )
    return partials.groupby("c_count").aggregate(Sum("custdist", alias_name="custdist"))


DAY_US = 86_400_000_000
EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def pivot_events_by_day(sf_dir: str) -> ray.data.Dataset:
    """PIVOT: events long → wide, one row per day with one count column
    per event type plus the row total — the conditional-aggregation
    pivot every reporting pipeline ends with. The type set is a fixed
    schema contract (pivot output columns cannot be data-dependent in a
    streaming engine); unknown types would surface as a row-total
    mismatch rather than silently dropping.

    Per-batch partials: one boolean mask cast to int64 per type, summed
    by day with Arrow ``group_by`` — the shuffle carries |days|×7 ints
    per batch regardless of event volume. No per-row Python."""
    ds = _read(sf_dir, "events", columns=["ts", "event_type"])
    ensure_serializable()

    def partial(batch: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(batch["ts"], pa.int64()), DAY_US)
        cols = {"day": day}
        for et in EVENT_TYPES:
            cols[f"n_{et}"] = pc.cast(
                pc.equal(batch["event_type"], et), pa.int64()
            )
        t = pa.table(cols)
        return t.group_by(["day"]).aggregate(
            [(f"n_{et}", "sum") for et in EVENT_TYPES] + [([], "count_all")]
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return partials.groupby("day").aggregate(
        *[Sum(f"n_{et}_sum", alias_name=f"n_{et}") for et in EVENT_TYPES],
        Sum("count_all", alias_name="n_total"),
    )


ROLLUP_ALL = -1  # sentinel for the rolled-up day level
ROLLUP_ALL_TYPE = "ALL"


def rollup_events(sf_dir: str) -> ray.data.Dataset:
    """GROUP BY ROLLUP(event_type, day): exact counts and cent-sums at
    three grains — (type, day), (type, ALL), (ALL, ALL) — in one pass.

    The base (type, day) aggregate IS the only shuffle; both coarser
    levels are re-aggregations of the tiny base table (|types|×|days|
    rows), computed in a single-block finalize (``repartition(1)`` on
    the already-small aggregate, not on the input stream). Sentinels
    ('ALL' / -1) keep the output schema non-null and hashable."""
    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])
    ensure_serializable()

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "event_type": batch["event_type"],
                "day": pc.divide(pc.cast(batch["ts"], pa.int64()), DAY_US),
                "cents": _fixed_point(batch["value"], 100),
            }
        )
        return t.group_by(["event_type", "day"]).aggregate(
            [("cents", "count"), ("cents", "sum")]
        )

    base = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "day"])
        .aggregate(
            Sum("cents_count", alias_name="n"),
            Sum("cents_sum", alias_name="sum_cents"),
        )
    )

    def add_levels(batch: pa.Table) -> pa.Table:
        per_type = batch.group_by(["event_type"]).aggregate(
            [("n", "sum"), ("sum_cents", "sum")]
        )
        lvl2 = pa.table(
            {
                "event_type": per_type["event_type"],
                "day": pa.array([ROLLUP_ALL] * per_type.num_rows, pa.int64()),
                "n": per_type["n_sum"],
                "sum_cents": per_type["sum_cents_sum"],
            }
        )
        lvl3 = pa.table(
            {
                "event_type": pa.array([ROLLUP_ALL_TYPE], pa.string()),
                "day": pa.array([ROLLUP_ALL], pa.int64()),
                "n": pa.array([pc.sum(batch["n"]).as_py() or 0], pa.int64()),
                "sum_cents": pa.array(
                    [pc.sum(batch["sum_cents"]).as_py() or 0], pa.int64()
                ),
            }
        )
        cols = ["event_type", "day", "n", "sum_cents"]
        return pa.concat_tables([batch.select(cols), lvl2, lvl3])

    return base.repartition(1).map_batches(
        add_levels, batch_format="pyarrow", zero_copy_batch=True
    )


def rank_events_per_user(
    sf_dir: str, num_buckets: int | None = None
) -> ray.data.Dataset:
    """ROW_NUMBER() OVER (PARTITION BY user ORDER BY value DESC, ts,
    event_id): every event tagged with its per-user rank by value —
    the ranking window function (vs ``grouped_topn_events``, which
    truncates; this one emits the full numbering).

    Same physical shape as the other per-user windows: one
    hash(user_id) bucket shuffle, per-bucket vectorized sort + run
    arithmetic. Ties are impossible to mis-order: the (ts, event_id)
    tiebreak makes the numbering total and engine-independent."""

    def finalize(t: pa.Table, starts: np.ndarray, n: int) -> pa.Table:
        if n == 0:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "rn": pa.array([], pa.int64()),
                }
            )
        sizes = np.diff(np.append(starts, n))
        rn = np.arange(n) - np.repeat(starts, sizes) + 1
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "rn": pa.array(rn.astype(np.int64)),
            }
        )

    return _per_user_ordered(
        sf_dir, num_buckets, finalize,
        sort_keys=[
            ("user_id", "ascending"), ("value", "descending"),
            ("ts", "ascending"), ("event_id", "ascending"),
        ],
    )


MOVING_FRAME = 3  # current row + 2 preceding


def moving_sum_events(
    sf_dir: str, num_buckets: int | None = None
) -> ray.data.Dataset:
    """Frame window: per-user SUM(cents) OVER (ORDER BY ts, event_id
    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) — the bounded-frame
    moving aggregate, computed as cum[i] − cum[i−3] with the frame
    clipped at each user's run start. Exact int64 cents; one bucket
    shuffle, no per-row Python."""

    def finalize(t: pa.Table, starts: np.ndarray, n: int) -> pa.Table:
        if n == 0:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "w3_cents": pa.array([], pa.int64()),
                }
            )
        sizes = np.diff(np.append(starts, n))
        v = _fixed_point(t.column("value"), 100).combine_chunks()
        v = v.to_numpy(zero_copy_only=False)
        cum = np.cumsum(v)
        run_start = np.repeat(starts, sizes)
        idx = np.arange(n)
        lo = np.maximum(idx - (MOVING_FRAME - 1), run_start)
        w = cum - np.where(lo > 0, cum[lo - 1], 0)
        # frames that start at global row 0 subtract nothing
        w = np.where(lo == 0, cum, w)
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "w3_cents": pa.array(w.astype(np.int64)),
            }
        )

    return _per_user_ordered(sf_dir, num_buckets, finalize)


def user_type_setops(sf_dir: str, num_buckets: int | None = None) -> ray.data.Dataset:
    """Distributed SET OPS on a compound key: (user, day) pairs with a
    'click' INTERSECT pairs with a 'purchase' EXCEPT pairs with an
    'error' — "days a user both browsed and bought, with no error".

    Set membership is three booleans per key, so the whole op is a
    grouped MAX of flag columns: per-batch ``group_by(user, day)``
    partials (the combiner — each batch ships ≤3 ints per distinct
    key), one hash(user) bucket shuffle (day rides along — bucketing by
    the user half of the key alone keeps ONE partitioning key for the
    events stream), and a vectorized per-bucket OR + mask. No sort
    shuffle, no pair lists, no native high-cardinality groupby (the
    sort-shuffle cost scales with distinct keys — bucketing keeps the
    key space at ``num_buckets``)."""
    from pandas.util import hash_array

    from ..pipeline import default_num_buckets

    if num_buckets is None:
        num_buckets = default_num_buckets()
    ensure_serializable()

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_type"],
        filter=(pc.field("event_type").isin(["click", "purchase", "error"])),
    )

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "user_id": batch["user_id"],
                "day": pc.divide(pc.cast(batch["ts"], pa.int64()), DAY_US),
                "f_click": pc.cast(pc.equal(batch["event_type"], "click"), pa.int8()),
                "f_purchase": pc.cast(
                    pc.equal(batch["event_type"], "purchase"), pa.int8()
                ),
                "f_error": pc.cast(pc.equal(batch["event_type"], "error"), pa.int8()),
            }
        ).group_by(["user_id", "day"]).aggregate(
            [("f_click", "max"), ("f_purchase", "max"), ("f_error", "max")]
        )
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "_b", pa.array((hash_array(uid) % num_buckets).astype(np.int32))
        )

    def setop_bucket(group: pa.Table) -> pa.Table:
        t = group.combine_chunks()
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        day = t["day"].to_numpy(zero_copy_only=False)
        fc = t["f_click_max"].to_numpy(zero_copy_only=False)
        fp = t["f_purchase_max"].to_numpy(zero_copy_only=False)
        fe = t["f_error_max"].to_numpy(zero_copy_only=False)
        order = np.lexsort((day, uid))
        uid, day, fc, fp, fe = uid[order], day[order], fc[order], fp[order], fe[order]
        if not uid.size:
            return pa.table(
                {"user_id": pa.array([], pa.int64()), "day": pa.array([], pa.int64())}
            )
        new = np.r_[True, (uid[1:] != uid[:-1]) | (day[1:] != day[:-1])]
        starts = np.flatnonzero(new)
        click = np.maximum.reduceat(fc, starts) > 0
        purch = np.maximum.reduceat(fp, starts) > 0
        err = np.maximum.reduceat(fe, starts) > 0
        keep = click & purch & ~err
        return pa.table(
            {
                "user_id": pa.array(uid[starts][keep]),
                "day": pa.array(day[starts][keep]),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return partials.groupby("_b").map_groups(
        lambda g: setop_bucket(g.drop_columns(["_b"])), batch_format="pyarrow"
    )


Q10_LO = np.datetime64("1996-01-01", "us")
Q10_HI = np.datetime64("1996-04-01", "us")


def q10_returned_revenue(
    sf_dir: str, num_buckets: int | None = None, k: int = 20
) -> ray.data.Dataset:
    """TPC-H-Q10-shaped top-k: customers ranked by revenue from RETURNED
    line items ('R') on 1996Q1 orders, with name and nation attached.

    Two co-locations, one broadcast: lineitem (largest) pre-aggregates
    returned revenue per (orderkey, batch) — the combiner again — and
    meets the filtered orders on hash(orderkey); each bucket's joined
    (custkey, rev) rows re-bucket on hash(custkey) for the second
    reduce, where the customer/nation name lookup (small side) is read
    from ONE ``ray.put`` broadcast instead of a third shuffle. Revenue
    is exact int64 e4 fixed point; the final top-k sorts only the
    per-customer aggregate."""
    from ..pipeline import default_num_buckets

    if num_buckets is None:
        num_buckets = default_num_buckets()
    ensure_serializable()
    import pyarrow.parquet as pq

    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_name", "c_nationkey"],
    )
    nation = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_name"]
    )
    nkey = nation["n_nationkey"].to_numpy(zero_copy_only=False)
    nname = np.asarray(nation["n_name"].to_pylist(), dtype=object)
    n_by_key = dict(zip(nkey.tolist(), nname.tolist()))
    ckey = cust["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(ckey)
    lookup_ref = ray.put(
        (
            ckey[order],
            np.asarray(cust["c_name"].to_pylist(), dtype=object)[order],
            np.asarray(
                [n_by_key[x] for x in cust["c_nationkey"].to_numpy(zero_copy_only=False)],
                dtype=object,
            )[order],
        )
    )

    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey"],
        filter=(
            (pc.field("o_orderdate") >= Q10_LO) & (pc.field("o_orderdate") < Q10_HI)
        ),
    )
    lineitem = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=(pc.field("l_returnflag") == "R"),
    )

    def tag_orders(batch: pa.Table) -> pa.Table:
        okey = batch["o_orderkey"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "_b": pa.array((okey % num_buckets).astype(np.int32)),
                "okey": pa.array(okey.astype(np.int64)),
                "ckey": pc.cast(batch["o_custkey"], pa.int64()),
                "rev_e4": pa.array(np.zeros(len(okey), dtype=np.int64)),
                "is_order": pa.array(np.ones(len(okey), dtype=np.int8)),
            }
        )

    def revenue_partial(batch: pa.Table) -> pa.Table:
        cents = _fixed_point(batch["l_extendedprice"], 100)
        disc_pct = _fixed_point(batch["l_discount"], 100)
        rev = pc.multiply(cents, pc.subtract(pa.scalar(100), disc_pct))
        agg = (
            pa.table({"okey": batch["l_orderkey"], "rev_e4": rev})
            .group_by(["okey"])
            .aggregate([("rev_e4", "sum")])
        )
        okey = agg["okey"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "_b": pa.array((okey % num_buckets).astype(np.int32)),
                "okey": pa.array(okey.astype(np.int64)),
                "ckey": pa.array(np.zeros(len(okey), dtype=np.int64)),
                "rev_e4": agg["rev_e4_sum"],
                "is_order": pa.array(np.zeros(len(okey), dtype=np.int8)),
            }
        )

    tagged = orders.map_batches(
        tag_orders, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        lineitem.map_batches(
            revenue_partial, batch_format="pyarrow", zero_copy_batch=True
        )
    )

    def join_bucket(group: pa.Table) -> pa.Table:
        t = group.combine_chunks()
        is_order = t["is_order"].to_numpy(zero_copy_only=False) == 1
        okey = t["okey"].to_numpy(zero_copy_only=False)
        rev = t["rev_e4"].to_numpy(zero_copy_only=False)
        o_keys = okey[is_order]
        if o_keys.size == 0 or (~is_order).sum() == 0:
            return pa.table(
                {
                    "_b2": pa.array([], pa.int32()),
                    "ckey": pa.array([], pa.int64()),
                    "rev_e4": pa.array([], pa.int64()),
                }
            )
        ru, inv = np.unique(okey[~is_order], return_inverse=True)
        rsum = np.zeros(ru.size, dtype=np.int64)
        np.add.at(rsum, inv, rev[~is_order])
        order_sort = np.argsort(o_keys)
        o_sorted = o_keys[order_sort]
        pos = np.clip(np.searchsorted(o_sorted, ru), 0, o_sorted.size - 1)
        hit = o_sorted[pos] == ru
        ck = t["ckey"].to_numpy(zero_copy_only=False)[is_order][order_sort[pos[hit]]]
        # pre-reduce per custkey inside the bucket before the second shuffle
        cu, cinv = np.unique(ck, return_inverse=True)
        csum = np.zeros(cu.size, dtype=np.int64)
        np.add.at(csum, cinv, rsum[hit])
        return pa.table(
            {
                "_b2": pa.array((cu % num_buckets).astype(np.int32)),
                "ckey": pa.array(cu),
                "rev_e4": pa.array(csum),
            }
        )

    joined = tagged.groupby("_b").map_groups(
        lambda g: join_bucket(g.drop_columns(["_b"])), batch_format="pyarrow"
    )

    def reduce_cust(group: pa.Table) -> pa.Table:
        keys_sorted, names, nations = ray.get(lookup_ref)
        t = group.combine_chunks()
        ck = t["ckey"].to_numpy(zero_copy_only=False)
        rev = t["rev_e4"].to_numpy(zero_copy_only=False)
        cu, cinv = np.unique(ck, return_inverse=True)
        csum = np.zeros(cu.size, dtype=np.int64)
        np.add.at(csum, cinv, rev)
        pos = np.clip(np.searchsorted(keys_sorted, cu), 0, keys_sorted.size - 1)
        assert (keys_sorted[pos] == cu).all(), "custkey missing from lookup"
        return pa.table(
            {
                "c_custkey": pa.array(cu),
                "c_name": pa.array(list(names[pos]), pa.string()),
                "n_name": pa.array(list(nations[pos]), pa.string()),
                "revenue_e4": pa.array(csum),
            }
        )

    reduced = joined.groupby("_b2").map_groups(
        lambda g: reduce_cust(g.drop_columns(["_b2"])), batch_format="pyarrow"
    )
    return reduced.sort(
        ["revenue_e4", "c_custkey"], descending=[True, False]
    ).limit(k)


NTILE_N = 4


def ntile_events_per_user(
    sf_dir: str, num_buckets: int | None = None
) -> ray.data.Dataset:
    """NTILE(4) OVER (PARTITION BY user ORDER BY value, ts, event_id):
    per-user quartile binning of event values — the feature-bucketing
    window function (equal-frequency discretization) a feature pipeline
    applies before quantile-based encoders.

    Same single bucket shuffle as the other per-user windows; the NTILE
    assignment replicates SQL's exact rule vectorized: the first
    ``s mod 4`` tiles get ``s//4 + 1`` rows, the rest ``s//4``."""

    def finalize(t: pa.Table, starts: np.ndarray, n: int) -> pa.Table:
        if n == 0:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "tile": pa.array([], pa.int64()),
                }
            )
        sizes = np.diff(np.append(starts, n))
        s = np.repeat(sizes, sizes)
        r = np.arange(n) - np.repeat(starts, sizes)
        base = s // NTILE_N
        rem = s % NTILE_N
        boundary = rem * (base + 1)
        in_big = r < boundary
        tile = np.where(
            in_big,
            r // np.maximum(base + 1, 1),
            rem + (r - boundary) // np.maximum(base, 1),
        )
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "tile": pa.array((tile + 1).astype(np.int64)),
            }
        )

    return _per_user_ordered(
        sf_dir, num_buckets, finalize,
        sort_keys=[
            ("user_id", "ascending"), ("value", "ascending"),
            ("ts", "ascending"), ("event_id", "ascending"),
        ],
    )


EWMA_ALPHA = 0.5


def ewma_events_per_user(
    sf_dir: str, num_buckets: int | None = None, alpha: float = EWMA_ALPHA
) -> ray.data.Dataset:
    """Per-user EXPONENTIAL moving average of event values in time order
    (y_i = α·x_i + (1−α)·y_{i−1}, adjust=False recursion) — the
    streaming-scan operator: state is one number per key, carried along
    the time axis. Not SQL-expressible as a window frame (infinite
    impulse response), so rows-only in the driver; the recursion itself
    is property-tested against a reference recursion in pytest.

    Physical shape: identical to the other per-user windows (one
    hash(user) bucket shuffle); the scan runs in pandas'
    grouped-``ewm`` Cython kernel over per-run group labels — no
    per-row or per-user Python. Determinism: the recursion is evaluated
    in one fixed (ts, event_id) order per user regardless of
    bucketing, so re-runs and resumed partitions reproduce bit-equal
    floats."""
    import pandas as pd

    def finalize(t: pa.Table, starts: np.ndarray, n: int) -> pa.Table:
        if n == 0:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "ewma": pa.array([], pa.float64()),
                }
            )
        sizes = np.diff(np.append(starts, n))
        run_id = np.repeat(np.arange(starts.size), sizes)
        v = t.column("value").to_numpy(zero_copy_only=False)
        s = pd.Series(v)
        ew = (
            s.groupby(run_id).ewm(alpha=alpha, adjust=False).mean()
            .reset_index(drop=True)
        )
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "ewma": pa.array(ew.to_numpy()),
            }
        )

    return _per_user_ordered(sf_dir, num_buckets, finalize)


BLOOM_BITS = 1 << 20  # 128 KB bitmap; ~0.1% FP at sf0.1 probe cardinality


def _bloom_positions(keys: np.ndarray):
    """Two bit positions per key from one SplitMix64 mix (upper/lower
    halves) — k=2 Bloom hashing, vectorized. NOTE: _splitmix64 must be
    imported at MODULE level — this helper runs inside worker UDFs,
    where a runtime relative import fails under serialize-by-value."""
    h = _splitmix64(keys.astype(np.uint64))
    mask = np.uint64(BLOOM_BITS - 1)
    return (h & mask).astype(np.int64), (
        (h >> np.uint64(32)) & mask
    ).astype(np.int64)


def _bloom_test(bitmap: np.ndarray, keys: np.ndarray) -> np.ndarray:
    p1, p2 = _bloom_positions(keys)
    w = np.uint64(64)
    b1 = (bitmap[p1 // 64] >> (p1.astype(np.uint64) % w)) & np.uint64(1)
    b2 = (bitmap[p2 // 64] >> (p2.astype(np.uint64) % w)) & np.uint64(1)
    return (b1 & b2).astype(bool)


def anti_join_customers_bloom(
    sf_dir: str, num_buckets: int | None = None
) -> ray.data.Dataset:
    """The Bloom-prefiltered physical plan for ``anti_join_customers`` —
    IDENTICAL results (same DuckDB oracle), different shuffle economics
    for the 100 TB case where most build-side rows DON'T match.

    Pass 1 builds a 2-hash Bloom bitmap over the probe keys: per-batch
    128 KB partial bitmaps OR-reduced on the driver (batch-count rows,
    not key-count) and re-broadcast with one ``ray.put``. Pass 2 splits
    customers at the map stage: Bloom-NEGATIVE rows are definitely
    unmatched — they become output immediately and NEVER enter the
    shuffle (no false negatives in a Bloom filter); only the
    Bloom-positive sliver (true matches + ~0.1% false positives) rides
    the bucketed exact anti-join to eliminate false positives. With a
    1% match rate the shuffle shrinks ~99%; correctness never depends
    on the filter, only the shuffle volume does.

    The customer base is read twice (both branches prune to two
    columns); at scale the read is storage-parallel and far cheaper
    than shuffling the negatives would be."""
    from ..pipeline import default_num_buckets

    if num_buckets is None:
        num_buckets = default_num_buckets()
    ensure_serializable()

    probe = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey"],
        filter=(pc.field("o_orderpriority") == "1-URGENT"),
    )

    def bloom_partial(batch: pa.Table) -> pa.Table:
        keys = pc.unique(batch["o_custkey"]).to_numpy(zero_copy_only=False)
        bm = np.zeros(BLOOM_BITS // 64, dtype=np.uint64)
        if keys.size:
            p1, p2 = _bloom_positions(keys)
            w = np.uint64(64)
            np.bitwise_or.at(bm, p1 // 64, np.uint64(1) << (p1.astype(np.uint64) % w))
            np.bitwise_or.at(bm, p2 // 64, np.uint64(1) << (p2.astype(np.uint64) % w))
        return pa.table({"bitmap": pa.array([bm.tobytes()], pa.binary())})

    parts = probe.map_batches(
        bloom_partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    bitmap = np.zeros(BLOOM_BITS // 64, dtype=np.uint64)
    for row in parts:
        bitmap |= np.frombuffer(row["bitmap"], dtype=np.uint64)
    bitmap_ref = ray.put(bitmap)

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name"])

    class EmitNegatives:
        def __init__(self, ref):
            self._bm = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            keys = batch["c_custkey"].to_numpy(zero_copy_only=False)
            neg = ~_bloom_test(self._bm, keys)
            out = batch.filter(pa.array(neg))
            return pa.table(
                {
                    "c_custkey": pc.cast(out["c_custkey"], pa.int64()),
                    "c_name": out["c_name"],
                }
            )

    class TagPositives:
        def __init__(self, ref):
            self._bm = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            keys = batch["c_custkey"].to_numpy(zero_copy_only=False)
            pos = _bloom_test(self._bm, keys)
            t = batch.filter(pa.array(pos))
            key = t["c_custkey"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "_b": pa.array((key % num_buckets).astype(np.int32)),
                    "key": pa.array(key.astype(np.int64)),
                    "c_name": t["c_name"],
                    "is_probe": pa.array(np.zeros(len(key), dtype=np.int8)),
                }
            )

    def tag_probe(batch: pa.Table) -> pa.Table:
        key = pc.unique(batch["o_custkey"]).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "_b": pa.array((key % num_buckets).astype(np.int32)),
                "key": pa.array(key.astype(np.int64)),
                "c_name": pa.array([""] * len(key), pa.string()),
                "is_probe": pa.array(np.ones(len(key), dtype=np.int8)),
            }
        )

    def anti_bucket(group: pa.Table) -> pa.Table:
        t = group.combine_chunks()
        key = t["key"].to_numpy(zero_copy_only=False)
        is_probe = t["is_probe"].to_numpy(zero_copy_only=False) == 1
        keep = ~is_probe & ~np.isin(key, key[is_probe])
        out = t.filter(pa.array(keep))
        return pa.table({"c_custkey": out["key"], "c_name": out["c_name"]})

    negatives = cust.map_batches(
        EmitNegatives,
        fn_constructor_args=(bitmap_ref,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=pool_size(),
        num_cpus=1,
    )
    survivors = (
        cust.map_batches(
            TagPositives,
            fn_constructor_args=(bitmap_ref,),
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=pool_size(),
            num_cpus=1,
        )
        .union(
            probe.map_batches(tag_probe, batch_format="pyarrow", zero_copy_batch=True)
        )
        .groupby("_b")
        .map_groups(
            lambda g: anti_bucket(g.drop_columns(["_b"])), batch_format="pyarrow"
        )
    )
    return negatives.union(survivors)


def dense_rank_events_per_user(
    sf_dir: str, num_buckets: int | None = None
) -> ray.data.Dataset:
    """DENSE_RANK() OVER (PARTITION BY user ORDER BY value DESC): ties
    share a rank and no rank is skipped — cumulative sum of
    value-change flags within each user's sorted run. Both engines
    compare the same float64 bits, so tie groups are identical."""

    def finalize(t: pa.Table, starts: np.ndarray, n: int) -> pa.Table:
        if n == 0:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "drank": pa.array([], pa.int64()),
                }
            )
        sizes = np.diff(np.append(starts, n))
        v = t.column("value").to_numpy(zero_copy_only=False)
        changed = np.r_[False, v[1:] != v[:-1]]
        changed[starts] = False
        csum = np.cumsum(changed.astype(np.int64))
        base = np.repeat(csum[starts], sizes)
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "drank": pa.array(csum - base + 1),
            }
        )

    return _per_user_ordered(
        sf_dir, num_buckets, finalize,
        sort_keys=[
            ("user_id", "ascending"), ("value", "descending"),
            ("ts", "ascending"), ("event_id", "ascending"),
        ],
    )


def percent_rank_events(
    sf_dir: str, num_buckets: int | None = None
) -> ray.data.Dataset:
    """PERCENT_RANK() and CUME_DIST() OVER (PARTITION BY user ORDER BY
    value, ts, event_id) — the relative-position window functions that
    round out the ranking family (row_number / rank / dense_rank /
    ntile are elsewhere in this module).

    The ORDER BY is total (event_id is unique), so rank == row_number
    and every row is its own peer group: percent_rank = (rn−1)/(n−1)
    (0.0 for single-row partitions, SQL's defined value for the 0/0
    case) and cume_dist = rn/n. Both are a SINGLE int64÷int64 division
    in IEEE double — exactly rounded, so the bits match DuckDB on any
    worker count. Same physical shape as the other per-user windows:
    one hash(user_id) bucket shuffle, vectorized run arithmetic."""

    def finalize(t: pa.Table, starts: np.ndarray, n: int) -> pa.Table:
        if n == 0:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "pct_rank": pa.array([], pa.float64()),
                    "cume": pa.array([], pa.float64()),
                }
            )
        sizes = np.diff(np.append(starts, n))
        rn = np.arange(n, dtype=np.int64) - np.repeat(starts, sizes) + 1
        n_user = np.repeat(sizes, sizes).astype(np.int64)
        pct = np.where(n_user > 1, (rn - 1) / np.maximum(n_user - 1, 1), 0.0)
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "pct_rank": pa.array(pct),
                "cume": pa.array(rn / n_user),
            }
        )

    return _per_user_ordered(
        sf_dir, num_buckets, finalize,
        sort_keys=[
            ("user_id", "ascending"), ("value", "ascending"),
            ("ts", "ascending"), ("event_id", "ascending"),
        ],
    )


def densify_user_days(sf_dir: str, num_buckets: int | None = None) -> ray.data.Dataset:
    """Time-series DENSIFY / gap fill: one row per (user, calendar day)
    for EVERY day in the user's [first, last] activity span, zero-filled
    where no events happened — the resample step before any
    fixed-cadence feature window, and the engine's range-generation
    (1→N by value) shape.

    Per bucket: count per (user, day) with one lexsort + reduceat, then
    expand each user's span with arange minus repeated offsets and
    scatter the observed counts in. Output is bounded by users × span
    days, independent of event volume; the only shuffle is the usual
    hash(user) bucketing of per-batch (user, day, n) partials."""
    from pandas.util import hash_array

    from ..pipeline import default_num_buckets

    if num_buckets is None:
        num_buckets = default_num_buckets()
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    ensure_serializable()

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "user_id": batch["user_id"],
                "day": pc.divide(pc.cast(batch["ts"], pa.int64()), DAY_US),
            }
        ).group_by(["user_id", "day"]).aggregate([([], "count_all")])
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "_b": pa.array((hash_array(uid) % num_buckets).astype(np.int32)),
                "user_id": t["user_id"],
                "day": t["day"],
                "n": t["count_all"].cast(pa.int64()),
            }
        )

    def densify_bucket(group: pa.Table) -> pa.Table:
        t = group.combine_chunks()
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        day = t["day"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False)
        if uid.size == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "day": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                }
            )
        order = np.lexsort((day, uid))
        uid, day, n = uid[order], day[order], n[order]
        new = np.r_[True, uid[1:] != uid[:-1]]
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], uid.size) - 1
        # merge duplicate (user, day) partials
        dnew = new | np.r_[True, day[1:] != day[:-1]]
        dstarts = np.flatnonzero(dnew)
        duid = uid[dstarts]
        dday = day[dstarts]
        dn = np.add.reduceat(n, dstarts)
        # span expansion per user
        ustarts = np.flatnonzero(np.r_[True, duid[1:] != duid[:-1]])
        uends = np.append(ustarts[1:], duid.size) - 1
        lo = dday[ustarts]
        hi = dday[uends]
        span = (hi - lo + 1).astype(np.int64)
        total = int(span.sum())
        off = np.cumsum(span) - span
        idx = np.arange(total)
        rel = idx - np.repeat(off, span)
        out_uid = np.repeat(duid[ustarts], span)
        out_day = np.repeat(lo, span) + rel
        out_n = np.zeros(total, dtype=np.int64)
        # scatter observed counts: position = user offset + (day - lo)
        upos = np.repeat(np.arange(ustarts.size), np.append(ustarts[1:], duid.size) - ustarts)
        out_n[off[upos] + (dday - lo[upos])] = dn
        return pa.table(
            {
                "user_id": pa.array(out_uid),
                "day": pa.array(out_day),
                "n_events": pa.array(out_n),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return partials.groupby("_b").map_groups(
        lambda g: densify_bucket(g.drop_columns(["_b"])), batch_format="pyarrow"
    )


def user_journeys(sf_dir: str, num_buckets: int | None = None) -> ray.data.Dataset:
    """Grouped ordered STRING_AGG: each user's full event-type sequence
    in time order as one '->'-joined journey string — the
    session-replay / funnel-mining primitive (and the engine's ordered
    group-concat shape; rendering conversations is its transcript
    cousin).

    One hash(user) bucket shuffle of (user, ts, event_id, type) rows;
    per bucket, one sort and a per-run ``''.join`` via pandas' grouped
    agg (string concatenation is inherently per-output-element; the
    per-USER cost is the output string itself, not a shuffle or a
    Python-per-row scan)."""
    from pandas.util import hash_array

    from ..pipeline import default_num_buckets

    if num_buckets is None:
        num_buckets = default_num_buckets()
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"])
    ensure_serializable()

    def add_bucket(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        bucket = (hash_array(uid) % num_buckets).astype(np.int32)
        return batch.append_column("_ub", pa.array(bucket))

    def journeys(group: pa.Table) -> pa.Table:
        import pandas as pd

        t = group.sort_by(
            [("user_id", "ascending"), ("ts", "ascending"), ("event_id", "ascending")]
        )
        if t.num_rows == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "journey": pa.array([], pa.string()),
                    "n_events": pa.array([], pa.int64()),
                }
            )
        df = pd.DataFrame(
            {
                "user_id": t["user_id"].to_numpy(zero_copy_only=False),
                "event_type": t["event_type"].to_pandas(),
            }
        )
        agg = df.groupby("user_id", sort=True)["event_type"].agg(
            ["->".join, "size"]
        )
        return pa.table(
            {
                "user_id": pa.array(agg.index.to_numpy(), pa.int64()),
                "journey": pa.array(agg["join"].to_numpy(), pa.string()),
                "n_events": pa.array(agg["size"].to_numpy().astype(np.int64)),
            }
        )

    bucketed = ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
    return bucketed.groupby("_ub").map_groups(
        lambda g: journeys(g.drop_columns(["_ub"])), batch_format="pyarrow"
    )


Q18_MIN_QTY_CENTI = 30_000  # sum(l_quantity) > 300, int64 centi-units


def q18_large_orders(
    sf_dir: str, num_buckets: int | None = None
) -> ray.data.Dataset:
    """TPC-H-Q18-shaped HAVING + join-back: orders whose total line-item
    quantity exceeds 300, with customer identity attached — the
    "aggregate a big table, then enrich the tiny surviving set" shape
    (the reference's analog is thresholded stage roll-ups feeding a
    detail report, /root/reference/crates/cli/src/bench.rs:139-172).

    Scale shape: lineitem (the largest table) pre-aggregates quantity
    per (orderkey, batch) — one row per order per batch reaches the
    hash(orderkey) bucket reduce; the HAVING filter runs inside the
    reduce so only qualifying orders (~0.3% at the TPC-H threshold)
    leave it. That tiny set is a driver materialize + ``ray.put``
    broadcast; orders then streams once with a vectorized membership
    filter and customer names come from a second broadcast — no
    order-table or customer-table shuffle at all."""
    from ..pipeline import default_num_buckets

    if num_buckets is None:
        num_buckets = default_num_buckets()
    ensure_serializable()
    import pyarrow.parquet as pq

    lineitem = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_quantity"],
    )

    def qty_partial(batch: pa.Table) -> pa.Table:
        agg = (
            pa.table(
                {
                    "okey": batch["l_orderkey"],
                    "qty_centi": _fixed_point(batch["l_quantity"], 100),
                }
            )
            .group_by(["okey"])
            .aggregate([("qty_centi", "sum")])
        )
        okey = agg["okey"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "_b": pa.array((okey % num_buckets).astype(np.int32)),
                "okey": pa.array(okey.astype(np.int64)),
                "qty_centi": agg["qty_centi_sum"],
            }
        )

    def qty_reduce(group: pa.Table) -> pa.Table:
        t = group.combine_chunks()
        okey = t["okey"].to_numpy(zero_copy_only=False)
        qty = t["qty_centi"].to_numpy(zero_copy_only=False)
        ou, inv = np.unique(okey, return_inverse=True)
        osum = np.zeros(ou.size, dtype=np.int64)
        np.add.at(osum, inv, qty)
        keep = osum > Q18_MIN_QTY_CENTI
        return pa.table(
            {"okey": pa.array(ou[keep]), "qty_centi": pa.array(osum[keep])}
        )

    big = (
        lineitem.map_batches(qty_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_b")
        .map_groups(lambda g: qty_reduce(g.drop_columns(["_b"])), batch_format="pyarrow")
        .to_pandas()  # qualifying orders only: tiny by the HAVING threshold
    )
    qual = np.sort(big["okey"].to_numpy().astype(np.int64))
    qty_by_pos = big.set_index("okey")["qty_centi"].loc[qual].to_numpy()
    qual_ref = ray.put((qual, qty_by_pos))

    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_name"]
    )
    ckey = cust["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    corder = np.argsort(ckey)
    cust_ref = ray.put(
        (ckey[corder], np.asarray(cust["c_name"].to_pylist(), dtype=object)[corder])
    )

    class AttachQ18:
        def __init__(self, qref, cref):
            self._qual, self._qty = ray.get(qref)
            self._ckeys, self._cnames = ray.get(cref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            okey = batch["o_orderkey"].to_numpy(zero_copy_only=False)
            pos = np.clip(
                np.searchsorted(self._qual, okey), 0, max(self._qual.size - 1, 0)
            )
            hit = (
                self._qual[pos] == okey
                if self._qual.size
                else np.zeros(len(okey), dtype=bool)
            )
            out = batch.filter(pa.array(hit))
            if out.num_rows == 0:
                return pa.table(
                    {
                        "c_custkey": pa.array([], pa.int64()),
                        "c_name": pa.array([], pa.string()),
                        "o_orderkey": pa.array([], pa.int64()),
                        "o_orderdate": pa.array([], pa.timestamp("us")),
                        "total_centi": pa.array([], pa.int64()),
                        "qty_centi": pa.array([], pa.int64()),
                    }
                )
            ck = out["o_custkey"].to_numpy(zero_copy_only=False)
            cpos = np.clip(
                np.searchsorted(self._ckeys, ck), 0, self._ckeys.size - 1
            )
            assert (self._ckeys[cpos] == ck).all(), "custkey missing from lookup"
            return pa.table(
                {
                    "c_custkey": pa.array(ck.astype(np.int64)),
                    "c_name": pa.array(list(self._cnames[cpos]), pa.string()),
                    "o_orderkey": pc.cast(out["o_orderkey"], pa.int64()),
                    "o_orderdate": out["o_orderdate"],
                    "total_centi": _fixed_point(out["o_totalprice"], 100),
                    "qty_centi": pa.array(self._qty[pos[hit]]),
                }
            )

    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )
    return orders.map_batches(
        AttachQ18,
        fn_constructor_args=(qual_ref, cust_ref),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=pool_size(),
        num_cpus=1,
    )


FUNNEL_STAGES = ("view", "click", "purchase")


def funnel_conversion(
    sf_dir: str, num_buckets: int | None = None
) -> ray.data.Dataset:
    """Ordered FUNNEL over the event stream: how many users had a view,
    a view then a strictly-later first click, and a view→click→purchase
    chain (first-occurrence ordering) — the conversion primitive of
    product analytics and a sequence-pattern test the engine's windows
    don't otherwise cover.

    Scale shape: per-batch ``group_by(user, type).min(ts)`` partials
    mean the hash(user) bucket shuffle moves one row per (user, type,
    batch), never raw events; each bucket pivots its users' three first-
    occurrence timestamps with pure numpy and emits THREE COUNT rows, so
    the final stage-sum reduce sees 3 rows per bucket."""
    from ..pipeline import default_num_buckets

    if num_buckets is None:
        num_buckets = default_num_buckets()
    ds = _read(sf_dir, "events", columns=["user_id", "event_type", "ts"])

    def partial(batch: pa.Table) -> pa.Table:
        agg = (
            pa.table(
                {
                    "user_id": batch["user_id"],
                    "event_type": batch["event_type"],
                    "ts": batch["ts"],
                }
            )
            .group_by(["user_id", "event_type"])
            .aggregate([("ts", "min")])
        )
        uid = agg["user_id"].to_numpy(zero_copy_only=False)
        return agg.append_column(
            "_b", pa.array((uid % num_buckets).astype(np.int32))
        )

    def funnel_bucket(group: pa.Table) -> pa.Table:
        t = group.combine_chunks()
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["ts_min"].to_numpy(zero_copy_only=False).view("int64")
        etype = np.asarray(t["event_type"].to_pylist(), dtype=object)
        uu, uinv = np.unique(uid, return_inverse=True)
        i64max = np.iinfo(np.int64).max
        first = np.full((len(FUNNEL_STAGES), uu.size), i64max, dtype=np.int64)
        for si, stage in enumerate(FUNNEL_STAGES):
            mask = etype == stage
            np.minimum.at(first[si], uinv[mask], ts[mask])
        has_v = first[0] != i64max
        vc = has_v & (first[1] != i64max) & (first[0] < first[1])
        vcp = vc & (first[2] != i64max) & (first[1] < first[2])
        return pa.table(
            {
                "stage": pa.array(
                    ["view", "view>click", "view>click>purchase"], pa.string()
                ),
                "n": pa.array(
                    [int(has_v.sum()), int(vc.sum()), int(vcp.sum())], pa.int64()
                ),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    per_bucket = partials.groupby("_b").map_groups(
        lambda g: funnel_bucket(g.drop_columns(["_b"])), batch_format="pyarrow"
    )
    return per_bucket.groupby("stage").aggregate(Sum("n", alias_name="n_users"))


import datetime as _dt

Q6_LO = _dt.datetime(1996, 1, 1)
Q6_HI = _dt.datetime(1997, 1, 1)


def q6_forecast_revenue(sf_dir: str) -> "pd.DataFrame":
    """TPC-H-Q6-shaped forecasting aggregate: one global sum over a
    triple-predicate slice of lineitem. The point at scale is that the
    predicates ride INTO the parquet scan (row-group pruning on
    shipdate) and each batch contributes a single partial row — the
    shuffle carries one int64 per batch.

    Revenue is price_centi x discount_pct = exact e4 fixed point."""
    import pandas as pd
    from ray.data.aggregate import Sum as _Sum

    ensure_serializable()
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_extendedprice", "l_discount"],
        filter=(
            (pc.field("l_shipdate") >= Q6_LO)
            & (pc.field("l_shipdate") < Q6_HI)
            & (pc.field("l_discount") >= 0.05)
            & (pc.field("l_discount") <= 0.07)
            & (pc.field("l_quantity") < 24)
        ),
    )

    def partial(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(
            _fixed_point(batch["l_extendedprice"], 100),
            _fixed_point(batch["l_discount"], 100),
        )
        total = pc.sum(rev).as_py() or 0
        return pa.table({"rev_e4": pa.array([total], pa.int64())})

    out = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).aggregate(_Sum("rev_e4", alias_name="revenue_e4"))
    return pd.DataFrame({"revenue_e4": [int(out["revenue_e4"] or 0)]})


Q7_NATIONS = ("NATION_1", "NATION_2")


def q7_volume_shipping(
    sf_dir: str, num_buckets: int | None = None
) -> ray.data.Dataset:
    """TPC-H-Q7-shaped nation-pair trade volume: revenue shipped between
    two nations by (supplier nation, customer nation, year) — the
    five-table join chain expressed with TWO broadcasts and ONE
    co-location.

    supplier→nation and customer→nation are tiny: both fold into
    sorted-key lookup broadcasts applied while streaming lineitem and
    orders, which also lets the nation-pair predicate run BEFORE the
    shuffle (only rows whose supplier/customer sits in the pair
    survive). The single shuffle co-locates the two filtered streams on
    hash(orderkey); each bucket joins vectorized and pre-aggregates to
    (supp_nation, cust_nation, year) partials, so the final native
    groupby sees a handful of rows per bucket."""
    from ..pipeline import default_num_buckets

    if num_buckets is None:
        num_buckets = default_num_buckets()
    ensure_serializable()
    import pyarrow.parquet as pq

    nation = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_name"]
    )
    pair_keys = {
        n: i
        for i, n in enumerate(Q7_NATIONS)
    }
    nkey_to_code = {
        k: pair_keys[v]
        for k, v in zip(
            nation["n_nationkey"].to_pylist(), nation["n_name"].to_pylist()
        )
        if v in pair_keys
    }

    def _side_lookup(path, key_col, nat_col):
        t = pq.read_table(os.path.join(sf_dir, path), columns=[key_col, nat_col])
        keys = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        codes = np.array(
            [nkey_to_code.get(x, -1) for x in t[nat_col].to_numpy(zero_copy_only=False)],
            dtype=np.int8,
        )
        keep = codes >= 0
        keys, codes = keys[keep], codes[keep]
        order = np.argsort(keys)
        return keys[order], codes[order]

    supp_ref = ray.put(_side_lookup("supplier.parquet", "s_suppkey", "s_nationkey"))
    cust_ref = ray.put(_side_lookup("customer.parquet", "c_custkey", "c_nationkey"))

    def _probe(sorted_keys, codes, probe):
        if sorted_keys.size == 0:
            return np.full(probe.shape, -1, dtype=np.int8)
        pos = np.clip(np.searchsorted(sorted_keys, probe), 0, sorted_keys.size - 1)
        out = np.where(sorted_keys[pos] == probe, codes[pos], -1).astype(np.int8)
        return out

    def line_partial(batch: pa.Table) -> pa.Table:
        skeys, scodes = ray.get(supp_ref)
        sn = _probe(skeys, scodes, batch["l_suppkey"].to_numpy(zero_copy_only=False))
        keep = sn >= 0
        t = batch.filter(pa.array(keep))
        if t.num_rows == 0:
            return _q7_row_schema()
        rev = pc.multiply(
            _fixed_point(t["l_extendedprice"], 100),
            pc.subtract(pa.scalar(100), _fixed_point(t["l_discount"], 100)),
        )
        agg = (
            pa.table(
                {
                    "okey": t["l_orderkey"],
                    "snation": pa.array(sn[keep].astype(np.int8)),
                    "l_year": pc.cast(pc.year(t["l_shipdate"]), pa.int64()),
                    "rev_e4": rev,
                }
            )
            .group_by(["okey", "snation", "l_year"])
            .aggregate([("rev_e4", "sum")])
        )
        okey = agg["okey"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "_b": pa.array((okey % num_buckets).astype(np.int32)),
                "okey": pa.array(okey.astype(np.int64)),
                "snation": agg["snation"],
                "cnation": pa.array(np.full(len(okey), -1, dtype=np.int8)),
                "l_year": agg["l_year"],
                "rev_e4": agg["rev_e4_sum"],
            }
        )

    def order_tag(batch: pa.Table) -> pa.Table:
        ckeys, ccodes = ray.get(cust_ref)
        cn = _probe(ckeys, ccodes, batch["o_custkey"].to_numpy(zero_copy_only=False))
        keep = cn >= 0
        t = batch.filter(pa.array(keep))
        okey = t["o_orderkey"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "_b": pa.array((okey % num_buckets).astype(np.int32)),
                "okey": pa.array(okey.astype(np.int64)),
                "snation": pa.array(np.full(len(okey), -1, dtype=np.int8)),
                "cnation": pa.array(cn[keep].astype(np.int8)),
                "l_year": pa.array(np.zeros(len(okey), dtype=np.int64)),
                "rev_e4": pa.array(np.zeros(len(okey), dtype=np.int64)),
            }
        )

    def _q7_row_schema() -> pa.Table:
        return pa.table(
            {
                "_b": pa.array([], pa.int32()),
                "okey": pa.array([], pa.int64()),
                "snation": pa.array([], pa.int8()),
                "cnation": pa.array([], pa.int8()),
                "l_year": pa.array([], pa.int64()),
                "rev_e4": pa.array([], pa.int64()),
            }
        )

    lineitem = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_orderkey", "o_custkey"]
    )
    tagged = lineitem.map_batches(
        line_partial, batch_format="pyarrow", zero_copy_batch=True
    ).union(orders.map_batches(order_tag, batch_format="pyarrow", zero_copy_batch=True))

    def join_bucket(group: pa.Table) -> pa.Table:
        t = group.combine_chunks()
        sn = t["snation"].to_numpy(zero_copy_only=False)
        is_line = sn >= 0
        okey = t["okey"].to_numpy(zero_copy_only=False)
        o_keys = okey[~is_line]
        o_cn = t["cnation"].to_numpy(zero_copy_only=False)[~is_line]
        empty = pa.table(
            {
                "supp_nation": pa.array([], pa.string()),
                "cust_nation": pa.array([], pa.string()),
                "l_year": pa.array([], pa.int64()),
                "rev_e4": pa.array([], pa.int64()),
            }
        )
        if o_keys.size == 0 or is_line.sum() == 0:
            return empty
        order_sort = np.argsort(o_keys)
        o_sorted = o_keys[order_sort]
        l_ok = okey[is_line]
        pos = np.clip(np.searchsorted(o_sorted, l_ok), 0, o_sorted.size - 1)
        hit = o_sorted[pos] == l_ok
        l_sn = sn[is_line][hit]
        l_cn = o_cn[order_sort[pos[hit]]]
        cross = l_sn != l_cn  # Q7 keeps only opposite-nation pairs
        if cross.sum() == 0:
            return empty
        years = t["l_year"].to_numpy(zero_copy_only=False)[is_line][hit][cross]
        revs = t["rev_e4"].to_numpy(zero_copy_only=False)[is_line][hit][cross]
        key = (
            l_sn[cross].astype(np.int64) * 10000 + years
        )  # snation in {0,1}: composite (snation, year) key
        ku, kinv = np.unique(key, return_inverse=True)
        ksum = np.zeros(ku.size, dtype=np.int64)
        np.add.at(ksum, kinv, revs)
        k_sn = (ku // 10000).astype(np.int64)
        return pa.table(
            {
                "supp_nation": pa.array(
                    [Q7_NATIONS[i] for i in k_sn], pa.string()
                ),
                "cust_nation": pa.array(
                    [Q7_NATIONS[1 - i] for i in k_sn], pa.string()
                ),
                "l_year": pa.array(ku % 10000),
                "rev_e4": pa.array(ksum),
            }
        )

    per_bucket = tagged.groupby("_b").map_groups(
        lambda g: join_bucket(g.drop_columns(["_b"])), batch_format="pyarrow"
    )
    out = (
        per_bucket.groupby(["supp_nation", "cust_nation", "l_year"])
        .aggregate(Sum("rev_e4", alias_name="revenue_e4"))
        .to_pandas()  # |pair| x |years| rows — inherently tiny
    )
    if out.empty:
        # an empty Ray aggregate drops its schema; pin it for the compare
        import pandas as pd

        out = pd.DataFrame(
            {
                "supp_nation": pd.Series([], dtype=object),
                "cust_nation": pd.Series([], dtype=object),
                "l_year": pd.Series([], dtype=np.int64),
                "revenue_e4": pd.Series([], dtype=np.int64),
            }
        )
    return out


def time_to_conversion(
    sf_dir: str, num_buckets: int | None = None
) -> ray.data.Dataset:
    """First-view → first-purchase LATENCY per converting user, in exact
    microseconds — the funnel's timing companion (cohort latency
    distributions feed the quantile operators downstream).

    Same scale shape as ``funnel_conversion``: per-batch
    ``group_by(user, type).min(ts)`` partials, hash(user) bucket
    reduce, numpy pivot; emits one row per CONVERTING user only."""
    from ..pipeline import default_num_buckets

    if num_buckets is None:
        num_buckets = default_num_buckets()
    ds = _read(sf_dir, "events", columns=["user_id", "event_type", "ts"])

    def partial(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(
            batch["event_type"], value_set=pa.array(["view", "purchase"])
        )
        t = batch.filter(mask)
        agg = (
            pa.table(
                {
                    "user_id": t["user_id"],
                    "event_type": t["event_type"],
                    "ts": t["ts"],
                }
            )
            .group_by(["user_id", "event_type"])
            .aggregate([("ts", "min")])
        )
        uid = agg["user_id"].to_numpy(zero_copy_only=False)
        return agg.append_column(
            "_b", pa.array((uid % num_buckets).astype(np.int32))
        )

    def latency_bucket(group: pa.Table) -> pa.Table:
        t = group.combine_chunks()
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["ts_min"].to_numpy(zero_copy_only=False).view("int64")
        etype = np.asarray(t["event_type"].to_pylist(), dtype=object)
        uu, uinv = np.unique(uid, return_inverse=True)
        i64max = np.iinfo(np.int64).max
        tv = np.full(uu.size, i64max, dtype=np.int64)
        tp = np.full(uu.size, i64max, dtype=np.int64)
        vm = etype == "view"
        pm = etype == "purchase"
        np.minimum.at(tv, uinv[vm], ts[vm])
        np.minimum.at(tp, uinv[pm], ts[pm])
        conv = (tv != i64max) & (tp != i64max) & (tp > tv)
        return pa.table(
            {
                "user_id": pa.array(uu[conv]),
                "lat_us": pa.array(tp[conv] - tv[conv]),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return partials.groupby("_b").map_groups(
        lambda g: latency_bucket(g.drop_columns(["_b"])), batch_format="pyarrow"
    )


_US_PER_DAY = 86_400_000_000


def event_type_cooccurrence(
    sf_dir: str, num_buckets: int | None = None
) -> ray.data.Dataset:
    """Market-basket CO-OCCURRENCE: for every (user, day) basket, which
    pairs of event types occur together, counted corpus-wide — the
    association-mining primitive (and the engine's general shape for
    "self-join within a group" without ever running a join: sorted runs
    + vectorized pair expansion, the dedup family's machinery applied
    to a relational question).

    Scale shape: per-batch DISTINCT partials (group_by user/day/type)
    shrink the stream before the single hash(user,day) bucket shuffle;
    each bucket re-distincts (cross-batch dups), expands within-basket
    pairs with ``_pairs_within_runs`` (≤ C(|types|,2) = 10 per basket)
    and pre-counts, so the final native groupby sees at most
    |type-pairs| rows per bucket — a constant."""
    from .dedup import _pairs_within_runs, _run_starts
    from ..pipeline import default_num_buckets

    if num_buckets is None:
        num_buckets = default_num_buckets()
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(batch["ts"], pa.int64()), _US_PER_DAY)
        agg = (
            pa.table(
                {
                    "user_id": batch["user_id"],
                    "day": day,
                    "event_type": batch["event_type"],
                }
            )
            .group_by(["user_id", "day", "event_type"])
            .aggregate([])
        )
        uid = agg["user_id"].to_numpy(zero_copy_only=False)
        dayv = agg["day"].to_numpy(zero_copy_only=False)
        return agg.append_column(
            "_b", pa.array(((uid * 31 + dayv) % num_buckets).astype(np.int32))
        )

    def pairs_bucket(group: pa.Table) -> pa.Table:
        t = group.combine_chunks().sort_by(
            [("user_id", "ascending"), ("day", "ascending"),
             ("event_type", "ascending")]
        )
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        day = t["day"].to_numpy(zero_copy_only=False)
        codes = pc.dictionary_encode(t["event_type"].combine_chunks())
        etype = np.asarray(codes.indices)
        # drop cross-batch duplicate (user, day, type) rows
        first = _run_starts(uid, day, etype)
        uid, day = uid[first], day[first]
        types = np.asarray(t["event_type"].to_pylist(), dtype=object)[first]
        new_basket = _run_starts(uid, day)
        ii, jj = _pairs_within_runs(new_basket)
        if ii.size == 0:
            return pa.table(
                {
                    "type_a": pa.array([], pa.string()),
                    "type_b": pa.array([], pa.string()),
                    "n_pairs": pa.array([], pa.int64()),
                }
            )
        pair = pa.table(
            {"type_a": pa.array(types[ii]), "type_b": pa.array(types[jj])}
        )
        agg = pair.group_by(["type_a", "type_b"]).aggregate([([], "count_all")])
        return agg.rename_columns(["type_a", "type_b", "n_pairs"])

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    per_bucket = partials.groupby("_b").map_groups(
        lambda g: pairs_bucket(g.drop_columns(["_b"])), batch_format="pyarrow"
    )
    return per_bucket.groupby(["type_a", "type_b"]).aggregate(
        Sum("n_pairs", alias_name="n_pairs")
    )


def daily_activity_full_join(sf_dir: str) -> ray.data.Dataset:
    """FULL OUTER JOIN of two daily aggregates (events vs orders per
    day) — days with only one side present keep a zero on the other.

    The engine never runs an outer join operator for this shape: a full
    outer join OF AGGREGATES is the grouped sum of the tagged union
    (each side emits (day, n, 0) / (day, 0, n) partials; summing per
    day coalesces automatically). One tiny |days|-keyed groupby, no
    join machinery, no null handling."""
    ensure_serializable()

    events = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["ts"]
    )
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_orderdate"]
    )

    def _day_partial(col_name, as_events):
        def partial(batch: pa.Table) -> pa.Table:
            day = pc.divide(pc.cast(batch[col_name], pa.int64()), _US_PER_DAY)
            agg = (
                pa.table({"day": day})
                .group_by(["day"])
                .aggregate([([], "count_all")])
                .rename_columns(["day", "n"])
            )
            n = agg["n"].to_numpy(zero_copy_only=False).astype(np.int64)
            zero = np.zeros(len(n), dtype=np.int64)
            return pa.table(
                {
                    "day": agg["day"],
                    "n_events": pa.array(n if as_events else zero),
                    "n_orders": pa.array(zero if as_events else n),
                }
            )

        return partial

    tagged = events.map_batches(
        _day_partial("ts", True), batch_format="pyarrow", zero_copy_batch=True
    ).union(
        orders.map_batches(
            _day_partial("o_orderdate", False),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )
    return tagged.groupby("day").aggregate(
        Sum("n_events", alias_name="n_events"),
        Sum("n_orders", alias_name="n_orders"),
    )


RETENTION_MAX_OFFSET = 6


def cohort_retention(
    sf_dir: str, num_buckets: int | None = None
) -> ray.data.Dataset:
    """COHORT RETENTION matrix: users bucketed by their first active
    day, counted again on each of the next ``RETENTION_MAX_OFFSET``
    days they return — the standard activation/retention grid of
    product analytics, and the engine's shape for "self-join a stream
    against its own per-key minimum" without a join: the per-user
    minimum and the per-user day set co-locate in ONE hash(user)
    bucket shuffle of distinct (user, day) partials.

    Per bucket, first-day and offsets come from run arithmetic over a
    (user, day) lexsort; offsets pre-count into (cohort_day, offset)
    partials so the final groupby is keyed by |days| x 7 — tiny."""
    from ..pipeline import default_num_buckets
    from .dedup import _run_starts  # resolved driver-side: a relative
    # import inside the worker-executed closure would fail to find the
    # by-value-serialized `engine` package on workers

    if num_buckets is None:
        num_buckets = default_num_buckets()
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def partial(batch: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(batch["ts"], pa.int64()), _US_PER_DAY)
        agg = (
            pa.table({"user_id": batch["user_id"], "day": day})
            .group_by(["user_id", "day"])
            .aggregate([])
        )
        uid = agg["user_id"].to_numpy(zero_copy_only=False)
        return agg.append_column(
            "_b", pa.array((uid % num_buckets).astype(np.int32))
        )

    def retention_bucket(group: pa.Table) -> pa.Table:
        t = group.combine_chunks()
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        day = t["day"].to_numpy(zero_copy_only=False)
        order = np.lexsort((day, uid))
        uid, day = uid[order], day[order]
        # distinct (user, day) across batch partials
        keep = _run_starts(uid, day)
        uid, day = uid[keep], day[keep]
        new_user = _run_starts(uid)
        starts = np.flatnonzero(new_user)
        sizes = np.diff(np.append(starts, uid.size))
        cohort = np.repeat(day[starts], sizes)  # per-row first day
        offset = day - cohort
        sel = offset <= RETENTION_MAX_OFFSET
        key = cohort[sel] * 100 + offset[sel]
        ku, kc = np.unique(key, return_counts=True)
        return pa.table(
            {
                "cohort_day": pa.array(ku // 100),
                "offset_days": pa.array(ku % 100),
                "n_users": pa.array(kc.astype(np.int64)),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    per_bucket = partials.groupby("_b").map_groups(
        lambda g: retention_bucket(g.drop_columns(["_b"])), batch_format="pyarrow"
    )
    return per_bucket.groupby(["cohort_day", "offset_days"]).aggregate(
        Sum("n_users", alias_name="n_users")
    )


Q8_PART_TYPE = "PROMO"
Q8_REGION = "ASIA"
Q8_NATION = "NATION_1"


def q8_market_share(
    sf_dir: str, num_buckets: int | None = None
) -> ray.data.Dataset:
    """TPC-H-Q8-shaped market share: of the revenue from ``PROMO``-type
    parts sold to ``ASIA``-region customers, how much per order-year
    came from ``NATION_1`` suppliers — the widest join chain in the
    repo (lineitem x part x supplier x orders x customer x nation x
    region) collapsed to ONE orderkey co-location plus three broadcast
    lookups; the share ships as exact (numerator, denominator) int64
    fixed-point columns rather than a float ratio.

    Filters run earliest-possible: part-type keys and supplier-nation
    flags prune lineitem rows before its partial aggregation; the
    region predicate prunes orders while tagging. Both shuffle streams
    are therefore pre-filtered AND pre-aggregated."""
    from ..pipeline import default_num_buckets

    if num_buckets is None:
        num_buckets = default_num_buckets()
    ensure_serializable()
    import pyarrow.parquet as pq

    part = pq.read_table(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_type"]
    )
    pkeys = np.sort(
        part.filter(pc.equal(part["p_type"], Q8_PART_TYPE))["p_partkey"]
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )

    nation = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name", "n_regionkey"],
    )
    region = pq.read_table(
        os.path.join(sf_dir, "region.parquet"), columns=["r_regionkey", "r_name"]
    )
    region_keys = {
        k: v
        for k, v in zip(
            region["r_regionkey"].to_pylist(), region["r_name"].to_pylist()
        )
    }
    nat_names = nation["n_name"].to_pylist()
    nat_keys = nation["n_nationkey"].to_pylist()
    nat_region = [region_keys[r] for r in nation["n_regionkey"].to_pylist()]
    target_nation_keys = {k for k, n in zip(nat_keys, nat_names) if n == Q8_NATION}
    asia_nation_keys = {
        k for k, r in zip(nat_keys, nat_region) if r == Q8_REGION
    }

    supplier = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_nationkey"],
    )
    skeys = supplier["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    s_is_target = np.array(
        [int(k in target_nation_keys) for k in supplier["s_nationkey"].to_pylist()],
        dtype=np.int8,
    )
    sorder = np.argsort(skeys)

    customer = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"],
    )
    ckeys_all = customer["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    c_in_region = np.array(
        [k in asia_nation_keys for k in customer["c_nationkey"].to_pylist()]
    )
    region_custkeys = np.sort(ckeys_all[c_in_region])

    side_ref = ray.put(
        (pkeys, skeys[sorder], s_is_target[sorder], region_custkeys)
    )

    def line_partial(batch: pa.Table) -> pa.Table:
        pk, sk, s_tgt, _ = ray.get(side_ref)
        lpart = batch["l_partkey"].to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(pk, lpart), 0, max(pk.size - 1, 0))
        keep = pk[pos] == lpart if pk.size else np.zeros(len(lpart), bool)
        t = batch.filter(pa.array(keep))
        if t.num_rows == 0:
            return pa.table(
                {
                    "_b": pa.array([], pa.int32()),
                    "okey": pa.array([], pa.int64()),
                    "is_order": pa.array([], pa.int8()),
                    "rev_tgt_e4": pa.array([], pa.int64()),
                    "rev_all_e4": pa.array([], pa.int64()),
                }
            )
        lsupp = t["l_suppkey"].to_numpy(zero_copy_only=False)
        spos = np.clip(np.searchsorted(sk, lsupp), 0, sk.size - 1)
        tgt = (sk[spos] == lsupp) & (s_tgt[spos] == 1)
        rev = pc.multiply(
            _fixed_point(t["l_extendedprice"], 100),
            pc.subtract(pa.scalar(100), _fixed_point(t["l_discount"], 100)),
        ).to_numpy(zero_copy_only=False)
        agg = (
            pa.table(
                {
                    "okey": t["l_orderkey"],
                    "rev_tgt_e4": pa.array(np.where(tgt, rev, 0)),
                    "rev_all_e4": pa.array(rev),
                }
            )
            .group_by(["okey"])
            .aggregate([("rev_tgt_e4", "sum"), ("rev_all_e4", "sum")])
        )
        okey = agg["okey"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "_b": pa.array((okey % num_buckets).astype(np.int32)),
                "okey": pa.array(okey.astype(np.int64)),
                "is_order": pa.array(np.zeros(len(okey), dtype=np.int8)),
                "rev_tgt_e4": agg["rev_tgt_e4_sum"],
                "rev_all_e4": agg["rev_all_e4_sum"],
            }
        )

    def order_tag(batch: pa.Table) -> pa.Table:
        _, _, _, rck = ray.get(side_ref)
        ckey = batch["o_custkey"].to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(rck, ckey), 0, max(rck.size - 1, 0))
        keep = rck[pos] == ckey if rck.size else np.zeros(len(ckey), bool)
        t = batch.filter(pa.array(keep))
        okey = t["o_orderkey"].to_numpy(zero_copy_only=False)
        year = pc.year(t["o_orderdate"]).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "_b": pa.array((okey % num_buckets).astype(np.int32)),
                "okey": pa.array(okey.astype(np.int64)),
                "is_order": pa.array(np.ones(len(okey), dtype=np.int8)),
                "rev_tgt_e4": pa.array(year),  # year rides the rev_tgt slot
                "rev_all_e4": pa.array(np.zeros(len(okey), dtype=np.int64)),
            }
        )

    lineitem = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_partkey", "l_suppkey",
                 "l_extendedprice", "l_discount"],
    )
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    )
    tagged = lineitem.map_batches(
        line_partial, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        orders.map_batches(order_tag, batch_format="pyarrow", zero_copy_batch=True)
    )

    def join_bucket(group: pa.Table) -> pa.Table:
        t = group.combine_chunks()
        is_order = t["is_order"].to_numpy(zero_copy_only=False) == 1
        okey = t["okey"].to_numpy(zero_copy_only=False)
        o_keys = okey[is_order]
        o_year = t["rev_tgt_e4"].to_numpy(zero_copy_only=False)[is_order]
        empty = pa.table(
            {
                "l_year": pa.array([], pa.int64()),
                "rev_nation_e4": pa.array([], pa.int64()),
                "rev_total_e4": pa.array([], pa.int64()),
            }
        )
        if o_keys.size == 0 or is_order.all():
            return empty
        osort = np.argsort(o_keys)
        o_sorted = o_keys[osort]
        l_ok = okey[~is_order]
        pos = np.clip(np.searchsorted(o_sorted, l_ok), 0, o_sorted.size - 1)
        hit = o_sorted[pos] == l_ok
        if not hit.any():
            return empty
        year = o_year[osort[pos[hit]]]
        tgt = t["rev_tgt_e4"].to_numpy(zero_copy_only=False)[~is_order][hit]
        allr = t["rev_all_e4"].to_numpy(zero_copy_only=False)[~is_order][hit]
        yu, yinv = np.unique(year, return_inverse=True)
        tsum = np.zeros(yu.size, dtype=np.int64)
        asum = np.zeros(yu.size, dtype=np.int64)
        np.add.at(tsum, yinv, tgt)
        np.add.at(asum, yinv, allr)
        return pa.table(
            {
                "l_year": pa.array(yu),
                "rev_nation_e4": pa.array(tsum),
                "rev_total_e4": pa.array(asum),
            }
        )

    per_bucket = tagged.groupby("_b").map_groups(
        lambda g: join_bucket(g.drop_columns(["_b"])), batch_format="pyarrow"
    )
    out = (
        per_bucket.groupby("l_year")
        .aggregate(
            Sum("rev_nation_e4", alias_name="rev_nation_e4"),
            Sum("rev_total_e4", alias_name="rev_total_e4"),
        )
        .to_pandas()  # |years| rows
    )
    if out.empty:
        import pandas as pd

        out = pd.DataFrame(
            {
                "l_year": pd.Series([], dtype=np.int64),
                "rev_nation_e4": pd.Series([], dtype=np.int64),
                "rev_total_e4": pd.Series([], dtype=np.int64),
            }
        )
    return out


_US_PER_HOUR = 3_600_000_000


def hourly_active_users(
    sf_dir: str, num_buckets: int | None = None
) -> ray.data.Dataset:
    """TUMBLING-WINDOW COUNT DISTINCT: distinct users per clock hour —
    the live-dashboard aggregate, and the windowed variant of grouped
    COUNT DISTINCT. Distinct (hour, user) pairs are high-cardinality
    (~one per user-hour), so unlike ``distinct_users_per_type`` the
    global dedup rides the bucketed-reduce pattern: per-batch distinct
    partials, ONE hash(hour, user) int32 bucket shuffle, per-bucket
    ``np.unique`` + per-hour pre-counts, then a tiny |hours|-keyed
    groupby sum."""
    from ..pipeline import default_num_buckets
    from .dedup import _run_starts

    if num_buckets is None:
        num_buckets = default_num_buckets()
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def partial(batch: pa.Table) -> pa.Table:
        hour = pc.divide(pc.cast(batch["ts"], pa.int64()), _US_PER_HOUR)
        agg = (
            pa.table({"hour": hour, "user_id": batch["user_id"]})
            .group_by(["hour", "user_id"])
            .aggregate([])
        )
        h = agg["hour"].to_numpy(zero_copy_only=False)
        u = agg["user_id"].to_numpy(zero_copy_only=False)
        return agg.append_column(
            "_b", pa.array(((h * 31 + u) % num_buckets).astype(np.int32))
        )

    def count_bucket(group: pa.Table) -> pa.Table:
        t = group.combine_chunks()
        h = t["hour"].to_numpy(zero_copy_only=False)
        u = t["user_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((u, h))
        h, u = h[order], u[order]
        keep = _run_starts(h, u)  # global distinct within the bucket
        hu, hc = np.unique(h[keep], return_counts=True)
        return pa.table(
            {"hour": pa.array(hu), "n_users": pa.array(hc.astype(np.int64))}
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    per_bucket = partials.groupby("_b").map_groups(
        lambda g: count_bucket(g.drop_columns(["_b"])), batch_format="pyarrow"
    )
    return per_bucket.groupby("hour").aggregate(Sum("n_users", alias_name="n_users"))


# ---------------------------------------------------------------------------
# snapshot merge / upsert (lakehouse MERGE shape)
# ---------------------------------------------------------------------------

UPSERT_NEW_OFFSET = 500_000


def merge_upsert(sf_dir: str) -> ray.data.Dataset:
    """Lakehouse MERGE: a second snapshot of the documents table
    (deterministic synthetic delta — every doc_id % 4 == 0 row updated
    to upper-case text, plus brand-new rows at id+UPSERT_NEW_OFFSET for
    doc_id % 10 == 0) upserts into the base snapshot; the winner per
    key is the newest snapshot -> (doc_id, snapshot, n_chars).

    The canonical incremental-ingest shape: union the tagged snapshots
    (the delta is usually tiny next to the base — neither side ever
    joins, sorts globally, or materializes), ONE hash(doc_id) bucket
    pass picks max(snapshot) per key vectorized from run heads. The
    delta synthesis is SQL-expressible, so the merge has a full
    row_number-per-key oracle."""
    from ..pipeline import default_num_buckets
    from .dedup import _bucket_of, _run_starts

    num_buckets = default_num_buckets()
    ensure_serializable()
    base = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def tag_base(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        text = pc.fill_null(batch["text"], "")
        return pa.table(
            {
                "_db": pa.array(_bucket_of(ids, num_buckets=num_buckets)),
                "doc_id": pa.array(ids),
                "snapshot": pa.array(np.ones(ids.size, dtype=np.int64)),
                "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
            }
        )

    def tag_delta(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        text = pc.fill_null(batch["text"], "")
        n = pc.cast(pc.utf8_length(pc.utf8_upper(text)), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        upd = ids % 4 == 0
        new = ids % 10 == 0
        out_ids = np.concatenate([ids[upd], ids[new] + UPSERT_NEW_OFFSET])
        out_n = np.concatenate([n[upd], n[new]])
        return pa.table(
            {
                "_db": pa.array(_bucket_of(out_ids, num_buckets=num_buckets)),
                "doc_id": pa.array(out_ids),
                "snapshot": pa.array(np.full(out_ids.size, 2, dtype=np.int64)),
                "n_chars": pa.array(out_n),
            }
        )

    both = base.map_batches(
        tag_base, batch_format="pyarrow", zero_copy_batch=True
    ).union(base.map_batches(tag_delta, batch_format="pyarrow", zero_copy_batch=True))

    def merge_bucket(group: pa.Table) -> pa.Table:
        t = group.sort_by(
            [("doc_id", "ascending"), ("snapshot", "descending")]
        ).combine_chunks()
        if t.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "snapshot": pa.array([], pa.int64()),
                    "n_chars": pa.array([], pa.int64()),
                }
            )
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        heads = np.flatnonzero(_run_starts(ids))
        return pa.table(
            {
                "doc_id": pa.array(ids[heads]),
                "snapshot": pa.array(
                    t["snapshot"].to_numpy(zero_copy_only=False)[heads]
                ),
                "n_chars": pa.array(
                    t["n_chars"].to_numpy(zero_copy_only=False)[heads]
                ),
            }
        )

    return both.groupby("_db").map_groups(
        lambda g: merge_bucket(g.drop_columns(["_db"])), batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# Sampled equi-join (uniform Bernoulli over the join OUTPUT without
# materializing it — the join-sampling problem of PODS'23 "Guaranteeing
# the Õ(AGM/OUT) Runtime for Uniform Sampling ... over Joins" and
# EDBT'23 "Streaming Weighted Sampling over Join Queries", in the
# engine's deterministic-hash form)
# ---------------------------------------------------------------------------

SAMPLED_JOIN_PCT = 5          # keep ~5% of join pairs
SJ_A = 2654435761            # Knuth multiplicative (sample_events parity)
SJ_B = 2246822519            # second mixing prime for the right key
SJ_C = 12345
SJ_M = 4294967296            # 2^32
_SJ_CHUNK = 1 << 20           # pair-enumeration chunk: bounds peak memory


def sampled_join_events_orders(
    sf_dir: str,
    pct: int = SAMPLED_JOIN_PCT,
    num_buckets: int | None = None,
    weight_mod: int | None = None,
) -> ray.data.Dataset:
    """Deterministic Bernoulli sample of the events x orders equi-join
    (``user_id = o_custkey``) at ``pct``%: a pair survives iff the
    Knuth-mix of BOTH keys clears the threshold — the decision is a pure
    function of (event_id, o_orderkey), so a resumed partition samples
    identically and the DuckDB oracle replays it row-for-row.

    Scale shape: both sides bucket by hash(user_id) (the asof-join
    machinery) and ONE map_groups per bucket enumerates candidate pairs
    as int32/int64 INDEX arithmetic in fixed-size chunks
    (``_SJ_CHUNK`` pairs at a time): the wide join rows are
    materialized ONLY for surviving pairs, so peak memory is
    chunk-bounded and output is rate-bounded — the full join result
    never exists anywhere. Per-term ``% 2^32`` keeps the mix inside
    int64 on the SQL side (no BIGINT overflow) with the same key-range
    contract as ``sample_events``."""
    from ..pipeline import default_num_buckets

    if num_buckets is None:
        num_buckets = default_num_buckets()
    ensure_serializable()

    events = _read(sf_dir, "events", columns=["event_id", "user_id"])
    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"]
    )

    def tag_events(batch: pa.Table) -> pa.Table:
        from pandas.util import hash_array

        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        n = len(uid)
        return pa.table(
            {
                "_b": pa.array((hash_array(uid) % num_buckets).astype(np.int32)),
                "user_id": batch["user_id"],
                "is_order": pa.array(np.zeros(n, dtype=np.int8)),
                "lkey": batch["event_id"],
                "rcents": pa.array(np.zeros(n, dtype=np.int64)),
            }
        )

    def tag_orders(batch: pa.Table) -> pa.Table:
        from pandas.util import hash_array

        uid = batch["o_custkey"].to_numpy(zero_copy_only=False)
        n = len(uid)
        return pa.table(
            {
                "_b": pa.array((hash_array(uid) % num_buckets).astype(np.int32)),
                "user_id": batch["o_custkey"],
                "is_order": pa.array(np.ones(n, dtype=np.int8)),
                "lkey": batch["o_orderkey"],
                "rcents": _fixed_point(batch["o_totalprice"], 100),
            }
        )

    tagged = events.map_batches(
        tag_events, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        orders.map_batches(tag_orders, batch_format="pyarrow", zero_copy_batch=True)
    )

    empty = pa.table(
        {
            "event_id": pa.array([], pa.int64()),
            "user_id": pa.array([], pa.int64()),
            "order_key": pa.array([], pa.int64()),
            "order_cents": pa.array([], pa.int64()),
        }
    )

    def sample_bucket(group: pa.Table) -> pa.Table:
        t = group.combine_chunks()
        if t.num_rows == 0:
            return empty
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        is_order = t["is_order"].to_numpy(zero_copy_only=False)
        key = t["lkey"].to_numpy(zero_copy_only=False)
        cents = t["rcents"].to_numpy(zero_copy_only=False)
        ev, od = is_order == 0, is_order == 1
        if not ev.any() or not od.any():
            return empty
        # sort each side by (uid, key) -> deterministic pair order
        eo = np.lexsort((key[ev], uid[ev]))
        oo = np.lexsort((key[od], uid[od]))
        e_uid, e_key = uid[ev][eo], key[ev][eo]
        o_uid, o_key, o_cents = uid[od][oo], key[od][oo], cents[od][oo]
        # shared uid alignment: runs on each side, matched via searchsorted
        e_u, e_start, e_cnt = np.unique(e_uid, return_index=True, return_counts=True)
        o_u, o_start, o_cnt = np.unique(o_uid, return_index=True, return_counts=True)
        pos = np.searchsorted(o_u, e_u)
        pos_c = np.minimum(pos, len(o_u) - 1)
        hit = o_u[pos_c] == e_u
        m, g_es, g_os = e_cnt[hit], e_start[hit], o_start[pos_c[hit]]
        k = o_cnt[pos_c[hit]]
        pairs_per = (m * k).astype(np.int64)
        total = int(pairs_per.sum())
        if total == 0:
            return empty
        bounds = np.concatenate([[0], np.cumsum(pairs_per)])
        out = []
        # chunked enumeration: never more than _SJ_CHUNK pair indices live
        # (gid recovered per chunk via searchsorted over the pair-count
        # prefix sums — no O(total) scaffold array is ever built)
        for lo in range(0, total, _SJ_CHUNK):
            hi = min(lo + _SJ_CHUNK, total)
            idx = np.arange(lo, hi, dtype=np.int64)
            g = np.searchsorted(bounds, idx, side="right") - 1
            loc = idx - bounds[g]
            li = g_es[g] + loc // k[g]
            ri = g_os[g] + loc % k[g]
            eid, okey = e_key[li], o_key[ri]
            h = (
                (eid.astype(np.uint64) * np.uint64(SJ_A)) % np.uint64(SJ_M)
                + (okey.astype(np.uint64) * np.uint64(SJ_B)) % np.uint64(SJ_M)
                + np.uint64(SJ_C)
            ) % np.uint64(SJ_M)
            if weight_mod is None:
                keep = (h % np.uint64(100)) < pct
            else:
                # weighted Bernoulli: inclusion probability proportional
                # to the order's value (cents / weight_mod, clamped < 1)
                w = np.minimum(
                    o_cents[ri], np.int64(weight_mod - 1)
                ).astype(np.uint64)
                keep = (h % np.uint64(weight_mod)) < w
            if keep.any():
                out.append(
                    pa.table(
                        {
                            "event_id": pa.array(eid[keep]),
                            "user_id": pa.array(e_uid[li[keep]]),
                            "order_key": pa.array(okey[keep]),
                            "order_cents": pa.array(o_cents[ri[keep]]),
                        }
                    )
                )
        return pa.concat_tables(out) if out else empty

    return tagged.groupby("_b").map_groups(
        lambda g: sample_bucket(g.drop_columns(["_b"])), batch_format="pyarrow"
    )


WEIGHTED_JOIN_MOD = 1 << 26   # p = order_cents / 2^26; TPC-H totalprice
                              # tops out ~$557k = 5.57e7 cents < 2^26? no:
                              # 5.57e7 < 6.71e7 — headroom; larger values clamp


def weighted_join_sample_events_orders(
    sf_dir: str, num_buckets: int | None = None
) -> ray.data.Dataset:
    """WEIGHTED join sampling (the EDBT'23 "Streaming Weighted Sampling
    over Join Queries" problem in deterministic-hash form): each
    events x orders pair survives with probability proportional to the
    order's value — ``hash(keys) % 2^26 < min(order_cents, 2^26-1)`` —
    so high-value orders dominate the sample in exact proportion, with
    no randomness to reconcile across resumes. Same chunk-bounded
    enumeration as ``sampled_join_events_orders``: the full join output
    never materializes; expected output size = sum(p) over pairs."""
    return sampled_join_events_orders(
        sf_dir, num_buckets=num_buckets, weight_mod=WEIGHTED_JOIN_MOD
    )


def join_size_estimate_events_orders(sf_dir: str) -> ray.data.Dataset:
    """EXACT join-output-size computation without computing the join —
    the size-estimation side of the join-sampling literature (the AGM
    bound's degree-sequence form): |events ⋈ orders| =
    Σ_u deg_events(u) * deg_orders(u), plus the matched-key count.

    Scale shape: each side pre-aggregates per-key degrees inside
    map_batches (shuffle rows = distinct keys per batch, never events),
    ONE groupby(key) merges both sides' partials, the per-key product
    reduces to a 1-row answer — the join itself never runs. This is the
    planner-side primitive the sampled/weighted join operators pair
    with (decide the rate from the exact size, then sample)."""
    from ray.data.aggregate import Sum

    ensure_serializable()
    events = _read(sf_dir, "events", columns=["user_id"])
    orders = _read(sf_dir, "orders", columns=["o_custkey"])

    def deg_events(batch: pa.Table) -> pa.Table:
        t = pa.table({"k": batch["user_id"]})
        g = t.group_by(["k"]).aggregate([("k", "count")])
        return pa.table(
            {"k": g["k"], "d_e": pc.cast(g["k_count"], pa.int64()),
             "d_o": pa.array(np.zeros(g.num_rows, np.int64))}
        )

    def deg_orders(batch: pa.Table) -> pa.Table:
        t = pa.table({"k": batch["o_custkey"]})
        g = t.group_by(["k"]).aggregate([("k", "count")])
        return pa.table(
            {"k": g["k"], "d_e": pa.array(np.zeros(g.num_rows, np.int64)),
             "d_o": pc.cast(g["k_count"], pa.int64())}
        )

    degrees = (
        events.map_batches(deg_events, batch_format="pyarrow", zero_copy_batch=True)
        .union(
            orders.map_batches(
                deg_orders, batch_format="pyarrow", zero_copy_batch=True
            )
        )
        .groupby("k")
        .aggregate(Sum("d_e", alias_name="d_e"), Sum("d_o", alias_name="d_o"))
    )

    def partial_product(batch: pa.Table) -> pa.Table:
        de = batch["d_e"].to_numpy(zero_copy_only=False)
        do = batch["d_o"].to_numpy(zero_copy_only=False)
        both = (de > 0) & (do > 0)
        return pa.table(
            {
                "join_rows": pa.array([int((de * do)[both].sum())], pa.int64()),
                "matched_keys": pa.array([int(both.sum())], pa.int64()),
            }
        )

    return (
        degrees.map_batches(
            partial_product, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby(None)
        .aggregate(
            Sum("join_rows", alias_name="join_rows"),
            Sum("matched_keys", alias_name="matched_keys"),
        )
    )


# ---------------------------------------------------------------------------
# CDC snapshot diff (the read side of merge_upsert's MERGE) and
# windowed stream dedup
# ---------------------------------------------------------------------------


def snapshot_diff(sf_dir: str) -> ray.data.Dataset:
    """Change-data-capture diff between the base documents snapshot and
    ``merge_upsert``'s deterministic synthetic delta (doc_id % 4 == 0
    rows re-written upper-case, brand-new rows at id+UPSERT_NEW_OFFSET
    for doc_id % 10 == 0): per doc_id emit status in
    {'added','updated','unchanged'} — the audit/report companion of the
    MERGE itself (what changed, not just who wins).

    Change detection is CONTENT-based, not provenance-based: both sides
    carry a 64-bit md5 content fingerprint (dedup's zero-copy
    ``_md5_prefix64``), so a delta row whose rewrite is a no-op (text
    with no letters) correctly reads 'unchanged', exactly like the
    oracle's string compare. Scale shape: tagged union of the two
    snapshots (no join, no global sort), ONE hash(doc_id) int-only
    bucket shuffle — text never leaves the fingerprint pass — and a
    vectorized two-run compare per bucket."""
    from ..pipeline import default_num_buckets
    from .dedup import _bucket_of, _md5_prefix64, _run_starts

    num_buckets = default_num_buckets()
    ensure_serializable()
    base = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def tag_base(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        fp = _md5_prefix64(pc.fill_null(batch["text"], ""))
        return pa.table(
            {
                "_db": pa.array(_bucket_of(ids, num_buckets=num_buckets)),
                "doc_id": pa.array(ids),
                "side": pa.array(np.zeros(ids.size, dtype=np.int64)),
                "fp": pa.array(fp),
            }
        )

    def tag_delta(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        text = pc.fill_null(batch["text"], "")
        # merge_upsert's delta exactly: BOTH row classes carry the
        # upper-cased rewrite (status is content-decided, so the new
        # rows' casing only matters for definitional parity).
        fp_upper = _md5_prefix64(pc.utf8_upper(text))
        upd = ids % 4 == 0
        new = ids % 10 == 0
        out_ids = np.concatenate([ids[upd], ids[new] + UPSERT_NEW_OFFSET])
        out_fp = np.concatenate([fp_upper[upd], fp_upper[new]])
        return pa.table(
            {
                "_db": pa.array(_bucket_of(out_ids, num_buckets=num_buckets)),
                "doc_id": pa.array(out_ids),
                "side": pa.array(np.ones(out_ids.size, dtype=np.int64)),
                "fp": pa.array(out_fp),
            }
        )

    both = base.map_batches(
        tag_base, batch_format="pyarrow", zero_copy_batch=True
    ).union(base.map_batches(tag_delta, batch_format="pyarrow", zero_copy_batch=True))

    def diff_bucket(group: pa.Table) -> pa.Table:
        t = group.sort_by(
            [("doc_id", "ascending"), ("side", "ascending")]
        ).combine_chunks()
        if t.num_rows == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "status": pa.array([], pa.string())}
            )
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        side = t["side"].to_numpy(zero_copy_only=False)
        fp = t["fp"].to_numpy(zero_copy_only=False)
        heads = np.flatnonzero(_run_starts(ids))
        run_len = np.diff(np.append(heads, ids.size))
        out_ids = ids[heads]
        # run of 1: base-only -> unchanged; delta-only -> added.
        # run of 2: rows are (base, delta) by the side sort; fp equal
        # -> unchanged (no-op rewrite), else updated.
        single = run_len == 1
        status = np.where(
            single,
            np.where(side[heads] == 0, "unchanged", "added"),
            np.where(
                fp[heads] == fp[np.minimum(heads + 1, ids.size - 1)],
                "unchanged",
                "updated",
            ),
        )
        return pa.table(
            {"doc_id": pa.array(out_ids), "status": pa.array(status)}
        )

    return both.groupby("_db").map_groups(
        lambda g: diff_bucket(g.drop_columns(["_db"])), batch_format="pyarrow"
    )


def dedup_events_windowed(sf_dir: str) -> ray.data.Dataset:
    """Tumbling-window stream dedup: within each (user_id, event_type,
    clock hour) keep the event with the smallest event_id and count how
    many the window collapsed — the at-least-once-delivery dedup every
    telemetry ingest runs before aggregation (the dedup cousin of
    ``hourly_active_users``'s windowed COUNT DISTINCT).

    Scale shape: min/count are algebraic, so per-batch group_by
    partials bound the shuffle by distinct (user, type, hour) keys per
    batch and the global groupby carries two int64s per key — the event
    stream itself never shuffles and no window buffer exists (contrast
    a streaming engine's keyed state: here the window key is just a
    derived column)."""
    from ray.data.aggregate import Min as _Min

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "event_type", "ts"])

    def partial(batch: pa.Table) -> pa.Table:
        hour = pc.divide(pc.cast(batch["ts"], pa.int64()), _US_PER_HOUR)
        g = (
            pa.table(
                {
                    "user_id": batch["user_id"],
                    "event_type": batch["event_type"],
                    "hour": hour,
                    "event_id": batch["event_id"],
                }
            )
            .group_by(["user_id", "event_type", "hour"])
            .aggregate([("event_id", "min"), ("event_id", "count")])
        )
        return pa.table(
            {
                "user_id": g["user_id"],
                "event_type": g["event_type"],
                "hour": g["hour"],
                "kept_event_id": g["event_id_min"],
                "n_events": pc.cast(g["event_id_count"], pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["user_id", "event_type", "hour"])
        .aggregate(
            _Min("kept_event_id", alias_name="kept_event_id"),
            Sum("n_events", alias_name="n_events"),
        )
    )


def cube_events(sf_dir: str) -> ray.data.Dataset:
    """GROUP BY CUBE(event_type, day): exact counts and cent-sums at
    all FOUR grains — (type, day), (type, ALL), (ALL, day), (ALL, ALL)
    — in one pass; the full-cross-grain companion of ``rollup_events``
    (ROLLUP nests, CUBE crosses: the (ALL, day) daily-total row is the
    one ROLLUP cannot produce).

    Same physical shape: the base (type, day) aggregate is the ONLY
    shuffle over the stream; all three coarser grains re-aggregate the
    tiny |types|x|days| base table in a single-block finalize."""
    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])
    ensure_serializable()

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "event_type": batch["event_type"],
                "day": pc.divide(pc.cast(batch["ts"], pa.int64()), DAY_US),
                "cents": _fixed_point(batch["value"], 100),
            }
        )
        return t.group_by(["event_type", "day"]).aggregate(
            [("cents", "count"), ("cents", "sum")]
        )

    base = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "day"])
        .aggregate(
            Sum("cents_count", alias_name="n"),
            Sum("cents_sum", alias_name="sum_cents"),
        )
    )

    def add_levels(batch: pa.Table) -> pa.Table:
        def roll(keys: list[str]) -> pa.Table:
            g = batch.group_by(keys).aggregate(
                [("n", "sum"), ("sum_cents", "sum")]
            )
            cols = {}
            for k in ("event_type", "day"):
                if k in keys:
                    cols[k] = g[k]
                elif k == "event_type":
                    cols[k] = pa.array([ROLLUP_ALL_TYPE] * g.num_rows, pa.string())
                else:
                    cols[k] = pa.array([ROLLUP_ALL] * g.num_rows, pa.int64())
            cols["n"] = g["n_sum"]
            cols["sum_cents"] = g["sum_cents_sum"]
            return pa.table(cols)

        grand = pa.table(
            {
                "event_type": pa.array([ROLLUP_ALL_TYPE], pa.string()),
                "day": pa.array([ROLLUP_ALL], pa.int64()),
                "n": pa.array([pc.sum(batch["n"]).as_py() or 0], pa.int64()),
                "sum_cents": pa.array(
                    [pc.sum(batch["sum_cents"]).as_py() or 0], pa.int64()
                ),
            }
        )
        cols = ["event_type", "day", "n", "sum_cents"]
        return pa.concat_tables(
            [batch.select(cols), roll(["event_type"]), roll(["day"]), grand]
        )

    return base.repartition(1).map_batches(
        add_levels, batch_format="pyarrow", zero_copy_batch=True
    )


def grouped_mode_events(sf_dir: str) -> ray.data.Dataset:
    """Per-user MODE of event_type with a total deterministic tie-break
    (count desc, type asc) — the statistical-mode aggregate Ray Data
    lacks natively, and the categorical cousin of ``top_event_per_user``
    (which argmaxes a VALUE; this one argmaxes a FREQUENCY).

    Scale shape: (user, type) count partials per batch bound the
    shuffle by users x types per batch; the per-user argmax runs
    vectorized on sorted run heads inside one hash(user) bucketed pass
    — no per-group Python, no global sort."""
    from ..pipeline import default_num_buckets
    from .dedup import _bucket_of, _run_starts

    num_buckets = default_num_buckets()
    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        g = (
            pa.table(
                {"user_id": batch["user_id"], "event_type": batch["event_type"]}
            )
            .group_by(["user_id", "event_type"])
            .aggregate([([], "count_all")])
        )
        u = g["user_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "_b": pa.array(_bucket_of(u, num_buckets=num_buckets)),
                "user_id": g["user_id"],
                "event_type": g["event_type"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    def mode_bucket(group: pa.Table) -> pa.Table:
        """All partials of a user share its bucket: sum per (user, type)
        via run reduction, then take each user's first row under the
        (n desc, type asc) total order."""
        t = group.sort_by(
            [("user_id", "ascending"), ("event_type", "ascending")]
        ).combine_chunks()
        if t.num_rows == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "mode_type": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        u = t["user_id"].to_numpy(zero_copy_only=False)
        ty = t["event_type"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False)
        heads = np.flatnonzero(_run_starts(u, ty))
        totals = np.add.reduceat(n, heads)
        gu, gty = u[heads], ty[heads]
        # per-user argmax by (count desc, type asc): rows are already
        # type-ascending per user, and np.lexsort is stable, so sorting
        # by (-totals) keeps type order among equal counts
        order = np.lexsort((-totals,))  # stable by count desc
        # stable lexsort on a single key preserves the existing
        # (user, type) order among equal counts; regroup per user
        gu2, gty2, gt2 = gu[order], gty[order], totals[order]
        order2 = np.argsort(gu2, kind="stable")
        gu3, gty3, gt3 = gu2[order2], gty2[order2], gt2[order2]
        first = np.flatnonzero(_run_starts(gu3))
        return pa.table(
            {
                "user_id": pa.array(gu3[first]),
                "mode_type": pa.array(gty3[first]),
                "n": pa.array(gt3[first]),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_b")
        .map_groups(
            lambda g: mode_bucket(g.drop_columns(["_b"])), batch_format="pyarrow"
        )
    )


def cum_distinct_types(
    sf_dir: str, num_buckets: int | None = None
) -> ray.data.Dataset:
    """Per-user cumulative DISTINCT event-type count over time — the
    novelty/exploration curve (how many distinct behaviors a user has
    exhibited by each event), i.e. COUNT(DISTINCT) as a running window,
    which no engine exposes directly: it decomposes into first-occurrence
    flags + a running sum, and that decomposition is exactly the
    distributed plan.

    Scale shape: one hash(user_id) bucket shuffle (the per-user window
    family's standard exchange); in-bucket, ONE lexsort by
    (user, type, ts, id) marks first occurrences, an inverse permutation
    restores (user, ts, id) order, and a segmented cumsum finishes —
    all vectorized, no per-group Python."""
    from ..pipeline import default_num_buckets
    from .dedup import _bucket_of, _run_starts

    if num_buckets is None:
        num_buckets = default_num_buckets()
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "event_type", "ts"])

    def tag(batch: pa.Table) -> pa.Table:
        u = batch["user_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "_b": pa.array(_bucket_of(u, num_buckets=num_buckets)),
                "event_id": batch["event_id"],
                "user_id": batch["user_id"],
                "event_type": batch["event_type"],
                "ts_us": pc.cast(batch["ts"], pa.int64()),
            }
        )

    def window_bucket(group: pa.Table) -> pa.Table:
        t = group.combine_chunks()
        if t.num_rows == 0:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "n_distinct_types": pa.array([], pa.int64()),
                }
            )
        u = t["user_id"].to_numpy(zero_copy_only=False)
        ty = t["event_type"].to_numpy(zero_copy_only=False)
        ts = t["ts_us"].to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        # first-occurrence flags in (user, type, ts, id) order
        occ = np.lexsort((eid, ts, ty, u))
        first = _run_starts(u[occ], ty[occ])
        flag = np.empty(len(u), dtype=np.int64)
        flag[occ] = first.astype(np.int64)
        # running sum in (user, ts, id) order
        time_order = np.lexsort((eid, ts, u))
        f_sorted = flag[time_order]
        run_heads = np.flatnonzero(_run_starts(u[time_order]))
        cum = np.cumsum(f_sorted)
        base = np.repeat(
            cum[run_heads] - f_sorted[run_heads],
            np.diff(np.append(run_heads, len(u))),
        )
        return pa.table(
            {
                "event_id": pa.array(eid[time_order]),
                "user_id": pa.array(u[time_order]),
                "n_distinct_types": pa.array(cum - base),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_b")
        .map_groups(
            lambda g: window_bucket(g.drop_columns(["_b"])),
            batch_format="pyarrow",
        )
    )


CHECKSUM_BUCKETS = 16


def table_checksums(sf_dir: str, num_buckets: int = CHECKSUM_BUCKETS) -> ray.data.Dataset:
    """Per-bucket content checksums of the documents table: XOR of each
    doc's 64-bit md5 content key within ``doc_id % num_buckets`` buckets
    plus the bucket count — the anti-entropy primitive replicated stores
    use to verify two copies of a table without shipping rows (compare
    2x16 small ints; a mismatched bucket pinpoints WHERE to repair,
    Merkle-style). XOR is commutative/associative, so the checksum is
    order-independent by construction — exactly why it is the right
    aggregate for a distributed engine.

    The 64-bit key is md5's first 8 bytes LITTLE-endian (matching
    DuckDB's ``md5_number_upper``), reinterpreted two's-complement;
    the bucket rule is plain doc_id modulus so the oracle is trivially
    the same partitioning (at corpus scale you'd bucket by the same
    hash your placement uses). Scale shape: per-batch XOR partials via
    one sort + reduceat, then a |buckets|-row groupby — nothing but
    the tiny checksum table ever shuffles."""
    import hashlib

    # bound OUTSIDE the UDF: a runtime relative import inside a
    # serialized-by-value closure fails on workers (verify-skill hazard)
    from .dedup import _run_starts

    ensure_serializable()
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def _md5_le64(chunked) -> np.ndarray:
        # dedup._md5_prefix64's zero-copy buffer walk, little-endian to
        # match DuckDB md5_number_upper
        md5 = hashlib.md5
        chunks = (
            chunked.chunks
            if isinstance(chunked, pa.ChunkedArray)
            else [chunked]
        )
        out: list = []
        for chunk in chunks:
            n = len(chunk)
            if not n:
                continue
            bufs = chunk.buffers()
            dt = np.int64 if pa.types.is_large_string(chunk.type) else np.int32
            off = chunk.offset
            offsets = np.frombuffer(bufs[1], dtype=dt, count=n + 1 + off)[off:]
            data = memoryview(bufs[2])
            out.extend(
                int.from_bytes(
                    md5(data[offsets[i]:offsets[i + 1]]).digest()[:8],
                    "little", signed=True,
                )
                for i in range(n)
            )
        return np.array(out, dtype=np.int64)

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sig = _md5_le64(pc.fill_null(batch["text"], ""))
        b = ids % num_buckets
        order = np.argsort(b, kind="stable")
        b_s, sig_s = b[order], sig[order]
        heads = np.flatnonzero(_run_starts(b_s))
        xors = np.bitwise_xor.reduceat(sig_s, heads)
        counts = np.diff(np.append(heads, b_s.size))
        return pa.table(
            {
                "bucket": pa.array(b_s[heads]),
                "checksum": pa.array(xors),
                "n_docs": pa.array(counts.astype(np.int64)),
            }
        )

    def combine(group: pa.Table) -> pa.Table:
        t = group.combine_chunks()
        return pa.table(
            {
                "bucket": pa.array([t["bucket"][0].as_py()], pa.int64()),
                "checksum": pa.array(
                    [int(np.bitwise_xor.reduce(
                        t["checksum"].to_numpy(zero_copy_only=False)))],
                    pa.int64(),
                ),
                "n_docs": pa.array(
                    [int(t["n_docs"].to_numpy(zero_copy_only=False).sum())],
                    pa.int64(),
                ),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(combine, batch_format="pyarrow")
    )


ATTRIB_CONVERSION = "purchase"


def session_attribution(
    sf_dir: str, num_buckets: int | None = None
) -> ray.data.Dataset:
    """FIRST-TOUCH attribution: every conversion (``purchase`` event) is
    credited to the event_type that OPENED its 30-minute-gap session —
    the marketing/product attribution roll-up that turns the
    sessionization primitive into a report (which entry behavior leads
    to purchases). Sessions follow ``sessionized_events``' gap rule
    exactly; within-timestamp ties order by event_id so first-touch is
    total and engine-independent.

    Scale shape: one hash(user_id) bucket shuffle (all of a user's
    events co-locate); per bucket ONE vectorized sort + session-start
    repeat; conversions reduce to (first_type, count, cents) partials
    and a |types|-keyed groupby finishes."""
    from ..pipeline import default_num_buckets
    from .dedup import _bucket_of

    if num_buckets is None:
        num_buckets = default_num_buckets()
    ds = _read(
        sf_dir, "events",
        columns=["event_id", "user_id", "ts", "event_type", "value"],
    )

    def tag(batch: pa.Table) -> pa.Table:
        u = batch["user_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "_b": pa.array(_bucket_of(u, num_buckets=num_buckets)),
                "event_id": batch["event_id"],
                "user_id": batch["user_id"],
                "ts_us": pc.cast(batch["ts"], pa.int64()),
                "event_type": batch["event_type"],
                "cents": _fixed_point(batch["value"], 100),
            }
        )

    def attribute(group: pa.Table) -> pa.Table:
        t = group.combine_chunks()
        empty = pa.table(
            {
                "first_type": pa.array([], pa.string()),
                "n_purchases": pa.array([], pa.int64()),
                "sum_cents": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["ts_us"].to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        uid, ts, eid = uid[order], ts[order], eid[order]
        ty = t["event_type"].to_numpy(zero_copy_only=False)[order]
        cents = t["cents"].to_numpy(zero_copy_only=False)[order]
        n = uid.size
        is_new = np.empty(n, dtype=bool)
        is_new[0] = True
        is_new[1:] = (uid[1:] != uid[:-1]) | (
            ts[1:] - ts[:-1] > SESSION_GAP_US
        )
        starts = np.flatnonzero(is_new)
        first_type = np.repeat(ty[starts], np.diff(np.append(starts, n)))
        conv = ty == ATTRIB_CONVERSION
        if not conv.any():
            return empty
        g = (
            pa.table(
                {
                    "first_type": pa.array(first_type[conv]),
                    "cents": pa.array(cents[conv]),
                }
            )
            .group_by(["first_type"])
            .aggregate([("cents", "count"), ("cents", "sum")])
        )
        return pa.table(
            {
                "first_type": g["first_type"],
                "n_purchases": pc.cast(g["cents_count"], pa.int64()),
                "sum_cents": g["cents_sum"],
            }
        )

    partials = (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_b")
        .map_groups(
            lambda g: attribute(g.drop_columns(["_b"])),
            batch_format="pyarrow",
        )
    )
    return partials.groupby("first_type").aggregate(
        Sum("n_purchases", alias_name="n_purchases"),
        Sum("sum_cents", alias_name="sum_cents"),
    )


LTV_TILES = 10


def ltv_deciles(sf_dir: str) -> ray.data.Dataset:
    """Customer lifetime-value deciles: per-user total event value
    (exact cents), globally ranked by (total desc) with TIES SHARING a
    rank (SQL ``rank()``), decile = ((rank-1)*10)//n_users + 1 — the
    equal-frequency customer segmentation every growth team cuts.

    The interesting shape is GLOBAL VALUE-RANKING WITHOUT A GLOBAL
    SORT: rank(u) = 1 + count of users with a larger total, which the
    cents HISTOGRAM answers — per-batch (total, count) partials, one
    groupby bounded by DISTINCT totals (the value domain, not the user
    count; same posture as quantile_events_value), a driver descending
    cumsum over that histogram, and one broadcast searchsorted pass
    assigns every user's rank. Ties sharing a rank is what makes this
    histogram-only — row_number semantics would additionally need
    in-tie ordering (shuffle_export's hash-rank machinery)."""
    from ray.data.aggregate import Sum as _Sum

    ds = _read(sf_dir, "events", columns=["user_id", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        return (
            pa.table(
                {
                    "user_id": batch["user_id"],
                    "cents": _fixed_point(batch["value"], 100),
                }
            )
            .group_by(["user_id"])
            .aggregate([("cents", "sum")])
            .rename_columns(["user_id", "cents"])
        )

    totals = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("user_id")
        .aggregate(_Sum("cents", alias_name="total_cents"))
        .materialize()  # read twice: histogram pass + assignment pass
    )

    def hist_partial(batch: pa.Table) -> pa.Table:
        return (
            pa.table({"total_cents": batch["total_cents"]})
            .group_by(["total_cents"])
            .aggregate([([], "count_all")])
            .rename_columns(["total_cents", "n"])
        )

    hist = (
        totals.map_batches(
            hist_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("total_cents")
        .aggregate(_Sum("n", alias_name="n"))
        .to_pandas()  # bounded by distinct totals (value domain)
        .sort_values("total_cents", ascending=False)
    )
    values_desc = hist["total_cents"].to_numpy()
    counts = hist["n"].to_numpy()
    n_users = int(counts.sum())
    # rank of the FIRST user at each distinct value, descending
    rank_base = np.concatenate([[1], 1 + np.cumsum(counts[:-1])])
    values_asc = values_desc[::-1].copy()
    rank_asc = rank_base[::-1].copy()

    def assign(batch: pa.Table) -> pa.Table:
        tc = batch["total_cents"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(values_asc, tc)
        if (values_asc[np.clip(pos, 0, values_asc.size - 1)] != tc).any():
            raise ValueError("ltv_deciles: total missing from histogram")
        rank = rank_asc[pos]
        decile = (rank - 1) * LTV_TILES // n_users + 1
        return pa.table(
            {
                "user_id": batch["user_id"],
                "total_cents": batch["total_cents"],
                "decile": pa.array(decile.astype(np.int64)),
            }
        )

    return totals.map_batches(
        assign, batch_format="pyarrow", zero_copy_batch=True
    )


PATH_TOP_K = 20


def event_path_trigrams(sf_dir: str, k: int = PATH_TOP_K) -> ray.data.Dataset:
    """Top-k behavioral paths: corpus-wide counts of CONSECUTIVE
    event-type triples per user (ordered by ts, event_id) — the
    "common 3-step journeys" product-analytics report, i.e.
    ``bigram_counts``' adjacency machinery lifted from word streams to
    per-user event streams.

    Scale shape: one hash(user_id) bucket shuffle; per bucket one
    vectorized sort + two shifted views count triples batch-locally
    (adjacency never crosses a user), bounding the global groupby by
    |types|^3; (n desc, t1..t3 asc) pins the k-boundary."""
    from ray.data.aggregate import Sum as _Sum
    from ..pipeline import default_num_buckets
    from .dedup import _bucket_of

    num_buckets = default_num_buckets()
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "event_type", "ts"])

    def tag(batch: pa.Table) -> pa.Table:
        u = batch["user_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "_b": pa.array(_bucket_of(u, num_buckets=num_buckets)),
                "event_id": batch["event_id"],
                "user_id": batch["user_id"],
                "event_type": batch["event_type"],
                "ts_us": pc.cast(batch["ts"], pa.int64()),
            }
        )

    def triples(group: pa.Table) -> pa.Table:
        t = group.combine_chunks()
        empty = pa.table(
            {"t1": pa.array([], pa.string()), "t2": pa.array([], pa.string()),
             "t3": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
        )
        if t.num_rows < 3:
            return empty
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["ts_us"].to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        uid = uid[order]
        ty = t["event_type"].to_numpy(zero_copy_only=False)[order]
        ok = (uid[:-2] == uid[1:-1]) & (uid[1:-1] == uid[2:])
        if not ok.any():
            return empty
        g = (
            pa.table(
                {"t1": pa.array(ty[:-2][ok]), "t2": pa.array(ty[1:-1][ok]),
                 "t3": pa.array(ty[2:][ok])}
            )
            .group_by(["t1", "t2", "t3"])
            .aggregate([([], "count_all")])
            .rename_columns(["t1", "t2", "t3", "n"])
        )
        return g.set_column(3, "n", pc.cast(g["n"], pa.int64()))

    counts = (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_b")
        .map_groups(
            lambda g: triples(g.drop_columns(["_b"])), batch_format="pyarrow"
        )
        .groupby(["t1", "t2", "t3"])
        .aggregate(_Sum("n", alias_name="n"))
    )
    return counts.sort(
        ["n", "t1", "t2", "t3"], descending=[True, False, False, False]
    ).limit(k)


def order_fill_latency(
    sf_dir: str, num_buckets: int | None = None
) -> ray.data.Dataset:
    """Order-fulfillment latency histogram: days from o_orderdate to the
    order's LAST lineitem ship date, counted per whole-day gap — the
    operational-latency distribution (the supply-chain cousin of
    ``time_to_conversion``'s event-funnel latency). Exact integer days:
    both timestamps are midnight-aligned, so the gap is an exact
    ``(ship_us - order_us) // DAY_US``.

    Scale shape: the q12 co-location idiom — lineitem pre-reduces
    (orderkey, max ship) per batch, orders ship (orderkey, orderdate)
    rows, both hash(orderkey) into ONE bucket exchange; per bucket a
    single sort + run-max joins the sides vectorized; day-gap counts
    leave as bounded (days, n) partials."""
    from ..pipeline import default_num_buckets
    from .dedup import _run_starts  # bound outside the UDF closures

    if num_buckets is None:
        num_buckets = default_num_buckets()
    ensure_serializable()
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderdate"],
    )
    line = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_shipdate"],
    )

    def tag_orders(batch: pa.Table) -> pa.Table:
        okey = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "_b": pa.array((okey % num_buckets).astype(np.int32)),
                "okey": pa.array(okey),
                "ts_us": pc.cast(batch["o_orderdate"], pa.int64()),
                "side": pa.array(np.zeros(okey.size, dtype=np.int8)),
            }
        )

    def tag_line(batch: pa.Table) -> pa.Table:
        g = (
            pa.table(
                {
                    "okey": batch["l_orderkey"],
                    "ship_us": pc.cast(batch["l_shipdate"], pa.int64()),
                }
            )
            .group_by(["okey"])
            .aggregate([("ship_us", "max")])
        )
        ok = g["okey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "_b": pa.array((ok % num_buckets).astype(np.int32)),
                "okey": pa.array(ok),
                "ts_us": g["ship_us_max"],
                "side": pa.array(np.ones(len(g), dtype=np.int8)),
            }
        )

    tagged = orders.map_batches(
        tag_orders, batch_format="pyarrow", zero_copy_batch=True
    ).union(line.map_batches(tag_line, batch_format="pyarrow", zero_copy_batch=True))

    def latency_bucket(group: pa.Table) -> pa.Table:
        t = group.sort_by(
            [("okey", "ascending"), ("side", "ascending")]
        ).combine_chunks()
        empty = pa.table(
            {"days": pa.array([], pa.int64()),
             "n_orders": pa.array([], pa.int64())}
        )
        if t.num_rows == 0:
            return empty
        okey = t["okey"].to_numpy(zero_copy_only=False)
        ts = t["ts_us"].to_numpy(zero_copy_only=False)
        side = t["side"].to_numpy(zero_copy_only=False)
        heads = np.flatnonzero(_run_starts(okey))
        run_len = np.diff(np.append(heads, okey.size))
        # runs: (order row first by side sort, then lineitem partials);
        # orders without lineitems contribute single-row runs -> skip
        has_line = run_len > 1
        if not has_line.any():
            return empty
        if (side[heads] != 0).any():
            raise ValueError("order_fill_latency: lineitem without order")
        order_us = ts[heads][has_line]
        # per-run max over the LINEITEM rows only: mask the order-date
        # head out of the reduceat so a (pathological) ship < order gap
        # stays negative instead of silently clamping to zero
        ts_line = ts.copy()
        ts_line[heads] = np.iinfo(np.int64).min
        ship_us = np.maximum.reduceat(ts_line, heads)[has_line]
        days = (ship_us - order_us) // DAY_US
        du, dc = np.unique(days, return_counts=True)
        return pa.table(
            {"days": pa.array(du.astype(np.int64)),
             "n_orders": pa.array(dc.astype(np.int64))}
        )

    return (
        tagged.groupby("_b")
        .map_groups(
            lambda g: latency_bucket(g.drop_columns(["_b"])),
            batch_format="pyarrow",
        )
        .groupby("days")
        .aggregate(Sum("n_orders", alias_name="n_orders"))
    )
