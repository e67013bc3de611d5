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

from .._rayutil import ensure_serializable


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    ensure_serializable()
    return ray.data.read_parquet(
        os.path.join(sf_dir, f"{table}.parquet"), columns=columns
    )


def pricing_summary(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q1-shaped pricing summary over lineitem (usage-counter analog,
    SURVEY A2). Predicate pushed to the read; partial sums per batch."""
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=[
            "l_returnflag", "l_linestatus", "l_quantity",
            "l_extendedprice", "l_discount", "l_tax", "l_shipdate",
        ],
        filter=(pc.field("l_shipdate") <= pa.scalar(np.datetime64("1998-09-02", "us"))),
    )

    def partial(batch: pa.Table) -> pa.Table:
        disc_price = pc.multiply(
            batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"])
        )
        charge = pc.multiply(disc_price, pc.add(pa.scalar(1.0), batch["l_tax"]))
        batch = pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "qty": batch["l_quantity"],
                "base_price": batch["l_extendedprice"],
                "disc_price": disc_price,
                "charge": charge,
                "discount": batch["l_discount"],
            }
        )
        return batch.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [
                ("qty", "sum"), ("base_price", "sum"), ("disc_price", "sum"),
                ("charge", "sum"), ("discount", "sum"), ("qty", "count"),
            ]
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    agg = partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("qty_sum", alias_name="sum_qty"),
        Sum("base_price_sum", alias_name="sum_base_price"),
        Sum("disc_price_sum", alias_name="sum_disc_price"),
        Sum("charge_sum", alias_name="sum_charge"),
        Sum("discount_sum", alias_name="_sum_disc"),
        Sum("qty_count", alias_name="count_order"),
    )

    def finalize(batch: pa.Table) -> pa.Table:
        n = pc.cast(batch["count_order"], pa.float64())
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "sum_qty": batch["sum_qty"],
                "sum_base_price": batch["sum_base_price"],
                "sum_disc_price": batch["sum_disc_price"],
                "sum_charge": batch["sum_charge"],
                "avg_qty": pc.divide(batch["sum_qty"], n),
                "avg_price": pc.divide(batch["sum_base_price"], n),
                "avg_disc": pc.divide(batch["_sum_disc"], n),
                "count_order": batch["count_order"],
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


def _stage_partials(batch: pa.Table) -> pa.Table:
    return (
        pa.table({"event_type": batch["event_type"], "value": batch["value"]})
        .group_by(["event_type"])
        .aggregate(
            [("value", "count"), ("value", "sum"), ("value", "min"), ("value", "max")]
        )
    )


def stage_totals(sf_dir: str) -> ray.data.Dataset:
    """Per-stage count/total/min/max over events — the bench stage roll-up
    verbatim (SURVEY A1; /root/reference/crates/cli/src/bench.rs:139-172)."""
    ds = _read(sf_dir, "events", columns=["event_type", "value"])
    partials = ds.map_batches(_stage_partials, batch_format="pyarrow", zero_copy_batch=True)
    return partials.groupby("event_type").aggregate(
        Sum("value_count", alias_name="n_events"),
        Sum("value_sum", alias_name="total_value"),
        Min("value_min", alias_name="min_value"),
        Max("value_max", alias_name="max_value"),
    )


def top_stages(sf_dir: str, k: int = 3) -> ray.data.Dataset:
    """Top-k stages by total value desc (SURVEY O3: bench top-10)."""
    return stage_totals(sf_dir).sort("total_value", descending=True).limit(k)


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
                "o_totalprice": batch["o_totalprice"],
            }
        )
        return (
            out.group_by(["c_mktsegment"])
            .aggregate([("o_totalprice", "count"), ("o_totalprice", "sum")])
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
        concurrency=(1, 4),
        num_cpus=1,
    )
    return partials.groupby("c_mktsegment").aggregate(
        Sum("o_totalprice_count", alias_name="n_orders"),
        Sum("o_totalprice_sum", alias_name="revenue"),
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
            {"user_id": batch["user_id"], "window_start": window, "value": batch["value"]}
        )
        return t.group_by(["user_id", "window_start"]).aggregate(
            [("value", "count"), ("value", "sum")]
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return partials.groupby(["user_id", "window_start"]).aggregate(
        Sum("value_count", alias_name="n_events"),
        Sum("value_sum", alias_name="sum_value"),
    )


SESSION_GAP_US = 1_800_000_000  # 30 min


def sessionized_events(sf_dir: str, num_buckets: int = 64) -> ray.data.Dataset:
    """Gap-based sessionization (the streaming-shaped workload pattern from
    the Ray guide): events bucketed by hash(user_id), per-bucket vectorized
    session assignment over (user_id, ts)-sorted rows. A new session starts
    at the first event of a user or after a >30min gap.

    Partitioning assumption: all of a user's events co-locate in one
    bucket; session numbering is per user (1-based), matching the SQL
    window-function oracle exactly."""
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
                 "sum_value": pa.array([], pa.float64())}
            )
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        val = t.column("value").to_numpy(zero_copy_only=False)
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
                "sum_value": pa.array(sums, pa.float64()),
            }
        )

    bucketed = ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
    return bucketed.groupby("_ub").map_groups(
        lambda g: sessionize(g.drop_columns(["_ub"])), batch_format="pyarrow"
    )


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
