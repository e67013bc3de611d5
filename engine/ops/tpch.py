"""Remaining TPC-H query shapes, adapted to the fixture schema.

The fixture lacks ``partsupp`` and the ship/commit/receipt-date trio, so
each query keeps its reference TPC-H *physical shape* (the join/agg
topology that stresses the engine) while substituting available columns;
the DuckDB oracle in ``__ray_entry__.oracle_sql()`` runs the identical
adapted semantics, so the comparison is still bit-exact.

Scale discipline (same as engine/ops/relational.py):
- every oracle-compared number is exact int64 fixed point quantized per
  element (see ``relational._fixed_point``) — no float ever reaches an
  oracle-compared column;
- dimension tables (part, supplier, nation) broadcast ONCE via
  ``ray.put`` as sorted-key numpy lookup arrays, probed with
  ``np.searchsorted`` per batch — never re-shipped per batch, never a
  shuffle;
- fact-fact co-location (lineitem x orders) uses the one shared
  int-keyed bucket shuffle (``union`` + ``groupby("_b")``), with
  per-batch partial aggregation BEFORE the shuffle wherever the group
  key is available pre-join.

Reference parity notes: the reference has no relational engine; these
queries extend the usage-counter / stage-total aggregation surface
(SURVEY A1-A5, /root/reference/crates/cli/src/bench.rs:139-172) to the
full TPC-H topology family the north rule's 100 TB corpus needs.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Sum

from .._rayutil import ensure_serializable
from .relational import _fixed_point, _read

_US_PER_DAY = 86_400_000_000


def _ts_us(col) -> np.ndarray:
    """timestamp[us] column -> int64 epoch microseconds."""
    return pc.cast(col, pa.int64()).to_numpy(zero_copy_only=False)


def _sorted_lookup(keys: np.ndarray, vals: np.ndarray):
    order = np.argsort(keys)
    return keys[order], vals[order]


def _pin_empty_schema(ds, dtypes: dict):
    """Eager-materialize a BOUNDED aggregate result, pinning its column
    schema when it comes back empty (an empty Ray aggregate drops its
    schema entirely). Only for results whose row count is bounded by a
    small key domain (|nations x years| etc.) — never for corpus-scale
    datasets. ``dtypes``: output column -> pandas/numpy dtype."""
    import pandas as pd

    out = ds.to_pandas()
    if out.empty:
        out = pd.DataFrame({c: pd.Series([], dtype=dt) for c, dt in dtypes.items()})
    return out


def _probe_i64(sorted_keys: np.ndarray, vals: np.ndarray, probe: np.ndarray,
               missing: int = -1) -> np.ndarray:
    """Vectorized hash-join probe against a broadcast sorted-key table."""
    if sorted_keys.size == 0:
        return np.full(probe.shape, missing, dtype=vals.dtype)
    pos = np.clip(np.searchsorted(sorted_keys, probe), 0, sorted_keys.size - 1)
    return np.where(sorted_keys[pos] == probe, vals[pos], missing)


# ---------------------------------------------------------------------------
# Q15: top supplier by quarterly revenue (argmax with ties via max join-back)
# ---------------------------------------------------------------------------

Q15_START = np.datetime64("1996-01-01", "us")
Q15_END = np.datetime64("1996-04-01", "us")


def q15_top_supplier(sf_dir: str):
    """TPC-H Q15 shape: revenue per supplier over one quarter, then the
    supplier(s) achieving the global maximum.

    Physical plan: pruned+filtered lineitem read -> per-batch partial
    group-by(l_suppkey) -> one native groupby shuffle (one row per
    (suppkey, batch)) -> driver-side max over the |suppliers| result
    (tiny vs the fact table) -> equality filter -> supplier attributes
    attached from a ray.put broadcast (dimension side)."""
    ensure_serializable()
    import pyarrow.parquet as pq

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=(
            (pc.field("l_shipdate") >= pa.scalar(Q15_START))
            & (pc.field("l_shipdate") < pa.scalar(Q15_END))
        ),
    )

    def partial(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(
            _fixed_point(batch["l_extendedprice"], 100),
            pc.subtract(pa.scalar(100), _fixed_point(batch["l_discount"], 100)),
        )
        return (
            pa.table({"s_suppkey": batch["l_suppkey"], "rev_e4": rev})
            .group_by(["s_suppkey"])
            .aggregate([("rev_e4", "sum")])
        )

    rev = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("s_suppkey")
        .aggregate(Sum("rev_e4_sum", alias_name="total_rev_e4"))
        # materialize the |suppliers|-row AGGREGATE (never the fact
        # table) so max + filter don't re-run the lineitem scan twice
        .materialize()
    )
    best = rev.max("total_rev_e4")
    if best is None:  # empty quarter: pin the output schema
        import pandas as pd

        return pd.DataFrame(
            {
                "s_suppkey": pd.Series([], dtype=np.int64),
                "s_name": pd.Series([], dtype=object),
                "acctbal_cents": pd.Series([], dtype=np.int64),
                "total_rev_e4": pd.Series([], dtype=np.int64),
            }
        )
    top = rev.filter(expr=f"total_rev_e4 == {int(best)}")

    supp = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_name", "s_acctbal"],
    )
    skeys = supp["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(skeys)
    skeys = skeys[order]
    snames = supp["s_name"].to_numpy(zero_copy_only=False)[order]
    scents = (
        pc.cast(
            pc.round(pc.multiply(supp["s_acctbal"], 100.0),
                     round_mode="half_towards_infinity"),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)[order]
    )
    side = ray.put((skeys, snames, scents))

    def attach(batch: pa.Table) -> pa.Table:
        keys, names, cents = ray.get(side)
        k = batch["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        # inner-join semantics: an unmatched suppkey DROPS (matches the
        # oracle's JOIN supplier), never emits a blank left-join row.
        # Probe POSITIONS through the shared broadcast-probe helper.
        pos = _probe_i64(keys, np.arange(keys.size, dtype=np.int64), k)
        hit = pos >= 0
        k, pos = k[hit], pos[hit]
        return pa.table(
            {
                "s_suppkey": pa.array(k),
                "s_name": pa.array([str(names[p]) for p in pos], pa.string()),
                "acctbal_cents": pa.array(cents[pos]),
                "total_rev_e4": batch["total_rev_e4"].filter(pa.array(hit)),
            }
        )

    return top.map_batches(attach, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Q17: small-quantity-order revenue (correlated per-group avg join-back)
# ---------------------------------------------------------------------------

Q17_BRAND = "Brand#12"


def q17_small_qty_revenue(sf_dir: str):
    """TPC-H Q17 shape: revenue from lineitems whose quantity is below
    20% of the per-part average, for one brand's parts.

    The correlated subquery becomes two streaming passes with NO
    shuffle of fact rows: (1) per-part (sum_qty, n) aggregated with the
    partial-combine discipline — the result is |brand parts| rows,
    collected and re-broadcast; (2) a second lineitem pass keeps rows by
    the integer cross-multiplied predicate qty * 5 * n < sum_qty (exact:
    never divides), summing cents per batch. The avg comparison is
    integer-exact on both engine and oracle."""
    ensure_serializable()
    import pandas as pd
    import pyarrow.parquet as pq

    part = pq.read_table(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_brand"]
    )
    pk = part.filter(pc.equal(part["p_brand"], Q17_BRAND))["p_partkey"]
    brand_keys = np.sort(pk.to_numpy(zero_copy_only=False).astype(np.int64))
    keys_ref = ray.put(brand_keys)

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    )

    def stats_partial(batch: pa.Table) -> pa.Table:
        keys = ray.get(keys_ref)
        k = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.clip(np.searchsorted(keys, k), 0, max(keys.size - 1, 0))
        hit = keys.size > 0
        keep = (keys[pos] == k) if hit else np.zeros(k.shape, dtype=bool)
        t = batch.filter(pa.array(keep))
        if t.num_rows == 0:
            return pa.table(
                {"l_partkey": pa.array([], pa.int64()),
                 "qty_sum": pa.array([], pa.int64()),
                 "qty_count": pa.array([], pa.int64())}
            )
        qty = _fixed_point(t["l_quantity"], 1)
        out = (
            pa.table({"l_partkey": pc.cast(t["l_partkey"], pa.int64()), "qty": qty})
            .group_by(["l_partkey"])
            .aggregate([("qty", "sum"), ("qty", "count")])
        )
        return pa.table(
            {"l_partkey": out["l_partkey"], "qty_sum": out["qty_sum"],
             "qty_count": pc.cast(out["qty_count"], pa.int64())}
        )

    stats = (
        ds.map_batches(stats_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("l_partkey")
        .aggregate(Sum("qty_sum", alias_name="sq"),
                   Sum("qty_count", alias_name="n"))
        .to_pandas()  # |brand parts| rows — the dimension subset, tiny
    )
    sk = stats["l_partkey"].to_numpy().astype(np.int64)
    order = np.argsort(sk)
    stats_ref = ray.put(
        (sk[order], stats["sq"].to_numpy()[order], stats["n"].to_numpy()[order])
    )

    def keep_partial(batch: pa.Table) -> pa.Table:
        keys, sq, n = ray.get(stats_ref)
        k = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        if keys.size == 0:
            return pa.table({"cents": pa.array([], pa.int64())})
        pos = np.clip(np.searchsorted(keys, k), 0, keys.size - 1)
        hit = keys[pos] == k
        qty = _fixed_point(batch["l_quantity"], 1).to_numpy(zero_copy_only=False)
        keep = hit & (qty * 5 * n[pos] < sq[pos])
        cents = _fixed_point(batch["l_extendedprice"], 100).to_numpy(
            zero_copy_only=False
        )
        total = int(cents[keep].sum())
        return pa.table({"cents": pa.array([total], pa.int64())})

    partials = ds.map_batches(
        keep_partial, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()  # one row per batch
    total = int(partials["cents"].sum()) if len(partials) else 0
    return pd.DataFrame(
        {"total_cents": [total], "avg_yearly_cents": [total // 7]}
    ).astype(np.int64)


# ---------------------------------------------------------------------------
# Q12: late-shipment counts by order priority (fact-fact co-location)
# ---------------------------------------------------------------------------

Q12_LATE_DAYS = 90


def q12_late_shipments(sf_dir: str, num_buckets: int | None = None):
    """TPC-H Q12 shape: per order priority, how many lineitems shipped,
    and how many shipped more than 90 days after the order date.

    Lateness needs a column from each side of the lineitem x orders
    join, so the rows co-locate on ONE hash(orderkey) bucket shuffle
    (the q3/q7 union idiom). The lineitem side pre-aggregates to
    (okey, ship_day) counts per batch — lineitems of one order cluster
    on a few ship days, so the shuffle moves grouped counts, not raw
    rows. Priority strings ride the (smaller) orders side and are
    dictionary-encoded by Arrow in transit."""
    from ..pipeline import default_num_buckets

    if num_buckets is None:
        num_buckets = default_num_buckets()
    ensure_serializable()

    line = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_shipdate"],
    )
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    )

    def tag_line(batch: pa.Table) -> pa.Table:
        okey = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ship = _ts_us(batch["l_shipdate"])
        agg = (
            pa.table({"okey": pa.array(okey), "ship_us": pa.array(ship)})
            .group_by(["okey", "ship_us"])
            .aggregate([([], "count_all")])
        )
        ok = agg["okey"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "_b": pa.array((ok % num_buckets).astype(np.int32)),
                "okey": agg["okey"],
                "ship_us": agg["ship_us"],
                "n": pc.cast(agg["count_all"], pa.int64()),
                "prio": pa.array([""] * len(agg), pa.string()),
            }
        )

    def tag_orders(batch: pa.Table) -> pa.Table:
        okey = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "_b": pa.array((okey % num_buckets).astype(np.int32)),
                "okey": pa.array(okey),
                "ship_us": pa.array(_ts_us(batch["o_orderdate"])),
                "n": pa.array(np.full(okey.size, -1, dtype=np.int64)),
                "prio": batch["o_orderpriority"],
            }
        )

    tagged = line.map_batches(
        tag_line, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        orders.map_batches(tag_orders, batch_format="pyarrow", zero_copy_batch=True)
    )

    def join_bucket(group: pa.Table) -> pa.Table:
        t = group.combine_chunks()
        n = t["n"].to_numpy(zero_copy_only=False)
        is_order = n < 0
        okey = t["okey"].to_numpy(zero_copy_only=False)
        o_keys = okey[is_order]
        empty = pa.table(
            {"o_orderpriority": pa.array([], pa.string()),
             "n_lineitems": pa.array([], pa.int64()),
             "n_late": pa.array([], pa.int64())}
        )
        if o_keys.size == 0 or is_order.all():
            return empty
        order_sort = np.argsort(o_keys)
        o_sorted = o_keys[order_sort]
        o_date = t["ship_us"].to_numpy(zero_copy_only=False)[is_order][order_sort]
        o_prio = np.asarray(
            t["prio"].to_numpy(zero_copy_only=False)[is_order]
        )[order_sort]
        l_ok = okey[~is_order]
        pos = np.clip(np.searchsorted(o_sorted, l_ok), 0, o_sorted.size - 1)
        hit = o_sorted[pos] == l_ok
        if not hit.any():
            return empty
        ship = t["ship_us"].to_numpy(zero_copy_only=False)[~is_order][hit]
        cnt = n[~is_order][hit]
        odate = o_date[pos[hit]]
        prio = o_prio[pos[hit]]
        late = ship > odate + Q12_LATE_DAYS * _US_PER_DAY
        agg = (
            pa.table(
                {
                    "o_orderpriority": pa.array(prio.tolist(), pa.string()),
                    "n_lineitems": pa.array(cnt),
                    "n_late": pa.array(np.where(late, cnt, 0)),
                }
            )
            .group_by(["o_orderpriority"])
            .aggregate([("n_lineitems", "sum"), ("n_late", "sum")])
        )
        return pa.table(
            {
                "o_orderpriority": agg["o_orderpriority"],
                "n_lineitems": agg["n_lineitems_sum"],
                "n_late": agg["n_late_sum"],
            }
        )

    per_bucket = tagged.groupby("_b").map_groups(
        lambda g: join_bucket(g.drop_columns(["_b"])), batch_format="pyarrow"
    )
    return per_bucket.groupby("o_orderpriority").aggregate(
        Sum("n_lineitems", alias_name="n_lineitems"),
        Sum("n_late", alias_name="n_late"),
    )


# ---------------------------------------------------------------------------
# Q22: idle high-balance customers (scalar subquery + anti join)
# ---------------------------------------------------------------------------


def q22_idle_customers(sf_dir: str, num_buckets: int | None = None):
    """TPC-H Q22 shape: customers with above-average (positive) account
    balance and NO urgent order, grouped by nation. (The fixture's
    order coverage is dense — every customer has SOME order — so the
    idleness predicate is "no 1-URGENT order", keeping the anti-join
    non-degenerate while preserving Q22's scalar-subquery + anti-join
    topology.)

    The scalar subquery (global avg of positive balances) streams to two
    int64 scalars, then the comparison runs as an exact integer
    cross-multiplication (cents * n_pos > sum_pos_cents) — no division,
    no float, bit-identical on both engines. The NOT-IN becomes the
    bucketed anti join (per-batch DISTINCT o_custkey on the probe side,
    one hash(custkey) shuffle), then a tiny groupby(nation)."""
    from ..pipeline import default_num_buckets

    if num_buckets is None:
        num_buckets = default_num_buckets()
    ensure_serializable()

    # customer streams TWICE (stats pass, then the anti-join pass) by
    # CHOICE: customer is fact-sized at 100 TB, so two streaming scans
    # beat pinning the whole table in the object store (materialize is
    # for iterative algorithms over the SMALLER side, kmeans-style)
    cust_cols = ["c_custkey", "c_nationkey", "c_acctbal"]
    cust = _read(sf_dir, "customer", columns=cust_cols)

    def bal_partial(batch: pa.Table) -> pa.Table:
        cents = _fixed_point(batch["c_acctbal"], 100).to_numpy(zero_copy_only=False)
        pos = cents[cents > 0]
        return pa.table(
            {"s": pa.array([int(pos.sum())], pa.int64()),
             "n": pa.array([int(pos.size)], pa.int64())}
        )

    bal = cust.map_batches(
        bal_partial, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()  # one row per batch
    sum_pos, n_pos = int(bal["s"].sum()), int(bal["n"].sum())

    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey"],
        filter=(pc.field("o_orderpriority") == "1-URGENT"),
    )

    def tag_cust(batch: pa.Table) -> pa.Table:
        cents = _fixed_point(batch["c_acctbal"], 100).to_numpy(zero_copy_only=False)
        keep = cents * n_pos > sum_pos
        t = batch.filter(pa.array(keep))
        key = t["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "_b": pa.array((key % num_buckets).astype(np.int32)),
                "key": pa.array(key),
                "nation": pc.cast(t["c_nationkey"], pa.int64()),
                "cents": pa.array(cents[keep]),
                "is_probe": pa.array(np.zeros(key.size, dtype=np.int8)),
            }
        )

    def tag_orders(batch: pa.Table) -> pa.Table:
        key = pc.unique(batch["o_custkey"]).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        return pa.table(
            {
                "_b": pa.array((key % num_buckets).astype(np.int32)),
                "key": pa.array(key),
                "nation": pa.array(np.zeros(key.size, dtype=np.int64)),
                "cents": pa.array(np.zeros(key.size, dtype=np.int64)),
                "is_probe": pa.array(np.ones(key.size, dtype=np.int8)),
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
        if out.num_rows == 0:
            return pa.table(
                {"c_nationkey": pa.array([], pa.int64()),
                 "n_customers": pa.array([], pa.int64()),
                 "total_cents": pa.array([], pa.int64())}
            )
        agg = (
            pa.table({"c_nationkey": out["nation"], "cents": out["cents"]})
            .group_by(["c_nationkey"])
            .aggregate([([], "count_all"), ("cents", "sum")])
        )
        return pa.table(
            {
                "c_nationkey": agg["c_nationkey"],
                "n_customers": pc.cast(agg["count_all"], pa.int64()),
                "total_cents": agg["cents_sum"],
            }
        )

    per_bucket = tagged.groupby("_b").map_groups(
        lambda g: anti_bucket(g.drop_columns(["_b"])),
        batch_format="pyarrow",
    )
    out = per_bucket.groupby("c_nationkey").aggregate(
        Sum("n_customers", alias_name="n_customers"),
        Sum("total_cents", alias_name="total_cents"),
    ).to_pandas()  # <= |nations| rows
    if out.empty:
        # an empty Ray aggregate drops its schema; pin it for the compare
        import pandas as pd

        out = pd.DataFrame(
            {
                "c_nationkey": pd.Series([], dtype=np.int64),
                "n_customers": pd.Series([], dtype=np.int64),
                "total_cents": pd.Series([], dtype=np.int64),
            }
        )
    return out


# ---------------------------------------------------------------------------
# Q9: nation "profit" by year (three-dimension broadcast, zero shuffle)
# ---------------------------------------------------------------------------

Q9_NAME_TOKEN = "widget"


def q9_nation_profit(sf_dir: str):
    """TPC-H Q9 shape (adapted: without partsupp, unit cost is modeled
    as half the part's retail price): per (supplier nation, year),
    sum of lineitem revenue minus cost, for parts whose name contains a
    token.

    All three joined sides are dimensions, so the plan is a SINGLE
    lineitem scan with zero shuffles: part (filtered to the name token)
    and supplier->nation broadcast once as sorted-key arrays; each batch
    probes both, computes the exact int64 profit, and pre-aggregates to
    (nation, year) partials; the global groupby sees |nations x years|
    rows."""
    ensure_serializable()
    import pyarrow.parquet as pq

    part = pq.read_table(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_name", "p_retailprice"],
    )
    mask = pc.match_substring(part["p_name"], Q9_NAME_TOKEN)
    part = part.filter(mask)
    pkeys = part["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    retail = (
        pc.cast(
            pc.round(pc.multiply(part["p_retailprice"], 100.0),
                     round_mode="half_towards_infinity"),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
    )
    pkeys, retail = _sorted_lookup(pkeys, retail)

    supp = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_nationkey"],
    )
    skeys = supp["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    snat = supp["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    skeys, snat = _sorted_lookup(skeys, snat)

    nation = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_name"]
    )
    nmap = dict(
        zip(nation["n_nationkey"].to_pylist(), nation["n_name"].to_pylist())
    )

    side = ray.put((pkeys, retail, skeys, snat))

    def partial(batch: pa.Table) -> pa.Table:
        pk, rc, sk, sn = ray.get(side)
        lpk = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        unit_cents = _probe_i64(pk, rc, lpk, missing=-1)
        keep = unit_cents >= 0
        empty = pa.table(
            {"nation": pa.array([], pa.int64()),
             "l_year": pa.array([], pa.int64()),
             "profit_e4": pa.array([], pa.int64())}
        )
        if not keep.any():
            return empty
        t = batch.filter(pa.array(keep))
        unit = unit_cents[keep]
        nat = _probe_i64(
            sk, sn, t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        )
        # inner-join semantics: a suppkey missing from supplier drops the
        # row (matches the oracle's JOIN), it does not emit nation ""
        hit = nat >= 0
        if not hit.all():
            t, unit, nat = t.filter(pa.array(hit)), unit[hit], nat[hit]
        if t.num_rows == 0:
            return empty
        cents = _fixed_point(t["l_extendedprice"], 100).to_numpy(zero_copy_only=False)
        disc = _fixed_point(t["l_discount"], 100).to_numpy(zero_copy_only=False)
        qty = _fixed_point(t["l_quantity"], 1).to_numpy(zero_copy_only=False)
        profit = cents * (100 - disc) - qty * unit * 50
        year = pc.cast(pc.year(t["l_shipdate"]), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        agg = (
            pa.table(
                {"nation": pa.array(nat), "l_year": pa.array(year),
                 "profit_e4": pa.array(profit)}
            )
            .group_by(["nation", "l_year"])
            .aggregate([("profit_e4", "sum")])
        )
        return pa.table(
            {"nation": agg["nation"], "l_year": agg["l_year"],
             "profit_e4": agg["profit_e4_sum"]}
        )

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_suppkey", "l_quantity", "l_extendedprice",
                 "l_discount", "l_shipdate"],
    )
    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["nation", "l_year"])
        .aggregate(Sum("profit_e4", alias_name="profit_e4"))
    )

    def finalize(batch: pa.Table) -> pa.Table:
        nat = batch["nation"].to_numpy(zero_copy_only=False)
        # inner-join semantics for the nation hop too: a nationkey
        # missing from nation.parquet drops the row like the oracle's
        # JOIN nation, it does not emit n_name = ""
        hit = np.array([int(x) in nmap for x in nat], dtype=bool)
        t = batch.filter(pa.array(hit))
        return pa.table(
            {
                "n_name": pa.array(
                    [nmap[int(x)] for x in nat[hit]], pa.string()
                ),
                "l_year": t["l_year"],
                "profit_e4": t["profit_e4"],
            }
        )

    return _pin_empty_schema(
        agg.map_batches(finalize, batch_format="pyarrow"),
        {"n_name": object, "l_year": np.int64, "profit_e4": np.int64},
    )


# ---------------------------------------------------------------------------
# Q16: distinct supplier counts per part attribute combo
# ---------------------------------------------------------------------------

Q16_EXCLUDE_BRAND = "Brand#13"


def q16_supplier_counts(sf_dir: str, num_buckets: int | None = None):
    """TPC-H Q16 shape (lineitem stands in for partsupp as the
    part<->supplier relation): distinct suppliers per (brand, type,
    size), excluding one brand and excluding suppliers with negative
    account balance (the "complaints" analog).

    Two-level distinct: (1) per-batch DISTINCT (partkey, suppkey)
    pairs, then a hash(partkey) bucket shuffle where part attribute rows
    co-locate (the union idiom) — each bucket re-dedups its pairs and
    attaches attributes; (2) a second groupby on the attribute combo
    counts distinct suppliers per group with one pc.unique per group
    (group size bounded by |suppliers|). The negative-balance supplier
    set broadcasts (it is a small filtered slice of a dimension)."""
    from ..pipeline import default_num_buckets

    if num_buckets is None:
        num_buckets = default_num_buckets()
    ensure_serializable()
    import pyarrow.parquet as pq

    supp = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_acctbal"],
    )
    bad = supp.filter(pc.less(supp["s_acctbal"], 0.0))["s_suppkey"]
    bad_keys = np.sort(bad.to_numpy(zero_copy_only=False).astype(np.int64))
    bad_ref = ray.put(bad_keys)

    line = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_suppkey"],
    )
    part = ray.data.read_parquet(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_brand", "p_type", "p_size"],
        filter=(pc.field("p_brand") != Q16_EXCLUDE_BRAND),
    )

    def tag_pairs(batch: pa.Table) -> pa.Table:
        bad_k = ray.get(bad_ref)
        pairs = (
            pa.table({"pk": batch["l_partkey"], "sk": batch["l_suppkey"]})
            .group_by(["pk", "sk"])
            .aggregate([])
        )
        pk = pairs["pk"].to_numpy(zero_copy_only=False).astype(np.int64)
        sk = pairs["sk"].to_numpy(zero_copy_only=False).astype(np.int64)
        if bad_k.size:
            keep = ~np.isin(sk, bad_k)
            pk, sk = pk[keep], sk[keep]
        return pa.table(
            {
                "_b": pa.array((pk % num_buckets).astype(np.int32)),
                "pk": pa.array(pk),
                "sk": pa.array(sk),
                "p_brand": pa.array([""] * pk.size, pa.string()),
                "p_type": pa.array([""] * pk.size, pa.string()),
                "p_size": pa.array(np.zeros(pk.size, dtype=np.int64)),
            }
        )

    def tag_part(batch: pa.Table) -> pa.Table:
        pk = batch["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "_b": pa.array((pk % num_buckets).astype(np.int32)),
                "pk": pa.array(pk),
                "sk": pa.array(np.full(pk.size, -1, dtype=np.int64)),
                "p_brand": batch["p_brand"],
                "p_type": batch["p_type"],
                "p_size": pc.cast(batch["p_size"], pa.int64()),
            }
        )

    tagged = line.map_batches(
        tag_pairs, batch_format="pyarrow", zero_copy_batch=True
    ).union(part.map_batches(tag_part, batch_format="pyarrow", zero_copy_batch=True))

    def join_bucket(group: pa.Table) -> pa.Table:
        t = group.combine_chunks()
        sk = t["sk"].to_numpy(zero_copy_only=False)
        is_part = sk < 0
        empty = pa.table(
            {"p_brand": pa.array([], pa.string()),
             "p_type": pa.array([], pa.string()),
             "p_size": pa.array([], pa.int64()),
             "sk": pa.array([], pa.int64())}
        )
        if is_part.all() or not is_part.any():
            return empty
        pk = t["pk"].to_numpy(zero_copy_only=False)
        p_keys = pk[is_part]
        order = np.argsort(p_keys)
        p_sorted = p_keys[order]
        pairs = (
            pa.table({"pk": pa.array(pk[~is_part]), "sk": pa.array(sk[~is_part])})
            .group_by(["pk", "sk"])
            .aggregate([])
        )
        qk = pairs["pk"].to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(p_sorted, qk), 0, p_sorted.size - 1)
        hit = p_sorted[pos] == qk
        if not hit.any():
            return empty
        src = order[pos[hit]]
        brand = np.asarray(t["p_brand"].to_numpy(zero_copy_only=False)[is_part])[src]
        ptype = np.asarray(t["p_type"].to_numpy(zero_copy_only=False)[is_part])[src]
        psize = t["p_size"].to_numpy(zero_copy_only=False)[is_part][src]
        return pa.table(
            {
                "p_brand": pa.array(brand.tolist(), pa.string()),
                "p_type": pa.array(ptype.tolist(), pa.string()),
                "p_size": pa.array(psize),
                "sk": pairs["sk"].filter(pa.array(hit)),
            }
        )

    quads = tagged.groupby("_b").map_groups(
        lambda g: join_bucket(g.drop_columns(["_b"])), batch_format="pyarrow"
    )

    def count_distinct(group: pa.Table) -> pa.Table:
        t = group.combine_chunks()
        n = len(pc.unique(t["sk"]))
        return pa.table(
            {
                "p_brand": t["p_brand"].slice(0, 1),
                "p_type": t["p_type"].slice(0, 1),
                "p_size": t["p_size"].slice(0, 1),
                "supplier_cnt": pa.array([n], pa.int64()),
            }
        )

    return quads.groupby(["p_brand", "p_type", "p_size"]).map_groups(
        count_distinct, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# Q2: minimum-cost supplier per part (correlated min + multi-dimension join)
# ---------------------------------------------------------------------------

Q2_TYPE = "STANDARD"
Q2_MAX_SIZE = 25
Q2_REGION = "ASIA"


def _region_suppliers(sf_dir: str, region_name: str):
    """Broadcast-side prep shared by the Q2/Q21 shapes: suppliers whose
    nation sits in ``region_name``, as sorted-key lookup arrays
    (suppkey -> name / acctbal cents / nation name). Three dimension
    tables read once on the driver — |supplier|+|nation|+|region| rows,
    never a shuffle (SURVEY J1/J2 broadcast discipline)."""
    import pyarrow.parquet as pq

    region = pq.read_table(os.path.join(sf_dir, "region.parquet"))
    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    rkeys = region.filter(pc.equal(region["r_name"], region_name))[
        "r_regionkey"
    ].to_numpy(zero_copy_only=False)
    nat = nation.filter(
        pc.is_in(nation["n_regionkey"], value_set=pa.array(rkeys))
    )
    nat_keys = nat["n_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    nat_names = np.asarray(nat["n_name"].to_numpy(zero_copy_only=False))
    nk_sorted, nn_sorted = _sorted_lookup(nat_keys, nat_names)

    supplier = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_name", "s_nationkey", "s_acctbal"],
    )
    snat = supplier["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    supp = supplier.filter(pa.array(np.isin(snat, nk_sorted)))
    skeys = supp["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(skeys)
    skeys = skeys[order]
    snames = np.asarray(supp["s_name"].to_numpy(zero_copy_only=False))[order]
    scents = (
        pc.cast(
            pc.round(pc.multiply(supp["s_acctbal"], 100.0),
                     round_mode="half_towards_infinity"),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)[order]
    )
    snat_f = supp["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)[order]
    pos = np.searchsorted(nk_sorted, snat_f)
    s_nnames = nn_sorted[pos]
    return skeys, snames, scents, s_nnames


def q2_min_cost_supplier(sf_dir: str, num_buckets: int | None = None):
    """TPC-H Q2 shape: for each qualifying part, the supplier(s) in one
    region achieving the minimum cost, ordered by account balance.

    The fixture has no partsupp, so "cost" of (part, supplier) is the
    minimum extended price that supplier ever charged for that part in
    lineitem — the correlated ``min`` subquery topology (the hard part
    of Q2) is intact; only the cost column's provenance changes.

    Physical plan: part/supplier/nation/region are dimensions, broadcast
    ONCE via ray.put as sorted-key numpy arrays; lineitem is pruned to 3
    columns, semi-filtered per batch against both broadcast key sets,
    and pre-aggregated to per-batch (partkey, suppkey) -> min(cents)
    partials — so the ONE hash(partkey) bucket shuffle moves pair-level
    partials, never raw rows. Each bucket resolves its parts' minima
    locally (a partkey never spans buckets); the achiever set is
    dimension-bounded, so the final sort+limit is tiny.

    Reference parity: extends the registry-lookup surface (SURVEY
    J1-J4, /root/reference/crates/config/src/config.rs:253-264) to the
    classic min-cost-supplier topology."""
    from ..pipeline import default_num_buckets

    if num_buckets is None:
        num_buckets = default_num_buckets()
    ensure_serializable()
    import pyarrow.parquet as pq

    part = pq.read_table(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_name", "p_type", "p_size"],
    )
    part = part.filter(
        pc.and_(
            pc.equal(part["p_type"], Q2_TYPE),
            pc.less_equal(part["p_size"], Q2_MAX_SIZE),
        )
    )
    pkeys = part["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(pkeys)
    pkeys = pkeys[order]
    pnames = np.asarray(part["p_name"].to_numpy(zero_copy_only=False))[order]

    skeys, snames, scents, s_nnames = _region_suppliers(sf_dir, Q2_REGION)
    side = ray.put((pkeys, pnames, skeys, snames, scents, s_nnames))

    line = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_suppkey", "l_extendedprice"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        pk_s, _, sk_s, _, _, _ = ray.get(side)
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sk = batch["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.isin(pk, pk_s) & np.isin(sk, sk_s)
        cents = _fixed_point(batch["l_extendedprice"], 100)
        agg = (
            pa.table(
                {"pk": pa.array(pk[keep]), "sk": pa.array(sk[keep]),
                 "cents": cents.filter(pa.array(keep))}
            )
            .group_by(["pk", "sk"])
            .aggregate([("cents", "min")])
        )
        pkk = agg["pk"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "_b": pa.array((pkk % num_buckets).astype(np.int32)),
                "pk": agg["pk"],
                "sk": agg["sk"],
                "cost_cents": agg["cents_min"],
            }
        )

    tagged = line.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    def bucket_min(group: pa.Table) -> pa.Table:
        t = group.combine_chunks()
        # re-aggregate the per-batch partials (a pair may span batches),
        # then keep the pairs achieving their part's minimum
        pair = (
            pa.table({"pk": t["pk"], "sk": t["sk"], "c": t["cost_cents"]})
            .group_by(["pk", "sk"])
            .aggregate([("c", "min")])
        )
        best = pair.group_by(["pk"]).aggregate([("c_min", "min")])
        bk = best["pk"].to_numpy(zero_copy_only=False)
        bv = best["c_min_min"].to_numpy(zero_copy_only=False)
        bk_s, bv_s = _sorted_lookup(bk, bv)
        pk = pair["pk"].to_numpy(zero_copy_only=False)
        c = pair["c_min"].to_numpy(zero_copy_only=False)
        keep = c == bv_s[np.searchsorted(bk_s, pk)]
        out = pair.filter(pa.array(keep))
        return pa.table(
            {"pk": out["pk"], "sk": out["sk"], "cost_cents": out["c_min"]}
        )

    achievers = tagged.groupby("_b").map_groups(
        lambda g: bucket_min(g.drop_columns(["_b"])), batch_format="pyarrow"
    )

    def attach(batch: pa.Table) -> pa.Table:
        pk_s, pn, sk_s, sn, sc, snn = ray.get(side)
        pk = batch["pk"].to_numpy(zero_copy_only=False)
        sk = batch["sk"].to_numpy(zero_copy_only=False)
        ppos = np.searchsorted(pk_s, pk)
        spos = np.searchsorted(sk_s, sk)
        return pa.table(
            {
                "acctbal_cents": pa.array(sc[spos]),
                "s_name": pa.array(sn[spos].tolist(), pa.string()),
                "n_name": pa.array(snn[spos].tolist(), pa.string()),
                "p_partkey": batch["pk"],
                "p_name": pa.array(pn[ppos].tolist(), pa.string()),
                "cost_cents": batch["cost_cents"],
            }
        )

    out = achievers.map_batches(attach, batch_format="pyarrow")
    return out.sort(
        ["acctbal_cents", "n_name", "s_name", "p_partkey"],
        descending=[True, False, False, False],
    ).limit(100)


# ---------------------------------------------------------------------------
# Q11: important parts (HAVING against a global scalar, two-pass)
# ---------------------------------------------------------------------------

Q11_REGION = "EUROPE"


def q11_important_parts(sf_dir: str):
    """TPC-H Q11 shape: per-part inventory "value" restricted to one
    region's suppliers, keeping parts whose value exceeds a global
    threshold computed from the same aggregate (the HAVING-vs-scalar
    subquery topology).

    Without partsupp, value(part) = sum(extendedprice_cents x quantity)
    over that region's lineitems; the spec's fixed fraction is replaced
    by a scale-free one — keep parts above 2x the mean part value — so
    the query stays non-degenerate at every sf (the spec scales its own
    fraction by 1/SF for the same reason).

    Physical plan: region suppliers broadcast once; lineitem pruned to 4
    columns, semi-filtered per batch, pre-aggregated per batch to
    (partkey -> value) partials; ONE groupby(partkey) shuffle of partials;
    the per-part aggregate is |part|-bounded so it materializes, and the
    threshold compare is an exact integer cross-multiplication
    (value * n > 2 * total) — no division, no float."""
    ensure_serializable()

    skeys, _, _, _ = _region_suppliers(sf_dir, Q11_REGION)
    side = ray.put(skeys)

    line = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        sk_s = ray.get(side)
        sk = batch["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.isin(sk, sk_s)
        cents = _fixed_point(batch["l_extendedprice"], 100)
        qty = _fixed_point(batch["l_quantity"], 1)
        val = pc.multiply(cents, qty)
        return (
            pa.table(
                {"p_partkey": batch["l_partkey"], "value_e2": val}
            )
            .filter(pa.array(keep))
            .group_by(["p_partkey"])
            .aggregate([("value_e2", "sum")])
        )

    per_part = (
        line.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("p_partkey")
        .aggregate(Sum("value_e2_sum", alias_name="value_e2"))
        # |part|-bounded aggregate: materialize so the scalar pass and
        # the filter don't re-run the lineitem scan
        .materialize()
    )
    total = per_part.sum("value_e2") or 0
    n = per_part.count()
    if n == 0:
        import pandas as pd

        return pd.DataFrame(
            {
                "p_partkey": pd.Series([], dtype=np.int64),
                "value_e2": pd.Series([], dtype=np.int64),
            }
        )
    # value * n > 2 * total  <=>  value > floor(2 * total / n): exact in
    # integers (the smallest qualifying integer is floor()+1 whether or
    # not n divides 2*total), and Ray's filter expr stays column-vs-const
    out = per_part.filter(expr=f"value_e2 > {(2 * int(total)) // int(n)}")
    return out.sort(["value_e2", "p_partkey"], descending=[True, False])


# ---------------------------------------------------------------------------
# Q19: discounted revenue under OR'd brand/size/quantity branches
# ---------------------------------------------------------------------------

Q19_BRANCHES = (
    # (brand, max_size, qty_lo, qty_hi)
    ("Brand#12", 15, 1, 20),
    ("Brand#23", 25, 10, 30),
    ("Brand#4", 35, 20, 40),
)


def q19_discounted_revenue(sf_dir: str):
    """TPC-H Q19 shape: lineitem x part revenue where any of three OR'd
    (brand, size-range, quantity-range) branches matches. The fixture
    lacks container/shipmode, so each branch predicates on brand + size
    + quantity — the disjunctive multi-column join predicate (the hard
    part: it defeats naive pushdown) is intact.

    Physical plan: part broadcast once as sorted partkey -> (branch id,
    size); the branch predicate evaluates vectorized per batch against
    the probed attributes; per-batch TWO-number partials (revenue, n)
    collapse into one global sum — zero shuffle."""
    ensure_serializable()
    import pyarrow.parquet as pq

    part = pq.read_table(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_brand", "p_size"],
    )
    pkeys = part["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(pkeys)
    pkeys = pkeys[order]
    brands = np.asarray(part["p_brand"].to_numpy(zero_copy_only=False))[order]
    sizes = part["p_size"].to_numpy(zero_copy_only=False).astype(np.int64)[order]
    branch = np.full(pkeys.size, -1, dtype=np.int64)
    for i, (b, max_size, _, _) in enumerate(Q19_BRANCHES):
        branch[(brands == b) & (sizes >= 1) & (sizes <= max_size)] = i
    side = ray.put((pkeys, branch))

    line = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )
    qty_lo = np.array([b[2] for b in Q19_BRANCHES], dtype=np.int64)
    qty_hi = np.array([b[3] for b in Q19_BRANCHES], dtype=np.int64)

    class Partial:
        def __init__(self, ref):
            self._pkeys, self._branch = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            pk = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            br = _probe_i64(self._pkeys, self._branch, pk)
            qty = _fixed_point(batch["l_quantity"], 1).to_numpy(zero_copy_only=False)
            hit = br >= 0
            b = np.where(hit, br, 0)
            match = hit & (qty >= qty_lo[b]) & (qty <= qty_hi[b])
            cents = _fixed_point(batch["l_extendedprice"], 100)
            disc_pct = _fixed_point(batch["l_discount"], 100)
            rev = pc.multiply(
                cents, pc.subtract(pa.scalar(100), disc_pct)
            ).to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "revenue_e4": pa.array([int(rev[match].sum())], pa.int64()),
                    "n_items": pa.array([int(match.sum())], pa.int64()),
                }
            )

    from .._rayutil import pool_size

    partials = line.map_batches(
        Partial,
        fn_constructor_args=(side,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=pool_size(),
        num_cpus=1,
    )
    agg = partials.sum(["revenue_e4", "n_items"])
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "revenue_e4": pa.array([int(agg["sum(revenue_e4)"] or 0)], pa.int64()),
                "n_items": pa.array([int(agg["sum(n_items)"] or 0)], pa.int64()),
            }
        )
    )


# ---------------------------------------------------------------------------
# Q20: dominant-share suppliers of a part family (correlated threshold)
# ---------------------------------------------------------------------------

Q20_NAME_PREFIX = "large "
Q20_LO = np.datetime64("1996-01-01", "us")
Q20_HI = np.datetime64("1997-01-01", "us")


def q20_promotion_suppliers(sf_dir: str, num_buckets: int | None = None):
    """TPC-H Q20 shape: suppliers who, for some part in a name family
    during one year, shipped MORE THAN HALF of that part's total volume
    — the correlated per-part threshold (spec: ps_availqty > 0.5 x
    sum(l_quantity)) re-anchored to lineitem because the fixture has no
    partsupp. The nested semi-join chain (supplier <- qualifying pair <-
    per-part scalar) is intact; the spec's nation filter is carried by
    the Q2/Q21 region variants, so this one keeps all suppliers and the
    adaptation is documented in the oracle.

    Physical plan: qualifying partkeys broadcast once; lineitem pruned +
    date-filtered at the read, per-batch partial sum of qty per
    (partkey, suppkey); ONE hash(partkey) bucket shuffle of pair
    partials; each bucket resolves its parts' totals locally and emits
    qualifying suppkeys; the distinct-supplier set is
    dimension-bounded, so the name attach + sort are tiny."""
    from ..pipeline import default_num_buckets

    if num_buckets is None:
        num_buckets = default_num_buckets()
    ensure_serializable()
    import pyarrow.parquet as pq

    part = pq.read_table(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_name"]
    )
    part = part.filter(pc.starts_with(part["p_name"], Q20_NAME_PREFIX))
    pkeys = np.sort(
        part["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    )

    supplier = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"), columns=["s_suppkey", "s_name"]
    )
    skeys = supplier["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(skeys)
    skeys = skeys[order]
    snames = np.asarray(supplier["s_name"].to_numpy(zero_copy_only=False))[order]
    side = ray.put((pkeys, skeys, snames))

    line = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"],
        filter=(
            (pc.field("l_shipdate") >= pa.scalar(Q20_LO))
            & (pc.field("l_shipdate") < pa.scalar(Q20_HI))
        ),
    )

    def partial(batch: pa.Table) -> pa.Table:
        pk_s, _, _ = ray.get(side)
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.isin(pk, pk_s)
        qty = _fixed_point(batch["l_quantity"], 1)
        agg = (
            pa.table(
                {"pk": pa.array(pk[keep]),
                 "sk": batch["l_suppkey"].filter(pa.array(keep)),
                 "qty": qty.filter(pa.array(keep))}
            )
            .group_by(["pk", "sk"])
            .aggregate([("qty", "sum")])
        )
        pkk = agg["pk"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "_b": pa.array((pkk % num_buckets).astype(np.int32)),
                "pk": agg["pk"],
                "sk": agg["sk"],
                "qty": agg["qty_sum"],
            }
        )

    tagged = line.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    def bucket_dominant(group: pa.Table) -> pa.Table:
        t = group.combine_chunks()
        pair = (
            pa.table({"pk": t["pk"], "sk": t["sk"], "q": t["qty"]})
            .group_by(["pk", "sk"])
            .aggregate([("q", "sum")])
        )
        tot = pair.group_by(["pk"]).aggregate([("q_sum", "sum")])
        tk = tot["pk"].to_numpy(zero_copy_only=False)
        tv = tot["q_sum_sum"].to_numpy(zero_copy_only=False)
        tk_s, tv_s = _sorted_lookup(tk, tv)
        pk = pair["pk"].to_numpy(zero_copy_only=False)
        q = pair["q_sum"].to_numpy(zero_copy_only=False)
        keep = 2 * q > tv_s[np.searchsorted(tk_s, pk)]
        sk = pc.unique(pair.filter(pa.array(keep))["sk"])
        return pa.table({"s_suppkey": pc.cast(sk, pa.int64())})

    qualifying = tagged.groupby("_b").map_groups(
        lambda g: bucket_dominant(g.drop_columns(["_b"])), batch_format="pyarrow"
    )

    # global distinct over the supplier-bounded qualifying set
    distinct = qualifying.groupby("s_suppkey").map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow"
    )

    def attach(batch: pa.Table) -> pa.Table:
        _, sk_s, sn = ray.get(side)
        sk = batch["s_suppkey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(sk_s, sk)
        return pa.table(
            {
                "s_suppkey": batch["s_suppkey"],
                "s_name": pa.array(sn[pos].tolist(), pa.string()),
            }
        )

    return distinct.map_batches(attach, batch_format="pyarrow").sort("s_name")


# ---------------------------------------------------------------------------
# Q21: suppliers who alone kept a multi-supplier order waiting
# ---------------------------------------------------------------------------

Q21_REGION = "ASIA"
Q21_LATE_DAYS = 60


def q21_waiting_suppliers(sf_dir: str, num_buckets: int | None = None):
    """TPC-H Q21 shape: for finished multi-supplier orders where EXACTLY
    ONE supplier shipped late, count the blame per supplier (restricted
    to one region), descending. The fixture lacks commit/receipt dates,
    so "late" = the supplier's last shipment left more than 60 days
    after the order date; the exists / not-exists self-join topology —
    the hardest TPC-H shape — is intact.

    Physical plan: lineitem pre-aggregates per batch to (orderkey,
    suppkey) -> max(shipdate) partials (the exists checks only need the
    per-supplier max); the 'F'-status orders ride the same ONE
    hash(orderkey) bucket shuffle (q12 union idiom). Each bucket
    re-aggregates pairs, joins the order date by searchsorted, and for
    orders with >=2 suppliers and exactly 1 late one credits that
    supplier via the exact identity sum(late x suppkey) (valid because
    n_late == 1). Per-bucket per-supplier counts then collapse in a
    supplier-bounded groupby; region filter + name attach happen on
    that tiny set from the shared broadcast."""
    from ..pipeline import default_num_buckets

    if num_buckets is None:
        num_buckets = default_num_buckets()
    ensure_serializable()

    skeys, snames, _, _ = _region_suppliers(sf_dir, Q21_REGION)
    side = ray.put((skeys, snames))

    line = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_suppkey", "l_shipdate"],
    )
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderdate"],
        filter=(pc.field("o_orderstatus") == "F"),
    )

    def tag_line(batch: pa.Table) -> pa.Table:
        okey = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ship = _ts_us(batch["l_shipdate"])
        agg = (
            pa.table(
                {"okey": pa.array(okey), "sk": batch["l_suppkey"],
                 "ship_us": pa.array(ship)}
            )
            .group_by(["okey", "sk"])
            .aggregate([("ship_us", "max")])
        )
        ok = agg["okey"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "_b": pa.array((ok % num_buckets).astype(np.int32)),
                "okey": agg["okey"],
                "sk": pc.cast(agg["sk"], pa.int64()),
                "ship_us": agg["ship_us_max"],
                "is_order": pa.array(np.zeros(len(agg), dtype=np.int8)),
            }
        )

    def tag_orders(batch: pa.Table) -> pa.Table:
        okey = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "_b": pa.array((okey % num_buckets).astype(np.int32)),
                "okey": pa.array(okey),
                "sk": pa.array(np.zeros(okey.size, dtype=np.int64)),
                "ship_us": pa.array(_ts_us(batch["o_orderdate"])),
                "is_order": pa.array(np.ones(okey.size, dtype=np.int8)),
            }
        )

    tagged = line.map_batches(
        tag_line, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        orders.map_batches(tag_orders, batch_format="pyarrow", zero_copy_batch=True)
    )

    def blame_bucket(group: pa.Table) -> pa.Table:
        t = group.combine_chunks()
        empty = pa.table(
            {"s_suppkey": pa.array([], pa.int64()),
             "numwait": pa.array([], pa.int64())}
        )
        is_order = t["is_order"].to_numpy(zero_copy_only=False) == 1
        okey = t["okey"].to_numpy(zero_copy_only=False)
        o_keys = okey[is_order]
        if o_keys.size == 0 or is_order.all():
            return empty
        o_sorted_idx = np.argsort(o_keys)
        o_sorted = o_keys[o_sorted_idx]
        o_date = t["ship_us"].to_numpy(zero_copy_only=False)[is_order][o_sorted_idx]
        # re-aggregate pair partials (a pair may span input batches)
        pairs = (
            pa.table(
                {"okey": pa.array(okey[~is_order]),
                 "sk": t["sk"].filter(pa.array(~is_order)),
                 "ship_us": t["ship_us"].filter(pa.array(~is_order))}
            )
            .group_by(["okey", "sk"])
            .aggregate([("ship_us", "max")])
        )
        p_ok = pairs["okey"].to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(o_sorted, p_ok), 0, o_sorted.size - 1)
        hit = o_sorted[pos] == p_ok  # inner join: only 'F' orders survive
        if not hit.any():
            return empty
        p_ok = p_ok[hit]
        p_sk = pairs["sk"].to_numpy(zero_copy_only=False)[hit]
        ms = pairs["ship_us_max"].to_numpy(zero_copy_only=False)[hit]
        odate = o_date[pos[hit]]
        late = (ms > odate + Q21_LATE_DAYS * _US_PER_DAY).astype(np.int64)
        per_order = (
            pa.table(
                {"okey": pa.array(p_ok), "late": pa.array(late),
                 "late_sk": pa.array(late * p_sk)}
            )
            .group_by(["okey"])
            .aggregate([([], "count_all"), ("late", "sum"), ("late_sk", "sum")])
        )
        n_supp = pc.cast(per_order["count_all"], pa.int64()).to_numpy(
            zero_copy_only=False
        )
        n_late = per_order["late_sum"].to_numpy(zero_copy_only=False)
        qual = (n_supp >= 2) & (n_late == 1)
        if not qual.any():
            return empty
        blamed = per_order["late_sk_sum"].to_numpy(zero_copy_only=False)[qual]
        agg = (
            pa.table({"s_suppkey": pa.array(blamed)})
            .group_by(["s_suppkey"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                "s_suppkey": agg["s_suppkey"],
                "numwait": pc.cast(agg["count_all"], pa.int64()),
            }
        )

    per_bucket = tagged.groupby("_b").map_groups(
        lambda g: blame_bucket(g.drop_columns(["_b"])), batch_format="pyarrow"
    )
    counts = per_bucket.groupby("s_suppkey").aggregate(
        Sum("numwait", alias_name="numwait")
    )

    def attach(batch: pa.Table) -> pa.Table:
        sk_s, sn = ray.get(side)
        sk = batch["s_suppkey"].to_numpy(zero_copy_only=False)
        # region filter: only suppliers in the broadcast survive
        pos = _probe_i64(sk_s, np.arange(sk_s.size, dtype=np.int64), sk)
        hit = pos >= 0
        return pa.table(
            {
                "s_name": pa.array(sn[pos[hit]].tolist(), pa.string()),
                "numwait": batch["numwait"].filter(pa.array(hit)),
            }
        )

    return (
        counts.map_batches(attach, batch_format="pyarrow")
        .sort(["numwait", "s_name"], descending=[True, False])
        .limit(100)
    )
