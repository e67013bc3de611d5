"""Sampling and sketch operators for large-scale pipeline triage.

The reference's bench harness repeatedly needs "how big / how diverse is
this corpus" answers before committing to a full pass (stage roll-ups at
/root/reference/crates/cli/src/bench.rs:139-172); at 10^12-row scale the
standing tools for that are deterministic samples, cardinality sketches
and order-statistic summaries. All four operators here are single-pass,
shuffle-light, and mergeable:

- ``sample_events`` / ``stratified_sample_events``: DETERMINISTIC hash
  sampling (a multiplicative Knuth hash both the engine and the DuckDB
  oracle compute bit-identically) instead of RNG sampling — re-runs and
  resumed partitions pick the exact same rows, which is what makes a
  sample usable as a checkpointable artifact.
- ``approx_distinct_users``: HyperLogLog (Flajolet et al. 2007, the
  public HLL paper) — per-batch 2^p register partials, merged with a
  tiny ``groupby(register).max`` shuffle of at most 2^p rows per batch.
- ``quantile_events_value``: EXACT distributed quantiles via the
  fixed-point value-histogram identity: quantize values to int64 micros
  (the engine's exact-aggregate discipline, relational._fixed_point),
  count per distinct value with partial aggregation, and take order
  statistics on the tiny (distinct-values)-row histogram. Exactness
  replaces t-digest-style approximation whenever the value domain is
  bounded-resolution (money, ratings, latencies at fixed precision) —
  the common case for telemetry columns.
"""

from __future__ import annotations

import math
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Max, Sum

from .._rayutil import ensure_serializable

# --- deterministic sampling hash -------------------------------------
# Knuth multiplicative hash over event_id, reproducible in ANSI SQL with
# plain BIGINT arithmetic (no md5 loop, no engine-specific hash()).
# Domain note: exact in int64 for keys < ~3.4e9; a 10^12-key table
# should switch to _splitmix64 below (not SQL-expressible, rows-only).
_MULT = 2654435761
_INC = 12345
_MOD = 1 << 32
SAMPLE_PCT = 5


def _sample_hash(keys: np.ndarray) -> np.ndarray:
    return (keys * _MULT + _INC) % _MOD


def _read_events(sf_dir: str, columns):
    ensure_serializable()
    return ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=columns
    )


def sample_events(sf_dir: str, pct: int = SAMPLE_PCT) -> ray.data.Dataset:
    """Bernoulli ``pct``% sample of events, deterministic in the key.

    Scale shape: a stateless vectorized filter per batch — no shuffle, no
    state, embarrassingly parallel; the sample of a resumed partition is
    identical to the sample of the original run."""
    ds = _read_events(sf_dir, ["event_id", "user_id", "event_type", "value"])

    def keep(batch: pa.Table) -> pa.Table:
        h = _sample_hash(batch["event_id"].to_numpy(zero_copy_only=False))
        return batch.filter(pa.array(h % 100 < pct))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def _bottom_k_per_group(
    group_codes: np.ndarray, order_a: np.ndarray, order_b: np.ndarray, k: int
) -> np.ndarray:
    """Row indices of the first-k rows per group under (order_a, order_b)
    ascending — one lexsort + run-length rank, no Python loop."""
    n = len(group_codes)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    order = np.lexsort((order_b, order_a, group_codes))
    g = group_codes[order]
    new_grp = np.empty(n, dtype=bool)
    new_grp[0] = True
    new_grp[1:] = g[1:] != g[:-1]
    starts = np.flatnonzero(new_grp)
    run_start = np.repeat(starts, np.diff(np.append(starts, n)))
    rank = np.arange(n) - run_start
    return order[rank < k]


def stratified_sample_events(sf_dir: str, k: int = 20) -> ray.data.Dataset:
    """Bottom-k-by-hash sample PER event_type stratum.

    Bottom-k of a uniform hash is the classic mergeable uniform sample
    (KMV): per-batch partials keep at most k rows per stratum, so the
    final per-stratum reduce sees k rows per (stratum, batch) — never the
    raw table. Tie-break on event_id keeps the pick deterministic even on
    hash collisions, matching the SQL oracle's ORDER BY h, event_id."""
    ds = _read_events(sf_dir, ["event_id", "user_id", "event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        h = _sample_hash(eid)
        codes = pc.dictionary_encode(batch["event_type"].combine_chunks())
        grp = np.asarray(codes.indices)
        idx = _bottom_k_per_group(grp, h, eid, k)
        return batch.append_column("h", pa.array(h, pa.int64())).take(
            pa.array(idx)
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    def final(group: pa.Table) -> pa.Table:
        t = group.combine_chunks()
        h = t["h"].to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        idx = _bottom_k_per_group(np.zeros(len(h), dtype=np.int64), h, eid, k)
        return t.take(pa.array(np.sort(idx)))

    return partials.groupby("event_type").map_groups(
        final, batch_format="pyarrow"
    )


# --- HyperLogLog ------------------------------------------------------

HLL_P = 12
_HLL_M = 1 << HLL_P


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """SplitMix64 finalizer (public-domain constant set, Steele et al.) —
    a full-avalanche 64-bit mixer, vectorized in uint64."""
    with np.errstate(over="ignore"):
        z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _bit_length_u64(w: np.ndarray) -> np.ndarray:
    """Vectorized bit_length over uint64 without float log (exact at every
    boundary, unlike floor(log2))."""
    out = np.zeros(w.shape, dtype=np.int64)
    w = w.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        s = np.uint64(shift)
        big = w >= (np.uint64(1) << s)
        out[big] += shift
        w[big] >>= s
    out[w > 0] += 1
    return out


def _hll_partial(keys: np.ndarray) -> pa.Table:
    """Per-batch HLL register partial: at most 2^p (register, rho) rows."""
    h = _splitmix64(keys.astype(np.uint64))
    reg = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
    rest = h & np.uint64((1 << (64 - HLL_P)) - 1)
    # rho = position of the leftmost 1-bit in the low 64-p bits (1-based);
    # all-zero rest gets the max rank 64-p+1 per the HLL paper.
    rho = (64 - HLL_P) - _bit_length_u64(rest) + 1
    regs = np.zeros(_HLL_M, dtype=np.int64)
    np.maximum.at(regs, reg, rho)
    nz = np.flatnonzero(regs)
    return pa.table(
        {"register": pa.array(nz), "rho": pa.array(regs[nz])}
    )


def hll_estimate(ds: ray.data.Dataset, column: str) -> pd.DataFrame:
    """HyperLogLog distinct-count estimate of ``column`` (int64 keys).

    Physical shape: per-batch register partials (<= 2^p rows each) ->
    ``groupby(register).max(rho)`` over at most 2^p distinct keys -> the
    <=4096-row merged register table reduces on the driver. The only
    shuffle is the tiny register merge; the raw column never moves.
    Standard bias handling from the public HLL paper: linear counting
    below 2.5m, the 2^32 correction left out (64-bit hash)."""

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch[column].to_numpy(zero_copy_only=False).astype(np.int64)
        return _hll_partial(keys)

    merged = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("register")
        .aggregate(Max("rho", alias_name="rho"))
        .to_pandas()
    )
    m = _HLL_M
    regs = np.zeros(m, dtype=np.int64)
    if len(merged):
        regs[merged["register"].to_numpy()] = merged["rho"].to_numpy()
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * math.log(m / zeros)
    return pd.DataFrame(
        {
            "estimate": np.array([int(round(est))], dtype=np.int64),
            "precision_p": np.array([HLL_P], dtype=np.int64),
        }
    )


def approx_distinct_users(sf_dir: str) -> pd.DataFrame:
    """HLL cardinality of events.user_id (rows-only query: the estimate is
    sketch-defined, not SQL-reproducible; accuracy is asserted against the
    exact distinct in tests/test_ops.py)."""
    return hll_estimate(_read_events(sf_dir, ["user_id"]), "user_id")


# --- exact quantiles over a fixed-point histogram ---------------------

QUANTILES_PERMILLE = (500, 900, 950, 990)


def _disc_quantiles(values: np.ndarray, counts: np.ndarray) -> list[tuple[int, int]]:
    """Order statistics from a (sorted values, counts) histogram using
    quantile_disc's index rule max(ceil(p*n), 1) - 1, with p*n evaluated
    in float64 exactly as DuckDB does (verified across n = 1..200 and
    large n)."""
    if len(values) == 0:
        # mirror quantile_disc over zero rows: no output rows at all
        return []
    cum = np.cumsum(counts)
    n = int(cum[-1])
    out = []
    for pm in QUANTILES_PERMILLE:
        idx = max(math.ceil(np.float64(pm / 1000.0) * n), 1) - 1
        pos = int(np.searchsorted(cum, idx + 1))
        out.append((pm, int(values[pos])))
    return out


def quantile_events_value(sf_dir: str) -> pd.DataFrame:
    """Exact p50/p90/p95/p99 of events.value at micro resolution.

    quantile_disc semantics (verified against DuckDB across n=1..200 and
    large n): the order statistic at index max(ceil(p*n), 1) - 1 with p*n
    evaluated in float64 — replicated bit-for-bit here. The histogram
    identity makes this single-shuffle: per-batch ``group_by(v_micro)``
    partials, one global groupby over DISTINCT values (bounded by the
    value domain's resolution, not the row count), cumsum on the tiny
    sorted histogram. Driver materializes only the histogram."""
    ds = _read_events(sf_dir, ["value"])

    def partial(batch: pa.Table) -> pa.Table:
        v = pc.cast(
            pc.round(
                pc.multiply(batch["value"], 1_000_000.0),
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        return (
            pa.table({"v_micro": v})
            .group_by(["v_micro"])
            .aggregate([("v_micro", "count")])
        )

    hist = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("v_micro")
        .aggregate(Sum("v_micro_count", alias_name="n"))
        .to_pandas()
        .sort_values("v_micro")
    )
    qs = _disc_quantiles(hist["v_micro"].to_numpy(), hist["n"].to_numpy())
    return pd.DataFrame(
        {
            "p_permille": np.array([p for p, _ in qs], dtype=np.int64),
            "value_micro": np.array([v for _, v in qs], dtype=np.int64),
        }
    )


def quantile_events_by_type(sf_dir: str) -> ray.data.Dataset:
    """Per-GROUP exact quantiles: p50/p90/p95/p99 of value per
    event_type, fully distributed — the (group, v_micro) histogram
    partials shuffle once, and each group's order statistics reduce
    inside ``groupby(event_type).map_groups`` (no driver materialization,
    unlike the global variant whose histogram is driver-final)."""
    ensure_serializable()
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "value"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        v = pc.cast(
            pc.round(
                pc.multiply(batch["value"], 1_000_000.0),
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        return (
            pa.table({"event_type": batch["event_type"], "v_micro": v})
            .group_by(["event_type", "v_micro"])
            .aggregate([("v_micro", "count")])
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    merged = partials.groupby(["event_type", "v_micro"]).aggregate(
        Sum("v_micro_count", alias_name="n")
    )

    def finalize(group: pa.Table) -> pa.Table:
        t = group.sort_by([("v_micro", "ascending")]).combine_chunks()
        qs = _disc_quantiles(
            t["v_micro"].to_numpy(zero_copy_only=False),
            t["n"].to_numpy(zero_copy_only=False),
        )
        k = len(qs)
        return pa.table(
            {
                "event_type": pa.array([t["event_type"][0].as_py()] * k),
                "p_permille": pa.array([p for p, _ in qs], pa.int64()),
                "value_micro": pa.array([v for _, v in qs], pa.int64()),
            }
        )

    return merged.groupby("event_type").map_groups(
        finalize, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# weighted sampling without replacement (Efraimidis-Spirakis, deterministic)
# ---------------------------------------------------------------------------

WEIGHTED_SAMPLE_K = 32


def weighted_sample_docs(sf_dir: str, k: int = WEIGHTED_SAMPLE_K) -> ray.data.Dataset:
    """Weighted sample WITHOUT replacement of k documents, inclusion
    odds proportional to length — Efraimidis-Spirakis (IPL 2006, the
    public weighted-reservoir algorithm): each row draws
    ``key = ln(u) / w`` and the global top-k keys win. The uniform u is
    HASH-derived (same multiplicative Knuth family as ``sample_events``,
    u = (h + 0.5) / 2^32), so the sample is deterministic in doc_id:
    re-runs and resumed partitions pick the identical k docs, and the
    whole draw replays exactly in SQL.

    Scale shape: keys are embarrassingly parallel; each batch keeps only
    its local top-k (lexsort partial), so the single-block final merge
    sees at most k rows per batch — the corpus never shuffles. Same
    top-k-of-partials shape as knn's reduce; weights clamp to >= 1 so
    zero-length docs stay drawable."""
    ensure_serializable()
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "n_chars"]
    )

    def local_topk(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = np.maximum(
            batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.float64), 1.0
        )
        h = (ids.astype(np.uint64) * _MULT + _INC) % _MOD
        u = (h.astype(np.float64) + 0.5) / float(_MOD)
        key = np.log(u) / w  # negative; larger (closer to 0) wins
        order = np.lexsort((ids, -key))[:k]
        return pa.table(
            {
                "doc_id": pa.array(ids[order]),
                "n_chars": pa.array(
                    batch["n_chars"].to_numpy(zero_copy_only=False)[order]
                ),
                "_key": pa.array(key[order]),
            }
        )

    def final_topk(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        key = batch["_key"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -key))[:k]
        return batch.take(pa.array(order)).drop_columns(["_key"])

    partial = ds.map_batches(
        local_topk, batch_format="pyarrow", zero_copy_batch=True
    )
    return partial.repartition(1).map_batches(
        final_topk, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


# ---------------------------------------------------------------------------
# DDSketch approximate quantiles (relative-error guarantee, unbounded domain)
# ---------------------------------------------------------------------------

DD_ALPHA = 0.01  # 1% relative-error guarantee
DD_GAMMA = (1.0 + DD_ALPHA) / (1.0 - DD_ALPHA)
DD_ZERO_BUCKET = -(1 << 31)  # sentinel bucket for v <= 0 (estimate 0.0)


def _dd_partial(batch: pa.Table) -> pa.Table:
    v = batch["value"].to_numpy(zero_copy_only=False)
    idx = np.full(v.size, DD_ZERO_BUCKET, dtype=np.int64)
    pos = v > 0
    idx[pos] = np.ceil(np.log(v[pos]) / math.log(DD_GAMMA)).astype(np.int64)
    b, n = np.unique(idx, return_counts=True)
    return pa.table({"bucket": pa.array(b), "n": pa.array(n.astype(np.int64))})


def quantile_sketch(sf_dir: str, qs=QUANTILES_PERMILLE) -> pd.DataFrame:
    """Approximate p50/p90/p95/p99 of events.value via a DDSketch
    (Masson, Rim & Lee, VLDB 2019 — the public relative-error quantile
    sketch): values map to log-gamma buckets ``i = ceil(log_g(v))`` with
    ``g = (1+a)/(1-a)``, so the bucket midpoint estimate ``2*g^i/(g+1)``
    is within relative error ``a`` of the true order statistic,
    regardless of the value range.

    This is the UNBOUNDED-domain companion to the exact
    ``quantile_events_value`` (whose histogram identity needs a
    bounded-resolution domain): bucket counts are mergeable partials —
    per-batch ``np.unique`` emits at most O(log(range)/log(g)) int rows,
    one tiny ``groupby(bucket).sum`` merges them, and the driver reads
    only the few-hundred-row sketch. No raw value ever shuffles; sketch
    size is independent of row count, so the same plan holds at 100 TB.
    v <= 0 folds into a reserved sentinel bucket (estimate 0.0) so the
    map is total. Rank rule is integer-exact on both sides:
    ``r = (q*total + 999) // 1000``, first bucket with cum >= r."""
    ensure_serializable()
    ds = _read_events(sf_dir, ["value"])
    sk = (
        ds.map_batches(_dd_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .aggregate(Sum("n", alias_name="n"))
    )
    tab = sk.sort("bucket").to_pandas()  # tiny: one row per occupied bucket
    buckets = tab["bucket"].to_numpy()
    cum = tab["n"].to_numpy().cumsum()
    total = int(cum[-1]) if len(cum) else 0
    rows = []
    for q in qs:
        r = (q * total + 999) // 1000
        i = int(buckets[int(np.searchsorted(cum, r))])
        est = 0.0 if i == DD_ZERO_BUCKET else 2.0 * DD_GAMMA**i / (DD_GAMMA + 1.0)
        # half-away-from-zero to 6 decimals, matching DuckDB round()
        est = float(np.trunc(est * 1e6 + np.copysign(0.5, est)) / 1e6)
        rows.append({"q_permille": q, "est_value": est})
    return pd.DataFrame(rows)


MG_CAPACITY = 64  # Misra-Gries summary size per partial


def _mg_compress(words: np.ndarray, counts: np.ndarray, k: int):
    """Compress a (word, count) multiset to ≤ k survivors with the
    Misra-Gries decrement rule, vectorized: keep the k largest counters
    and subtract the (k+1)-th largest count from every survivor — the
    standard batched/mergeable MG step (Agarwal et al., "Mergeable
    Summaries", PODS 2012). Guarantees undercount ≤ N/ (k+1) overall."""
    if words.size <= k:
        return words, counts
    order = np.argsort(counts, kind="stable")[::-1]
    thresh = counts[order[k]]
    keep = order[:k]
    new_counts = counts[keep] - thresh
    pos = new_counts > 0
    return words[keep][pos], new_counts[pos]


def heavy_hitter_words(sf_dir: str, k: int = 16) -> pd.DataFrame:
    """Approximate heavy hitters over the documents word stream via
    mergeable Misra-Gries summaries — the bounded-memory answer to
    "top words" when the vocabulary won't fit anywhere (word_counts is
    the exact cousin; this one's state is O(k) per partial no matter
    the vocabulary size).

    Per-batch: exact word counts (Arrow regex split + np.unique), then
    an MG compress to ``MG_CAPACITY`` counters; the shuffle carries ≤
    MG_CAPACITY rows per batch. Merge: sum counters per word, compress
    once more to MG_CAPACITY, report the top ``k`` with their
    guaranteed bounds: true_count ∈ [mg_count, mg_count + err] where
    err = (dropped total) / (MG_CAPACITY+1) is returned alongside.
    Deterministic — no RNG anywhere."""
    ensure_serializable()
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        # same tokenizer as the exact cousin word_counts: literal space
        # split, empties dropped — so the MG bounds are checkable against it
        flat = pc.list_flatten(
            pc.split_pattern(pc.fill_null(batch["text"], ""), " ")
        )
        flat = flat.filter(pc.not_equal(flat, ""))
        w = np.asarray(flat.to_pylist(), dtype=object)
        if not w.size:
            return pa.table(
                {
                    "word": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                    "dropped": pa.array([], pa.int64()),
                }
            )
        uw, uc = np.unique(w, return_counts=True)
        total = int(uc.sum())
        kw, kc = _mg_compress(uw, uc.astype(np.int64), MG_CAPACITY)
        dropped = total - int(kc.sum())
        d = np.zeros(kw.size, dtype=np.int64)
        if d.size:
            d[0] = dropped
        return pa.table(
            {
                "word": pa.array(list(kw), pa.string()),
                "n": pa.array(kc),
                "dropped": pa.array(d),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    merged = partials.groupby("word").aggregate(
        Sum("n", alias_name="n"), Sum("dropped", alias_name="dropped")
    )
    t = merged.to_pandas()  # ≤ MG_CAPACITY × n_batches rows — tiny
    w = t["word"].to_numpy(dtype=object)
    c = t["n"].to_numpy(dtype=np.int64)
    dropped_before = int(t["dropped"].sum())
    kw, kc = _mg_compress(w, c, MG_CAPACITY)
    dropped_total = dropped_before + int(c.sum()) - int(kc.sum())
    order = np.argsort(kc, kind="stable")[::-1][:k]
    err = dropped_total // (MG_CAPACITY + 1) + (
        1 if dropped_total % (MG_CAPACITY + 1) else 0
    )
    return pd.DataFrame(
        {
            "word": kw[order],
            "min_count": kc[order],
            "max_count": kc[order] + err,
        }
    )


OUTLIER_PERMILLE = 990


def outlier_events(sf_dir: str) -> ray.data.Dataset:
    """Quantile-threshold OUTLIER FILTER: events whose value exceeds
    their type's exact p99 — the aggregate → broadcast → filter
    composition (a tiny distributed aggregate flows BACK into a
    full-stream map) that powers anomaly triage and loss-spike mining.

    Phase 1 is ``quantile_events_by_type`` (distributed, exact);
    its |types|×|quantiles| result is the only thing materialized —
    ``ray.put`` once, fetched once per filter actor. Phase 2 streams
    the events again and keeps value_micro > p99(type) with one
    vectorized lookup. Strictly-greater semantics on the int64 micro
    grid match the SQL oracle exactly (no float boundary)."""
    ensure_serializable()
    q = quantile_events_by_type(sf_dir).to_pandas()
    q = q[q["p_permille"] == OUTLIER_PERMILLE]
    thresholds = dict(zip(q["event_type"], q["value_micro"]))
    thr_ref = ray.put(thresholds)

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "event_type", "value"],
    )

    class FilterOutliers:
        def __init__(self, ref):
            self._thr = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            v = pc.cast(
                pc.round(
                    pc.multiply(batch["value"], 1_000_000.0),
                    round_mode="half_towards_infinity",
                ),
                pa.int64(),
            ).to_numpy(zero_copy_only=False)
            codes = pc.dictionary_encode(batch["event_type"].combine_chunks())
            dict_vals = codes.dictionary.to_pylist()  # |types| lookups only
            per_code = np.array(
                [self._thr.get(t, np.iinfo(np.int64).max) for t in dict_vals],
                dtype=np.int64,
            )
            thr = per_code[np.asarray(codes.indices)]
            keep = v > thr
            out = batch.filter(pa.array(keep))
            return pa.table(
                {
                    "event_id": out["event_id"],
                    "event_type": out["event_type"],
                    "value_micro": pa.array(v[keep]),
                }
            )

    from .._rayutil import pool_size

    return ds.map_batches(
        FilterOutliers,
        fn_constructor_args=(thr_ref,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=pool_size(),
        num_cpus=1,
    )


SPLIT_TRAIN_PCT = 90
SPLIT_VAL_PCT = 5  # remainder (100 - train - val) is test


def train_test_split(sf_dir: str) -> ray.data.Dataset:
    """Deterministic train/val/test ASSIGNMENT over documents — the
    split every training-data pipeline pins before anything else.

    Splitting by RNG is non-reproducible across resumes and engines, so
    the split key is the same SQL-expressible Knuth multiplicative hash
    as ``sample_events``: hash(doc_id) % 100 → [0,90) train, [90,95)
    val, else test. A resumed partition, a re-run, and the DuckDB
    oracle all assign every document identically. Scale shape: one
    stateless vectorized map, no shuffle, no state."""
    ensure_serializable()
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "lang"]
    )

    def assign(batch: pa.Table) -> pa.Table:
        doc_id = batch["doc_id"].to_numpy(zero_copy_only=False)
        h = (_sample_hash(doc_id) % 100).astype(np.int64)
        split = np.where(
            h < SPLIT_TRAIN_PCT,
            "train",
            np.where(h < SPLIT_TRAIN_PCT + SPLIT_VAL_PCT, "val", "test"),
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "lang": batch["lang"],
                "h": pa.array(h),
                "split": pa.array(split.astype(object), pa.string()),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


CMS_WIDTH = 1024
CMS_DEPTH = 4
_CMS_P = (1 << 61) - 1
_cms_rng = np.random.default_rng(4242)
_CMS_A = _cms_rng.integers(1, 1 << 31, CMS_DEPTH, dtype=np.uint64)
_CMS_B = _cms_rng.integers(0, 1 << 31, CMS_DEPTH, dtype=np.uint64)


def _cms_rows(keys: np.ndarray) -> np.ndarray:
    """(depth, n) bucket indices for uint64 keys under the pairwise-
    independent family (a*x + b) mod p mod width; a < 2^31 and keys are
    crc32 (< 2^32) so products stay exact in uint64."""
    k = keys.astype(np.uint64)
    return np.stack(
        [((_CMS_A[d] * k + _CMS_B[d]) % np.uint64(_CMS_P)) % np.uint64(CMS_WIDTH)
         for d in range(CMS_DEPTH)]
    ).astype(np.int64)


def cms_word_counts(sf_dir: str) -> pd.DataFrame:
    """COUNT-MIN SKETCH over the corpus word stream (Cormode &
    Muthukrishnan 2005): fixed 4x1024 int64 memory whatever the
    vocabulary, mergeable by plain addition — the streaming-frequency
    sketch for open vocabularies where ``word_counts``' exact roll-up
    would be unbounded. Returns the estimate for every distinct word
    (closed fixture vocabulary) so tests can check the CMS guarantees:
    est >= true, est <= true + e*N with the standard (e, d) bound.

    Scale shape: each batch builds a LOCAL sketch with two
    ``np.add.at`` calls and emits CMS_DEPTH rows (one counter row per
    hash function); merging is a driver-side sum of (batches x depth)
    tiny integer rows — the corpus never shuffles."""
    ensure_serializable()
    import zlib

    def partial(batch: pa.Table) -> pa.Table:
        words = pc.list_flatten(
            pc.split_pattern(pc.fill_null(batch["text"], ""), " ")
        )
        words = words.filter(pc.not_equal(words, ""))
        keys = np.array(
            [zlib.crc32(w.encode()) for w in words.to_pylist()], dtype=np.uint64
        )
        sketch = np.zeros((CMS_DEPTH, CMS_WIDTH), dtype=np.int64)
        if keys.size:
            rows = _cms_rows(keys)
            for d in range(CMS_DEPTH):
                np.add.at(sketch[d], rows[d], 1)
        return pa.table(
            {
                "d": pa.array(np.arange(CMS_DEPTH, dtype=np.int32)),
                "counters": pa.array(list(sketch)),
            }
        )

    parts = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=["text"]
        )
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
    )
    sketch = np.zeros((CMS_DEPTH, CMS_WIDTH), dtype=np.int64)
    for d, counters in zip(parts["d"], parts["counters"]):
        sketch[d] += np.asarray(counters, dtype=np.int64)

    # point-query every distinct word (vocabulary-bounded at the fixture)
    vocab = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=["text"]
        )
        .map_batches(
            lambda b: pa.table(
                {
                    "word": pc.unique(
                        pc.list_flatten(
                            pc.split_pattern(pc.fill_null(b["text"], ""), " ")
                        ).filter(
                            pc.not_equal(
                                pc.list_flatten(
                                    pc.split_pattern(
                                        pc.fill_null(b["text"], ""), " "
                                    )
                                ),
                                "",
                            )
                        )
                    )
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .to_pandas()["word"]
        .unique()
    )
    keys = np.array([zlib.crc32(w.encode()) for w in vocab], dtype=np.uint64)
    rows = _cms_rows(keys)
    est = np.min(
        np.stack([sketch[d][rows[d]] for d in range(CMS_DEPTH)]), axis=0
    )
    order = np.argsort(vocab)
    return pd.DataFrame(
        {"word": vocab[order], "est_count": est[order].astype(np.int64)}
    )


# ---------------------------------------------------------------------------
# deterministic global shuffle for training-data export
# ---------------------------------------------------------------------------

SHUFFLE_SHARDS = 16


def shuffle_export(sf_dir: str, n_shards: int = SHUFFLE_SHARDS) -> ray.data.Dataset:
    """Deterministic global example shuffle -> (doc_id, shard, pos):
    the order-assignment step of a training-data export (SGD wants a
    stable pseudo-random visit order; a seeded hash beats
    random_shuffle because a resumed or re-run export reproduces the
    SAME order bit for bit — the O4 seeded-determinism discipline).

    shard = knuth_hash(doc_id) % n_shards; pos = the doc's rank within
    its shard ordered by (hash, doc_id). Scale shape: stateless hash
    map, ONE shuffle keyed by the n_shards-bounded shard id, one
    vectorized argsort per shard — no global sort, no driver pass. A
    shard is the resumable write unit (partition_cols analog); readers
    stream shards in any order and get a stitched pseudo-random
    permutation. SQL oracle: row_number() over the identical BIGINT
    hash replay."""
    ensure_serializable()
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )

    def tag(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = _sample_hash(ids)
        return pa.table(
            {
                "shard": pa.array((h % n_shards).astype(np.int64)),
                "h": pa.array(h),
                "doc_id": pa.array(ids),
            }
        )

    def order_shard(group: pa.Table) -> pa.Table:
        t = group.sort_by([("h", "ascending"), ("doc_id", "ascending")])
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "shard": t["shard"],
                "pos": pa.array(np.arange(t.num_rows, dtype=np.int64)),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("shard")
        .map_groups(order_shard, batch_format="pyarrow")
    )


def approx_distinct_users_by_type(sf_dir: str) -> ray.data.Dataset:
    """GROUPED HyperLogLog: distinct-user estimate PER event_type — the
    per-key approximate COUNT DISTINCT every analytics store exposes
    (``approx_distinct_users`` is the global form; the grouped form is
    what dashboards actually query). Rows-only like its global cousin
    (sketch-defined estimate); the per-group 5%-band accuracy is pinned
    against exact distincts in pytest.

    Scale shape: per-batch (event_type, register, rho) partials — at
    most types x 2^p rows each — merge through ONE
    groupby(type, register).max(rho) bounded by types x 2^p, and each
    type's estimate finalizes inside groupby(type).map_groups. The raw
    user column never shuffles, and nothing materializes on the
    driver (contrast the global form's driver-side finalize: the
    grouped finalize is itself distributed)."""
    ensure_serializable()
    ds = _read_events(sf_dir, ["event_type", "user_id"])

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {"event_type": batch["event_type"], "user_id": batch["user_id"]}
        )
        out_ty, out_reg, out_rho = [], [], []
        # few distinct types per batch: one _hll_partial per type-slice
        ty = t["event_type"].to_numpy(zero_copy_only=False)
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        for v in np.unique(ty):
            part = _hll_partial(uid[ty == v])
            k = part.num_rows
            out_ty.append(np.full(k, v))
            out_reg.append(part["register"].to_numpy(zero_copy_only=False))
            out_rho.append(part["rho"].to_numpy(zero_copy_only=False))
        if not out_ty:
            return pa.table(
                {"event_type": pa.array([], pa.string()),
                 "register": pa.array([], pa.int64()),
                 "rho": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "event_type": pa.array(np.concatenate(out_ty)),
                "register": pa.array(np.concatenate(out_reg)),
                "rho": pa.array(np.concatenate(out_rho)),
            }
        )

    merged = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "register"])
        .aggregate(Max("rho", alias_name="rho"))
    )

    def finalize(group: pa.Table) -> pa.Table:
        m = _HLL_M
        regs = np.zeros(m, dtype=np.int64)
        regs[group["register"].to_numpy(zero_copy_only=False)] = (
            group["rho"].to_numpy(zero_copy_only=False)
        )
        alpha = 0.7213 / (1.0 + 1.079 / m)
        est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
        zeros = int(np.count_nonzero(regs == 0))
        if est <= 2.5 * m and zeros:
            est = m * math.log(m / zeros)
        return pa.table(
            {
                "event_type": pa.array([group["event_type"][0].as_py()]),
                "estimate": pa.array([int(round(est))], pa.int64()),
            }
        )

    return merged.groupby("event_type").map_groups(
        finalize, batch_format="pyarrow"
    )
