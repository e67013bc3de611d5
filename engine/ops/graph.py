"""Iterative graph analytics over the relational tables.

PageRank-style authority scoring is a standard web-corpus curation
signal (link-graph centrality gates what gets crawled/kept — the same
role the reference's rule-based noise filters play per document,
applied corpus-wide). The engine runs it on the customer–supplier
trade graph (edges = distinct (custkey, suppkey) pairs observed in
orders x lineitem, both directions), in EXACT int64 micro-units so the
trajectory is bit-identical at any parallelism and fully replayable as
an unrolled DuckDB CTE oracle.

Physical shape (the iterative-analytics pattern alongside
similarity.kmeans_train_exact — but with a DISTRIBUTED state vector:
ranks are one row per node and never collapse to the driver, unlike
k-means' k-row centroid broadcast):

- build (3 bucketed shuffles, all int rows): co-locate orders+lineitem
  on hash(orderkey) (the q12 union idiom); batch-local distinct
  (cust, supp) pairs -> global distinct via packed-key buckets +
  np.unique; explode both directions tagged by hash(node), where ONE
  map_groups per bucket counts outdeg per src (in-bucket run lengths
  ARE global outdegrees) and emits edge rows AND the r0 node rows.
- the graph is materialize()d ONCE (an iterative algorithm re-reads
  its input every pass — same rationale as kmeans_train_exact; the
  materialized table is the DEDUPED edge list, much smaller than the
  fact tables it came from, never the input corpus).
- per iteration, ONE shuffle: union(edges, ranks) co-bucketed by
  hash(node) -> per-bucket searchsorted rank->edge join emits
  (dst, r // outdeg) contributions tagged hash(dst) -> per-bucket sum
  -> new ranks come out ALREADY bucketed for the next pass.

Update rule (PageRank x N formulation, damping 0.85, exact ints):
    r_0(v)    = SCALE
    r_i+1(v)  = (15*SCALE)//100 + (85 * sum_{u->v} r_i(u)//outdeg(u)) // 100
The node universe is nodes with >= 1 edge; the graph is bidirectional,
so src-universe == dst-universe and every node keeps a rank row at
every iteration — asserted loudly in the bucket join (M13-style).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .._rayutil import ensure_serializable
from .dedup import _GOLDEN, _bucket_of, _run_starts

PR_SCALE = 1_000_000
PR_D_NUM = 85
PR_D_DEN = 100
PR_TELEPORT = (PR_SCALE * (PR_D_DEN - PR_D_NUM)) // PR_D_DEN
PR_ITERS = 3

_GRAPH_SCHEMA = {
    "_nb": pa.int32(),
    "node": pa.int64(),
    "dst": pa.int64(),
    "outdeg": pa.int64(),
    "r": pa.int64(),
}


def _empty_graph() -> pa.Table:
    return pa.table({k: pa.array([], t) for k, t in _GRAPH_SCHEMA.items()})


def _pr_graph(sf_dir: str, num_buckets: int) -> ray.data.Dataset:
    """Graph table: edge rows (node=src, dst, outdeg, r=-1) and node
    rows (node, dst=-1, outdeg, r=PR_SCALE), all tagged
    _nb = hash(node) % num_buckets. Node ids: 2*custkey for customers,
    2*suppkey+1 for suppliers (the raw key domains overlap). Key-domain
    assumption (documented, same as _combine_pairs_bucketed): keys fit
    in 31 bits so a (cust, supp) pair packs into one int64."""
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_orderkey", "o_custkey"]
    )
    line = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"), columns=["l_orderkey", "l_suppkey"]
    )

    def tag_orders(batch: pa.Table) -> pa.Table:
        okey = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "_b": pa.array((okey % num_buckets).astype(np.int32)),
                "okey": pa.array(okey),
                "key": batch["o_custkey"],
                "side": pa.array(np.zeros(okey.size, dtype=np.int8)),
            }
        )

    def tag_line(batch: pa.Table) -> pa.Table:
        # batch-local distinct: lineitems of one order repeat suppliers
        okey = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        agg = (
            pa.table({"okey": pa.array(okey), "key": batch["l_suppkey"]})
            .group_by(["okey", "key"])
            .aggregate([])
        )
        ok = agg["okey"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "_b": pa.array((ok % num_buckets).astype(np.int32)),
                "okey": agg["okey"],
                "key": agg["key"],
                "side": pa.array(np.ones(len(agg), dtype=np.int8)),
            }
        )

    tagged = orders.map_batches(
        tag_orders, batch_format="pyarrow", zero_copy_batch=True
    ).union(line.map_batches(tag_line, batch_format="pyarrow", zero_copy_batch=True))

    def pair_bucket(group: pa.Table) -> pa.Table:
        """Join custkey onto each order's suppliers within the orderkey
        bucket; emit bucket-local distinct packed (cust, supp) pairs."""
        t = group.combine_chunks()
        side = t["side"].to_numpy(zero_copy_only=False)
        okey = t["okey"].to_numpy(zero_copy_only=False)
        key = t["key"].to_numpy(zero_copy_only=False).astype(np.int64)
        is_order = side == 0
        o_keys, o_cust = okey[is_order], key[is_order]
        l_okey, l_supp = okey[~is_order], key[~is_order]
        if l_okey.size == 0:
            return pa.table({"pk": pa.array([], pa.int64())})
        order_sort = np.argsort(o_keys)
        o_sorted, c_sorted = o_keys[order_sort], o_cust[order_sort]
        pos = np.clip(np.searchsorted(o_sorted, l_okey), 0, o_sorted.size - 1)
        if o_sorted.size == 0 or (o_sorted[pos] != l_okey).any():
            raise ValueError("pagerank graph: lineitem orderkey missing from orders")
        pk = (c_sorted[pos] << 32) | l_supp
        return pa.table({"pk": pa.array(np.unique(pk))})

    pairs = tagged.groupby("_b").map_groups(
        lambda g: pair_bucket(g.drop_columns(["_b"])), batch_format="pyarrow"
    )

    def tag_pk(batch: pa.Table) -> pa.Table:
        pk = batch["pk"].to_numpy(zero_copy_only=False)
        h = (pk.astype(np.uint64) * _GOLDEN) >> np.uint64(32)
        return pa.table(
            {
                "_pb": pa.array((h % np.uint64(num_buckets)).astype(np.int32)),
                "pk": batch["pk"],
            }
        )

    def explode_bucket(group: pa.Table) -> pa.Table:
        """Global-distinct pairs (all copies of a pk share its bucket),
        exploded to both edge directions tagged by hash(src)."""
        pk = np.unique(group["pk"].to_numpy(zero_copy_only=False))
        cust, supp = pk >> 32, pk & 0xFFFFFFFF
        src = np.concatenate([2 * cust, 2 * supp + 1])
        dst = np.concatenate([2 * supp + 1, 2 * cust])
        return pa.table(
            {
                "_eb": pa.array(_bucket_of(src, num_buckets=num_buckets)),
                "src": pa.array(src),
                "dst": pa.array(dst),
            }
        )

    exploded = (
        pairs.map_batches(tag_pk, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_pb")
        .map_groups(
            lambda g: explode_bucket(g.drop_columns(["_pb"])), batch_format="pyarrow"
        )
    )

    def degree_bucket(group: pa.Table) -> pa.Table:
        """All edges of a src live in its bucket, so in-bucket run
        lengths ARE global outdegrees. Emits edge rows + r0 node rows."""
        t = group.sort_by([("src", "ascending")]).combine_chunks()
        src = t["src"].to_numpy(zero_copy_only=False)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        if src.size == 0:
            return _empty_graph()
        new_run = _run_starts(src)
        run_id = np.cumsum(new_run) - 1
        outdeg = np.bincount(run_id)[run_id].astype(np.int64)
        uniq = src[new_run]
        node = np.concatenate([src, uniq])
        return pa.table(
            {
                "_nb": pa.array(_bucket_of(node, num_buckets=num_buckets)),
                "node": pa.array(node),
                "dst": pa.array(
                    np.concatenate([dst, np.full(uniq.size, -1, dtype=np.int64)])
                ),
                "outdeg": pa.array(
                    np.concatenate([outdeg, np.zeros(uniq.size, dtype=np.int64)])
                ),
                "r": pa.array(
                    np.concatenate(
                        [
                            np.full(src.size, -1, dtype=np.int64),
                            np.full(uniq.size, PR_SCALE, dtype=np.int64),
                        ]
                    )
                ),
            }
        )

    return exploded.groupby("_eb").map_groups(
        lambda g: degree_bucket(g.drop_columns(["_eb"])), batch_format="pyarrow"
    )


def _contrib_bucket(group: pa.Table, num_buckets: int) -> pa.Table:
    """Per hash(node) bucket: join each edge's src rank via ONE
    searchsorted, emit (dst, r // outdeg) tagged hash(dst)."""
    t = group.combine_chunks()
    dst = t["dst"].to_numpy(zero_copy_only=False)
    node = t["node"].to_numpy(zero_copy_only=False)
    r = t["r"].to_numpy(zero_copy_only=False)
    is_rank = dst < 0
    r_nodes, r_vals = node[is_rank], r[is_rank]
    e_src, e_dst = node[~is_rank], dst[~is_rank]
    e_deg = t["outdeg"].to_numpy(zero_copy_only=False)[~is_rank]
    if e_src.size == 0:
        return pa.table(
            {
                "_nb": pa.array([], pa.int32()),
                "node": pa.array([], pa.int64()),
                "contrib": pa.array([], pa.int64()),
            }
        )
    order = np.argsort(r_nodes)
    rn_sorted, rv_sorted = r_nodes[order], r_vals[order]
    pos = np.clip(np.searchsorted(rn_sorted, e_src), 0, max(rn_sorted.size - 1, 0))
    if rn_sorted.size == 0 or (rn_sorted[pos] != e_src).any():
        # every edge src must carry a rank row (bidirectional universe)
        raise ValueError("pagerank: edge src missing its rank row in bucket")
    contrib = rv_sorted[pos] // e_deg
    return pa.table(
        {
            "_nb": pa.array(_bucket_of(e_dst, num_buckets=num_buckets)),
            "node": pa.array(e_dst),
            "contrib": pa.array(contrib),
        }
    )


def pagerank_entities(
    sf_dir: str, iters: int = PR_ITERS, num_buckets: int | None = None
) -> ray.data.Dataset:
    """Damped PageRank over the bidirectional customer–supplier trade
    graph; returns (node, rank_micro) with node = 2*custkey |
    2*suppkey+1 and rank_micro the exact int64 micro-unit rank after
    ``iters`` synchronous iterations (see module docstring for the
    update rule and the per-iteration single-shuffle shape)."""
    from ..pipeline import default_num_buckets

    if num_buckets is None:
        num_buckets = default_num_buckets()
    ensure_serializable()
    graph = _pr_graph(sf_dir, num_buckets).materialize()

    def split_edges(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater_equal(batch["dst"], 0))

    def split_ranks(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.less(batch["dst"], 0))

    edges = graph.map_batches(split_edges, batch_format="pyarrow", zero_copy_batch=True)
    ranks = graph.map_batches(split_ranks, batch_format="pyarrow", zero_copy_batch=True)

    def rank_bucket(group: pa.Table, nb: int = num_buckets) -> pa.Table:
        t = group.sort_by([("node", "ascending")]).combine_chunks()
        node = t["node"].to_numpy(zero_copy_only=False)
        contrib = t["contrib"].to_numpy(zero_copy_only=False)
        if node.size == 0:
            return _empty_graph()
        new_run = _run_starts(node)
        run_id = np.cumsum(new_run) - 1
        sums = np.bincount(run_id, weights=contrib).astype(np.int64)
        # bincount weights go through float64 — exact only below 2^53;
        # bound: per-node incoming sum <= total rank ~ n_nodes * SCALE.
        if sums.size and sums.max() > (1 << 53):
            raise ValueError("pagerank: contribution sum exceeds exact-float53 bound")
        uniq = node[new_run]
        r_new = PR_TELEPORT + (PR_D_NUM * sums) // PR_D_DEN
        return pa.table(
            {
                "_nb": pa.array(_bucket_of(uniq, num_buckets=nb)),
                "node": pa.array(uniq),
                "dst": pa.array(np.full(uniq.size, -1, dtype=np.int64)),
                "outdeg": pa.array(np.zeros(uniq.size, dtype=np.int64)),
                "r": pa.array(r_new),
            }
        )

    for _ in range(iters):
        both = edges.union(ranks)
        contribs = both.groupby("_nb").map_groups(
            lambda g: _contrib_bucket(g.drop_columns(["_nb"]), num_buckets),
            batch_format="pyarrow",
        )
        ranks = contribs.groupby("_nb").map_groups(
            lambda g: rank_bucket(g.drop_columns(["_nb"])), batch_format="pyarrow"
        )

    def project(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch["node"], "rank_micro": batch["r"]})

    return ranks.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# Weakly-connected components of the thresholded trade graph
# ---------------------------------------------------------------------------

TRADE_MIN_INTERACTIONS = 4


def trade_components(
    sf_dir: str,
    min_interactions: int = TRADE_MIN_INTERACTIONS,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Weakly-connected components of the STRONG trade graph: edges are
    (customer, supplier) pairs with >= ``min_interactions`` lineitems
    between them; each edge-incident entity gets ``component`` = min
    node id reachable through strong edges — the trading-bloc /
    community-detection primitive (the canonical iterative graph op
    next to ``pagerank_entities``'s centrality; dedup_clusters is the
    same algorithm over the near-dup doc graph).

    Node encoding matches pagerank: 2*custkey / 2*suppkey+1 (the raw
    key domains overlap). Physical shape: ONE hash(orderkey)
    co-location (orders never joins lineitem — the q12 union idiom)
    emitting per-bucket (pair, count) partials, one packed-pair-keyed
    int shuffle for exact global counts + threshold, then dedup's
    hash-to-min label propagation over edge-incident nodes only (the
    strong subgraph — a tiny fraction of the fact tables) with the
    monotone label-sum fixpoint test. Thresholding BEFORE propagation
    is what keeps the iterated state small at corpus scale."""
    from .dedup import MAX_CC_ITERS, _attach_min_labels, _pair_num_buckets

    if num_buckets is None:
        num_buckets = _pair_num_buckets()
    ensure_serializable()

    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_orderkey", "o_custkey"]
    )
    line = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"), columns=["l_orderkey", "l_suppkey"]
    )

    def tag_orders(batch: pa.Table) -> pa.Table:
        okey = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "_b": pa.array((okey % num_buckets).astype(np.int32)),
                "okey": pa.array(okey),
                "key": batch["o_custkey"],
                "n": pa.array(np.zeros(okey.size, dtype=np.int64)),  # side tag
            }
        )

    def tag_line(batch: pa.Table) -> pa.Table:
        # keep MULTIPLICITY (unlike pagerank's distinct pairs): count
        # lineitems per (order, supplier) batch-locally
        okey = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        agg = (
            pa.table({"okey": pa.array(okey), "key": batch["l_suppkey"]})
            .group_by(["okey", "key"])
            .aggregate([([], "count_all")])
        )
        ok = agg["okey"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "_b": pa.array((ok % num_buckets).astype(np.int32)),
                "okey": agg["okey"],
                "key": agg["key"],
                "n": pc.cast(agg["count_all"], pa.int64()),
            }
        )

    tagged = orders.map_batches(
        tag_orders, batch_format="pyarrow", zero_copy_batch=True
    ).union(line.map_batches(tag_line, batch_format="pyarrow", zero_copy_batch=True))

    def pair_count_bucket(group: pa.Table) -> pa.Table:
        """Within the orderkey bucket: attach custkey to each order's
        supplier counts, emit (packed pair, n) partials."""
        t = group.combine_chunks()
        n = t["n"].to_numpy(zero_copy_only=False)
        okey = t["okey"].to_numpy(zero_copy_only=False)
        key = t["key"].to_numpy(zero_copy_only=False).astype(np.int64)
        is_order = n == 0
        o_keys, o_cust = okey[is_order], key[is_order]
        l_okey, l_supp, l_n = okey[~is_order], key[~is_order], n[~is_order]
        if l_okey.size == 0:
            return pa.table(
                {"pk": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        order_sort = np.argsort(o_keys)
        o_sorted, c_sorted = o_keys[order_sort], o_cust[order_sort]
        pos = np.clip(np.searchsorted(o_sorted, l_okey), 0, o_sorted.size - 1)
        if o_sorted.size == 0 or (o_sorted[pos] != l_okey).any():
            raise ValueError(
                "trade_components: lineitem orderkey missing from orders"
            )
        pk = (c_sorted[pos] << 32) | l_supp
        agg = (
            pa.table({"pk": pa.array(pk), "n": pa.array(l_n)})
            .group_by(["pk"])
            .aggregate([("n", "sum")])
        )
        return pa.table({"pk": agg["pk"], "n": agg["n_sum"]})

    pairs = tagged.groupby("_b").map_groups(
        lambda g: pair_count_bucket(g.drop_columns(["_b"])), batch_format="pyarrow"
    )

    def tag_pk(batch: pa.Table) -> pa.Table:
        pk = batch["pk"].to_numpy(zero_copy_only=False)
        h = (pk.astype(np.uint64) * _GOLDEN) >> np.uint64(32)
        return pa.table(
            {
                "_pb": pa.array((h % np.uint64(num_buckets)).astype(np.int32)),
                "pk": batch["pk"],
                "n": batch["n"],
            }
        )

    def strong_edges_bucket(group: pa.Table) -> pa.Table:
        """Global pair counts (all partials of a pk share its bucket);
        threshold, then emit symmetric edge rows in dedup's
        (key, v, label) propagation schema."""
        t = group.combine_chunks()
        pk = t["pk"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False)
        order = np.argsort(pk)
        pk, n = pk[order], n[order]
        heads = np.flatnonzero(_run_starts(pk))
        totals = np.add.reduceat(n, heads)
        keep = pk[heads][totals >= min_interactions]
        cust, supp = keep >> 32, keep & 0xFFFFFFFF
        u = np.concatenate([2 * cust, 2 * supp + 1])
        v = np.concatenate([2 * supp + 1, 2 * cust])
        return pa.table(
            {
                "key": pa.array(u),
                "v": pa.array(v),
                "label": pa.array(np.full(u.size, -1, dtype=np.int64)),
            }
        )

    edges = (
        pairs.map_batches(tag_pk, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_pb")
        .map_groups(
            lambda g: strong_edges_bucket(g.drop_columns(["_pb"])),
            batch_format="pyarrow",
        )
        .materialize()  # iterated: the strong subgraph, not the fact tables
    )
    graph_buckets = int(max(8, min(num_buckets, edges.count() // 20_000 + 8)))
    edges = edges.repartition(graph_buckets).materialize()

    def init_incident_labels(batch: pa.Table) -> pa.Table:
        ids = pc.unique(batch["key"])
        return pa.table(
            {
                "key": ids,
                "v": pa.array(np.full(len(ids), -1, dtype=np.int64)),
                "label": ids,
            }
        )

    labels = edges.map_batches(
        init_incident_labels, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def add_key_bucket(batch: pa.Table) -> pa.Table:
        key = batch["key"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "_pb", pa.array(_bucket_of(key, num_buckets=graph_buckets))
        )

    def add_node_bucket(batch: pa.Table) -> pa.Table:
        node = batch["node"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "_nb", pa.array(_bucket_of(node, num_buckets=graph_buckets))
        )

    _i64_max = np.iinfo(np.int64).max

    def min_label_per_node(group: pa.Table) -> pa.Table:
        t = group.combine_chunks()
        node = t["node"].to_numpy(zero_copy_only=False)
        label = t["label"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(node, return_inverse=True)
        mins = np.full(len(uniq), _i64_max, dtype=np.int64)
        np.minimum.at(mins, inv, label)
        return pa.table(
            {
                "key": pa.array(uniq),
                "v": pa.array(np.full(len(uniq), -1, dtype=np.int64)),
                "label": pa.array(mins),
            }
        )

    prev_sum = None
    for _it in range(MAX_CC_ITERS):
        candidates = (
            labels.union(edges)
            .map_batches(add_key_bucket, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("_pb")
            .map_groups(
                lambda g: _attach_min_labels(g.drop_columns(["_pb"])),
                batch_format="pyarrow",
            )
        )
        labels = (
            candidates.map_batches(
                add_node_bucket, batch_format="pyarrow", zero_copy_batch=True
            )
            .groupby("_nb")
            .map_groups(
                lambda g: min_label_per_node(g.drop_columns(["_nb"])),
                batch_format="pyarrow",
            )
            .materialize()
        )
        cur_sum = labels.sum("label")
        if cur_sum == prev_sum:  # monotone labels: equal sum == fixpoint
            break
        prev_sum = cur_sum
    else:  # pragma: no cover
        raise RuntimeError(
            f"trade_components propagation did not converge in {MAX_CC_ITERS}"
        )

    def decode(batch: pa.Table) -> pa.Table:
        node = batch["key"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "entity": pa.array(
                    np.where(node % 2 == 0, "customer", "supplier")
                ),
                "entity_key": pa.array(node // 2),
                "component": batch["label"],
            }
        )

    return labels.map_batches(decode, batch_format="pyarrow", zero_copy_batch=True)
