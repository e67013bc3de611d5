"""Deduplication operators over the documents table.

Training-data-pipeline operators (task brief): exact dedup, MinHash
near-dup, SimHash near-dup — each expressed Ray-Data-first:

- exact:   vectorized content-hash per batch -> groupby(hash) ->
           native Min/Count aggregate
- minhash: shingle -> minhash signature per batch (numpy vectorized)
           -> explode to (perm, value, doc) rows -> per-bucket pair
           expansion -> perm-agreement COUNT per pair -> est = m/64
           (the counting identity: est_jaccard == fraction of agreeing
           permutations, computed without ever shuffling a signature)
- simhash: 64-bit simhash per batch -> band on 16-bit chunks ->
           bucket groupby -> candidate pairs -> hamming filter

Every bucket-pair stage shares one physical shape: rows are bucketed by
``hash(key) % num_buckets`` in the EXPLODE stage (so the single shuffle
moves small integer rows), and one ``map_groups`` call per BUCKET (not
per key!) expands all within-key pairs vectorized via
``_pairs_within_runs`` — zero per-key Python at any corpus size.

All hashing is crc32/md5-based — deterministic across processes (never
Python's salted hash()). The test corpus is the documents table with
injected duplicates (exact copies and word-dropped near-copies at
shifted doc_ids) so the operators have real work to find; the injection
is itself expressible in SQL, keeping the exact-dedup oracle checkable.
"""

from __future__ import annotations

import os
import zlib
from typing import List

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .._rayutil import ensure_serializable, pool_size
from .similarity import emb_matrix

# ---------------------------------------------------------------------------
# corpus with injected duplicates
# ---------------------------------------------------------------------------

EXACT_DUP_OFFSET = 100_000
NEAR_DUP_OFFSET = 200_000


def dup_corpus(sf_dir: str) -> ray.data.Dataset:
    """documents UNION exact copies (every doc, id+100000) UNION word-dropped
    near-copies (every 2nd doc, id+200000). Deterministic; SQL-expressible
    for the exact part (see __ray_entry__.oracle_sql).

    Synthesized in ONE map_batches emitting all three variants per batch
    (a batch transform may return more rows than it got): a 3-branch
    ``Dataset.union`` re-executed the read per branch and tripled the
    block count, which tripled every downstream shuffle's per-block
    overhead — measured 4.2s -> 0.5s for the corpus and 192 -> 64
    blocks at sf0.1."""
    ensure_serializable()
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def synth_variants(batch: pa.Table) -> pa.Table:
        near = batch.filter(pc.equal(pc.bit_wise_and(batch["doc_id"], 1), 0))
        # drop the last whitespace-delimited token -> high-Jaccard near-dup
        trimmed = pc.replace_substring_regex(near["text"], r"\s+\S+$", "")
        return pa.concat_tables(
            [
                batch,
                pa.table(
                    {
                        "doc_id": pc.add(batch["doc_id"], EXACT_DUP_OFFSET),
                        "text": batch["text"],
                    }
                ),
                pa.table(
                    {
                        "doc_id": pc.add(near["doc_id"], NEAR_DUP_OFFSET),
                        "text": trimmed,
                    }
                ),
            ]
        )

    return ds.map_batches(
        synth_variants, batch_format="pyarrow", zero_copy_batch=True
    )


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def text_hash128(col, key_prefix: str):
    """128-bit content key as TWO independent fixed-key siphashes of a
    string column (vectorized C loops; two independent 64-bit keys give
    the same birthday bound as one 128-bit hash). ``key_prefix`` must be
    15 chars — pandas requires EXACTLY 16-byte hash keys, enforced here
    so a wrong-length key fails at definition time, not inside a Ray
    worker. Shared by ``dedup_exact`` and ``textstats.curate_documents``."""
    from pandas.util import hash_array

    k1, k2 = f"{key_prefix}1", f"{key_prefix}2"
    if len(k1) != 16:
        raise ValueError(f"hash key prefix must be 15 chars, got {key_prefix!r}")
    texts = np.asarray(col.to_pylist(), dtype=object)
    return (
        hash_array(texts, hash_key=k1).view(np.int64),
        hash_array(texts, hash_key=k2).view(np.int64),
    )


def dedup_exact(sf_dir: str) -> ray.data.Dataset:
    """Keep min doc_id per distinct text; emit (doc_id, n_dups).

    Pattern: vectorized content hash in map_batches, hash-partitioned
    groupby, NATIVE Min/Count aggregate (no per-group Python — a
    map_groups finalizer costs one interpreter call per distinct text,
    billions at corpus scale). The group key is 128 bits built from TWO
    independent fixed-key siphashes of the text (vectorized C loops —
    ~3x the throughput of a per-row Python md5 loop; two independent
    64-bit keys give the same birthday bound as one 128-bit hash), so
    the shuffle moves (h1, h2, doc_id) int64 triples — never the text
    itself."""
    from ray.data.aggregate import Count, Min

    ds = dup_corpus(sf_dir)

    def add_hash(batch: pa.Table) -> pa.Table:
        h1, h2 = text_hash128(batch["text"], "engine-dedupkey")
        return pa.table(
            {"h1": pa.array(h1), "h2": pa.array(h2), "doc_id": batch["doc_id"]}
        )

    hashed = ds.map_batches(add_hash, batch_format="pyarrow", zero_copy_batch=True)
    agg = hashed.groupby(["h1", "h2"]).aggregate(
        Min("doc_id", alias_name="doc_id"), Count(alias_name="n_dups")
    )
    return agg.select_columns(["doc_id", "n_dups"])


def dup_cluster_sizes(sf_dir: str) -> ray.data.Dataset:
    """Histogram of exact-duplicate cluster sizes: (n_docs, n_clusters) —
    the standard dedup diagnostic ("how much of the corpus sits in
    2-copy clusters vs 1000-copy boilerplate?").

    Two-level bounded aggregation: level 1 is dedup_exact's shuffle
    (128-bit content hash as int64 triples, native Count per distinct
    text — no text ever moves); level 2 re-aggregates those counts with
    per-batch count-of-counts partials, so the second shuffle is bounded
    by the number of DISTINCT cluster sizes (tiny), not cluster count."""
    from ray.data.aggregate import Count, Sum

    ds = dup_corpus(sf_dir)

    def add_hash(batch: pa.Table) -> pa.Table:
        h1, h2 = text_hash128(batch["text"], "engine-dedupkey")
        return pa.table({"h1": pa.array(h1), "h2": pa.array(h2)})

    hashed = ds.map_batches(add_hash, batch_format="pyarrow", zero_copy_batch=True)
    sizes = hashed.groupby(["h1", "h2"]).aggregate(Count(alias_name="n_docs"))

    def partial(batch: pa.Table) -> pa.Table:
        g = (
            pa.table({"n_docs": batch["n_docs"]})
            .group_by(["n_docs"])
            .aggregate([([], "count_all")])
        )
        # select by name — pyarrow puts key columns first, aggregates after
        return pa.table(
            {"n_docs": g["n_docs"], "n_clusters": g["count_all"]}
        )

    partials = sizes.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return partials.groupby("n_docs").aggregate(
        Sum("n_clusters", alias_name="n_clusters")
    )


# ---------------------------------------------------------------------------
# shared bucket-pair machinery
# ---------------------------------------------------------------------------

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _pair_num_buckets() -> int:
    from ..pipeline import default_num_buckets

    return default_num_buckets()


def _bucket_of(*key_cols, num_buckets: int) -> np.ndarray:
    """Deterministic int32 shuffle bucket from one or more int key columns
    (multiplicative mix — never Python's salted hash())."""
    h = np.zeros(len(key_cols[0]), dtype=np.uint64)
    for col in key_cols:
        h = (h ^ np.asarray(col).astype(np.uint64)) * _GOLDEN
    return (h % np.uint64(num_buckets)).astype(np.int32)


def _run_starts(*cols) -> np.ndarray:
    """Boolean new-run marker over already-sorted parallel key columns."""
    n = len(cols[0])
    new = np.zeros(n, dtype=bool)
    if n:
        new[0] = True
        for col in cols:
            new[1:] |= col[1:] != col[:-1]
    return new


def _pairs_within_runs(new_run: np.ndarray):
    """All (i < j) row-index pairs within each run, fully vectorized.

    ``new_run`` marks run starts over sorted rows. For a run of size s
    every row at local position p pairs as the left element with the
    s-1-p rows after it; the classic repeat/cumsum construction builds
    every pair index without a Python loop over runs — this is what lets
    ONE map_groups call per shuffle bucket serve millions of keys."""
    n = len(new_run)
    if n == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    starts = np.flatnonzero(new_run)
    sizes = np.diff(np.append(starts, n))
    pos = np.arange(n) - np.repeat(starts, sizes)
    counts = np.repeat(sizes, sizes) - 1 - pos   # pairs led by each row
    total = int(counts.sum())
    ii = np.repeat(np.arange(n), counts)
    block_start = np.concatenate(([0], np.cumsum(counts)[:-1]))
    t = np.arange(total) - np.repeat(block_start, counts)
    jj = ii + 1 + t
    return ii, jj


_PAIR_LOW32 = np.int64(0xFFFFFFFF)


def _combine_pairs_bucketed(
    pairs: ray.data.Dataset, finalize, extra_reducers: dict | None = None
) -> ray.data.Dataset:
    """Global (doc_a, doc_b) pair combine WITHOUT a millions-of-distinct-
    keys shuffle.

    A native ``groupby(["doc_a", "doc_b"]).aggregate(...)`` sort-shuffles
    on the pair key itself — measured 83s for 8.4M pair rows / 7.0M
    distinct pairs at sf0.1 because the sort cost scales with distinct
    keys. Instead: pack the pair into one int64 (doc ids < 2^31 — the
    same documented key-domain assumption as the SQL-reproducible sample
    hash; at larger id domains swap in a 2-int64 key), tag a HASH BUCKET
    of the packed key, and reduce each bucket with one vectorized
    ``np.unique`` — the shuffle key drops to ``_pair_num_buckets()``
    distinct values (7.4s for the same input, 11x).

    ``pairs`` columns: doc_a, doc_b (+ value columns).
    ``finalize(doc_a, doc_b, cnt, extras)`` gets per-distinct-pair
    arrays (extras = one value per pair column: a representative by
    default — correct only for pair-constant columns — or a real
    per-pair reduction when ``extra_reducers`` names one, currently
    ``"max"``; used by ``dedup_editdist`` where the eq witness flag
    varies across a pair's rows) and returns the op's output table."""
    num_qb = _pair_num_buckets()
    extra_reducers = extra_reducers or {}

    def tag(batch: pa.Table) -> pa.Table:
        a = batch["doc_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["doc_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        pk = (a << 32) | b
        h = (pk.astype(np.uint64) * _GOLDEN) >> np.uint64(32)
        cols = {
            "_qb": pa.array((h % np.uint64(num_qb)).astype(np.int32)),
            "pk": pa.array(pk),
        }
        for name in batch.column_names:
            if name not in ("doc_a", "doc_b"):
                cols[name] = batch[name]
        return pa.table(cols)

    def count_bucket(group: pa.Table) -> pa.Table:
        t = group.combine_chunks()
        pk = t["pk"].to_numpy(zero_copy_only=False)
        uniq, inv, cnt = np.unique(pk, return_inverse=True, return_counts=True)
        extras = {}
        for name in t.column_names:
            if name == "pk":
                continue
            col = t[name].to_numpy(zero_copy_only=False)
            red = extra_reducers.get(name)
            if red == "max":
                rep = np.full(len(uniq), np.iinfo(col.dtype).min, dtype=col.dtype)
                np.maximum.at(rep, inv, col)
            elif red is None:
                rep = np.empty(len(uniq), dtype=col.dtype)
                rep[inv] = col  # pair-constant columns: any representative
            else:
                raise ValueError(f"unknown extra reducer {red!r} for {name!r}")
            extras[name] = rep
        return finalize(uniq >> 32, uniq & _PAIR_LOW32, cnt.astype(np.int64), extras)

    tagged = pairs.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    return tagged.groupby("_qb").map_groups(
        lambda g: count_bucket(g.drop_columns(["_qb"])), batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# MinHash near-dup (perm-agreement counting)
# ---------------------------------------------------------------------------

N_PERM = 64
SHINGLE_K = 3         # word 3-grams
_MERSENNE = (1 << 61) - 1

_rng = np.random.default_rng(12345)
# a < 2^31 keeps a*x under 2^63 for crc32 shingles (x < 2^32), so the
# (a*x + b) mod p universal hash is computed EXACTLY in uint64 — with
# a drawn from the full [1, p) range the product needs 93 bits and
# silently wraps, making the documented hash family a lie.
_A = _rng.integers(1, 1 << 31, N_PERM, dtype=np.uint64)
_B = _rng.integers(0, _MERSENNE, N_PERM).astype(np.uint64)


def shingles(text: str, k: int = SHINGLE_K) -> np.ndarray:
    words = text.split()
    if len(words) < k:
        grams = [" ".join(words)] if words else [""]
    else:
        grams = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    return np.unique(
        np.fromiter((zlib.crc32(g.encode()) for g in grams), dtype=np.int64)
    )


def minhash_signature(text: str) -> np.ndarray:
    sh = shingles(text).astype(np.uint64)
    # (a * x + b) mod p over all shingles, min per permutation — exact:
    # a*x < 2^63, + b < 2^61, sum < 2^64 (see _A comment above)
    vals = (_A[:, None] * sh[None, :] + _B[:, None]) % np.uint64(_MERSENNE)
    return vals.min(axis=1).astype(np.int64)


# A (perm, value) bucket with document frequency above this cap is
# dropped before pair expansion — the hot-bucket quadratic guard (same
# posture as the jaccard gram df-cap). A pair must agree on
# threshold*N_PERM perms to survive, so losing a few hot perms only
# lowers its count if a large share of its agreements are hot values.
MINHASH_DF_CAP = 4096


class MinHashPermStage:
    """Actor-pool stage: signature per doc, exploded to (perm, value,
    doc_id) rows + the fused shuffle bucket.

    24 bytes of int payload per row, 64 rows per doc (~1.8 KB/doc through
    the shuffle) — vs ~128 KB/doc when the full signature rode on every
    band row. The estimate is recovered downstream by COUNTING perm
    agreements per pair (est = m / N_PERM), which is bit-identical to
    mean(sig_a == sig_b) and needs no signature side-table or join."""

    def __init__(self, num_buckets: int) -> None:
        self._sig = minhash_signature
        self._perms = np.arange(N_PERM, dtype=np.int32)
        self._num_buckets = num_buckets

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        n = len(ids)
        values = np.empty((n, N_PERM), dtype=np.int64)
        for k, text in enumerate(texts):
            values[k] = self._sig(text)
        flat_vals = values.reshape(-1)
        flat_perm = np.tile(self._perms, n)
        return pa.table(
            {
                "_pb": pa.array(
                    _bucket_of(flat_perm, flat_vals, num_buckets=self._num_buckets)
                ),
                "perm": pa.array(flat_perm),
                "value": pa.array(flat_vals),
                "doc_id": pa.array(np.repeat(ids, N_PERM)),
            }
        )


def _minhash_bucket_pairs(group: pa.Table) -> pa.Table:
    """One call per SHUFFLE BUCKET: expand (doc_a, doc_b) for every
    (perm, value) run in the bucket, vectorized end to end."""
    t = group.sort_by(
        [("perm", "ascending"), ("value", "ascending"), ("doc_id", "ascending")]
    ).combine_chunks()
    perm = t.column("perm").to_numpy(zero_copy_only=False)
    value = t.column("value").to_numpy(zero_copy_only=False)
    ids = t.column("doc_id").to_numpy(zero_copy_only=False)
    new_run = _run_starts(perm, value)
    # hot-bucket guard: drop runs larger than the df cap
    if len(new_run):
        starts = np.flatnonzero(new_run)
        sizes = np.diff(np.append(starts, len(new_run)))
        if (sizes > MINHASH_DF_CAP).any():
            keep = np.repeat(sizes <= MINHASH_DF_CAP, sizes)
            perm, value, ids = perm[keep], value[keep], ids[keep]
            new_run = _run_starts(perm, value)
    ii, jj = _pairs_within_runs(new_run)
    return pa.table(
        {
            "doc_a": pa.array(ids[ii]),
            "doc_b": pa.array(ids[jj]),
        }
    )


def dedup_minhash(sf_dir: str, threshold: float = 0.5) -> ray.data.Dataset:
    """MinHash near-dup pairs by perm-agreement counting: shingle ->
    minhash -> explode to perm rows -> bucketed pair expansion ->
    Count per (doc_a, doc_b) -> est_jaccard = m/N_PERM >= threshold.

    Same estimator as signature comparison (fraction of agreeing
    permutations), strictly higher recall than banded LSH (a pair needs
    one shared perm value to be counted, not a full shared band), and
    the shuffle never moves a signature."""
    num_buckets = _pair_num_buckets()
    ds = dup_corpus(sf_dir)
    exploded = ds.map_batches(
        MinHashPermStage,
        fn_constructor_args=(num_buckets,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=pool_size(),
        num_cpus=1,
    )
    pairs = exploded.groupby("_pb").map_groups(
        lambda g: _minhash_bucket_pairs(g.drop_columns(["_pb"])),
        batch_format="pyarrow",
    )
    def finalize(doc_a, doc_b, cnt, extras):
        est = cnt / float(N_PERM)
        keep = est >= threshold
        return pa.table(
            {
                "doc_a": pa.array(doc_a[keep]),
                "doc_b": pa.array(doc_b[keep]),
                "est_jaccard": pa.array(est[keep]),
            }
        )

    return _combine_pairs_bucketed(pairs, finalize)


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------

SIMHASH_BITS = 64
SIMHASH_CHUNKS = 4  # 4 x 16-bit chunks; hamming<=3 guarantees one equal chunk


def simhash64(text: str) -> int:
    words = text.split()
    if not words:
        return 0
    hashes = np.fromiter(
        (zlib.crc32(w.encode()) | (zlib.crc32(w[::-1].encode()) << 32) for w in words),
        dtype=np.uint64,
    )
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
        np.int64
    )
    vote = (2 * bits - 1).sum(axis=0)
    return int(
        np.bitwise_or.reduce(
            (vote > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)
        )
    )


_POPCNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (numpy 1.x has no bitwise_count)."""
    if len(x) == 0:
        return np.empty(0, dtype=np.int64)
    return (
        _POPCNT8[np.ascontiguousarray(x).view(np.uint8).reshape(len(x), 8)]
        .sum(axis=1)
        .astype(np.int64)
    )


class SimHashStage:
    """(chunk, chunk_val, doc_id, fp) rows + fused shuffle bucket."""

    def __init__(self, num_buckets: int) -> None:
        self._simhash = simhash64
        self._num_buckets = num_buckets
        self._chunks = np.arange(SIMHASH_CHUNKS, dtype=np.int32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        n = len(ids)
        fps = np.fromiter(
            (self._simhash(t) for t in texts), dtype=np.uint64, count=n
        )
        chunk = np.tile(self._chunks, n)
        shifts = (16 * self._chunks).astype(np.uint64)
        chunk_val = (
            (fps[:, None] >> shifts[None, :]) & np.uint64(0xFFFF)
        ).reshape(-1).astype(np.int64)
        return pa.table(
            {
                "_pb": pa.array(
                    _bucket_of(chunk, chunk_val, num_buckets=self._num_buckets)
                ),
                "chunk": pa.array(chunk),
                "chunk_val": pa.array(chunk_val),
                "doc_id": pa.array(np.repeat(ids, SIMHASH_CHUNKS)),
                "fp": pa.array(np.repeat(fps, SIMHASH_CHUNKS).view(np.int64)),
            }
        )


def _simhash_bucket_pairs(max_hamming: int):
    def bucket_pairs(group: pa.Table) -> pa.Table:
        t = group.sort_by(
            [("chunk", "ascending"), ("chunk_val", "ascending"),
             ("doc_id", "ascending")]
        ).combine_chunks()
        chunk = t.column("chunk").to_numpy(zero_copy_only=False)
        val = t.column("chunk_val").to_numpy(zero_copy_only=False)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        fps = t.column("fp").to_numpy(zero_copy_only=False).view(np.uint64)
        ii, jj = _pairs_within_runs(_run_starts(chunk, val))
        dist = _popcount64(fps[ii] ^ fps[jj])
        keep = dist <= max_hamming
        return pa.table(
            {
                "doc_a": pa.array(ids[ii][keep]),
                "doc_b": pa.array(ids[jj][keep]),
                "hamming": pa.array(dist[keep]),
            }
        )

    return bucket_pairs


def dedup_simhash(sf_dir: str, max_hamming: int = 3) -> ray.data.Dataset:
    """SimHash near-dup pairs via 16-bit-chunk banding (pigeonhole: any
    pair within hamming<=3 of 64 bits shares at least one of 4 chunks).
    One vectorized pair expansion per shuffle bucket; pair dedup rides
    the bucketed pair combine (hamming is pair-constant across chunks,
    so any representative survives)."""
    num_buckets = _pair_num_buckets()
    ds = dup_corpus(sf_dir)
    banded = ds.map_batches(
        SimHashStage,
        fn_constructor_args=(num_buckets,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=pool_size(),
        num_cpus=1,
    )
    pairs = banded.groupby("_pb").map_groups(
        lambda g: _simhash_bucket_pairs(max_hamming)(g.drop_columns(["_pb"])),
        batch_format="pyarrow",
    )

    def finalize(doc_a, doc_b, cnt, extras):
        return pa.table(
            {
                "doc_a": pa.array(doc_a),
                "doc_b": pa.array(doc_b),
                "hamming": pa.array(extras["hamming"].astype(np.int64)),
            }
        )

    return _combine_pairs_bucketed(pairs, finalize)


# ---------------------------------------------------------------------------
# exact n-gram Jaccard near-dup (inverted gram index + pair counting)
# ---------------------------------------------------------------------------

JACCARD_THRESHOLD = 0.6
_G_DECIMALS = 6


def _gram_hashes(text: str, k: int = SHINGLE_K) -> np.ndarray:
    """Distinct 64-bit hashes of word k-grams (crc32 of gram + crc32 of
    reversed gram in the high bits — collision odds ~2^-64, so bucket
    co-occurrence counting equals true intersection size)."""
    words = text.split()
    if len(words) < k:
        grams = [" ".join(words)] if words else [""]
    else:
        grams = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    return np.unique(
        np.fromiter(
            (
                np.int64(
                    np.uint64(zlib.crc32(g.encode()))
                    | (np.uint64(zlib.crc32(g[::-1].encode())) << np.uint64(32))
                )
                for g in grams
            ),
            dtype=np.int64,
        )
    )


class GramIndexStage:
    """Explode each doc into (gram_hash, doc_id, n_grams) rows + fused
    shuffle bucket.

    ``n_grams`` (a doc-constant int) rides on every row so the downstream
    pair aggregate needs NO join and NO broadcast: exact Jaccard is
    c / (na + nb - c) where c = number of gram buckets a pair shares —
    the inverted-index identity |A∩B| = #{g : g∈A and g∈B}."""

    def __init__(self, num_buckets: int, k: int = SHINGLE_K) -> None:
        self._gram_hashes = _gram_hashes
        self._num_buckets = num_buckets
        self._k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        gh_out, id_out, n_out = [], [], []
        for doc_id, text in zip(ids, texts):
            gh = self._gram_hashes(text, self._k)
            gh_out.append(gh)
            id_out.append(np.full(len(gh), doc_id, dtype=np.int64))
            n_out.append(np.full(len(gh), len(gh), dtype=np.int64))
        gh = np.concatenate(gh_out)
        return pa.table(
            {
                "_pb": pa.array(_bucket_of(gh, num_buckets=self._num_buckets)),
                "gram_hash": pa.array(gh),
                "doc_id": pa.array(np.concatenate(id_out)),
                "n_grams": pa.array(np.concatenate(n_out)),
            }
        )


# A gram with document frequency above this cap is dropped before pair
# expansion — the hot-gram quadratic guard (mirrors MINHASH_DF_CAP): one
# stopword-like 3-gram shared by d documents expands d*(d-1)/2 pairs in a
# single run, so an uncapped run is O(corpus^2) at 100 TB. Dropping it
# loses only the pairs whose ENTIRE overlap is such stopword grams
# (capped Jaccard c' counts every non-hot shared gram; denominators
# na/nb stay exact). The DuckDB oracle applies the SAME cap, so the
# equality gate holds at any scale; at test scale no gram's df reaches
# the cap and capped == exact.
JACCARD_DF_CAP = 4096


def _gram_bucket_pairs(group: pa.Table, df_cap: int = JACCARD_DF_CAP) -> pa.Table:
    """All (doc_a < doc_b) pairs sharing a gram, for every gram in this
    shuffle bucket at once (vectorized multi-run expansion). Runs larger
    than ``df_cap`` are dropped before expansion — a gram hash lives in
    exactly one bucket, so the in-bucket run size IS the gram's global
    document frequency."""
    t = group.sort_by(
        [("gram_hash", "ascending"), ("doc_id", "ascending")]
    ).combine_chunks()
    gh = t.column("gram_hash").to_numpy(zero_copy_only=False)
    ids = t.column("doc_id").to_numpy(zero_copy_only=False)
    ng = t.column("n_grams").to_numpy(zero_copy_only=False)
    new_run = _run_starts(gh)
    if df_cap is not None and len(new_run):
        starts = np.flatnonzero(new_run)
        sizes = np.diff(np.append(starts, len(new_run)))
        if (sizes > df_cap).any():
            keep = np.repeat(sizes <= df_cap, sizes)
            gh, ids, ng = gh[keep], ids[keep], ng[keep]
            new_run = _run_starts(gh)
    ii, jj = _pairs_within_runs(new_run)
    return pa.table(
        {
            "doc_a": pa.array(ids[ii]),
            "doc_b": pa.array(ids[jj]),
            "na": pa.array(ng[ii]),
            "nb": pa.array(ng[jj]),
        }
    )


def dedup_jaccard(
    sf_dir: str,
    threshold: float = JACCARD_THRESHOLD,
    df_cap: int = JACCARD_DF_CAP,
) -> ray.data.Dataset:
    """Exact word-3-gram Jaccard near-dup pairs (recall 1.0 by construction
    for every pair with at least one shared gram under the df cap):
    explode docs over an inverted gram index, count bucket co-occurrences
    per pair (= exact intersection size), finish with c/(na+nb-c) >=
    threshold. The shuffle moves (int64 x 4) rows only; no text, no gram
    sets, no joins. ``df_cap`` bounds hot-gram pair expansion (see
    JACCARD_DF_CAP); pass ``df_cap=None`` for the uncapped exact
    configuration."""
    num_buckets = _pair_num_buckets()
    ds = dup_corpus(sf_dir)
    exploded = ds.map_batches(
        GramIndexStage,
        fn_constructor_args=(num_buckets,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=pool_size(),
        num_cpus=1,
    )
    pairs = exploded.groupby("_pb").map_groups(
        lambda g: _gram_bucket_pairs(g.drop_columns(["_pb"]), df_cap),
        batch_format="pyarrow",
    )
    def finalize(doc_a, doc_b, cnt, extras):
        c = cnt.astype(np.float64)
        na = extras["na"].astype(np.float64)
        nb = extras["nb"].astype(np.float64)
        jac = np.round(c / (na + nb - c), _G_DECIMALS)
        keep = jac >= threshold
        return pa.table(
            {
                "doc_a": pa.array(doc_a[keep]),
                "doc_b": pa.array(doc_b[keep]),
                "jaccard": pa.array(jac[keep]),
            }
        )

    return _combine_pairs_bucketed(pairs, finalize)


# ---------------------------------------------------------------------------
# exact-substring (duplicated word-window) dedup, keep-first
# ---------------------------------------------------------------------------

SPAN_K = 8  # words per window (the test-scale analog of ~50-token spans)
SPAN_DROP_NUM, SPAN_DROP_DEN = 4, 5  # drop iff n_dup_low/n_windows >= 4/5


def _span_bucket_partials(group: pa.Table) -> pa.Table:
    """One shuffle bucket of (gram_hash, doc_id) rows: window runs →
    'this window also lives in a LOWER doc_id' flags → per-doc partial
    (n_windows, n_dup_low) counts. In-bucket flags are globally correct
    because a gram hash lives in exactly one bucket; rows within a run
    are doc_id-sorted, so the run head IS the minimum owner."""
    t = group.sort_by(
        [("gram_hash", "ascending"), ("doc_id", "ascending")]
    ).combine_chunks()
    if t.num_rows == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_win": pa.array([], pa.int64()),
                "n_dup": pa.array([], pa.int64()),
            }
        )
    gh = t.column("gram_hash").to_numpy(zero_copy_only=False)
    ids = t.column("doc_id").to_numpy(zero_copy_only=False)
    marker = _run_starts(gh)
    run_id = np.cumsum(marker) - 1
    run_min = ids[np.flatnonzero(marker)][run_id]
    part = pa.table(
        {
            "doc_id": t["doc_id"],
            "dup": pa.array((ids > run_min).astype(np.int64)),
        }
    )
    agg = part.group_by(["doc_id"]).aggregate([("dup", "sum"), ("dup", "count")])
    return pa.table(
        {
            "doc_id": agg["doc_id"],
            "n_win": pc.cast(agg["dup_count"], pa.int64()),
            "n_dup": pc.cast(agg["dup_sum"], pa.int64()),
        }
    )


def dedup_spans(sf_dir: str) -> ray.data.Dataset:
    """Exact-substring dedup over duplicated word-8-gram windows,
    keep-first: a window is 'duplicated' for a doc iff the identical
    window occurs in some LOWER doc_id; a doc is dropped (keep = 0) when
    ≥ 4/5 of its distinct windows are duplicated. The span-level
    complement of whole-doc ``dedup_exact``: documents assembled mostly
    from text already owned by earlier documents are culled even when no
    single doc equals them (the 'exact substring' family of
    training-data dedup, at word-window granularity).

    Scale shape — the inverted-index pattern ``dedup_jaccard``
    established, with a COUNTING finisher instead of pair expansion (no
    quadratic run risk at any hot-window df): explode docs to
    (gram_hash, doc_id) rows bucketed by hash(gram) (the ONE text-free
    shuffle; 2×int64 + int32 per row), per-bucket run arithmetic marks
    lower-owner windows and pre-aggregates per doc, then a tiny
    groupby(doc_id) sums partials. The oracle compares gram STRINGS
    while the engine compares 64-bit gram hashes — identical up to crc
    collisions (~2⁻⁶⁴, same contract as ``dedup_jaccard``)."""
    from ray.data.aggregate import Sum

    num_buckets = _pair_num_buckets()
    ds = dup_corpus(sf_dir)
    exploded = ds.map_batches(
        GramIndexStage,
        fn_constructor_args=(num_buckets, SPAN_K),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=pool_size(),
        num_cpus=1,
    )
    partials = exploded.groupby("_pb").map_groups(
        lambda g: _span_bucket_partials(g.drop_columns(["_pb", "n_grams"])),
        batch_format="pyarrow",
    )
    agg = partials.groupby("doc_id").aggregate(
        Sum("n_win", alias_name="n_windows"),
        Sum("n_dup", alias_name="n_dup_windows"),
    )

    def finalize(batch: pa.Table) -> pa.Table:
        nw = batch["n_windows"].to_numpy(zero_copy_only=False)
        nd = batch["n_dup_windows"].to_numpy(zero_copy_only=False)
        keep = (SPAN_DROP_DEN * nd < SPAN_DROP_NUM * nw).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_windows": batch["n_windows"],
                "n_dup_windows": batch["n_dup_windows"],
                "keep": pa.array(keep),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# near-dup clustering: connected components over the pair graph
# ---------------------------------------------------------------------------

_I64_MAX = np.iinfo(np.int64).max
MAX_CC_ITERS = 50


def _attach_min_labels(group: pa.Table) -> pa.Table:
    """One shuffle bucket of mixed label rows (v == -1) and edge rows:
    for every key-run, find the node's current label and emit it along
    each outgoing edge plus for the node itself — the 'hash-to-min'
    propagation step, fully vectorized via reduceat over runs."""
    t = group.sort_by([("key", "ascending")]).combine_chunks()
    key = t.column("key").to_numpy(zero_copy_only=False)
    v = t.column("v").to_numpy(zero_copy_only=False)
    label = t.column("label").to_numpy(zero_copy_only=False)
    n = len(key)
    if n == 0:
        return pa.table(
            {"node": pa.array([], pa.int64()), "label": pa.array([], pa.int64())}
        )
    new_run = _run_starts(key)
    starts = np.flatnonzero(new_run)
    sizes = np.diff(np.append(starts, n))
    lab = np.where(v == -1, label, _I64_MAX)
    run_min = np.minimum.reduceat(lab, starts)
    per_row_min = np.repeat(run_min, sizes)
    is_edge = v != -1
    out_node = np.concatenate([v[is_edge], key[starts]])
    out_label = np.concatenate([per_row_min[is_edge], run_min])
    return pa.table({"node": pa.array(out_node), "label": pa.array(out_label)})


def dedup_clusters(sf_dir: str, threshold: float = JACCARD_THRESHOLD) -> ray.data.Dataset:
    """Connected-components dedup clustering: (doc_id, cluster_id) where
    cluster_id = min doc_id reachable through near-dup pairs (exact
    word-3-gram Jaccard >= threshold) — the keep-one-per-CLUSTER
    primitive (pairs alone under-dedup: A~B, B~C must collapse to one
    cluster even when A!~C directly).

    Physical shape (no joins — iterative min-label propagation,
    'hash-to-min'): labels L=(node,label) and symmetric edges E=(u,v)
    union into one stream bucketed by hash(key); one vectorized
    map_groups per bucket emits each node's current min label along its
    edges; a second bucketed map_groups min-reduces per node. Labels
    only decrease and sum(label) is computed per iteration — unchanged
    sum == fixpoint (exact: labels are monotone). Each iteration
    MATERIALIZES the label table because a lazy Dataset would re-execute
    the whole lineage every loop; the pair-generation stage runs once.

    Scale posture: iterations run ONLY over edge-INCIDENT nodes — the
    near-dup graph, which is the dup-rate fraction of the corpus, not
    the corpus itself. Every never-paired document is a singleton whose
    cluster_id is its own id; those join in one final bucketed merge
    pass, so a 10^12-doc corpus with 1% near-dups iterates over 10^10
    label rows instead of 10^12. Iterations ~ graph diameter; near-dup
    clusters are shallow (test corpus: 2-3)."""
    ensure_serializable()
    num_buckets = _pair_num_buckets()

    pairs = dedup_jaccard(sf_dir, threshold).materialize()

    def sym_edges(batch: pa.Table) -> pa.Table:
        a = batch["doc_a"].to_numpy(zero_copy_only=False)
        b = batch["doc_b"].to_numpy(zero_copy_only=False)
        key = np.concatenate([a, b])
        v = np.concatenate([b, a])
        return pa.table(
            {
                "key": pa.array(key),
                "v": pa.array(v),
                "label": pa.array(np.full(len(key), -1, dtype=np.int64)),
            }
        )

    edges = pairs.map_batches(
        sym_edges, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    # propagation shuffles carry only the dup GRAPH (edges + incident
    # labels), typically orders of magnitude smaller than the corpus the
    # outer bucket count is sized for — size the per-iteration bucket
    # count to the graph so each of ~diameter iterations doesn't pay
    # 64 reduce tasks to move a few thousand rows
    graph_buckets = int(max(8, min(num_buckets, edges.count() // 20_000 + 8)))
    # compact the graph to graph_buckets blocks ONCE: edges re-enter the
    # union every iteration, and the per-iteration sort cost here is
    # per-block task overhead, not data volume (64 near-empty blocks per
    # side measured 3.5-5s/iter; compacted ~1s)
    edges = edges.repartition(graph_buckets).materialize()

    def init_incident_labels(batch: pa.Table) -> pa.Table:
        # per-batch distinct endpoints; the first min-reduce dedups globally
        ids = pc.unique(batch["key"])
        n = len(ids)
        return pa.table(
            {
                "key": ids,
                "v": pa.array(np.full(n, -1, dtype=np.int64)),
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

    def add_node_bucket(batch: pa.Table, nb: int) -> pa.Table:
        node = batch["node"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "_nb", pa.array(_bucket_of(node, num_buckets=nb))
        )

    def min_label_per_node(group: pa.Table) -> pa.Table:
        t = group.combine_chunks()
        node = t["node"].to_numpy(zero_copy_only=False)
        label = t["label"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(node, return_inverse=True)
        mins = np.full(len(uniq), _I64_MAX, dtype=np.int64)
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
                add_node_bucket,
                fn_kwargs={"nb": graph_buckets},
                batch_format="pyarrow",
                zero_copy_batch=True,
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
        raise RuntimeError(f"label propagation did not converge in {MAX_CC_ITERS}")

    # singleton merge: every corpus doc starts labeled with itself; the
    # propagated labels (edge-incident docs only) override via min
    def init_self(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"]
        return pa.table({"node": ids, "label": ids})

    corpus_self = (
        dup_corpus(sf_dir)
        .select_columns(["doc_id"])
        .map_batches(init_self, batch_format="pyarrow", zero_copy_batch=True)
    )
    propagated = labels.map_batches(
        lambda t: pa.table({"node": t["key"], "label": t["label"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def finish(group: pa.Table) -> pa.Table:
        t = min_label_per_node(group)
        return pa.table({"doc_id": t["key"], "cluster_id": t["label"]})

    # corpus-sized pass: use the full, cluster-scaled bucket count
    return (
        corpus_self.union(propagated)
        .map_batches(
            add_node_bucket,
            fn_kwargs={"nb": num_buckets},
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("_nb")
        .map_groups(
            lambda g: finish(g.drop_columns(["_nb"])), batch_format="pyarrow"
        )
    )


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------

EMB_DUP_OFFSET = 10_000
COSINE_THRESHOLD = 0.8
_C_DECIMALS = 6


def emb_dup_corpus(sf_dir: str) -> ray.data.Dataset:
    """embeddings UNION perturbed copies (vec_id+10000, x*0.9+0.01 cast to
    float32) — cosine(v, v') ~= 1 for the injected pairs while natural
    pairs top out well under the threshold. The perturbation is
    SQL-expressible (list_transform + CAST AS FLOAT) so the exact variant
    has a DuckDB oracle."""
    ensure_serializable()
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )

    def perturbed(batch: pa.Table) -> pa.Table:
        emb = emb_matrix(batch["embedding"])
        pert = (emb * 0.9 + 0.01).astype(np.float32)
        return pa.table(
            {
                "vec_id": pc.add(batch["vec_id"], EMB_DUP_OFFSET),
                "embedding": pa.array(list(pert), pa.list_(pa.float32())),
            }
        )

    return ds.union(
        ds.map_batches(perturbed, batch_format="pyarrow", zero_copy_batch=True)
    )


def _emb_matrix(ds: ray.data.Dataset):
    tab = pa.concat_tables(ray.get(r) for r in ds.to_arrow_refs())
    ids = tab["vec_id"].to_numpy(zero_copy_only=False)
    mat = emb_matrix(tab["embedding"])
    order = np.argsort(ids)
    return ids[order], mat[order]


class _CosinePairs:
    """Per-batch rows x broadcast-corpus matmul; emits (a < b) pairs over
    the threshold. The corpus matrix is ray.put once and fetched once per
    actor — the brute-force baseline; use dedup_embedding_lsh at scale."""

    def __init__(self, corpus_ref, threshold: float):
        ids, mat = ray.get(corpus_ref)
        self._ids = ids
        norms = np.linalg.norm(mat, axis=1)
        self._mat = mat
        self._norms = norms
        self._threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        vids = batch["vec_id"].to_numpy(zero_copy_only=False)
        emb = emb_matrix(batch["embedding"])
        scores = (emb @ self._mat.T) / (
            np.linalg.norm(emb, axis=1)[:, None] * self._norms[None, :]
        )
        # round BEFORE thresholding so a pair at cosine in
        # [threshold - 5e-7, threshold) matches the oracle's
        # round(...,6) >= threshold (same discipline as dedup_jaccard)
        scores = np.round(scores, _C_DECIMALS)
        # a < b keeps each pair exactly once across batches
        keep = (vids[:, None] < self._ids[None, :]) & (scores >= self._threshold)
        ii, jj = np.nonzero(keep)
        return pa.table(
            {
                "doc_a": pa.array(vids[ii]),
                "doc_b": pa.array(self._ids[jj]),
                "cosine": pa.array(scores[ii, jj]),
            }
        )


def dedup_embedding(sf_dir: str, threshold: float = COSINE_THRESHOLD) -> ray.data.Dataset:
    """Exact embedding-cosine near-dup pairs (brute-force baseline)."""
    ds = emb_dup_corpus(sf_dir)
    ids, mat = _emb_matrix(ds)
    corpus_ref = ray.put((ids, mat))
    return emb_dup_corpus(sf_dir).map_batches(
        _CosinePairs,
        fn_constructor_args=(corpus_ref, threshold),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=pool_size(),
        num_cpus=1,
    )


N_HYPERPLANES = 64
SRP_BANDS = 8          # 8 bands x 8 bits
SRP_BITS = N_HYPERPLANES // SRP_BANDS

_srp_rng = np.random.default_rng(777)
# fixed hyperplanes; dim read lazily at first use would add state — the
# embeddings tables are 64-dim (TESTDATA.md), pinned here
SRP_DIM = 64
_HYPERPLANES = _srp_rng.standard_normal((N_HYPERPLANES, SRP_DIM))


class _SrpBandStage:
    """Signed-random-projection signature, exploded to band rows carrying
    the embedding (so candidate verification is local to the bucket) +
    the fused shuffle bucket."""

    def __init__(self, num_buckets: int) -> None:
        self._H = _HYPERPLANES
        self._num_buckets = num_buckets

    def __call__(self, batch: pa.Table) -> pa.Table:
        vids = batch["vec_id"].to_numpy(zero_copy_only=False)
        emb = emb_matrix(batch["embedding"])
        bits = (emb @ self._H.T) > 0                       # (n, 64)
        weights = (1 << np.arange(SRP_BITS, dtype=np.int64))
        n = len(vids)
        band_ids = np.tile(np.arange(SRP_BANDS, dtype=np.int32), n)
        band_vals = (
            bits.reshape(n, SRP_BANDS, SRP_BITS) @ weights
        ).reshape(-1)
        return pa.table(
            {
                "_pb": pa.array(
                    _bucket_of(band_ids, band_vals, num_buckets=self._num_buckets)
                ),
                "band": pa.array(band_ids),
                "band_val": pa.array(band_vals),
                "vec_id": pa.array(np.repeat(vids, SRP_BANDS)),
                "embedding": batch["embedding"].take(
                    pa.array(np.repeat(np.arange(n), SRP_BANDS))
                ),
            }
        )


def _srp_bucket_pairs(threshold: float):
    def bucket_pairs(group: pa.Table) -> pa.Table:
        t = group.sort_by(
            [("band", "ascending"), ("band_val", "ascending"),
             ("vec_id", "ascending")]
        ).combine_chunks()
        band = t.column("band").to_numpy(zero_copy_only=False)
        val = t.column("band_val").to_numpy(zero_copy_only=False)
        ids = t.column("vec_id").to_numpy(zero_copy_only=False)
        ii, jj = _pairs_within_runs(_run_starts(band, val))
        if len(ii) == 0:
            return pa.table(
                {
                    "doc_a": pa.array([], pa.int64()),
                    "doc_b": pa.array([], pa.int64()),
                    "cosine": pa.array([], pa.float64()),
                }
            )
        emb = emb_matrix(t.column("embedding"))
        nrm = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        # per-pair rowwise dot (NOT an all-pairs matmul), rounded before
        # thresholding — matches _CosinePairs and the oracle
        scores = np.round(np.einsum("ij,ij->i", nrm[ii], nrm[jj]), _C_DECIMALS)
        keep = scores >= threshold
        return pa.table(
            {
                "doc_a": pa.array(ids[ii][keep]),
                "doc_b": pa.array(ids[jj][keep]),
                "cosine": pa.array(scores[keep]),
            }
        )

    return bucket_pairs


def dedup_embedding_lsh(
    sf_dir: str, threshold: float = COSINE_THRESHOLD
) -> ray.data.Dataset:
    """Approximate embedding near-dup via SRP-LSH: sign-bit signature ->
    band buckets -> within-bucket exact cosine verify -> global pair
    dedup. The scale path: no broadcast corpus, shuffle moves band rows.
    Recall vs the exact variant is unit-tested (~1 at the injected
    near-dup similarity; misses need all 8 bands to differ)."""
    num_buckets = _pair_num_buckets()
    ds = emb_dup_corpus(sf_dir)
    banded = ds.map_batches(
        _SrpBandStage,
        fn_constructor_args=(num_buckets,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=pool_size(),
        num_cpus=1,
    )
    pairs = banded.groupby("_pb").map_groups(
        lambda g: _srp_bucket_pairs(threshold)(g.drop_columns(["_pb"])),
        batch_format="pyarrow",
    )
    # cosine is pair-constant across bands: any representative survives
    def finalize(doc_a, doc_b, cnt, extras):
        return pa.table(
            {
                "doc_a": pa.array(doc_a),
                "doc_b": pa.array(doc_b),
                "cosine": pa.array(extras["cosine"]),
            }
        )

    return _combine_pairs_bucketed(pairs, finalize)


# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------

DECON_NGRAM = 5
DECON_BENCH_MOD = 50  # doc_id % 50 == 0 plays the held-out benchmark set


def _doc_ngrams(text: str, n: int = DECON_NGRAM) -> set:
    """Word ``n``-grams under a literal single-space split (the
    ``word_counts`` tokenization, reproducible as DuckDB
    ``string_split(text, ' ')``). Docs with < n words yield no grams."""
    words = text.split(" ")
    return {" ".join(words[i : i + n]) for i in range(len(words) - n + 1)}


def _decon_gram_hash(grams: List[str]) -> np.ndarray:
    """Vectorized int64 siphash of gram strings (fixed 16-byte key, same
    C loop as text_hash128) — the Bloom/bucket key for decontamination."""
    from pandas.util import hash_array

    if not grams:
        return np.empty(0, dtype=np.int64)
    return hash_array(
        np.asarray(grams, dtype=object), hash_key="engine-deconkey1"
    ).view(np.int64)


def _or_reduce_bitmaps(ds: "ray.data.Dataset", nwords: int) -> np.ndarray:
    """OR-reduce one-bitmap-per-batch Bloom partials (a ``bitmap``
    binary column) by STREAMING them through ``iter_batches`` — the
    driver holds exactly ONE bitmap at any moment, so driver memory is
    O(bitmap) regardless of batch count. At 100 TB the partial count is
    ~10^6; ``take_all`` would materialize them all at once (~10^6 ×
    bitmap bytes), which is why this helper exists (VERDICT r4)."""
    bitmap = np.zeros(nwords, dtype=np.uint64)
    for batch in ds.iter_batches(batch_format="pyarrow"):
        for buf in batch["bitmap"].to_pylist():
            bitmap |= np.frombuffer(buf, dtype=np.uint64)
    return bitmap


def decontaminate_documents(sf_dir: str, mode: str = "bloom") -> ray.data.Dataset:
    """Benchmark DECONTAMINATION: flag every training document sharing
    any word 5-gram with a held-out benchmark set — the contamination
    filter run before any LLM training corpus ships (the n-gram-overlap
    rule popularized by public LM training reports). The benchmark here
    is doc_id % 50 == 0, standing in for a real eval suite.

    ``mode="bloom"`` (default — the 100 TB plan, bit-identical output):
      Pass 1 (bench side, fully distributed): each batch hashes its
      benchmark docs' distinct grams to int64 (vectorized siphash) and
      emits ONE 128 KB Bloom bitmap partial; the driver ORs batch-count
      rows and re-broadcasts a single bitmap via ``ray.put``. Nothing
      gram-count-proportional ever materializes on the driver — the
      broadcast is O(BLOOM_BITS) however large the benchmark grows.
      Pass 2 (training side): grams hash + Bloom-test per batch. Docs
      with ZERO hit grams are definitely clean (a Bloom filter has no
      false negatives) and emit (doc_id, 0) immediately, never entering
      any shuffle. Only the Bloom-HIT grams (true matches + the ~FP%
      sliver) ride a bucketed EXACT string join against the distributed
      bench gram table — killing both Bloom and hash collisions, so
      correctness never depends on the filter, only shuffle volume does.
      Pass 3: contaminated doc_ids resolve back to the per-doc flag with
      an int-only bucketed max over just the Bloom-hit docs.

    ``mode="broadcast"`` keeps the exact-string frozenset broadcast —
    the right plan for a REAL eval suite (fixed small size), where one
    broadcast beats any shuffle. Both modes are oracle-exact; the bloom
    plan is the default because this synthetic benchmark grows with the
    corpus (2% of docs), exactly the case the broadcast cannot survive."""
    ensure_serializable()
    if mode == "broadcast":
        return _decontaminate_broadcast(sf_dir)
    if mode != "bloom":
        raise ValueError(f"unknown decontamination mode {mode!r}")
    from ..pipeline import default_num_buckets
    from .relational import BLOOM_BITS, _bloom_positions, _bloom_test

    num_buckets = default_num_buckets()

    docs_path = os.path.join(sf_dir, "documents.parquet")
    bench = ray.data.read_parquet(docs_path, columns=["doc_id", "text"])

    def _bench_gram_lists(batch: pa.Table):
        """(grams, ghash) of the batch's benchmark docs, batch-distinct."""
        doc_id = batch["doc_id"].to_numpy(zero_copy_only=False)
        keep = doc_id % DECON_BENCH_MOD == 0
        grams: set = set()
        for t in batch.filter(pa.array(keep))["text"].to_pylist():
            grams.update(_doc_ngrams(t))
        grams = sorted(grams)
        return grams, _decon_gram_hash(grams)

    def bloom_partial(batch: pa.Table) -> pa.Table:
        _, gh = _bench_gram_lists(batch)
        bm = np.zeros(BLOOM_BITS // 64, dtype=np.uint64)
        if gh.size:
            p1, p2 = _bloom_positions(gh)
            w = np.uint64(64)
            np.bitwise_or.at(bm, p1 // 64, np.uint64(1) << (p1.astype(np.uint64) % w))
            np.bitwise_or.at(bm, p2 // 64, np.uint64(1) << (p2.astype(np.uint64) % w))
        return pa.table({"bitmap": pa.array([bm.tobytes()], pa.binary())})

    # streamed OR: O(128 KB) driver memory at ANY batch count
    bitmap = _or_reduce_bitmaps(
        bench.map_batches(
            bloom_partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        BLOOM_BITS // 64,
    )
    bitmap_ref = ray.put(bitmap)

    def tag_bench(batch: pa.Table) -> pa.Table:
        grams, gh = _bench_gram_lists(batch)
        return pa.table(
            {
                "_b": pa.array((gh % num_buckets).astype(np.int32)),
                "gram": pa.array(grams, pa.string()),
                "doc_id": pa.array(np.full(len(grams), -1, dtype=np.int64)),
                "is_bench": pa.array(np.ones(len(grams), dtype=np.int8)),
            }
        )

    def _train_grams(batch: pa.Table):
        """Per-doc DISTINCT grams of the batch's training docs, flattened
        to (train_table, doc_idx, grams, ghash)."""
        doc_id = batch["doc_id"].to_numpy(zero_copy_only=False)
        train = batch.filter(pa.array(doc_id % DECON_BENCH_MOD != 0))
        grams: list = []
        doc_idx: list = []
        for i, t in enumerate(train["text"].to_pylist()):
            g = _doc_ngrams(t)
            grams.extend(g)
            doc_idx.extend([i] * len(g))
        return (
            train,
            np.asarray(doc_idx, dtype=np.int64),
            grams,
            _decon_gram_hash(grams),
        )

    class TagAll:
        """ONE gram-extraction pass over the training docs (ADVICE r4:
        the former EmitClean + TagCandidates stages each re-derived the
        grams, doubling the dominant CPU cost — fused here). Per batch
        it emits a tagged union:
          is_bench=3 — (doc_id) clean rows for docs with NO Bloom-hit
                       gram (the overwhelming majority);
          is_bench=0 — Bloom-HIT (doc_id, gram) candidate rows;
          is_bench=2 — one (doc_id, '') marker row per hit doc (so a
                       doc whose every hit gram is a false positive
                       still resolves to flag 0 in pass 3)."""

        def __init__(self, ref):
            self._bm = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            train, doc_idx, grams, gh = _train_grams(batch)
            docs = train["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            hit = _bloom_test(self._bm, gh) if gh.size else np.zeros(0, bool)
            hit_any = np.zeros(train.num_rows, dtype=bool)
            if gh.size:
                np.logical_or.at(hit_any, doc_idx[hit], True)
            clean_docs = docs[~hit_any]
            hit_docs = np.unique(docs[doc_idx[hit]]) if gh.size else docs[:0]
            g_out = [grams[i] for i in np.flatnonzero(hit)]
            gh_out = gh[hit]
            return pa.table(
                {
                    "_b": pa.array(
                        np.concatenate(
                            [
                                (gh_out % num_buckets).astype(np.int32),
                                (hit_docs % num_buckets).astype(np.int32),
                                np.zeros(clean_docs.size, dtype=np.int32),
                            ]
                        )
                    ),
                    "gram": pa.array(
                        g_out + [""] * (len(hit_docs) + clean_docs.size),
                        pa.string(),
                    ),
                    "doc_id": pa.array(
                        np.concatenate([docs[doc_idx[hit]], hit_docs, clean_docs])
                    ),
                    "is_bench": pa.array(
                        np.concatenate(
                            [
                                np.zeros(len(g_out), dtype=np.int8),
                                np.full(len(hit_docs), 2, dtype=np.int8),
                                np.full(clean_docs.size, 3, dtype=np.int8),
                            ]
                        )
                    ),
                }
            )

    def verify_bucket(group: pa.Table) -> pa.Table:
        """In-bucket EXACT match: a candidate gram contaminates its doc
        iff the same STRING appears as a bench gram in this bucket (all
        occurrences of a gram share hash, hence bucket). Marker rows
        (is_bench=2) pass through so pass 3 sees every hit doc once."""
        t = group.combine_chunks()
        kind = t["is_bench"].to_numpy(zero_copy_only=False)
        bench_rows = t.filter(pa.array(kind == 1))
        cand_rows = t.filter(pa.array(kind == 0))
        markers = t.filter(pa.array(kind == 2))
        out_docs = [markers["doc_id"].to_numpy(zero_copy_only=False)]
        out_flags = [np.zeros(markers.num_rows, dtype=np.int64)]
        if cand_rows.num_rows and bench_rows.num_rows:
            match = pc.is_in(
                cand_rows["gram"], value_set=pc.unique(bench_rows["gram"])
            ).to_numpy(zero_copy_only=False)
            bad = np.unique(
                cand_rows["doc_id"].to_numpy(zero_copy_only=False)[match]
            )
            out_docs.append(bad)
            out_flags.append(np.ones(bad.size, dtype=np.int64))
        return pa.table(
            {
                "_b2": pa.array(
                    (np.concatenate(out_docs) % num_buckets).astype(np.int32)
                ),
                "doc_id": pa.array(np.concatenate(out_docs)),
                "contaminated": pa.array(np.concatenate(out_flags)),
            }
        )

    def resolve_bucket(group: pa.Table) -> pa.Table:
        """Per hit doc: max(flag) across its marker + match rows."""
        t = group.combine_chunks()
        docs = t["doc_id"].to_numpy(zero_copy_only=False)
        flags = t["contaminated"].to_numpy(zero_copy_only=False)
        order = np.lexsort((flags, docs))
        docs, flags = docs[order], flags[order]
        starts = np.flatnonzero(_run_starts(docs))
        ends = np.r_[starts[1:], docs.size] - 1
        return pa.table(
            {
                "doc_id": pa.array(docs[starts]),
                "contaminated": pa.array(flags[ends]),
            }
        )

    docs = ray.data.read_parquet(docs_path, columns=["doc_id", "text"])
    # Materialized so the clean/candidate split below reads the SAME
    # blocks instead of re-running gram extraction per consumer.
    # Bounded by construction: one 16-byte (doc_id, tag) row per
    # training doc plus the Bloom-HIT grams only — no document text.
    tagged = docs.map_batches(
        TagAll,
        fn_constructor_args=(bitmap_ref,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=pool_size(),
        num_cpus=1,
    ).materialize()

    def emit_clean(batch: pa.Table) -> pa.Table:
        out = batch.filter(pc.equal(batch["is_bench"], 3))
        return pa.table(
            {
                "doc_id": out["doc_id"],
                "contaminated": pa.array(np.zeros(out.num_rows, dtype=np.int64)),
            }
        )

    def keep_candidates(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.less(batch["is_bench"], 3))

    clean = tagged.map_batches(
        emit_clean, batch_format="pyarrow", zero_copy_batch=True
    )
    flagged = (
        tagged.map_batches(
            keep_candidates, batch_format="pyarrow", zero_copy_batch=True
        )
        .union(
            bench.map_batches(
                tag_bench, batch_format="pyarrow", zero_copy_batch=True
            )
        )
        .groupby("_b")
        .map_groups(
            lambda g: verify_bucket(g.drop_columns(["_b"])),
            batch_format="pyarrow",
        )
        .groupby("_b2")
        .map_groups(
            lambda g: resolve_bucket(g.drop_columns(["_b2"])),
            batch_format="pyarrow",
        )
    )
    return clean.union(flagged)


def _decontaminate_broadcast(sf_dir: str) -> ray.data.Dataset:
    """The exact-string broadcast plan (see decontaminate_documents)."""
    docs_path = os.path.join(sf_dir, "documents.parquet")
    bench = ray.data.read_parquet(docs_path, columns=["doc_id", "text"])

    def bench_grams(batch: pa.Table) -> pa.Table:
        doc_id = batch["doc_id"].to_numpy(zero_copy_only=False)
        keep = doc_id % DECON_BENCH_MOD == 0
        grams: set = set()
        for t in batch.filter(pa.array(keep))["text"].to_pylist():
            grams.update(_doc_ngrams(t))
        return pa.table({"gram": pa.array(sorted(grams), pa.string())})

    gram_rows = bench.map_batches(
        bench_grams, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    bench_ref = ray.put(frozenset(gram_rows["gram"]))

    class FlagContaminated:
        def __init__(self, ref):
            self._bench = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            doc_id = batch["doc_id"].to_numpy(zero_copy_only=False)
            train = batch.filter(pa.array(doc_id % DECON_BENCH_MOD != 0))
            flags = [
                int(not self._bench.isdisjoint(_doc_ngrams(t)))
                for t in train["text"].to_pylist()
            ]
            return pa.table(
                {
                    "doc_id": train["doc_id"],
                    "contaminated": pa.array(flags, pa.int64()),
                }
            )

    ds = ray.data.read_parquet(docs_path, columns=["doc_id", "text"])
    return ds.map_batches(
        FlagContaminated,
        fn_constructor_args=(bench_ref,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=pool_size(),
        num_cpus=1,
    )


# ---------------------------------------------------------------------------
# incremental ingest dedup (bloom-gated content hashing)
# ---------------------------------------------------------------------------

_ING_BLOOM_BITS = 1 << 16
_ING_BLOOM_K = 4


def _md5_prefix64(col) -> np.ndarray:
    """First 8 md5 bytes as big-endian int64 — the content key for
    ingest dedup (md5 itself is the fingerprint; 64 bits keeps the key
    numpy-native, collision odds ~n^2/2^64).

    Accepts an Arrow string array/column or a list of str. Arrow input
    hashes the UTF-8 bytes IN PLACE via memoryview slices of the data
    buffer — no to_pylist decode + re-encode round trip (the
    GlobalViewTurns._md5_hex pattern; dedup_incremental calls this per
    batch over the whole corpus)."""
    import hashlib

    md5 = hashlib.md5
    if isinstance(col, list):
        return np.array(
            [
                int.from_bytes(md5(t.encode()).digest()[:8], "big",
                               signed=True)
                for t in col
            ],
            dtype=np.int64,
        )
    if isinstance(col, pa.ChunkedArray):
        chunks = col.chunks
    else:
        chunks = [col]
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
                "big", signed=True,
            )
            for i in range(n)
        )
    return np.array(out, dtype=np.int64)


def _ing_bloom_positions(keys: np.ndarray) -> np.ndarray:
    """(k, n) bit positions via the splitmix-style golden-ratio remix."""
    h = keys.astype(np.uint64)
    out = []
    for i in range(_ING_BLOOM_K):
        h2 = (h + np.uint64(i + 1)) * _GOLDEN
        h2 ^= h2 >> np.uint64(31)
        out.append((h2 % np.uint64(_ING_BLOOM_BITS)).astype(np.int64))
    return np.stack(out)


def _ing_bitmap(keys: np.ndarray) -> np.ndarray:
    """Packed 64 Kbit Bloom bitmap of the given int64 keys."""
    bitmap = np.zeros(_ING_BLOOM_BITS // 64, dtype=np.uint64)
    if keys.size:
        pos = _ing_bloom_positions(keys).ravel()
        np.bitwise_or.at(
            bitmap, pos // 64, np.uint64(1) << (pos % 64).astype(np.uint64)
        )
    return bitmap


def _ing_bloom_test(bitmap: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Boolean membership test of int64 keys against an ingest bitmap."""
    hit = np.ones(keys.size, dtype=bool)
    if keys.size:
        for row in _ing_bloom_positions(keys):
            hit &= (
                (bitmap[row // 64] >> (row % 64).astype(np.uint64))
                & np.uint64(1)
            ) > 0
    return hit


def dedup_incremental(sf_dir: str, mode: str = "join") -> ray.data.Dataset:
    """INCREMENTAL INGEST DEDUP: which documents of an incoming shard
    are genuinely new against an existing corpus — the daily-crawl-
    ingest shape, where the corpus is huge and the shard is small.

    The membership structure is a Bloom filter BUILT DISTRIBUTED: each
    base batch emits its local 64 Kbit bitmap as one packed row and the
    driver STREAM-ORs them (``_or_reduce_bitmaps``: O(bitmap) driver
    memory at any batch count). The incoming stream then drops
    bloom-negatives immediately (definitely new — a Bloom filter has no
    false negatives — the overwhelming majority of a real crawl); only
    bloom-POSITIVES need exact verification.

    ``mode="join"`` (default — the corpus-scale plan, VERDICT r4 #3):
      the positives' keys are folded into a SECOND tiny Bloom bitmap
      (shard-side, stream-OR'd) and broadcast; ONE more pass over the
      base corpus emits only the keys hitting that bitmap — output
      positives-proportional (+ the ~FP% sliver), never
      corpus-proportional — into a bucketed exact int64-key join
      against the positive incoming rows. The driver holds exactly two
      fixed-size bitmaps; NOTHING corpus-proportional ever materializes
      on it (pinned by test_dedup_incremental_driver_memory_bound).
    ``mode="broadcast"`` keeps the distinct-key-set broadcast — the
      right plan when the BASE corpus is the small side (e.g. ingesting
      a big backfill against a young corpus); one ``ray.put`` beats any
      shuffle there. Both modes are oracle-exact.

    Incoming shard := the dup_corpus variants (exact copies -> dropped,
    word-trimmed near-copies -> kept: near-dup is NOT an exact dup)."""
    ensure_serializable()
    if mode not in ("join", "broadcast"):
        raise ValueError(f"unknown dedup_incremental mode {mode!r}")
    from ..pipeline import default_num_buckets

    base = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    )

    def bloom_partial(batch: pa.Table) -> pa.Table:
        keys = _md5_prefix64(batch["text"])
        return pa.table(
            {"bitmap": pa.array([_ing_bitmap(keys).tobytes()], pa.binary())}
        )

    bitmap = _or_reduce_bitmaps(
        base.map_batches(
            bloom_partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        _ING_BLOOM_BITS // 64,
    )
    bitmap_ref = ray.put(bitmap)

    if mode == "broadcast":
        # exact-verify side table for bloom positives — the base corpus
        # is declared the small side in this config
        base_keys = np.unique(
            np.concatenate(
                [_md5_prefix64(b["text"])
                 for b in base.iter_batches(batch_format="pyarrow")]
                or [np.empty(0, dtype=np.int64)]
            )
        )
        keys_ref = ray.put(base_keys)

        class KeepNew:
            def __init__(self, bm_ref, k_ref):
                self._bitmap = ray.get(bm_ref)
                self._base = ray.get(k_ref)

            def __call__(self, batch: pa.Table) -> pa.Table:
                inc = batch.filter(
                    pc.greater_equal(batch["doc_id"], EXACT_DUP_OFFSET)
                )
                if inc.num_rows == 0:
                    return pa.table({"doc_id": pa.array([], pa.int64())})
                keys = _md5_prefix64(inc["text"])
                hit = _ing_bloom_test(self._bitmap, keys)
                new = ~hit
                # exact check only for the bloom-positive tail
                if hit.any():
                    p = np.clip(
                        np.searchsorted(self._base, keys[hit]),
                        0,
                        max(self._base.size - 1, 0),
                    )
                    new[np.flatnonzero(hit)] = self._base[p] != keys[hit]
                return pa.table(
                    {"doc_id": pc.cast(inc["doc_id"], pa.int64()).filter(
                        pa.array(new))}
                )

        return dup_corpus(sf_dir).map_batches(
            KeepNew,
            fn_constructor_args=(bitmap_ref, keys_ref),
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=pool_size(),
            num_cpus=1,
        )

    num_buckets = default_num_buckets()

    class TagIncoming:
        """(doc_id, key, hit) per incoming row — one md5 pass."""

        def __init__(self, ref):
            self._bitmap = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            inc = batch.filter(
                pc.greater_equal(batch["doc_id"], EXACT_DUP_OFFSET)
            )
            keys = _md5_prefix64(inc["text"])
            return pa.table(
                {
                    "doc_id": pc.cast(inc["doc_id"], pa.int64()),
                    "key": pa.array(keys),
                    "hit": pa.array(
                        _ing_bloom_test(self._bitmap, keys).astype(np.int8)
                    ),
                }
            )

    # Materialized so the three consumers below (negatives, positive
    # bitmap, join rows) read the same blocks instead of re-deriving
    # dup_corpus + md5. Bounded by construction: 17 bytes per INCOMING
    # row — shard-sized, no text.
    tagged = dup_corpus(sf_dir).map_batches(
        TagIncoming,
        fn_constructor_args=(bitmap_ref,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=pool_size(),
        num_cpus=1,
    ).materialize()

    def keep_negatives(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch["hit"], 0)).select(["doc_id"])

    new_negative = tagged.map_batches(
        keep_negatives, batch_format="pyarrow", zero_copy_batch=True
    )

    def pos_bloom_partial(batch: pa.Table) -> pa.Table:
        keys = (
            batch.filter(pc.equal(batch["hit"], 1))["key"]
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        return pa.table(
            {"bitmap": pa.array([_ing_bitmap(keys).tobytes()], pa.binary())}
        )

    pos_bitmap = _or_reduce_bitmaps(
        tagged.map_batches(
            pos_bloom_partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        _ING_BLOOM_BITS // 64,
    )
    if not pos_bitmap.any():
        # clean crawl: zero bloom-positive incoming docs — every doc is
        # definitely new; skip the second base pass and the join
        # entirely (saves a full corpus scan in the common no-dup case)
        return new_negative
    pos_ref = ray.put(pos_bitmap)

    def inc_join_rows(batch: pa.Table) -> pa.Table:
        pos = batch.filter(pc.equal(batch["hit"], 1))
        k = pos["key"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "_b": pa.array((k % num_buckets).astype(np.int32)),
                "key": pos["key"],
                "doc_id": pos["doc_id"],
                "is_base": pa.array(np.zeros(k.size, dtype=np.int8)),
            }
        )

    class EmitBaseMatches:
        """ONE pruned pass over the base corpus: emit only batch-distinct
        keys hitting the positives bitmap — the join's base side is
        positives-proportional, never corpus-proportional."""

        def __init__(self, ref):
            self._pos = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            keys = np.unique(_md5_prefix64(batch["text"]))
            keys = keys[_ing_bloom_test(self._pos, keys)]
            return pa.table(
                {
                    "_b": pa.array((keys % num_buckets).astype(np.int32)),
                    "key": pa.array(keys),
                    "doc_id": pa.array(
                        np.full(keys.size, -1, dtype=np.int64)
                    ),
                    "is_base": pa.array(np.ones(keys.size, dtype=np.int8)),
                }
            )

    def verify_bucket(group: pa.Table) -> pa.Table:
        """In-bucket exact int64-key anti-join: an incoming positive is
        new iff no base key in its bucket equals its key (kills both
        Bloom false positives and bucket collisions)."""
        t = group.combine_chunks()
        isb = t["is_base"].to_numpy(zero_copy_only=False)
        base_keys = np.unique(
            t.filter(pa.array(isb == 1))["key"].to_numpy(zero_copy_only=False)
        )
        inc = t.filter(pa.array(isb == 0))
        k = inc["key"].to_numpy(zero_copy_only=False)
        if base_keys.size:
            p = np.clip(np.searchsorted(base_keys, k), 0, base_keys.size - 1)
            new = base_keys[p] != k
        else:
            new = np.ones(k.size, dtype=bool)
        return pa.table({"doc_id": inc["doc_id"].filter(pa.array(new))})

    joined_new = (
        tagged.map_batches(
            inc_join_rows, batch_format="pyarrow", zero_copy_batch=True
        )
        .union(
            base.map_batches(
                EmitBaseMatches,
                fn_constructor_args=(pos_ref,),
                batch_format="pyarrow",
                zero_copy_batch=True,
                concurrency=pool_size(),
                num_cpus=1,
            )
        )
        .groupby("_b")
        .map_groups(
            lambda g: verify_bucket(g.drop_columns(["_b"])),
            batch_format="pyarrow",
        )
    )
    return new_negative.union(joined_new)


# ---------------------------------------------------------------------------
# corpus-wide duplicate-LINE removal (C4 / RefinedWeb-style)
# ---------------------------------------------------------------------------

LINE_HEADER = "(c) corpus mirror - syndicated content"
LINE_MIN_COUNT = 2


def line_corpus(sf_dir: str) -> ray.data.Dataset:
    """documents with injected boilerplate lines: a corpus-wide header
    (duplicated everywhere), the original text (unique), a blank
    separator line, and a footer shared per source for even doc_ids /
    unique per doc for odd ones — the deterministic, SQL-expressible
    stand-in for the repeated nav/copyright lines of scraped web pages
    (same role ``dup_corpus`` plays for whole-document dedup)."""
    ensure_serializable()
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "source"],
    )

    def inject(batch: pa.Table) -> pa.Table:
        doc_id = batch["doc_id"].to_numpy(zero_copy_only=False)
        source = np.asarray(batch["source"].to_pylist(), dtype=object)
        footer = np.where(
            doc_id % 2 == 0,
            np.char.add("source: ", source.astype(str)),
            np.char.add("ref: doc-", doc_id.astype(str)),
        )
        n = len(doc_id)
        text = pc.binary_join_element_wise(
            pa.array([LINE_HEADER] * n),
            pc.fill_null(batch["text"], ""),
            pa.array([""] * n),
            pa.array(footer, pa.string()),
            "\n",
        )
        return pa.table({"doc_id": batch["doc_id"], "text": text})

    return ds.map_batches(inject, batch_format="pyarrow", zero_copy_batch=True)


def _explode_lines(batch: pa.Table):
    """Vectorized line explode: (doc_id, line_idx, flat line array).
    Every doc yields >= 1 line (splitting '' gives [''])."""
    lists = pc.split_pattern(pc.fill_null(batch["text"], ""), "\n")
    flat = pc.list_flatten(lists).combine_chunks()
    parent = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
    doc_id = batch["doc_id"].to_numpy(zero_copy_only=False)[parent]
    n = len(parent)
    run_start = np.zeros(n, dtype=np.int64)
    starts = np.flatnonzero(np.diff(parent, prepend=parent[0] - 1)) if n else []
    run_start[starts] = starts
    run_start = np.maximum.accumulate(run_start)
    line_idx = np.arange(n, dtype=np.int64) - run_start
    return doc_id, line_idx, flat


_LINE_IDX_BITS = 21  # <= 2^21 lines per doc; doc_id stays < 2^42


def _packed_line_key(doc_id: np.ndarray, line_idx: np.ndarray) -> np.ndarray:
    if len(line_idx) and int(line_idx.max()) >= (1 << _LINE_IDX_BITS):
        raise ValueError("doc exceeds 2^21 lines; widen _LINE_IDX_BITS")
    if len(doc_id) and int(doc_id.max()) >= (1 << (63 - _LINE_IDX_BITS)):
        # numpy wraps the shift silently; a wrapped key could alias two
        # docs and let the alignment assertion pass on misaligned rows
        raise ValueError("doc_id exceeds 2^42; widen the packed-key layout")
    return (doc_id.astype(np.int64) << _LINE_IDX_BITS) | line_idx.astype(np.int64)


def dedup_lines(
    sf_dir: str, min_count: int = LINE_MIN_COUNT, num_buckets: int | None = None
) -> ray.data.Dataset:
    """Corpus-wide duplicate-line removal — the C4/RefinedWeb curation
    step that strips nav bars, cookie banners and copyright footers: any
    non-blank line whose EXACT text occurs >= ``min_count`` times across
    the whole corpus is dropped from every document; blank lines never
    count and are always kept; documents are reassembled in original
    line order (plus kept/dropped counters).

    Scale shape — two shuffles, only one of which moves text:
    1. keys pass: explode to (doc_id, line_idx, h1, h2) int rows (128-bit
       line hash via ``text_hash128``, same collision discipline as
       ``dedup_exact``; the line TEXT never rides this shuffle), bucket
       by hash(h1,h2); ONE map_groups per bucket sorts its keys and
       marks rows whose run length >= min_count — a bucket holds every
       occurrence of its hashes, so in-bucket run counts ARE global
       counts (no separate count+join round-trip).
    2. reassembly pass: line text bucketed by hash(doc_id), unioned with
       the int-only marks (sentinel columns, ``anti_join_customers``
       style); per bucket both sides sort to the same (doc_id, line_idx)
       order — alignment asserted via packed keys, M13-style loud — and
       kept lines rejoin per doc through ``pa.ListArray`` offsets +
       ``pc.binary_join`` (no per-doc Python).

    The corpus is read twice (count pass, reassembly pass) — inherent to
    any count-then-filter over data too big to persist intermediate."""
    from ..pipeline import default_num_buckets

    if num_buckets is None:
        num_buckets = default_num_buckets()
    ensure_serializable()
    corpus = line_corpus(sf_dir)

    def explode_keys(batch: pa.Table) -> pa.Table:
        doc_id, line_idx, flat = _explode_lines(batch)
        h1, h2 = text_hash128(flat, "engine-linedkey")
        blank = np.asarray(pc.equal(flat, "").to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "_hb": pa.array(_bucket_of(h1, h2, num_buckets=num_buckets)),
                "h1": pa.array(h1),
                "h2": pa.array(h2),
                "doc_id": pa.array(doc_id),
                "line_idx": pa.array(line_idx),
                "blank": pa.array(blank),
            }
        )

    def mark_bucket(group: pa.Table) -> pa.Table:
        t = group.sort_by([("h1", "ascending"), ("h2", "ascending")])
        if t.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "line_idx": pa.array([], pa.int64()),
                    "banned": pa.array([], pa.int8()),
                }
            )
        h1 = t["h1"].to_numpy(zero_copy_only=False)
        h2 = t["h2"].to_numpy(zero_copy_only=False)
        blank = t["blank"].to_numpy(zero_copy_only=False)
        run_id = np.cumsum(_run_starts(h1, h2)) - 1
        per_row = np.bincount(run_id)[run_id]
        banned = ((per_row >= min_count) & ~blank).astype(np.int8)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "line_idx": t["line_idx"],
                "banned": pa.array(banned),
            }
        )

    marks = (
        corpus.map_batches(explode_keys, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_hb")
        .map_groups(
            lambda g: mark_bucket(g.drop_columns(["_hb"])), batch_format="pyarrow"
        )
    )

    def tag_lines(batch: pa.Table) -> pa.Table:
        doc_id, line_idx, flat = _explode_lines(batch)
        return pa.table(
            {
                "_db": pa.array(_bucket_of(doc_id, num_buckets=num_buckets)),
                "doc_id": pa.array(doc_id),
                "line_idx": pa.array(line_idx),
                "line": flat,
                "banned": pa.array(np.zeros(len(doc_id), dtype=np.int8)),
                "is_mark": pa.array(np.zeros(len(doc_id), dtype=np.int8)),
            }
        )

    def tag_marks(batch: pa.Table) -> pa.Table:
        doc_id = batch["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "_db": pa.array(_bucket_of(doc_id, num_buckets=num_buckets)),
                "doc_id": batch["doc_id"],
                "line_idx": batch["line_idx"],
                "line": pa.array([""] * len(doc_id), pa.string()),
                "banned": batch["banned"],
                "is_mark": pa.array(np.ones(len(doc_id), dtype=np.int8)),
            }
        )

    tagged = corpus.map_batches(
        tag_lines, batch_format="pyarrow", zero_copy_batch=True
    ).union(marks.map_batches(tag_marks, batch_format="pyarrow", zero_copy_batch=True))

    def reassemble(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "clean_text": pa.array([], pa.string()),
                "n_kept": pa.array([], pa.int64()),
                "n_dropped": pa.array([], pa.int64()),
            }
        )
        if group.num_rows == 0:
            return empty
        is_mark = pc.equal(group["is_mark"], 1)
        order = [("doc_id", "ascending"), ("line_idx", "ascending")]
        lt = group.filter(pc.invert(is_mark)).sort_by(order).combine_chunks()
        mt = group.filter(is_mark).sort_by(order).combine_chunks()
        if lt.num_rows == 0:
            if mt.num_rows:  # drift must raise, same as the mirror case below
                raise ValueError(
                    f"dedup_lines: bucket holds {mt.num_rows} marks but no lines"
                )
            return empty
        doc = lt["doc_id"].to_numpy(zero_copy_only=False)
        lkey = _packed_line_key(doc, lt["line_idx"].to_numpy(zero_copy_only=False))
        mkey = _packed_line_key(
            mt["doc_id"].to_numpy(zero_copy_only=False),
            mt["line_idx"].to_numpy(zero_copy_only=False),
        )
        if not np.array_equal(lkey, mkey):  # M13-style loud invariant
            raise ValueError(
                f"dedup_lines mark/line misalignment: {len(lkey)} lines vs "
                f"{len(mkey)} marks in bucket"
            )
        banned = mt["banned"].to_numpy(zero_copy_only=False) == 1
        doc_starts = np.flatnonzero(np.diff(doc, prepend=doc[0] - 1))
        n_per_doc = np.diff(np.append(doc_starts, len(doc)))
        kept = ~banned
        csum = np.concatenate([[0], np.cumsum(kept)])
        bounds = np.append(doc_starts, len(doc))
        n_kept = (csum[bounds[1:]] - csum[bounds[:-1]]).astype(np.int64)
        kept_lines = lt["line"].filter(pa.array(kept)).combine_chunks()
        offsets = np.concatenate([[0], np.cumsum(n_kept)]).astype(np.int64)
        la = pa.LargeListArray.from_arrays(pa.array(offsets), kept_lines)
        clean = pc.binary_join(la, "\n")
        return pa.table(
            {
                "doc_id": pa.array(doc[doc_starts]),
                "clean_text": clean,
                "n_kept": pa.array(n_kept),
                "n_dropped": pa.array((n_per_doc - n_kept).astype(np.int64)),
            }
        )

    return tagged.groupby("_db").map_groups(
        lambda g: reassemble(g.drop_columns(["_db"])), batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# Edit-distance <= 1 near-dup pairs (deletion-neighborhood blocking)
# ---------------------------------------------------------------------------

ED_SUB_OFFSET = 300_000
ED_DEL_OFFSET = 400_000
ED_MAX_CHARS = 250    # short-record regime: titles / lines / snippets
ED_MAX_LEN = 2048     # hard bound for the per-actor power tables

# odd 64-bit mix constants (splitmix64-family) -> invertible mod 2^64;
# deliberately NOT _GOLDEN so variant hashes don't correlate with the
# _bucket_of mixer they feed.
_ED_B1 = 0xD1B54A32D192ED03
_ED_B2 = 0xAEF17502108EF2D9


def editdist_corpus(sf_dir: str) -> ray.data.Dataset:
    """Short ASCII documents UNION one-char-substituted copies (doc_id%3==0,
    id+ED_SUB_OFFSET) UNION one-char-deleted copies (doc_id%3==1,
    id+ED_DEL_OFFSET). The corrupt position is ``doc_id % len(text)``
    (0-based) and the substitute char a literal ``'x'`` — both
    SQL-expressible (substr composition), so the ED<=1 pair set has a
    full DuckDB ``levenshtein`` oracle. The n_chars cap is pushed into
    the parquet read; the byte==codepoint filter pins ASCII so the
    engine's byte-level edit distance equals the oracle's char-level one.

    The per-row string surgery here is corpus-synth scaffolding (test
    fixture construction, bounded by the cap) — the operator's hot path
    is the fully vectorized `_EdVariantStage`."""
    ensure_serializable()
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
        filter=(pc.field("n_chars") <= ED_MAX_CHARS),
    )

    def synth(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch.column("text"), "")
        ascii_only = pc.and_(
            pc.equal(pc.utf8_length(text), pc.binary_length(text)),
            pc.greater(pc.binary_length(text), 0),
        )
        base = batch.set_column(
            batch.schema.get_field_index("text"), "text", text
        ).filter(ascii_only)
        ids = base.column("doc_id").to_numpy(zero_copy_only=False)
        texts = base.column("text").to_pylist()
        out_ids: list[int] = []
        out_txt: list[str] = []
        for i, s in zip(ids, texts):
            p = int(i) % len(s)
            if i % 3 == 0:
                out_ids.append(int(i) + ED_SUB_OFFSET)
                out_txt.append(s[:p] + "x" + s[p + 1 :])
            elif i % 3 == 1:
                out_ids.append(int(i) + ED_DEL_OFFSET)
                out_txt.append(s[:p] + s[p + 1 :])
        corrupted = pa.table(
            {
                "doc_id": pa.array(out_ids, pa.int64()),
                "text": pa.array(out_txt, pa.string()),
            }
        )
        return pa.concat_tables([base.select(["doc_id", "text"]), corrupted])

    return ds.map_batches(synth, batch_format="pyarrow", zero_copy_batch=True)


class _EdVariantStage:
    """Explode each doc into its deletion-1 neighborhood as INT rows.

    For text s of length L emit L+1 rows: (h1, h2, vlen, del_pos,
    doc_id) for s itself (del_pos=-1) and every single-byte deletion
    (del_pos=p). Hashes are two independent polynomial hashes mod 2^64
    (odd bases -> invertible), and every deletion hash comes from the
    closed form

        H(del_p(s)) = B^(L-2) * U_p + B^(L-1) * (E - U_{p+1})

    where U_p = sum_{k<p} s_k * B^(-k) is an exclusive segmented cumsum
    over the batch's FLAT zero-copy byte buffer and E its per-doc total
    — O(L) work per doc for all L+1 variant hashes instead of the
    naive O(L^2) rehash-every-variant (uint64 wraparound does the
    modular arithmetic for free). Power/inverse-power tables are built
    once per actor (S5-style __init__ state)."""

    def __init__(self, num_buckets: int):
        self._nb = num_buckets
        self._pow1, self._ipow1 = self._tables(_ED_B1)
        self._pow2, self._ipow2 = self._tables(_ED_B2)

    @staticmethod
    def _tables(base: int):
        inv = pow(base, -1, 1 << 64)
        p = np.full(ED_MAX_LEN + 1, np.uint64(base), dtype=np.uint64)
        ip = np.full(ED_MAX_LEN + 1, np.uint64(inv), dtype=np.uint64)
        p[0] = ip[0] = 1
        return np.cumprod(p, dtype=np.uint64), np.cumprod(ip, dtype=np.uint64)

    @staticmethod
    def _empty() -> pa.Table:
        return pa.table(
            {
                "_pb": pa.array([], pa.int32()),
                "h1": pa.array([], pa.int64()),
                "h2": pa.array([], pa.int64()),
                "vlen": pa.array([], pa.int32()),
                "del_pos": pa.array([], pa.int32()),
                "doc_id": pa.array([], pa.int64()),
            }
        )

    def _plane(self, flat, pos, doc_idx, starts, L, pow_t, ipow_t):
        e = flat * ipow_t[pos]
        cum = np.cumsum(e, dtype=np.uint64)
        g = np.empty_like(cum)
        g[0] = 0
        g[1:] = cum[:-1]                       # exclusive global cumsum
        seg_base = g[starts]                   # value at each doc start
        U = g - seg_base[doc_idx]              # U_p per byte position
        E = cum[starts + L - 1] - seg_base     # per-doc total (L >= 1)
        U_next = U + e                         # U_{p+1}
        Ld = L[doc_idx]
        h_del = pow_t[np.maximum(Ld - 2, 0)] * U + pow_t[Ld - 1] * (
            E[doc_idx] - U_next
        )
        h_del = np.where(Ld == 1, np.uint64(0), h_del)  # deleting the only byte -> ""
        h_full = pow_t[L - 1] * E
        return np.concatenate([h_del, h_full]).view(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return self._empty()
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        barr = batch.column("text").combine_chunks().cast(pa.large_binary())
        off = np.frombuffer(barr.buffers()[1], dtype=np.int64)[
            barr.offset : barr.offset + len(barr) + 1
        ]
        data = np.frombuffer(barr.buffers()[2], dtype=np.uint8)
        flat = data[off[0] : off[-1]].astype(np.uint64)
        starts = (off[:-1] - off[0]).astype(np.int64)
        L = np.diff(off).astype(np.int64)
        if (L == 0).any() or (L > ED_MAX_LEN).any():
            raise ValueError("editdist corpus contract: 1 <= len(text) <= ED_MAX_LEN")
        n = int(flat.size)
        ndocs = len(L)
        doc_idx = np.repeat(np.arange(ndocs, dtype=np.int64), L)
        pos = np.arange(n, dtype=np.int64) - np.repeat(starts, L)
        h1 = self._plane(flat, pos, doc_idx, starts, L, self._pow1, self._ipow1)
        h2 = self._plane(flat, pos, doc_idx, starts, L, self._pow2, self._ipow2)
        vlen = np.concatenate([L[doc_idx] - 1, L]).astype(np.int32)
        del_pos = np.concatenate(
            [pos, np.full(ndocs, -1, dtype=np.int64)]
        ).astype(np.int32)
        out_ids = np.concatenate([ids[doc_idx], ids])
        return pa.table(
            {
                "_pb": pa.array(
                    _bucket_of(h1, h2, vlen.astype(np.int64), num_buckets=self._nb)
                ),
                "h1": pa.array(h1),
                "h2": pa.array(h2),
                "vlen": pa.array(vlen),
                "del_pos": pa.array(del_pos),
                "doc_id": pa.array(out_ids),
            }
        )


def _editdist_bucket_pairs(group: pa.Table) -> pa.Table:
    """One call per SHUFFLE BUCKET: pairs within each (h1, h2, vlen)
    run, filtered by the exact FastSS witness predicate:

      ED(u, v) <= 1  <=>  u, v share a variant with
        - del_pos_u == del_pos_v   (both -1: u == v; both p: they can
          differ only at byte p -> substitution), or
        - exactly one side -1      (the shorter string IS a deletion of
          the longer -> insert/delete).

    Sharing a variant at two DIFFERENT deletion positions proves only
    ED <= 2 ("ab"/"ba" share "a" and "b") and is correctly rejected —
    no verify join, no strings shuffled, exact mod 128-bit hash
    collisions (same collision contract as dedup_exact)."""
    t = group.sort_by(
        [
            ("h1", "ascending"),
            ("h2", "ascending"),
            ("vlen", "ascending"),
            ("doc_id", "ascending"),
        ]
    ).combine_chunks()
    h1 = t.column("h1").to_numpy(zero_copy_only=False)
    h2 = t.column("h2").to_numpy(zero_copy_only=False)
    vlen = t.column("vlen").to_numpy(zero_copy_only=False)
    dp = t.column("del_pos").to_numpy(zero_copy_only=False)
    ids = t.column("doc_id").to_numpy(zero_copy_only=False)
    ii, jj = _pairs_within_runs(_run_starts(h1, h2, vlen))
    di, dj = dp[ii], dp[jj]
    keep = (ids[ii] != ids[jj]) & ((di == dj) | ((di == -1) != (dj == -1)))
    ii, jj = ii[keep], jj[keep]
    eq = ((dp[ii] == -1) & (dp[jj] == -1)).astype(np.int8)
    return pa.table(
        {
            "doc_a": pa.array(ids[ii]),
            "doc_b": pa.array(ids[jj]),
            "eq": pa.array(eq),
        }
    )


def dedup_editdist(sf_dir: str) -> ray.data.Dataset:
    """All unordered doc pairs at Levenshtein distance <= 1, found
    EXACTLY (no estimate-verify round) via FastSS deletion-neighborhood
    blocking (Bocek et al. 2007, "Fast Similarity Search in Large
    Dictionaries") -> (doc_a, doc_b, edit_distance 0|1).

    Physical shape — one int-only shuffle, zero per-key Python:
      read (n_chars cap pushed into the scan) -> _EdVariantStage actor
      pool explodes each doc into L+1 (hash128, vlen, del_pos, doc_id)
      int rows via the O(L) closed-form deletion hashes -> ONE bucketed
      shuffle on hash(h1,h2,vlen) % _pair_num_buckets() -> vectorized
      within-run pair expansion + witness predicate per BUCKET ->
      _combine_pairs_bucketed dedups pairs and max-reduces the eq flag
      (equal docs carry eq=1 on their (-1,-1) witness only).

    Scale notes: rows shuffled = ~34 bytes x (L+1) per doc — FastSS is
    a short-record operator (titles, lines, log messages; ED_MAX_CHARS
    cap documented and pushed into the read); for long-document
    near-dup use dedup_minhash/dedup_jaccard, for mass exact equality
    dedup_exact. Output is Θ(#true pairs): a group of g pairwise-equal
    strings legitimately yields g(g-1)/2 rows — there is deliberately
    NO df-cap here because the oracle (and the semantics) admit no
    silent candidate drops; the analog of the reference's
    equality-gated parity contract is per-pair exactness
    (/root/reference/crates/core/src/inference.rs:142-147's
    byte-identical normalize discipline applied to pair semantics)."""
    num_buckets = _pair_num_buckets()
    ds = editdist_corpus(sf_dir)
    exploded = ds.map_batches(
        _EdVariantStage,
        fn_constructor_args=(num_buckets,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=pool_size(),
        num_cpus=1,
    )
    pairs = exploded.groupby("_pb").map_groups(
        lambda g: _editdist_bucket_pairs(g.drop_columns(["_pb"])),
        batch_format="pyarrow",
    )

    def finalize(doc_a, doc_b, cnt, extras):
        ed = 1 - extras["eq"].astype(np.int64)
        return pa.table(
            {
                "doc_a": pa.array(doc_a.astype(np.int64)),
                "doc_b": pa.array(doc_b.astype(np.int64)),
                "edit_distance": pa.array(ed),
            }
        )

    return _combine_pairs_bucketed(pairs, finalize, extra_reducers={"eq": "max"})


# ---------------------------------------------------------------------------
# cross-source n-gram overlap (contamination matrix)
# ---------------------------------------------------------------------------

OVERLAP_K = SHINGLE_K  # word 3-grams, same shingle family as dedup_jaccard


def source_overlap(sf_dir: str) -> ray.data.Dataset:
    """Pairwise cross-source shingle overlap -> (source_a, source_b,
    n_shared_grams, n_grams_a, n_grams_b, jaccard_micro): the
    contamination / redundancy matrix a corpus report leads with (how
    much of source X is already in source Y decides dedup order and mix
    weights). Pairs with zero shared grams are omitted (inner-join
    semantics, same as the SQL oracle).

    Scale shape: batch-local distinct (source, gram_hash) partials ->
    ONE gram-hash bucketed shuffle (rows are a short source tag + one
    int64; text never moves) -> per-bucket run dedup makes rows
    globally distinct, per-gram-run pair expansion (runs are bounded by
    the SOURCE COUNT after dedup — never quadratic in docs) and
    per-source distinct-gram counts, both pre-aggregated in-bucket ->
    one tiny groupby over a <= |sources|^2 key domain -> driver
    assembly of the exact integer jaccard. Gram STRINGS on the oracle
    side vs 64-bit gram hashes here (dedup_jaccard collision
    contract)."""
    from ray.data.aggregate import Sum

    num_buckets = _pair_num_buckets()
    ensure_serializable()
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["source", "text"]
    )

    def explode(batch: pa.Table) -> pa.Table:
        # NULL-source docs are DROPPED, matching SQL join semantics in
        # the oracle (NULL never equals/compares); '' is a real source
        batch = batch.filter(pc.is_valid(batch.column("source")))
        src = batch.column("source").to_pylist()
        txt = pc.fill_null(batch.column("text"), "").to_pylist()
        out_src: list = []
        out_gh: list = []
        for s, t in zip(src, txt):
            gh = _gram_hashes(t, OVERLAP_K)
            out_src.extend([s] * len(gh))
            out_gh.append(gh)
        gh_all = (
            np.concatenate(out_gh) if out_gh else np.empty(0, dtype=np.int64)
        )
        t = pa.table(
            {
                "source": pa.array(out_src, pa.string()),
                "gram_hash": pa.array(gh_all),
            }
        )
        dist = t.group_by(["source", "gram_hash"]).aggregate([])
        gh = dist["gram_hash"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "_gb": pa.array(_bucket_of(gh, num_buckets=num_buckets)),
                "source": dist["source"],
                "gram_hash": dist["gram_hash"],
            }
        )

    def overlap_bucket(group: pa.Table) -> pa.Table:
        t = group.sort_by(
            [("gram_hash", "ascending"), ("source", "ascending")]
        ).combine_chunks()
        empty = pa.table(
            {
                "source_a": pa.array([], pa.string()),
                "source_b": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        gh = t.column("gram_hash").to_numpy(zero_copy_only=False)
        src = np.asarray(t.column("source").to_pylist(), dtype=object)
        # global distinct: all copies of a (gram, source) share the bucket
        keep = _run_starts(gh, src)
        gh, src = gh[keep], src[keep]
        # per-source distinct-gram partials ride as (source, '') rows
        s_uniq, s_cnt = np.unique(src, return_counts=True)
        ii, jj = _pairs_within_runs(_run_starts(gh))
        parts = [
            pa.table(
                {
                    "source_a": pa.array(s_uniq, pa.string()),
                    "source_b": pa.array([""] * len(s_uniq), pa.string()),
                    "n": pa.array(s_cnt.astype(np.int64)),
                }
            )
        ]
        if ii.size:
            pair_t = pa.table(
                {
                    "source_a": pa.array(src[ii], pa.string()),
                    "source_b": pa.array(src[jj], pa.string()),
                    "n": pa.array(np.ones(ii.size, dtype=np.int64)),
                }
            )
            gp = pair_t.group_by(["source_a", "source_b"]).aggregate([("n", "sum")])
            parts.append(
                pa.table(
                    {
                        "source_a": gp["source_a"],
                        "source_b": gp["source_b"],
                        "n": gp["n_sum"],  # select by NAME, never position
                    }
                )
            )
        return pa.concat_tables(parts)

    agg = (
        ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_gb")
        .map_groups(
            lambda g: overlap_bucket(g.drop_columns(["_gb"])),
            batch_format="pyarrow",
        )
        .groupby(["source_a", "source_b"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def finalize(batch: pa.Table) -> pa.Table:
        # bounded by |sources|^2 — per-block assembly needs the source
        # totals, so this one runs after a repartition(1)
        sa = np.asarray(batch.column("source_a").to_pylist(), dtype=object)
        sb = np.asarray(batch.column("source_b").to_pylist(), dtype=object)
        n = batch.column("n").to_numpy(zero_copy_only=False)
        totals = {s: int(v) for s, v in zip(sa[sb == ""], n[sb == ""])}
        mask = sb != ""
        sa, sb, n = sa[mask], sb[mask], n[mask]
        na = np.fromiter((totals[s] for s in sa), dtype=np.int64, count=len(sa))
        nb = np.fromiter((totals[s] for s in sb), dtype=np.int64, count=len(sb))
        union = na + nb - n
        return pa.table(
            {
                "source_a": pa.array(sa, pa.string()),
                "source_b": pa.array(sb, pa.string()),
                "n_shared_grams": pa.array(n),
                "n_grams_a": pa.array(na),
                "n_grams_b": pa.array(nb),
                "jaccard_micro": pa.array(n * 1_000_000 // union),
            }
        )

    # batch_size=None: finalize needs the WHOLE single block in one call
    # (a pair row must see its source-total sentinel rows); the default
    # 1024-row slicing would split them past ~45 distinct sources
    return agg.repartition(1).map_batches(
        finalize, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


def dedup_best(sf_dir: str, threshold: float = JACCARD_THRESHOLD) -> ray.data.Dataset:
    """Keep the BEST member per near-dup cluster -> (cluster_id,
    keep_doc_id, n_tokens, n_members): real curation keeps the longest/
    highest-quality duplicate, not the lowest id — dedup_exact's
    keep-first rule upgraded with a quality argmax (here: whitespace
    token count; the injected near-copies are one word shorter, so the
    winner is the ORIGINAL, which keep-first would also pick only by
    id-assignment luck).

    Composition, zero per-key Python: dedup_clusters' (doc_id,
    cluster_id) unions with per-doc token counts co-bucketed on
    hash(doc_id) (each side carries every doc exactly once — one
    searchsorted per bucket attaches counts, loud on a missing doc),
    then one hash(cluster) bucket pass sorts (cluster, n_tokens desc,
    doc_id) and takes run heads — max-quality-then-min-id in a single
    vectorized argmax."""
    num_buckets = _pair_num_buckets()
    clusters = dedup_clusters(sf_dir, threshold)
    corpus = dup_corpus(sf_dir)

    def tok_rows(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = pc.cast(
            pc.count_substring_regex(pc.fill_null(batch["text"], ""), r"\S+"),
            pa.int64(),
        )
        return pa.table(
            {
                "_db": pa.array(_bucket_of(ids, num_buckets=num_buckets)),
                "doc_id": pa.array(ids),
                "n_tokens": n,
                "cluster_id": pa.array(np.full(ids.size, -1, dtype=np.int64)),
            }
        )

    def clu_rows(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "_db": pa.array(_bucket_of(ids, num_buckets=num_buckets)),
                "doc_id": pa.array(ids),
                "n_tokens": pa.array(np.full(ids.size, -1, dtype=np.int64)),
                "cluster_id": batch["cluster_id"],
            }
        )

    both = corpus.map_batches(
        tok_rows, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        clusters.map_batches(clu_rows, batch_format="pyarrow", zero_copy_batch=True)
    )

    def attach_bucket(group: pa.Table) -> pa.Table:
        t = group.combine_chunks()
        cl = t["cluster_id"].to_numpy(zero_copy_only=False)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        ntk = t["n_tokens"].to_numpy(zero_copy_only=False)
        is_tok = cl < 0
        t_ids, t_n = ids[is_tok], ntk[is_tok]
        c_ids, c_cl = ids[~is_tok], cl[~is_tok]
        if c_ids.size == 0:
            return pa.table(
                {
                    "_cb": pa.array([], pa.int32()),
                    "cluster_id": pa.array([], pa.int64()),
                    "doc_id": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                }
            )
        order = np.argsort(t_ids)
        t_ids, t_n = t_ids[order], t_n[order]
        pos = np.clip(np.searchsorted(t_ids, c_ids), 0, max(t_ids.size - 1, 0))
        if t_ids.size == 0 or (t_ids[pos] != c_ids).any():
            raise ValueError("dedup_best: cluster doc missing its token row")
        return pa.table(
            {
                "_cb": pa.array(_bucket_of(c_cl, num_buckets=num_buckets)),
                "cluster_id": pa.array(c_cl),
                "doc_id": pa.array(c_ids),
                "n_tokens": pa.array(t_n[pos]),
            }
        )

    attached = both.groupby("_db").map_groups(
        lambda g: attach_bucket(g.drop_columns(["_db"])), batch_format="pyarrow"
    )

    def argmax_bucket(group: pa.Table) -> pa.Table:
        t = group.sort_by(
            [
                ("cluster_id", "ascending"),
                ("n_tokens", "descending"),
                ("doc_id", "ascending"),
            ]
        ).combine_chunks()
        if t.num_rows == 0:
            return pa.table(
                {
                    "cluster_id": pa.array([], pa.int64()),
                    "keep_doc_id": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "n_members": pa.array([], pa.int64()),
                }
            )
        cl = t["cluster_id"].to_numpy(zero_copy_only=False)
        new_run = _run_starts(cl)
        run_id = np.cumsum(new_run) - 1
        members = np.bincount(run_id).astype(np.int64)
        heads = np.flatnonzero(new_run)
        return pa.table(
            {
                "cluster_id": pa.array(cl[heads]),
                "keep_doc_id": pa.array(
                    t["doc_id"].to_numpy(zero_copy_only=False)[heads]
                ),
                "n_tokens": pa.array(
                    t["n_tokens"].to_numpy(zero_copy_only=False)[heads]
                ),
                "n_members": pa.array(members),
            }
        )

    return attached.groupby("_cb").map_groups(
        lambda g: argmax_bucket(g.drop_columns(["_cb"])), batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# Exact-substring SPAN CUT (ExactSubstr, Lee et al. 2022 "Deduplicating
# Training Data Makes Language Models Better") — the remove-the-span
# complement of ``dedup_spans``'s whole-doc cull and ``dedup_lines``'s
# line granularity: every non-first occurrence of a duplicated
# word-L-gram window is cut from its document, text reassembled.
# ---------------------------------------------------------------------------

SUBSTR_L = 6  # words per window; Lee et al. cut at 50 BPE tokens — the
              # word analog at fixture document lengths


def dedup_substrings(
    sf_dir: str, L: int = SUBSTR_L, num_buckets: int | None = None
) -> ray.data.Dataset:
    """Cut duplicated substrings, keep-first: over the ``dup_corpus``,
    any word-L-gram window whose exact text occurs elsewhere in the
    corpus is removed from every document EXCEPT its first occurrence
    (min (doc_id, pos)); documents are reassembled from the surviving
    words in original order. Emits (doc_id, clean_text, n_words,
    n_removed) for every document, including word-less ones.

    Scale shape — two shuffles, only one of which moves text (the
    ``dedup_lines`` discipline):
    1. marks pass: explode docs to (gram_h1, gram_h2, doc_id, pos) int
       rows — window hashes are polynomial combines of per-word
       128-bit siphashes computed once per flat word stream (word text
       never rides the shuffle) — bucketed by hash(gram); ONE
       map_groups per bucket sorts its keys and emits the non-first
       rows of every run with length >= 2. A bucket holds every
       occurrence of its hashes, so in-bucket run order IS the global
       keep-first order; a hot window (boilerplate repeated millions of
       times) costs one linear run scan, never pair expansion.
    2. reassembly pass: document text bucketed by hash(doc_id), unioned
       with the int-only marks (sentinel columns); per bucket the marks
       expand to word-position ranges [pos, pos+L), dedupe via packed
       (local_doc, word_pos) keys, and kept words rejoin per doc through
       ``pa.LargeListArray`` offsets + ``pc.binary_join`` — no per-doc
       Python, 64-bit offsets for >2 GiB bucket concats.

    The oracle compares gram STRINGS while the engine compares 128-bit
    window hashes — identical up to siphash collisions (~2^-128 per
    pair, the ``dedup_exact`` contract). Reference analog: the noise
    filters strip repeated boilerplate regions from decoded documents
    (crates/server/src/generation.rs renders each region once); this is
    the corpus-wide version of that responsibility."""
    from ..pipeline import default_num_buckets
    from .textstats import _explode_word_stream, _word_gram_hashes, _word_hash_pair

    if num_buckets is None:
        num_buckets = default_num_buckets()
    ensure_serializable()
    corpus = dup_corpus(sf_dir)

    def explode_grams(batch: pa.Table) -> pa.Table:
        parent, pos, flat = _explode_word_stream(batch)
        doc_all = batch["doc_id"].to_numpy(zero_copy_only=False)
        h1, h2 = _word_hash_pair(flat, "engine-subwordk")
        nwin = len(parent) - L + 1
        if nwin <= 0:
            e64 = pa.array([], pa.int64())
            return pa.table(
                {
                    "_gb": pa.array([], pa.int32()),
                    "g1": e64, "g2": e64, "doc_id": e64, "pos": e64,
                }
            )
        ok = parent[:nwin] == parent[L - 1 :]
        g1 = _word_gram_hashes(h1, L)[ok].view(np.int64)
        g2 = _word_gram_hashes(h2, L)[ok].view(np.int64)
        doc = doc_all[parent[:nwin][ok]]
        p = pos[:nwin][ok]
        return pa.table(
            {
                "_gb": pa.array(_bucket_of(g1, g2, num_buckets=num_buckets)),
                "g1": pa.array(g1),
                "g2": pa.array(g2),
                "doc_id": pa.array(doc.astype(np.int64)),
                "pos": pa.array(p),
            }
        )

    def mark_bucket(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"doc_id": pa.array([], pa.int64()), "pos": pa.array([], pa.int64())}
        )
        if group.num_rows == 0:
            return empty
        t = group.sort_by(
            [("g1", "ascending"), ("g2", "ascending"),
             ("doc_id", "ascending"), ("pos", "ascending")]
        )
        g1 = t["g1"].to_numpy(zero_copy_only=False)
        g2 = t["g2"].to_numpy(zero_copy_only=False)
        new = _run_starts(g1, g2)
        run_id = np.cumsum(new) - 1
        per_row = np.bincount(run_id)[run_id]
        dup = (per_row >= 2) & ~new  # every occurrence but the global first
        if not dup.any():
            return empty
        return pa.table(
            {
                "doc_id": t["doc_id"].filter(pa.array(dup)),
                "pos": t["pos"].filter(pa.array(dup)),
            }
        )

    marks = (
        corpus.map_batches(explode_grams, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_gb")
        .map_groups(
            lambda g: mark_bucket(g.drop_columns(["_gb"])), batch_format="pyarrow"
        )
    )

    def tag_text(batch: pa.Table) -> pa.Table:
        doc_id = batch["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "_db": pa.array(_bucket_of(doc_id, num_buckets=num_buckets)),
                "doc_id": batch["doc_id"],
                "pos": pa.array(np.full(len(doc_id), -1, np.int64)),
                "text": pc.fill_null(batch["text"], ""),
                "is_mark": pa.array(np.zeros(len(doc_id), np.int8)),
            }
        )

    def tag_marks(batch: pa.Table) -> pa.Table:
        doc_id = batch["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "_db": pa.array(_bucket_of(doc_id, num_buckets=num_buckets)),
                "doc_id": batch["doc_id"],
                "pos": batch["pos"],
                "text": pa.array([""] * len(doc_id), pa.string()),
                "is_mark": pa.array(np.ones(len(doc_id), np.int8)),
            }
        )

    tagged = corpus.map_batches(
        tag_text, batch_format="pyarrow", zero_copy_batch=True
    ).union(marks.map_batches(tag_marks, batch_format="pyarrow", zero_copy_batch=True))

    def reassemble(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "clean_text": pa.array([], pa.string()),
                "n_words": pa.array([], pa.int64()),
                "n_removed": pa.array([], pa.int64()),
            }
        )
        if group.num_rows == 0:
            return empty
        is_mark = pc.equal(group["is_mark"], 1)
        docs = (
            group.filter(pc.invert(is_mark))
            .sort_by([("doc_id", "ascending")])
            .combine_chunks()
        )
        mt = group.filter(is_mark).combine_chunks()
        if docs.num_rows == 0:
            if mt.num_rows:  # marks must land with their text — loud
                raise ValueError(
                    f"dedup_substrings: bucket holds {mt.num_rows} marks "
                    "but no documents"
                )
            return empty
        doc_ids = docs["doc_id"].to_numpy(zero_copy_only=False)
        parent, wpos, flat = _explode_word_stream(docs)
        n_words = np.bincount(parent, minlength=docs.num_rows).astype(np.int64)

        # marks -> removed (local_doc, word_pos) keys, deduped
        mdoc = mt["doc_id"].to_numpy(zero_copy_only=False)
        mpos = mt["pos"].to_numpy(zero_copy_only=False)
        midx = np.searchsorted(doc_ids, mdoc)
        if len(midx) and (
            midx.max() >= len(doc_ids) or not np.array_equal(doc_ids[midx], mdoc)
        ):
            raise ValueError("dedup_substrings: mark doc_id missing from bucket")
        rm_doc = np.repeat(midx, L)
        rm_pos = np.repeat(mpos, L) + np.tile(np.arange(L, dtype=np.int64), len(mpos))
        if len(wpos) and int(wpos.max()) >= (1 << 32):
            raise ValueError("doc exceeds 2^32 words; widen the packed-key layout")
        rm_key = np.unique((rm_doc.astype(np.int64) << np.int64(32)) | rm_pos)
        w_key = (parent << np.int64(32)) | wpos
        removed = np.zeros(len(w_key), bool)
        if len(rm_key):
            j = np.searchsorted(rm_key, w_key)
            j[j == len(rm_key)] = 0
            removed = rm_key[j] == w_key
        kept = ~removed
        csum = np.concatenate([[0], np.cumsum(kept)])
        bounds = np.concatenate([[0], np.cumsum(n_words)])
        n_kept = (csum[bounds[1:]] - csum[bounds[:-1]]).astype(np.int64)
        kept_words = flat.filter(pa.array(kept))
        if isinstance(kept_words, pa.ChunkedArray):
            kept_words = kept_words.combine_chunks()
        offsets = np.concatenate([[0], np.cumsum(n_kept)]).astype(np.int64)
        la = pa.LargeListArray.from_arrays(pa.array(offsets), kept_words)
        clean = pc.binary_join(la, " ")
        return pa.table(
            {
                "doc_id": pa.array(doc_ids),
                "clean_text": clean,
                "n_words": pa.array(n_words),
                "n_removed": pa.array((n_words - n_kept).astype(np.int64)),
            }
        )

    return tagged.groupby("_db").map_groups(
        lambda g: reassemble(g.drop_columns(["_db"])), batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# Cross-language parallel-corpus candidate mining
# ---------------------------------------------------------------------------

BITEXT_DF_CAP = 16       # "rare" bigram: document frequency <= cap
BITEXT_MIN_SHARED = 2    # candidate pair: >= this many shared rare bigrams


def bitext_candidates(
    sf_dir: str,
    df_cap: int = BITEXT_DF_CAP,
    min_shared: int = BITEXT_MIN_SHARED,
) -> ray.data.Dataset:
    """Parallel-corpus (bitext) candidate mining: pairs of documents in
    DIFFERENT languages sharing >= ``min_shared`` distinct RARE word
    bigrams (document frequency <= ``df_cap``) — the shared-rare-anchor
    heuristic public bitext pipelines use to shortlist translation
    pairs before alignment scoring (rare tokens — names, numbers,
    code — survive translation; frequent ones carry no signal and
    would make expansion quadratic).

    Machinery is ``dedup_jaccard``'s inverted index with two twists:
    the DF CAP IS the semantics (rare-only, not just a guard), and the
    language code (crc32 of the lang string, collision odds
    ~n_langs^2/2^32) rides each exploded row so cross-language pairs
    filter DURING expansion — same-language pairs never materialize.
    Bigram convention is ``bigram_counts``' exactly (single-space
    split, empties kept, <2-word docs emit nothing) so the SQL oracle
    replays the identical gram sets. Shuffles carry int64 rows only;
    the pair combine is the shared bucketed reduce."""
    num_buckets = _pair_num_buckets()
    ensure_serializable()
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang"],
    )

    def explode(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        langs = batch["lang"].to_pylist()
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        gh_out, id_out, lc_out = [], [], []
        for doc_id, text, lang in zip(ids, texts, langs):
            words = (text or "").split(" ")
            if len(words) < 2:
                continue
            grams = [
                words[i] + " " + words[i + 1] for i in range(len(words) - 1)
            ]
            gh = np.unique(
                np.fromiter(
                    (
                        np.int64(
                            np.uint64(zlib.crc32(g.encode()))
                            | (np.uint64(zlib.crc32(g[::-1].encode()))
                               << np.uint64(32))
                        )
                        for g in grams
                    ),
                    dtype=np.int64,
                    count=len(grams),
                )
            )
            gh_out.append(gh)
            id_out.append(np.full(gh.size, doc_id, dtype=np.int64))
            lc_out.append(
                np.full(gh.size, zlib.crc32((lang or "").encode()),
                        dtype=np.int64)
            )
        if not gh_out:
            return pa.table(
                {"_pb": pa.array([], pa.int32()),
                 "gram_hash": pa.array([], pa.int64()),
                 "doc_id": pa.array([], pa.int64()),
                 "lang_code": pa.array([], pa.int64())}
            )
        gh = np.concatenate(gh_out)
        return pa.table(
            {
                "_pb": pa.array(_bucket_of(gh, num_buckets=num_buckets)),
                "gram_hash": pa.array(gh),
                "doc_id": pa.array(np.concatenate(id_out)),
                "lang_code": pa.array(np.concatenate(lc_out)),
            }
        )

    def cross_lang_pairs(group: pa.Table) -> pa.Table:
        t = group.sort_by(
            [("gram_hash", "ascending"), ("doc_id", "ascending")]
        ).combine_chunks()
        gh = t.column("gram_hash").to_numpy(zero_copy_only=False)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        lc = t.column("lang_code").to_numpy(zero_copy_only=False)
        new_run = _run_starts(gh)
        if len(new_run):
            # run size IS global df (a gram hash lives in one bucket);
            # rare-only is the SEMANTICS here, not just a bound
            starts = np.flatnonzero(new_run)
            sizes = np.diff(np.append(starts, len(new_run)))
            if (sizes > df_cap).any():
                keep = np.repeat(sizes <= df_cap, sizes)
                gh, ids, lc = gh[keep], ids[keep], lc[keep]
                new_run = _run_starts(gh)
        ii, jj = _pairs_within_runs(new_run)
        diff = lc[ii] != lc[jj]
        return pa.table(
            {
                "doc_a": pa.array(ids[ii][diff]),
                "doc_b": pa.array(ids[jj][diff]),
            }
        )

    pairs = (
        ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_pb")
        .map_groups(
            lambda g: cross_lang_pairs(g.drop_columns(["_pb"])),
            batch_format="pyarrow",
        )
    )

    def finalize(doc_a, doc_b, cnt, extras):
        keep = cnt >= min_shared
        return pa.table(
            {
                "doc_a": pa.array(doc_a[keep]),
                "doc_b": pa.array(doc_b[keep]),
                "n_shared": pa.array(cnt[keep].astype(np.int64)),
            }
        )

    return _combine_pairs_bucketed(pairs, finalize)
