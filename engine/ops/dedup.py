"""Deduplication operators over the documents table.

Training-data-pipeline operators (task brief): exact dedup, MinHash+LSH
near-dup, SimHash near-dup — each expressed Ray-Data-first:

- exact:   vectorized content-hash per batch -> groupby(hash) ->
           per-group first (hash-partition + first pattern)
- minhash: shingle -> minhash signature per batch (numpy vectorized)
           -> explode to (band, band_hash, doc) rows -> groupby(band)
           -> candidate pairs -> signature-estimated Jaccard filter
- simhash: 64-bit simhash per batch -> band on 16-bit chunks ->
           groupby -> candidate pairs -> hamming-distance filter

All hashing is crc32/md5-based — deterministic across processes (never
Python's salted hash()). The test corpus is the documents table with
injected duplicates (exact copies and word-dropped near-copies at
shifted doc_ids) so the operators have real work to find; the injection
is itself expressible in SQL, keeping the exact-dedup oracle checkable.
"""

from __future__ import annotations

import hashlib
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
    for the exact part (see __ray_entry__.oracle_sql)."""
    ensure_serializable()
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def exact_copies(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.add(batch["doc_id"], EXACT_DUP_OFFSET),
                "text": batch["text"],
            }
        )

    def near_copies(batch: pa.Table) -> pa.Table:
        keep = pc.equal(pc.bit_wise_and(batch["doc_id"], 1), 0)
        batch = batch.filter(keep)
        # drop the last whitespace-delimited token -> high-Jaccard near-dup
        trimmed = pc.replace_substring_regex(batch["text"], r"\s+\S+$", "")
        return pa.table(
            {"doc_id": pc.add(batch["doc_id"], NEAR_DUP_OFFSET), "text": trimmed}
        )

    return ds.union(
        ds.map_batches(exact_copies, batch_format="pyarrow", zero_copy_batch=True),
        ds.map_batches(near_copies, batch_format="pyarrow", zero_copy_batch=True),
    )


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def dedup_exact(sf_dir: str) -> ray.data.Dataset:
    """Keep min doc_id per distinct text; emit (doc_id, n_dups).

    Pattern: vectorized content hash in map_batches, hash-partitioned
    groupby, NATIVE Min/Count aggregate (no per-group Python — a
    map_groups finalizer costs one interpreter call per distinct text,
    billions at corpus scale). The group key is the 128-bit md5
    (collision-safe at corpus scale), so the shuffle moves
    (hash, doc_id) pairs — never the text itself."""
    from ray.data.aggregate import Count, Min

    ds = dup_corpus(sf_dir)

    def add_hash(batch: pa.Table) -> pa.Table:
        hashes = [
            hashlib.md5(t.encode()).hexdigest() for t in batch["text"].to_pylist()
        ]
        return pa.table({"h": pa.array(hashes), "doc_id": batch["doc_id"]})

    hashed = ds.map_batches(add_hash, batch_format="pyarrow", zero_copy_batch=True)
    agg = hashed.groupby("h").aggregate(
        Min("doc_id", alias_name="doc_id"), Count(alias_name="n_dups")
    )
    return agg.select_columns(["doc_id", "n_dups"])


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------

N_PERM = 64
N_BANDS = 16          # 16 bands x 4 rows
ROWS_PER_BAND = N_PERM // N_BANDS
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


class MinHashStage:
    """Actor-pool stage: signature per doc, exploded to band rows.

    Emits (band, band_hash, doc_id, sig) — the signature rides along so
    candidate verification needs no second pass over the texts. Cost:
    N_PERM * 8 bytes per band row; drop the sig column and re-join if
    signatures ever dominate the shuffle."""

    def __init__(self) -> None:
        self._sig = minhash_signature

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        bands, band_hashes, doc_ids, sigs = [], [], [], []
        for doc_id, text in zip(ids, texts):
            sig = self._sig(text)
            for b in range(N_BANDS):
                chunk = sig[b * ROWS_PER_BAND : (b + 1) * ROWS_PER_BAND]
                bands.append(b)
                band_hashes.append(zlib.crc32(chunk.tobytes()))
                doc_ids.append(int(doc_id))
                sigs.append(sig.tolist())
        return pa.table(
            {
                "band": pa.array(bands, pa.int32()),
                "band_hash": pa.array(band_hashes, pa.int64()),
                "doc_id": pa.array(doc_ids, pa.int64()),
                "sig": pa.array(sigs, pa.list_(pa.int64())),
            }
        )


def _bucket_pairs(group: pa.Table) -> pa.Table:
    """Candidate pairs within one (band, band_hash) bucket, with
    signature-estimated Jaccard."""
    ids = group["doc_id"].to_numpy(zero_copy_only=False)
    if len(ids) < 2:
        return pa.table(
            {
                "doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64()),
                "est_jaccard": pa.array([], pa.float64()),
            }
        )
    order = np.argsort(ids)
    ids = ids[order]
    sigs = np.asarray(group["sig"].to_pylist())[order]
    doc_a, doc_b, est = [], [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if ids[i] == ids[j]:
                continue
            doc_a.append(int(ids[i]))
            doc_b.append(int(ids[j]))
            est.append(float((sigs[i] == sigs[j]).mean()))
    return pa.table(
        {
            "doc_a": pa.array(doc_a, pa.int64()),
            "doc_b": pa.array(doc_b, pa.int64()),
            "est_jaccard": pa.array(est, pa.float64()),
        }
    )


def dedup_minhash(sf_dir: str, threshold: float = 0.5) -> ray.data.Dataset:
    """MinHash+LSH near-dup pairs: shingle -> minhash -> band -> bucket
    groupby -> estimate -> threshold -> global pair dedup."""
    ds = dup_corpus(sf_dir)
    banded = ds.map_batches(
        MinHashStage,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=pool_size(),
        num_cpus=1,
    )
    pairs = banded.groupby(["band", "band_hash"]).map_groups(
        _bucket_pairs, batch_format="pyarrow"
    )
    # A pair can surface from several bands: dedup on (doc_a, doc_b) with a
    # native aggregate (the estimate is pair-constant across bands, so Max
    # IS "first" — no per-pair Python finalizer).
    from ray.data.aggregate import Max

    thresholded = pairs.filter(expr=f"est_jaccard >= {threshold}")
    return thresholded.groupby(["doc_a", "doc_b"]).aggregate(
        Max("est_jaccard", alias_name="est_jaccard")
    )


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


class SimHashStage:
    def __init__(self) -> None:
        self._simhash = simhash64

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        chunk_ids, chunk_vals, doc_ids, fps = [], [], [], []
        for doc_id, text in zip(ids, texts):
            fp = self._simhash(text)
            for c in range(SIMHASH_CHUNKS):
                chunk_ids.append(c)
                chunk_vals.append((fp >> (16 * c)) & 0xFFFF)
                doc_ids.append(int(doc_id))
                fps.append(fp)
        return pa.table(
            {
                "chunk": pa.array(chunk_ids, pa.int32()),
                "chunk_val": pa.array(chunk_vals, pa.int64()),
                "doc_id": pa.array(doc_ids, pa.int64()),
                "fp": pa.array(np.array(fps, dtype=np.uint64).view(np.int64)),
            }
        )


def _simhash_bucket_pairs(max_hamming: int):
    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = group["doc_id"].to_numpy(zero_copy_only=False)
        fps = group["fp"].to_numpy(zero_copy_only=False).view(np.uint64)
        doc_a, doc_b, dist = [], [], []
        order = np.argsort(ids)
        ids, fps = ids[order], fps[order]
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if ids[i] == ids[j]:
                    continue
                d = int(bin(int(fps[i]) ^ int(fps[j])).count("1"))
                if d <= max_hamming:
                    doc_a.append(int(ids[i]))
                    doc_b.append(int(ids[j]))
                    dist.append(d)
        return pa.table(
            {
                "doc_a": pa.array(doc_a, pa.int64()),
                "doc_b": pa.array(doc_b, pa.int64()),
                "hamming": pa.array(dist, pa.int64()),
            }
        )

    return bucket_pairs


def dedup_simhash(sf_dir: str, max_hamming: int = 3) -> ray.data.Dataset:
    """SimHash near-dup pairs via 16-bit-chunk banding (pigeonhole: any
    pair within hamming<=3 of 64 bits shares at least one of 4 chunks)."""
    ds = dup_corpus(sf_dir)
    banded = ds.map_batches(
        SimHashStage,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=pool_size(),
        num_cpus=1,
    )
    pairs = banded.groupby(["chunk", "chunk_val"]).map_groups(
        _simhash_bucket_pairs(max_hamming), batch_format="pyarrow"
    )
    # hamming is pair-constant across chunks: native Max == "first"
    from ray.data.aggregate import Max

    return pairs.groupby(["doc_a", "doc_b"]).aggregate(
        Max("hamming", alias_name="hamming")
    )


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
    """Explode each doc into (gram_hash, doc_id, n_grams) rows.

    ``n_grams`` (a doc-constant int) rides on every row so the downstream
    pair aggregate needs NO join and NO broadcast: exact Jaccard is
    c / (na + nb - c) where c = number of gram buckets a pair shares —
    the inverted-index identity |A∩B| = #{g : g∈A and g∈B}."""

    def __init__(self) -> None:
        self._gram_hashes = _gram_hashes

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        gh_out, id_out, n_out = [], [], []
        for doc_id, text in zip(ids, texts):
            gh = self._gram_hashes(text)
            gh_out.append(gh)
            id_out.append(np.full(len(gh), doc_id, dtype=np.int64))
            n_out.append(np.full(len(gh), len(gh), dtype=np.int64))
        return pa.table(
            {
                "gram_hash": pa.array(np.concatenate(gh_out)),
                "doc_id": pa.array(np.concatenate(id_out)),
                "n_grams": pa.array(np.concatenate(n_out)),
            }
        )


def _gram_bucket_pairs(group: pa.Table) -> pa.Table:
    """All (doc_a < doc_b) pairs sharing this gram. Hot grams make this
    quadratic — at 100TB scale cap df (drop grams with document frequency
    above a bound, losing only pairs whose entire overlap is stopword-like
    grams) or salt by a secondary gram; at test scale buckets are small."""
    ids = group["doc_id"].to_numpy(zero_copy_only=False)
    ng = group["n_grams"].to_numpy(zero_copy_only=False)
    order = np.argsort(ids)
    ids, ng = ids[order], ng[order]
    ii, jj = np.triu_indices(len(ids), 1)
    return pa.table(
        {
            "doc_a": pa.array(ids[ii]),
            "doc_b": pa.array(ids[jj]),
            "na": pa.array(ng[ii]),
            "nb": pa.array(ng[jj]),
        }
    )


def dedup_jaccard(sf_dir: str, threshold: float = JACCARD_THRESHOLD) -> ray.data.Dataset:
    """Exact word-3-gram Jaccard near-dup pairs (recall 1.0 by construction,
    unlike MinHash): explode docs over an inverted gram index, count bucket
    co-occurrences per pair (= exact intersection size), finish with
    c/(na+nb-c) >= threshold. The shuffle moves (int64 x 4) rows only;
    no text, no gram sets, no joins."""
    from ray.data.aggregate import Count, Max

    ds = dup_corpus(sf_dir)
    exploded = ds.map_batches(
        GramIndexStage,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=pool_size(),
        num_cpus=1,
    )
    pairs = exploded.groupby("gram_hash").map_groups(
        _gram_bucket_pairs, batch_format="pyarrow"
    )
    counted = pairs.groupby(["doc_a", "doc_b"]).aggregate(
        Count(alias_name="c"),
        Max("na", alias_name="na"),
        Max("nb", alias_name="nb"),
    )

    def finish(batch: pa.Table) -> pa.Table:
        c = batch["c"].to_numpy(zero_copy_only=False).astype(np.float64)
        na = batch["na"].to_numpy(zero_copy_only=False).astype(np.float64)
        nb = batch["nb"].to_numpy(zero_copy_only=False).astype(np.float64)
        jac = np.round(c / (na + nb - c), _G_DECIMALS)
        out = pa.table(
            {
                "doc_a": batch["doc_a"],
                "doc_b": batch["doc_b"],
                "jaccard": pa.array(jac),
            }
        )
        return out.filter(pa.array(jac >= threshold))

    return counted.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


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
    the embedding (so candidate verification is local to the bucket)."""

    def __init__(self) -> None:
        self._H = _HYPERPLANES

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
        ids = group["vec_id"].to_numpy(zero_copy_only=False)
        if len(ids) < 2:
            return pa.table(
                {
                    "doc_a": pa.array([], pa.int64()),
                    "doc_b": pa.array([], pa.int64()),
                    "cosine": pa.array([], pa.float64()),
                }
            )
        order = np.argsort(ids)
        ids = ids[order]
        emb = emb_matrix(group["embedding"])[order]
        nrm = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        # round before thresholding — matches _CosinePairs and the oracle
        scores = np.round(nrm @ nrm.T, _C_DECIMALS)
        ii, jj = np.triu_indices(len(ids), 1)
        keep = (scores[ii, jj] >= threshold) & (ids[ii] != ids[jj])
        return pa.table(
            {
                "doc_a": pa.array(ids[ii][keep]),
                "doc_b": pa.array(ids[jj][keep]),
                "cosine": pa.array(scores[ii, jj][keep]),
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
    ds = emb_dup_corpus(sf_dir)
    banded = ds.map_batches(
        _SrpBandStage,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=pool_size(),
        num_cpus=1,
    )
    pairs = banded.groupby(["band", "band_val"]).map_groups(
        _srp_bucket_pairs(threshold), batch_format="pyarrow"
    )
    # cosine is pair-constant across bands: native Max == "first"
    from ray.data.aggregate import Max

    return pairs.groupby(["doc_a", "doc_b"]).aggregate(
        Max("cosine", alias_name="cosine")
    )
