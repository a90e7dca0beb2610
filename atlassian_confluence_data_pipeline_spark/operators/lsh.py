"""Locality-sensitive hashing for near-duplicate detection at scale
(extension X2): MinHash + banded LSH, and SimHash with chunk-banding.

All pure built-in expressions (xxhash64, higher-order array functions,
bit ops) — JVM-side, no UDFs, no ML-pipeline fitting step, fully
deterministic. The candidate-pair joins are *equi-joins on band keys*:
each document only ever meets documents sharing a band bucket, so the
pair count stays near-linear in corpus size — the property that makes
near-dup feasible at 100 TB where exact all-pairs Jaccard is O(n^2).

Engine-specific hashes (xxhash64) are not reproducible in DuckDB, so
these register rows-only checks; exactness is covered by planted-pair
pytest fixtures plus the oracle-checked exact-Jaccard verifier that
confirms surviving candidates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def minhash_signature(shingles: Column, k: int = 32) -> Column:
    """k-permutation MinHash signature of a shingle *set*.

    Cost shape: each shingle is string-hashed ONCE (xxhash64); the k
    permutations are affine transforms ``a_i * h32 + b_i`` over the base
    hash — integer multiply/add per permutation instead of k string
    hashes (~10x cheaper at corpus scale). The base hash is masked to
    32 bits so the affine product cannot overflow int64 (ANSI mode
    throws on overflow). Signature element = min over the set; empty
    sets get NULL elements (callers should filter size > 0).

    NB: every per-element lambda must take exactly ONE parameter — a
    two-parameter lambda is interpreted by Spark as (element, index) and
    the salt would silently become the array position."""
    import random

    rng = random.Random(0x5EED)
    base = F.transform(shingles, lambda s: F.xxhash64(s).bitwiseAND(F.lit(0xFFFFFFFF)))

    def perm(a: int, b: int):
        return lambda h: F.lit(a) * h + F.lit(b)

    cols = []
    for _ in range(k):
        a = rng.getrandbits(31) | 1  # odd multiplier < 2^31
        b = rng.getrandbits(31)  # a*h32 + b < 2^63: overflow-free
        cols.append(F.array_min(F.transform(base, perm(a, b))))
    return F.array(*cols)


def lsh_band_keys(signature: Column, bands: int, rows: int) -> list[Column]:
    """Hash each band (``rows`` consecutive signature slots) to one key.
    Two docs collide in a band iff that band's slots all match — the
    classic (b, r) S-curve: P(candidate) = 1 - (1 - j^r)^b."""
    return [
        F.xxhash64(*[F.element_at(signature, b * rows + m + 1) for m in range(rows)])
        for b in range(bands)
    ]


def minhash_lsh_candidates(
    docs: DataFrame,
    id_col: str,
    shingles_col: str,
    k: int = 32,
    bands: int = 16,
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) via banded MinHash LSH.

    One pass computes signatures; an explode produces (band_id, band_key)
    rows; a self-equi-join on the bucket yields candidates, deduped
    because a pair can collide in several bands."""
    rows = k // bands
    sig = docs.select(
        F.col(id_col).alias("__id"),
        minhash_signature(F.col(shingles_col), k).alias("__sig"),
    ).filter(F.size(F.col("__sig")) == k)
    keys = lsh_band_keys(F.col("__sig"), bands, rows)
    # materialize: both sides of the self-join read this — unmaterialized,
    # the whole signature computation runs twice
    banded = sig.select(
        "__id",
        F.posexplode(F.array(*keys)).alias("band_id", "band_key"),
    ).localCheckpoint(eager=True)
    left = banded.select(
        F.col("__id").alias("id_a"), "band_id", "band_key"
    )
    right = banded.select(
        F.col("__id").alias("id_b"), "band_id", "band_key"
    )
    return (
        left.join(right, ["band_id", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def verify_candidates_jaccard(
    candidates: DataFrame,
    docs: DataFrame,
    id_col: str,
    shingles_col: str,
    threshold: float,
) -> DataFrame:
    """Exact-Jaccard verification of LSH candidates — the verify step of
    the standard candidate/verify split; only O(candidates) set
    intersections instead of O(n^2)."""
    sh = docs.select(F.col(id_col).alias("__vid"), F.col(shingles_col).alias("__sh"))
    a = sh.select(F.col("__vid").alias("id_a"), F.col("__sh").alias("__sh_a"))
    b = sh.select(F.col("__vid").alias("id_b"), F.col("__sh").alias("__sh_b"))
    inter = F.size(F.array_intersect("__sh_a", "__sh_b"))
    jac = inter.cast("double") / (
        F.size("__sh_a") + F.size("__sh_b") - inter
    )
    return (
        candidates.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(docs: DataFrame, id_col: str, tokens_col: str, bits: int = 64) -> DataFrame:
    """64-bit SimHash per document: sign of the per-bit weighted sum of
    token hashes (+1 if a token's hash has the bit set, else -1).

    Implemented as explode -> one HashAggregate with 64 conditional sums
    -> bit reassembly. One shuffle on the doc id; no Python."""
    tok = docs.select(
        F.col(id_col).alias("__id"),
        F.explode(F.col(tokens_col)).alias("__t"),
    ).withColumn("__h", F.xxhash64("__t"))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("__h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(
                -1
            )
        ).alias(f"__b{b}")
        for b in range(bits)
    ]
    agg = tok.groupBy("__id").agg(*bit_sums)
    fingerprint = None
    for b in range(bits):
        term = F.when(
            F.col(f"__b{b}") > 0, F.shiftleft(F.lit(1).cast("bigint"), b)
        ).otherwise(F.lit(0).cast("bigint"))
        fingerprint = term if fingerprint is None else fingerprint.bitwiseOR(term)
    return agg.select(F.col("__id").alias(id_col), fingerprint.alias("simhash"))


def simhash_near_pairs(
    hashes: DataFrame, id_col: str, max_hamming: int = 3, chunks: int = 4
) -> DataFrame:
    """Near-dup pairs by Hamming distance <= ``max_hamming``.

    Pigeonhole banding: split the 64-bit fingerprint into ``chunks``
    16-bit chunks; any pair within distance <= chunks-1 must agree on at
    least one chunk, so the join is an equi-join on (chunk_id, chunk
    value), then an exact popcount filter. No cross join at any scale."""
    width = 64 // chunks
    mask = (1 << width) - 1
    chunk_cols = [
        (F.shiftrightunsigned(F.col("simhash"), i * width).bitwiseAND(F.lit(mask))).alias(
            f"__c{i}"
        )
        for i in range(chunks)
    ]
    h = hashes.select(F.col(id_col).alias("__id"), F.col("simhash"), *chunk_cols)
    # materialize: the self-join would otherwise run the upstream
    # fingerprint aggregation once per side
    banded = h.select(
        "__id",
        "simhash",
        F.posexplode(F.array(*[F.col(f"__c{i}") for i in range(chunks)])).alias(
            "chunk_id", "chunk_val"
        ),
    ).localCheckpoint(eager=True)
    left = banded.select(
        F.col("__id").alias("id_a"), F.col("simhash").alias("__h_a"), "chunk_id", "chunk_val"
    )
    right = banded.select(
        F.col("__id").alias("id_b"), F.col("simhash").alias("__h_b"), "chunk_id", "chunk_val"
    )
    dist = F.bit_count(F.col("__h_a").bitwiseXOR(F.col("__h_b")))
    return (
        left.join(right, ["chunk_id", "chunk_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", dist.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
