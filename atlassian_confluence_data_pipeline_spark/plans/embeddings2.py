"""Embedding wave 2: random-projection dimensionality reduction and
product-quantization codes.

Both are per-row vector transforms — narrow maps with no shuffle at
all, the cheapest possible 100 TB shape (one scan, codegen'd HOF
arithmetic). The "random" matrices are engine-portable affine hashes
(same family as operators/lsh.py MINHASH_PERMS), so DuckDB reproduces
every projected coordinate bit-for-bit and the oracle is a value
check, not a row count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.plans.registry import query

_DIM = 64  # embeddings fixture dimension
_OUT = 8  # projected dimension

#: affine sign hash: sign(i, j) = +1 if ((A*(i*_OUT + j) + B) mod M) is
#: even else -1 — a fixed +-1 projection matrix both engines compute
#: from the same integers (Achlioptas-style JL projection).
_A, _B, _M = 1664525, 1013904223, 2147483647


def _sign(i: Column, j: int) -> Column:
    code = (F.lit(_A) * (i * _OUT + F.lit(j)) + F.lit(_B)) % F.lit(_M)
    return F.when(code % 2 == 0, F.lit(1.0)).otherwise(F.lit(-1.0))


def _sql_sign(i: str, j: int) -> str:
    return (
        f"CASE WHEN (({_A} * ({i} * {_OUT} + {j}) + {_B}) % {_M}) % 2 = 0 "
        f"THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END"
    )


def _rp_oracle() -> str:
    cols = ",\n       ".join(
        "round(list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        "list_transform(generate_series(0, %d), "
        "i -> embedding[i + 1]::DOUBLE * %s)), "
        "(acc, x) -> acc + x), 6) AS p%d" % (_DIM - 1, _sql_sign("i", j), j)
        for j in range(_OUT)
    )
    return f"""
SELECT vec_id,
       {cols}
FROM embeddings
"""


@query(
    "random_projection_embed",
    oracle=_rp_oracle(),
    tags=("embedding", "projection", "jl", "narrow"),
)
def random_projection_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss sign projection 64-d -> 8-d: p_j = sum_i
    emb[i] * sign(i, j) with a hash-derived +-1 matrix. Each output
    coordinate is one sequential HOF fold over the vector — identical
    left-to-right accumulation order on both engines, so the doubles
    match bitwise before the cosmetic round(6). No shuffle: the 100 TB
    cost is exactly one scan of the embedding column."""
    emb = load_table(spark, sf_dir, "embeddings")
    xd = F.transform(F.col("embedding"), lambda x: x.cast("double"))

    # the sign matrix is pre-evaluated in exact Python int arithmetic
    # (identical to the SQL CASE/mod formula) and shipped as one
    # literal array per output dim — the fold body is then a bare
    # multiply-add instead of a mod/branch chain, and plan build stays
    # flat. x * +-1.0 is IEEE-exact, so parity with the formula-based
    # oracle is bitwise.
    signs = [
        [
            1.0 if ((_A * (i * _OUT + j) + _B) % _M) % 2 == 0 else -1.0
            for i in range(_DIM)
        ]
        for j in range(_OUT)
    ]

    def proj(j: int) -> Column:
        srow = F.lit(signs[j])
        return F.round(
            F.aggregate(
                F.sequence(F.lit(0), F.lit(_DIM - 1)),
                F.lit(0.0),
                lambda acc, i: acc
                + F.element_at(xd, i + 1) * F.element_at(srow, i + 1),
            ),
            6,
        ).alias(f"p{j}")

    return emb.select("vec_id", *[proj(j) for j in range(_OUT)])


_SUBS = 4  # PQ: number of subvectors
_SUBDIM = _DIM // _SUBS
_CODEBOOK = 8  # centroids per subspace (seeded from the first 8 vectors)


def _pq_oracle() -> str:
    # centroid c of subspace s = subvector s of seed row c; distance =
    # DECIMAL-summed squared diff over the 16 subdims. All (vec x
    # centroid) distances come from one cross join with the 8-row
    # codebook, then an ordered-first aggregate picks each subspace's
    # argmin with the lowest-cid tie-break.
    dist_cols = []
    for s in range(_SUBS):
        lo = s * _SUBDIM  # 0-based offset of subspace s
        diff = (
            f"(e.embedding[{lo} + k]::DOUBLE - c.embedding[{lo} + k]::DOUBLE)"
        )
        dist_cols.append(
            "list_reduce(list_prepend(CAST(0 AS DECIMAL(38,12)), "
            f"list_transform(generate_series(1, {_SUBDIM}), "
            f"k -> CAST({diff} * {diff} AS DECIMAL(38,12)))), "
            f"(acc, x) -> acc + x) AS d{s}"
        )
    dists = ",\n         ".join(dist_cols)
    codes = ",\n       ".join(
        f"first(cid ORDER BY d{s} ASC, cid ASC) AS code{s}"
        for s in range(_SUBS)
    )
    return f"""
WITH cb AS (
  SELECT vec_id AS cid, embedding FROM embeddings WHERE vec_id < {_CODEBOOK}
),
d AS (
  SELECT e.vec_id, c.cid,
         {dists}
  FROM embeddings e CROSS JOIN cb c
)
SELECT vec_id,
       {codes}
FROM d GROUP BY vec_id
"""


@query(
    "pq_codes",
    oracle=_pq_oracle(),
    tags=("embedding", "quantization", "pq", "broadcast"),
)
def pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization: split each 64-d vector into 4 x 16-d
    subvectors and assign each to its nearest codebook centroid
    (codebook = the first 8 vectors' subvectors, the deterministic
    seeding used by the k-means queries). Assignment is the same
    narrow literal-argmax map as kmeans_iterations: the 8x4 codebook
    is collected (tiny, seed rows only) into literal arrays, so the
    100 TB plan is a single scan with a per-row fold — no join, no
    shuffle. Squared distances are DECIMAL-summed for cross-engine
    order-independence; ties break to the lowest centroid id."""
    emb = load_table(spark, sf_dir, "embeddings")
    seeds = (
        emb.filter(F.col("vec_id") < _CODEBOOK)
        .select("vec_id", "embedding")
        .collect()
    )  # 8 seed rows — same tiny-literal pattern as the k-means codebook
    cents = {
        int(r["vec_id"]): [float(x) for x in r["embedding"]] for r in seeds
    }

    xd = F.transform(F.col("embedding"), lambda x: x.cast("double"))

    def code(s: int) -> Column:
        # compact 2-D literal codebook (one Literal node, no expression
        # parse of 128 casts) + ONE argmin fold per subspace (the
        # assign_nearest_centroid pattern) — each distance is evaluated
        # exactly once, and plan BUILD cost stays flat (this query was
        # the bench's slowest purely from driver-side analysis of the
        # expanded literal tree). The (31,12)->(30,12) re-cast after
        # each add keeps the decimal accumulator type fixed and is
        # exact (sums stay < 100), so Spark and DuckDB add identical
        # decimal values.
        lo = s * _SUBDIM
        cb2d = F.lit(
            [cents[cid][lo : lo + _SUBDIM] for cid in range(_CODEBOOK)]
        )
        dists = F.transform(
            F.sequence(F.lit(0), F.lit(_CODEBOOK - 1)),
            lambda ci: F.struct(
                F.aggregate(
                    F.sequence(F.lit(1), F.lit(_SUBDIM)),
                    F.lit(0).cast("decimal(30,12)"),
                    lambda acc, k: (
                        acc
                        + (
                            (
                                F.element_at(xd, F.lit(lo) + k)
                                - F.element_at(
                                    F.element_at(cb2d, ci + 1), k
                                )
                            )
                            * (
                                F.element_at(xd, F.lit(lo) + k)
                                - F.element_at(
                                    F.element_at(cb2d, ci + 1), k
                                )
                            )
                        ).cast("decimal(30,12)")
                    ).cast("decimal(30,12)"),
                ).alias("d"),
                ci.cast("bigint").alias("cid"),
            ),
        )
        best = F.aggregate(
            dists,
            F.struct(
                F.lit(None).cast("decimal(30,12)").alias("d"),
                F.lit(None).cast("bigint").alias("cid"),
            ),
            # ascending-cid fold + strict < keeps the LOWEST cid on ties
            lambda a, x: F.when(a["d"].isNull() | (x["d"] < a["d"]), x).otherwise(a),
        )
        return best["cid"].alias(f"code{s}")

    return emb.select("vec_id", *[code(s) for s in range(_SUBS)])
