"""Spectral embedding analytics (round-6 wave): exact-covariance PCA
top component by power iteration.

Reference parity note: the reference pipeline (`/root/reference`) has no
numerical analytics at all — this is driver-mandate §2.11 extension
surface (embedding curation), built Spark-first.

Float discipline: covariance cells come from DECIMAL-exact integer
moments of power-of-two-quantized components (lossless, order-free under
shuffle), are converted to double with ONE shared expression, and the
power iteration folds strictly left-to-right in both engines (Python
float64 on the driver == DuckDB list_reduce), so every emitted double is
bit-identical before the final display round.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.plans.registry import query

#: embedding dimensionality of the fixture corpus
_DIM = 64

#: power-iteration rounds — the OUTPUT CONTRACT (both engines run
#: exactly this many; convergence is reported, not required)
_PCA_ITERS = 12

#: component quantization: floor(v * 2^20) is lossless for |v| < 1, and
#: the matching de-scale of the covariance is division by 2^40 — a power
#: of two, so it introduces no rounding either
_Q = 1 << 20
_Q2 = float(_Q) * float(_Q)


#: shared covariance CTE prefix: exact integer moments -> the 64x64
#: double matrix `cmat.m` (nested list ordered by (j, k))
_COV_CTES = f"""q AS (
  SELECT list_transform(embedding::DOUBLE[],
           x -> CAST(floor(x * {float(_Q)!r}) AS BIGINT)) AS q
  FROM embeddings
), nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM q),
jx AS (SELECT unnest(range(1, {_DIM + 1})) AS j),
kx AS (SELECT unnest(range(1, {_DIM + 1})) AS k),
s1 AS (
  SELECT j, CAST(sum(CAST(q[j] AS DECIMAL(38,0))) AS DOUBLE) AS s
  FROM q, jx GROUP BY j
),
s2 AS (
  SELECT j, k, CAST(sum(CAST(q[j] * q[k] AS DECIMAL(38,0))) AS DOUBLE) AS s
  FROM q, jx, kx GROUP BY j, k
),
c AS (
  SELECT s2.j, s2.k,
         ((s2.s - s1a.s * s1b.s / nn.n) / nn.n) / {_Q2!r} AS c
  FROM s2 JOIN s1 s1a ON s1a.j = s2.j JOIN s1 s1b ON s1b.j = s2.k
  CROSS JOIN nn
),
crow AS (SELECT j, list(c ORDER BY k) AS row FROM c GROUP BY j),
cmat AS (SELECT list(row ORDER BY j) AS m FROM crow)"""


#: session-memoized covariance matrices keyed by fixture dir — the
#: matrix is 64x64 driver floats derived deterministically from the
#: data, and both spectral queries (PCA, participation ratio) start
#: from it; sharing saves the pair-exploded moment pass (round-6 bench:
#: ~4 s each at sf0.1)
_COV_CACHE: dict[str, list] = {}


def _cov_matrix(spark: SparkSession, sf_dir: str) -> list:
    """The exact covariance matrix as driver-side float64 — one
    pair-exploded DECIMAL moment pass, bounded (64 + 64^2) collect,
    doubles built with the oracle CTEs' exact expression shape.
    Memoized per fixture dir (deterministic in the data)."""
    key = str(sf_dir).rstrip("/")
    if key in _COV_CACHE:
        return _COV_CACHE[key]
    emb = load_table(spark, sf_dir, "embeddings")
    q = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") * float(_Q)).cast("bigint"),
    )
    qdf = emb.select(q.alias("q")).localCheckpoint(eager=True)
    n = qdf.count()
    s1_rows = (
        qdf.select(F.posexplode("q").alias("dim", "qv"))
        .groupBy("dim")
        .agg(F.sum(F.col("qv").cast("decimal(38,0)")).alias("s"))
        .collect()
    )
    s2_rows = (
        qdf.select(F.posexplode("q").alias("j", "qj"), F.col("q"))
        .select(
            "j",
            F.posexplode(
                F.transform(F.col("q"), lambda x: x * F.col("qj"))
            ).alias("k", "prod"),
        )
        .groupBy("j", "k")
        .agg(F.sum(F.col("prod").cast("decimal(38,0)")).alias("s"))
        .collect()
    )
    s1 = [0.0] * _DIM
    for r in s1_rows:
        s1[r["dim"]] = float(r["s"])
    c = [[0.0] * _DIM for _ in range(_DIM)]
    nf = float(n)
    for r in s2_rows:
        j, k = r["j"], r["k"]
        c[j][k] = ((float(r["s"]) - s1[j] * s1[k] / nf) / nf) / _Q2
    _COV_CACHE[key] = c
    return c


def _fold(terms: str) -> str:
    """DuckDB left fold matching a Python ``s = 0.0; s += t`` loop."""
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), {terms}),"
        f" (a, b) -> a + b)"
    )


def _pca_oracle() -> str:
    matvec = _fold(
        f"list_transform(range(1, {_DIM + 1}), k -> m[j][k] * v[k])"
    )
    steps = []
    for r in range(1, _PCA_ITERS + 1):
        prev = "v0" if r == 1 else f"v{r - 1}"
        steps.append(
            f"p{r} AS (SELECT list_transform(range(1, {_DIM + 1}),"
            f" j -> {matvec}) AS p FROM cmat, {prev})"
        )
        norm = _fold("list_transform(p, y -> y * y)")
        steps.append(
            f"v{r} AS (SELECT list_transform(p, x -> x / sqrt({norm}))"
            f" AS v FROM p{r})"
        )
    chain = ",\n".join(steps)
    last = f"v{_PCA_ITERS}"
    rayleigh = _fold(
        f"list_transform(range(1, {_DIM + 1}), j -> v[j] * cv[j])"
    )
    trace = _fold(f"list_transform(range(1, {_DIM + 1}), j -> m[j][j])")
    return f"""
WITH {_COV_CTES},
v0 AS (SELECT list_transform(range(1, {_DIM + 1}), i -> 0.125) AS v),
{chain},
cvx AS (SELECT list_transform(range(1, {_DIM + 1}), j -> {matvec}) AS cv
        FROM cmat, {last}),
lam AS (SELECT {rayleigh} AS lam FROM {last}, cvx),
trx AS (SELECT {trace} AS tr FROM cmat)
SELECT CAST(j - 1 AS INT) AS dim,
       round(v[j], 6) AS loading,
       round(lam, 6) AS eigenvalue,
       round(lam / tr, 6) AS explained_share
FROM {last}, lam, trx, jx
"""


@query(
    "pca_top_component",
    oracle=_pca_oracle(),
    tags=("vector", "spectral", "pca", "iterative"),
)
def pca_top_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding corpus: exact covariance
    (integer-quantized DECIMAL moments — one corpus pass) + {T} rounds
    of power iteration on the {D}x{D} matrix, reporting per-dimension
    loadings, the Rayleigh-quotient eigenvalue, and its share of total
    variance — the "is there one dominant axis" diagnostic every
    embedding-quality audit starts with (an axis holding most of the
    variance means the encoder collapsed).

    Scale shape: corpus-sized work is ONE pair-exploded hash aggregate
    (n x {D}^2 rows, map-side combined, order-free because the moments
    are DECIMAL-exact integers); the driver receives {D} + {D}^2
    bounded cells (loop-control scale, the k-means-centroid class) and
    iterates the {D}-vector in Python float64 with the exact fold order
    the oracle's list_reduce uses — bit-identical doubles, no cluster
    rounds at all beyond the moment pass. Covariance de-scales by the
    power-of-two quantizer square, so no step introduces rounding
    before the final display round."""
    c = _cov_matrix(spark, sf_dir)

    from atlassian_confluence_data_pipeline_spark import iterstats

    v = [0.125] * _DIM  # 1/sqrt(64), exactly representable
    for _ in range(_PCA_ITERS):
        p = []
        for j in range(_DIM):
            s = 0.0
            for k in range(_DIM):  # left fold == list_reduce
                s += c[j][k] * v[k]
            p.append(s)
        s = 0.0
        for y in p:
            s += y * y
        nrm = math.sqrt(s)
        v = [x / nrm for x in p]
    cv = []
    for j in range(_DIM):
        s = 0.0
        for k in range(_DIM):
            s += c[j][k] * v[k]
        cv.append(s)
    lam = 0.0
    for j in range(_DIM):
        lam += v[j] * cv[j]
    tr = 0.0
    for j in range(_DIM):
        tr += c[j][j]
    iterstats.record("pca_power_iteration", _PCA_ITERS)
    out = spark.createDataFrame(
        [(j, v[j], lam, lam / tr) for j in range(_DIM)],
        "dim int, loading double, eigenvalue double, explained_share double",
    )
    return out.select(
        "dim",
        F.round("loading", 6).alias("loading"),
        F.round("eigenvalue", 6).alias("eigenvalue"),
        F.round("explained_share", 6).alias("explained_share"),
    )


def _pr_oracle() -> str:
    trace = _fold(f"list_transform(range(1, {_DIM + 1}), j -> m[j][j])")
    sumsq = _fold(
        "flatten(list_transform(m, row -> list_transform(row, x -> x * x)))"
    )
    return f"""
WITH {_COV_CTES},
trx AS (SELECT {trace} AS tr FROM cmat),
ssx AS (SELECT {sumsq} AS ss FROM cmat)
SELECT CAST({_DIM} AS INT) AS n_dims,
       round(tr, 6) AS trace,
       round(tr * tr / ss, 4) AS participation_ratio,
       round(tr * tr / ss / {_DIM}, 6) AS isotropy
FROM trx, ssx
"""


@query(
    "embedding_participation_ratio",
    oracle=_pr_oracle(),
    tags=("vector", "spectral", "isotropy"),
)
def embedding_participation_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Participation ratio of the embedding covariance —
    trace(C)^2 / sum(C^2) = (sum lambda)^2 / sum(lambda^2), the
    effective number of variance-carrying dimensions computed WITHOUT
    any eigendecomposition (Frobenius norm == sum of squared
    eigenvalues). PR ~ {D} means isotropic embeddings; PR near 1 means
    the encoder collapsed to a line — the corpus-level isotropy gate
    run next to pca_top_component's per-axis view.

    Scale shape: the same single pair-exploded DECIMAL moment pass as
    the PCA (shared _cov_matrix helper); trace and Frobenius sums fold
    left-to-right over the bounded 64x64 matrix in both engines."""
    c = _cov_matrix(spark, sf_dir)
    tr = 0.0
    for j in range(_DIM):
        tr += c[j][j]
    ss = 0.0
    for j in range(_DIM):  # row-major, same order as the oracle flatten
        for k in range(_DIM):
            ss += c[j][k] * c[j][k]
    out = spark.createDataFrame(
        [(_DIM, tr, tr * tr / ss, tr * tr / ss / _DIM)],
        "n_dims int, trace double, participation_ratio double, isotropy double",
    )
    return out.select(
        "n_dims",
        F.round("trace", 6).alias("trace"),
        F.round("participation_ratio", 4).alias("participation_ratio"),
        F.round("isotropy", 6).alias("isotropy"),
    )
