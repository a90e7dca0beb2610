"""Model-fitting wave (35): closed-form ridge regression, one exact
Newton step of logistic regression, and split-conformal prediction
intervals.

Small parametric models fitted EXACTLY inside the engine — the
quality-classifier / calibration layer of a curation pipeline, done
without any iterative float accumulation: all Gram-matrix moments are
exact integer/DECIMAL aggregates, the 3x3 solves are closed-form
adjugate arithmetic evaluated identically by both engines, and the
conformal quantile is an exact order statistic via distributed
selection. Where plain OLS/IRLS would be a black-box `.fit()`, these
queries show the moments, the solve, and the diagnostics as auditable
columns.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.operators.windows import (
    equal_width_bucketizer,
    kth_smallest,
)
from atlassian_confluence_data_pipeline_spark.plans.registry import query

#: ridge penalty (in squared-cents units of the Gram matrix)
_RIDGE_LAMBDA = 1000.0

#: conformal: miscoverage level and the house split hash
_ALPHA = 0.1
_CONF_MOD = 2_147_483_647
_CONF_A = 1_103_515_245
_CONF_B = 12_345

#: SQL fragment: closed-form solve of the symmetric 3x3 system
#: [[m11,m12,m13],[m12,m22,m23],[m13,m23,m33]] w = [v1,v2,v3]
_SOLVE3 = """
det AS (
  SELECT *,
         m11 * (m22 * m33 - m23 * m23)
         - m12 * (m12 * m33 - m23 * m13)
         + m13 * (m12 * m23 - m22 * m13) AS dt
  FROM g
), w AS (
  SELECT *,
         ((m22 * m33 - m23 * m23) * v1
          + (m13 * m23 - m12 * m33) * v2
          + (m12 * m23 - m13 * m22) * v3) / dt AS w1,
         ((m13 * m23 - m12 * m33) * v1
          + (m11 * m33 - m13 * m13) * v2
          + (m12 * m13 - m11 * m23) * v3) / dt AS w2,
         ((m12 * m23 - m13 * m22) * v1
          + (m12 * m13 - m11 * m23) * v2
          + (m11 * m22 - m12 * m12) * v3) / dt AS w3
  FROM det
)"""


def _solve3(m, v):
    """Python twin of the _SOLVE3 adjugate arithmetic (same expression
    tree over the same exact-moment doubles -> identical results)."""
    m11, m12, m13, m22, m23, m33 = m
    v1, v2, v3 = v
    dt = (
        m11 * (m22 * m33 - m23 * m23)
        - m12 * (m12 * m33 - m23 * m13)
        + m13 * (m12 * m23 - m22 * m13)
    )
    w1 = (
        (m22 * m33 - m23 * m23) * v1
        + (m13 * m23 - m12 * m33) * v2
        + (m12 * m23 - m13 * m22) * v3
    ) / dt
    w2 = (
        (m13 * m23 - m12 * m33) * v1
        + (m11 * m33 - m13 * m13) * v2
        + (m12 * m13 - m11 * m23) * v3
    ) / dt
    w3 = (
        (m12 * m23 - m13 * m22) * v1
        + (m12 * m13 - m11 * m23) * v2
        + (m11 * m22 - m12 * m12) * v3
    ) / dt
    return w1, w2, w3


@query(
    "ridge_regression_closed_form",
    oracle=f"""
WITH x AS (
  SELECT CAST(round(l_quantity * 100) AS BIGINT) AS x1,
         CAST(round(p_retailprice * 100) AS BIGINT) AS x2,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS y
  FROM lineitem JOIN part ON p_partkey = l_partkey
), g AS (
  SELECT CAST(count(*) AS DOUBLE) + {_RIDGE_LAMBDA!r} AS m11,
         CAST(sum(CAST(x1 AS DECIMAL(38,0))) AS DOUBLE) AS m12,
         CAST(sum(CAST(x2 AS DECIMAL(38,0))) AS DOUBLE) AS m13,
         CAST(sum(CAST(x1 * x1 AS DECIMAL(38,0))) AS DOUBLE)
           + {_RIDGE_LAMBDA!r} AS m22,
         CAST(sum(CAST(x1 * x2 AS DECIMAL(38,0))) AS DOUBLE) AS m23,
         CAST(sum(CAST(x2 * x2 AS DECIMAL(38,0))) AS DOUBLE)
           + {_RIDGE_LAMBDA!r} AS m33,
         CAST(sum(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS v1,
         CAST(sum(CAST(x1 * y AS DECIMAL(38,0))) AS DOUBLE) AS v2,
         CAST(sum(CAST(x2 * y AS DECIMAL(38,0))) AS DOUBLE) AS v3,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(y * y AS DECIMAL(38,0))) AS DOUBLE) AS syy
  FROM x
), {_SOLVE3.strip()}
SELECT n AS n_rows,
       round(w1, 6) AS intercept,
       round(w2, 6) AS coef_quantity,
       round(w3, 6) AS coef_retailprice,
       round(1 - (syy - w1 * v1 - w2 * v2 - w3 * v3)
                 / (syy - v1 * v1 / n), 6) AS r2
FROM w
""",
    tags=("fitting", "regression", "exact-moments"),
)
def ridge_regression_closed_form(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Ridge regression of line revenue on (quantity, part retail
    price) solved in CLOSED FORM: the 3x3 regularized normal equations
    (X'X + lambda*I) w = X'y with every Gram entry an exact
    integer-cent DECIMAL sum, inverted by adjugate arithmetic — the
    `.fit()` replaced by auditable algebra. r2 uses the standard
    1 - RSS/TSS identity, with RSS = y'y - w'X'y (exact for the
    un-regularized part of the fit).

    Scale shape: ONE fact scan into a 1-row moment aggregate (9 exact
    DECIMAL sums); the solve is constant work on the driver row. This
    is the 100 TB shape for any fixed-dimension linear model: moments
    distribute, algebra doesn't need to."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    x = li.join(
        F.broadcast(
            p.select(F.col("p_partkey").alias("l_partkey"), "p_retailprice")
        ),
        "l_partkey",
    ).select(
        F.round(F.col("l_quantity") * 100).cast("bigint").alias("x1"),
        F.round(F.col("p_retailprice") * 100).cast("bigint").alias("x2"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("y"),
    )

    def dsum(c):
        return F.sum(c.cast("decimal(38,0)")).cast("double")

    gr = x.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        dsum(F.col("x1")).alias("sx1"),
        dsum(F.col("x2")).alias("sx2"),
        dsum(F.col("x1") * F.col("x1")).alias("sx1x1"),
        dsum(F.col("x1") * F.col("x2")).alias("sx1x2"),
        dsum(F.col("x2") * F.col("x2")).alias("sx2x2"),
        dsum(F.col("y")).alias("sy"),
        dsum(F.col("x1") * F.col("y")).alias("sx1y"),
        dsum(F.col("x2") * F.col("y")).alias("sx2y"),
        dsum(F.col("y") * F.col("y")).alias("syy"),
    ).first()
    n = gr["n"]
    lam = _RIDGE_LAMBDA
    m = (
        float(n) + lam,
        gr["sx1"],
        gr["sx2"],
        gr["sx1x1"] + lam,
        gr["sx1x2"],
        gr["sx2x2"] + lam,
    )
    v = (gr["sy"], gr["sx1y"], gr["sx2y"])
    w1, w2, w3 = _solve3(m, v)
    rss = gr["syy"] - w1 * v[0] - w2 * v[1] - w3 * v[2]
    tss = gr["syy"] - v[0] * v[0] / n
    return spark.range(1).select(
        F.lit(n).cast("bigint").alias("n_rows"),
        F.round(F.lit(w1), 6).alias("intercept"),
        F.round(F.lit(w2), 6).alias("coef_quantity"),
        F.round(F.lit(w3), 6).alias("coef_retailprice"),
        F.round(F.lit(1 - rss / tss), 6).alias("r2"),
    )


@query(
    "logistic_newton_step",
    oracle="""
WITH x AS (
  SELECT CAST(n_chars AS BIGINT) AS x1,
         CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
           AS x2,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
  FROM documents
), g AS (
  SELECT CAST(count(*) AS DOUBLE) AS m11,
         CAST(sum(CAST(x1 AS DECIMAL(38,0))) AS DOUBLE) AS m12,
         CAST(sum(CAST(x2 AS DECIMAL(38,0))) AS DOUBLE) AS m13,
         CAST(sum(CAST(x1 * x1 AS DECIMAL(38,0))) AS DOUBLE) AS m22,
         CAST(sum(CAST(x1 * x2 AS DECIMAL(38,0))) AS DOUBLE) AS m23,
         CAST(sum(CAST(x2 * x2 AS DECIMAL(38,0))) AS DOUBLE) AS m33,
         CAST(sum(CAST(2 * y - 1 AS DECIMAL(38,0))) AS DOUBLE) / 2 AS v1,
         CAST(sum(CAST(x1 * (2 * y - 1) AS DECIMAL(38,0))) AS DOUBLE) / 2
           AS v2,
         CAST(sum(CAST(x2 * (2 * y - 1) AS DECIMAL(38,0))) AS DOUBLE) / 2
           AS v3,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(y) AS BIGINT) AS n_pos
  FROM x
), det AS (
  SELECT *,
         m11 * (m22 * m33 - m23 * m23)
         - m12 * (m12 * m33 - m23 * m13)
         + m13 * (m12 * m23 - m22 * m13) AS dt
  FROM g
), w AS (
  SELECT *,
         4 * (((m22 * m33 - m23 * m23) * v1
               + (m13 * m23 - m12 * m33) * v2
               + (m12 * m23 - m13 * m22) * v3) / dt) AS w1,
         4 * (((m13 * m23 - m12 * m33) * v1
               + (m11 * m33 - m13 * m13) * v2
               + (m12 * m13 - m11 * m23) * v3) / dt) AS w2,
         4 * (((m12 * m23 - m13 * m22) * v1
               + (m12 * m13 - m11 * m23) * v2
               + (m11 * m22 - m12 * m12) * v3) / dt) AS w3
  FROM det
)
SELECT n AS n_rows, n_pos,
       round(w1, 9) AS w_intercept,
       round(w2, 9) AS w_chars,
       round(w3, 9) AS w_words
FROM w
""",
    tags=("fitting", "classifier", "exact-moments"),
)
def logistic_newton_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One EXACT Newton-Raphson step of logistic regression (predicting
    lang == 'en' from document length features), from w = 0: at the
    origin every predicted probability is exactly 1/2, so the Hessian
    is X'X/4 and the gradient is X'(y - 1/2) — the first IRLS step
    collapses to w1 = 4 (X'X)^-1 X'(y - 1/2) with EVERY term an exact
    integer moment (the halves clear through 2y-1). The step that's
    usually buried inside `.fit()` becomes a deterministic, oracle-
    checkable aggregate.

    Scale shape: one scan, one 1-row exact-moment aggregate, constant
    driver algebra — identical to the ridge query's 100 TB shape."""
    from atlassian_confluence_data_pipeline_spark.plans.textops import _words

    docs = load_table(spark, sf_dir, "documents")
    x = docs.select(
        F.col("n_chars").cast("bigint").alias("x1"),
        F.size(_words(F.col("text"))).cast("bigint").alias("x2"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    )

    def dsum(c):
        return F.sum(c.cast("decimal(38,0)")).cast("double")

    gr = x.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("n_pos"),
        dsum(F.col("x1")).alias("m12"),
        dsum(F.col("x2")).alias("m13"),
        dsum(F.col("x1") * F.col("x1")).alias("m22"),
        dsum(F.col("x1") * F.col("x2")).alias("m23"),
        dsum(F.col("x2") * F.col("x2")).alias("m33"),
        dsum(2 * F.col("y") - 1).alias("tv1"),
        dsum(F.col("x1") * (2 * F.col("y") - 1)).alias("tv2"),
        dsum(F.col("x2") * (2 * F.col("y") - 1)).alias("tv3"),
    ).first()
    m = (
        float(gr["n"]),
        gr["m12"],
        gr["m13"],
        gr["m22"],
        gr["m23"],
        gr["m33"],
    )
    v = (gr["tv1"] / 2, gr["tv2"] / 2, gr["tv3"] / 2)
    w1, w2, w3 = _solve3(m, v)
    return spark.range(1).select(
        F.lit(gr["n"]).cast("bigint").alias("n_rows"),
        F.lit(gr["n_pos"]).cast("bigint").alias("n_pos"),
        F.round(F.lit(4 * w1), 9).alias("w_intercept"),
        F.round(F.lit(4 * w2), 9).alias("w_chars"),
        F.round(F.lit(4 * w3), 9).alias("w_words"),
    )


@query(
    "split_conformal_coverage",
    oracle=f"""
WITH base AS (
  SELECT l_partkey,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS y,
         CAST((({_CONF_A} * (l_orderkey % {_CONF_MOD}) + {_CONF_B})
               % {_CONF_MOD}) % 4 AS INT) AS split
  FROM lineitem
), model AS (
  SELECT l_partkey,
         CAST(sum(CAST(y AS DECIMAL(38,0))) AS DOUBLE) / count(*) AS pred
  FROM base WHERE split <= 1 GROUP BY 1
), cal AS (
  SELECT abs(base.y - model.pred) AS score
  FROM base JOIN model USING (l_partkey) WHERE split = 2
), nc AS (SELECT count(*) AS n FROM cal),
kq AS (
  SELECT CAST(ceil((n + 1) * {1 - _ALPHA}) AS BIGINT) AS k, n FROM nc
), ranked AS (
  SELECT score, row_number() OVER (ORDER BY score) AS rk FROM cal
), qhat AS (
  SELECT ranked.score AS q FROM ranked CROSS JOIN kq
  WHERE ranked.rk = least(kq.k, kq.n)
), test AS (
  SELECT abs(base.y - model.pred) AS score
  FROM base JOIN model USING (l_partkey) WHERE split = 3
)
SELECT (SELECT CAST(n AS BIGINT) FROM nc) AS n_calibration,
       CAST(count(*) AS BIGINT) AS n_test,
       round(qhat.q / 100, 4) AS q_hat,
       round(CAST(sum(CASE WHEN test.score <= qhat.q THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*), 6) AS coverage
FROM test CROSS JOIN qhat
GROUP BY qhat.q
""",
    tags=("fitting", "conformal", "selection"),
)
def split_conformal_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction intervals with an empirical coverage
    audit: fit a trivially simple model (per-part mean revenue) on the
    train split, take the ceil((n+1)(1-alpha))-th smallest absolute
    residual on the CALIBRATION split as the interval half-width, and
    report the realized coverage on the held-out TEST split — the
    finite-sample-valid uncertainty wrapper (guaranteed >= 90% coverage
    in expectation REGARDLESS of the model) that a quality-score
    pipeline wraps around any point predictor. Splits come from the
    house affine hash — deterministic on both engines.

    Scale shape: one scan + part-domain mean (train), one residual scan
    per split; the conformal quantile is kth_smallest distributed
    SELECTION (only the bucket holding rank k sorts); coverage is one
    filtered count. No global sort, no window."""
    li = load_table(spark, sf_dir, "lineitem")
    split = (
        (
            (
                F.lit(_CONF_A) * (F.col("l_orderkey") % _CONF_MOD)
                + F.lit(_CONF_B)
            )
            % _CONF_MOD
        )
        % 4
    ).cast("int")
    base = li.select(
        "l_partkey",
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("y"),
        split.alias("split"),
    ).localCheckpoint(eager=True)
    model = (
        base.filter(F.col("split") <= 1)
        .groupBy("l_partkey")
        .agg(
            (
                F.sum(F.col("y").cast("decimal(38,0)")).cast("double")
                / F.count(F.lit(1))
            ).alias("pred")
        )
    )
    # Round 12: the part-domain model BROADCASTS onto the calibration
    # and test splits (both sides were shuffled by partkey to meet a
    # domain-bounded frame); the calibration count fuses with a max
    # scan so kth_smallest gets O(1) equal-width buckets over the known
    # [0, max] score range instead of paying its approxQuantile
    # sampling pass (selection is exact under ANY monotone bucketizer;
    # the operator's skew refinement bounds the sorted bucket).
    cal = (
        base.filter(F.col("split") == 2)
        .join(F.broadcast(model), "l_partkey")
        .select(F.abs(F.col("y") - F.col("pred")).alias("score"))
        .localCheckpoint(eager=True)
    )
    st = cal.agg(
        F.count(F.lit(1)).alias("n"), F.max("score").alias("mx")
    ).first()
    n_cal = int(st["n"])
    k = min(int(math.ceil((n_cal + 1) * (1 - _ALPHA))), n_cal)
    q = kth_smallest(
        cal,
        "score",
        [k],
        bucket_of=equal_width_bucketizer(0.0, float(st["mx"] or 0.0), 32),
    )[k]
    test = (
        base.filter(F.col("split") == 3)
        .join(F.broadcast(model), "l_partkey")
        .select(F.abs(F.col("y") - F.col("pred")).alias("score"))
    )
    return test.agg(
        F.lit(n_cal).cast("bigint").alias("n_calibration"),
        F.count(F.lit(1)).cast("bigint").alias("n_test"),
        F.round(F.lit(q) / 100, 4).alias("q_hat"),
        F.round(
            F.sum(F.when(F.col("score") <= q, 1).otherwise(0)).cast(
                "double"
            )
            / F.count(F.lit(1)),
            6,
        ).alias("coverage"),
    )
