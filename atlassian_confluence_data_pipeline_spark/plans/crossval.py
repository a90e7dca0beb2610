"""Cross-validation wave (45): fully closed-form distributed k-fold CV
for the ridge regressor.

The capstone of the exact-moment model-fitting family (wave 35): k-fold
cross-validation WITHOUT ever materializing a prediction — each fold's
training Gram matrix is (total - fold) on exact integer moments, each
fold's test error expands algebraically as
RSS_f = y'y_f - 2 w_f'(X'y)_f + w_f'(X'X)_f w_f,
so the whole CV costs ONE scan + one |folds|-row aggregate + constant
driver algebra. This is the 100 TB shape for model selection: moments
distribute and subtract; predictions never exist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.plans.fitting import _solve3
from atlassian_confluence_data_pipeline_spark.plans.registry import query

_N_FOLDS = 5
_LAMBDA = 1000.0
_CV_MOD = 2_147_483_647
_CV_A = 1_103_515_245
_CV_B = 12_345

_MOMS = (
    "n",
    "sx1",
    "sx2",
    "sx1x1",
    "sx1x2",
    "sx2x2",
    "sy",
    "sx1y",
    "sx2y",
    "syy",
)


def _fold_moments_sql() -> str:
    return f"""
x AS (
  SELECT CAST((({_CV_A} * (l_orderkey % {_CV_MOD}) + {_CV_B})
               % {_CV_MOD}) % {_N_FOLDS} AS INT) AS fold,
         CAST(round(l_quantity * 100) AS BIGINT) AS x1,
         CAST(round(p_retailprice * 100) AS BIGINT) AS x2,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS y
  FROM lineitem JOIN part ON p_partkey = l_partkey
), fm AS (
  -- per-fold moments stay EXACT DECIMAL: cross-fold totals and the
  -- (total - fold) training moments are computed in decimal and only
  -- THEN cast to double (the raw sums exceed 2^53, so a double-typed
  -- sum would be order-dependent across engines)
  SELECT fold,
         CAST(count(*) AS DECIMAL(38,0)) AS n,
         sum(CAST(x1 AS DECIMAL(38,0))) AS sx1,
         sum(CAST(x2 AS DECIMAL(38,0))) AS sx2,
         sum(CAST(x1 * x1 AS DECIMAL(38,0))) AS sx1x1,
         sum(CAST(x1 * x2 AS DECIMAL(38,0))) AS sx1x2,
         sum(CAST(x2 * x2 AS DECIMAL(38,0))) AS sx2x2,
         sum(CAST(y AS DECIMAL(38,0))) AS sy,
         sum(CAST(x1 * y AS DECIMAL(38,0))) AS sx1y,
         sum(CAST(x2 * y AS DECIMAL(38,0))) AS sx2y,
         sum(CAST(y * y AS DECIMAL(38,0))) AS syy
  FROM x GROUP BY 1
), tot AS (
  SELECT {', '.join(f'sum({m}) AS {m}' for m in _MOMS)} FROM fm
), tr AS (
  SELECT fm.fold,
         {', '.join(f'CAST(tot.{m} - fm.{m} AS DOUBLE) AS {m}' for m in _MOMS)},
         {', '.join(f'CAST(fm.{m} AS DOUBLE) AS t_{m}' for m in _MOMS)}
  FROM fm CROSS JOIN tot
)"""


def _w_sql() -> str:
    """Per-fold ridge solve on (train Gram + lambda I) — the wave-35
    adjugate, with the regularized entries named m11..m33, v1..v3."""
    return f"""
g AS (
  SELECT fold,
         n + {_LAMBDA!r} AS m11, sx1 AS m12, sx2 AS m13,
         sx1x1 + {_LAMBDA!r} AS m22, sx1x2 AS m23,
         sx2x2 + {_LAMBDA!r} AS m33,
         sy AS v1, sx1y AS v2, sx2y AS v3,
         t_n, t_sy, t_sx1y, t_sx2y, t_syy,
         t_sx1, t_sx2, t_sx1x1, t_sx1x2, t_sx2x2
  FROM tr
), det AS (
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


_RSS = (
    "t_syy - 2 * (w1 * t_sy + w2 * t_sx1y + w3 * t_sx2y)"
    " + (w1 * w1 * t_n + 2 * w1 * w2 * t_sx1 + 2 * w1 * w3 * t_sx2"
    "    + w2 * w2 * t_sx1x1 + 2 * w2 * w3 * t_sx1x2"
    "    + w3 * w3 * t_sx2x2)"
)


@query(
    "kfold_cv_ridge",
    oracle=f"""
WITH {_fold_moments_sql().strip()},
{_w_sql().strip()}
SELECT fold,
       CAST(t_n AS BIGINT) AS n_test,
       round(w1, 6) AS intercept,
       round(w2, 6) AS coef_quantity,
       round(w3, 6) AS coef_retailprice,
       round(sqrt(({_RSS}) / t_n) / 100, 6) AS test_rmse
FROM w
""",
    tags=("crossval", "fitting", "exact-moments"),
)
def kfold_cv_ridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{_N_FOLDS}-fold cross-validation of the ridge regressor with ZERO
    prediction materialization: per-fold exact integer Gram moments,
    training matrices by SUBTRACTION (total - fold), per-fold solves by
    the wave-35 adjugate, and each fold's held-out RMSE from the
    algebraic expansion RSS = y'y - 2 w'X'y + w'X'X w over the fold's
    own moments. Folds come from the house hash of the order key, so
    both engines hold out identical rows.

    Scale shape: ONE fact scan into a {_N_FOLDS}-row moment aggregate;
    everything after is constant driver/oracle algebra — k-fold model
    selection at 100 TB costs exactly one pass."""
    from atlassian_confluence_data_pipeline_spark.operators.skew import (
        spread_scan,
    )

    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    fold = (
        (
            (
                F.lit(_CV_A) * (F.col("l_orderkey") % _CV_MOD)
                + F.lit(_CV_B)
            )
            % _CV_MOD
        )
        % _N_FOLDS
    ).cast("int")
    # ten decimal(38,0) moment sums are BigDecimal-path per-row work; a
    # single-split source serializes them onto one core, so the narrow
    # fact projection is spread first (guide §2.5 — no-op at
    # cluster-scale split counts; the brand_price_regression treatment)
    li = spread_scan(
        li.select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
    )
    x = li.join(
        F.broadcast(
            p.select(F.col("p_partkey").alias("l_partkey"), "p_retailprice")
        ),
        "l_partkey",
    ).select(
        fold.alias("fold"),
        F.round(F.col("l_quantity") * 100).cast("bigint").alias("x1"),
        F.round(F.col("p_retailprice") * 100).cast("bigint").alias("x2"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("y"),
    )

    def dsum(c):
        return F.sum(c.cast("decimal(38,0)"))

    fm = {
        r["fold"]: r
        for r in x.groupBy("fold")
        .agg(
            F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
            dsum(F.col("x1")).alias("sx1"),
            dsum(F.col("x2")).alias("sx2"),
            dsum(F.col("x1") * F.col("x1")).alias("sx1x1"),
            dsum(F.col("x1") * F.col("x2")).alias("sx1x2"),
            dsum(F.col("x2") * F.col("x2")).alias("sx2x2"),
            dsum(F.col("y")).alias("sy"),
            dsum(F.col("x1") * F.col("y")).alias("sx1y"),
            dsum(F.col("x2") * F.col("y")).alias("sx2y"),
            dsum(F.col("y") * F.col("y")).alias("syy"),
        )
        .collect()
    }
    # exact Decimal totals and train moments, cast to double only at
    # the solve boundary (mirrors the oracle's decimal -> double casts)
    tot = {m: sum(fm[f][m] for f in sorted(fm)) for m in _MOMS}
    rows = []
    for f in sorted(fm):
        t = {m: float(fm[f][m]) for m in _MOMS}
        tr = {m: float(tot[m] - fm[f][m]) for m in _MOMS}
        w1, w2, w3 = _solve3(
            (
                tr["n"] + _LAMBDA,
                tr["sx1"],
                tr["sx2"],
                tr["sx1x1"] + _LAMBDA,
                tr["sx1x2"],
                tr["sx2x2"] + _LAMBDA,
            ),
            (tr["sy"], tr["sx1y"], tr["sx2y"]),
        )
        rss = (
            t["syy"]
            - 2 * (w1 * t["sy"] + w2 * t["sx1y"] + w3 * t["sx2y"])
            + (
                w1 * w1 * t["n"]
                + 2 * w1 * w2 * t["sx1"]
                + 2 * w1 * w3 * t["sx2"]
                + w2 * w2 * t["sx1x1"]
                + 2 * w2 * w3 * t["sx1x2"]
                + w3 * w3 * t["sx2x2"]
            )
        )
        import math

        rows.append(
            (f, int(t["n"]), w1, w2, w3, math.sqrt(rss / t["n"]) / 100)
        )
    out = spark.createDataFrame(
        rows,
        "fold int, n_test bigint, wi double, wq double, wr double,"
        " rmse double",
    )
    return out.select(
        "fold",
        "n_test",
        F.round("wi", 6).alias("intercept"),
        F.round("wq", 6).alias("coef_quantity"),
        F.round("wr", 6).alias("coef_retailprice"),
        F.round("rmse", 6).alias("test_rmse"),
    )
