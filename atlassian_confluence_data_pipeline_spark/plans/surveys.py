"""Survey-sampling & decomposition wave (40): Horvitz-Thompson
estimation under deterministic Poisson sampling, weekday seasonal
decomposition of the revenue series, and a k-anonymity generalization
step.

Three estimation/protection workflows: the design-unbiased total
estimator with its realized error (the audit every sampled pipeline
owes its consumers), the trend/seasonal/residual split that turns a
daily series into interpretable parts (without any global window —
the centered moving average is an offset self-join), and the
generalize-then-remeasure loop of k-anonymity remediation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.plans.registry import query

#: Poisson sampling: expected fraction and the house hash constants
_SAMPLE_FRAC = 0.2
_HT_MOD = 2_147_483_647
_HT_A = 1_103_515_245
_HT_B = 12_345

#: k-anonymity threshold and the coarsening bucket for the balance QI
_K_ANON = 5
_BAL_BUCKET = 1000  # dollars


@query(
    "horvitz_thompson_audit",
    oracle=f"""
WITH base AS (
  SELECT o_orderkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         CAST((({_HT_A} * (o_orderkey % {_HT_MOD}) + {_HT_B})
               % {_HT_MOD}) AS BIGINT) AS h
  FROM orders
), sampled AS (
  SELECT cents FROM base
  WHERE CAST(h AS DOUBLE) / {_HT_MOD} < {_SAMPLE_FRAC}
), est AS (
  SELECT CAST(count(*) AS BIGINT) AS n_sampled,
         CAST(sum(CAST(cents AS DECIMAL(38,0))) AS DOUBLE)
           / {_SAMPLE_FRAC} AS ht_total_c
  FROM sampled
), truth AS (
  SELECT CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(CAST(cents AS DECIMAL(38,0))) AS DOUBLE) AS true_c
  FROM base
)
SELECT truth.n_rows, est.n_sampled,
       round(truth.true_c / 100, 2) AS true_total,
       round(est.ht_total_c / 100, 2) AS ht_estimate,
       round(abs(est.ht_total_c - truth.true_c) / truth.true_c, 6)
         AS rel_error
FROM est CROSS JOIN truth
""",
    tags=("survey", "sampling", "estimation"),
)
def horvitz_thompson_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Horvitz-Thompson total estimation under Poisson sampling with
    inclusion probability {_SAMPLE_FRAC}: every sampled row is weighted
    by 1/pi, making the estimator design-unbiased — and because the
    full fixture is at hand, the realized relative error is REPORTED
    next to the estimate (the audit a sampled dashboard owes its
    consumers). 'Randomness' is the house affine hash of the order key,
    so both engines draw the identical sample.

    Scale shape: one scan with a narrow hash projection; the sample
    filter pushes to the scan; the estimate and the truth are two exact
    DECIMAL-cent aggregates. At 100 TB the truth side would be the
    expensive one — exactly why the estimator exists."""
    o = load_table(spark, sf_dir, "orders")
    h = (
        F.lit(_HT_A) * (F.col("o_orderkey") % _HT_MOD) + F.lit(_HT_B)
    ) % _HT_MOD
    base = o.select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        h.cast("bigint").alias("h"),
    )
    est = (
        base.filter(F.col("h").cast("double") / _HT_MOD < _SAMPLE_FRAC)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sampled"),
            (
                F.sum(F.col("cents").cast("decimal(38,0)")).cast("double")
                / _SAMPLE_FRAC
            ).alias("ht_total_c"),
        )
        .first()
    )
    truth = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.col("cents").cast("decimal(38,0)"))
        .cast("double")
        .alias("true_c"),
    ).first()
    return spark.range(1).select(
        F.lit(truth["n_rows"]).cast("bigint").alias("n_rows"),
        F.lit(est["n_sampled"]).cast("bigint").alias("n_sampled"),
        F.round(F.lit(truth["true_c"]) / 100, 2).alias("true_total"),
        F.round(F.lit(est["ht_total_c"]) / 100, 2).alias("ht_estimate"),
        F.round(
            F.abs(F.lit(est["ht_total_c"]) - F.lit(truth["true_c"]))
            / F.lit(truth["true_c"]),
            6,
        ).alias("rel_error"),
    )


@query(
    "weekly_decomposition_revenue",
    oracle="""
WITH daily AS (
  SELECT date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
           AS dnum,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
           AS cents
  FROM orders GROUP BY 1
), trend AS (
  SELECT a.dnum, a.cents,
         CAST(count(b.cents) AS BIGINT) AS n_win,
         CAST(sum(CAST(b.cents AS DECIMAL(38,0))) AS DOUBLE)
           / count(b.cents) AS trend_c
  FROM daily a
  JOIN daily b ON b.dnum BETWEEN a.dnum - 3 AND a.dnum + 3
  GROUP BY 1, 2 HAVING count(b.cents) = 7
), detr AS (
  SELECT dnum, cents, trend_c,
         round(cents - trend_c, 9) AS resid0,
         dnum % 7 AS dow
  FROM trend
), seas AS (
  SELECT dow,
         CAST(sum(CAST(resid0 AS DECIMAL(38,12))) AS DOUBLE) / count(*)
           AS seasonal_c
  FROM detr GROUP BY 1
)
SELECT seas.dow,
       CAST(count(*) AS BIGINT) AS n_days,
       round(seas.seasonal_c / 100, 4) AS seasonal,
       round(sqrt(CAST(sum(CAST(round(
           (detr.resid0 - seas.seasonal_c)
           * (detr.resid0 - seas.seasonal_c), 6)
         AS DECIMAL(38,12))) AS DOUBLE) / count(*)) / 100, 4)
         AS residual_std
FROM detr JOIN seas USING (dow)
GROUP BY 1, 3
""",
    tags=("survey", "timeseries", "decomposition"),
)
def weekly_decomposition_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Classical trend/seasonal/residual decomposition of daily revenue
    at the weekly period: trend = centered 7-day moving average,
    seasonal = day-of-week mean of the detrended series, residual
    STD per weekday (reported as a standard deviation in revenue
    units — variances at corpus scale exceed the magnitude where
    cross-engine round() stays exact) — the readout that separates "weekends are
    slow" (seasonal) from "demand is drifting" (trend) from noise.

    Scale shape: the corpus collapses to the calendar-bounded day
    series; the centered moving average is an OFFSET RANGE SELF-JOIN
    (dnum +/- 3) over that bounded frame — no global window, no sort;
    the seasonal/residual rollups are 7-row aggregates with 9/6-rounded
    DECIMAL sums."""
    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.groupBy(
            F.datediff(F.to_date("o_orderdate"), F.lit("1992-01-01")).alias(
                "dnum"
            )
        )
        .agg(
            (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("bigint")
            .alias("cents")
        )
        .localCheckpoint(eager=True)
    )
    b = daily.select(
        F.col("dnum").alias("bdnum"), F.col("cents").alias("bcents")
    )
    # centered 7-day window as an EQUI-join: each day explodes to its 7
    # window keys (narrow), then joins the day frame by key — no
    # non-equi band join anywhere
    fan = daily.select(
        "dnum",
        "cents",
        F.explode(F.array(*[F.lit(i) for i in range(-3, 4)])).alias("off"),
    ).withColumn("bdnum", F.col("dnum") + F.col("off"))
    trend = (
        fan.join(b, "bdnum")
        .groupBy("dnum", "cents")
        .agg(
            F.count("bcents").cast("bigint").alias("n_win"),
            (
                F.sum(F.col("bcents").cast("decimal(38,0)")).cast("double")
                / F.count("bcents")
            ).alias("trend_c"),
        )
        .filter(F.col("n_win") == 7)
    )
    detr = trend.select(
        "dnum",
        F.round(F.col("cents") - F.col("trend_c"), 9).alias("resid0"),
        (F.col("dnum") % 7).alias("dow"),
    ).localCheckpoint(eager=True)
    seas = detr.groupBy("dow").agg(
        (
            F.sum(F.col("resid0").cast("decimal(38,12)")).cast("double")
            / F.count(F.lit(1))
        ).alias("seasonal_c")
    )
    jd = detr.join(F.broadcast(seas), "dow")
    dev = F.col("resid0") - F.col("seasonal_c")
    return jd.groupBy("dow", "seasonal_c").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.round(
            F.sqrt(
                F.sum(F.round(dev * dev, 6).cast("decimal(38,12)"))
                .cast("double")
                / F.count(F.lit(1))
            )
            / 100,
            4,
        ).alias("residual_std"),
    ).select(
        F.col("dow").cast("bigint").alias("dow"),
        "n_days",
        F.round(F.col("seasonal_c") / 100, 4).alias("seasonal"),
        "residual_std",
    )


@query(
    "k_anon_generalization_step",
    oracle=f"""
WITH fine AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(floor(c_acctbal / 100) AS BIGINT) AS bal_fine,
         CAST(floor(c_acctbal / {_BAL_BUCKET}) AS BIGINT) AS bal_coarse
  FROM customer
), gfine AS (
  SELECT count(*) AS c FROM fine
  GROUP BY c_nationkey, c_mktsegment, bal_fine
), gcoarse AS (
  SELECT count(*) AS c FROM fine
  GROUP BY c_nationkey, c_mktsegment, bal_coarse
), tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM fine)
SELECT tot.n AS n_rows,
       (SELECT CAST(count(*) AS BIGINT) FROM gfine) AS fine_groups,
       (SELECT CAST(sum(CASE WHEN c < {_K_ANON} THEN c ELSE 0 END)
                    AS BIGINT) FROM gfine) AS fine_rows_at_risk,
       (SELECT CAST(count(*) AS BIGINT) FROM gcoarse) AS coarse_groups,
       (SELECT CAST(sum(CASE WHEN c < {_K_ANON} THEN c ELSE 0 END)
                    AS BIGINT) FROM gcoarse) AS coarse_rows_at_risk,
       round((SELECT CAST(sum(CASE WHEN c < {_K_ANON} THEN c ELSE 0 END)
                          AS DOUBLE) FROM gcoarse) / tot.n, 6)
         AS coarse_risk_share
FROM tot
""",
    tags=("survey", "privacy", "governance"),
)
def k_anon_generalization_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One generalization step of k-anonymity remediation: measure
    re-identification risk (rows in quasi-identifier groups smaller
    than k={_K_ANON}) under the FINE balance bucketing ($100), then
    under the COARSENED bucketing (${_BAL_BUCKET}) — the
    generalize-then-remeasure loop an anonymization pipeline iterates
    until risk clears, reported as one before/after row.

    Scale shape: two hash aggregates over the same scan (fine and
    coarse QI groups), scalar rollups — risk measurement never needs
    the rows themselves, only group cardinalities."""
    c = load_table(spark, sf_dir, "customer")
    fine = c.select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 100).cast("bigint").alias("bal_fine"),
        F.floor(F.col("c_acctbal") / _BAL_BUCKET)
        .cast("bigint")
        .alias("bal_coarse"),
    ).localCheckpoint(eager=True)
    n = fine.count()

    def risk(col: str):
        g = fine.groupBy("c_nationkey", "c_mktsegment", col).agg(
            F.count(F.lit(1)).alias("c")
        )
        row = g.agg(
            F.count(F.lit(1)).cast("bigint").alias("groups"),
            F.sum(F.when(F.col("c") < _K_ANON, F.col("c")).otherwise(0))
            .cast("bigint")
            .alias("at_risk"),
        ).first()
        return row["groups"], row["at_risk"]

    fg, fr = risk("bal_fine")
    cg, cr = risk("bal_coarse")
    return spark.range(1).select(
        F.lit(n).cast("bigint").alias("n_rows"),
        F.lit(fg).cast("bigint").alias("fine_groups"),
        F.lit(fr).cast("bigint").alias("fine_rows_at_risk"),
        F.lit(cg).cast("bigint").alias("coarse_groups"),
        F.lit(cr).cast("bigint").alias("coarse_rows_at_risk"),
        F.round(F.lit(cr).cast("double") / F.lit(n), 6).alias(
            "coarse_risk_share"
        ),
    )
