"""Fifteenth-wave monitoring / experimentation operators.

- CUSUM drift detection over the daily revenue series — the
  change-point monitor a pipeline runs over its own output metrics.
  The cumulative deviation is computed CLOSED-FORM (cum_t - t * S/n
  from DECIMAL-exact prefix sums) instead of accumulating doubles, so
  no running float state exists anywhere and every point is
  bit-identical cross-engine.
- A two-sample z-test over a deterministic hash-split (A/B) of click
  values — the experimentation readout, from the same DECIMAL-exact
  mergeable moments as the regression/outlier family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.functions.text import ROLLING_MOD
from atlassian_confluence_data_pipeline_spark.operators.lsh import MINHASH_PERMS
from atlassian_confluence_data_pipeline_spark.operators.windows import (
    distributed_prefix_rank,
)
from atlassian_confluence_data_pipeline_spark.plans.registry import query

#: CUSUM control limit in daily-revenue sigmas
CUSUM_H_SIGMA = 3.0

#: A/B split: affine perm + the event type under test
AB_PERM = MINHASH_PERMS[52]
AB_EVENT_TYPE = "click"
AB_Z_CRIT = 1.96

_DEC = "DECIMAL(18,6)"


@query(
    "cusum_drift_daily_revenue",
    oracle=f"""
WITH daily AS (
  SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
         CAST(sum(CAST(o_totalprice AS {_DEC})) AS DOUBLE) AS rev
  FROM orders GROUP BY 1
), st AS (
  SELECT count(*) AS n,
         CAST(sum(CAST(rev AS {_DEC})) AS DOUBLE) AS s1,
         CAST(sum(CAST(rev * rev AS DECIMAL(38,6))) AS DOUBLE) AS s2
  FROM (
    SELECT CAST(sum(CAST(o_totalprice AS {_DEC})) AS DOUBLE) AS rev
    FROM orders GROUP BY strftime(o_orderdate, '%Y-%m-%d')
  )
), cum AS (
  SELECT day, rev,
         CAST(sum(CAST(rev AS {_DEC})) OVER (ORDER BY day) AS DOUBLE) AS c,
         CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t
  FROM daily
)
SELECT cum.day, round(cum.rev, 2) AS revenue,
       round(cum.c - cum.t * st.s1 / st.n, 4) AS cusum,
       CAST(CASE WHEN abs(cum.c - cum.t * st.s1 / st.n)
                 > {CUSUM_H_SIGMA} * sqrt((st.s2 - st.s1 * st.s1 / st.n)
                                          / (st.n - 1))
            THEN 1 ELSE 0 END AS INT) AS drift_flag
FROM cum CROSS JOIN st
""",
    tags=("monitoring", "timeseries", "drift"),
)
def cusum_drift_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point monitoring of daily revenue: the cumulative
    deviation from the series mean, flagged where it leaves a
    +-{H}-sigma control band — the drift detector a production
    pipeline points at its own output metrics (the monitoring analog
    of the reference's per-run counters). The cumulative deviation is
    CLOSED-FORM — cum_t - t * mean from a DECIMAL-exact running prefix
    sum — so no double ever accumulates sequentially and every point
    is bit-identical cross-engine; sigma comes from the same
    DECIMAL-exact moment discipline as the z-score family.

    Scale shape (round-11): one hash aggregate to the CALENDAR-BOUNDED
    day domain (<= the corpus time span in days at any corpus size —
    the daily_revenue_locf discipline), then the running DECIMAL sum,
    the rank AND the global moments all as one UNPARTITIONED window
    chain over that bounded domain (measured-bound allowlisted in
    plan_audit) — replacing the per-build checkpoint, the prefix pass
    (sampling job + checkpoint + totals collect) and the moment cross
    join with ONE lazy plan. Day ordering is by epoch-day number —
    identical to the lexical yyyy-MM-dd order the oracle uses."""
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.col("o_orderdate").alias("d"))
        .agg(
            F.sum(F.col("o_totalprice").cast(_DEC))
            .cast("double")
            .alias("rev")
        )
        .withColumn("dnum", F.datediff(F.col("d"), F.lit("1970-01-01")))
        .withColumn("rev_dec", F.col("rev").cast(_DEC))
    )
    w_tot = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_incl = Window.orderBy("dnum").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = daily.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "rev",
        F.sum("rev_dec").over(w_incl).cast("double").alias("c"),
        F.row_number().over(Window.orderBy("dnum")).cast("bigint").alias("t"),
        F.count(F.lit(1)).over(w_tot).alias("n"),
        F.sum("rev_dec").over(w_tot).cast("double").alias("s1"),
        F.sum((F.col("rev") * F.col("rev")).cast("decimal(38,6)"))
        .over(w_tot)
        .cast("double")
        .alias("s2"),
    )
    dev = F.col("c") - F.col("t") * F.col("s1") / F.col("n")
    sigma = F.sqrt(
        (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
        / (F.col("n") - 1)
    )
    return cum.select(
        "day",
        F.round("rev", 2).alias("revenue"),
        F.round(dev, 4).alias("cusum"),
        F.when(F.abs(dev) > CUSUM_H_SIGMA * sigma, 1)
        .otherwise(0)
        .cast("int")
        .alias("drift_flag"),
    )


@query(
    "ab_test_value_ztest",
    oracle=f"""
WITH assigned AS (
  SELECT CAST((({AB_PERM[0]} * (user_id % {ROLLING_MOD}) + {AB_PERM[1]})
               % {ROLLING_MOD}) % 2 AS INT) AS variant,
         value
  FROM events WHERE event_type = '{AB_EVENT_TYPE}'
), m AS (
  SELECT variant, count(*) AS n,
         CAST(sum(CAST(value AS {_DEC})) AS DOUBLE) AS s1,
         CAST(sum(CAST(value * value AS DECIMAL(38,6))) AS DOUBLE) AS s2
  FROM assigned GROUP BY 1
), sides AS (
  SELECT
    (SELECT n FROM m WHERE variant = 0) AS n0,
    (SELECT n FROM m WHERE variant = 1) AS n1,
    (SELECT s1 FROM m WHERE variant = 0) AS a0,
    (SELECT s1 FROM m WHERE variant = 1) AS a1,
    (SELECT s2 FROM m WHERE variant = 0) AS q0,
    (SELECT s2 FROM m WHERE variant = 1) AS q1
)
SELECT CAST(n0 AS BIGINT) AS n_control, CAST(n1 AS BIGINT) AS n_treatment,
       round(a0 / n0, 6) AS mean_control,
       round(a1 / n1, 6) AS mean_treatment,
       round((a1 / n1 - a0 / n0)
             / sqrt(((q1 - a1 * a1 / n1) / (n1 - 1)) / n1
                    + ((q0 - a0 * a0 / n0) / (n0 - 1)) / n0), 4) AS z_stat,
       CAST(CASE WHEN abs((a1 / n1 - a0 / n0)
             / sqrt(((q1 - a1 * a1 / n1) / (n1 - 1)) / n1
                    + ((q0 - a0 * a0 / n0) / (n0 - 1)) / n0))
                 > {AB_Z_CRIT} THEN 1 ELSE 0 END AS INT) AS significant
FROM sides
""",
    tags=("monitoring", "abtest", "stats"),
)
def ab_test_value_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Welch z-test over a deterministic hash-split A/B
    assignment of click values — the experimentation readout: variant
    from the house affine hash of user_id (reduced below 2^31 first —
    the overflow discipline), per-variant DECIMAL-exact moments, and
    the z statistic with its 5%-level significance flag. A null
    experiment by construction, so the flag doubles as an A/A sanity
    check on the whole stats path.

    Scale shape: one scan, one 2-row hash aggregate, constant final
    math — the assignment is a narrow projection (no shuffle of the
    fact stream beyond the 2-group aggregate)."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == AB_EVENT_TYPE
    )
    a, b = AB_PERM
    variant = (
        ((F.lit(a) * (F.col("user_id") % ROLLING_MOD) + F.lit(b)) % ROLLING_MOD)
        % 2
    ).cast("int")
    m = ev.select(variant.alias("variant"), "value").groupBy("variant").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast(_DEC)).cast("double").alias("s1"),
        F.sum((F.col("value") * F.col("value")).cast("decimal(38,6)"))
        .cast("double")
        .alias("s2"),
    )
    m0 = m.filter(F.col("variant") == 0).select(
        F.col("n").alias("n0"), F.col("s1").alias("a0"), F.col("s2").alias("q0")
    )
    m1 = m.filter(F.col("variant") == 1).select(
        F.col("n").alias("n1"), F.col("s1").alias("a1"), F.col("s2").alias("q1")
    )
    j = m0.crossJoin(m1)
    mean0 = F.col("a0") / F.col("n0")
    mean1 = F.col("a1") / F.col("n1")
    var0 = (F.col("q0") - F.col("a0") * F.col("a0") / F.col("n0")) / (
        F.col("n0") - 1
    )
    var1 = (F.col("q1") - F.col("a1") * F.col("a1") / F.col("n1")) / (
        F.col("n1") - 1
    )
    z = (mean1 - mean0) / F.sqrt(var1 / F.col("n1") + var0 / F.col("n0"))
    return j.select(
        F.col("n0").cast("bigint").alias("n_control"),
        F.col("n1").cast("bigint").alias("n_treatment"),
        F.round(mean0, 6).alias("mean_control"),
        F.round(mean1, 6).alias("mean_treatment"),
        F.round(z, 4).alias("z_stat"),
        F.when(F.abs(z) > AB_Z_CRIT, 1).otherwise(0).cast("int").alias(
            "significant"
        ),
    )
