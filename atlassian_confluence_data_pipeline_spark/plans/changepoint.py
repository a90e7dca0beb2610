"""Changepoint wave (50): binary-segmentation split of the daily
revenue series.

The first step of every changepoint algorithm (binary segmentation /
CUSUM): scan all n-1 possible split points, score each by the scaled
between-segment variance k(n-k)/n * (mean_left - mean_right)^2, and
return the argmax — "when did the business change", answered exactly
from one prefix pass (every candidate split's statistic is closed-form
arithmetic on the cumulative sums; no per-split scan)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.operators.windows import (
    distributed_prefix_rank,
)
from atlassian_confluence_data_pipeline_spark.plans.registry import query


@query(
    "revenue_changepoint",
    oracle="""
WITH daily AS (
  SELECT date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
           AS dnum,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
           AS cents
  FROM orders GROUP BY 1
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(cents AS DECIMAL(38,0))) AS BIGINT) AS t
  FROM daily
), cum AS (
  SELECT dnum,
         CAST(row_number() OVER (ORDER BY dnum) AS BIGINT) AS k,
         CAST(sum(cents) OVER (ORDER BY dnum ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS s
  FROM daily
), scored AS (
  SELECT dnum, k,
         CAST(s AS DOUBLE) / k AS mean_left,
         CAST(tot.t - s AS DOUBLE) / (tot.n - k) AS mean_right,
         CAST(k AS DOUBLE) * (tot.n - k) / tot.n
           * (CAST(s AS DOUBLE) / k
              - CAST(tot.t - s AS DOUBLE) / (tot.n - k))
           * (CAST(s AS DOUBLE) / k
              - CAST(tot.t - s AS DOUBLE) / (tot.n - k)) AS score
  FROM cum CROSS JOIN tot WHERE k < tot.n
)
SELECT scored.dnum AS split_after_dnum,
       scored.k AS n_days_left,
       round(scored.mean_left / 100, 2) AS mean_left,
       round(scored.mean_right / 100, 2) AS mean_right,
       round(sqrt(scored.score) / 100, 4) AS score_root
FROM scored
ORDER BY scored.score DESC, scored.dnum
LIMIT 1
""",
    tags=("changepoint", "timeseries", "prefix"),
)
def revenue_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most likely changepoint of the daily revenue series by binary
    segmentation: every candidate split's statistic
    k(n-k)/n (mean_l - mean_r)^2 comes from the cumulative sums alone,
    so scanning ALL n-1 splits costs one prefix pass + a TakeOrdered
    argmax — the "did demand shift, and when" monitoring primitive
    (recurse on the halves to find further breaks).

    Scale shape (round-11): day-domain aggregate (exact integer cents,
    CALENDAR-BOUNDED — the daily_revenue_locf discipline), then rank,
    running sum AND series totals as one UNPARTITIONED window chain
    over that bounded domain (measured-bound allowlisted in
    plan_audit) — replacing the prefix pass and its loop-control
    collects; closed-form score projection, TakeOrderedAndProject(1).
    No global sort, no per-candidate rescans."""
    from pyspark.sql.window import Window

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
        # the windowed frame feeds BOTH the argmax and the winner
        # re-select below — one corpus aggregate job, everything after
        # runs over the bounded day domain
        .localCheckpoint(eager=True)
    )
    w_tot = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_incl = Window.orderBy("dnum").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = daily.select(
        "dnum",
        F.row_number().over(Window.orderBy("dnum")).cast("bigint").alias("k"),
        F.sum("cents").over(w_incl).cast("bigint").alias("s"),
        F.count(F.lit(1)).over(w_tot).cast("bigint").alias("n"),
        F.sum(F.col("cents").cast("decimal(38,0)"))
        .over(w_tot)
        .cast("bigint")
        .alias("t"),
    )
    mean_l = F.col("s").cast("double") / F.col("k")
    mean_r = (F.col("t") - F.col("s")).cast("double") / (
        F.col("n") - F.col("k")
    )
    score = (
        F.col("k").cast("double")
        * (F.col("n") - F.col("k"))
        / F.col("n")
        * (mean_l - mean_r)
        * (mean_l - mean_r)
    )
    scored = cum.filter(F.col("k") < F.col("n")).select(
        "dnum", "k", score.alias("score")
    )
    best = scored.orderBy(F.col("score").desc(), "dnum").limit(1)
    # recompute the display columns from (dnum, k, s-free) on the winner
    # row: join back to cum for s is unnecessary — mean_l/mean_r derive
    # from score's own inputs, so re-select them off cum instead
    win = cum.join(best.select("dnum"), "dnum").select(
        F.col("dnum").cast("bigint").alias("split_after_dnum"),
        F.col("k").alias("n_days_left"),
        F.round(mean_l / 100, 2).alias("mean_left"),
        F.round(mean_r / 100, 2).alias("mean_right"),
        # report sqrt(score) in revenue units: the raw score's
        # magnitude (~1e13 cents^2) is beyond where cross-engine
        # round() stays exact
        F.round(F.sqrt(score) / 100, 4).alias("score_root"),
    )
    return win
