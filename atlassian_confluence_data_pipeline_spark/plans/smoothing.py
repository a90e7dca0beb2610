"""Exponential-smoothing time series (round-6 wave): EWMA and Holt
linear-trend smoothing of daily revenue.

A sequential recurrence looks engine-hostile, but the day domain is
BOUNDED (calendar span, not corpus size): corpus-sized work is one exact
integer-cents aggregate to the day table, after which both engines fold
the ~2.4k-day sequence left-to-right — Spark with an `aggregate`
(scan-with-array-accumulator over the sorted day list, one task over
loop-control-scale data), DuckDB with a recursive CTE replaying the
identical double ops — so every smoothed value is bit-identical before
the display round (which is 4dp: the series sits at ~1e6, and the
PLANS.md magnitude rule forbids rounding a double past ~12 significant
digits).

Reference parity note: the reference pipeline (`/root/reference`) has no
time-series analytics; driver-mandate extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.plans.registry import query

#: smoothing constants — per-run config, shared verbatim with the oracles
EWMA_ALPHA = 0.2
HOLT_ALPHA = 0.2
HOLT_BETA = 0.1

_DAILY_SQL = """
daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
           AS cents
  FROM orders GROUP BY 1
),
arr AS (
  SELECT list(struct_pack(day := day, x := CAST(cents AS DOUBLE) / 100)
              ORDER BY day) AS l
  FROM daily
)"""


def _daily_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row holding the day-ordered (day, x=dollars) list — exact
    integer cents first, the /100 double division shared with the
    oracle."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("bigint")
        .alias("cents")
    )
    return daily.select(
        F.struct(
            F.col("day"), (F.col("cents").cast("double") / 100).alias("x")
        ).alias("s")
    ).agg(F.sort_array(F.collect_list("s")).alias("xs"))


@query(
    "ewma_daily_revenue",
    oracle=f"""
WITH RECURSIVE {_DAILY_SQL},
rec AS (
  SELECT 1 AS i, l[1].x AS e FROM arr
  UNION ALL
  SELECT i + 1, CAST('{EWMA_ALPHA!r}' AS DOUBLE) * l[i + 1].x + CAST('{1 - EWMA_ALPHA!r}' AS DOUBLE) * e
  FROM rec, arr WHERE i < len(l)
)
SELECT strftime(l[i].day, '%Y-%m-%d') AS day, round(l[i].x, 2) AS revenue, round(e, 4) AS ewma
FROM rec, arr
""",
    tags=("timeseries", "smoothing", "iterative"),
)
def ewma_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average of daily revenue
    (alpha = {a}), seeded at the first day's value — the standard
    monitoring smoother (the drift baselines CUSUM/alerting compare
    against).

    Scale shape: corpus work is the exact-cents day aggregate; the
    recurrence runs as ONE `aggregate` scan over the sorted ~2.4k-day
    list (bounded by calendar span, the daily_revenue_locf class) with
    a (state, out-array) struct accumulator — no window, no join, no
    driver loop. The oracle's recursive CTE replays the identical
    `a*x + (1-a)*e` double ops in the identical order."""
    xs = _daily_sorted(spark, sf_dir)
    acc0 = F.struct(
        F.lit(0.0).alias("e"),
        F.array().cast("array<struct<day:date,x:double,e:double>>").alias(
            "out"
        ),
    )

    def step(acc, s):
        e = F.when(F.size(acc["out"]) == 0, s["x"]).otherwise(
            F.lit(EWMA_ALPHA) * s["x"] + F.lit(1 - EWMA_ALPHA) * acc["e"]
        )
        return F.struct(
            e.alias("e"),
            F.concat(
                acc["out"],
                F.array(
                    F.struct(
                        s["day"].alias("day"), s["x"].alias("x"), e.alias("e")
                    )
                ),
            ).alias("out"),
        )

    folded = xs.select(
        F.explode(
            F.aggregate(F.col("xs"), acc0, step, lambda acc: acc["out"])
        ).alias("r")
    )
    return folded.select(
        F.date_format("r.day", "yyyy-MM-dd").alias("day"),
        F.round("r.x", 2).alias("revenue"),
        F.round("r.e", 4).alias("ewma"),
    )


@query(
    "holt_trend_daily_revenue",
    oracle=f"""
WITH RECURSIVE {_DAILY_SQL},
rec AS (
  SELECT 1 AS i, l[1].x AS lv, CAST(0.0 AS DOUBLE) AS b FROM arr
  UNION ALL
  SELECT i + 1,
         CAST('{HOLT_ALPHA!r}' AS DOUBLE) * l[i + 1].x + CAST('{1 - HOLT_ALPHA!r}' AS DOUBLE) * (lv + b),
         CAST('{HOLT_BETA!r}' AS DOUBLE) * ((CAST('{HOLT_ALPHA!r}' AS DOUBLE) * l[i + 1].x
                          + CAST('{1 - HOLT_ALPHA!r}' AS DOUBLE) * (lv + b)) - lv)
           + CAST('{1 - HOLT_BETA!r}' AS DOUBLE) * b
  FROM rec, arr WHERE i < len(l)
)
SELECT strftime(l[i].day, '%Y-%m-%d') AS day, round(lv, 4) AS level, round(b, 4) AS trend
FROM rec, arr
""",
    tags=("timeseries", "smoothing", "iterative"),
)
def holt_trend_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear-trend double smoothing of daily revenue
    (alpha = {a}, beta = {b}): level tracks the smoothed series, trend
    tracks its smoothed first difference — the two-line forecasting
    baseline. Same single-scan fold shape as ewma_daily_revenue; the
    oracle recursion computes the new level TWICE textually (DuckDB
    recursive CTEs cannot reference a same-row alias), and the engine's
    fold mirrors those exact ops so the doubles stay bit-identical."""
    xs = _daily_sorted(spark, sf_dir)
    acc0 = F.struct(
        F.lit(0.0).alias("lv"),
        F.lit(0.0).alias("b"),
        F.array()
        .cast("array<struct<day:date,lv:double,b:double>>")
        .alias("out"),
    )

    def step(acc, s):
        first = F.size(acc["out"]) == 0
        new_lv_expr = F.lit(HOLT_ALPHA) * s["x"] + F.lit(1 - HOLT_ALPHA) * (
            acc["lv"] + acc["b"]
        )
        lv = F.when(first, s["x"]).otherwise(new_lv_expr)
        b = F.when(first, F.lit(0.0)).otherwise(
            F.lit(HOLT_BETA) * (new_lv_expr - acc["lv"])
            + F.lit(1 - HOLT_BETA) * acc["b"]
        )
        return F.struct(
            lv.alias("lv"),
            b.alias("b"),
            F.concat(
                acc["out"],
                F.array(
                    F.struct(
                        s["day"].alias("day"), lv.alias("lv"), b.alias("b")
                    )
                ),
            ).alias("out"),
        )

    folded = xs.select(
        F.explode(
            F.aggregate(F.col("xs"), acc0, step, lambda acc: acc["out"])
        ).alias("r")
    )
    return folded.select(
        F.date_format("r.day", "yyyy-MM-dd").alias("day"),
        F.round("r.lv", 4).alias("level"),
        F.round("r.b", 4).alias("trend"),
    )
