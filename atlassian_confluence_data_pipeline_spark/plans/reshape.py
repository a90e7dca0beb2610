"""Reshaping & generation queries: date spines (sequence explode),
unpivot/melt, and value-bucket histograms — the remaining DataFrame
surface the other modules don't touch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.plans.registry import query


@query(
    "order_month_spine",
    oracle="""
SELECT o_orderkey,
       unnest(generate_series(date_trunc('month', o_orderdate),
                              date_trunc('month', o_orderdate) + INTERVAL 3 MONTH,
                              INTERVAL 1 MONTH)) AS month_point
FROM orders WHERE o_custkey < 20
""",
    tags=("generate", "explode", "date"),
)
def order_month_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp-spine generation: per order, the 4 monthly points from
    the order's month start through +3 months — `sequence(start, stop,
    interval)` + explode, executor-side (no driver date loop). Anchored
    at month START: month addition from a day-29+ anchor clamps
    differently across engines (Spark computes start + k*interval;
    DuckDB steps iteratively, so Jan 31 -> Feb 28 -> Mar 28 vs Mar 31)."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 20)
    base = F.date_trunc("month", F.col("o_orderdate"))
    spine = F.sequence(
        base,
        base + F.expr("INTERVAL 3 MONTH"),
        F.expr("INTERVAL 1 MONTH"),
    )
    return orders.select(
        "o_orderkey", F.explode(spine).alias("month_point")
    )


@query(
    "unpivot_status_counts",
    oracle="""
WITH wide AS (
  SELECT o_orderpriority,
         CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS status_O,
         CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS status_F,
         CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS status_P
  FROM orders GROUP BY 1
)
SELECT o_orderpriority, status, n_orders
FROM wide
UNPIVOT (n_orders FOR status IN (status_O AS 'O', status_F AS 'F', status_P AS 'P'))
""",
    tags=("reshape", "unpivot"),
)
def unpivot_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt: wide per-status count columns back to long form —
    the inverse of pivot, executed as an Expand (no shuffle beyond the
    first aggregation)."""
    orders = load_table(spark, sf_dir, "orders")
    wide = orders.groupBy("o_orderpriority").agg(
        *[
            F.sum(F.when(F.col("o_orderstatus") == s, 1).otherwise(0))
            .cast("bigint")
            .alias(f"status_{s}")
            for s in ("O", "F", "P")
        ]
    )
    return wide.unpivot(
        ["o_orderpriority"],
        ["status_O", "status_F", "status_P"],
        "status",
        "n_orders",
    ).withColumn("status", F.replace(F.col("status"), F.lit("status_"), F.lit("")))


@query(
    "price_histogram",
    oracle="""
SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
       CAST(floor(o_totalprice / 50000) AS BIGINT) * 50000 AS bucket_low,
       count(*) AS n_orders
FROM orders
GROUP BY 1, 2
""",
    tags=("agg", "histogram", "binning"),
)
def price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram binning on order value: floor-divide to a
    bucket id — one HashAggregate, bucket count independent of input
    size."""
    orders = load_table(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / 50000).cast("bigint")
    return (
        orders.groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .select(
            "bucket", (F.col("bucket") * 50000).alias("bucket_low"), "n_orders"
        )
    )
