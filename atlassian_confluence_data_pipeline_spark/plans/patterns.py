"""Round-4 wave: classic SQL patterns rounding out the query surface.

- a correlated LATERAL subquery executed through ``spark.sql`` — the
  per-row dependent subquery (top-2 orders PER customer) written the
  way an analyst writes it, decorrelated by Catalyst into a join/window
  plan rather than N subqueries (evidence the SQL surface, not just
  the DataFrame API, is first-class);
- gaps-and-islands: consecutive-day activity streaks per user via the
  date-minus-row-number anchor trick — keyed windows only, no global
  ordering anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.plans.registry import query

LATERAL_SEGMENT = "BUILDING"
LATERAL_K = 2


@query(
    "lateral_top_orders_sql",
    oracle=f"""
SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
FROM customer c, LATERAL (
  SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
  FROM orders
  WHERE o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey
  LIMIT {LATERAL_K}
) o
WHERE c.c_mktsegment = '{LATERAL_SEGMENT}'
""",
    tags=("sql", "lateral", "topk", "join"),
)
def lateral_top_orders_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery through the SQL front-end: each
    {SEG} customer picks its top-{K} orders by price inside a
    dependent subquery — written EXACTLY as in the oracle and handed
    to ``spark.sql``. Catalyst decorrelates the per-row subquery into
    one join + keyed ranking plan (no N-subquery execution), so the
    analyst's phrasing and the engine's hand-built
    ``top_k_per_group`` produce the same physical shape — the SQL
    surface is a first-class citizen, not a wrapper.

    Scale shape: after decorrelation this is a shuffle join on
    custkey + per-key window — identical to top3_orders_per_customer's
    plan geometry."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "pat_customer"
    )
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("pat_orders")
    return spark.sql(
        f"""
SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
FROM pat_customer c, LATERAL (
  SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
  FROM pat_orders
  WHERE o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey
  LIMIT {LATERAL_K}
) o
WHERE c.c_mktsegment = '{LATERAL_SEGMENT}'
"""
    )


@query(
    "purchase_streak_islands",
    oracle="""
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
  FROM events WHERE event_type = 'purchase'
), anchored AS (
  SELECT user_id, d,
         d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
                  AS INT) AS island
  FROM days
), streaks AS (
  SELECT user_id, island, count(*) AS len
  FROM anchored GROUP BY 1, 2
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_streaks,
       CAST(max(len) AS BIGINT) AS longest_streak,
       CAST(sum(len) AS BIGINT) AS active_days
FROM streaks GROUP BY 1
""",
    tags=("window", "islands", "events", "retention"),
)
def purchase_streak_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: per user, runs of CONSECUTIVE purchase days
    (the engagement-streak metric). The island anchor is the classic
    date-minus-row-number trick — consecutive days share
    ``d - row_number()``, so streaks fall out of two keyed hash
    aggregates and one per-user window. No global ordering anywhere;
    every step is partitioned by user_id."""
    ev = load_table(spark, sf_dir, "events")
    days = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", F.to_date("ts").alias("d"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("d")
    anchored = days.select(
        "user_id",
        "d",
        F.date_sub(F.col("d"), F.row_number().over(w)).alias("island"),
    )
    streaks = anchored.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("len")
    )
    return streaks.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_streaks"),
        F.max("len").cast("bigint").alias("longest_streak"),
        F.sum("len").cast("bigint").alias("active_days"),
    )
