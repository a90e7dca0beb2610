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


@query(
    "null_safe_join_regions",
    oracle="""
WITH l AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 7 = 0 THEN NULL
              ELSE CAST(o_orderkey % 5 AS INT) END AS bucket
  FROM orders
), r AS (
  SELECT CASE WHEN v = 5 THEN NULL ELSE CAST(v AS INT) END AS bucket,
         concat('grp_', CAST(v AS VARCHAR)) AS label
  FROM (SELECT unnest(range(0, 6)) AS v)
)
SELECT r.label, CAST(count(l.o_orderkey) AS BIGINT) AS n_orders
FROM l JOIN r ON l.bucket IS NOT DISTINCT FROM r.bucket
GROUP BY 1
""",
    tags=("join", "nullsafe", "sql"),
)
def null_safe_join_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-SAFE equi-join (`<=>` / IS NOT DISTINCT FROM): orders carry
    a nullable derived bucket (every 7th key is NULL — the
    missing-attribute case), the tiny label dim carries a NULL bucket
    too, and the join matches NULL with NULL — the semantics a plain
    equi-join silently drops. Spark's `eqNullSafe` keeps this a real
    HASH join (null-safe equality is still an equi-key after
    null-bucketing), not a nested loop.

    Scale shape: broadcast 6-row dim onto the fact projection, one
    grouped count — null rows hash to the null bucket like any other
    key."""
    o = load_table(spark, sf_dir, "orders")
    left = o.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 7 == 0, None)
        .otherwise((F.col("o_orderkey") % 5).cast("int"))
        .alias("bucket"),
    )
    right = spark.createDataFrame(
        [(None if v == 5 else v, f"grp_{v}") for v in range(6)],
        "bucket int, label string",
    )
    return (
        left.join(
            F.broadcast(right), left["bucket"].eqNullSafe(right["bucket"])
        )
        .groupBy("label")
        .agg(F.count("o_orderkey").cast("bigint").alias("n_orders"))
    )


@query(
    "order_rank_distribution",
    oracle="""
SELECT o_orderkey, o_orderpriority,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume,
       CAST(ntile(4) OVER w AS INT) AS quartile,
       round(nth_value(o_totalprice, 1) OVER
             (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
         AS group_min_price
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority
             ORDER BY o_totalprice, o_orderkey)
""",
    tags=("window", "rank", "distribution"),
)
def order_rank_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining analytic-rank family in one query: percent_rank,
    cume_dist, ntile(4), and nth_value over per-priority price order —
    the distribution coordinates a pricing report assigns every order.
    All four are KEYED windows (partitioned by priority); ranks are
    integer-derived so the rounded ratios are bit-stable; the total
    order (price, key) pins ties."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.round(F.nth_value("o_totalprice", 1).over(wf), 2).alias(
            "group_min_price"
        ),
    )
