"""Systems-engineering wave (23): bitmap activity indexes, sequence
pattern classification, and calendar-spine gap filling.

Three shapes every warehouse eventually needs: bitmaps turn per-entity
presence sets into single integers (set algebra becomes bitwise AND/OR
— the roaring-bitmap idea at engine level), sequence classification is
the MATCH_RECOGNIZE-style funnel reading of event streams, and the
date spine + last-observation-carried-forward fill is how ragged daily
series become dense inputs for forecasting (forecast_revenue_change,
acf_daily_revenue).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.plans.registry import query

_DEC = "decimal(18,6)"

#: bitmask of days 1-7 (bits 1..7) and days 22-28 (bits 22..28)
_WEEK1_MASK = sum(1 << d for d in range(1, 8))
_WEEK4_MASK = sum(1 << d for d in range(22, 29))


@query(
    "daily_activity_bitmaps",
    oracle=f"""
WITH b AS (
  SELECT user_id,
         strftime(ts, '%Y-%m') AS month,
         bit_or(CAST(1 AS BIGINT) << date_part('day', ts)) AS day_bitmap
  FROM events
  GROUP BY 1, 2
)
SELECT user_id, month, day_bitmap,
       CAST(bit_count(day_bitmap) AS INT) AS active_days,
       CAST(CASE WHEN (day_bitmap & {_WEEK1_MASK}) <> 0
                 THEN 1 ELSE 0 END AS INT) AS active_week1,
       CAST(CASE WHEN (day_bitmap & {_WEEK4_MASK}) <> 0
                 THEN 1 ELSE 0 END AS INT) AS active_week4,
       CAST(CASE WHEN (day_bitmap & {_WEEK1_MASK}) <> 0
                  AND (day_bitmap & {_WEEK4_MASK}) <> 0
                 THEN 1 ELSE 0 END AS INT) AS retained_w1_to_w4
FROM b
""",
    tags=("systems", "bitmap", "events"),
)
def daily_activity_bitmaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user monthly activity BITMAP: bit d set iff the user was
    active on day-of-month d — one bigint per (user, month) replacing a
    set of dates, after which retention questions are bitwise algebra
    (active in week 1 AND week 4 = two mask tests, no joins). This is
    the roaring-bitmap/index idea expressed with the engine's integer
    bitwise aggregates; distinct-day counts fall out of bit_count.

    Scale shape: ONE hash aggregate on (user, month) with a map-side
    bit_or combine (bitwise OR is associative/commutative — partials
    merge exactly); masks are compile-time literals. All integers —
    cross-engine bit-identical."""
    ev = load_table(spark, sf_dir, "events")
    b = ev.groupBy(
        "user_id", F.date_format("ts", "yyyy-MM").alias("month")
    ).agg(
        F.expr(
            "bit_or(shiftleft(CAST(1 AS BIGINT), CAST(day(ts) AS INT)))"
        ).alias("day_bitmap")
    )
    w1 = F.col("day_bitmap").bitwiseAND(F.lit(_WEEK1_MASK)) != 0
    w4 = F.col("day_bitmap").bitwiseAND(F.lit(_WEEK4_MASK)) != 0
    return b.select(
        "user_id",
        "month",
        "day_bitmap",
        F.bit_count("day_bitmap").cast("int").alias("active_days"),
        w1.cast("int").alias("active_week1"),
        w4.cast("int").alias("active_week4"),
        (w1 & w4).cast("int").alias("retained_w1_to_w4"),
    )


@query(
    "session_funnel_patterns",
    oracle="""
WITH s AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
           AS seq
  FROM events GROUP BY 1, 2
), c AS (
  SELECT CASE WHEN regexp_matches(seq, 'v.*p') THEN 'converted'
              WHEN regexp_matches(seq, 'p') THEN 'blind_purchase'
              WHEN regexp_matches(seq, 'v') THEN 'browsed'
              WHEN regexp_matches(seq, 'e') THEN 'errored'
              ELSE 'other' END AS category,
         len(seq) AS n_events
  FROM s
), t AS (SELECT count(*) AS total FROM c)
SELECT category,
       count(*) AS n_sessions,
       round(CAST(count(*) AS DOUBLE) / max(total), 6) AS share,
       round(CAST(sum(n_events) AS DOUBLE) / count(*), 4) AS avg_events
FROM c CROSS JOIN t
GROUP BY 1
""",
    tags=("systems", "funnel", "pattern", "events"),
)
def session_funnel_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style funnel classification: each (user, day)
    session becomes a symbol string (first letter of each event type in
    timestamp order) and a regex taxonomy classifies it — 'view then
    later purchase' = converted, purchase with no view = blind, etc.
    Row-pattern recognition without the SQL:2016 clause (which Spark
    lacks): the sequence materializes per key, then ordinary regex
    runs on it.

    Scale shape: one hash aggregate per (user, day) building the
    symbol string via array_sort(collect_list(struct(ts, event_id,
    sym))) — the struct sort makes collect_list's arrival order
    irrelevant, and session strings are bounded by per-day activity,
    not corpus size; classification is a narrow projection; the final
    rollup is <= 5 rows."""
    ev = load_table(spark, sf_dir, "events")
    s = (
        ev.groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("ts"),
                        F.col("event_id"),
                        F.substring("event_type", 1, 1).alias("sym"),
                    )
                )
            ).alias("evs")
        )
        .select(
            F.concat_ws(
                "", F.transform(F.col("evs"), lambda x: x["sym"])
            ).alias("seq")
        )
    )
    c = s.select(
        F.when(F.col("seq").rlike("v.*p"), F.lit("converted"))
        .when(F.col("seq").rlike("p"), F.lit("blind_purchase"))
        .when(F.col("seq").rlike("v"), F.lit("browsed"))
        .when(F.col("seq").rlike("e"), F.lit("errored"))
        .otherwise(F.lit("other"))
        .alias("category"),
        F.length("seq").alias("n_events"),
    )
    cat = c.groupBy("category").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").alias("sum_events"),
    )
    # total derives from the <= 5-row category rollup itself — the
    # scalar attach touches 5 rows, never the per-session frame
    t = cat.agg(F.sum("n_sessions").alias("total"))
    return cat.crossJoin(F.broadcast(t)).select(
        "category",
        "n_sessions",
        F.round(F.col("n_sessions").cast("double") / F.col("total"), 6).alias(
            "share"
        ),
        F.round(
            F.col("sum_events").cast("double") / F.col("n_sessions"), 4
        ).alias("avg_events"),
    )


@query(
    "daily_revenue_locf",
    oracle="""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         sum(CAST(o_totalprice AS DECIMAL(18,6))) AS rev
  FROM orders GROUP BY 1
), bounds AS (SELECT min(day) AS lo, max(day) AS hi FROM daily),
spine AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day
  FROM bounds
), j AS (
  SELECT s.day, d.rev, d.day AS obs_day FROM spine s
  LEFT JOIN daily d ON d.day = s.day
)
SELECT strftime(day, '%Y-%m-%d') AS day,
       round(CAST(last_value(rev IGNORE NULLS)
             OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS DOUBLE), 2)
         AS revenue,
       CAST(CASE WHEN rev IS NULL THEN 1 ELSE 0 END AS INT) AS is_filled,
       strftime(last_value(obs_day IGNORE NULLS)
                OVER (ORDER BY day ROWS UNBOUNDED PRECEDING), '%Y-%m-%d')
         AS source_day
FROM j
""",
    tags=("systems", "timeseries", "spine", "bounded-window"),
)
def daily_revenue_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense daily revenue series: generate the full calendar spine
    between the first and last order date, left-join the observed daily
    revenue, and fill gaps with last-observation-carried-forward
    (flagging fills and their source day) — the gap-fill every
    forecasting/ACF consumer assumes has already happened.

    Scale shape: revenue collapses to the day domain first (hash
    aggregate over the fact table); the spine and the LOCF window then
    run over a CALENDAR-BOUNDED series (~2.4k rows for the 7-year
    fixture — bounded by time span, not corpus size; allowlisted as
    such in plan_audit). rev and obs_day are null/non-null together
    (same left-join row), so per-column carries cannot mix rows."""
    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.sum(F.col("o_totalprice").cast(_DEC)).alias("rev"))
        .localCheckpoint(eager=True)
    )
    lo, hi = daily.agg(F.min("day"), F.max("day")).first()
    spine = spark.range(1).select(
        F.explode(
            F.sequence(F.lit(lo), F.lit(hi), F.expr("INTERVAL 1 DAY"))
        ).alias("day")
    )
    j = spine.join(
        daily.select("day", "rev", F.col("day").alias("obs_day")), "day", "left"
    )
    from pyspark.sql import Window

    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return j.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.round(
            F.last("rev", ignorenulls=True).over(w).cast("double"), 2
        ).alias("revenue"),
        F.col("rev").isNull().cast("int").alias("is_filled"),
        F.date_format(
            F.last("obs_day", ignorenulls=True).over(w), "yyyy-MM-dd"
        ).alias("source_day"),
    )
