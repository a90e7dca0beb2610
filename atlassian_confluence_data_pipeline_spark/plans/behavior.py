"""Behavioral event analytics: funnel, cohort retention, outlier
detection, and an interval (range) self-join.

These extend the §2.9 event surface with the session-level analyses an
activity pipeline runs downstream of the reference's grouped run
statistics (master_script.py:241-253 counts outcomes per run; these
queries generalize that to per-user lifecycle analytics). All are
single-shuffle-per-stage plans over `events`:

- funnel/cohort: hash aggregate keyed by user_id (the natural 100 TB
  partitioning for behavioral data), then joins stay on the same key —
  at scale both sides of every join here are hash-partitioned by
  user_id, so AQE plans them without an extra exchange.
- outliers: two-pass (tiny per-type stats broadcast back onto the
  stream) — never a window over the full table.
- interval join: time-bucketed equi-join (bucket width = the interval
  bound) instead of a non-equi range join, so Spark plans a hash join
  rather than a broadcast-nested-loop over 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.plans.registry import query

_DEC = "decimal(18,6)"


@query(
    "event_funnel",
    oracle="""
WITH s AS (
  SELECT user_id, min(ts) AS signup_ts
  FROM events WHERE event_type = 'signup' GROUP BY 1
),
c AS (
  SELECT e.user_id, min(e.ts) AS click_ts
  FROM events e JOIN s ON e.user_id = s.user_id
  WHERE e.event_type = 'click' AND e.ts > s.signup_ts GROUP BY 1
),
p AS (
  SELECT e.user_id, min(e.ts) AS purchase_ts
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.click_ts GROUP BY 1
)
SELECT '1_signup' AS stage, count(*) AS n_users FROM s
UNION ALL SELECT '2_click' AS stage, count(*) AS n_users FROM c
UNION ALL SELECT '3_purchase' AS stage, count(*) AS n_users FROM p
""",
    tags=("events", "funnel", "join", "agg"),
)
def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel signup -> click -> purchase: each stage
    keeps users whose stage event strictly follows their previous stage's
    first event. Every stage is a min-aggregate keyed by user_id joined
    back on user_id — one partitioning reused across all three stages."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")

    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(s, "user_id")
        .filter(F.col("ts") > F.col("signup_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("click_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("click_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
    )

    def stage(df: DataFrame, label: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(label).alias("stage"), "n_users"
        )

    return (
        stage(s, "1_signup")
        .unionByName(stage(c, "2_click"))
        .unionByName(stage(p, "3_purchase"))
    )


@query(
    "weekly_cohort_retention",
    oracle="""
WITH firstw AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
  FROM events GROUP BY 1
),
act AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events
)
SELECT f.cohort_week AS cohort_week,
       CAST(date_diff('day', CAST(f.cohort_week AS DATE), CAST(a.week AS DATE)) / 7 AS INT)
         AS week_offset,
       count(*) AS n_users
FROM act a JOIN firstw f ON a.user_id = f.user_id
GROUP BY 1, 2
""",
    tags=("events", "cohort", "retention", "agg"),
)
def weekly_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-activity week,
    counted in each subsequent active week. Two user_id-keyed aggregates
    plus a user_id join — the classic growth-analytics rollup, with the
    per-user reduction done BEFORE the join so the join sides are
    |users|, not |events|."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    firstw = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    act = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("week")
    ).distinct()
    return (
        act.join(firstw, "user_id")
        .select(
            "cohort_week",
            (
                F.datediff(F.col("week").cast("date"), F.col("cohort_week").cast("date"))
                / 7
            )
            .cast("int")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@query(
    "value_outliers_zscore",
    oracle="""
WITH st AS (
  SELECT event_type,
         count(*) AS n,
         CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s1,
         CAST(sum(CAST(value * value AS DECIMAL(18,6))) AS DOUBLE) AS s2
  FROM events GROUP BY 1
)
SELECT e.event_id AS event_id,
       e.event_type AS event_type,
       round(e.value, 2) AS value,
       round((e.value - s1 / n) / sqrt((s2 - s1 * s1 / n) / (n - 1)), 4) AS zscore
FROM events e JOIN st ON e.event_type = st.event_type
WHERE abs((e.value - s1 / n) / sqrt((s2 - s1 * s1 / n) / (n - 1))) > 3.0
""",
    tags=("events", "outliers", "stats", "broadcast"),
)
def value_outliers_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score outliers (|z| > 3): data-cleaning pass a metrics
    pipeline runs before aggregation. Moments are DECIMAL sums (exact,
    order-independent; `value` is 2-decimal so value*value is 4-decimal
    and the DECIMAL(18,6) cast is lossless), so mean/std — and therefore
    the >3 membership test — are bit-identical across engines. The stats
    side is |event_types| rows: broadcast back onto the stream, no
    window over the full table."""
    ev = load_table(spark, sf_dir, "events")
    st = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast(_DEC)).cast("double").alias("s1"),
        F.sum((F.col("value") * F.col("value")).cast(_DEC)).cast("double").alias("s2"),
    )
    z = (F.col("value") - F.col("s1") / F.col("n")) / F.sqrt(
        (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)
    )
    return (
        ev.join(F.broadcast(st), "event_type")
        .filter(F.abs(z) > 3.0)
        .select(
            "event_id",
            "event_type",
            F.round("value", 2).alias("value"),
            F.round(z, 4).alias("zscore"),
        )
    )


@query(
    "error_click_interval_join",
    oracle="""
SELECT e.event_id AS err_id, count(*) AS n_clicks_1h
FROM events e
JOIN events c
  ON c.user_id = e.user_id
 AND c.event_type = 'click'
 AND c.ts > e.ts
 AND c.ts <= e.ts + INTERVAL 1 HOUR
WHERE e.event_type = 'error'
GROUP BY 1
""",
    tags=("events", "interval-join", "range", "bucketing"),
)
def error_click_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval self-join: for each error, the user's clicks in the next
    hour (rage-click attribution). The range predicate is rewritten
    as a bucketed equi-join — ts floored to 1-hour buckets, each error
    probing its own and the next bucket — so Spark plans a hash join on
    (user_id, bucket) instead of a nested-loop range join; the residual
    interval filter then trims the two candidate buckets exactly. A
    click can match only one of the two probed buckets, so no dedup is
    needed. This is the scale pattern for every time-window correlation
    at 100 TB: candidate generation by equi-key, exact predicate on the
    (small) candidate set."""
    ev = load_table(spark, sf_dir, "events")
    bucket = lambda c: F.floor(F.unix_timestamp(c) / 3600)  # noqa: E731
    err = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"),
        F.col("user_id"),
        F.col("ts").alias("err_ts"),
        F.explode(
            F.array(bucket(F.col("ts")), bucket(F.col("ts")) + 1)
        ).alias("bkt"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
        bucket(F.col("ts")).alias("bkt"),
    )
    return (
        err.join(clicks, ["user_id", "bkt"])
        .filter(
            (F.col("click_ts") > F.col("err_ts"))
            & (
                F.col("click_ts")
                <= F.col("err_ts") + F.expr("INTERVAL 1 HOUR")
            )
        )
        .groupBy("err_id")
        .agg(F.count(F.lit(1)).alias("n_clicks_1h"))
    )


@query(
    "sessionize_events",
    oracle="""
WITH g AS (
  SELECT event_id, user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM events
),
s AS (
  SELECT event_id, user_id,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM g
)
SELECT event_id, user_id, CAST(session_seq AS BIGINT) AS session_seq
FROM s
""",
    tags=("events", "session", "window", "lag"),
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """General sessionization: assign each event a per-user session
    sequence number by cumulative-summing gap-start flags (gap > 30
    min). This is the row-level complement of session_window aggregation
    (session_stats): downstream joins need the session id ON each event
    row. Both windows are PARTITIONED by user_id with deterministic
    (ts, event_id) order — the shuffle is keyed, partitions bounded by
    per-user activity."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    new_sess = F.when(
        prev_ts.isNull()
        | (F.col("ts").cast("long") - prev_ts.cast("long") > 1800),
        1,
    ).otherwise(0)
    return (
        ev.select("event_id", "user_id", "ts", new_sess.alias("new_sess"))
        .select(
            "event_id",
            "user_id",
            F.sum("new_sess")
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("bigint")
            .alias("session_seq"),
        )
    )
