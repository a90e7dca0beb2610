"""Event-stream analytics in batch form (SURVEY.md §2.9).

The reference's incremental daily poll (config_conf.py:39, CQL
`lastmodified>=`, master_script.py:456-581) maps onto windowed /
watermarked streaming semantics. These queries express the *semantics*
over the `events` fixture with batch DataFrames — `window()`,
`session_window()`, keyed dedup, CDC vs a versioned state — so DuckDB
can oracle-check them; the live Structured Streaming surface (readStream,
withWatermark, foreachBatch MERGE) is in ``streaming/`` with its own
tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.operators.dedup import latest_per_key
from atlassian_confluence_data_pipeline_spark.operators.joins import cdc_delta
from atlassian_confluence_data_pipeline_spark.plans._exact import dsum, sql_dsum
from atlassian_confluence_data_pipeline_spark.plans.registry import query

POLL_CUTOFF = "2024-01-30 00:00:00"  # events span 2024-01-01 .. 2024-01-30
STATE_CUTOFF = "2024-01-25 00:00:00"


@query(
    "hourly_event_stats",
    oracle=f"""
SELECT date_trunc('hour', ts) AS window_start,
       event_type,
       count(*) AS n_events,
       {sql_dsum('value')} AS total_value
FROM events
GROUP BY 1, 2
""",
    tags=("events", "window", "tumbling"),
)
def hourly_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows (§2.9): `window(ts, '1 hour')` grouped
    counts — the batch rendering of the streaming watermark+window agg."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query(
    "sliding_event_counts",
    oracle="""
SELECT date_trunc('hour', ts)
         + to_minutes(CAST(floor(extract(minute FROM ts) / 15) AS BIGINT) * 15)
         - to_minutes(k * 15) AS window_start,
       count(*) AS n_events
FROM events
CROSS JOIN (SELECT unnest(range(0, 4)) AS k)
GROUP BY 1
""",
    tags=("events", "window", "sliding"),
)
def sliding_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 hour long, 15-minute slide): each event belongs
    to 4 overlapping windows (Expand node — no self-join). The oracle
    reconstructs the same window set arithmetically."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


@query(
    "session_stats",
    oracle="""
WITH d AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, ts,
         sum(new_sess) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS sess_id
  FROM d
)
SELECT user_id, min(ts) AS session_start, count(*) AS n_events
FROM s GROUP BY user_id, sess_id
""",
    tags=("events", "window", "session"),
)
def session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a 30-minute inactivity gap:
    `session_window(ts, '30 minutes')` per user. The oracle rebuilds the
    same sessions with the classic lag/flag/cumsum island pattern."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
        )
    )


@query(
    "dedup_earliest_event",
    oracle="""
SELECT user_id, event_type, event_id, ts
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY user_id, event_type ORDER BY ts, event_id
  ) AS rn FROM events
) WHERE rn = 1
""",
    tags=("events", "dedup"),
)
def dedup_earliest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed dedup keeping the earliest row — the batch analog of
    streaming `dropDuplicatesWithinWatermark` on (user, type): first
    arrival wins, later duplicates are discarded."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("user_id", "event_type", "event_id", "ts")
    )


@query(
    "incremental_poll_window",
    oracle=f"""
SELECT event_type,
       count(*) AS n_events,
       {sql_dsum('value', 4)} AS total_value,
       max(ts) AS latest_ts
FROM events
WHERE ts >= TIMESTAMP '{POLL_CUTOFF}'
GROUP BY 1
""",
    tags=("events", "incremental", "filter"),
)
def incremental_poll_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's daily lookback poll (P2/S4: `lastmodified >=
    now()-1d`, confluence_client.py:363) pinned to a fixed cutoff —
    inclusive of the whole boundary day per the lexical-compare semantics
    (SURVEY §1.2). Catalyst pushes the predicate into Parquet row-group
    pruning."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("ts") >= F.lit(POLL_CUTOFF).cast("timestamp"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", 4).alias("total_value"),
            F.max("ts").alias("latest_ts"),
        )
    )


@query(
    "cdc_user_versions",
    oracle=f"""
WITH state AS (
  SELECT user_id, max(event_id) AS version
  FROM events WHERE ts < TIMESTAMP '{STATE_CUTOFF}' GROUP BY 1
), cur AS (
  SELECT user_id, max(event_id) AS latest_event_id, count(*) AS n_events
  FROM events GROUP BY 1
)
SELECT c.user_id, c.latest_event_id, c.n_events,
       CASE WHEN s.version IS NULL THEN 'new' ELSE 'updated' END AS change_type
FROM cur c LEFT JOIN state s ON c.user_id = s.user_id
WHERE s.version IS NULL OR s.version < c.latest_event_id
""",
    tags=("events", "cdc", "join"),
)
def cdc_user_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC delta J3 (state_manager.py:55-82) over the events ledger: the
    state table holds each user's max processed version (event id) as of
    the state cutoff; current rows are classified new/updated and
    unchanged users are skipped (state.version >= current,
    state_manager.py:72) — via the cdc_delta operator."""
    ev = load_table(spark, sf_dir, "events")
    state = (
        ev.filter(F.col("ts") < F.lit(STATE_CUTOFF).cast("timestamp"))
        .groupBy("user_id")
        .agg(F.max("event_id").alias("version"))
    )
    current = ev.groupBy("user_id").agg(
        F.max("event_id").alias("latest_event_id"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return cdc_delta(
        current,
        state,
        "user_id",
        current_version=F.col("latest_event_id"),
        state_version_col="version",
    ).select("user_id", "latest_event_id", "n_events", "change_type")
