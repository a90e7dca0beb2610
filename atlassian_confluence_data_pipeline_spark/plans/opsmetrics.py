"""Operational-metrics wave (38): sweep-line session concurrency with
a Little's-law audit, and the longest global quiet gaps.

The capacity-planning readouts: time-averaged and peak concurrent
sessions via a DISTRIBUTED sweep line (+1/-1 deltas, global prefix sum
through distributed_prefix_rank, and `next change-point` recovered by a
rank+1 equi-join instead of a global lead window), cross-checked
against Little's law L = lambda * W — an identity over a closed
horizon, so the relative gap doubles as an end-to-end audit of the
sweep machinery itself. Plus the corpus-wide largest inter-event gaps
(monitoring's "was the pipeline down?" question) from the same
rank-join pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.operators.windows import (
    distributed_prefix_rank,
)
from atlassian_confluence_data_pipeline_spark.plans.registry import query

#: session gap (microseconds) — 30 minutes, the engine's session bound
_GAP_US = 1_800_000_000

_TOP_GAPS = 10

_SESS_SQL = f"""
e AS (
  SELECT user_id, epoch_us(ts) AS tus, event_id FROM events
), g AS (
  SELECT user_id, tus, event_id,
         CASE WHEN lag(tus) OVER w IS NULL
              OR tus - lag(tus) OVER w > {_GAP_US} THEN 1 ELSE 0 END
           AS new_sess
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)
), s AS (
  SELECT user_id, tus,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY tus, event_id
                             ROWS UNBOUNDED PRECEDING) AS seq
  FROM g
), sess AS (
  SELECT user_id, seq,
         CAST(min(tus) AS BIGINT) AS t0, CAST(max(tus) AS BIGINT) AS t1
  FROM s GROUP BY 1, 2
)"""


def _sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, seq, t0, t1) session intervals in epoch microseconds —
    the sessionize_events construction reduced to interval endpoints."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    e = ev.select(
        "user_id", F.unix_micros("ts").alias("tus"), "event_id"
    )
    prev = F.lag("tus").over(w)
    new_sess = F.when(
        prev.isNull() | (F.col("tus") - prev > _GAP_US), 1
    ).otherwise(0)
    flagged = e.select(
        "user_id", "tus", "event_id", new_sess.alias("new_sess")
    )
    s = flagged.select(
        "user_id",
        "tus",
        F.sum("new_sess")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("seq"),
    )
    return s.groupBy("user_id", "seq").agg(
        F.min("tus").cast("bigint").alias("t0"),
        F.max("tus").cast("bigint").alias("t1"),
    )


@query(
    "littles_law_audit",
    oracle=f"""
WITH {_SESS_SQL.strip()}
, deltas AS (
  SELECT t, CAST(sum(d) AS BIGINT) AS net FROM (
    SELECT t0 AS t, 1 AS d FROM sess
    UNION ALL SELECT t1, -1 FROM sess
  ) GROUP BY 1
), lv AS (
  SELECT t, sum(net) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS level,
         lead(t) OVER (ORDER BY t) AS t_next
  FROM deltas
), area AS (
  SELECT CAST(sum(CAST(level * (t_next - t) AS DECIMAL(38,0)))
              AS DOUBLE) AS a,
         CAST(max(level) AS BIGINT) AS peak
  FROM lv WHERE t_next IS NOT NULL
), horizon AS (
  SELECT CAST(min(t0) AS BIGINT) AS lo, CAST(max(t1) AS BIGINT) AS hi,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(t1 - t0 AS DECIMAL(38,0))) AS DOUBLE) AS dur
  FROM sess
)
SELECT horizon.n AS n_sessions,
       area.peak AS max_concurrency,
       round(area.a / (horizon.hi - horizon.lo), 6) AS avg_concurrency,
       round(horizon.n / (CAST(horizon.hi - horizon.lo AS DOUBLE)
                          / 1000000), 9) AS arrival_rate_per_s,
       round(horizon.dur / horizon.n / 1000000, 6) AS avg_duration_s,
       round(horizon.n / (CAST(horizon.hi - horizon.lo AS DOUBLE)
                          / 1000000)
             * (horizon.dur / horizon.n / 1000000), 6)
         AS littles_rhs
FROM area CROSS JOIN horizon
""",
    tags=("ops", "sweepline", "prefix"),
)
def littles_law_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-averaged and peak concurrent sessions by a distributed
    sweep line, audited against Little's law: L (average concurrency
    over the horizon) must equal lambda * W (arrival rate x average
    session duration) — an exact identity over a closed horizon, so any
    gap between the two columns exposes a defect in the sweep
    machinery, not in the data.

    Scale shape: sessions collapse to interval endpoints (the keyed
    sessionize windows), +1/-1 deltas aggregate by change-point, the
    running level is ONE distributed prefix pass, and the 'next
    change-point' needed for the area integral comes from a rank+1
    EQUI-JOIN (distributed_prefix_rank's rank) — never a global lead
    window. The area accumulates exact integer level x microsecond
    products in DECIMAL(38,0)."""
    sess = _sessions(spark, sf_dir).localCheckpoint(eager=True)
    # horizon aggregate FIRST: its min/max double as equal-width split
    # points for the sweep's prefix pass (every change-point lies in
    # [lo, hi]), which skips the operator's approxQuantile sampling job
    # (round-11: fn()-side sequential jobs dominated this query's cost)
    hz = sess.agg(
        F.min("t0").cast("bigint").alias("lo"),
        F.max("t1").cast("bigint").alias("hi"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum((F.col("t1") - F.col("t0")).cast("decimal(38,0)"))
        .cast("double")
        .alias("dur"),
    ).first()
    lo, hi = int(hz["lo"]), int(hz["hi"])
    deltas = (
        sess.select(F.col("t0").alias("t"), F.lit(1).alias("d"))
        .union(sess.select(F.col("t1").alias("t"), F.lit(-1).alias("d")))
        .groupBy("t")
        .agg(F.sum("d").cast("bigint").alias("net"))
    )
    lv = distributed_prefix_rank(
        deltas,
        ["t"],
        sums={"level": "net"},
        rank_col="rk",
        bounds=[lo + (hi - lo) * i / 32 for i in range(1, 32)],
    ).localCheckpoint(eager=True)
    nxt = lv.select((F.col("rk") - 1).alias("rk"), F.col("t").alias("t_next"))
    seg = lv.join(nxt, "rk")
    area_row = seg.agg(
        F.sum(
            (F.col("level") * (F.col("t_next") - F.col("t"))).cast(
                "decimal(38,0)"
            )
        )
        .cast("double")
        .alias("a"),
        F.max("level").cast("bigint").alias("peak"),
    ).first()
    horizon_us = hz["hi"] - hz["lo"]
    lam = hz["n"] / (float(horizon_us) / 1000000)
    w_s = hz["dur"] / hz["n"] / 1000000
    rhs = lam * w_s
    return spark.range(1).select(
        F.lit(hz["n"]).cast("bigint").alias("n_sessions"),
        F.lit(area_row["peak"]).cast("bigint").alias("max_concurrency"),
        F.round(F.lit(area_row["a"]) / horizon_us, 6).alias(
            "avg_concurrency"
        ),
        F.round(F.lit(lam), 9).alias("arrival_rate_per_s"),
        F.round(F.lit(w_s), 6).alias("avg_duration_s"),
        F.round(F.lit(rhs), 6).alias("littles_rhs"),
    )


@query(
    "longest_quiet_gaps",
    oracle=f"""
WITH t AS (
  SELECT DISTINCT epoch_us(ts) AS tus FROM events
), lv AS (
  SELECT tus, lead(tus) OVER (ORDER BY tus) AS t_next FROM t
)
SELECT CAST(tus AS BIGINT) AS gap_start_us,
       CAST(t_next - tus AS BIGINT) AS gap_us,
       round(CAST(t_next - tus AS DOUBLE) / 1000000, 6) AS gap_seconds
FROM lv WHERE t_next IS NOT NULL
ORDER BY gap_us DESC, tus
LIMIT {_TOP_GAPS}
""",
    tags=("ops", "monitoring", "prefix"),
)
def longest_quiet_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The {_TOP_GAPS} longest corpus-wide quiet gaps between
    consecutive event timestamps — monitoring's "was ingestion down?"
    readout. The oracle uses a global lead window; the engine recovers
    each timestamp's successor with the distributed rank+1 equi-join
    (the sweep-line pattern), then a TakeOrdered top-k — no global
    window, no global sort."""
    ev = load_table(spark, sf_dir, "events")
    t = ev.select(F.unix_micros("ts").alias("tus")).distinct()
    rk = distributed_prefix_rank(t, ["tus"], rank_col="rk").localCheckpoint(
        eager=True
    )
    nxt = rk.select(
        (F.col("rk") - 1).alias("rk"), F.col("tus").alias("t_next")
    )
    return (
        rk.join(nxt, "rk")
        .select(
            F.col("tus").cast("bigint").alias("gap_start_us"),
            (F.col("t_next") - F.col("tus")).cast("bigint").alias("gap_us"),
            F.round(
                (F.col("t_next") - F.col("tus")).cast("double") / 1000000, 6
            ).alias("gap_seconds"),
        )
        .orderBy(F.col("gap_us").desc(), "gap_start_us")
        .limit(_TOP_GAPS)
    )
