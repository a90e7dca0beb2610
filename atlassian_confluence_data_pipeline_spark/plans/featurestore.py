"""Feature-store wave (43): point-in-time correct feature joins and
the tolerance-bounded as-of lookup.

The training-set assembly primitive: every label row must see feature
values AS OF its own timestamp — never later (leakage) and, with a
tolerance, never stale. Both queries ride the engine's
union-and-carry-forward as-of join (operators/joins.py — one keyed
shuffle, no pair blowup), which is exactly the 'feature store
point-in-time join' of ML-ops platforms re-expressed Spark-first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.operators.joins import (
    asof_join_backward,
)
from atlassian_confluence_data_pipeline_spark.plans.registry import query

#: staleness tolerance for the bounded as-of lookup (microseconds)
_TOL_US = 3_600_000_000  # 1 hour


@query(
    "feature_store_pit_join",
    oracle="""
WITH feat0 AS (
  SELECT user_id, epoch_us(ts) AS fts, event_id,
         CAST(row_number() OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS BIGINT)
           AS clicks_so_far,
         CAST(sum(CAST(round(value * 1000000) AS BIGINT))
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS value_sum_q
  FROM events WHERE event_type = 'click'
), feat AS (
  -- one feature row per (user, microsecond): the LAST event's
  -- cumulative state (as-of semantics include all ties at ts)
  SELECT user_id, fts, clicks_so_far, value_sum_q FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id, fts
                                 ORDER BY event_id DESC) AS rdup
    FROM feat0
  ) WHERE rdup = 1
), labels AS (
  SELECT event_id AS label_id, user_id, epoch_us(ts) AS lts
  FROM events WHERE event_type = 'purchase'
), pit AS (
  SELECT labels.label_id, labels.user_id,
         max_by(feat.clicks_so_far, feat.fts) AS clicks_so_far,
         max_by(feat.value_sum_q, feat.fts) AS value_sum_q
  FROM labels LEFT JOIN feat
    ON feat.user_id = labels.user_id AND feat.fts <= labels.lts
  GROUP BY 1, 2
)
SELECT label_id, user_id,
       CAST(coalesce(clicks_so_far, 0) AS BIGINT) AS clicks_so_far,
       round(CAST(coalesce(value_sum_q, 0) AS DOUBLE) / 1000000, 4)
         AS click_value_sum
FROM pit
""",
    tags=("featurestore", "asof", "pit"),
)
def feature_store_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time correct feature join — the training-set assembly
    step of a feature store: for every purchase (label row), attach the
    user's click-count and click-value-sum features AS OF the purchase
    timestamp. Later feature rows must never leak in; users with no
    prior clicks get zeros. Feature values are exact integers (counts,
    and values quantized at 1e-6 — the engine's quantized-moment
    discipline), so the carried struct is engine-exact.

    Scale shape: the feature timeline is built with user-KEYED windows;
    the PIT lookup is the union-and-carry-forward as-of join — one
    shuffle on the user key, O(n log n) per key, NO per-pair blowup
    (the oracle's max_by-over-range-join form is the quadratic shape
    this operator exists to avoid)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    feat = (
        ev.filter(F.col("event_type") == "click")
        .select(
            "user_id",
            F.unix_micros("ts").alias("fts"),
            "event_id",
            F.row_number().over(w).cast("bigint").alias("clicks_so_far"),
            F.sum(F.round(F.col("value") * 1000000).cast("bigint"))
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("bigint")
            .alias("value_sum_q"),
        )
    )
    wd = Window.partitionBy("user_id", "fts").orderBy(
        F.col("event_id").desc()
    )
    feat = (
        feat.withColumn("rdup", F.row_number().over(wd))
        .filter(F.col("rdup") == 1)
        .drop("rdup")
    )
    labels = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("label_id"),
        "user_id",
        F.unix_micros("ts").alias("lts"),
    )
    joined = asof_join_backward(
        labels,
        feat.select("user_id", "fts", "clicks_so_far", "value_sum_q"),
        on="user_id",
        left_ts="lts",
        right_ts="fts",
        right_value_cols=["clicks_so_far", "value_sum_q"],
    )
    return joined.select(
        "label_id",
        "user_id",
        F.coalesce("asof_clicks_so_far", F.lit(0))
        .cast("bigint")
        .alias("clicks_so_far"),
        F.round(
            F.coalesce("asof_value_sum_q", F.lit(0)).cast("double")
            / 1000000,
            4,
        ).alias("click_value_sum"),
    )


@query(
    "asof_click_tolerance",
    oracle=f"""
WITH clicks0 AS (
  SELECT user_id, epoch_us(ts) AS cts, event_id,
         CAST(round(value * 1000000) AS BIGINT) AS vq
  FROM events WHERE event_type = 'click'
), clicks AS (
  SELECT user_id, cts, vq FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id, cts
                                 ORDER BY event_id DESC) AS rdup
    FROM clicks0
  ) WHERE rdup = 1
), purchases AS (
  SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS pts
  FROM events WHERE event_type = 'purchase'
), matched AS (
  SELECT p.purchase_id, p.user_id, p.pts,
         max_by(c.cts, c.cts) AS cts,
         max_by(c.vq, c.cts) AS vq
  FROM purchases p LEFT JOIN clicks c
    ON c.user_id = p.user_id AND c.cts <= p.pts
  GROUP BY 1, 2, 3
)
SELECT purchase_id, user_id,
       CAST(CASE WHEN cts IS NOT NULL AND pts - cts <= {_TOL_US}
            THEN 1 ELSE 0 END AS INT) AS within_tolerance,
       CASE WHEN cts IS NOT NULL AND pts - cts <= {_TOL_US}
            THEN CAST(pts - cts AS BIGINT) END AS staleness_us,
       CASE WHEN cts IS NOT NULL AND pts - cts <= {_TOL_US}
            THEN round(CAST(vq AS DOUBLE) / 1000000, 4) END
         AS click_value
FROM matched
""",
    tags=("featurestore", "asof", "tolerance"),
)
def asof_click_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tolerance-bounded as-of lookup: each purchase fetches the user's
    latest prior click ONLY if it happened within the last hour —
    older matches are nulled out (stale features are worse than no
    features; every real as-of API ships this MATCH_CONDITION /
    tolerance knob, Spark has none natively). Completes the engine's
    as-of family: backward, forward, and now bounded-staleness.

    Scale shape: the same union-and-carry-forward as-of join; the
    tolerance is a post-join projection (the match is still the
    NEAREST row — filtering before the join would wrongly promote
    older clicks into the window)."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.unix_micros("ts").alias("cts"),
        "event_id",
        F.round(F.col("value") * 1000000).cast("bigint").alias("vq"),
    )
    wd = Window.partitionBy("user_id", "cts").orderBy(
        F.col("event_id").desc()
    )
    clicks = (
        clicks.withColumn("rdup", F.row_number().over(wd))
        .filter(F.col("rdup") == 1)
        .drop("rdup", "event_id")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.unix_micros("ts").alias("pts"),
    )
    # the as-of join returns left cols + right VALUE cols; staleness
    # needs the matched timestamp itself, so carry it as a value column
    joined2 = asof_join_backward(
        purchases,
        clicks.select(
            "user_id", "cts", "vq", F.col("cts").alias("matched_cts")
        ),
        on="user_id",
        left_ts="pts",
        right_ts="cts",
        right_value_cols=["vq", "matched_cts"],
    )
    ok = F.col("asof_matched_cts").isNotNull() & (
        F.col("pts") - F.col("asof_matched_cts") <= _TOL_US
    )
    return joined2.select(
        "purchase_id",
        "user_id",
        F.when(ok, 1).otherwise(0).cast("int").alias("within_tolerance"),
        F.when(
            ok, (F.col("pts") - F.col("asof_matched_cts")).cast("bigint")
        ).alias("staleness_us"),
        F.when(
            ok, F.round(F.col("asof_vq").cast("double") / 1000000, 4)
        ).alias("click_value"),
    )
