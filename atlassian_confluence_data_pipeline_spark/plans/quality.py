"""Round-4 wave: data-quality / pipeline-health monitoring.

The checks a production warehouse runs against every load before
publishing — each an oracle-paired single-pass shape:

- referential-integrity orphan counts (anti-join census across the fact
  chain),
- per-column null/blank profile (one-pass conditional aggregates),
- primary-key uniqueness audit (duplicate-key census per table),
- freshness lag per event type (staleness vs the stream head),
- trailing-window volume anomaly detection WITHOUT a global window:
  the trailing mean rides an offset-explode equi-join (each day joins
  its 7 predecessors by day-arithmetic), so the day series never
  funnels through one task — the join-based rendering of
  ``ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING`` that survives 100x.

Reference analog: the run-report counters and failure tallies
(master_script.py:106-113, 241-253, 590-609) grown into the standing
data-quality suite a scheduled pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.plans.registry import query

#: trailing-anomaly parameters: window length (days) and flag ratio
TRAIL_DAYS = 7
VOLUME_FLAG_RATIO = 1.5


@query(
    "referential_integrity_orphans",
    oracle="""
SELECT 'lineitem->orders' AS fk, CAST(count(*) AS BIGINT) AS n_orphans
FROM lineitem l WHERE NOT EXISTS
  (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
UNION ALL
SELECT 'orders->customer', CAST(count(*) AS BIGINT)
FROM orders o WHERE NOT EXISTS
  (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
UNION ALL
SELECT 'customer->nation', CAST(count(*) AS BIGINT)
FROM customer c WHERE NOT EXISTS
  (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)
UNION ALL
SELECT 'supplier->nation', CAST(count(*) AS BIGINT)
FROM supplier s WHERE NOT EXISTS
  (SELECT 1 FROM nation n WHERE n.n_nationkey = s.s_nationkey)
""",
    tags=("quality", "integrity", "antijoin"),
)
def referential_integrity_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity census across the fact chain: orphan
    counts for every foreign key (child rows whose parent is missing).
    Zeros on a healthy load; any non-zero is the first thing an
    on-call checks. Each check is one LEFT ANTI join reduced to a
    scalar (J1 at fleet scale — dim-side anti joins broadcast, the
    lineitem->orders anti join shuffles on the key like any fact
    join)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier")

    def check(name: str, child: DataFrame, ck: str, parent: DataFrame, pk: str):
        return (
            child.join(
                parent.select(F.col(pk).alias(ck)), ck, "left_anti"
            )
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_orphans"))
            .select(F.lit(name).alias("fk"), "n_orphans")
        )

    return (
        check("lineitem->orders", li.select(F.col("l_orderkey")), "l_orderkey", o, "o_orderkey")
        .unionByName(check("orders->customer", o.select("o_custkey"), "o_custkey", c, "c_custkey"))
        .unionByName(check("customer->nation", c.select("c_nationkey"), "c_nationkey", n, "n_nationkey"))
        .unionByName(check("supplier->nation", s.select("s_nationkey"), "s_nationkey", n, "n_nationkey"))
    )


@query(
    "null_rate_profile",
    oracle="""
SELECT 'events' AS tbl, count(*) AS n_rows,
       round(CAST(sum(CASE WHEN props IS NULL OR props = '' THEN 1 ELSE 0 END)
             AS DOUBLE) / count(*), 6) AS props_blank_rate,
       round(CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END)
             AS DOUBLE) / count(*), 6) AS value_null_rate,
       round(CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)
             AS DOUBLE) / count(*), 6) AS user_null_rate
FROM events
UNION ALL
SELECT 'documents', count(*),
       round(CAST(sum(CASE WHEN text IS NULL OR text = '' THEN 1 ELSE 0 END)
             AS DOUBLE) / count(*), 6),
       round(CAST(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END)
             AS DOUBLE) / count(*), 6),
       round(CAST(sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END)
             AS DOUBLE) / count(*), 6)
FROM documents
""",
    tags=("quality", "profile", "nulls"),
)
def null_rate_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null/blank-rate profile of the load's nullable columns — the
    P4 shape-guard census run table-wide in ONE pass per table
    (conditional aggregates, no per-column scans). The numbers a
    schema-contract alert thresholds on."""
    ev = load_table(spark, sf_dir, "events")
    docs = load_table(spark, sf_dir, "documents")

    def rate(cond) -> F.Column:
        return F.round(
            F.sum(F.when(cond, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1)),
            6,
        )

    e = ev.agg(
        F.count(F.lit(1)).alias("n_rows"),
        rate(F.col("props").isNull() | (F.col("props") == "")).alias(
            "props_blank_rate"
        ),
        rate(F.col("value").isNull()).alias("value_null_rate"),
        rate(F.col("user_id").isNull()).alias("user_null_rate"),
    ).select(F.lit("events").alias("tbl"), "*")
    d = docs.agg(
        F.count(F.lit(1)).alias("n_rows"),
        rate(F.col("text").isNull() | (F.col("text") == "")).alias(
            "props_blank_rate"
        ),
        rate(F.col("lang").isNull()).alias("value_null_rate"),
        rate(F.col("source").isNull()).alias("user_null_rate"),
    ).select(F.lit("documents").alias("tbl"), "*")
    return e.unionByName(d)


@query(
    "key_uniqueness_audit",
    oracle="""
SELECT 'orders.o_orderkey' AS pk,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_keys,
       CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS n_dup_rows
FROM orders
UNION ALL
SELECT 'customer.c_custkey', count(*), count(DISTINCT c_custkey),
       count(*) - count(DISTINCT c_custkey) FROM customer
UNION ALL
SELECT 'documents.doc_id', count(*), count(DISTINCT doc_id),
       count(*) - count(DISTINCT doc_id) FROM documents
UNION ALL
SELECT 'lineitem.(l_orderkey,l_linenumber)', count(*),
       count(DISTINCT l_orderkey * 16 + l_linenumber),
       count(*) - count(DISTINCT l_orderkey * 16 + l_linenumber)
FROM lineitem
""",
    tags=("quality", "uniqueness", "audit"),
)
def key_uniqueness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary-key uniqueness audit: per declared key, total rows vs
    distinct keys vs duplicate-row count — the load-gate check before a
    MERGE trusts its ON clause. Composite lineitem key folds into one
    integer (l_linenumber < 16 — TPC-H's 1..7) so both engines count
    the identical key expression; all checks are single hash
    aggregates."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    d = load_table(spark, sf_dir, "documents")
    li = load_table(spark, sf_dir, "lineitem")

    def audit(name: str, df: DataFrame, key: F.Column) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.count_distinct(key).cast("bigint").alias("n_keys"),
            (F.count(F.lit(1)) - F.count_distinct(key))
            .cast("bigint")
            .alias("n_dup_rows"),
        ).select(F.lit(name).alias("pk"), "*")

    return (
        audit("orders.o_orderkey", o, F.col("o_orderkey"))
        .unionByName(audit("customer.c_custkey", c, F.col("c_custkey")))
        .unionByName(audit("documents.doc_id", d, F.col("doc_id")))
        .unionByName(
            audit(
                "lineitem.(l_orderkey,l_linenumber)",
                li,
                F.col("l_orderkey") * 16 + F.col("l_linenumber"),
            )
        )
    )


@query(
    "freshness_lag_report",
    oracle="""
WITH head AS (SELECT max(ts) AS head_ts FROM events)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS latest,
       CAST((epoch_us(head.head_ts) - epoch_us(max(ts))) // 1000000
            AS BIGINT) AS lag_s
FROM events CROSS JOIN head
GROUP BY event_type, head.head_ts
""",
    tags=("quality", "freshness", "monitoring"),
)
def freshness_lag_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source freshness: each event type's latest timestamp and its
    lag behind the stream head — the staleness board that catches a
    dead upstream before consumers do. One grouped aggregate plus a
    1-row head scalar broadcast onto 5 groups."""
    ev = load_table(spark, sf_dir, "events")
    head = ev.agg(F.max("ts").alias("head_ts"))
    per = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.max("ts").alias("mx"),
    )
    return per.crossJoin(F.broadcast(head)).select(
        "event_type",
        "n_events",
        F.date_format("mx", "yyyy-MM-dd HH:mm:ss").alias("latest"),
        F.floor(
            (F.unix_micros("head_ts") - F.unix_micros("mx")) / 1_000_000
        )
        .cast("bigint")
        .alias("lag_s"),
    )


@query(
    "volume_anomaly_trailing",
    oracle=f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, count(*) AS n FROM events GROUP BY 1
), trail AS (
  SELECT a.d, a.n,
         CAST(sum(b.n) AS DOUBLE) / count(*) AS trail_mean,
         CAST(count(*) AS BIGINT) AS n_trail
  FROM daily a JOIN daily b
    ON b.d >= a.d - INTERVAL {TRAIL_DAYS} DAY AND b.d < a.d
  GROUP BY 1, 2
)
SELECT strftime(d, '%Y-%m-%d') AS day, CAST(n AS BIGINT) AS n_events,
       round(trail_mean, 4) AS trail_mean, n_trail,
       CAST(CASE WHEN n > {VOLUME_FLAG_RATIO} * trail_mean
                   OR n * {VOLUME_FLAG_RATIO} < trail_mean
            THEN 1 ELSE 0 END AS INT) AS anomaly
FROM trail
""",
    tags=("quality", "anomaly", "timeseries", "scalepath"),
)
def volume_anomaly_trailing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily volume anomaly vs the trailing {D}-day mean: days whose
    event count jumps or drops by the flag ratio against their own
    recent history (days with no history yet are unflaggable and drop
    out, like the oracle's inner join). The volume alarm every
    ingestion pipeline wants.

    Scale shape — the whole point: the trailing mean does NOT use a
    global ordered window (which would funnel the day series through
    one task). Each day EXPLODES its {D} predecessor-day keys and the
    trailing aggregate becomes a keyed equi-join + hash aggregate —
    partitioned by day, shuffle-parallel, the join-based rendering of
    ``ROWS 7 PRECEDING``. At 100 TB the day series is small but the
    same shape applies to per-(entity, day) trailing features where
    the domain is huge."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("n")
    )
    # each day claims its TRAIL_DAYS predecessors: (owner_day, source_day)
    owners = daily.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.lit(TRAIL_DAYS)),
                lambda i: F.date_add(F.col("d"), i),
            )
        ).alias("owner_d"),
        F.col("n").alias("src_n"),
    )
    trail = owners.groupBy("owner_d").agg(
        (F.sum("src_n").cast("double") / F.count(F.lit(1))).alias(
            "trail_mean"
        ),
        F.count(F.lit(1)).cast("bigint").alias("n_trail"),
    )
    flagged = daily.join(trail, daily["d"] == trail["owner_d"]).select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("n").cast("bigint").alias("n_events"),
        F.round("trail_mean", 4).alias("trail_mean"),
        "n_trail",
        F.when(
            (F.col("n") > VOLUME_FLAG_RATIO * F.col("trail_mean"))
            | (F.col("n") * VOLUME_FLAG_RATIO < F.col("trail_mean")),
            1,
        )
        .otherwise(0)
        .cast("int")
        .alias("anomaly"),
    )
    return flagged
