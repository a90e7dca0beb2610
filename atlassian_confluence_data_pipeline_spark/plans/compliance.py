"""Compliance wave (25): right-to-be-forgotten sweeps, retention
planning, and differentially-private-shaped histograms.

The reference exports user-authored content wholesale (every page of
every space, master_script.py's space loops) — an engine hosting that
corpus at 100 TB owns the OTHER half of the lifecycle: deleting a
subject's rows across every table that references them (GDPR art. 17),
aging out data past its retention horizon partition-by-partition, and
publishing aggregate statistics with a noise mechanism instead of raw
counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.plans.registry import query

#: deterministic deletion cohort: every 97th customer key — a stand-in
#: for the erasure-request list a real sweep receives as input
_FORGET_MOD = 97

_RETENTION_CUTOFF = "1996-01-01"


@query(
    "forget_user_sweep",
    oracle=f"""
WITH del AS (
  SELECT c_custkey FROM customer WHERE c_custkey % {_FORGET_MOD} = 0
), o AS (
  SELECT o_orderkey,
         CASE WHEN o_custkey IN (SELECT c_custkey FROM del)
              THEN 1 ELSE 0 END AS hit
  FROM orders
)
SELECT 'customer' AS table_name,
       (SELECT count(*) FROM customer) AS rows_total,
       (SELECT count(*) FROM del) AS rows_to_delete
UNION ALL
SELECT 'orders', (SELECT count(*) FROM o),
       (SELECT CAST(sum(hit) AS BIGINT) FROM o)
UNION ALL
SELECT 'lineitem', (SELECT count(*) FROM lineitem),
       (SELECT count(*) FROM lineitem l
        JOIN o ON l.l_orderkey = o.o_orderkey WHERE o.hit = 1)
""",
    tags=("compliance", "privacy", "anti-join"),
)
def forget_user_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten impact sweep: given an erasure cohort,
    count the rows each table must drop — direct rows (customer),
    FK-referencing rows (orders), and CASCADE rows (lineitems of the
    doomed orders). The audit a deletion job emits BEFORE destructive
    writes, so compliance can sign off on blast radius; the deletes
    themselves are the same anti-joins run through the MERGE/sink
    machinery (operators/state.py, K1).

    Scale shape: the cohort semi-join is broadcast (erasure lists are
    tiny); the cascade is one equi-join from lineitem to the flagged
    order keys; every number is an exact count."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    del_keys = cust.filter(
        F.col("c_custkey") % _FORGET_MOD == 0
    ).select("c_custkey").localCheckpoint(eager=True)
    o_flag = orders.join(
        F.broadcast(del_keys),
        orders.o_custkey == del_keys.c_custkey,
        "left",
    ).select(
        "o_orderkey", F.col("c_custkey").isNotNull().cast("int").alias("hit")
    )
    c_row = cust.agg(
        F.lit("customer").alias("table_name"),
        F.count(F.lit(1)).alias("rows_total"),
        F.sum((F.col("c_custkey") % _FORGET_MOD == 0).cast("int"))
        .cast("bigint")
        .alias("rows_to_delete"),
    )
    o_row = o_flag.agg(
        F.lit("orders").alias("table_name"),
        F.count(F.lit(1)).alias("rows_total"),
        F.sum("hit").cast("bigint").alias("rows_to_delete"),
    )
    doomed = o_flag.filter(F.col("hit") == 1).select(
        F.col("o_orderkey").alias("d_orderkey")
    )
    l_row = (
        li.join(doomed, li.l_orderkey == doomed.d_orderkey, "left")
        .agg(
            F.lit("lineitem").alias("table_name"),
            F.count(F.lit(1)).alias("rows_total"),
            F.sum(F.col("d_orderkey").isNotNull().cast("int"))
            .cast("bigint")
            .alias("rows_to_delete"),
        )
    )
    return c_row.unionByName(o_row).unionByName(l_row)


@query(
    "data_retention_plan",
    oracle=f"""
SELECT strftime(date_trunc('year', o_orderdate), '%Y') AS year,
       count(*) AS n_rows,
       round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 2)
         AS value_at_stake,
       CAST(CASE WHEN date_trunc('year', o_orderdate)
                      < DATE '{_RETENTION_CUTOFF}'
                 THEN 1 ELSE 0 END AS INT) AS purge
FROM orders
GROUP BY date_trunc('year', o_orderdate)
""",
    tags=("compliance", "retention", "partition"),
)
def data_retention_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention-horizon purge plan: per order-year partition, the row
    count and revenue value that a retention policy (purge everything
    before {_RETENTION_CUTOFF}) would destroy — the partition-level
    drop list an aging job executes (year = the partition key, so the
    purge is metadata-only partition drops, never row-level deletes).

    Scale shape: one hash aggregate to the year domain; the purge flag
    is a literal comparison on the partition key — exactly the
    predicate Catalyst would push as partition pruning on a
    year-partitioned table."""
    o = load_table(spark, sf_dir, "orders")
    yr = F.date_trunc("year", F.col("o_orderdate"))
    return o.groupBy(yr.alias("y")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(18,6)")).cast("double"), 2
        ).alias("value_at_stake"),
    ).select(
        F.date_format("y", "yyyy").alias("year"),
        "n_rows",
        "value_at_stake",
        (F.col("y") < F.lit(_RETENTION_CUTOFF).cast("timestamp"))
        .cast("int")
        .alias("purge"),
    )


@query(
    "dp_noisy_histogram",
    oracle="""
WITH c AS (
  SELECT c_mktsegment, count(*) AS true_n FROM customer GROUP BY 1
), n AS (
  SELECT c_mktsegment, true_n,
         (ascii(substr(md5(c_mktsegment || ':dp-demo-seed-42'), 1, 1)) * 256
          + ascii(substr(md5(c_mktsegment || ':dp-demo-seed-42'), 2, 1)))
           % 21 - 10 AS noise
  FROM c
)
SELECT c_mktsegment,
       CAST(true_n + noise AS BIGINT) AS noisy_count,
       CAST(10 AS INT) AS noise_bound,
       1.0 AS epsilon
FROM n
""",
    tags=("compliance", "privacy", "dp"),
)
def dp_noisy_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Noise-mechanism-shaped histogram release: per-segment customer
    counts published with additive bounded noise derived
    DETERMINISTICALLY from a keyed hash — the differential-privacy
    release SHAPE (count + noise + stated epsilon/sensitivity), made
    reproducible so the oracle can hash-verify the mechanism's
    plumbing. A production release swaps the keyed hash for calibrated
    Laplace/geometric noise from a secure RNG — everything else
    (the single aggregate, the never-publish-raw-counts contract) is
    identical. True counts are NOT in the output.

    Scale shape: one hash aggregate to <= 5 segment rows; noise is a
    narrow projection on the group key."""
    cust = load_table(spark, sf_dir, "customer")
    c = cust.groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("true_n"))
    h = F.md5(F.concat(F.col("c_mktsegment"), F.lit(":dp-demo-seed-42")))
    noise = (
        F.ascii(F.substring(h, 1, 1)) * 256 + F.ascii(F.substring(h, 2, 1))
    ) % 21 - 10
    return c.select(
        "c_mktsegment",
        (F.col("true_n") + noise).cast("bigint").alias("noisy_count"),
        F.lit(10).cast("int").alias("noise_bound"),
        F.lit(1.0).alias("epsilon"),
    )
