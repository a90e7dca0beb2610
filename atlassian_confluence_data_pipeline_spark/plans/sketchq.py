"""Fourteenth-wave sketch queries: portable HyperLogLog.

Two queries over operators/sketches.py:

- the estimate itself, audited against exact count(DISTINCT) with the
  relative error in-query,
- the MERGE law: per-group sketches element-wise-max-merged equal the
  sketch built over the whole table — emitted side by side, so the
  oracle hash proves merge(sketch(A), sketch(B)) == sketch(A ∪ B),
  the property that makes HLL the 100 TB distinct-counting structure
  (and the streaming cross-batch form in streaming/jobs.py safe).

Float note: every 2^-rank term is an exact dyadic with denominator
<= 2^26, so their sums are EXACT in binary64 regardless of
aggregation order — the estimator needs no ordered-fold machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.functions.text import ROLLING_MOD
from atlassian_confluence_data_pipeline_spark.operators.sketches import (
    HLL_M,
    hll_estimate_col,
    hll_estimate_sql,
    hll_hash,
    hll_hash_sql,
    hll_rank_sql,
    hll_registers,
)
from atlassian_confluence_data_pipeline_spark.plans.registry import query


def _hash_sql(key: str) -> str:
    return hll_hash_sql(key)


def _reg_cte(src: str, key: str, group: str | None = None) -> str:
    g = f"{group}, " if group else ""
    return f"""
h AS (
  SELECT {g}{_hash_sql(key)} AS h FROM {src}
), rr AS (
  SELECT {g}CAST(h % {HLL_M} AS INT) AS reg,
         {hll_rank_sql(f"(h // {HLL_M})")} AS rank
  FROM h
), regs AS (
  SELECT {g}reg, max(rank) AS mx FROM rr GROUP BY {"1, 2" if group else "1"}
)"""


@query(
    "hll_distinct_orders",
    oracle=f"""
WITH {_reg_cte("lineitem", "l_orderkey")},
est AS (
  SELECT {hll_estimate_sql("regs")} AS e FROM regs
), exact AS (
  SELECT count(DISTINCT l_orderkey) AS n FROM lineitem
)
SELECT round(est.e, 6) AS hll_estimate,
       CAST(exact.n AS BIGINT) AS exact_distinct,
       round(abs(est.e - exact.n) / exact.n, 6) AS rel_error
FROM est CROSS JOIN exact
""",
    tags=("sketch", "distinct", "scalepath"),
)
def hll_distinct_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable HyperLogLog distinct count of lineitem order keys,
    audited in-query against exact count(DISTINCT) — the mergeable
    constant-memory structure that replaces exact distinct counting at
    100 TB (Spark's own approx_count_distinct wraps a native HllSketch;
    this one's registers are reproducible in ANY engine, which is what
    the oracle gate and cross-system reconciliation require). Register
    ranks come from an integer CASE ladder (no CLZ, no libm); every
    2^-rank term is an exact dyadic so the estimator sum is
    order-independent by construction.

    Scale shape: one narrow hash projection, one hash aggregate to
    <= {M} register rows, constant-size final math; the exact
    count(DISTINCT) column is the fixture-scale audit the sketch
    replaces in production."""
    li = load_table(spark, sf_dir, "lineitem")
    regs = hll_registers(li, F.col("l_orderkey"))
    est = regs.agg(
        F.count(F.lit(1)).alias("n_regs"),
        F.sum(F.pow(F.lit(2.0), -F.col("mx"))).alias("sp"),
    ).select(
        hll_estimate_col(F.col("n_regs"), F.col("sp")).alias("e")
    )
    exact = li.agg(
        F.count_distinct("l_orderkey").cast("bigint").alias("n")
    )
    return est.crossJoin(exact).select(
        F.round("e", 6).alias("hll_estimate"),
        F.col("n").alias("exact_distinct"),
        F.round(F.abs(F.col("e") - F.col("n")) / F.col("n"), 6).alias(
            "rel_error"
        ),
    )


@query(
    "hll_merge_users",
    oracle=f"""
WITH {_reg_cte("events", "user_id", group="event_type")},
merged AS (
  SELECT reg, max(mx) AS mx FROM regs GROUP BY 1
), est_m AS (
  SELECT {hll_estimate_sql("merged")} AS e FROM merged
),
h2 AS (
  SELECT {_hash_sql("user_id")} AS h FROM events
), rr2 AS (
  SELECT CAST(h % {HLL_M} AS INT) AS reg,
         {hll_rank_sql(f"(h // {HLL_M})")} AS rank
  FROM h2
), regs2 AS (
  SELECT reg, max(rank) AS mx FROM rr2 GROUP BY 1
), est_d AS (
  SELECT {hll_estimate_sql("regs2")} AS e FROM regs2
), exact AS (
  SELECT count(DISTINCT user_id) AS n FROM events
)
SELECT round(est_m.e, 6) AS est_merged,
       round(est_d.e, 6) AS est_direct,
       CAST(CASE WHEN est_m.e = est_d.e THEN 1 ELSE 0 END AS INT)
         AS merge_exact_match,
       CAST(exact.n AS BIGINT) AS exact_distinct,
       round(abs(est_d.e - exact.n) / exact.n, 6) AS rel_error
FROM est_m CROSS JOIN est_d CROSS JOIN exact
""",
    tags=("sketch", "distinct", "merge", "streaming"),
)
def hll_merge_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HLL MERGE law, oracle-proven: per-event-type user sketches,
    element-wise-max-merged, produce BIT-IDENTICAL registers (and thus
    an identical estimate) to the sketch built over all events at once
    — merge(sketch(A), sketch(B)) == sketch(A ∪ B). This is the
    algebra that lets distinct counts roll up across partitions,
    days, sources, and streaming micro-batches without rescanning
    history (the streaming form lives in streaming/jobs.py's
    cross-batch state); the emitted merge_exact_match flag and the
    oracle's value hash both pin it.

    Scale shape: each group reduces map-side to <= {M} register rows;
    the merge moves |groups| x {M} tiny rows; the direct and exact
    columns are the audit baselines."""
    ev = load_table(spark, sf_dir, "events")
    per_type = hll_registers(ev, F.col("user_id"), extra_keys=("event_type",))
    merged = per_type.groupBy("reg").agg(F.max("mx").alias("mx"))
    est_m = merged.agg(
        F.count(F.lit(1)).alias("n_regs"),
        F.sum(F.pow(F.lit(2.0), -F.col("mx"))).alias("sp"),
    ).select(hll_estimate_col(F.col("n_regs"), F.col("sp")).alias("em"))
    direct = hll_registers(ev, F.col("user_id"))
    est_d = direct.agg(
        F.count(F.lit(1)).alias("n_regs"),
        F.sum(F.pow(F.lit(2.0), -F.col("mx"))).alias("sp"),
    ).select(hll_estimate_col(F.col("n_regs"), F.col("sp")).alias("ed"))
    exact = ev.agg(F.count_distinct("user_id").cast("bigint").alias("n"))
    return (
        est_m.crossJoin(est_d)
        .crossJoin(exact)
        .select(
            F.round("em", 6).alias("est_merged"),
            F.round("ed", 6).alias("est_direct"),
            F.when(F.col("em") == F.col("ed"), 1)
            .otherwise(0)
            .cast("int")
            .alias("merge_exact_match"),
            F.col("n").alias("exact_distinct"),
            F.round(F.abs(F.col("ed") - F.col("n")) / F.col("n"), 6).alias(
                "rel_error"
            ),
        )
    )


# ---------------------------------------------------------------------------
# KMV set-operation sketch + per-group HLL
# ---------------------------------------------------------------------------

#: KMV sketch size
KMV_K = 32
KMV_A_TYPE = "click"
KMV_B_TYPE = "error"


def _kmv_min_cte(name: str, etype: str) -> str:
    return f"""
{name} AS (
  SELECT DISTINCT {_hash_sql("user_id")} AS h FROM events
  WHERE event_type = '{etype}'
), {name}_k AS (
  SELECT h FROM {name} ORDER BY h LIMIT {KMV_K}
), {name}_th AS (
  SELECT max(h) AS th, count(*) AS k FROM {name}_k
)"""


@query(
    "kmv_intersection_users",
    oracle=f"""
WITH {_kmv_min_cte("a", KMV_A_TYPE)},
{_kmv_min_cte("b", KMV_B_TYPE)},
u AS (
  SELECT h FROM a UNION SELECT h FROM b
), u_k AS (
  SELECT h FROM u ORDER BY h LIMIT {KMV_K}
), u_th AS (
  SELECT max(h) AS th, count(*) AS k FROM u_k
), est AS (
  SELECT
    round((a_th.k - 1) * CAST({ROLLING_MOD} AS DOUBLE) / a_th.th, 6) AS est_a,
    round((b_th.k - 1) * CAST({ROLLING_MOD} AS DOUBLE) / b_th.th, 6) AS est_b,
    round((u_th.k - 1) * CAST({ROLLING_MOD} AS DOUBLE) / u_th.th, 6)
      AS est_union
  FROM a_th CROSS JOIN b_th CROSS JOIN u_th
), exact AS (
  SELECT count(*) AS n FROM (
    SELECT DISTINCT user_id FROM events WHERE event_type = '{KMV_A_TYPE}'
    INTERSECT
    SELECT DISTINCT user_id FROM events WHERE event_type = '{KMV_B_TYPE}'
  )
)
SELECT est.est_a, est.est_b, est.est_union,
       round(greatest(est.est_a + est.est_b - est.est_union, 0.0), 6)
         AS est_intersection,
       CAST(exact.n AS BIGINT) AS exact_intersection
FROM est CROSS JOIN exact
""",
    tags=("sketch", "distinct", "set-ops"),
)
def kmv_intersection_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) set-OPERATION sketching: estimate the
    distinct-user INTERSECTION of two event types by
    inclusion-exclusion over three k-min sketches — the set algebra
    HyperLogLog cannot do (HLL unions but never intersects). Each
    sketch is the k smallest hash values of its side; est = (k-1) *
    M / theta with theta the k-th minimum; the union sketch is the k
    smallest of the merged minima (mergeable, like every sketch in
    this engine). Exact INTERSECT rides along as the audit column.

    Scale shape: per side, one distinct + a k-row TakeOrdered — the
    sketch is k tiny rows however large the side; union/threshold math
    is constant-size. Integer hash minima cross engines bit-for-bit;
    the only doubles are the final (k-1)*M/theta ratios, identical
    expressions both sides."""
    ev = load_table(spark, sf_dir, "events")

    def side(etype: str):
        h = (
            ev.filter(F.col("event_type") == etype)
            .select(hll_hash(F.col("user_id")).alias("h"))
            .distinct()
        )
        k = h.orderBy("h").limit(KMV_K)
        return k, k.agg(
            F.max("h").alias("th"), F.count(F.lit(1)).alias("k")
        )

    ak, ath = side(KMV_A_TYPE)
    bk, bth = side(KMV_B_TYPE)
    uk = ak.union(bk).distinct().orderBy("h").limit(KMV_K)
    uth = uk.agg(F.max("h").alias("th"), F.count(F.lit(1)).alias("k"))

    def est(th, kc):
        return F.round(
            (kc - 1) * float(ROLLING_MOD) / th, 6
        )

    a1 = ath.select(est(F.col("th"), F.col("k")).alias("est_a"))
    b1 = bth.select(est(F.col("th"), F.col("k")).alias("est_b"))
    u1 = uth.select(est(F.col("th"), F.col("k")).alias("est_union"))
    exact = (
        ev.filter(F.col("event_type") == KMV_A_TYPE)
        .select("user_id")
        .intersect(
            ev.filter(F.col("event_type") == KMV_B_TYPE).select("user_id")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    return (
        a1.crossJoin(b1)
        .crossJoin(u1)
        .crossJoin(exact)
        .select(
            "est_a",
            "est_b",
            "est_union",
            F.round(
                F.greatest(
                    F.col("est_a") + F.col("est_b") - F.col("est_union"),
                    F.lit(0.0),
                ),
                6,
            ).alias("est_intersection"),
            F.col("n").alias("exact_intersection"),
        )
    )


@query(
    "hll_distinct_users_by_type",
    oracle=f"""
WITH {_reg_cte("events", "user_id", group="event_type")},
est AS (
  SELECT event_type, {hll_estimate_sql("regs")} AS e
  FROM regs GROUP BY event_type
), exact AS (
  SELECT event_type, count(DISTINCT user_id) AS n FROM events GROUP BY 1
)
SELECT est.event_type, round(est.e, 6) AS hll_estimate,
       CAST(exact.n AS BIGINT) AS exact_distinct,
       round(abs(est.e - exact.n) / exact.n, 6) AS rel_error
FROM est JOIN exact USING (event_type)
""",
    tags=("sketch", "distinct", "groupby"),
)
def hll_distinct_users_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-wise HLL: distinct users per event type from per-group
    register tables — the everyday sketched GROUP BY count(DISTINCT)
    (one pass, |groups| x 64 rows of state) with the exact per-group
    distinct as the audit column.

    Scale shape: one narrow projection + one hash aggregate to
    |groups| x 64 rows + constant per-group estimator math; the exact
    count(DISTINCT) column is the fixture-scale audit the sketch
    replaces at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    regs = hll_registers(ev, F.col("user_id"), extra_keys=("event_type",))
    est = regs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_regs"),
        F.sum(F.pow(F.lit(2.0), -F.col("mx"))).alias("sp"),
    ).select(
        "event_type",
        hll_estimate_col(F.col("n_regs"), F.col("sp")).alias("e"),
    )
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("bigint").alias("n")
    )
    return est.join(exact, "event_type").select(
        "event_type",
        F.round("e", 6).alias("hll_estimate"),
        F.col("n").alias("exact_distinct"),
        F.round(F.abs(F.col("e") - F.col("n")) / F.col("n"), 6).alias(
            "rel_error"
        ),
    )
