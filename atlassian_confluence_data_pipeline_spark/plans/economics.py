"""Eighteenth wave: funnel economics and concentration analytics.

- conversion latency percentiles: per converting user, the delay from
  first click to the first subsequent purchase; exact p50/p90 of the
  latency distribution by count selection (the funnel-timing metric a
  conversion report leads with),
- value-retention cohorts: the LTV-style triangle — per signup cohort
  week, summed event value by weeks-since-cohort (DECIMAL-exact) —
  the revenue-weighted sibling of weekly_cohort_retention's user
  counts,
- customer revenue concentration: the Gini coefficient of order
  revenue across customers plus top-decile share — the concentration
  diagnostic that quantifies "how skewed is this key" as a number
  (the business-side face of the engine's salting/skew machinery).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.operators.windows import (
    distributed_prefix_rank,
)
from atlassian_confluence_data_pipeline_spark.plans.registry import query

_DEC = "decimal(18,6)"

LATENCY_PROBS = (0.5, 0.9)


@query(
    "conversion_latency_percentiles",
    oracle="""
WITH fc AS (
  SELECT user_id, min(ts) AS first_click FROM events
  WHERE event_type = 'click' GROUP BY 1
), fp AS (
  SELECT e.user_id,
         min(epoch_us(e.ts) - epoch_us(fc.first_click)) AS lat_us
  FROM events e JOIN fc ON e.user_id = fc.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= fc.first_click
  GROUP BY 1
), vc AS (
  SELECT lat_us, count(*) AS c FROM fp GROUP BY 1
), cum AS (
  SELECT lat_us, sum(c) OVER (ORDER BY lat_us) AS cum,
         sum(c) OVER () AS n
  FROM vc
), p(p) AS (VALUES (0.5), (0.9))
SELECT p.p,
       CAST((SELECT count(*) FROM fp) AS BIGINT) AS n_converters,
       CAST(min(CASE WHEN cum.cum >= ceil(p.p * cum.n) THEN cum.lat_us END)
            // 1000000 AS BIGINT) AS latency_s
FROM p CROSS JOIN cum
GROUP BY p.p
""",
    tags=("events", "funnel", "latency", "percentile"),
)
def conversion_latency_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click->purchase conversion latency: per user, the delay from
    FIRST click to the first purchase at-or-after it; exact p50/p90 of
    that distribution by count selection (first value whose cumulative
    count reaches ceil(p*n) — the grouped_median_prices discipline) in
    whole seconds. The funnel-timing headline a conversion report
    leads with; integer microsecond arithmetic throughout.

    Scale shape (round-11): two hash aggregates (first click per user;
    min latency per converter), then the exact percentiles as
    kth-order statistics via kth_smallest DISTRIBUTED SELECTION with
    O(1) equal-width bucket routing over the known latency range (the
    operator's skew-refinement loop bounds the sorted task) —
    replacing the distinct-value prefix pass and its sampling job."""
    import math

    from atlassian_confluence_data_pipeline_spark.operators.windows import (
        equal_width_bucketizer,
        kth_smallest,
    )

    ev = load_table(spark, sf_dir, "events")
    fc = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_click"))
    )
    fp = (
        ev.filter(F.col("event_type") == "purchase")
        .join(fc, "user_id")
        .filter(F.col("ts") >= F.col("first_click"))
        .groupBy("user_id")
        .agg(
            F.min(
                F.unix_micros("ts") - F.unix_micros("first_click")
            ).alias("lat_us")
        )
        .localCheckpoint(eager=True)
    )
    st = fp.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("lat_us").alias("mn"),
        F.max("lat_us").alias("mx"),
    ).first()
    n_conv = int(st["n"])
    schema = "p double, n_converters bigint, latency_s bigint"
    if n_conv == 0:
        # the oracle's probe cross-joins an EMPTY cumsum: no rows
        return spark.createDataFrame([], schema)
    ks = {p: int(math.ceil(p * n_conv)) for p in LATENCY_PROBS}
    sel = kth_smallest(
        fp,
        "lat_us",
        sorted(set(ks.values())),
        bucket_of=equal_width_bucketizer(
            float(st["mn"]), float(st["mx"]), 32
        ),
    )
    return spark.createDataFrame(
        [(float(p), n_conv, int(sel[k]) // 1_000_000) for p, k in ks.items()],
        schema,
    )


@query(
    "value_retention_cohorts",
    oracle="""
WITH f AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
  FROM events GROUP BY 1
), a AS (
  SELECT e.user_id, f.cohort_week, date_trunc('week', e.ts) AS week,
         e.value
  FROM events e JOIN f ON e.user_id = f.user_id
)
SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
       CAST(date_diff('day', CAST(cohort_week AS DATE), CAST(week AS DATE))
            / 7 AS INT) AS weeks_since,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 2)
         AS total_value
FROM a GROUP BY 1, 2
""",
    tags=("events", "cohort", "ltv", "retention"),
)
def value_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-retention (LTV) triangle: users grouped by first-activity
    week, event VALUE summed per (cohort, weeks-since) cell — the
    revenue-weighted sibling of weekly_cohort_retention's user counts,
    and the input an LTV curve integrates. Sums are DECIMAL-exact.

    Scale shape: one first-activity aggregate, a broadcast of the
    |users|-row cohort map back onto events, one (cohort, week) hash
    aggregate — same geometry as the count-based triangle."""
    ev = load_table(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    a = ev.join(F.broadcast(f), "user_id").select(
        "user_id",
        "cohort_week",
        F.date_trunc("week", F.col("ts")).alias("week"),
        "value",
    )
    weeks_since = (
        F.datediff(F.col("week").cast("date"), F.col("cohort_week").cast("date"))
        / 7
    ).cast("int")
    return a.groupBy(
        F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
        weeks_since.alias("weeks_since"),
    ).agg(
        F.count_distinct("user_id").cast("bigint").alias("n_users"),
        F.round(
            F.sum(F.col("value").cast(_DEC)).cast("double"), 2
        ).alias("total_value"),
    )


@query(
    "customer_revenue_gini",
    oracle="""
WITH per_cust AS (
  SELECT o_custkey,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS rev
  FROM orders GROUP BY 1
), ranked AS (
  SELECT rev,
         row_number() OVER (ORDER BY rev, o_custkey) AS i,
         count(*) OVER () AS n
  FROM per_cust
), s AS (
  SELECT n,
         CAST(sum(CAST(rev AS DECIMAL(18,6))) AS DOUBLE) AS total,
         CAST(sum(CAST(i * rev AS DECIMAL(38,6))) AS DOUBLE) AS weighted
  FROM ranked GROUP BY n
), topd AS (
  SELECT CAST(sum(CAST(rev AS DECIMAL(18,6))) AS DOUBLE) AS top_rev
  FROM ranked WHERE i > n - (n // 10)
)
SELECT CAST(s.n AS BIGINT) AS n_customers,
       round(2.0 * s.weighted / (s.n * s.total)
             - (s.n + 1.0) / s.n, 6) AS gini,
       round(topd.top_rev / s.total, 6) AS top_decile_share
FROM s CROSS JOIN topd
""",
    tags=("analytics", "concentration", "skew"),
)
def customer_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration across customers: the Gini coefficient
    (2*sum(i*x_i)/(n*sum x) - (n+1)/n over revenue ranked ascending,
    ties broken by key) plus the top-decile revenue share — the
    number that says HOW skewed the key distribution is (the
    business-facing face of the engine's salting/skew machinery:
    a high Gini on a join key is the early warning that hot-key
    defenses will be needed). Rank-weighted sums are DECIMAL-exact so
    the coefficient is bit-stable.

    Scale shape: per-customer DECIMAL aggregate, then the two-pass
    distributed rank (operators/windows.py distributed_prefix_rank:
    range-bucket by (rev, custkey), per-bucket row_number, <= 32-row
    boundary-offset add) — no single-partition window; |customers|
    rows never funnel through one task. n is the bucket totals' sum
    (loop-control scalar), then scalar math."""
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast(_DEC)).cast("double").alias("rev")
    ).localCheckpoint(eager=True)
    n_cust = per_cust.count()
    ranked = (
        distributed_prefix_rank(
            per_cust, ["rev", "o_custkey"], rank_col="i"
        )
        .select("rev", "i", F.lit(n_cust).alias("n"))
        .localCheckpoint(eager=True)
    )
    s = ranked.groupBy("n").agg(
        F.sum(F.col("rev").cast(_DEC)).cast("double").alias("total"),
        F.sum((F.col("i") * F.col("rev")).cast("decimal(38,6)"))
        .cast("double")
        .alias("weighted"),
    )
    topd = ranked.filter(
        F.col("i") > F.col("n") - F.floor(F.col("n") / 10)
    ).agg(F.sum(F.col("rev").cast(_DEC)).cast("double").alias("top_rev"))
    return (
        s.crossJoin(topd)
        .select(
            F.col("n").cast("bigint").alias("n_customers"),
            F.round(
                2.0 * F.col("weighted") / (F.col("n") * F.col("total"))
                - (F.col("n") + 1.0) / F.col("n"),
                6,
            ).alias("gini"),
            F.round(F.col("top_rev") / F.col("total"), 6).alias(
                "top_decile_share"
            ),
        )
    )


@query(
    "rfm_customer_segments",
    oracle="""
WITH m AS (
  SELECT o_custkey,
         max(o_orderdate) AS last_d,
         count(*) AS freq,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS money
  FROM orders GROUP BY 1
), mx AS (SELECT max(last_d) AS head_d, count(*) AS n FROM m),
r AS (
  SELECT m.o_custkey,
         date_diff('day', m.last_d, mx.head_d) AS recency_days,
         m.freq, m.money, mx.n,
         row_number() OVER (ORDER BY date_diff('day', m.last_d, mx.head_d) DESC,
                            m.o_custkey) AS r_rank,
         row_number() OVER (ORDER BY m.freq, m.o_custkey) AS f_rank,
         row_number() OVER (ORDER BY m.money, m.o_custkey) AS m_rank
  FROM m CROSS JOIN mx
)
SELECT o_custkey, CAST(recency_days AS BIGINT) AS recency_days,
       CAST(freq AS BIGINT) AS frequency, round(money, 2) AS monetary,
       CAST(ceil(5.0 * r_rank / n) AS INT) AS r_score,
       CAST(ceil(5.0 * f_rank / n) AS INT) AS f_score,
       CAST(ceil(5.0 * m_rank / n) AS INT) AS m_score,
       concat(CAST(CAST(ceil(5.0 * r_rank / n) AS INT) AS VARCHAR),
              CAST(CAST(ceil(5.0 * f_rank / n) AS INT) AS VARCHAR),
              CAST(CAST(ceil(5.0 * m_rank / n) AS INT) AS VARCHAR))
         AS segment
FROM r
""",
    tags=("analytics", "rfm", "segmentation", "prefix"),
)
def rfm_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation — the classic marketing cut: per
    customer, Recency (days since last order, HIGHER rank = more
    recent), Frequency, and Monetary (DECIMAL-exact revenue), each
    converted to a 1-5 score by GLOBAL rank share (ceil(5*rank/n) —
    a closed form both engines compute identically from integer
    ranks), concatenated into the familiar '555 = best' segment code.

    Scale shape: one hash aggregate to the customer domain, then THREE
    distributed global ranks via distributed_prefix_rank (per-range
    row_number + boundary offsets — |customers| never funnels through
    one task, unlike the textbook ntile() formulation), and a narrow
    scoring projection. The head date and n are loop-control scalars."""
    o = load_table(spark, sf_dir, "orders")
    m = (
        o.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_d"),
            F.count(F.lit(1)).alias("freq"),
            F.sum(F.col("o_totalprice").cast(_DEC))
            .cast("double")
            .alias("money"),
        )
        .localCheckpoint(eager=True)
    )
    # ONE fused loop-control aggregate (head date, n, and the value
    # ranges of all three rank keys) — its min/max feed equal-width
    # split points to the three rank passes, replacing three
    # approxQuantile sampling jobs AND the separate head/count jobs
    # (round 11; bucket balance only sizes per-bucket windows, never
    # the exact global ranks)
    st = m.agg(
        F.max("last_d").alias("head"),
        F.count(F.lit(1)).alias("n"),
        F.min("last_d").alias("old_d"),
        F.min("freq").alias("f_lo"),
        F.max("freq").alias("f_hi"),
        F.min("money").alias("m_lo"),
        F.max("money").alias("m_hi"),
    ).first()
    head, n = st["head"], int(st["n"])

    def eq_bounds(lo: float, hi: float) -> list[float] | None:
        return (
            [lo + (hi - lo) * i / 32 for i in range(1, 32)]
            if n and hi > lo
            else None
        )

    max_rec = (
        (head - st["old_d"]).days if n and head and st["old_d"] else 0
    )
    base = m.select(
        "o_custkey",
        F.datediff(F.lit(head), F.col("last_d")).alias("recency_days"),
        "freq",
        "money",
    )
    # recency rank ascends with MORE recent (fewer days): order by
    # -recency so rank share maps 5 -> most recent, like freq/money
    ranked = distributed_prefix_rank(
        base.withColumn("neg_rec", -F.col("recency_days")),
        ["neg_rec", "o_custkey"],
        rank_col="r_rank",
        bounds=eq_bounds(-float(max_rec), 0.0),
    )
    ranked = distributed_prefix_rank(
        ranked,
        ["freq", "o_custkey"],
        rank_col="f_rank",
        bounds=eq_bounds(float(st["f_lo"] or 0), float(st["f_hi"] or 0)),
    )
    ranked = distributed_prefix_rank(
        ranked,
        ["money", "o_custkey"],
        rank_col="m_rank",
        bounds=eq_bounds(float(st["m_lo"] or 0), float(st["m_hi"] or 0)),
    )

    def score(rank_col: str):
        return F.ceil(5.0 * F.col(rank_col) / n).cast("int")

    return ranked.select(
        "o_custkey",
        F.col("recency_days").cast("bigint").alias("recency_days"),
        F.col("freq").cast("bigint").alias("frequency"),
        F.round("money", 2).alias("monetary"),
        score("r_rank").alias("r_score"),
        score("f_rank").alias("f_score"),
        score("m_rank").alias("m_score"),
        F.concat(
            score("r_rank").cast("string"),
            score("f_rank").cast("string"),
            score("m_rank").cast("string"),
        ).alias("segment"),
    )
