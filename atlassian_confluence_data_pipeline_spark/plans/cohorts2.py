"""Customer-economics wave (42): cohort LTV curves, spend-tier
migration matrix, and the new-vs-returning revenue split.

The growth-analytics trio every retail warehouse serves daily: how
much cumulative revenue a signup cohort produces per member as it ages
(the LTV triangle), how customers move between spend tiers across
periods (the migration matrix — deciles cut by EXACT order statistics
via kth_smallest), and what share of each month's revenue comes from
first-ever orders (acquisition vs retention). All money is exact
DECIMAL cents; the only windows are cohort-keyed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.operators.windows import (
    equal_width_bucketizer,
    kth_smallest,
)
from atlassian_confluence_data_pipeline_spark.plans.registry import query

#: number of spend tiers in the migration matrix
_N_TIERS = 4

#: period split for the migration matrix
_MIGRATION_SPLIT = "1998-07-01"

_DEC = "decimal(18,2)"


@query(
    "cohort_ltv_curves",
    oracle="""
WITH firstm AS (
  SELECT o_custkey,
         date_trunc('month', min(CAST(o_orderdate AS DATE)))
           AS cohort_month
  FROM orders GROUP BY 1
), sized AS (
  SELECT cohort_month, CAST(count(*) AS BIGINT) AS cohort_size
  FROM firstm GROUP BY 1
), rev AS (
  SELECT f.cohort_month,
         CAST((extract(year FROM o_orderdate)
               - extract(year FROM f.cohort_month)) * 12
              + (extract(month FROM o_orderdate)
                 - extract(month FROM f.cohort_month)) AS BIGINT)
           AS month_age,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
           AS cents
  FROM orders o JOIN firstm f ON f.o_custkey = o.o_custkey
  GROUP BY 1, 2
), cum AS (
  SELECT cohort_month, month_age,
         sum(cents) OVER (PARTITION BY cohort_month ORDER BY month_age
                          ROWS UNBOUNDED PRECEDING) AS cum_cents
  FROM rev
)
SELECT strftime(cum.cohort_month, '%Y-%m') AS cohort_month,
       cum.month_age,
       sized.cohort_size,
       round(CAST((cum.cum_cents // sized.cohort_size) AS DOUBLE) / 100, 2)
         AS cum_ltv_per_customer
FROM cum JOIN sized USING (cohort_month)
""",
    tags=("cohorts", "ltv", "window"),
)
def cohort_ltv_curves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV triangle: customers grouped by first-order month,
    cumulative revenue per cohort member by months since acquisition —
    the curve whose plateau IS customer lifetime value, and whose
    cohort-over-cohort shift is the earliest health signal a retention
    team gets.

    Scale shape: first-order month is one customer-domain aggregate;
    the (cohort, month_age) revenue cells aggregate in a second pass;
    the cumulative sum is a COHORT-KEYED window over the bounded
    month-age axis (at most a few hundred rows per cohort regardless of
    corpus size) — never global."""
    o = load_table(spark, sf_dir, "orders")
    firstm = o.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min(F.to_date("o_orderdate"))).alias(
            "cohort_month"
        )
    ).localCheckpoint(eager=True)
    sized = firstm.groupBy("cohort_month").agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_size")
    )
    month_age = (
        (F.year("o_orderdate") - F.year("cohort_month")) * 12
        + (F.month("o_orderdate") - F.month("cohort_month"))
    ).cast("bigint")
    rev = (
        o.join(firstm, "o_custkey")
        .groupBy("cohort_month", month_age.alias("month_age"))
        .agg(
            (F.sum(F.col("o_totalprice").cast(_DEC)) * 100)
            .cast("bigint")
            .alias("cents")
        )
    )
    w = (
        Window.partitionBy("cohort_month")
        .orderBy("month_age")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = rev.withColumn("cum_cents", F.sum("cents").over(w))
    return cum.join(F.broadcast(sized), "cohort_month").select(
        F.date_format("cohort_month", "yyyy-MM").alias("cohort_month"),
        "month_age",
        "cohort_size",
        # integer floor-division to whole cents per customer BEFORE the
        # float conversion — a ratio of bigints can land exactly on a
        # .xx5 rounding tie and flip between engines; floored cents
        # cannot (2-dec grid points never sit near a round boundary)
        F.round(
            F.expr("cum_cents div cohort_size").cast("double") / 100, 2
        ).alias("cum_ltv_per_customer"),
    )


@query(
    "segment_migration_matrix",
    oracle=None,  # oracle assembled at runtime (tier cuts are data-driven);
    # see _migration_oracle — registered below with the literal bounds
    tags=("cohorts", "migration", "selection"),
)
def segment_migration_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spend-tier migration matrix: customers are cut into {_N_TIERS}
    tiers by EXACT quartile boundaries of per-customer spend (cents) in
    each half of the timeline, then cross-tabulated — tier 0 means
    'absent in that period', so the matrix's border rows ARE the
    acquisition and churn counts. The retention team's
    where-did-my-whales-go readout.

    Scale shape: two customer-domain spend aggregates (one per
    period); tier boundaries are kth_smallest distributed SELECTION
    (never a global rank); tier assignment is a literal CASE; the
    matrix is a ({_N_TIERS}+1)² bounded aggregate over a full-outer
    join of the two period frames."""
    o = load_table(spark, sf_dir, "orders")

    def spend(pred) -> DataFrame:
        return (
            o.filter(pred)
            .groupBy("o_custkey")
            .agg(
                (F.sum(F.col("o_totalprice").cast(_DEC)) * 100)
                .cast("bigint")
                .alias("cents")
            )
        )

    early = spend(
        F.to_date("o_orderdate") < F.lit(_MIGRATION_SPLIT)
    ).localCheckpoint(eager=True)
    late = spend(
        F.to_date("o_orderdate") >= F.lit(_MIGRATION_SPLIT)
    ).localCheckpoint(eager=True)

    def bounds(df: DataFrame) -> list[int]:
        # ONE fused count/min/max aggregate feeds O(1) equal-width
        # bucket routing to the selection — no approxQuantile sampling
        # pass (round 11; the operator's skew-refinement loop bounds
        # the sorted task if spend mass concentrates)
        st = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.min("cents").alias("mn"),
            F.max("cents").alias("mx"),
        ).first()
        n = int(st["n"])
        # keep the FULL boundary list (duplicate ranks produce repeated
        # boundary values — the oracle's list indexing does the same,
        # and tier = 1 + #(boundaries strictly below) must agree)
        ks = [max(1, (n * i) // _N_TIERS) for i in range(1, _N_TIERS)]
        sel = kth_smallest(
            df,
            "cents",
            ks,
            bucket_of=equal_width_bucketizer(
                float(st["mn"]), float(st["mx"]), 32
            ),
        )
        return [int(sel[k]) for k in ks]

    be, bl = bounds(early), bounds(late)

    def tier(col, bs: list[int]):
        expr = F.lit(_N_TIERS)
        for i in range(len(bs) - 1, -1, -1):
            expr = F.when(F.col(col) <= bs[i], F.lit(i + 1)).otherwise(expr)
        return expr

    e = early.select(
        "o_custkey", tier("cents", be).cast("int").alias("tier_early")
    )
    lt = late.select(
        "o_custkey", tier("cents", bl).cast("int").alias("tier_late")
    )
    j = e.join(lt, "o_custkey", "full_outer").select(
        F.coalesce("tier_early", F.lit(0)).alias("tier_early"),
        F.coalesce("tier_late", F.lit(0)).alias("tier_late"),
    )
    return j.groupBy("tier_early", "tier_late").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers")
    )


def _migration_oracle() -> None:
    """Attach the SQL oracle: DuckDB recomputes the SAME exact quartile
    boundaries by indexing the sorted per-period spend list (list
    comprehension over the rank positions), so the oracle verifies the
    full pipeline INCLUDING the kth_smallest selection."""
    import dataclasses

    from atlassian_confluence_data_pipeline_spark.plans.registry import (
        QUERIES,
    )

    oracle = f"""
WITH early AS (
  SELECT o_custkey,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
           AS cents
  FROM orders WHERE CAST(o_orderdate AS DATE) < DATE '{_MIGRATION_SPLIT}'
  GROUP BY 1
), late AS (
  SELECT o_custkey,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
           AS cents
  FROM orders WHERE CAST(o_orderdate AS DATE) >= DATE '{_MIGRATION_SPLIT}'
  GROUP BY 1
), eb AS (
  SELECT list(cents ORDER BY cents) AS v, count(*) AS n FROM early
), lb AS (
  SELECT list(cents ORDER BY cents) AS v, count(*) AS n FROM late
), et AS (
  SELECT o_custkey,
         1 + len(list_filter(
               [eb.v[greatest(1, (eb.n * i) // {_N_TIERS})]
                for i in range(1, {_N_TIERS})],
               b -> early.cents > b)) AS tier_early
  FROM early CROSS JOIN eb
), ltr AS (
  SELECT o_custkey,
         1 + len(list_filter(
               [lb.v[greatest(1, (lb.n * i) // {_N_TIERS})]
                for i in range(1, {_N_TIERS})],
               b -> late.cents > b)) AS tier_late
  FROM late CROSS JOIN lb
)
SELECT CAST(coalesce(et.tier_early, 0) AS INT) AS tier_early,
       CAST(coalesce(ltr.tier_late, 0) AS INT) AS tier_late,
       CAST(count(*) AS BIGINT) AS n_customers
FROM et FULL OUTER JOIN ltr USING (o_custkey)
GROUP BY 1, 2
"""
    spec = QUERIES["segment_migration_matrix"]
    QUERIES["segment_migration_matrix"] = dataclasses.replace(
        spec, oracle=oracle
    )


_migration_oracle()


@query(
    "new_vs_returning_revenue",
    oracle="""
WITH firstd AS (
  SELECT o_custkey, min(CAST(o_orderdate AS DATE)) AS first_d
  FROM orders GROUP BY 1
)
SELECT strftime(date_trunc('month', CAST(o_orderdate AS DATE)), '%Y-%m')
         AS month,
       CAST(sum(CASE WHEN CAST(o_orderdate AS DATE) = firstd.first_d
                THEN 1 ELSE 0 END) AS BIGINT) AS n_new_orders,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(CAST(sum(CASE WHEN CAST(o_orderdate AS DATE) = firstd.first_d
                 THEN CAST(o_totalprice AS DECIMAL(18,2))
                 ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE), 2)
         AS new_revenue,
       round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
         AS total_revenue
FROM orders JOIN firstd USING (o_custkey)
GROUP BY 1
""",
    tags=("cohorts", "acquisition", "agg"),
)
def new_vs_returning_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue split between FIRST-EVER orders (acquisition)
    and repeat orders (retention) — the top-line growth decomposition:
    a flat total with shrinking new_revenue is a retention business; the
    reverse is a leaky bucket.

    Scale shape: the first-order date is one customer-domain aggregate
    joined back on the customer key; the report is one month-domain
    aggregate with exact DECIMAL revenue — two shuffles total, both
    keyed."""
    o = load_table(spark, sf_dir, "orders")
    firstd = o.groupBy("o_custkey").agg(
        F.min(F.to_date("o_orderdate")).alias("first_d")
    )
    is_new = F.to_date("o_orderdate") == F.col("first_d")
    return (
        o.join(firstd, "o_custkey")
        .groupBy(
            F.date_format(
                F.date_trunc("month", F.to_date("o_orderdate")), "yyyy-MM"
            ).alias("month")
        )
        .agg(
            F.sum(F.when(is_new, 1).otherwise(0))
            .cast("bigint")
            .alias("n_new_orders"),
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.round(
                F.sum(
                    F.when(
                        is_new, F.col("o_totalprice").cast(_DEC)
                    ).otherwise(F.lit(0).cast(_DEC))
                ).cast("double"),
                2,
            ).alias("new_revenue"),
            F.round(
                F.sum(F.col("o_totalprice").cast(_DEC)).cast("double"), 2
            ).alias("total_revenue"),
        )
    )
