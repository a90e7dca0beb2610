"""Advanced statistics wave (21b): exact-moment correlation matrix,
Kaplan-Meier survival (distributed prefix form), and per-group
weighted medians.

All three are textbook statistics re-expressed for the engine's
cross-engine-exact discipline: moments and weights accumulate in
DECIMAL (associative, order-independent), closed-form float math runs
only on identical scalar inputs, and every global cumulative pass goes
through distributed_prefix_rank — no single-partition windows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.operators.windows import (
    distributed_prefix_rank,
)
from atlassian_confluence_data_pipeline_spark.plans.registry import query

#: scale 8 holds any product of two 2-decimal fixture values exactly
_DECM = "decimal(38,8)"

_CORR_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def _corr_formula(n: str, sx: str, sy: str, sxy: str, sx2: str, sy2: str) -> str:
    """Pearson r from raw moments — the identical closed form both
    engines evaluate on identical (exact) inputs."""
    return (
        f"round(({n} * {sxy} - {sx} * {sy}) / "
        f"(sqrt({n} * {sx2} - {sx} * {sx}) * "
        f"sqrt({n} * {sy2} - {sy} * {sy})), 6)"
    )


def _sql_corr_cte() -> str:
    sums = ["count(*) AS n"]
    for c in _CORR_COLS:
        sums.append(
            f"CAST(sum(CAST({c} AS DECIMAL(38,8))) AS DOUBLE) AS s_{c}"
        )
        sums.append(
            f"CAST(sum(CAST({c} AS DECIMAL(38,8)) * CAST({c} AS DECIMAL(38,8)))"
            f" AS DOUBLE) AS q_{c}"
        )
    for i, x in enumerate(_CORR_COLS):
        for y in _CORR_COLS[i + 1:]:
            sums.append(
                f"CAST(sum(CAST({x} AS DECIMAL(38,8)) * CAST({y} AS DECIMAL(38,8)))"
                f" AS DOUBLE) AS p_{x}_{y}"
            )
    return "SELECT " + ", ".join(sums) + " FROM lineitem"


def _sql_corr_rows() -> str:
    rows = []
    for i, x in enumerate(_CORR_COLS):
        for y in _CORR_COLS[i + 1:]:
            expr = _corr_formula("n", f"s_{x}", f"s_{y}", f"p_{x}_{y}", f"q_{x}", f"q_{y}")
            rows.append(
                f"SELECT '{x}' AS col_x, '{y}' AS col_y, {expr} AS corr FROM m"
            )
    return "\nUNION ALL\n".join(rows)


@query(
    "numeric_correlation_matrix",
    oracle=f"WITH m AS ({_sql_corr_cte()})\n{_sql_corr_rows()}",
    tags=("analytics", "statistics", "exact"),
)
def numeric_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix over lineitem's numeric
    columns (quantity, price, discount, tax), unpivoted to
    (col_x, col_y, corr) rows — the data-profiling step that decides
    which features are redundant before training.

    Exactness: built-in ``corr()`` accumulates doubles in partition
    order, so Spark and DuckDB drift in the last ULP; instead ONE hash
    aggregate collects all raw moments (sums, squares, cross products)
    exactly, and Pearson r is the identical closed form on those
    identical scalars: bit-equal output. Round 12: the 2-decimal
    fixture values convert ONCE per row to exact integer cents, so
    every product is a primitive long multiply and every sum a
    compact-representation DECIMAL(38,0) fold (no per-row BigDecimal
    multiply); the exact rescale back to units happens once per moment
    in DECIMAL before the double cast — the identical rational, hence
    the identical double, as the former DECIMAL(38,8) arithmetic. The
    single-split fixture scan is spread over the cores (spread_scan,
    conditional — a no-op whenever the source supplies real splits).
    Scale: a single map-side-combined aggregate over the fact table;
    the 6-row matrix assembly is driver-free column arithmetic on a
    1-row frame."""
    from atlassian_confluence_data_pipeline_spark.operators.skew import (
        spread_scan,
    )

    li = spread_scan(
        load_table(spark, sf_dir, "lineitem").select(*_CORR_COLS)
    )

    def _dec(col: Column) -> Column:
        return col.cast("decimal(38,0)")

    cents = {
        c: (F.col(c).cast("decimal(18,2)") * 100).cast("bigint")
        for c in _CORR_COLS
    }
    aggs = [F.count(F.lit(1)).cast("double").alias("n")]
    for c in _CORR_COLS:
        aggs.append(
            (F.sum(_dec(cents[c])) / 100).cast("double").alias(f"s_{c}")
        )
        aggs.append(
            (F.sum(_dec(cents[c] * cents[c])) / 10000)
            .cast("double")
            .alias(f"q_{c}")
        )
    for i, x in enumerate(_CORR_COLS):
        for y in _CORR_COLS[i + 1:]:
            aggs.append(
                (F.sum(_dec(cents[x] * cents[y])) / 10000)
                .cast("double")
                .alias(f"p_{x}_{y}")
            )
    m = li.agg(*aggs)

    def r(x: str, y: str) -> Column:
        n, sx, sy = F.col("n"), F.col(f"s_{x}"), F.col(f"s_{y}")
        sxy, sx2, sy2 = F.col(f"p_{x}_{y}"), F.col(f"q_{x}"), F.col(f"q_{y}")
        return F.round(
            (n * sxy - sx * sy)
            / (F.sqrt(n * sx2 - sx * sx) * F.sqrt(n * sy2 - sy * sy)),
            6,
        )

    pairs = [
        (x, y) for i, x in enumerate(_CORR_COLS) for y in _CORR_COLS[i + 1:]
    ]
    # one explode over a per-pair struct array instead of a 6-branch
    # union: the union form re-planned the whole moment aggregate per
    # branch (6 copies of the scan subtree in the plan, held together
    # only by runtime exchange reuse); this keeps ONE aggregate subtree
    # and emits the same 6 rows from a single projection (round 12)
    entries = F.array(
        *[
            F.struct(
                F.lit(x).alias("col_x"),
                F.lit(y).alias("col_y"),
                r(x, y).alias("corr"),
            )
            for x, y in pairs
        ]
    )
    return m.select(F.explode(entries).alias("e")).select(
        "e.col_x", "e.col_y", "e.corr"
    )


# ---------------------------------------------------------------------------
# Kaplan-Meier survival
# ---------------------------------------------------------------------------

#: a customer whose last order predates the corpus head by this many
#: days is treated as churned (event); later = censored at corpus end
CHURN_HORIZON_DAYS = 90


@query(
    "kaplan_meier_churn",
    oracle=f"""
WITH life AS (
  SELECT o_custkey,
         date_diff('day', min(o_orderdate), max(o_orderdate)) AS duration,
         max(o_orderdate) AS last_d
  FROM orders GROUP BY 1
), head AS (SELECT max(last_d) AS head_d FROM life),
lab AS (
  SELECT duration,
         CASE WHEN date_diff('day', last_d, head.head_d)
                   > {CHURN_HORIZON_DAYS} THEN 1 ELSE 0 END AS event
  FROM life CROSS JOIN head
), byd AS (
  SELECT duration,
         CAST(sum(event) AS BIGINT) AS n_events,
         CAST(count(*) AS BIGINT) AS n_leaving
  FROM lab GROUP BY 1
), risk AS (
  SELECT duration, n_events,
         CAST((SELECT sum(n_leaving) FROM byd) -
           coalesce(sum(n_leaving) OVER (ORDER BY duration
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS n_at_risk
  FROM byd
), terms AS (
  SELECT duration, n_events, n_at_risk,
         CASE WHEN n_events = 0 THEN CAST(0 AS DECIMAL(28,12))
              WHEN n_events < n_at_risk THEN
                CAST(round(ln(1.0 - CAST(n_events AS DOUBLE) / n_at_risk), 9)
                     AS DECIMAL(28,12))
              ELSE NULL END AS lnterm,
         CASE WHEN n_events >= n_at_risk THEN 1 ELSE 0 END AS hit_zero
  FROM risk
)
SELECT CAST(duration AS BIGINT) AS duration_days, n_at_risk, n_events,
       CASE WHEN max(hit_zero) OVER w = 1 THEN 0.0
            ELSE round(exp(CAST(sum(lnterm) OVER w AS DOUBLE)), 6)
       END AS survival
FROM terms
WINDOW w AS (ORDER BY duration ROWS UNBOUNDED PRECEDING)
""",
    tags=("analytics", "survival", "prefix"),
)
def kaplan_meier_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve of customer lifetimes: duration =
    days between a customer's first and last order; the 'death' event
    is churn (last order more than CHURN_HORIZON_DAYS before the
    corpus head date), customers still active at the head are censored.
    S(t) = prod over event times <= t of (1 - d_t / n_t) — the standard
    product-limit estimator with right censoring.

    Scale shape (round-11): the lifetime frame and head date ride the
    session-staged survival stages (plans/_cache.py); everything past
    the duration-domain aggregate runs as UNPARTITIONED windows over
    the CALENDAR-BOUNDED duration domain (<= ~2.6k rows for the 7-year
    fixture — bounded by time span, not corpus size; the
    daily_revenue_locf discipline, measured-bound allowlisted in
    tools/plan_audit.py) — replacing two distributed-prefix passes,
    three checkpoints and two loop-control collects with ONE lazy
    plan. The product runs in log space with each ln term rounded to
    9 decimals and summed in DECIMAL(28,12): exact, order-independent,
    and identical in both engines. Rows where d_t == n_t (survival
    hits exact zero) propagate through a prefix max flag instead of
    ln(0)."""
    from atlassian_confluence_data_pipeline_spark.plans._cache import (
        customer_lifetimes,
        lifetime_head,
    )

    life = customer_lifetimes(spark, sf_dir)
    head_d = lifetime_head(spark, sf_dir)
    byd = (
        life.select(
            "duration",
            F.when(
                F.datediff(F.lit(head_d), F.col("last_d")) > CHURN_HORIZON_DAYS,
                F.lit(1),
            ).otherwise(F.lit(0)).alias("event"),
        )
        .groupBy("duration")
        .agg(
            F.sum("event").cast("bigint").alias("n_events"),
            F.count(F.lit(1)).cast("bigint").alias("n_leaving"),
        )
    )
    w_tot = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_excl = Window.orderBy("duration").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_incl = Window.orderBy("duration").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = byd.select(
        "duration",
        "n_events",
        (
            F.sum("n_leaving").over(w_tot)
            - F.coalesce(F.sum("n_leaving").over(w_excl), F.lit(0))
        ).alias("n_at_risk"),
    )
    frac = F.col("n_events").cast("double") / F.col("n_at_risk")
    terms = risk.select(
        "duration",
        "n_events",
        "n_at_risk",
        F.when(F.col("n_events") == 0, F.lit(0).cast("decimal(28,12)"))
        .when(
            F.col("n_events") < F.col("n_at_risk"),
            F.round(F.log(F.lit(1.0) - frac), 9).cast("decimal(28,12)"),
        )
        .otherwise(F.lit(None).cast("decimal(28,12)"))
        .alias("lnterm"),
        F.when(F.col("n_events") >= F.col("n_at_risk"), F.lit(1))
        .otherwise(F.lit(0))
        .alias("hit_zero"),
    )
    acc = terms.select(
        "duration",
        "n_events",
        "n_at_risk",
        F.sum(F.coalesce("lnterm", F.lit(0).cast("decimal(28,12)")))
        .over(w_incl)
        .alias("cum_ln"),
        F.max("hit_zero").over(w_incl).alias("zero"),
    )
    return acc.select(
        F.col("duration").cast("bigint").alias("duration_days"),
        F.col("n_at_risk").cast("bigint").alias("n_at_risk"),
        "n_events",
        F.when(F.col("zero") == 1, F.lit(0.0))
        .otherwise(F.round(F.exp(F.col("cum_ln").cast("double")), 6))
        .alias("survival"),
    )


# ---------------------------------------------------------------------------
# Weighted median per group
# ---------------------------------------------------------------------------

@query(
    "weighted_median_price",
    oracle="""
WITH w AS (
  SELECT p.p_brand,
         l.l_extendedprice AS price,
         sum(CAST(l.l_quantity AS DECIMAL(18,6))) AS wt
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1, 2
), c AS (
  SELECT p_brand, price, wt,
         sum(wt) OVER (PARTITION BY p_brand ORDER BY price
                       ROWS UNBOUNDED PRECEDING) AS cw,
         sum(wt) OVER (PARTITION BY p_brand) AS tw
  FROM w
)
SELECT p_brand,
       round(min(price), 2) AS weighted_median_price,
       round(CAST(max(tw) AS DOUBLE), 2) AS total_weight
FROM c
WHERE 2 * cw >= tw
GROUP BY 1
""",
    tags=("analytics", "window", "statistics"),
)
def weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median line price per brand: the smallest
    price whose cumulative quantity weight reaches half the brand's
    total — the robust 'typical transaction price' a mean can't give.

    Scale shape: the fact table collapses to the (brand, distinct
    price) domain first (hash aggregate with map-side combine; 2-decimal
    prices bound the domain regardless of corpus size), the cumulative
    weight runs per-brand — a PARTITIONED window, every brand hashed to
    its own task — and the 2*cw >= tw comparison is exact DECIMAL, so
    both engines pick the identical crossing row. Broadcast join brings
    part's brand to lineitem without shuffling the fact side."""
    from pyspark.sql import Window

    from atlassian_confluence_data_pipeline_spark.operators.skew import (
        spread_scan,
    )

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    # Integer-micros weights (round 12): the quantity weight is an exact
    # 6-decimal rational, so summing its unscaled micros as a PLAIN LONG
    # keeps the domain aggregate and both per-brand windows on the
    # primitive codegen path instead of per-row Decimal buffers; the
    # 2*cw >= tw crossing compares the same exact integers, and the
    # reported total rescales once per brand in DECIMAL (same rational,
    # same double). Per-group budgets: micros <= 5e7/row, so a
    # (brand, price) cell overflows only past ~1.8e11 rows and a brand's
    # window total only past ~3.7e11 rows — a 100 TB lineitem holds
    # ~2.4e10 rows per brand (15x headroom).
    w = (
        spread_scan(
            li.select("l_partkey", "l_extendedprice", "l_quantity")
        )
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .groupBy("p_brand", F.col("l_extendedprice").alias("price"))
        .agg(
            F.sum(
                (F.col("l_quantity").cast("decimal(18,6)") * 1_000_000)
                .cast("bigint")
            ).alias("wt")
        )
    )
    win = (
        Window.partitionBy("p_brand")
        .orderBy("price")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = Window.partitionBy("p_brand")
    c = w.select(
        "p_brand",
        "price",
        F.sum("wt").over(win).alias("cw"),
        F.sum("wt").over(tot).alias("tw"),
    )
    return (
        c.filter(F.lit(2) * F.col("cw") >= F.col("tw"))
        .groupBy("p_brand")
        .agg(
            F.round(F.min("price"), 2).alias("weighted_median_price"),
            F.round(
                (F.max("tw").cast("decimal(38,6)") / 1_000_000).cast(
                    "double"
                ),
                2,
            ).alias("total_weight"),
        )
    )


@query(
    "nelson_aalen_hazard",
    oracle=f"""
WITH life AS (
  SELECT o_custkey,
         date_diff('day', min(o_orderdate), max(o_orderdate)) AS duration,
         max(o_orderdate) AS last_d
  FROM orders GROUP BY 1
), head AS (SELECT max(last_d) AS head_d FROM life),
lab AS (
  SELECT duration,
         CASE WHEN date_diff('day', last_d, head.head_d)
                   > {CHURN_HORIZON_DAYS} THEN 1 ELSE 0 END AS event
  FROM life CROSS JOIN head
), byd AS (
  SELECT duration,
         CAST(sum(event) AS BIGINT) AS n_events,
         CAST(count(*) AS BIGINT) AS n_leaving
  FROM lab GROUP BY 1
), risk AS (
  SELECT duration, n_events,
         CAST((SELECT sum(n_leaving) FROM byd) -
           coalesce(sum(n_leaving) OVER (ORDER BY duration
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS n_at_risk
  FROM byd
)
SELECT CAST(duration AS BIGINT) AS duration_days, n_at_risk, n_events,
       round(CAST(sum(CAST(round(CAST(n_events AS DOUBLE) / n_at_risk, 9)
                           AS DECIMAL(28,12)))
             OVER (ORDER BY duration ROWS UNBOUNDED PRECEDING)
             AS DOUBLE), 6) AS cumulative_hazard
FROM risk
""",
    tags=("analytics", "survival", "prefix"),
)
def nelson_aalen_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative hazard H(t) = sum over event times <= t
    of d_t / n_t — the additive sibling of kaplan_meier_churn's
    product-limit S(t) (H ~ -ln S for small increments; preferred when
    comparing hazard slopes between cohorts). Same right-censored
    customer-lifetime cohort, same distributed machinery: at-risk
    counts and hazard sums both as UNPARTITIONED windows over the
    CALENDAR-BOUNDED duration domain (round-11, the kaplan_meier_churn
    treatment: one lazy plan over the session-staged lifetime frame —
    zero per-build checkpoints/collects), each d/n increment rounded
    to 9 decimals and summed in DECIMAL(28,12) so partition order
    cannot move the hash."""
    from atlassian_confluence_data_pipeline_spark.plans._cache import (
        customer_lifetimes,
        lifetime_head,
    )

    life = customer_lifetimes(spark, sf_dir)
    head_d = lifetime_head(spark, sf_dir)
    byd = (
        life.select(
            "duration",
            F.when(
                F.datediff(F.lit(head_d), F.col("last_d")) > CHURN_HORIZON_DAYS,
                F.lit(1),
            ).otherwise(F.lit(0)).alias("event"),
        )
        .groupBy("duration")
        .agg(
            F.sum("event").cast("bigint").alias("n_events"),
            F.count(F.lit(1)).cast("bigint").alias("n_leaving"),
        )
    )
    w_tot = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_excl = Window.orderBy("duration").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_incl = Window.orderBy("duration").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = byd.select(
        "duration",
        "n_events",
        (
            F.sum("n_leaving").over(w_tot)
            - F.coalesce(F.sum("n_leaving").over(w_excl), F.lit(0))
        ).alias("n_at_risk"),
    )
    inc = F.round(
        F.col("n_events").cast("double") / F.col("n_at_risk"), 9
    ).cast("decimal(28,12)")
    acc = risk.select(
        "duration",
        "n_events",
        "n_at_risk",
        F.sum(inc).over(w_incl).alias("cum_h"),
    )
    return acc.select(
        F.col("duration").cast("bigint").alias("duration_days"),
        F.col("n_at_risk").cast("bigint").alias("n_at_risk"),
        "n_events",
        F.round(F.col("cum_h").cast("double"), 6).alias("cumulative_hazard"),
    )
