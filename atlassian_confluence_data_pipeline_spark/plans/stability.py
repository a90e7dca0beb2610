"""Distribution-stability and uncertainty analytics (round-6 wave 2):
PSI drift, Kendall's tau-b, deterministic Poisson bootstrap, Lorenz
deciles, day-of-week seasonality.

Reference parity note: the reference pipeline (`/root/reference`) has no
statistics; driver-mandate §2.11 extension surface.

Float discipline: counts and cents stay integer-exact; libm terms (ln)
are 9-rounded and DECIMAL-summed; products that would overflow int64
cast to double FIRST with the identical expression on both engines; the
bootstrap's randomness is a portable affine hash, so both engines draw
the same pseudo-Poisson weights.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.plans.registry import query

#: PSI period split (orders span 1992-1998)
PSI_SPLIT = "1995-06-01"

#: deterministic bootstrap: replicate count + a portable two-round LCG
#: over the Mersenne-31 modulus. The key is pre-reduced mod M so the
#: first product stays < 2^62 at ANY key magnitude (100 TB keys
#: included); a single affine pass is a ramp at fixture key ranges (it
#: never wraps M — caught when every Poisson weight came out 0), the
#: second multiplicative round mixes it uniform.
BOOT_REPS = 32
BOOT_A1 = 1103515245
BOOT_A2 = 69069
BOOT_C1 = 12345
BOOT_C2 = 362437
BOOT_MOD = (1 << 31) - 1

#: Poisson(1) CDF cutpoints (w = k iff u < cdf[k], else k+1; capped at 6)
_POIS_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238463,
    0.9963401531726563,
    0.9994058151824183,
)


@query(
    "psi_order_priority",
    oracle=f"""
WITH lab AS (
  SELECT o_orderpriority AS priority,
         CASE WHEN CAST(o_orderdate AS DATE) < DATE '{PSI_SPLIT}'
              THEN 1 ELSE 0 END AS early
  FROM orders
), c AS (
  SELECT priority,
         CAST(sum(early) AS BIGINT) AS ce,
         CAST(sum(1 - early) AS BIGINT) AS cl
  FROM lab GROUP BY 1
), tot AS (
  SELECT CAST(sum(ce) AS DOUBLE) AS te, CAST(sum(cl) AS DOUBLE) AS tl FROM c
), term AS (
  SELECT priority, ce, cl,
         CAST(ce AS DOUBLE) / te AS p,
         CAST(cl AS DOUBLE) / tl AS q,
         round((CAST(ce AS DOUBLE) / te - CAST(cl AS DOUBLE) / tl)
               * ln((CAST(ce AS DOUBLE) / te) / (CAST(cl AS DOUBLE) / tl)),
               9) AS contrib
  FROM c, tot
)
SELECT priority, ce AS n_early, cl AS n_late,
       round(p, 6) AS p_early, round(q, 6) AS p_late,
       round(contrib, 6) AS psi_contrib
FROM term
UNION ALL
SELECT '_PSI_', CAST(sum(ce) AS BIGINT), CAST(sum(cl) AS BIGINT), 1.0, 1.0,
       round(CAST(sum(CAST(contrib AS DECIMAL(28,12))) AS DOUBLE), 6)
FROM term
""",
    tags=("drift", "monitoring", "distribution"),
)
def psi_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of the order-priority mix between the
    early (< {S}) and late halves of the corpus — the standard
    is-my-input-distribution-drifting gate scoring models are monitored
    with (PSI < 0.1 stable, > 0.25 action). Per-category contributions
    plus the '_PSI_' total row.

    Scale shape: one hash aggregate to the bounded priority table;
    (p-q)*ln(p/q) terms are 9-rounded and DECIMAL-summed (order-free,
    libm-drift-proof)."""
    o = load_table(spark, sf_dir, "orders")
    c = (
        o.select(
            F.col("o_orderpriority").alias("priority"),
            F.when(
                F.to_date("o_orderdate") < F.lit(PSI_SPLIT), 1
            ).otherwise(0).alias("early"),
        )
        .groupBy("priority")
        .agg(
            F.sum("early").cast("bigint").alias("ce"),
            F.sum(1 - F.col("early")).cast("bigint").alias("cl"),
        )
        .localCheckpoint(eager=True)
    )
    tot = c.agg(
        F.sum("ce").cast("double").alias("te"),
        F.sum("cl").cast("double").alias("tl"),
    ).first()
    te, tl = float(tot["te"]), float(tot["tl"])
    p = F.col("ce").cast("double") / F.lit(te)
    q = F.col("cl").cast("double") / F.lit(tl)
    term = c.select(
        "priority",
        "ce",
        "cl",
        p.alias("p"),
        q.alias("q"),
        F.round((p - q) * F.log(p / q), 9).alias("contrib"),
    ).localCheckpoint(eager=True)
    per = term.select(
        "priority",
        F.col("ce").alias("n_early"),
        F.col("cl").alias("n_late"),
        F.round("p", 6).alias("p_early"),
        F.round("q", 6).alias("p_late"),
        F.round("contrib", 6).alias("psi_contrib"),
    )
    total = term.agg(
        F.lit("_PSI_").alias("priority"),
        F.sum("ce").cast("bigint").alias("n_early"),
        F.sum("cl").cast("bigint").alias("n_late"),
        F.lit(1.0).alias("p_early"),
        F.lit(1.0).alias("p_late"),
        F.round(
            F.sum(F.col("contrib").cast("decimal(28,12)")).cast("double"), 6
        ).alias("psi_contrib"),
    )
    return per.unionByName(total)


@query(
    "kendall_tau_qty_discount",
    oracle="""
WITH g AS (
  SELECT CAST(round(l_quantity) AS BIGINT) AS x,
         CAST(round(l_discount * 100) AS BIGINT) AS y,
         CAST(count(*) AS BIGINT) AS c
  FROM lineitem GROUP BY 1, 2
), n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM g),
pairs AS (
  SELECT
    CAST(sum(CASE WHEN a.y < b.y THEN CAST(a.c * b.c AS DECIMAL(38,0))
                  ELSE CAST(0 AS DECIMAL(38,0)) END) AS BIGINT) AS conc,
    CAST(sum(CASE WHEN a.y > b.y THEN CAST(a.c * b.c AS DECIMAL(38,0))
                  ELSE CAST(0 AS DECIMAL(38,0)) END) AS BIGINT) AS disc
  FROM g a JOIN g b ON a.x < b.x
), tx AS (
  SELECT CAST(sum(CAST(cx * (cx - 1) / 2 AS DECIMAL(38,0))) AS BIGINT) AS t
  FROM (SELECT sum(c) AS cx FROM g GROUP BY x)
), ty AS (
  SELECT CAST(sum(CAST(cy * (cy - 1) / 2 AS DECIMAL(38,0))) AS BIGINT) AS t
  FROM (SELECT sum(c) AS cy FROM g GROUP BY y)
)
SELECT n.n AS n, conc AS concordant, disc AS discordant,
       round((CAST(conc AS DOUBLE) - CAST(disc AS DOUBLE))
             / sqrt((CAST(n.n AS DOUBLE) * (n.n - 1) / 2 - tx.t)
                    * (CAST(n.n AS DOUBLE) * (n.n - 1) / 2 - ty.t)),
             6) AS tau_b
FROM pairs, n, tx, ty
""",
    tags=("statistics", "rank", "correlation"),
)
def kendall_tau_qty_discount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's tau-b between line-item quantity and discount — the
    rank-correlation sibling of spearman_qty_price, computed EXACTLY
    from the bounded value grid: quantity has ~50 distinct integer
    values and discount 11 cent levels, so all O(n^2) pair counting
    collapses to integer products over a <=550-cell grid self-join
    (broadcast, no corpus pairs ever formed).

    Scale shape: one hash aggregate to the grid, one broadcast grid
    self-join (x strictly ordered so every unordered pair counts once),
    tie corrections from two marginal aggregates. The denominator
    products exceed int64 at corpus scale, so both engines cast to
    double BEFORE multiplying — identical expression, identical
    bits."""
    li = load_table(spark, sf_dir, "lineitem")
    g = (
        li.select(
            F.round("l_quantity").cast("bigint").alias("x"),
            F.round(F.col("l_discount") * 100).cast("bigint").alias("y"),
        )
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint(eager=True)
    )
    # the four scalar reductions (n, pair counts, both tie corrections)
    # compose LAZILY on a literal key — single-row broadcast equi-joins
    # instead of four sequential loop-control driver jobs over the grid
    # (round-11: the bench's min-of-2 paid every fn()-side job twice)
    a = g.select(
        F.col("x").alias("xa"), F.col("y").alias("ya"), F.col("c").alias("ca")
    )
    b = g.select(
        F.col("x").alias("xb"), F.col("y").alias("yb"), F.col("c").alias("cb")
    )
    prod = (F.col("ca") * F.col("cb")).cast("decimal(38,0)")
    zero = F.lit(0).cast("decimal(38,0)")
    pairs = (
        a.join(F.broadcast(b), F.col("xa") < F.col("xb"))
        .agg(
            F.sum(F.when(F.col("ya") < F.col("yb"), prod).otherwise(zero))
            .cast("bigint")
            .alias("concordant"),
            F.sum(F.when(F.col("ya") > F.col("yb"), prod).otherwise(zero))
            .cast("bigint")
            .alias("discordant"),
        )
        .withColumn("__k", F.lit(1))
    )
    n_df = g.agg(F.sum("c").cast("bigint").alias("n")).withColumn(
        "__k", F.lit(1)
    )
    tx_df = (
        g.groupBy("x")
        .agg(F.sum("c").alias("cx"))
        .agg(
            F.sum(
                (F.col("cx") * (F.col("cx") - 1) / 2).cast("decimal(38,0)")
            )
            .cast("bigint")
            .alias("__tx")
        )
        .withColumn("__k", F.lit(1))
    )
    ty_df = (
        g.groupBy("y")
        .agg(F.sum("c").alias("cy"))
        .agg(
            F.sum(
                (F.col("cy") * (F.col("cy") - 1) / 2).cast("decimal(38,0)")
            )
            .cast("bigint")
            .alias("__ty")
        )
        .withColumn("__k", F.lit(1))
    )
    out = (
        pairs.join(F.broadcast(n_df), "__k")
        .join(F.broadcast(tx_df), "__k")
        .join(F.broadcast(ty_df), "__k")
    )
    n0 = F.col("n").cast("double") * (F.col("n") - 1) / 2
    tau = (
        F.col("concordant").cast("double") - F.col("discordant").cast("double")
    ) / F.sqrt((n0 - F.col("__tx")) * (n0 - F.col("__ty")))
    return out.select(
        "n", "concordant", "discordant", F.round(tau, 6).alias("tau_b")
    )


def _boot_case_sql(u: str) -> str:
    branches = " ".join(
        f"WHEN {u} < CAST('{c!r}' AS DOUBLE) THEN {k}"
        for k, c in enumerate(_POIS_CDF)
    )
    return f"CASE {branches} ELSE 6 END"


@query(
    "poisson_bootstrap_order_means",
    oracle=f"""
WITH reps AS (SELECT unnest(range(1, {BOOT_REPS + 1})) AS rep),
w AS (
  SELECT rep,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)) * 100 * wgt)
              AS BIGINT) AS cents,
         CAST(sum(wgt) AS BIGINT) AS n_eff
  FROM (
    SELECT rep, o_totalprice,
           {_boot_case_sql(
               f"CAST((((o_orderkey % {BOOT_MOD}) * {BOOT_A1}"
               f" + rep * {BOOT_C1} + {BOOT_C2}) % {BOOT_MOD}"
               f" * {BOOT_A2} + {BOOT_C1}) % {BOOT_MOD} AS DOUBLE)"
               f" / {BOOT_MOD}"
           )} AS wgt
    FROM orders, reps
  ) GROUP BY rep
)
SELECT rep, n_eff, round(CAST(cents AS DOUBLE) / n_eff / 100, 4) AS boot_mean
FROM w
""",
    tags=("statistics", "bootstrap", "uncertainty", "sampling"),
)
def poisson_bootstrap_order_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap of the mean order value: {R} resample
    replicates where each order's multiplicity is a pseudo-Poisson(1)
    draw from a PORTABLE affine hash of (orderkey, replicate) — the
    shuffle-free bootstrap (Chamandy et al.): no data is ever
    resampled or moved, every replicate is a weighted aggregate over
    the same scan, and determinism makes the "random" weights
    oracle-checkable bit-for-bit.

    Scale shape: orders x {R} via exploding a literal replicate array
    (Expand node, no join), ONE hash aggregate to {R} rows; exact
    integer cents and weights, one double division at the boundary.
    The replicate fan-out is per-row expression work {R}x the input, so
    the scan is spread first (guide §2.5 unsplittable-input remedy —
    no-op when the source already has cluster-scale splits); the hash
    chain is evaluated ONCE per row into ``u`` instead of once per CASE
    branch, and cents accumulate as LONGS (the per-row value is an
    exact integer already — summing it as decimal paid a slow wide-
    decimal buffer for the same integers)."""
    from atlassian_confluence_data_pipeline_spark.operators.skew import (
        spread_scan,
    )

    o = load_table(spark, sf_dir, "orders")
    reps = F.explode(
        F.array(*[F.lit(r) for r in range(1, BOOT_REPS + 1)])
    ).alias("rep")
    h1 = (
        (F.col("o_orderkey") % F.lit(BOOT_MOD)) * F.lit(BOOT_A1)
        + F.col("rep") * F.lit(BOOT_C1)
        + F.lit(BOOT_C2)
    ) % F.lit(BOOT_MOD)
    u = (
        (h1 * F.lit(BOOT_A2) + F.lit(BOOT_C1)) % F.lit(BOOT_MOD)
    ).cast("double") / F.lit(BOOT_MOD)
    wgt = F.lit(6)
    for k in range(len(_POIS_CDF) - 1, -1, -1):
        wgt = F.when(F.col("u") < F.lit(_POIS_CDF[k]), F.lit(k)).otherwise(wgt)
    cents_row = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast(
        "bigint"
    )
    w = (
        spread_scan(o.select("o_orderkey", "o_totalprice"))
        .select("o_orderkey", "o_totalprice", reps)
        .withColumn("u", u)
        .select(cents_row.alias("cents_row"), "rep", wgt.alias("wgt"))
        .groupBy("rep")
        .agg(
            F.sum(F.col("cents_row") * F.col("wgt"))
            .cast("bigint")
            .alias("cents"),
            F.sum("wgt").cast("bigint").alias("n_eff"),
        )
    )
    return w.select(
        F.col("rep").cast("bigint").alias("rep"),
        "n_eff",
        F.round(
            F.col("cents").cast("double") / F.col("n_eff") / 100, 4
        ).alias("boot_mean"),
    )


@query(
    "lorenz_curve_deciles",
    oracle="""
WITH rev AS (
  SELECT o_custkey,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
           AS cents
  FROM orders GROUP BY 1
), r AS (
  SELECT cents,
         row_number() OVER (ORDER BY cents, o_custkey) AS rk,
         count(*) OVER () AS n,
         sum(cents) OVER () AS t
  FROM rev
), d AS (
  SELECT CAST(((rk - 1) * 10) // n AS INT) + 1 AS decile, cents, t FROM r
)
SELECT decile,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(cents) AS BIGINT) AS cents,
       round(CAST(sum(cents) AS DOUBLE) / t, 6) AS revenue_share
FROM d GROUP BY decile, t
""",
    tags=("statistics", "distribution", "inequality"),
)
def lorenz_curve_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz table of customer revenue concentration: customers sorted
    by exact-cents revenue, cut into 10 equal-count deciles, each with
    its share of total revenue — the curve behind
    customer_revenue_gini (decile 10 holding most of the mass is the
    whale-concentration read).

    Scale shape: revenue collapses to the customer domain first; the
    global rank comes from distributed_prefix_rank (range-bucketed —
    no single-task window); decile assignment is integer arithmetic on
    the rank; one bounded 10-row aggregate finishes."""
    from atlassian_confluence_data_pipeline_spark.operators.windows import (
        distributed_prefix_rank,
    )

    o = load_table(spark, sf_dir, "orders")
    rev = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents")
    )
    tot = rev.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("t"),
    ).first()
    n, t = tot["n"], tot["t"]
    ranked = distributed_prefix_rank(
        rev, ["cents", "o_custkey"], rank_col="rk"
    )
    d = ranked.select(
        ((F.col("rk") - 1) * 10 / F.lit(n)).cast("int").alias("decile"),
        "cents",
    ).withColumn("decile", F.col("decile") + 1)
    return d.groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum("cents").cast("bigint").alias("cents"),
        F.round(
            F.sum("cents").cast("double") / F.lit(float(t)), 6
        ).alias("revenue_share"),
    )


@query(
    "dow_revenue_profile",
    oracle="""
WITH d AS (
  SELECT dayofweek(CAST(o_orderdate AS DATE)) AS dow,
         CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
           AS cents
  FROM orders GROUP BY 1
), tot AS (SELECT CAST(sum(n_orders) AS DOUBLE) AS n FROM d)
SELECT dow, n_orders,
       round(CAST(cents AS DOUBLE) / 100, 2) AS revenue,
       round(CAST(n_orders AS DOUBLE) / tot.n, 6) AS order_share,
       round((CAST(n_orders AS DOUBLE) - tot.n / 7)
             * (CAST(n_orders AS DOUBLE) - tot.n / 7) / (tot.n / 7),
             6) AS chi2_contrib
FROM d, tot
""",
    tags=("timeseries", "seasonality", "profile"),
)
def dow_revenue_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week order/revenue profile with per-day chi-square
    contributions against the uniform-traffic null — the weekly
    seasonality read under acf_daily_revenue (a flat profile means the
    ACF's weekly lags carry no calendar signal). dow is 0 = Sunday in
    both engines (Spark's 1-based dayofweek shifted by one).

    Scale shape: one hash aggregate to <= 7 rows; everything after is
    bounded arithmetic."""
    o = load_table(spark, sf_dir, "orders")
    d = (
        o.groupBy(
            (F.dayofweek(F.to_date("o_orderdate")) - 1).cast("bigint").alias("dow")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("cents"),
        )
        .localCheckpoint(eager=True)
    )
    n = float(d.agg(F.sum("n_orders")).first()[0])
    exp = n / 7
    dev = F.col("n_orders").cast("double") - F.lit(exp)
    return d.select(
        "dow",
        "n_orders",
        F.round(F.col("cents").cast("double") / 100, 2).alias("revenue"),
        F.round(F.col("n_orders").cast("double") / F.lit(n), 6).alias(
            "order_share"
        ),
        F.round(dev * dev / F.lit(exp), 6).alias("chi2_contrib"),
    )


#: Hill estimator: tail sample size (top-K revenue customers)
HILL_K = 100


@query(
    "hill_tail_customer_revenue",
    oracle=f"""
WITH rev AS (
  SELECT o_custkey,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
           AS cents
  FROM orders GROUP BY 1
), top AS (
  SELECT cents, row_number() OVER (ORDER BY cents DESC, o_custkey) AS rk
  FROM rev QUALIFY rk <= {HILL_K + 1}
), xmin AS (SELECT cents AS cmin FROM top WHERE rk = {HILL_K + 1}),
terms AS (
  SELECT round(ln(CAST(t.cents AS DOUBLE)) - ln(CAST(x.cmin AS DOUBLE)), 9)
           AS term
  FROM top t, xmin x WHERE t.rk <= {HILL_K}
), s AS (
  SELECT CAST(sum(CAST(term AS DECIMAL(28,12))) AS DOUBLE) AS slog FROM terms
)
SELECT CAST({HILL_K} AS BIGINT) AS k, x.cmin AS xmin_cents,
       round(s.slog / {HILL_K}, 6) AS mean_log_excess,
       round({HILL_K} / s.slog, 6) AS hill_alpha
FROM s, xmin x
""",
    tags=("statistics", "heavytail", "distribution"),
)
def hill_tail_customer_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator of the customer-revenue tail index over the top
    {K} customers: alpha-hat = K / sum(ln(x_i / x_min)) — the
    heavy-tail diagnostic behind the Gini/Lorenz views (alpha < 2 means
    infinite-variance whales: mean-based capacity planning lies). The
    per-word sibling is zipf_slope; this one reads the revenue
    distribution.

    Scale shape: per-customer exact-cents aggregate, ONE
    TakeOrdered({K}+1) cut (per-partition heaps + driver merge, no
    global sort, no unpartitioned window), then {K} bounded log terms
    9-rounded and DECIMAL-summed on the driver with the oracle's exact
    accumulation."""
    import decimal

    import math as _math

    o = load_table(spark, sf_dir, "orders")
    rev = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents")
    )
    top = (
        rev.orderBy(F.col("cents").desc(), "o_custkey")
        .limit(HILL_K + 1)
        .collect()
    )
    out_schema = (
        "k bigint, xmin_cents bigint, mean_log_excess double,"
        " hill_alpha double"
    )
    if len(top) <= HILL_K:
        # fewer than K+1 customers: the oracle's xmin CTE (rk = K+1) is
        # empty, so its cross join yields ZERO rows — match it instead
        # of raising IndexError (round-6 advice)
        return spark.createDataFrame([], out_schema)
    cmin = int(top[HILL_K]["cents"])
    total = decimal.Decimal(0)
    for r in top[:HILL_K]:
        total += decimal.Decimal(
            str(round(_math.log(float(r["cents"])) - _math.log(float(cmin)), 9))
        )
    slog = float(total)
    out = spark.createDataFrame(
        [(HILL_K, cmin, slog / HILL_K, HILL_K / slog)], out_schema
    )
    return out.select(
        "k",
        "xmin_cents",
        F.round("mean_log_excess", 6).alias("mean_log_excess"),
        F.round("hill_alpha", 6).alias("hill_alpha"),
    )
