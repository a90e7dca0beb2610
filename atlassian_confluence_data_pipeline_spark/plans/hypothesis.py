"""Hypothesis-testing wave (28): log-rank survival comparison,
two-sample Kolmogorov-Smirnov, Mann-Whitney U, and Benjamini-Hochberg
FDR control over per-user goodness-of-fit tests.

The reference pipeline exposes only run counters (master_script.py:
590-609); a data-curation engine needs the inferential layer on top —
"did this cohort churn differently", "did the price distribution
shift", "which users' event mixes deviate after multiple-testing
control". All four follow the engine's cross-engine-exact discipline:

- every cumulative pass over a domain that grows with the corpus goes
  through ``distributed_prefix_rank`` (never a single-partition
  window);
- test statistics accumulate either in exact integer/DECIMAL arithmetic
  (rank sums, tie terms) or as per-row doubles rounded to 9 decimals
  and summed in DECIMAL(28,12) — order-independent, so Spark and DuckDB
  hash-match bit-for-bit;
- the only libm calls (exp, sqrt, ln) run on scalars or on already-
  exact inputs, with outputs rounded before comparison;
- loop-control scalars (cohort sizes, the BH cutoff) are eager
  ``first()`` reads of 1-row aggregates — bounded by construction, the
  same pattern the reference's master loop uses for its counters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.operators.windows import (
    distributed_prefix_rank,
)
from atlassian_confluence_data_pipeline_spark.plans.registry import query

#: churn labelling horizon — shared with kaplan_meier_churn /
#: nelson_aalen_hazard so the three survival queries agree on events
_HORIZON_DAYS = 90

#: the cohort under test for the survival / location / KS comparisons
_SEG_A = "BUILDING"
_SEG_B = "MACHINERY"

#: chi-square 1-df critical value at alpha = 0.05 (log-rank)
_CHI2_CRIT_1DF = 3.841

#: BH false-discovery rate for the per-user event-mix sweep
_BH_ALPHA = 0.10

#: fixture event-type vocabulary (TESTDATA.md) — a FIXED 5-symbol
#: domain, so the per-user chi-square is 4 degrees of freedom and its
#: survival function has the exact closed form
#: p = exp(-x/2) * (1 + x/2 + x^2/8 + x^3/48)
_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@query(
    "log_rank_test",
    oracle=f"""
WITH life AS (
  SELECT o_custkey,
         date_diff('day', min(o_orderdate), max(o_orderdate)) AS duration,
         max(o_orderdate) AS last_d
  FROM orders GROUP BY 1
), grouped AS (
  SELECT life.*,
         CASE WHEN c_mktsegment = '{_SEG_A}' THEN 1 ELSE 0 END AS grp
  FROM life JOIN customer ON c_custkey = o_custkey
), head AS (SELECT max(last_d) AS head_d FROM life),
lab AS (
  SELECT duration, grp,
         CASE WHEN date_diff('day', last_d, head.head_d)
                   > {_HORIZON_DAYS} THEN 1 ELSE 0 END AS event
  FROM grouped CROSS JOIN head
), byd AS (
  SELECT duration,
         CAST(sum(event * grp) AS BIGINT) AS d1,
         CAST(sum(event * (1 - grp)) AS BIGINT) AS d0,
         CAST(sum(grp) AS BIGINT) AS l1,
         CAST(sum(1 - grp) AS BIGINT) AS l0
  FROM lab GROUP BY 1
), risk AS (
  SELECT d1, d0,
         CAST((SELECT sum(l1) FROM byd) -
           coalesce(sum(l1) OVER w, 0) AS BIGINT) AS n1,
         CAST((SELECT sum(l0) FROM byd) -
           coalesce(sum(l0) OVER w, 0) AS BIGINT) AS n0
  FROM byd
  WINDOW w AS (ORDER BY duration
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
), terms AS (
  SELECT d1, n1, n0, d1 + d0 AS dt, n1 + n0 AS nt
  FROM risk WHERE d1 + d0 > 0
), acc AS (
  SELECT CAST(sum(d1) AS BIGINT) AS o1,
         CAST(sum(CAST(round(CAST(dt AS DOUBLE) * n1 / nt, 9)
                       AS DECIMAL(28,12))) AS DOUBLE) AS e1,
         CAST(sum(CAST(round(CASE WHEN nt > 1 THEN
                 (CAST(dt AS DOUBLE) * n1 / nt) * n0 / nt
                 * (nt - dt) / (nt - 1)
             ELSE 0.0 END, 9) AS DECIMAL(28,12))) AS DOUBLE) AS v
  FROM terms
)
SELECT (SELECT CAST(sum(l1) AS BIGINT) FROM byd) AS n_group,
       (SELECT CAST(sum(l0) AS BIGINT) FROM byd) AS n_other,
       o1 AS observed_events,
       round(e1, 6) AS expected_events,
       round(v, 6) AS variance,
       round((o1 - e1) * (o1 - e1) / v, 6) AS chi2,
       CAST(CASE WHEN (o1 - e1) * (o1 - e1) / v > {_CHI2_CRIT_1DF}
            THEN 1 ELSE 0 END AS INT) AS significant
FROM acc
""",
    tags=("hypothesis", "survival", "prefix"),
)
def log_rank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank (Mantel-Cox) test: do customers in the BUILDING market
    segment churn on a different schedule than everyone else? Same
    right-censored lifetime construction as kaplan_meier_churn; at each
    event time the test compares observed group-1 events d1_t against
    the hypergeometric expectation d_t * n1_t / n_t, accumulating the
    variance d_t (n1_t/n_t)(n0_t/n_t)(n_t-d_t)/(n_t-1); the statistic
    (O1-E1)^2 / V is chi-square with 1 df under the null.

    Scale shape: customer-domain aggregate -> duration-domain aggregate
    -> ONE distributed prefix pass carrying BOTH per-group leaving
    counts (so both at-risk series come out of a single partitioned
    window), then a 1-row aggregate. Per-time e/v terms are doubles of
    exact bigint inputs rounded to 9 decimals and summed in
    DECIMAL(28,12); the variance product is kept in float form
    (d*n1/n * n0/n * ...) so no intermediate exceeds bigint range at
    any corpus size."""
    from atlassian_confluence_data_pipeline_spark.plans._cache import (
        customer_lifetimes,
        lifetime_head,
    )

    c = load_table(spark, sf_dir, "customer")
    life = customer_lifetimes(spark, sf_dir).join(
        c.select(
            F.col("c_custkey").alias("o_custkey"),
            F.when(F.col("c_mktsegment") == _SEG_A, F.lit(1))
            .otherwise(F.lit(0))
            .alias("grp"),
        ),
        "o_custkey",
    )
    head_d = lifetime_head(spark, sf_dir)
    event = F.when(
        F.datediff(F.lit(head_d), F.col("last_d")) > _HORIZON_DAYS, F.lit(1)
    ).otherwise(F.lit(0))
    byd = (
        life.select("duration", "grp", event.alias("event"))
        .groupBy("duration")
        .agg(
            F.sum(F.col("event") * F.col("grp")).cast("bigint").alias("d1"),
            F.sum(F.col("event") * (F.lit(1) - F.col("grp")))
            .cast("bigint")
            .alias("d0"),
            F.sum("grp").cast("bigint").alias("l1"),
            F.sum(F.lit(1) - F.col("grp")).cast("bigint").alias("l0"),
        )
    )
    # both at-risk series + both cohort totals as UNPARTITIONED windows
    # over the CALENDAR-BOUNDED duration domain (round-11, the
    # kaplan_meier_churn treatment — zero per-build checkpoints and
    # loop-control collects; measured-bound allowlisted in plan_audit)
    w_tot = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_excl = Window.orderBy("duration").rowsBetween(
        Window.unboundedPreceding, -1
    )
    risk = byd.select(
        "d1",
        "d0",
        (
            F.sum("l1").over(w_tot)
            - F.coalesce(F.sum("l1").over(w_excl), F.lit(0))
        ).alias("n1"),
        (
            F.sum("l0").over(w_tot)
            - F.coalesce(F.sum("l0").over(w_excl), F.lit(0))
        ).alias("n0"),
        F.sum("l1").over(w_tot).alias("__t1"),
        F.sum("l0").over(w_tot).alias("__t0"),
    )
    terms = risk.select(
        "d1",
        "n1",
        "n0",
        "__t1",
        "__t0",
        (F.col("d1") + F.col("d0")).alias("dt"),
        (F.col("n1") + F.col("n0")).alias("nt"),
    )
    e1_term = F.col("dt").cast("double") * F.col("n1") / F.col("nt")
    v_term = F.when(
        F.col("nt") > 1,
        (F.col("dt").cast("double") * F.col("n1") / F.col("nt"))
        * F.col("n0")
        / F.col("nt")
        * (F.col("nt") - F.col("dt"))
        / (F.col("nt") - 1),
    ).otherwise(F.lit(0.0))
    # the dt > 0 event filter lives INSIDE the aggregates (null-skipped
    # terms == filtered rows) so the cohort totals — constants carried
    # on every duration row — survive even when no duration has events
    ev = F.col("dt") > 0
    acc = terms.agg(
        F.sum(F.when(ev, F.col("d1"))).cast("bigint").alias("o1"),
        F.sum(F.when(ev, F.round(e1_term, 9).cast("decimal(28,12)")))
        .cast("double")
        .alias("e1"),
        F.sum(F.when(ev, F.round(v_term, 9).cast("decimal(28,12)")))
        .cast("double")
        .alias("v"),
        F.max("__t1").alias("__n1t"),
        F.max("__t0").alias("__n0t"),
    )
    chi2 = (F.col("o1") - F.col("e1")) * (F.col("o1") - F.col("e1")) / F.col(
        "v"
    )
    return acc.select(
        F.col("__n1t").cast("bigint").alias("n_group"),
        F.col("__n0t").cast("bigint").alias("n_other"),
        F.col("o1").alias("observed_events"),
        F.round("e1", 6).alias("expected_events"),
        F.round("v", 6).alias("variance"),
        F.round(chi2, 6).alias("chi2"),
        F.when(chi2 > _CHI2_CRIT_1DF, F.lit(1))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("significant"),
    )


def _seg_prices_sql() -> str:
    """Shared oracle CTE: exact-integer-cent order prices for the two
    market-segment cohorts, aggregated to the distinct-value domain."""
    return f"""
joined AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         c_mktsegment AS seg
  FROM orders JOIN customer ON c_custkey = o_custkey
  WHERE c_mktsegment IN ('{_SEG_A}', '{_SEG_B}')
), byv AS (
  SELECT cents,
         CAST(sum(CASE WHEN seg = '{_SEG_A}' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         CAST(sum(CASE WHEN seg = '{_SEG_B}' THEN 1 ELSE 0 END) AS BIGINT) AS cb
  FROM joined GROUP BY 1
)"""


def _seg_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of :func:`_seg_prices_sql`'s ``byv`` frame."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(
            c.select(
                F.col("c_custkey").alias("o_custkey"),
                F.col("c_mktsegment").alias("seg"),
            ),
            "o_custkey",
        )
        .filter(F.col("seg").isin(_SEG_A, _SEG_B))
        .select(
            F.round(F.col("o_totalprice") * 100)
            .cast("bigint")
            .alias("cents"),
            "seg",
        )
        .groupBy("cents")
        .agg(
            F.sum(F.when(F.col("seg") == _SEG_A, 1).otherwise(0))
            .cast("bigint")
            .alias("ca"),
            F.sum(F.when(F.col("seg") == _SEG_B, 1).otherwise(0))
            .cast("bigint")
            .alias("cb"),
        )
    )


@query(
    "ks_test_price_segments",
    oracle=f"""
WITH {_seg_prices_sql().strip()}
, tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
                 CAST(sum(cb) AS BIGINT) AS nb FROM byv),
cdf AS (
  SELECT sum(ca) OVER w AS cum_a, sum(cb) OVER w AS cum_b
  FROM byv
  WINDOW w AS (ORDER BY cents ROWS UNBOUNDED PRECEDING)
), stat AS (
  SELECT max(abs(CAST(cum_a AS DOUBLE) / tot.na
                 - CAST(cum_b AS DOUBLE) / tot.nb)) AS d
  FROM cdf CROSS JOIN tot
)
SELECT tot.na AS n_a, tot.nb AS n_b,
       round(d, 6) AS ks_stat,
       round(least(1.0, 2 * exp(-2 * d * d
             * (CAST(tot.na AS DOUBLE) * tot.nb / (tot.na + tot.nb)))), 6)
         AS p_value,
       CAST(CASE WHEN 2 * exp(-2 * d * d
             * (CAST(tot.na AS DOUBLE) * tot.nb / (tot.na + tot.nb))) < 0.05
            THEN 1 ELSE 0 END AS INT) AS significant
FROM stat CROSS JOIN tot
""",
    tags=("hypothesis", "distribution", "prefix"),
)
def ks_test_price_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test: is the order-price
    distribution of BUILDING-segment customers different from
    MACHINERY's? D = sup_x |F_a(x) - F_b(x)| over the empirical CDFs,
    with the one-term Kolmogorov tail bound
    p ~ 2 exp(-2 D^2 * na*nb/(na+nb)).

    Scale shape: prices become exact integer cents (the benford
    discipline), ONE hash aggregate to the distinct-value domain, ONE
    distributed prefix pass carrying both cohorts' cumulative counts,
    then a 1-row max. The CDF ratios are doubles of exact bigints —
    bit-identical across engines — and max() is order-independent, so
    only the final exp() touches libm (rounded to 6)."""
    from atlassian_confluence_data_pipeline_spark.plans._cache import (
        seg_price_counts,
        seg_price_summary,
    )

    # session-staged cohort domain + its loop-control summary (shared
    # with mann_whitney_price); equal-width split points from the known
    # cents range replace the prefix pass's approxQuantile sampling job
    byv = seg_price_counts(spark, sf_dir)
    na, nb, mn, mx = seg_price_summary(spark, sf_dir)
    cdf = distributed_prefix_rank(
        byv,
        ["cents"],
        sums={"cum_a": "ca", "cum_b": "cb"},
        bounds=[mn + (mx - mn) * i / 32 for i in range(1, 32)]
        if na or nb
        else None,
    )
    diff = F.abs(
        F.col("cum_a").cast("double") / na - F.col("cum_b").cast("double") / nb
    )
    stat = cdf.agg(F.max(diff).alias("d"))
    n_eff = float(na) * nb / (na + nb)
    p = 2 * F.exp(-2 * F.col("d") * F.col("d") * F.lit(n_eff))
    return stat.select(
        F.lit(na).cast("bigint").alias("n_a"),
        F.lit(nb).cast("bigint").alias("n_b"),
        F.round("d", 6).alias("ks_stat"),
        F.round(F.least(F.lit(1.0), p), 6).alias("p_value"),
        F.when(p < 0.05, F.lit(1)).otherwise(F.lit(0)).cast("int").alias(
            "significant"
        ),
    )


@query(
    "mann_whitney_price",
    oracle=f"""
WITH {_seg_prices_sql().strip()}
, pre AS (
  SELECT ca, cb, ca + cb AS c,
         coalesce(sum(ca + cb) OVER (ORDER BY cents
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
  FROM byv
), acc AS (
  SELECT CAST(sum(ca) AS BIGINT) AS n1, CAST(sum(cb) AS BIGINT) AS n2,
         CAST(sum(CAST(ca * (2 * before + c + 1) AS DECIMAL(38,0)))
              AS DECIMAL(38,0)) AS r1t,
         CAST(sum(CAST(c * c * c - c AS DECIMAL(38,0)))
              AS DECIMAL(38,0)) AS tie
  FROM pre
), z AS (
  SELECT n1, n2, n1 + n2 AS n,
         CAST(r1t AS DOUBLE) / 2 - CAST(n1 AS DOUBLE) * (n1 + 1) / 2 AS u1,
         CAST(n1 AS DOUBLE) * n2 / 2 AS mu,
         sqrt(CAST(n1 AS DOUBLE) * n2 / 12
              * ((n1 + n2 + 1)
                 - CAST(tie AS DOUBLE) / (n1 + n2) / (n1 + n2 - 1)))
           AS sigma
  FROM acc
)
SELECT n1 AS n_a, n2 AS n_b,
       round(u1, 1) AS u_stat,
       round((u1 - mu) / sigma, 4) AS z_stat,
       CAST(CASE WHEN abs((u1 - mu) / sigma) > 1.96
            THEN 1 ELSE 0 END AS INT) AS significant
FROM z
""",
    tags=("hypothesis", "rank", "prefix"),
)
def mann_whitney_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) test on the same two
    market-segment price cohorts — the nonparametric sibling of the
    z-test: ranks instead of means, with mid-ranks for ties and the
    tie-corrected normal approximation
    sigma^2 = n1 n2 /12 * (n+1 - sum(t^3-t)/(n(n-1))).

    Exactness: the rank sum accumulates in HALF-UNITS —
    sum(ca * (2*before + c + 1)) — so ties' .5 mid-ranks never touch
    floats; both it and the tie term sum in DECIMAL(38,0) (exact at any
    corpus size; the per-row product fits bigint up to ~10^9 rows per
    distinct value). One hash aggregate + one distributed prefix pass;
    floats appear only in the final 1-row closed form."""
    from atlassian_confluence_data_pipeline_spark.plans._cache import (
        seg_price_counts,
        seg_price_summary,
    )

    # session-staged cohort domain (shared with ks_test_price_segments);
    # equal-width split points from the memoized cents range replace the
    # prefix pass's approxQuantile job AND its rebuild of the join+agg
    byv = seg_price_counts(spark, sf_dir)
    na_, nb_, mn, mx = seg_price_summary(spark, sf_dir)
    pre = distributed_prefix_rank(
        byv.withColumn("c", F.col("ca") + F.col("cb")),
        ["cents"],
        sums={"cum": "c"},
        bounds=[mn + (mx - mn) * i / 32 for i in range(1, 32)]
        if na_ or nb_
        else None,
    ).withColumn("before", F.col("cum") - F.col("c"))
    acc = pre.agg(
        F.sum("ca").cast("bigint").alias("n1"),
        F.sum("cb").cast("bigint").alias("n2"),
        F.sum(
            (
                F.col("ca")
                * (2 * F.col("before") + F.col("c") + 1)
            ).cast("decimal(38,0)")
        )
        .cast("decimal(38,0)")
        .alias("r1t"),
        F.sum(
            (
                F.col("c") * F.col("c") * F.col("c") - F.col("c")
            ).cast("decimal(38,0)")
        )
        .cast("decimal(38,0)")
        .alias("tie"),
    )
    n = F.col("n1") + F.col("n2")
    u1 = F.col("r1t").cast("double") / 2 - F.col("n1").cast("double") * (
        F.col("n1") + 1
    ) / 2
    mu = F.col("n1").cast("double") * F.col("n2") / 2
    sigma = F.sqrt(
        F.col("n1").cast("double")
        * F.col("n2")
        / 12
        * (
            (F.col("n1") + F.col("n2") + 1)
            - F.col("tie").cast("double")
            / (F.col("n1") + F.col("n2"))
            / (F.col("n1") + F.col("n2") - 1)
        )
    )
    z = (u1 - mu) / sigma
    return acc.select(
        F.col("n1").alias("n_a"),
        F.col("n2").alias("n_b"),
        F.round(u1, 1).alias("u_stat"),
        F.round(z, 4).alias("z_stat"),
        F.when(F.abs(z) > 1.96, F.lit(1))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("significant"),
    )


def _chi_term_sql(t: str) -> str:
    """One 4-df goodness-of-fit term, identical shape on both engines:
    (o - e)^2 / e with e = n_u * g_c / g_tot in float form."""
    o = f"o_{t}"
    e = f"(CAST(n_u AS DOUBLE) * g_{t} / g_tot)"
    return f"CAST(round(({o} - {e}) * ({o} - {e}) / {e}, 9) AS DECIMAL(28,12))"


@query(
    "bh_fdr_user_eventmix",
    oracle=f"""
WITH peru AS (
  SELECT user_id, count(*) AS n_u,
         {', '.join(f"CAST(sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS o_{t}" for t in _EVENT_TYPES)}
  FROM events GROUP BY 1
), g AS (
  SELECT count(*) AS g_tot,
         {', '.join(f"CAST(sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS g_{t}" for t in _EVENT_TYPES)}
  FROM events
), chi AS (
  SELECT user_id, n_u,
         CAST({' + '.join(_chi_term_sql(t) for t in _EVENT_TYPES)}
              AS DOUBLE) AS x
  FROM peru CROSS JOIN g
), pv AS (
  SELECT user_id, n_u, x,
         round(exp(-x / 2) * (1 + x / 2 + x * x / 8 + x * x * x / 48), 9)
           AS p_r
  FROM chi
), ranked AS (
  SELECT *, CAST(row_number() OVER (ORDER BY p_r, user_id) AS BIGINT)
              AS p_rank,
         (SELECT count(*) FROM pv) AS m
  FROM pv
), kstar AS (
  SELECT coalesce(max(CASE WHEN p_r <= p_rank * {_BH_ALPHA} / m
                      THEN p_rank END), 0) AS k
  FROM ranked
)
SELECT user_id, CAST(n_u AS BIGINT) AS n_events,
       round(x, 6) AS chi2,
       round(p_r, 6) AS p_value,
       p_rank,
       CAST(CASE WHEN p_rank <= kstar.k THEN 1 ELSE 0 END AS INT)
         AS discovery
FROM ranked CROSS JOIN kstar
""",
    tags=("hypothesis", "fdr", "prefix"),
)
def bh_fdr_user_eventmix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple-testing sweep with Benjamini-Hochberg FDR control: for
    EVERY user, a chi-square goodness-of-fit of their event-type mix
    against the corpus mix (the fixed 5-symbol vocabulary = 4 df, whose
    survival function is the exact closed form
    p = exp(-x/2)(1 + x/2 + x^2/8 + x^3/48) — no incomplete-gamma
    needed), then the BH step-up: reject the k* smallest p-values where
    k* = max over k of (p_(k) <= k*alpha/m). The fixture is null by
    construction, so discoveries double as an A/A check on the FDR
    machinery (compare ab_test_value_ztest).

    Scale shape: the per-user contingency row is ONE hash aggregate
    with 5 conditional counters (no user x type grid join — the
    category domain is a fixed literal vocabulary); the corpus mix is a
    1-row eager aggregate whose 6 scalars become literals; the BH rank
    over the user domain (which GROWS with the corpus) runs through
    distributed_prefix_rank on (p, user_id); the cutoff k* is one more
    1-row aggregate. The chi-square sum is 5 terms in fixed literal
    order — identical double arithmetic on both engines — rounded to 9
    and summed in DECIMAL(28,12)."""
    ev = load_table(spark, sf_dir, "events")
    peru = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_u"),
        *[
            F.sum(F.when(F.col("event_type") == t, 1).otherwise(0))
            .cast("bigint")
            .alias(f"o_{t}")
            for t in _EVENT_TYPES
        ],
    )
    g = ev.agg(
        F.count(F.lit(1)).alias("g_tot"),
        *[
            F.sum(F.when(F.col("event_type") == t, 1).otherwise(0))
            .cast("bigint")
            .alias(f"g_{t}")
            for t in _EVENT_TYPES
        ],
    ).first()
    g_tot = g["g_tot"]

    def term(t: str):
        e = F.col("n_u").cast("double") * F.lit(g[f"g_{t}"]) / F.lit(g_tot)
        o = F.col(f"o_{t}")
        return F.round((o - e) * (o - e) / e, 9).cast("decimal(28,12)")

    x_dec = term(_EVENT_TYPES[0])
    for t in _EVENT_TYPES[1:]:
        x_dec = x_dec + term(t)
    x = x_dec.cast("double")
    chi = peru.select("user_id", "n_u", x.alias("x"))
    p = F.exp(-F.col("x") / 2) * (
        1
        + F.col("x") / 2
        + F.col("x") * F.col("x") / 8
        + F.col("x") * F.col("x") * F.col("x") / 48
    )
    pv = chi.withColumn("p_r", F.round(p, 9))
    ranked = distributed_prefix_rank(
        pv, ["p_r", "user_id"], rank_col="p_rank"
    ).withColumn("p_rank", F.col("p_rank").cast("bigint"))
    m = ranked.count()
    k_star = (
        ranked.filter(
            F.col("p_r") <= F.col("p_rank") * _BH_ALPHA / F.lit(m)
        )
        .agg(F.coalesce(F.max("p_rank"), F.lit(0)).alias("k"))
        .first()["k"]
    )
    return ranked.select(
        "user_id",
        F.col("n_u").cast("bigint").alias("n_events"),
        F.round("x", 6).alias("chi2"),
        F.round("p_r", 6).alias("p_value"),
        "p_rank",
        F.when(F.col("p_rank") <= F.lit(k_star), F.lit(1))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("discovery"),
    )
