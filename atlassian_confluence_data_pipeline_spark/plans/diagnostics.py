"""Distribution & time-series diagnostics wave (22): autocorrelation,
Benford first-digit audit, inter-arrival histograms, burstiness (Fano
factor), and the vocabulary coverage curve.

These are the EDA/monitoring diagnostics an operator runs over a
100 TB corpus before trusting it: serial dependence of the revenue
series (ACF), fabricated-amount detection (Benford), customer cadence
(inter-arrival), event-stream overdispersion (Fano), and how much of
the token mass a candidate vocabulary captures (coverage curve).

Exactness discipline: every series first collapses to an aggregated
domain with DECIMAL/integer moments (associative, order-independent),
then a single closed-form float expression runs on identical scalar
inputs in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.operators.windows import (
    distributed_prefix_rank,
    equal_width_bucketizer,
    kth_smallest,
)
from atlassian_confluence_data_pipeline_spark.plans.registry import query

_DEC = "decimal(18,6)"
_MAX_LAG = 14


@query(
    "acf_daily_revenue",
    oracle=f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         sum(CAST(o_totalprice AS DECIMAL(18,6))) AS rev
  FROM orders GROUP BY 1
), g AS (
  SELECT count(*) AS n,
         CAST(sum(rev) AS DOUBLE) AS s,
         CAST(sum(rev * rev) AS DOUBLE) AS q
  FROM daily
), lagged AS (
  SELECT k.k AS lag,
         count(*) AS n_k,
         CAST(sum(a.rev * b.rev) AS DOUBLE) AS sp,
         CAST(sum(a.rev) AS DOUBLE) AS sa,
         CAST(sum(b.rev) AS DOUBLE) AS sb
  FROM daily a
  JOIN (SELECT unnest(generate_series(1, {_MAX_LAG})) AS k) k ON true
  JOIN daily b ON b.day = a.day + to_days(CAST(k.k AS INT))
  GROUP BY 1
)
SELECT CAST(lag AS BIGINT) AS lag,
       CAST(n_k AS BIGINT) AS n_pairs,
       round((sp - (s / n) * (sa + sb) + n_k * (s / n) * (s / n))
             / (q - 2 * (s / n) * s + n * (s / n) * (s / n)), 6) AS acf
FROM lagged CROSS JOIN g
""",
    tags=("timeseries", "diagnostics", "statistics"),
)
def acf_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the daily revenue series at lags 1..14 — the
    seasonality/trend diagnostic read before fitting any forecast
    (forecast_revenue_change, seasonal_residual_outliers). Standard ACF
    estimator: lag-k cross moments over the paired days, normalized by
    the full-series centered sum of squares.

    Scale shape: the fact table collapses to one DECIMAL-exact revenue
    per day (hash aggregate); the lag pairing is an EQUI-join on
    day+k after exploding k=1..14 (14x a calendar-bounded series — no
    inequality join); global and per-lag moments are exact DECIMAL, and
    the ACF ratio is one identical closed form per lag."""
    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.sum(F.col("o_totalprice").cast(_DEC)).alias("rev"))
        .localCheckpoint(eager=True)
    )
    g = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rev").cast("double").alias("s"),
        F.sum(F.col("rev") * F.col("rev")).cast("double").alias("q"),
    )
    a = daily.select(
        "day", F.col("rev").alias("rev_a")
    ).withColumn("lag", F.explode(F.array(*[F.lit(k) for k in range(1, _MAX_LAG + 1)])))
    b = daily.select(F.col("day").alias("day_b"), F.col("rev").alias("rev_b"))
    lagged = (
        a.join(b, F.col("day_b") == F.date_add(F.col("day"), F.col("lag")))
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).alias("n_k"),
            F.sum(F.col("rev_a") * F.col("rev_b")).cast("double").alias("sp"),
            F.sum("rev_a").cast("double").alias("sa"),
            F.sum("rev_b").cast("double").alias("sb"),
        )
    )
    m = F.col("s") / F.col("n")
    return (
        lagged.crossJoin(F.broadcast(g))
        .select(
            F.col("lag").cast("bigint").alias("lag"),
            F.col("n_k").cast("bigint").alias("n_pairs"),
            F.round(
                (F.col("sp") - m * (F.col("sa") + F.col("sb")) + F.col("n_k") * m * m)
                / (F.col("q") - 2 * m * F.col("s") + F.col("n") * m * m),
                6,
            ).alias("acf"),
        )
    )


@query(
    "benford_price_audit",
    oracle="""
WITH d AS (
  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT)
                          AS VARCHAR), 1, 1) AS INT) AS digit
  FROM orders
), c AS (
  SELECT digit, count(*) AS n FROM d GROUP BY 1
), t AS (SELECT sum(n) AS total FROM c)
SELECT CAST(digit AS INT) AS digit,
       CAST(n AS BIGINT) AS n,
       round(CAST(n AS DOUBLE) / total, 6) AS observed_share,
       round(log10(1.0 + 1.0 / digit), 6) AS benford_share,
       round(pow(n - total * log10(1.0 + 1.0 / digit), 2)
             / (total * log10(1.0 + 1.0 / digit)), 4) AS chi2_term
FROM c CROSS JOIN t
""",
    tags=("governance", "diagnostics", "quality"),
)
def benford_price_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit of order totals: compare each leading
    digit's observed share against log10(1 + 1/d) and report the
    chi-square contribution — the classic fabricated-amounts detector
    an auditor runs over financial columns.

    The leading digit comes from the DECIMAL STRING of exact integer
    cents (round(price*100) — never floor(log10(x)), whose 1-ULP wobble
    at powers of ten flips digits between engines). One hash aggregate
    to <= 9 rows; every float is a closed form on exact integers."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
    d = o.select(
        F.substring(cents.cast("string"), 1, 1).cast("int").alias("digit")
    )
    c = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    t = c.agg(F.sum("n").alias("total"))
    p = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            F.col("digit").cast("int").alias("digit"),
            F.col("n").cast("bigint").alias("n"),
            F.round(F.col("n").cast("double") / F.col("total"), 6).alias(
                "observed_share"
            ),
            F.round(p, 6).alias("benford_share"),
            F.round(
                F.pow(F.col("n") - F.col("total") * p, 2) / (F.col("total") * p),
                4,
            ).alias("chi2_term"),
        )
    )


@query(
    "order_interarrival_stats",
    oracle="""
WITH g AS (
  SELECT date_diff('day',
           lag(o_orderdate) OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey),
           o_orderdate) AS gap_days
  FROM orders
)
SELECT CAST(gap_days // 7 AS BIGINT) AS gap_weeks,
       count(*) AS n_gaps,
       round(CAST(count(*) AS DOUBLE)
             / (SELECT count(*) FROM g WHERE gap_days IS NOT NULL), 6)
         AS share,
       round(CAST(sum(gap_days) AS DOUBLE) / count(*), 4) AS avg_gap_days
FROM g
WHERE gap_days IS NOT NULL
GROUP BY 1
""",
    tags=("analytics", "window", "diagnostics"),
)
def order_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival histogram of customer order cadence: the gap in
    days between each customer's consecutive orders, bucketed into
    weeks — purchase-rhythm input for churn horizons (the
    CHURN_HORIZON_DAYS constant in kaplan_meier_churn is read off this
    table's tail).

    Scale shape: the lag window is PARTITIONED by customer (every key
    hashes to its own task; per-customer order counts are tiny), then
    one hash aggregate to the bounded week-bucket domain. Integer gaps
    and exact ratios."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    g = o.select(
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).alias(
            "gap_days"
        )
    ).filter(F.col("gap_days").isNotNull())
    total = g.count()
    return (
        g.groupBy(F.floor(F.col("gap_days") / 7).cast("bigint").alias("gap_weeks"))
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.round(F.count(F.lit(1)).cast("double") / total, 6).alias("share"),
            F.round(F.sum("gap_days").cast("double") / F.count(F.lit(1)), 4).alias(
                "avg_gap_days"
            ),
        )
    )


@query(
    "burstiness_event_types",
    oracle="""
WITH d AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS c
  FROM events GROUP BY 1, 2
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_days,
       round(CAST(sum(c) AS DOUBLE) / count(*), 6) AS mean_daily,
       round((count(*) * CAST(sum(c * c) AS DOUBLE)
              - CAST(sum(c) AS DOUBLE) * sum(c))
             / (CAST(count(*) AS DOUBLE) * sum(c)), 6) AS fano_factor
FROM d
GROUP BY 1
""",
    tags=("events", "diagnostics", "statistics"),
)
def burstiness_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burstiness (Fano factor = daily-count variance / mean) per event
    type over observed days: ~1 means Poisson-like arrivals, >> 1 means
    bursts — the dispersion diagnostic that decides whether a rate
    alert needs a variance-aware threshold (volume_anomaly_trailing).

    Scale shape: one hash aggregate to (type, day), one to type;
    moments are exact integer sums, the Fano ratio
    (n*Σc² - (Σc)²) / (n*Σc) is a single identical closed form."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("c"))
    n = F.count(F.lit(1))
    return d.groupBy("event_type").agg(
        n.cast("bigint").alias("n_days"),
        F.round(F.sum("c").cast("double") / n, 6).alias("mean_daily"),
        F.round(
            (n * F.sum(F.col("c") * F.col("c")).cast("double")
             - F.sum("c").cast("double") * F.sum("c"))
            / (n.cast("double") * F.sum("c")),
            6,
        ).alias("fano_factor"),
    )


#: rank checkpoints for the coverage curve (powers of two — resolves
#: both tiny fixture vocabularies and production million-type ones)
_COVERAGE_RANKS = tuple(2 ** i for i in range(0, 21))


@query(
    "vocab_coverage_curve",
    oracle=f"""
WITH c AS (
  SELECT word, count(*) AS freq
  FROM (SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
        FROM documents)
  GROUP BY 1
), r AS (
  SELECT word, freq,
         row_number() OVER (ORDER BY freq DESC, word) AS rank,
         sum(freq) OVER (ORDER BY freq DESC, word
                         ROWS UNBOUNDED PRECEDING) AS cum,
         sum(freq) OVER () AS total
  FROM c
)
SELECT CAST(rank AS BIGINT) AS vocab_size,
       word AS boundary_word,
       CAST(freq AS BIGINT) AS boundary_freq,
       round(CAST(cum AS DOUBLE) / total, 6) AS token_coverage
FROM r
WHERE rank IN ({", ".join(str(r) for r in _COVERAGE_RANKS)})
""",
    tags=("curation", "vocab", "prefix"),
)
def vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: what fraction of all corpus tokens a
    top-k frequency vocabulary captures, sampled at power-of-two k —
    the curve that picks a tokenizer's vocab size (vocab_oov_rates
    evaluates ONE fixed vocabulary; this sweeps the frontier).

    Scale shape: token counts are one explode + hash aggregate on the
    word domain; the global frequency ranking and cumulative mass run
    through distributed_prefix_rank (rank + prefix sum in the same
    range-bucketed pass — no single-partition window over the
    vocabulary, which grows with the corpus); the checkpoint filter
    collapses output to <= 21 rows."""
    from atlassian_confluence_data_pipeline_spark.plans._cache import (
        doc_word_positions,
    )

    # session-staged token stream (round 11) feeds the word-count
    # aggregate — the regex explode was this query's dominant cost
    c = (
        doc_word_positions(spark, sf_dir)
        .select("word")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn("neg_freq", -F.col("freq"))
        .localCheckpoint(eager=True)
    )
    total = c.agg(F.sum("freq")).first()[0]
    ranked = distributed_prefix_rank(
        c, ["neg_freq", "word"], sums={"cum": "freq"}, rank_col="rank"
    )
    return (
        ranked.filter(F.col("rank").isin(*_COVERAGE_RANKS))
        .select(
            F.col("rank").cast("bigint").alias("vocab_size"),
            F.col("word").alias("boundary_word"),
            F.col("freq").cast("bigint").alias("boundary_freq"),
            F.round(F.col("cum").cast("double") / total, 6).alias(
                "token_coverage"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Robust trend: Theil-Sen slope + Mann-Kendall test (wave 26)
# ---------------------------------------------------------------------------

@query(
    "robust_trend_daily_revenue",
    oracle="""
WITH daily AS (
  SELECT date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
           AS dnum,
         sum(CAST(o_totalprice AS DECIMAL(18,6))) AS rev
  FROM orders GROUP BY 1
), pairs AS (
  SELECT a.dnum AS da, b.dnum AS db,
         CAST(b.rev - a.rev AS DOUBLE) / (b.dnum - a.dnum) AS slope,
         CASE WHEN b.rev > a.rev THEN 1
              WHEN b.rev < a.rev THEN -1 ELSE 0 END AS sgn
  FROM daily a JOIN daily b ON b.dnum > a.dnum
), r AS (
  SELECT slope,
         row_number() OVER (ORDER BY slope, da, db) AS rk,
         count(*) OVER () AS np
  FROM pairs
), med AS (
  SELECT avg(slope) AS ts_slope FROM r
  WHERE rk IN ((np + 1) // 2, (np + 2) // 2)
), g AS (
  SELECT CAST(count(*) AS BIGINT) AS n_days FROM daily
), mk AS (
  SELECT CAST(sum(sgn) AS BIGINT) AS s, count(*) AS n_pairs FROM pairs
)
SELECT g.n_days,
       CAST(mk.n_pairs AS BIGINT) AS n_pairs,
       round(med.ts_slope, 6) AS theil_sen_slope,
       mk.s AS mk_s,
       round((mk.s - CASE WHEN mk.s > 0 THEN 1
                          WHEN mk.s < 0 THEN -1 ELSE 0 END)
             / sqrt(g.n_days * (g.n_days - 1.0) * (2.0 * g.n_days + 5.0)
                    / 18.0), 6) AS mk_z
FROM g CROSS JOIN mk CROSS JOIN med
""",
    tags=("timeseries", "robust", "statistics", "bounded-pairs"),
)
def robust_trend_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust trend of the daily revenue series: Theil-Sen slope (the
    median of all pairwise slopes — up to 29% contamination-proof where
    OLS breaks on one outlier day) plus the Mann-Kendall S statistic
    and its normal-approximation z — the nonparametric
    'is there a monotone trend?' test run before believing any
    forecast.

    Scale shape: the fact table first collapses to the CALENDAR-BOUNDED
    day series (~2.4k rows — bounded by time span, not corpus), so the
    all-pairs slope frame is ~2.9M rows from a broadcast self-join of a
    tiny frame (intentional BNLJ, both sides calendar-bounded); the
    median slope is an exact order statistic via kth_smallest
    DISTRIBUTED SELECTION (bucket counts route the middle ranks to
    ~1/32 of the pairs; only those buckets sort); S and the
    closed-form z are exact-integer arithmetic. Ties in revenue (exact
    DECIMAL) map to sgn=0, the standard MK treatment; the no-ties
    variance formula is used and documented."""
    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.groupBy(
            F.datediff(F.to_date("o_orderdate"), F.lit("1992-01-01")).alias("dnum")
        )
        .agg(F.sum(F.col("o_totalprice").cast(_DEC)).alias("rev"))
        .localCheckpoint(eager=True)
    )
    # ONE fused loop-control aggregate: the day count (needed for the
    # median ranks and the MK variance) and the revenue range (every
    # pair slope satisfies |slope| <= mx - mn since db - da >= 1), so
    # the selection pass below gets O(1) equal-width buckets instead of
    # paying an approxQuantile sampling scan over the ~n²/2 pair frame
    stats = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("rev").alias("mn"),
        F.max("rev").alias("mx"),
    ).first()
    n_days = int(stats["n"])
    span = float(stats["mx"] - stats["mn"]) if n_days else 0.0
    # Degenerate frame (n_days < 2): zero pairs, so the Theil-Sen ranks
    # do not exist and the MK variance is 0 — emit the null/zero row the
    # pre-closed-form Spark-side division produced instead of raising
    # (r11 ADVICE: ZeroDivisionError / TypeError on empty extras).
    if n_days < 2:
        out = spark.createDataFrame(
            [(n_days, 0, 0)], "n_days bigint, n_pairs bigint, mk_s bigint"
        )
        return out.select(
            "n_days",
            "n_pairs",
            F.lit(None).cast("double").alias("theil_sen_slope"),
            F.col("mk_s"),
            F.lit(None).cast("double").alias("mk_z"),
        )
    # spread the PROBE side before the broadcast join: the day series
    # arrives in one partition, and a BNLJ streams probe partitions —
    # 32 probe splits parallelize the 2.9M-pair evaluation itself
    a = daily.select(
        F.col("dnum").alias("da"), F.col("rev").alias("ra")
    ).repartition(32)
    b = daily.select(F.col("dnum").alias("db"), F.col("rev").alias("rb"))
    pairs = (
        a.join(F.broadcast(b), F.col("db") > F.col("da"))
        .select(
            "da",
            "db",
            # nullif guards the da == db diagonal: without a checkpoint
            # between join and consumers, Catalyst may push consumer
            # predicates into the BNLJ condition and evaluate this
            # expression BEFORE the db > da conjunct filters the
            # diagonal — a raw division then throws under ANSI mode
            (
                (F.col("rb") - F.col("ra")).cast("double")
                / F.nullif(F.col("db") - F.col("da"), F.lit(0))
            ).alias("slope"),
            F.when(F.col("rb") > F.col("ra"), F.lit(1))
            .when(F.col("rb") < F.col("ra"), F.lit(-1))
            .otherwise(F.lit(0))
            .alias("sgn"),
        )
        # materialize once for the selection + S scans
        .localCheckpoint(eager=True)
    )
    # db > da over n days is exactly n(n-1)/2 — no counting scan
    n_pairs = n_days * (n_days - 1) // 2
    k1, k2 = (n_pairs + 1) // 2, (n_pairs + 2) // 2
    # exact median via distributed SELECTION (kth_smallest): only the
    # bucket(s) containing the middle ranks are ever sorted — ~1/32 of
    # the pair frame — instead of ranking all ~n^2/2 pairs. Bucket
    # routing is the O(1) equal-width map over the KNOWN slope range
    # (zero sampling jobs), and the Mann-Kendall sign sum piggybacks on
    # the bucket-count pass (exact integer partials), so the pair frame
    # is scanned exactly twice after materialization: counts+S, then
    # the hit-bucket sort.
    import math

    # asinh spreads the heavily zero-centered slope distribution across
    # buckets (equal LINEAR width would drop nearly every pair into the
    # central bucket); the operator's iterative skew refinement then
    # converges in at most a round or two
    sel, extras = kth_smallest(
        pairs,
        "slope",
        [k1, k2],
        bucket_of=equal_width_bucketizer(
            -math.asinh(span), math.asinh(span), 32, transform=F.asinh
        ),
        extra_sums={"s": "sgn"},
    )
    ts_slope = (sel[k1] + sel[k2]) / 2.0
    s = int(extras["s"])
    var = n_days * (n_days - 1.0) * (2.0 * n_days + 5.0) / 18.0
    corr = 1 if s > 0 else (-1 if s < 0 else 0)
    out = spark.createDataFrame(
        [(n_days, n_pairs, s)], "n_days bigint, n_pairs bigint, mk_s bigint"
    )
    return out.select(
        "n_days",
        "n_pairs",
        F.round(F.lit(ts_slope), 6).alias("theil_sen_slope"),
        F.col("mk_s"),
        F.round(F.lit((s - corr) / float(var) ** 0.5), 6).alias("mk_z"),
    )


# ---------------------------------------------------------------------------
# Dedup-graph modularity (wave 26)
# ---------------------------------------------------------------------------

def _modularity_oracle() -> str:
    from atlassian_confluence_data_pipeline_spark.plans import multimodal  # noqa: F401
    from atlassian_confluence_data_pipeline_spark.plans.registry import QUERIES

    pairs_sql = QUERIES["near_dup_pairs_lsh"].oracle
    return f"""
WITH RECURSIVE pairs AS ({pairs_sql}),
edges AS (
  SELECT doc_a AS s, doc_b AS d FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
),
reach(n, m) AS (
  SELECT s, s FROM (SELECT DISTINCT s FROM edges)
  UNION
  SELECT e.s, r.m FROM edges e JOIN reach r ON e.d = r.n
),
comp AS (SELECT n AS node, min(m) AS cluster FROM reach GROUP BY 1),
mm AS (SELECT count(*) AS m FROM pairs),
cin AS (
  SELECT c.cluster, count(*) AS e_in
  FROM pairs p JOIN comp c ON p.doc_a = c.node
  GROUP BY 1
),
deg AS (
  SELECT c.cluster, count(*) AS deg_sum
  FROM edges e JOIN comp c ON e.s = c.node
  GROUP BY 1
),
nn AS (SELECT cluster, count(*) AS n_nodes FROM comp GROUP BY 1)
SELECT nn.cluster AS cluster_rep,
       CAST(nn.n_nodes AS BIGINT) AS n_nodes,
       CAST(cin.e_in AS BIGINT) AS e_in,
       CAST(deg.deg_sum AS BIGINT) AS deg_sum,
       round(CAST(cin.e_in AS DOUBLE) / mm.m
             - pow(CAST(deg.deg_sum AS DOUBLE) / (2.0 * mm.m), 2), 6)
         AS modularity_term
FROM nn JOIN cin USING (cluster) JOIN deg USING (cluster) CROSS JOIN mm
"""


@query(
    "dedup_cluster_modularity",
    oracle=_modularity_oracle(),
    tags=("curation", "graph", "diagnostics"),
)
def dedup_cluster_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity terms of the near-dup graph under its
    connected-component clustering: per cluster, the within-cluster
    edge share minus the squared degree share — the graph-quality
    diagnostic that says whether dedup clusters are dense communities
    (terms near e_in/m) or sprawling chains (terms dragged down by
    degree mass). Components make every edge intra-cluster, so e_in
    sums to m and the total Q isolates the degree-concentration
    penalty.

    Scale shape: consumes the SESSION-SHARED near_dup_pairs_lsh pair
    table (built once per session, plans/_cache.py) and the adaptive
    connected components; the three per-cluster aggregates are hash
    joins/aggregates on node/cluster keys; m is one loop-control
    scalar."""
    from atlassian_confluence_data_pipeline_spark.operators.graph import (
        connected_components,
    )
    from atlassian_confluence_data_pipeline_spark.plans._cache import (
        shared_pair_table,
    )
    from atlassian_confluence_data_pipeline_spark.plans.multimodal import (
        near_dup_pairs_lsh,
    )

    from atlassian_confluence_data_pipeline_spark.plans.curation import (
        near_dup_components,
    )

    pairs = shared_pair_table(
        spark, sf_dir, "near_dup_pairs_lsh", near_dup_pairs_lsh
    ).select(F.col("doc_a"), F.col("doc_b")).localCheckpoint(eager=True)
    m = pairs.count()
    # staged CC (round-10): deterministic function of the staged pairs
    comp = near_dup_components(spark, sf_dir).select(
        F.col("node"), F.col("component").alias("cluster")
    ).localCheckpoint(eager=True)
    edges = pairs.select(F.col("doc_a").alias("s")).unionByName(
        pairs.select(F.col("doc_b").alias("s"))
    )
    cin = (
        pairs.join(comp, pairs.doc_a == comp.node)
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("e_in"))
    )
    deg = (
        edges.join(comp, edges.s == comp.node)
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("deg_sum"))
    )
    nn = comp.groupBy("cluster").agg(F.count(F.lit(1)).alias("n_nodes"))
    return (
        nn.join(cin, "cluster")
        .join(deg, "cluster")
        .select(
            F.col("cluster").alias("cluster_rep"),
            F.col("n_nodes").cast("bigint").alias("n_nodes"),
            F.col("e_in").cast("bigint").alias("e_in"),
            F.col("deg_sum").cast("bigint").alias("deg_sum"),
            F.round(
                F.col("e_in").cast("double") / m
                - F.pow(F.col("deg_sum").cast("double") / (2.0 * m), 2),
                6,
            ).alias("modularity_term"),
        )
    )


# ---------------------------------------------------------------------------
# Categorical mutual information (wave 27)
# ---------------------------------------------------------------------------

def _mi_sql(table: str, x: str, y: str, label: str) -> str:
    return f"""
SELECT '{label}' AS pair_name,
       CAST(n AS BIGINT) AS n,
       CAST(nx AS INT) AS card_x,
       CAST(ny AS INT) AS card_y,
       round(CAST(sum(mi_term) AS DOUBLE), 6) AS mutual_info,
       round(CAST(sum(mi_term) AS DOUBLE)
             / sqrt(hx * hy), 6) AS normalized_mi
FROM (
  SELECT j.cxy, mx.cx, my.cy, g.n, g.nx, g.ny, g.hx, g.hy,
         CAST(round(CAST(j.cxy AS DOUBLE) / g.n
               * ln(CAST(j.cxy AS DOUBLE) * g.n
                    / (CAST(mx.cx AS DOUBLE) * my.cy)), 12)
              AS DECIMAL(28,14)) AS mi_term
  FROM (SELECT {x} AS xv, {y} AS yv, count(*) AS cxy
        FROM {table} GROUP BY 1, 2) j
  JOIN (SELECT {x} AS xv, count(*) AS cx FROM {table} GROUP BY 1) mx
    USING (xv)
  JOIN (SELECT {y} AS yv, count(*) AS cy FROM {table} GROUP BY 1) my
    USING (yv)
  CROSS JOIN (
    SELECT count(*) AS n,
           count(DISTINCT {x}) AS nx,
           count(DISTINCT {y}) AS ny,
           CAST((SELECT sum(CAST(round(-(CAST(cx AS DOUBLE) / tt)
                    * ln(CAST(cx AS DOUBLE) / tt), 12) AS DECIMAL(28,14)))
                 FROM (SELECT count(*) AS cx, (SELECT count(*) FROM {table}) AS tt
                       FROM {table} GROUP BY {x})) AS DOUBLE) AS hx,
           CAST((SELECT sum(CAST(round(-(CAST(cy AS DOUBLE) / tt)
                    * ln(CAST(cy AS DOUBLE) / tt), 12) AS DECIMAL(28,14)))
                 FROM (SELECT count(*) AS cy, (SELECT count(*) FROM {table}) AS tt
                       FROM {table} GROUP BY {y})) AS DOUBLE) AS hy
    FROM {table}
  ) g
)
GROUP BY n, nx, ny, hx, hy
"""


@query(
    "categorical_mutual_information",
    oracle=(
        _mi_sql("lineitem", "l_returnflag", "l_linestatus", "returnflag_linestatus")
        + "\nUNION ALL\n"
        + _mi_sql("orders", "o_orderstatus", "o_orderpriority", "orderstatus_priority")
    ),
    tags=("diagnostics", "statistics", "information"),
)
def categorical_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information (and entropy-normalized MI) between
    categorical column pairs — the dependence screen that says whether
    two low-cardinality columns carry redundant signal (the
    categorical sibling of numeric_correlation_matrix). MI =
    sum p_xy ln(p_xy / (p_x p_y)) over the joint-count table.

    Exactness: joint/marginal counts are exact integers; each ln term
    is rounded to 12 decimals and summed in DECIMAL(28,14) so the
    CELL-ORDER of the sum cannot move the hash (double addition is not
    associative; decimal is); the final normalization is one closed
    form. Scale shape: one hash aggregate per joint/marginal (tiny
    domains), broadcast marginal joins."""

    def one(table: str, x: str, y: str, label: str) -> DataFrame:
        t = load_table(spark, sf_dir, table)
        # ONE corpus aggregate to the |x|·|y|-bounded joint grid; the
        # total, both marginals, both cardinalities and both entropies
        # all derive from it (exact integer sums of joint counts ==
        # direct marginal counts) — before, each was its own corpus
        # scan: 6 sequential corpus jobs per pair (round-11, guide §1.2).
        # Round 12: the derived scalars (n, entropies, cardinalities)
        # stay IN THE PLAN as 1-row frames cross-joined back instead of
        # 6 per-pair driver collect jobs — one action per invocation,
        # identical expressions on identical values (the double/n and
        # ln terms now read n from a column rather than a literal).
        j = (
            t.groupBy(F.col(x).alias("xv"), F.col(y).alias("yv"))
            .agg(F.count(F.lit(1)).alias("cxy"))
            .localCheckpoint(eager=True)
        )
        total = j.agg(F.sum("cxy").alias("nn"))
        mx = j.groupBy("xv").agg(F.sum("cxy").alias("cx"))
        my = j.groupBy("yv").agg(F.sum("cxy").alias("cy"))

        def entropy(marg: DataFrame, c: str, out: str) -> DataFrame:
            return (
                marg.crossJoin(F.broadcast(total))
                .select(
                    F.round(
                        -(F.col(c).cast("double") / F.col("nn"))
                        * F.log(F.col(c).cast("double") / F.col("nn")),
                        12,
                    )
                    .cast("decimal(28,14)")
                    .alias("t")
                )
                .agg(F.sum("t").cast("double").alias(out))
            )

        term = F.round(
            (F.col("cxy").cast("double") / F.col("nn"))
            * F.log(
                F.col("cxy").cast("double") * F.col("nn")
                / (F.col("cx").cast("double") * F.col("cy"))
            ),
            12,
        ).cast("decimal(28,14)")
        mi = (
            j.join(F.broadcast(mx), "xv")
            .join(F.broadcast(my), "yv")
            .crossJoin(F.broadcast(total))
            .agg(F.sum(term).cast("double").alias("mi"))
        )
        cards = mx.agg(F.count(F.lit(1)).alias("nx")).crossJoin(
            my.agg(F.count(F.lit(1)).alias("ny"))
        )
        return (
            mi.crossJoin(F.broadcast(total))
            .crossJoin(F.broadcast(cards))
            .crossJoin(F.broadcast(entropy(mx, "cx", "hx")))
            .crossJoin(F.broadcast(entropy(my, "cy", "hy")))
            .select(
                F.lit(label).alias("pair_name"),
                F.col("nn").cast("bigint").alias("n"),
                F.col("nx").cast("int").alias("card_x"),
                F.col("ny").cast("int").alias("card_y"),
                F.round("mi", 6).alias("mutual_info"),
                F.round(
                    F.col("mi") / F.sqrt(F.col("hx") * F.col("hy")), 6
                ).alias("normalized_mi"),
            )
        )

    return one(
        "lineitem", "l_returnflag", "l_linestatus", "returnflag_linestatus"
    ).unionByName(
        one("orders", "o_orderstatus", "o_orderpriority", "orderstatus_priority")
    )
