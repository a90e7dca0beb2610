"""Decision-quality wave (46): cumulative-gains (CAP) curve for the
quality classifier, A/B test power planning, and a Simpson's-paradox
screen.

Three readouts that decide whether numbers should be acted on: does
the classifier RANK well (gains curve + accuracy ratio — discrimination,
the complement of wave 41's calibration), how much data an experiment
needs before its z-test means anything (power planning from observed
variance), and whether a pooled trend reverses inside every subgroup
(the classic aggregation trap)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.operators.windows import (
    distributed_prefix_rank,
)
from atlassian_confluence_data_pipeline_spark.plans.registry import query

#: gains-curve resolution
_N_DECILES = 10

#: power planning: two-sided alpha=.05, power=.80 normal quantiles
_Z_ALPHA = 1.959964
_Z_BETA = 0.841621
_AB_EVENT = "click"
_LIFT_PCTS = (1, 2, 5)


@query(
    "cap_curve_quality",
    oracle=r"""
WITH x AS (
  SELECT doc_id,
         CAST(n_chars AS BIGINT) AS score,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
  FROM documents
), r AS (
  SELECT y,
         row_number() OVER (ORDER BY score DESC, doc_id) AS rk,
         count(*) OVER () AS n,
         sum(y) OVER () AS npos
  FROM x
), d AS (
  SELECT CAST(ceil(CAST(rk AS DOUBLE) * 10 / n) AS BIGINT) AS decile,
         y, n, npos
  FROM r
), per AS (
  SELECT decile, CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(y) AS BIGINT) AS n_pos,
         CAST(max(n) AS BIGINT) AS n, CAST(max(npos) AS BIGINT) AS npos
  FROM d GROUP BY 1
)
SELECT decile, n_rows, n_pos,
       round(CAST(sum(n_pos) OVER w AS DOUBLE) / npos, 6)
         AS cum_gain,
       round(CAST(sum(n_rows) OVER w AS DOUBLE) / n, 6)
         AS cum_share,
       round(CAST(sum(n_pos) OVER w AS DOUBLE) / npos
             - CAST(sum(n_rows) OVER w AS DOUBLE) / n, 6) AS lift_over_random
FROM per
WINDOW w AS (ORDER BY decile ROWS UNBOUNDED PRECEDING)
""",
    tags=("evaluation", "gains", "prefix"),
)
def cap_curve_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative-gains (CAP) curve of a quality score (document length
    ranking English docs): sort by score descending, cut into deciles,
    and report the cumulative share of positives captured vs the share
    of documents read — the DISCRIMINATION readout (a perfect ranker
    captures all positives in the first npos/n share; a random one
    tracks the diagonal; lift_over_random is the gap). Complements the
    wave-41 calibration audit: a model can be calibrated yet rank
    nothing, and vice versa.

    Scale shape: the global score rank runs through
    distributed_prefix_rank (never a single-partition window); decile
    assignment is integer arithmetic on that rank; the curve itself is
    a 10-row bounded cumulative window."""
    docs = load_table(spark, sf_dir, "documents")
    x = docs.select(
        "doc_id",
        F.col("n_chars").cast("bigint").alias("score"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    ).withColumn("neg_score", -F.col("score"))
    head = x.agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("npos")
    ).first()
    n, npos = head["n"], head["npos"]
    r = distributed_prefix_rank(x, ["neg_score", "doc_id"], rank_col="rk")
    d = r.select(
        F.ceil(F.col("rk").cast("double") * _N_DECILES / n)
        .cast("bigint")
        .alias("decile"),
        "y",
    )
    per = (
        d.groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("y").cast("bigint").alias("n_pos"),
        )
        .localCheckpoint(eager=True)
    )
    cum = distributed_prefix_rank(
        per, ["decile"], sums={"cum_pos": "n_pos", "cum_rows": "n_rows"}
    )
    return cum.select(
        "decile",
        "n_rows",
        "n_pos",
        F.round(F.col("cum_pos").cast("double") / F.lit(npos), 6).alias(
            "cum_gain"
        ),
        F.round(F.col("cum_rows").cast("double") / F.lit(n), 6).alias(
            "cum_share"
        ),
        F.round(
            F.col("cum_pos").cast("double") / F.lit(npos)
            - F.col("cum_rows").cast("double") / F.lit(n),
            6,
        ).alias("lift_over_random"),
    )


@query(
    "ab_test_power_plan",
    oracle=f"""
WITH m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s1,
         CAST(sum(CAST(value * value AS DECIMAL(38,6))) AS DOUBLE) AS s2
  FROM events WHERE event_type = '{_AB_EVENT}'
), base AS (
  SELECT n, s1 / n AS mu,
         (s2 - s1 * s1 / n) / (n - 1) AS var
  FROM m
)
SELECT lift_pct,
       round(base.mu, 6) AS baseline_mean,
       round(sqrt(base.var), 6) AS baseline_std,
       CAST(ceil(2 * base.var
                 * ({_Z_ALPHA!r} + {_Z_BETA!r})
                 * ({_Z_ALPHA!r} + {_Z_BETA!r})
                 / ((base.mu * lift_pct / 100)
                    * (base.mu * lift_pct / 100))) AS BIGINT)
         AS n_per_arm,
       round(CAST(ceil(2 * base.var
                 * ({_Z_ALPHA!r} + {_Z_BETA!r})
                 * ({_Z_ALPHA!r} + {_Z_BETA!r})
                 / ((base.mu * lift_pct / 100)
                    * (base.mu * lift_pct / 100))) AS DOUBLE)
             / base.n, 4) AS multiples_of_corpus
FROM base CROSS JOIN (SELECT unnest([{', '.join(str(p) for p in _LIFT_PCTS)}])
                      AS lift_pct)
""",
    tags=("evaluation", "power", "experimentation"),
)
def ab_test_power_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-size planning for the engine's A/B z-test: from the
    OBSERVED mean and variance of click values, the per-arm n needed to
    detect a 1/2/5% lift at alpha=.05 (two-sided) with 80% power —
    n = 2 sigma^2 (z_a + z_b)^2 / delta^2 — plus how many corpora of
    the current size that is. The planning readout that stops teams
    from running underpowered experiments (compare
    ab_test_value_ztest, the readout AFTER the experiment).

    Scale shape: one 1-row exact-DECIMAL moment aggregate; the plan is
    closed-form arithmetic fanned over three literal lift levels."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == _AB_EVENT
    )
    m = ev.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("double")
        .alias("s1"),
        F.sum((F.col("value") * F.col("value")).cast("decimal(38,6)"))
        .cast("double")
        .alias("s2"),
    ).first()
    n, s1, s2 = m["n"], m["s1"], m["s2"]
    mu = s1 / n
    var = (s2 - s1 * s1 / n) / (n - 1)
    import math

    z2 = (_Z_ALPHA + _Z_BETA) * (_Z_ALPHA + _Z_BETA)
    rows = []
    for pct in _LIFT_PCTS:
        delta = mu * pct / 100
        need = math.ceil(2 * var * z2 / (delta * delta))
        rows.append((pct, need))
    out = spark.createDataFrame(rows, "lift_pct int, n_per_arm bigint")
    return out.select(
        "lift_pct",
        F.round(F.lit(mu), 6).alias("baseline_mean"),
        F.round(F.lit(math.sqrt(var)), 6).alias("baseline_std"),
        "n_per_arm",
        F.round(F.col("n_per_arm").cast("double") / F.lit(n), 4).alias(
            "multiples_of_corpus"
        ),
    )


@query(
    "simpsons_paradox_screen",
    oracle="""
WITH pts AS (
  SELECT p_brand AS grp,
         CAST(round(p_retailprice * 100) AS BIGINT) AS x,
         CAST(round(l_quantity * 100) AS BIGINT) AS y
  FROM lineitem JOIN part ON p_partkey = l_partkey
), g AS (
  SELECT grp, CAST(count(*) AS DOUBLE) AS m,
         CAST(sum(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
         CAST(sum(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
         CAST(sum(CAST(x * y AS DECIMAL(38,0))) AS DOUBLE) AS sxy,
         CAST(sum(CAST(x * x AS DECIMAL(38,0))) AS DOUBLE) AS sxx
  FROM pts GROUP BY 1
), slopes AS (
  SELECT grp, (m * sxy - sx * sy) / (m * sxx - sx * sx) AS slope FROM g
), pooled AS (
  SELECT (sum(m) * CAST(sum(CAST(round(sxy, 6) AS DECIMAL(38,12)))
                        AS DOUBLE)
          - CAST(sum(CAST(round(sx, 6) AS DECIMAL(38,12))) AS DOUBLE)
            * CAST(sum(CAST(round(sy, 6) AS DECIMAL(38,12))) AS DOUBLE))
         / (sum(m) * CAST(sum(CAST(round(sxx, 6) AS DECIMAL(38,12)))
                          AS DOUBLE)
            - CAST(sum(CAST(round(sx, 6) AS DECIMAL(38,12))) AS DOUBLE)
              * CAST(sum(CAST(round(sx, 6) AS DECIMAL(38,12)))
                     AS DOUBLE)) AS slope
  FROM g
)
SELECT CAST((SELECT count(*) FROM slopes) AS BIGINT) AS n_groups,
       round(pooled.slope, 9) AS pooled_slope,
       CAST((SELECT sum(CASE WHEN sign(slopes.slope)
                                  <> sign(pooled.slope)
                        THEN 1 ELSE 0 END) FROM slopes) AS BIGINT)
         AS n_sign_flips,
       CAST(CASE WHEN (SELECT sum(CASE WHEN sign(slopes.slope)
                                       <> sign(pooled.slope)
                             THEN 1 ELSE 0 END) FROM slopes)
                      * 2 > (SELECT count(*) FROM slopes)
            THEN 1 ELSE 0 END AS INT) AS paradox_flag
FROM pooled
""",
    tags=("evaluation", "stats", "screen"),
)
def simpsons_paradox_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's-paradox screen on the price-quantity relation: the
    pooled OLS slope vs per-brand slopes — if a majority of groups
    trend AGAINST the pooled direction, the aggregate is an artifact of
    group composition and must not be reported unstratified (the
    aggregation trap every dashboard eventually steps in).

    Scale shape: one fact scan into per-group exact integer moments;
    the pooled slope re-aggregates those group moments (6-rounded
    DECIMAL sums — order-independent); the verdict is bounded-domain
    arithmetic."""
    from atlassian_confluence_data_pipeline_spark.operators.skew import (
        spread_scan,
    )

    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    # per-row decimal moment products serialize on a single-split scan;
    # spread the NARROW fact projection first (guide §2.5 — no-op at
    # cluster-scale split counts; the brand_price_regression treatment)
    pts = spread_scan(li.select("l_partkey", "l_quantity")).join(
        F.broadcast(
            p.select(
                F.col("p_partkey").alias("l_partkey"),
                F.col("p_brand").alias("grp"),
                "p_retailprice",
            )
        ),
        "l_partkey",
    ).select(
        "grp",
        F.round(F.col("p_retailprice") * 100).cast("bigint").alias("x"),
        F.round(F.col("l_quantity") * 100).cast("bigint").alias("y"),
    )

    def dsum(c):
        return F.sum(c.cast("decimal(38,0)")).cast("double")

    g = pts.groupBy("grp").agg(
        F.count(F.lit(1)).cast("double").alias("m"),
        dsum(F.col("x")).alias("sx"),
        dsum(F.col("y")).alias("sy"),
        dsum(F.col("x") * F.col("y")).alias("sxy"),
        dsum(F.col("x") * F.col("x")).alias("sxx"),
    ).localCheckpoint(eager=True)
    slope = (
        F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")
    ) / (F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx"))
    slopes = g.select("grp", slope.alias("slope"))

    def d6(c):
        return F.sum(F.round(F.col(c), 6).cast("decimal(38,12)")).cast(
            "double"
        )

    pl = g.agg(
        F.sum("m").alias("m"),
        d6("sx").alias("sx"),
        d6("sy").alias("sy"),
        d6("sxy").alias("sxy"),
        d6("sxx").alias("sxx"),
    ).first()
    pooled = (pl["m"] * pl["sxy"] - pl["sx"] * pl["sy"]) / (
        pl["m"] * pl["sxx"] - pl["sx"] * pl["sx"]
    )
    import math

    sgn = math.copysign(1.0, pooled) if pooled != 0 else 0.0
    flips = slopes.agg(
        F.sum(
            F.when(F.signum("slope") != F.lit(sgn), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("f"),
        F.count(F.lit(1)).cast("bigint").alias("ng"),
    ).first()
    return spark.range(1).select(
        F.lit(flips["ng"]).cast("bigint").alias("n_groups"),
        F.round(F.lit(pooled), 9).alias("pooled_slope"),
        F.lit(flips["f"]).cast("bigint").alias("n_sign_flips"),
        F.when(F.lit(flips["f"] * 2 > flips["ng"]), 1)
        .otherwise(0)
        .cast("int")
        .alias("paradox_flag"),
    )
