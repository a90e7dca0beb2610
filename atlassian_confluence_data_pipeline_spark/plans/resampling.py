"""Robust estimation & resampling-inference wave (30): winsorized /
trimmed means, the Hodges-Lehmann pseudomedian, a deterministic
sign-flip permutation test, and jackknife variance over strata.

The estimators a pipeline reaches for when the data has outliers it
can't trust and distributions it can't assume. All reuse the engine's
distributed-selection machinery (``kth_smallest`` — only the buckets
containing a requested rank ever sort) and the exact-integer /
DECIMAL accumulation discipline; the permutation test's "randomness"
is a deterministic affine hash, so both engines flip identical signs.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.operators.windows import (
    equal_width_bucketizer,
    kth_smallest,
)
from atlassian_confluence_data_pipeline_spark.plans.registry import query

#: symmetric trim fraction for the winsorized/trimmed estimators
_TRIM = 0.05

#: sign-flip replica count and hash constants (odd multipliers,
#: Mersenne-prime modulus — every product stays inside int64)
_N_REPLICAS = 64
_PERM_MOD = 2_147_483_647
_PERM_A = 1_103_515_245
_PERM_B = 12_345


@query(
    "winsorized_price_stats",
    oracle=f"""
WITH c AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders
), n AS (SELECT count(*) AS n FROM c),
k AS (
  SELECT CAST(floor({_TRIM} * n) + 1 AS BIGINT) AS klo,
         CAST(n - floor({_TRIM} * n) AS BIGINT) AS khi, n
  FROM n
), r AS (
  SELECT cents, row_number() OVER (ORDER BY cents) AS rk FROM c
), b AS (
  SELECT (SELECT cents FROM r CROSS JOIN k WHERE rk = klo) AS lo,
         (SELECT cents FROM r CROSS JOIN k WHERE rk = khi) AS hi
)
SELECT (SELECT CAST(n AS BIGINT) FROM n) AS n_rows,
       round(CAST(b.lo AS DOUBLE) / 100, 2) AS lo_cut,
       round(CAST(b.hi AS DOUBLE) / 100, 2) AS hi_cut,
       (SELECT CAST(count(*) AS BIGINT) FROM c CROSS JOIN b
        WHERE cents BETWEEN b.lo AND b.hi) AS n_kept,
       (SELECT round(CAST(sum(CAST(cents AS DECIMAL(38,0))) AS DOUBLE)
                     / count(*) / 100, 6)
        FROM c CROSS JOIN b WHERE cents BETWEEN b.lo AND b.hi)
         AS trimmed_mean,
       (SELECT round(CAST(sum(CAST(least(greatest(cents, b.lo), b.hi)
                                   AS DECIMAL(38,0))) AS DOUBLE)
                     / count(*) / 100, 6)
        FROM c CROSS JOIN b) AS winsor_mean
FROM b
""",
    tags=("resampling", "robust", "selection"),
)
def winsorized_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric 5% trimmed and winsorized means of order prices — the
    outlier-proof location estimates (trim: drop the tails; winsorize:
    clamp them to the cut values). The cut points are EXACT order
    statistics of integer cents, so both engines agree on every
    boundary row even under heavy ties.

    Scale shape: the cuts come from kth_smallest distributed SELECTION
    (bucket counts route rank floor(0.05n)+1 and n-floor(0.05n) to
    their buckets; only those sort — never a full-frame rank), then two
    scans with the cuts as literals: one filtered DECIMAL mean, one
    clamped DECIMAL mean. No join, no window over the fact stream."""
    o = load_table(spark, sf_dir, "orders")
    c = o.select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents")
    ).localCheckpoint(eager=True)
    n = c.count()
    klo = int(math.floor(_TRIM * n)) + 1
    khi = n - int(math.floor(_TRIM * n))
    sel = kth_smallest(c, "cents", [klo, khi])
    lo, hi = int(sel[klo]), int(sel[khi])
    kept = c.filter(F.col("cents").between(lo, hi)).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
        (
            F.sum(F.col("cents").cast("decimal(38,0)")).cast("double")
            / F.count(F.lit(1))
            / 100
        ).alias("tm"),
    )
    clamped = c.agg(
        (
            F.sum(
                F.least(F.greatest(F.col("cents"), F.lit(lo)), F.lit(hi))
                .cast("decimal(38,0)")
            ).cast("double")
            / F.count(F.lit(1))
            / 100
        ).alias("wm")
    ).first()["wm"]
    return kept.select(
        F.lit(n).cast("bigint").alias("n_rows"),
        F.round(F.lit(float(lo)) / 100, 2).alias("lo_cut"),
        F.round(F.lit(float(hi)) / 100, 2).alias("hi_cut"),
        F.col("n_kept"),
        F.round("tm", 6).alias("trimmed_mean"),
        F.round(F.lit(clamped), 6).alias("winsor_mean"),
    )


@query(
    "hodges_lehmann_daily_revenue",
    oracle="""
WITH daily AS (
  SELECT date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
           AS dnum,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
           AS cents
  FROM orders GROUP BY 1
), pairs AS (
  SELECT a.cents + b.cents AS s, a.dnum AS da, b.dnum AS db
  FROM daily a JOIN daily b ON b.dnum >= a.dnum
), r AS (
  SELECT s, row_number() OVER (ORDER BY s, da, db) AS rk,
         count(*) OVER () AS m
  FROM pairs
), med AS (
  SELECT avg(CAST(s AS DOUBLE)) AS s_mid FROM r
  WHERE rk IN ((m + 1) // 2, (m + 2) // 2)
), g AS (SELECT CAST(count(*) AS BIGINT) AS n_days,
                round(CAST(sum(CAST(cents AS DECIMAL(38,0))) AS DOUBLE)
                      / count(*) / 100, 6) AS mean_rev
         FROM daily)
SELECT g.n_days,
       CAST(g.n_days * (g.n_days + 1) / 2 AS BIGINT) AS n_pairs,
       round(med.s_mid / 200, 6) AS hl_estimate,
       g.mean_rev
FROM g CROSS JOIN med
""",
    tags=("resampling", "robust", "selection", "bounded-pairs"),
)
def hodges_lehmann_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hodges-Lehmann pseudomedian of daily revenue: the median of all
    Walsh averages (x_i + x_j)/2 over day pairs i <= j — the location
    estimator dual to the Wilcoxon signed-rank test: ~29% breakdown
    like the median, but ~96% Gaussian efficiency (the plain median
    pays 64%). Reported next to the ordinary mean for contrast.

    Scale shape: the corpus collapses to the CALENDAR-BOUNDED day
    series first (~2.4k rows), so the all-pairs frame is ~2.9M rows
    from a broadcast self-join of a tiny frame (the robust_trend
    pattern — probe side repartitioned so the BNLJ parallelizes);
    pair sums stay EXACT integer cents; the median is kth_smallest
    distributed selection — only the middle-rank buckets sort."""
    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.groupBy(
            F.datediff(F.to_date("o_orderdate"), F.lit("1992-01-01")).alias(
                "dnum"
            )
        )
        .agg(
            (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("bigint")
            .alias("cents")
        )
        .localCheckpoint(eager=True)
    )
    # ONE loop-control aggregate: day count, the mean (same exact
    # decimal-sum expression as before), and the cents min/max that
    # bound every Walsh sum — three driver jobs fused into one
    # (round-11: the sequential fn()-side jobs were the query's cost)
    st = daily.agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.sum(F.col("cents").cast("decimal(38,0)")).cast("double")
            / F.count(F.lit(1))
            / 100
        ).alias("m"),
        F.min("cents").alias("mn"),
        F.max("cents").alias("mx"),
    ).first()
    n_days, mean_rev = int(st["n"]), st["m"]
    a = daily.select(
        F.col("dnum").alias("da"), F.col("cents").alias("ca")
    ).repartition(32)
    b = daily.select(F.col("dnum").alias("db"), F.col("cents").alias("cb"))
    pairs = (
        a.join(F.broadcast(b), F.col("db") >= F.col("da"))
        .select((F.col("ca") + F.col("cb")).alias("s"))
        # materialize the ~n^2/2 (calendar-bounded) pair sums once: the
        # selection's count and hit passes both read them, and without a
        # checkpoint each pass would re-run the broadcast fan-out
        .localCheckpoint(eager=True)
    )
    m = n_days * (n_days + 1) // 2
    k1, k2 = (m + 1) // 2, (m + 2) // 2
    # O(1) equal-width bucketizer over the already-known cents range
    # (every pair sum lies in [2*mn, 2*mx]): skips the approxQuantile
    # pass AND the per-row split-point array scan the bounds form pays;
    # bucket balance only sizes the sorted hit bucket, never the values
    lo, hi = 2 * int(st["mn"]), 2 * int(st["mx"])
    sel = kth_smallest(
        pairs, "s", [k1, k2], bucket_of=equal_width_bucketizer(lo, hi, 32)
    )
    hl = (sel[k1] + sel[k2]) / 2.0
    return spark.range(1).select(
        F.lit(n_days).cast("bigint").alias("n_days"),
        F.lit(m).cast("bigint").alias("n_pairs"),
        F.round(F.lit(hl) / 200, 6).alias("hl_estimate"),
        F.round(F.lit(mean_rev), 6).alias("mean_rev"),
    )


@query(
    "sign_permutation_revenue_change",
    oracle=f"""
WITH daily AS (
  SELECT date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
           AS dnum,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
           AS cents
  FROM orders GROUP BY 1
), diffs AS (
  SELECT a.dnum, b.cents - a.cents AS d
  FROM daily a JOIN daily b ON b.dnum = a.dnum + 1
), obs AS (
  SELECT count(*) AS n,
         CAST(sum(CAST(d AS DECIMAL(38,0))) AS DOUBLE) / count(*) AS stat
  FROM diffs
), reps AS (
  SELECT r, CAST(sum(CAST(
           (1 - 2 * ((({_PERM_A} * (dnum % {_PERM_MOD})
                       + {_PERM_B} * r + 1) % {_PERM_MOD}) % 2)) * d
           AS DECIMAL(38,0))) AS DOUBLE) / count(*) AS stat_r
  FROM diffs CROSS JOIN (SELECT unnest(range({_N_REPLICAS})) AS r)
  GROUP BY r
), tail AS (
  SELECT CAST(sum(CASE WHEN abs(reps.stat_r) >= abs(obs.stat)
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme
  FROM reps CROSS JOIN obs
)
SELECT CAST(obs.n AS BIGINT) AS n_diffs,
       round(obs.stat / 100, 6) AS obs_mean_change,
       CAST({_N_REPLICAS} AS BIGINT) AS n_replicas,
       tail.n_extreme,
       round((1.0 + tail.n_extreme) / (1 + {_N_REPLICAS}), 6) AS p_value
FROM obs CROSS JOIN tail
""",
    tags=("resampling", "permutation", "deterministic"),
)
def sign_permutation_revenue_change(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Sign-flip permutation test of H0 "day-over-day revenue change is
    symmetric around zero": the observed statistic is the mean change;
    each of 64 replicas flips every day's sign by a DETERMINISTIC
    affine hash of (day, replica) and recomputes the mean; the p-value
    is the add-one-smoothed share of replicas at least as extreme.
    Pseudo-randomness from a hash, not an RNG, so both engines flip
    bit-identical signs (the engine's A/B-assignment discipline).

    Scale shape: consecutive-day diffs come from an equi-join on
    dnum+1 over the calendar-bounded day series (no window at all);
    replicas are a narrow 64-way explode of that bounded frame (rows =
    64 x |days|, still calendar-bounded); every replica statistic is an
    EXACT integer-cents DECIMAL sum — the only doubles are the final
    64+1 means."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.datediff(F.to_date("o_orderdate"), F.lit("1992-01-01")).alias(
            "dnum"
        )
    ).agg(
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("bigint")
        .alias("cents")
    )
    a = daily.select(F.col("dnum"), F.col("cents").alias("ca"))
    b = daily.select(
        (F.col("dnum") - 1).alias("dnum"), F.col("cents").alias("cb")
    )
    diffs = (
        a.join(b, "dnum")
        .select("dnum", (F.col("cb") - F.col("ca")).alias("d"))
        .localCheckpoint(eager=True)
    )
    obs_row = diffs.agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.sum(F.col("d").cast("decimal(38,0)")).cast("double")
            / F.count(F.lit(1))
        ).alias("stat"),
    ).first()
    n, obs = obs_row["n"], obs_row["stat"]
    reps = (
        diffs.select(
            "dnum",
            "d",
            F.explode(
                F.array(*[F.lit(i) for i in range(_N_REPLICAS)])
            ).alias("r"),
        )
        .select(
            "r",
            (
                (
                    1
                    - 2
                    * (
                        (
                            (
                                F.lit(_PERM_A)
                                * (F.col("dnum").cast("bigint") % _PERM_MOD)
                                + F.lit(_PERM_B) * F.col("r").cast("bigint")
                                + 1
                            )
                            % _PERM_MOD
                        )
                        % 2
                    )
                )
                * F.col("d")
            ).alias("sd"),
        )
        .groupBy("r")
        .agg(
            (
                F.sum(F.col("sd").cast("decimal(38,0)")).cast("double")
                / F.count(F.lit(1))
            ).alias("stat_r")
        )
    )
    n_extreme = (
        reps.agg(
            F.sum(
                F.when(F.abs(F.col("stat_r")) >= abs(obs), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("x")
        ).first()["x"]
    )
    return spark.range(1).select(
        F.lit(n).cast("bigint").alias("n_diffs"),
        F.round(F.lit(obs) / 100, 6).alias("obs_mean_change"),
        F.lit(_N_REPLICAS).cast("bigint").alias("n_replicas"),
        F.lit(n_extreme).cast("bigint").alias("n_extreme"),
        F.round(
            (F.lit(1.0) + F.lit(n_extreme)) / (1 + _N_REPLICAS), 6
        ).alias("p_value"),
    )


@query(
    "jackknife_source_variance",
    oracle="""
WITH m AS (
  SELECT source, count(*) AS n_h,
         CAST(sum(n_chars) AS BIGINT) AS s_h
  FROM documents GROUP BY 1
), tot AS (
  SELECT CAST(sum(n_h) AS BIGINT) AS n,
         CAST(sum(s_h) AS BIGINT) AS s,
         CAST(count(*) AS BIGINT) AS g
  FROM m
), loo AS (
  SELECT CAST(tot.s - m.s_h AS DOUBLE) / (tot.n - m.n_h) AS theta
  FROM m CROSS JOIN tot
), acc AS (
  SELECT CAST(sum(CAST(round(theta, 9) AS DECIMAL(28,12))) AS DOUBLE) AS t,
         CAST(sum(CAST(round(theta * theta, 9) AS DECIMAL(28,12)))
              AS DOUBLE) AS q
  FROM loo
)
SELECT tot.g AS n_strata,
       round(CAST(tot.s AS DOUBLE) / tot.n, 6) AS full_mean,
       round(acc.t / tot.g, 6) AS jk_mean,
       round(sqrt((tot.g - 1.0) / tot.g * (acc.q - acc.t * acc.t / tot.g)),
             6) AS jk_se,
       round((tot.g - 1.0) * (acc.t / tot.g - CAST(tot.s AS DOUBLE) / tot.n),
             6) AS jk_bias
FROM acc CROSS JOIN tot
""",
    tags=("resampling", "jackknife", "stats"),
)
def jackknife_source_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-one-stratum jackknife for the mean document length: each
    replicate drops one SOURCE (the natural resampling unit when docs
    within a source are correlated) and recomputes the mean; the
    jackknife SE and bias estimate quantify how much any single source
    sways the corpus-level statistic — the robustness readout before
    trusting a corpus-wide quality number.

    Scale shape: one hash aggregate to the source domain with exact
    integer moments; every leave-one-out mean is then closed-form
    arithmetic on (total - stratum) scalars — g replicates WITHOUT g
    passes over the data. The replicate moments are 9-rounded doubles
    summed in DECIMAL(28,12)."""
    docs = load_table(spark, sf_dir, "documents")
    m = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_h"),
        F.sum("n_chars").cast("bigint").alias("s_h"),
    ).localCheckpoint(eager=True)
    tot = m.agg(
        F.sum("n_h").cast("bigint").alias("n"),
        F.sum("s_h").cast("bigint").alias("s"),
        F.count(F.lit(1)).cast("bigint").alias("g"),
    ).first()
    n, s, g = tot["n"], tot["s"], tot["g"]
    theta = (F.lit(s) - F.col("s_h")).cast("double") / (
        F.lit(n) - F.col("n_h")
    )
    acc = m.select(theta.alias("theta")).agg(
        F.sum(F.round(F.col("theta"), 9).cast("decimal(28,12)"))
        .cast("double")
        .alias("t"),
        F.sum(
            F.round(F.col("theta") * F.col("theta"), 9).cast(
                "decimal(28,12)"
            )
        )
        .cast("double")
        .alias("q"),
    )
    full_mean = float(s) / n
    t, q = F.col("t"), F.col("q")
    return acc.select(
        F.lit(g).cast("bigint").alias("n_strata"),
        F.round(F.lit(s).cast("double") / F.lit(n), 6).alias("full_mean"),
        F.round(t / g, 6).alias("jk_mean"),
        F.round(F.sqrt((g - 1.0) / g * (q - t * t / g)), 6).alias("jk_se"),
        F.round(
            (g - 1.0) * (t / g - F.lit(s).cast("double") / F.lit(n)), 6
        ).alias("jk_bias"),
    )
