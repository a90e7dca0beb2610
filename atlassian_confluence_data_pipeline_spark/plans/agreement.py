"""Labeler-agreement, sequence-entropy, and mixture-planning analytics
(round-6 wave).

Reference parity note: the reference pipeline (`/root/reference`) has no
statistics of any kind; these are driver-mandate §2.11 training-data
extensions.

Float discipline: every count is integer-exact; ratios convert with ONE
shared expression shape; libm terms (log2, pow) are 9-rounded and
DECIMAL-summed so the accumulation is order-free and a 1-ULP libm
disagreement cannot survive into the hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.plans.registry import query
from atlassian_confluence_data_pipeline_spark.plans.textops import _words

#: labeler A: "substantial" iff at least this many characters
KAPPA_MIN_CHARS = 300

#: temperature grid for the mixture planner (0.5 = squared shares,
#: 2.0 = square-rooted shares)
MIX_TAUS = (0.5, 0.75, 1.0, 1.5, 2.0)


@query(
    "quality_labeler_agreement",
    oracle=f"""
WITH lab AS (
  SELECT CASE WHEN n_chars >= {KAPPA_MIN_CHARS} THEN 1 ELSE 0 END AS a,
         CASE WHEN 2 * len(list_distinct(regexp_split_to_array(trim(text), '\\s+')))
                   >= len(regexp_split_to_array(trim(text), '\\s+'))
              THEN 1 ELSE 0 END AS b
  FROM documents
), c AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(a) AS BIGINT) AS na,
         CAST(sum(b) AS BIGINT) AS nb,
         CAST(sum(a * b) AS BIGINT) AS n11
  FROM lab
)
SELECT n, n11,
       na - n11 AS n10,
       nb - n11 AS n01,
       n - na - nb + n11 AS n00,
       round(CAST(2 * n11 + n - na - nb AS DOUBLE) / n, 6) AS po,
       round(CAST(na * nb + (n - na) * (n - nb) AS DOUBLE) / n / n, 6) AS pe,
       round((CAST(2 * n11 + n - na - nb AS DOUBLE) / n
              - CAST(na * nb + (n - na) * (n - nb) AS DOUBLE) / n / n)
             / (1.0 - CAST(na * nb + (n - na) * (n - nb) AS DOUBLE) / n / n),
             6) AS kappa
FROM c
""",
    tags=("quality", "agreement", "labeling"),
)
def quality_labeler_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two rule-based document quality labelers —
    labeler A: length (>= {C} chars), labeler B: lexical diversity
    (distinct words >= half the tokens, tested as the INTEGER comparison
    2*distinct >= total so no ratio is ever floated) — the
    inter-annotator-agreement gate every labeling pipeline runs before
    trusting a heuristic as silver truth.

    Scale shape: one narrow corpus pass to two 0/1 columns, one 4-cell
    aggregate; kappa is driver-free closed-form arithmetic on the
    integer cells, written with the oracle's exact expression shape."""
    docs = load_table(spark, sf_dir, "documents")
    w = _words(F.col("text"))
    lab = docs.select(
        F.when(F.col("n_chars") >= KAPPA_MIN_CHARS, 1).otherwise(0).alias("a"),
        F.when(
            2 * F.size(F.array_distinct(w)) >= F.size(w), 1
        ).otherwise(0).alias("b"),
    )
    c = lab.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("a").cast("bigint").alias("na"),
        F.sum("b").cast("bigint").alias("nb"),
        F.sum(F.col("a") * F.col("b")).cast("bigint").alias("n11"),
    )
    po = (2 * F.col("n11") + F.col("n") - F.col("na") - F.col("nb")).cast(
        "double"
    ) / F.col("n")
    pe = (
        (
            F.col("na") * F.col("nb")
            + (F.col("n") - F.col("na")) * (F.col("n") - F.col("nb"))
        ).cast("double")
        / F.col("n")
        / F.col("n")
    )
    return c.select(
        "n",
        "n11",
        (F.col("na") - F.col("n11")).alias("n10"),
        (F.col("nb") - F.col("n11")).alias("n01"),
        (F.col("n") - F.col("na") - F.col("nb") + F.col("n11")).alias("n00"),
        F.round(po, 6).alias("po"),
        F.round(pe, 6).alias("pe"),
        F.round((po - pe) / (F.lit(1.0) - pe), 6).alias("kappa"),
    )


@query(
    "transition_entropy_rate",
    oracle="""
WITH seq AS (
  SELECT event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events
), cnt AS (
  SELECT prev_type, event_type, CAST(count(*) AS BIGINT) AS c
  FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2
), rowt AS (
  SELECT prev_type, CAST(sum(c) AS BIGINT) AS t FROM cnt GROUP BY 1
), hh AS (
  SELECT cnt.prev_type, rowt.t,
         CAST(sum(CAST(round(CAST(c AS DOUBLE) / t * (log2(t) - log2(c)), 9)
                       AS DECIMAL(28,12))) AS DOUBLE) AS h
  FROM cnt JOIN rowt USING (prev_type) GROUP BY 1, 2
), tot AS (SELECT CAST(sum(t) AS BIGINT) AS bt FROM rowt)
SELECT prev_type, t AS n_out, round(h, 6) AS entropy_bits,
       round(CAST(t AS DOUBLE) / bt, 6) AS weight
FROM hh, tot
UNION ALL
SELECT '_RATE_', bt,
       round(CAST(sum(CAST(round(CAST(t AS DOUBLE) / bt * h, 9)
                           AS DECIMAL(28,12))) AS DOUBLE), 6),
       1.0
FROM hh, tot GROUP BY bt
""",
    tags=("structure", "markov", "entropy", "events"),
)
def transition_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional entropy of the per-user event-type Markov chain: per
    source state, H(next | prev = s) in bits over the MLE transition
    row, plus the empirically weighted entropy rate (the '_RATE_' row) —
    the "how predictable is behavior" summary on top of
    event_transition_matrix, and the sequence-level sibling of
    word_entropy_scores.

    Scale shape: corpus work is the user-keyed lag window + one hash
    aggregate to the |event_types|^2-bounded count grid; entropy terms
    use log2 ON INTEGERS only (p*log2(1/p) = c/t*(log2 t - log2 c)),
    9-rounded and DECIMAL-summed so the per-state fold is order-free
    and libm-drift-proof."""
    from atlassian_confluence_data_pipeline_spark.plans._cache import (
        event_transition_counts,
    )

    # the user-keyed lag window + hash aggregate ride the session-staged
    # transition grid (shared with event_transition_matrix and
    # markov_stationary_events); everything below is |event_types|²-sized
    cnt = event_transition_counts(spark, sf_dir)
    rowt = cnt.groupBy("prev_type").agg(F.sum("c").cast("bigint").alias("t"))
    term = F.round(
        F.col("c").cast("double")
        / F.col("t")
        * (F.log2(F.col("t")) - F.log2(F.col("c"))),
        9,
    ).cast("decimal(28,12)")
    hh = (
        cnt.join(rowt, "prev_type")
        .groupBy("prev_type", "t")
        .agg(F.sum(term).cast("double").alias("h"))
        .localCheckpoint(eager=True)
    )
    bt = hh.agg(F.sum("t").cast("bigint").alias("bt")).first()["bt"]
    if bt is None:
        # zero transitions: the oracle's 'FROM hh, tot GROUP BY bt'
        # cross joins against an EMPTY hh and emits no rows at all —
        # skip both the per-state rows and the '_RATE_' row instead of
        # emitting a null-entropy rate row (round-6 advice)
        return spark.createDataFrame(
            [], "prev_type string, n_out bigint, entropy_bits double,"
            " weight double"
        )
    per_state = hh.select(
        "prev_type",
        F.col("t").alias("n_out"),
        F.round("h", 6).alias("entropy_bits"),
        F.round(F.col("t").cast("double") / F.lit(bt), 6).alias("weight"),
    )
    rate_term = F.round(
        F.col("t").cast("double") / F.lit(bt) * F.col("h"), 9
    ).cast("decimal(28,12)")
    rate = hh.agg(
        F.lit("_RATE_").alias("prev_type"),
        F.lit(bt).cast("bigint").alias("n_out"),
        F.round(F.sum(rate_term).cast("double"), 6).alias("entropy_bits"),
        F.lit(1.0).alias("weight"),
    )
    return per_state.unionByName(rate)


@query(
    "mixture_temperature_distances",
    oracle=f"""
WITH s AS (
  SELECT source, CAST(count(*) AS BIGINT) AS c FROM documents GROUP BY 1
), tot AS (
  SELECT CAST(sum(c) AS DOUBLE) AS n, CAST(count(*) AS DOUBLE) AS k FROM s
), g AS (
  SELECT unnest([{", ".join(f"CAST('{t!r}' AS DOUBLE)" for t in MIX_TAUS)}]) AS tau
), a AS (
  SELECT tau, source,
         round(pow(CAST(c AS DOUBLE) / tot.n, 1.0 / tau), 9) AS a
  FROM s, g, tot
), z AS (
  SELECT tau, CAST(sum(CAST(a AS DECIMAL(28,12))) AS DOUBLE) AS z
  FROM a GROUP BY 1
), q AS (
  SELECT a.tau, a.a / z.z AS q FROM a JOIN z USING (tau)
), d AS (
  SELECT tau,
         CAST(sum(CAST(round(abs(1.0 / tot.k - q), 9) AS DECIMAL(28,12)))
              AS DOUBLE) AS s_tv,
         CAST(sum(CAST(round((q - 1.0 / tot.k) * (q - 1.0 / tot.k) * tot.k, 9)
                       AS DECIMAL(28,12))) AS DOUBLE) AS s_chi2
  FROM q, tot GROUP BY 1
)
SELECT tau, round(0.5 * s_tv, 6) AS tv, round(s_chi2, 6) AS chi2
FROM d
""",
    tags=("curation", "mixture", "sampling", "planning"),
)
def mixture_temperature_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture-temperature planning: for each candidate temperature tau,
    reweight the per-source document shares as p^(1/tau) (normalized)
    and report the total-variation and chi-square distance to the
    UNIFORM target — the "how hard must I temperature-flatten this
    corpus" table the sampling stage (temperature mixture, per-source
    caps) is tuned from. tau = 1 is the raw mixture; 2 is
    square-rooted; 0.5 squared.

    Scale shape: one hash aggregate to the bounded source table; the
    tau grid arrives by exploding a literal array (no join, no
    cross); shares and distances are per-(tau, source) arithmetic with
    9-rounded DECIMAL sums, so the pow() libm drift class cannot reach
    the hash. No logs anywhere — TV and chi-square keep the metric
    deterministic."""
    docs = load_table(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    tot = s.agg(
        F.sum("c").cast("double").alias("n"),
        F.count(F.lit(1)).cast("double").alias("k"),
    ).first()
    n, k = float(tot["n"]), float(tot["k"])
    taus = F.explode(
        F.array(*[F.lit(float(t)).cast("double") for t in MIX_TAUS])
    ).alias("tau")
    a = s.select("source", "c", taus).select(
        "tau",
        "source",
        F.round(
            F.pow(F.col("c").cast("double") / F.lit(n), F.lit(1.0) / F.col("tau")),
            9,
        ).alias("a"),
    )
    z = a.groupBy("tau").agg(
        F.sum(F.col("a").cast("decimal(28,12)")).cast("double").alias("z")
    )
    q = a.join(z, "tau").select("tau", (F.col("a") / F.col("z")).alias("q"))
    u = F.lit(1.0) / F.lit(k)
    d = q.groupBy("tau").agg(
        F.sum(F.round(F.abs(u - F.col("q")), 9).cast("decimal(28,12)"))
        .cast("double")
        .alias("s_tv"),
        F.sum(
            F.round((F.col("q") - u) * (F.col("q") - u) * F.lit(k), 9).cast(
                "decimal(28,12)"
            )
        )
        .cast("double")
        .alias("s_chi2"),
    )
    return d.select(
        "tau",
        F.round(F.lit(0.5) * F.col("s_tv"), 6).alias("tv"),
        F.round("s_chi2", 6).alias("chi2"),
    )
