"""Tenth-wave time-series / sampling / Arrow-path operators.

- per-source min-max normalization via ``applyInPandas`` — puts the
  Arrow grouped-map path itself under the DRIVER's oracle gate (the
  streaming/§2.10 pandas machinery was pytest-proven; this makes it
  hash-proven in a vanilla session too),
- deterministic weighted sampling WITHOUT replacement
  (Efraimidis-Spirakis exponential-key top-k, hash-derived uniforms so
  both engines draw the identical sample),
- time-weighted average of event values (TWAP): interval-to-next
  weighting with DECIMAL-exact products,
- a late-arrival watermark audit: per user, how many events arrive
  later than a 30-minute watermark would admit, using arrival order
  (event_id) vs event time — the batch diagnostic that SIZES the
  streaming watermark before deployment.

Float discipline: integer epoch-microsecond arithmetic for all time
math, DECIMAL products for weighted sums, hash-uniform draws from the
house affine family. ln() parity note: sample keys use F.log, the same
libm surface the DSIR/entropy oracles already hash-prove.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.functions.text import ROLLING_MOD
from atlassian_confluence_data_pipeline_spark.operators.lsh import MINHASH_PERMS
from atlassian_confluence_data_pipeline_spark.plans.registry import query

#: weighted sampling: draw size and the affine perm for the uniform
SAMPLE_K = 50
SAMPLE_PERM = MINHASH_PERMS[40]

#: late-arrival audit watermark (microseconds)
WATERMARK_US = 30 * 60 * 1_000_000


# ---------------------------------------------------------------------------
# applyInPandas min-max normalization (Arrow grouped-map on the gate)
# ---------------------------------------------------------------------------

@query(
    "source_minmax_normalize",
    oracle="""
WITH s AS (
  SELECT doc_id, source, n_chars,
         min(n_chars) OVER (PARTITION BY source) AS mn,
         max(n_chars) OVER (PARTITION BY source) AS mx
  FROM documents
)
SELECT doc_id, source, n_chars,
       round(CASE WHEN mx = mn THEN 0.0
             ELSE CAST(n_chars - mn AS DOUBLE) / (mx - mn) END, 6)
         AS norm
FROM s
""",
    tags=("curation", "normalization", "pandas", "arrow"),
)
def source_minmax_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source min-max normalization of document length, computed in
    an ``applyInPandas`` grouped-map — deliberately, although a window
    expresses it (the oracle does exactly that): this query puts the
    Arrow grouped-map hop itself under the driver's value-hash gate, so
    the engine's pandas-UDF surface is proven in a vanilla session, not
    just in pytest. The arithmetic ((x - min) / (max - min) in float64)
    is bit-identical between pandas/numpy and both SQL engines because
    the operands are exact integers.

    Scale shape: one exchange on the group key, Arrow-batched transfer,
    vectorized numpy math per group — the sanctioned Python path
    (ArrowEval/FlatMapGroupsInPandas; never row-at-a-time). Degenerate
    single-length groups normalize to 0."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )

    def norm(pdf: pd.DataFrame) -> pd.DataFrame:
        mn = int(pdf["n_chars"].min())
        mx = int(pdf["n_chars"].max())
        if mx == mn:
            pdf["norm"] = 0.0
        else:
            pdf["norm"] = (pdf["n_chars"] - mn).astype("float64") / float(
                mx - mn
            )
        return pdf

    out = docs.groupBy("source").applyInPandas(
        norm, schema="doc_id long, source string, n_chars long, norm double"
    )
    return out.select(
        "doc_id", "source", "n_chars", F.round("norm", 6).alias("norm")
    )


# ---------------------------------------------------------------------------
# Deterministic weighted sampling without replacement
# ---------------------------------------------------------------------------

@query(
    "weighted_sample_wor",
    oracle=f"""
WITH u AS (
  SELECT doc_id, n_chars,
         CAST(({SAMPLE_PERM[0]} * (doc_id % {ROLLING_MOD})
               + {SAMPLE_PERM[1]}) % {ROLLING_MOD}
              + 1 AS DOUBLE) / {ROLLING_MOD + 1} AS u
  FROM documents WHERE n_chars > 0
), keyed AS (
  SELECT doc_id, n_chars, -ln(u) / n_chars AS k FROM u
), ranked AS (
  SELECT doc_id, n_chars, k,
         row_number() OVER (ORDER BY k, doc_id) AS rank
  FROM keyed
)
SELECT doc_id, n_chars, round(k, 9) AS sample_key, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {SAMPLE_K}
""",
    tags=("curation", "sampling", "weighted"),
)
def weighted_sample_wor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis-Spirakis):
    each document draws an exponential key -ln(u)/w with weight
    w = n_chars; the k smallest keys form an exact weighted sample
    without replacement. The uniform u is HASH-derived (affine perm of
    doc_id into (0, 1]) so the 'random' draw is deterministic and both
    engines select the identical sample — the reproducible-sampling
    contract every dataset release needs.

    Scale shape: a narrow key projection then a global top-k via
    orderBy+limit — TakeOrderedAndProject (per-partition k-row heaps +
    one k-row driver merge; the bm25_topk discipline), so the corpus
    never fully sorts; the rank window runs on the {K}-row result
    only. At 100 TB this is ONE pass + a k-row reduction — the
    streaming A-ES reservoir is the same math with a running heap."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    a, b = SAMPLE_PERM
    # id reduced below 2^31 before the affine multiply (overflow
    # discipline: a*id must stay < 2^62 for ANY key range)
    u = (
        (
            (F.lit(a) * (F.col("doc_id") % ROLLING_MOD) + F.lit(b))
            % ROLLING_MOD
            + 1
        ).cast("double")
        / (ROLLING_MOD + 1)
    )
    keyed = docs.select(
        "doc_id", "n_chars", (-F.log(u) / F.col("n_chars")).alias("k")
    )
    top = keyed.orderBy("k", "doc_id").limit(SAMPLE_K)
    w = Window.orderBy("k", "doc_id")  # over the k-row result only
    return top.select(
        "doc_id",
        "n_chars",
        F.round("k", 9).alias("sample_key"),
        F.row_number().over(w).cast("int").alias("rank"),
    )


# ---------------------------------------------------------------------------
# Time-weighted average (TWAP)
# ---------------------------------------------------------------------------

@query(
    "twap_event_values",
    oracle="""
WITH t AS (
  SELECT event_type, value, epoch_us(ts) AS us,
         lead(epoch_us(ts)) OVER (PARTITION BY event_type
                                  ORDER BY ts, event_id) AS next_us
  FROM events
), iv AS (
  SELECT event_type, value, next_us - us AS dur
  FROM t WHERE next_us IS NOT NULL
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_intervals,
       CAST(sum(dur) AS BIGINT) AS total_us,
       round(CAST(sum(CAST(value AS DECIMAL(18,6)) * dur) AS DOUBLE)
             / sum(dur), 6) AS twap
FROM iv GROUP BY 1
""",
    tags=("events", "timeseries", "window"),
)
def twap_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of event values per type (TWAP): each
    observation holds until the next same-type event, so its weight is
    the interval length — the correct average for irregularly sampled
    series (a plain mean over-weights bursts). Durations are integer
    epoch-microsecond differences; value x duration products are
    DECIMAL-exact, so the weighted mean is bit-stable under any
    aggregation order.

    Scale shape: one keyed window (lead) + one hash aggregate, both on
    event_type — the sort is bounded per type partition. The last
    observation per type has no holding interval and is excluded (the
    standard right-open TWAP convention)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    t = ev.select(
        "event_type",
        "value",
        F.unix_micros("ts").alias("us"),
        F.lead(F.unix_micros("ts")).over(w).alias("next_us"),
    )
    iv = t.filter(F.col("next_us").isNotNull()).select(
        "event_type", "value", (F.col("next_us") - F.col("us")).alias("dur")
    )
    return iv.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
        F.sum("dur").cast("bigint").alias("total_us"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)") * F.col("dur")).cast(
                "double"
            )
            / F.sum("dur"),
            6,
        ).alias("twap"),
    )


# ---------------------------------------------------------------------------
# Late-arrival watermark audit
# ---------------------------------------------------------------------------

@query(
    "late_arrival_audit",
    oracle=f"""
WITH a AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         max(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND 1 PRECEDING) AS high_us
  FROM events
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN high_us IS NOT NULL
                      AND us < high_us - {WATERMARK_US}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
       round(CAST(sum(CASE WHEN high_us IS NOT NULL
                            AND us < high_us - {WATERMARK_US}
                      THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
         AS late_rate
FROM a GROUP BY 1
""",
    tags=("events", "streaming", "watermark", "diagnostic"),
)
def late_arrival_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-arrival audit: per user, how many events ARRIVE (arrival
    order = event_id, the ingestion sequence) with an event time more
    than 30 minutes behind the user's high watermark at that moment —
    i.e. exactly the rows ``withWatermark('ts', '30 minutes')`` would
    drop from a keyed aggregation. This is the batch diagnostic run
    BEFORE choosing a production watermark: the late_rate column is
    the data-loss budget each candidate bound implies.

    Scale shape: one keyed window (running max over arrival order,
    ROWS frame excluding the current row) + one hash aggregate, both
    partitioned by user — integer microsecond comparisons
    throughout."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    a = ev.select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        F.max(F.unix_micros("ts")).over(w).alias("high_us"),
    )
    late = F.when(
        F.col("high_us").isNotNull()
        & (F.col("us") < F.col("high_us") - WATERMARK_US),
        1,
    ).otherwise(0)
    return a.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(late).cast("bigint").alias("n_late"),
        F.round(F.sum(late).cast("double") / F.count(F.lit(1)), 6).alias(
            "late_rate"
        ),
    )
