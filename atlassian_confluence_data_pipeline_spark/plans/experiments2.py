"""Experimentation & ops-planning wave (47): Qini uplift-by-decile and
Bloom-filter sizing.

The uplift curve is targeting's report card: order customers by a
pre-treatment score, split each decile by the (hash-assigned) variant,
and accumulate incremental conversions — on a null experiment the Qini
curve must hug zero, which makes the fixture an A/A calibration of the
whole uplift pipeline. The Bloom plan turns observed per-source
vocabulary cardinalities into concrete filter sizes — the capacity
arithmetic an engine with Bloom-backed decontamination
(bloom_decontaminate) owes its operators."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.operators.windows import (
    distributed_prefix_rank,
)
from atlassian_confluence_data_pipeline_spark.plans.registry import query
from atlassian_confluence_data_pipeline_spark.plans.textops import _words

_AB_MOD = 2_147_483_647
_AB_A = 1_103_515_245
_AB_B = 12_345
_SPLIT_DATE = "1998-07-01"
_N_DECILES = 10

#: Bloom target false-positive probability
_FPP = 0.01


@query(
    "uplift_qini_deciles",
    oracle=f"""
WITH cust AS (
  SELECT o_custkey,
         CAST(sum(CASE WHEN CAST(o_orderdate AS DATE)
                            < DATE '{_SPLIT_DATE}'
                  THEN CAST(o_totalprice AS DECIMAL(18,2))
                  ELSE CAST(0 AS DECIMAL(18,2)) END) * 100 AS BIGINT)
           AS score,
         max(CASE WHEN CAST(o_orderdate AS DATE) >= DATE '{_SPLIT_DATE}'
             THEN 1 ELSE 0 END) AS y,
         CAST((({_AB_A} * (o_custkey % {_AB_MOD}) + {_AB_B})
               % {_AB_MOD}) % 2 AS INT) AS t
  FROM orders GROUP BY 1
  HAVING sum(CASE WHEN CAST(o_orderdate AS DATE) < DATE '{_SPLIT_DATE}'
             THEN 1 ELSE 0 END) > 0
), r AS (
  SELECT y, t,
         row_number() OVER (ORDER BY score DESC, o_custkey) AS rk,
         count(*) OVER () AS n
  FROM cust
), d AS (
  SELECT CAST(ceil(CAST(rk AS DOUBLE) * {_N_DECILES} / n) AS BIGINT)
           AS decile, y, t
  FROM r
), per AS (
  SELECT decile,
         CAST(sum(t) AS BIGINT) AS n_t,
         CAST(sum(1 - t) AS BIGINT) AS n_c,
         CAST(sum(y * t) AS BIGINT) AS conv_t,
         CAST(sum(y * (1 - t)) AS BIGINT) AS conv_c
  FROM d GROUP BY 1
)
SELECT decile, n_t, n_c,
       round(CAST(conv_t AS DOUBLE) / n_t
             - CAST(conv_c AS DOUBLE) / n_c, 6) AS decile_uplift,
       round(CAST(sum(conv_t) OVER w AS DOUBLE)
             - CAST(sum(conv_c) OVER w AS DOUBLE)
               * sum(n_t) OVER w / (sum(n_c) OVER w), 4) AS qini
FROM per
WINDOW w AS (ORDER BY decile ROWS UNBOUNDED PRECEDING)
""",
    tags=("experiments", "uplift", "prefix"),
)
def uplift_qini_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qini uplift curve: customers ranked by PRE-period spend, each
    decile split by the hash-assigned variant, per-decile uplift
    (treated minus control late-period conversion rate) and the
    cumulative Qini statistic (incremental conversions vs a scaled
    control). The fixture's assignment is null by construction, so the
    curve hugging zero is the A/A calibration of the uplift machinery
    — on a real experiment the same query ranks targeting models.

    Scale shape: one customer-domain aggregate builds score/outcome/
    variant; the global score rank is distributed_prefix_rank; the
    per-decile 2x2 cells are a 10-row aggregate, and the Qini cumsum is
    a bounded 10-row window."""
    o = load_table(spark, sf_dir, "orders")
    early = F.to_date("o_orderdate") < F.lit(_SPLIT_DATE)
    cust = (
        o.groupBy("o_custkey")
        .agg(
            (
                F.sum(
                    F.when(
                        early, F.col("o_totalprice").cast("decimal(18,2)")
                    ).otherwise(F.lit(0).cast("decimal(18,2)"))
                )
                * 100
            )
            .cast("bigint")
            .alias("score"),
            F.max(F.when(~early, 1).otherwise(0)).alias("y"),
            F.sum(F.when(early, 1).otherwise(0)).alias("n_early"),
        )
        .filter(F.col("n_early") > 0)
        .withColumn(
            "t",
            (
                (
                    (
                        F.lit(_AB_A) * (F.col("o_custkey") % _AB_MOD)
                        + F.lit(_AB_B)
                    )
                    % _AB_MOD
                )
                % 2
            ).cast("int"),
        )
        .withColumn("neg_score", -F.col("score"))
    )
    n = cust.count()
    r = distributed_prefix_rank(
        cust, ["neg_score", "o_custkey"], rank_col="rk"
    )
    d = r.select(
        F.ceil(F.col("rk").cast("double") * _N_DECILES / n)
        .cast("bigint")
        .alias("decile"),
        "y",
        "t",
    )
    per = d.groupBy("decile").agg(
        F.sum("t").cast("bigint").alias("n_t"),
        F.sum(1 - F.col("t")).cast("bigint").alias("n_c"),
        F.sum(F.col("y") * F.col("t")).cast("bigint").alias("conv_t"),
        F.sum(F.col("y") * (1 - F.col("t"))).cast("bigint").alias("conv_c"),
    )
    # the Qini cumsum domain is the FIXED 10-decile frame — a bounded
    # unpartitioned window (allowlisted with a measured 16-row bound)
    # replaces a full distributed_prefix_rank pass (approxQuantile +
    # checkpoint + totals collect over ten rows) per build
    from pyspark.sql.window import Window

    w = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = per.select(
        "decile",
        "n_t",
        "n_c",
        "conv_t",
        "conv_c",
        F.sum("conv_t").over(w).alias("ct"),
        F.sum("conv_c").over(w).alias("cc"),
        F.sum("n_t").over(w).alias("nt"),
        F.sum("n_c").over(w).alias("nc"),
    )
    return cum.select(
        "decile",
        "n_t",
        "n_c",
        F.round(
            F.col("conv_t").cast("double") / F.col("n_t")
            - F.col("conv_c").cast("double") / F.col("n_c"),
            6,
        ).alias("decile_uplift"),
        F.round(
            F.col("ct").cast("double")
            - F.col("cc").cast("double")
            * F.col("nt")
            / F.col("nc"),
            4,
        ).alias("qini"),
    )


@query(
    "bloom_sizing_plan",
    oracle=rf"""
WITH words AS (
  SELECT source, unnest(regexp_split_to_array(trim(text), '\s+')) AS w
  FROM documents
), card AS (
  SELECT source, CAST(count(DISTINCT w) AS BIGINT) AS n_distinct
  FROM words GROUP BY 1
)
SELECT source, n_distinct,
       CAST(ceil(-(CAST(n_distinct AS DOUBLE)) * ln({_FPP!r})
                 / (ln(2) * ln(2))) AS BIGINT) AS m_bits,
       CAST(round(ceil(-(CAST(n_distinct AS DOUBLE)) * ln({_FPP!r})
                       / (ln(2) * ln(2)))
                  / n_distinct * ln(2)) AS BIGINT) AS k_hashes,
       round(CAST(ceil(-(CAST(n_distinct AS DOUBLE)) * ln({_FPP!r})
                       / (ln(2) * ln(2))) AS DOUBLE) / 8192, 2)
         AS kib
FROM card
""",
    tags=("experiments", "ops", "sketch"),
)
def bloom_sizing_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter capacity plan per source: from the exact distinct
    vocabulary size, the optimal bit count m = ceil(-n ln p / ln²2) and
    hash count k = round(m/n ln 2) for a {_FPP:.0%} false-positive
    target, with the KiB bill — the sizing arithmetic behind
    bloom_decontaminate / bloom_semi_join_revenue, surfaced as a query
    so capacity reviews read it from the engine instead of a wiki.

    Scale shape: one distinct-count aggregate per source (the only
    corpus-sized work), closed-form arithmetic after."""
    from atlassian_confluence_data_pipeline_spark.plans._cache import (
        doc_word_positions,
    )

    # session-staged token stream (round 11)
    card = (
        doc_word_positions(spark, sf_dir)
        .select("source", F.col("word").alias("w"))
        .groupBy("source")
        .agg(F.countDistinct("w").cast("bigint").alias("n_distinct"))
    )
    ln_p = math.log(_FPP)
    ln2 = math.log(2)
    m_bits = F.ceil(
        -(F.col("n_distinct").cast("double")) * ln_p / (ln2 * ln2)
    ).cast("bigint")
    return card.select(
        "source",
        "n_distinct",
        m_bits.alias("m_bits"),
        F.round(
            m_bits.cast("double") / F.col("n_distinct") * ln2
        )
        .cast("bigint")
        .alias("k_hashes"),
        F.round(m_bits.cast("double") / 8192, 2).alias("kib"),
    )
