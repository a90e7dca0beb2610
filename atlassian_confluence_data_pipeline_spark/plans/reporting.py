"""Executive reporting wave (48): the curation savings report.

One row a data-platform lead can read: how much of the corpus is
EXACTLY removable (byte-identical duplicates, keep-lowest-id
survivorship), how much near-duplication the LSH detector sees on top,
and what that means in characters — the business case for the whole
dedup stack, composed from the engine's own oracle-proven chains
(exact fingerprints + the session-shared LSH pair table)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.plans.registry import query


def _lsh_pairs_sql() -> str:
    from atlassian_confluence_data_pipeline_spark.plans import (  # noqa: F401
        multimodal,
    )
    from atlassian_confluence_data_pipeline_spark.plans.registry import (
        QUERIES,
    )

    return QUERIES["near_dup_pairs_lsh"].oracle


@query(
    "curation_savings_report",
    oracle=r"""
WITH pairs AS ({pairs}),
fp AS (
  SELECT doc_id, n_chars,
         md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fingerprint
  FROM documents
), ranked AS (
  SELECT doc_id, n_chars,
         row_number() OVER (PARTITION BY fingerprint
                            ORDER BY doc_id) AS rn
  FROM fp
), exact AS (
  SELECT CAST(count(*) AS BIGINT) AS removable_docs,
         CAST(coalesce(sum(n_chars), 0) AS BIGINT) AS removable_chars
  FROM ranked WHERE rn > 1
), nd2 AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM pairs) AS n_pairs,
         (SELECT CAST(count(DISTINCT node) AS BIGINT)
          FROM (SELECT doc_a AS node FROM pairs
                UNION ALL SELECT doc_b FROM pairs)) AS affected
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS total_chars
  FROM documents
)
SELECT tot.n_docs, tot.total_chars,
       exact.removable_docs AS exact_removable_docs,
       exact.removable_chars AS exact_removable_chars,
       round(CAST(exact.removable_chars AS DOUBLE) / tot.total_chars, 6)
         AS exact_char_share,
       nd2.n_pairs AS neardup_pairs,
       nd2.affected AS neardup_affected_docs,
       round(CAST(nd2.affected AS DOUBLE) / tot.n_docs, 6)
         AS neardup_doc_share
FROM tot CROSS JOIN exact CROSS JOIN nd2
""",
    tags=("reporting", "dedup", "composition"),
)
def curation_savings_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one-row dedup business case: exact duplicates removable with
    keep-lowest-id survivorship (docs and characters — the storage and
    training-compute bill), plus the near-duplication surface the LSH
    detector finds beyond byte-equality (pair count and affected-doc
    share). Composed from exact_dedup_docs' fingerprint discipline and
    the session-shared near_dup_pairs_lsh chain, so the report can
    never disagree with the queries it summarizes.

    Scale shape: one fingerprint aggregate with a keyed survivor window
    (fingerprint-partitioned), the shared LSH chain, and three scalar
    rollups."""
    from atlassian_confluence_data_pipeline_spark.plans._cache import (
        shared_pair_table,
    )
    from atlassian_confluence_data_pipeline_spark.plans.multimodal import (
        near_dup_pairs_lsh,
    )

    docs = load_table(spark, sf_dir, "documents")
    fp = docs.select(
        "doc_id",
        "n_chars",
        F.md5(
            F.lower(F.regexp_replace("text", r"\s+", " "))
        ).alias("fingerprint"),
    )
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    exact = (
        fp.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") > 1)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("removable_docs"),
            F.coalesce(F.sum("n_chars"), F.lit(0))
            .cast("bigint")
            .alias("removable_chars"),
        )
        .first()
    )
    pairs = shared_pair_table(
        spark, sf_dir, "near_dup_pairs_lsh", near_dup_pairs_lsh
    ).select("doc_a", "doc_b")
    n_pairs = pairs.count()
    affected = (
        pairs.select(F.col("doc_a").alias("node"))
        .union(pairs.select(F.col("doc_b").alias("node")))
        .distinct()
        .count()
    )
    tot = docs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    ).first()
    return spark.range(1).select(
        F.lit(tot["n_docs"]).cast("bigint").alias("n_docs"),
        F.lit(tot["total_chars"]).cast("bigint").alias("total_chars"),
        F.lit(exact["removable_docs"])
        .cast("bigint")
        .alias("exact_removable_docs"),
        F.lit(exact["removable_chars"])
        .cast("bigint")
        .alias("exact_removable_chars"),
        F.round(
            F.lit(exact["removable_chars"]).cast("double")
            / F.lit(tot["total_chars"]),
            6,
        ).alias("exact_char_share"),
        F.lit(n_pairs).cast("bigint").alias("neardup_pairs"),
        F.lit(affected).cast("bigint").alias("neardup_affected_docs"),
        F.round(
            F.lit(affected).cast("double") / F.lit(tot["n_docs"]), 6
        ).alias("neardup_doc_share"),
    )


def _finalize_oracle() -> None:
    import dataclasses

    from atlassian_confluence_data_pipeline_spark.plans.registry import (
        QUERIES,
    )

    spec = QUERIES["curation_savings_report"]
    QUERIES["curation_savings_report"] = dataclasses.replace(
        spec, oracle=spec.oracle.format(pairs=_lsh_pairs_sql())
    )


_finalize_oracle()
