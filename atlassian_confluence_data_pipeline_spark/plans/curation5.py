"""Curation wave 21c: lexical-diversity scoring and curriculum
scheduling — pretraining-data preparation steps downstream of the
dedup/quality family (plans/curation*.py).

Lexical diversity (type-token ratio, hapax share) is the classic
filter for template/boilerplate-heavy documents that pass length and
stopword gates; curriculum scheduling is the global difficulty
ordering (short-to-long here) a data loader consumes as training
phases. Both are exact-arithmetic and prefix-rank-distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.operators.windows import (
    distributed_prefix_rank,
)
from atlassian_confluence_data_pipeline_spark.plans.registry import query


@query(
    "lexical_diversity_scores",
    oracle="""
WITH w AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
  FROM documents
), c AS (
  SELECT doc_id, word, count(*) AS cnt FROM w GROUP BY 1, 2
)
SELECT doc_id,
       CAST(sum(cnt) AS BIGINT) AS n_words,
       CAST(count(*) AS BIGINT) AS n_distinct,
       CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       round(CAST(count(*) AS DOUBLE) / sum(cnt), 6) AS ttr,
       round(CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS hapax_share,
       round(CAST(sum(len(word) * cnt) AS DOUBLE) / sum(cnt), 4)
         AS avg_word_len
FROM c
GROUP BY 1
""",
    tags=("curation", "text", "diversity"),
)
def lexical_diversity_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document lexical diversity: type-token ratio (distinct
    words / words), hapax share (words occurring exactly once), and
    mean word length — the boilerplate detector that catches template
    spam whose length and stopword profile look fine (low TTR = the
    same tokens repeated).

    Scale shape: explode words and hash-aggregate on (doc_id, word) —
    map-side combine collapses within-partition repeats before the
    shuffle — then re-aggregate to documents. Both shuffles key on
    doc_id(+word): no hot keys beyond single-document size, which the
    explode already bounds per row batch. Integer counts and exact
    ratios of integers: cross-engine bit-equal."""
    from atlassian_confluence_data_pipeline_spark.plans._cache import (
        doc_word_positions,
    )

    # session-staged token stream (round 11)
    c = (
        doc_word_positions(spark, sf_dir)
        .select("doc_id", "word")
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    one = F.when(F.col("cnt") == 1, F.lit(1)).otherwise(F.lit(0))
    return c.groupBy("doc_id").agg(
        F.sum("cnt").cast("bigint").alias("n_words"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        F.sum(one).cast("bigint").alias("n_hapax"),
        F.round(
            F.count(F.lit(1)).cast("double") / F.sum("cnt"), 6
        ).alias("ttr"),
        F.round(F.sum(one).cast("double") / F.count(F.lit(1)), 6).alias(
            "hapax_share"
        ),
        F.round(
            F.sum(F.length("word") * F.col("cnt")).cast("double") / F.sum("cnt"),
            4,
        ).alias("avg_word_len"),
    )


@query(
    "curriculum_schedule",
    oracle="""
WITH r AS (
  SELECT doc_id, n_chars,
         row_number() OVER (ORDER BY n_chars, doc_id) AS rank,
         count(*) OVER () AS n
  FROM documents
)
SELECT doc_id, n_chars, CAST(rank AS BIGINT) AS rank,
       CASE WHEN rank <= n // 10 THEN 'warmup'
            WHEN rank > n - n // 10 THEN 'anneal'
            ELSE 'main' END AS phase
FROM r
""",
    tags=("curation", "curriculum", "prefix"),
)
def curriculum_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum schedule: globally order documents by difficulty
    (length proxy — short first, deterministic doc_id tie-break) and
    assign training phases by rank decile: first 10% = warmup, last
    10% = anneal, middle = main. This is the global sort a curriculum
    data loader needs WITHOUT a global sort: ranks come from
    distributed_prefix_rank (range-bucketed row_number + boundary
    offsets), so no task ever sees more than ~1/num_ranges of the
    corpus. The total count is one loop-control scalar."""
    docs = load_table(
        spark, sf_dir, "documents"
    ).select("doc_id", "n_chars").localCheckpoint(eager=True)
    n = docs.count()
    tenth = n // 10
    ranked = distributed_prefix_rank(
        docs, ["n_chars", "doc_id"], rank_col="rank"
    )
    return ranked.select(
        "doc_id",
        "n_chars",
        F.col("rank").cast("bigint").alias("rank"),
        F.when(F.col("rank") <= tenth, F.lit("warmup"))
        .when(F.col("rank") > n - tenth, F.lit("anneal"))
        .otherwise(F.lit("main"))
        .alias("phase"),
    )
