"""Vector similarity search (extension X3) over `embeddings`.

Brute-force cosine top-k as the oracle-checkable baseline, expressed
with higher-order array functions (`zip_with` + `aggregate` — JVM-side,
no Python). Both engines fold the 64 products left-to-right in double,
so similarities are bit-identical. The LSH/IVF scale path lives in
``operators/similarity.py`` (rows-only check + recall pytest).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.operators.similarity import (
    cosine_similarity,
    dot,
    l2_norm,
)
from atlassian_confluence_data_pipeline_spark.plans.registry import query

N_QUERIES = 10
TOP_K = 5


@query(
    "cosine_topk",
    oracle=f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id < {N_QUERIES}
), c AS (
  SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings
), p AS (
  SELECT query_id, neighbor_id,
         list_sum(list_transform(range(1, len(qv)+1), i -> qv[i] * cv[i]))
           / (sqrt(list_sum(list_transform(qv, x -> x * x)))
              * sqrt(list_sum(list_transform(cv, x -> x * x)))) AS sim
  FROM q, c WHERE query_id <> neighbor_id
)
SELECT query_id, neighbor_id, CAST(rnk AS INT) AS rank, round(sim, 6) AS sim
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY sim DESC, neighbor_id
  ) AS rnk FROM p
) WHERE rnk <= {TOP_K}
""",
    tags=("similarity", "vector", "topk"),
)
def cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k (X3): broadcast the query vectors against
    the full corpus, rank per query. At 100 TB the corpus side stays
    partitioned and only k rows per query survive the per-partition
    window; the broadcast side is the (small) query set."""
    emb = load_table(spark, sf_dir, "embeddings")
    # norms fold once per vector, not per pair (bit-identical reuse)
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        l2_norm(F.col("embedding")).alias("__qn"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("cv"),
        l2_norm(F.col("embedding")).alias("__cn"),
    )
    sim = dot(F.col("qv"), F.col("cv")) / (F.col("__qn") * F.col("__cn"))
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("sim"))
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 6).alias("sim"))
    )


@query(
    "embedding_norms_by_label",
    oracle="""
WITH n AS (
  SELECT label,
         sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS norm
  FROM embeddings
)
SELECT label,
       count(*) AS n_vectors,
       round(CAST(sum(CAST(norm AS DECIMAL(18,12))) AS DOUBLE) / count(*), 6) AS avg_norm,
       round(min(norm), 6) AS min_norm,
       round(max(norm), 6) AS max_norm
FROM n GROUP BY 1
""",
    tags=("similarity", "vector", "agg"),
)
def embedding_norms_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label L2-norm statistics: element fold in double (bit-exact
    across engines), decimal-summed average (order-independent)."""
    emb = load_table(spark, sf_dir, "embeddings")
    xd: Column = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    norm = F.sqrt(
        F.aggregate(
            F.zip_with(xd, xd, lambda a, b: a * b),
            F.lit(0.0),
            lambda s, x: s + x,
        )
    )
    return (
        emb.select("label", norm.alias("norm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(
                F.sum(F.col("norm").cast("decimal(18,12)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_norm"),
            F.round(F.min("norm"), 6).alias("min_norm"),
            F.round(F.max("norm"), 6).alias("max_norm"),
        )
    )
