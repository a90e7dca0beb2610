"""Round-4 wave: embedding quantization + categorical statistics.

- int8 embedding quantization with an in-query RECALL AUDIT: per-dim
  affine int8 codes (the memory-bound ANN deployment format — 4x
  smaller than float32, integer dot products), ranked against the
  exact-cosine top-k so the quality cost of quantization is measured
  IN the engine rather than asserted;
- deterministic grouped MODE (most frequent value, ties to the
  smallest) — the categorical summary built-ins leave tie-ordering
  undefined, so the engine form pins it with a count-then-rank pick.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.plans.registry import query

#: quantized-recall parameters (mirror cosine_topk's fixture shape)
Q8_QUERIES = 10
Q8_TOPK = 5
Q8_EPS = 1e-12


def _q8_oracle() -> str:
    cos = (
        "list_sum(list_transform(range(1, len({a})+1), i -> {a}[i] * {b}[i]))"
        " / (sqrt(list_sum(list_transform({a}, x -> CAST(x AS DOUBLE)"
        " * x))) * sqrt(list_sum(list_transform({b}, x ->"
        " CAST(x AS DOUBLE) * x))))"
    )
    return f"""
WITH comp AS (
  SELECT vec_id, unnest(range(1, len(embedding)+1)) AS pos,
         unnest(embedding::DOUBLE[]) AS v
  FROM embeddings
), st AS (
  SELECT pos, min(v) AS mn,
         greatest((max(v) - min(v)) / 255, {Q8_EPS}) AS w
  FROM comp GROUP BY 1
), e8 AS (
  SELECT c.vec_id,
         list(CAST(round((c.v - st.mn) / st.w) AS BIGINT) - 128
              ORDER BY c.pos) AS q
  FROM comp c JOIN st USING (pos) GROUP BY c.vec_id
), ex AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), exact AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id
  FROM ex a JOIN ex b ON a.vec_id < {Q8_QUERIES} AND a.vec_id <> b.vec_id
  QUALIFY row_number() OVER (
    PARTITION BY a.vec_id
    ORDER BY {cos.format(a='a.v', b='b.v')} DESC, b.vec_id
  ) <= {Q8_TOPK}
), quant AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id
  FROM e8 a JOIN e8 b ON a.vec_id < {Q8_QUERIES} AND a.vec_id <> b.vec_id
  QUALIFY row_number() OVER (
    PARTITION BY a.vec_id
    ORDER BY {cos.format(a='a.q', b='b.q')} DESC, b.vec_id
  ) <= {Q8_TOPK}
)
SELECT e.query_id,
       CAST(count(q.neighbor_id) AS BIGINT) AS n_common,
       round(CAST(count(q.neighbor_id) AS DOUBLE) / {Q8_TOPK}, 2)
         AS recall_at_{Q8_TOPK}
FROM exact e LEFT JOIN quant q
  ON e.query_id = q.query_id AND e.neighbor_id = q.neighbor_id
GROUP BY 1
"""


@query(
    "int8_topk_recall",
    oracle=_q8_oracle(),
    tags=("similarity", "vector", "quantization", "scalepath"),
)
def int8_topk_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """int8 embedding quantization with an in-query recall audit: every
    vector quantizes to per-dimension affine int8 codes (min/width from
    the corpus — the standard memory-bound ANN format: 4x smaller,
    integer dot products), then each query's quantized-cosine top-{K}
    is compared to the exact-cosine top-{K} and recall@{K} reported per
    query. The measurement a deployment makes BEFORE swapping floats
    for codes.

    Scale shape: the per-dim stats are 64 loop-control rows (the
    whitening-moments discipline) embedded as literal arrays; coding is
    a narrow projection; ranking reuses the brute-force-topk shape on
    the broadcast query side. Quantized dots are INTEGER arithmetic —
    exact in both engines; only the final normalization is float, from
    identical integers."""
    emb = load_table(spark, sf_dir, "embeddings")
    stats = sorted(
        (
            (r["pos"], r["mn"], r["mx"])
            for r in emb.select(
                F.posexplode("embedding").alias("pos", "v")
            )
            .groupBy("pos")
            .agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
            .collect()
        ),
        key=lambda t: t[0],
    )
    mn_lit = F.lit([float(mn) for _, mn, _ in stats])
    w_lit = F.lit(
        [max((mx - mn) / 255, Q8_EPS) for _, mn, mx in stats]
    )
    vec = F.col("embedding")
    codes = F.transform(
        F.sequence(F.lit(1), F.size(vec)),
        lambda i: (
            F.round(
                (F.element_at(vec, i) - F.element_at(mn_lit, i))
                / F.element_at(w_lit, i)
            ).cast("bigint")
            - 128
        ),
    )
    base = emb.select("vec_id", "embedding", codes.alias("q"))

    def _cos(a, b):
        dot = F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x,
        )
        n1 = F.sqrt(
            F.aggregate(
                a,
                F.lit(0.0).cast("double"),
                lambda acc, x: acc + x.cast("double") * x,
            )
        )
        n2 = F.sqrt(
            F.aggregate(
                b,
                F.lit(0.0).cast("double"),
                lambda acc, x: acc + x.cast("double") * x,
            )
        )
        return dot / (n1 * n2)

    def _topk(col: str) -> DataFrame:
        qs = base.filter(F.col("vec_id") < Q8_QUERIES).select(
            F.col("vec_id").alias("query_id"), F.col(col).alias("qa")
        )
        cs = base.select(
            F.col("vec_id").alias("neighbor_id"), F.col(col).alias("cb")
        )
        pairs = (
            F.broadcast(qs)
            .join(cs, F.col("query_id") != F.col("neighbor_id"))
            .select(
                "query_id",
                "neighbor_id",
                _cos(F.col("qa"), F.col("cb")).alias("sim"),
            )
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("sim"), F.asc("neighbor_id")
        )
        return (
            pairs.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= Q8_TOPK)
            .select("query_id", "neighbor_id")
        )

    exact = _topk("embedding")
    quant = _topk("q").withColumnRenamed("neighbor_id", "qn")
    return (
        exact.join(
            quant,
            (exact["query_id"] == quant["query_id"])
            & (exact["neighbor_id"] == quant["qn"]),
            "left",
        )
        .groupBy(exact["query_id"].alias("query_id"))
        .agg(
            F.count("qn").cast("bigint").alias("n_common"),
            F.round(F.count("qn").cast("double") / Q8_TOPK, 2).alias(
                f"recall_at_{Q8_TOPK}"
            ),
        )
    )


@query(
    "grouped_mode_priority",
    oracle="""
WITH counts AS (
  SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
  FROM orders GROUP BY 1, 2
)
SELECT o_orderstatus, o_orderpriority AS mode_priority,
       CAST(cnt AS BIGINT) AS n_rows
FROM counts
QUALIFY row_number() OVER (
  PARTITION BY o_orderstatus ORDER BY cnt DESC, o_orderpriority
) = 1
""",
    tags=("agg", "mode", "categorical"),
)
def grouped_mode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DETERMINISTIC grouped mode: the most frequent order priority per
    order status, ties broken to the lexicographically smallest value.
    Built-in ``mode()`` leaves tie order undefined in both engines, so
    the engine form is the count-then-rank pick — one hash aggregate to
    the (group, value) census plus a keyed window over it (census
    scale, never fact scale)."""
    o = load_table(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.desc("cnt"), F.asc("o_orderpriority")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_priority"),
            F.col("cnt").cast("bigint").alias("n_rows"),
        )
    )
