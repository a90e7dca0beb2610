"""Retrieval-quality & rank-correlation wave (36): label-relevance
nDCG / MRR for the brute-force cosine ranking, and exact Spearman rank
correlation with mid-rank ties.

The ranking-quality layer: cosine_topk / ivf_recall_audit measure the
index against BRUTE FORCE; these measure the ranking against GROUND
TRUTH (label agreement as graded relevance) — the metric a retrieval
pipeline actually reports — plus the distribution-free correlation
(Spearman) whose ranks come out of the engine's distributed prefix
machinery in exact half-units (mid-ranks never touch floats).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.operators.similarity import (
    cosine_similarity,
    dot,
    l2_norm,
)
from atlassian_confluence_data_pipeline_spark.operators.windows import (
    distributed_prefix_rank,
)
from atlassian_confluence_data_pipeline_spark.plans.registry import query

#: probe set and evaluation depth (the cosine_topk conventions)
_N_QUERIES = 10
_EVAL_K = 10


@query(
    "ndcg_label_retrieval",
    oracle=f"""
WITH q AS (
  SELECT vec_id AS query_id, label AS qlabel, embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id < {_N_QUERIES}
), c AS (
  SELECT vec_id AS neighbor_id, label AS clabel,
         embedding::DOUBLE[] AS cv
  FROM embeddings
), p AS (
  SELECT query_id, qlabel, neighbor_id, clabel,
         list_sum(list_transform(range(1, len(qv)+1), i -> qv[i] * cv[i]))
           / (sqrt(list_sum(list_transform(qv, x -> x * x)))
              * sqrt(list_sum(list_transform(cv, x -> x * x)))) AS sim
  FROM q, c WHERE query_id <> neighbor_id
), ranked AS (
  SELECT query_id, qlabel, clabel,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, neighbor_id) AS rnk
  FROM p
), hits AS (
  SELECT query_id,
         CAST(sum(CASE WHEN clabel = qlabel THEN 1 ELSE 0 END) AS BIGINT)
           AS n_hits,
         CAST(sum(CAST(round(CASE WHEN clabel = qlabel
                  THEN 1.0 / log2(rnk + 1) ELSE 0.0 END, 9)
                  AS DECIMAL(28,12))) AS DOUBLE) AS dcg,
         min(CASE WHEN clabel = qlabel THEN rnk END) AS first_hit
  FROM ranked WHERE rnk <= {_EVAL_K}
  GROUP BY 1
), rel AS (
  SELECT q.query_id,
         CAST((SELECT count(*) FROM embeddings e
               WHERE e.label = q.qlabel AND e.vec_id <> q.query_id)
              AS BIGINT) AS n_relevant
  FROM q
), ideal AS (
  SELECT rel.query_id, rel.n_relevant,
         CAST(sum(CAST(round(1.0 / log2(i + 1), 9) AS DECIMAL(28,12)))
              AS DOUBLE) AS idcg
  FROM rel CROSS JOIN (SELECT unnest(range(1, {_EVAL_K} + 1)) AS i)
  WHERE i <= rel.n_relevant
  GROUP BY 1, 2
)
SELECT hits.query_id, ideal.n_relevant, hits.n_hits,
       round(hits.dcg, 6) AS dcg,
       round(hits.dcg / ideal.idcg, 6) AS ndcg,
       round(coalesce(1.0 / hits.first_hit, 0.0), 6)
         AS reciprocal_rank
FROM hits JOIN ideal USING (query_id)
""",
    tags=("retrieval", "evaluation", "ndcg"),
)
def ndcg_label_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@{_EVAL_K} and MRR of the brute-force cosine ranking against
    LABEL relevance (a retrieved neighbor is relevant iff it shares the
    query's label) — the ground-truth ranking metric on top of the
    recall-vs-brute-force audits: recall says "the index approximates
    exact search", nDCG says "exact search actually surfaces the right
    things".

    Scale shape: the cosine_topk broadcast pattern — {_N_QUERIES}
    probe vectors broadcast against the partitioned corpus (the corpus
    never moves), per-query rank via the keyed window, then all metric
    arithmetic on <= {_EVAL_K} rows per query with 9-rounded DECIMAL
    sums (log2 on small integers is the only libm). The ideal DCG uses
    the corpus-wide per-label relevant count, one bounded aggregate."""
    emb = load_table(spark, sf_dir, "embeddings")
    # norms fold once per vector, not per pair (bit-identical reuse)
    q = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        F.col("embedding").alias("qv"),
        l2_norm(F.col("embedding")).alias("__qn"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("clabel"),
        F.col("embedding").alias("cv"),
        l2_norm(F.col("embedding")).alias("__cn"),
    )
    sim = dot(F.col("qv"), F.col("cv")) / (F.col("__qn") * F.col("__cn"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    ranked = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "qlabel", "neighbor_id", "clabel", sim.alias("sim"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _EVAL_K)
    )
    rel_hit = F.col("clabel") == F.col("qlabel")
    gain = F.when(
        rel_hit, F.lit(1.0) / F.log2(F.col("rnk") + 1)
    ).otherwise(F.lit(0.0))
    hits = ranked.groupBy("query_id").agg(
        F.sum(F.when(rel_hit, 1).otherwise(0)).cast("bigint").alias(
            "n_hits"
        ),
        F.sum(F.round(gain, 9).cast("decimal(28,12)"))
        .cast("double")
        .alias("dcg"),
        F.min(F.when(rel_hit, F.col("rnk"))).alias("first_hit"),
    )
    label_counts = {
        r["label"]: r["n"]
        for r in emb.groupBy("label")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    qrows = q.select("query_id", "qlabel").collect()
    import decimal
    import math

    def _idcg(n_rel: int) -> float:
        # the oracle's own accumulation: 9-rounded log2 gains summed in
        # DECIMAL (bounded <= _EVAL_K terms)
        total = decimal.Decimal(0)
        for i in range(1, min(_EVAL_K, n_rel) + 1):
            total += decimal.Decimal(str(round(1.0 / math.log2(i + 1), 9)))
        return float(total)

    ideal = spark.createDataFrame(
        [
            (r["query_id"], label_counts[r["qlabel"]] - 1,
             _idcg(label_counts[r["qlabel"]] - 1))
            for r in qrows
        ],
        "query_id bigint, n_relevant bigint, idcg double",
    )
    return hits.join(F.broadcast(ideal), "query_id").select(
        "query_id",
        "n_relevant",
        "n_hits",
        F.round("dcg", 6).alias("dcg"),
        F.round(F.col("dcg") / F.col("idcg"), 6).alias("ndcg"),
        F.round(
            F.coalesce(F.lit(1.0) / F.col("first_hit"), F.lit(0.0)), 6
        ).alias("reciprocal_rank"),
    )


@query(
    "spearman_qty_price",
    oracle="""
WITH base AS (
  SELECT CAST(round(l_quantity * 100) AS BIGINT) AS x,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS y
  FROM lineitem
), rx AS (
  SELECT x, CAST(count(*) AS BIGINT) AS c,
         coalesce(sum(count(*)) OVER (ORDER BY x
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
  FROM base GROUP BY 1
), ry AS (
  SELECT y, CAST(count(*) AS BIGINT) AS c,
         coalesce(sum(count(*)) OVER (ORDER BY y
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
  FROM base GROUP BY 1
), j AS (
  SELECT 2 * rx.before + rx.c + 1 AS r2x,
         2 * ry.before + ry.c + 1 AS r2y
  FROM base JOIN rx USING (x) JOIN ry USING (y)
), acc AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(r2x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
         CAST(sum(CAST(r2y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
         CAST(sum(CAST(r2x * r2y AS DECIMAL(38,0))) AS DOUBLE) AS sxy,
         CAST(sum(CAST(r2x * r2x AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
         CAST(sum(CAST(r2y * r2y AS DECIMAL(38,0))) AS DOUBLE) AS syy
  FROM j
)
SELECT n AS n_rows,
       round((n * sxy - sx * sy)
             / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6)
         AS spearman_rho
FROM acc
""",
    tags=("retrieval", "rank-correlation", "prefix"),
)
def spearman_qty_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between line quantity and extended
    price — the distribution-free monotone-association measure
    (Pearson on mid-ranks, robust to any monotone transform and to
    outliers). Mid-ranks for ties are carried in exact HALF-UNITS
    (2*before + c + 1 — the Mann-Whitney discipline), so every rank is
    an exact integer and the correlation is exact-moment arithmetic
    end to end.

    Scale shape: each variable aggregates to its distinct-value domain,
    gets its cumulative counts from ONE distributed prefix pass, and
    joins back to the fact rows by value (two equi-joins); the final
    correlation is a 1-row exact-DECIMAL moment aggregate. No global
    sort, no corpus-sized window."""
    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        F.round(F.col("l_quantity") * 100).cast("bigint").alias("x"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("y"),
    ).localCheckpoint(eager=True)
    # ONE loop-control min/max aggregate feeds equal-width split points
    # to BOTH prefix passes — each pass previously paid its own
    # approxQuantile job (a full groupBy over the fact rows) just to
    # balance buckets; quantity and price cents are near-uniform, and
    # bucket balance never changes the exact ranks (round 11)
    mm = base.agg(
        F.min("x").alias("xmn"),
        F.max("x").alias("xmx"),
        F.min("y").alias("ymn"),
        F.max("y").alias("ymx"),
    ).first()

    def half_ranks(col: str) -> DataFrame:
        byv = base.groupBy(col).agg(
            F.count(F.lit(1)).cast("bigint").alias("c")
        )
        mn, mx = int(mm[f"{col}mn"]), int(mm[f"{col}mx"])
        cum = distributed_prefix_rank(
            byv,
            [col],
            sums={"cum": "c"},
            bounds=[mn + (mx - mn) * i / 32 for i in range(1, 32)],
        )
        return cum.select(
            col,
            (
                2 * (F.col("cum") - F.col("c")) + F.col("c") + 1
            ).alias(f"r2{col}"),
        )

    j = base.join(half_ranks("x"), "x").join(half_ranks("y"), "y")

    def dsum(c):
        return F.sum(c.cast("decimal(38,0)")).cast("double")

    acc = j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        dsum(F.col("r2x")).alias("sx"),
        dsum(F.col("r2y")).alias("sy"),
        dsum(F.col("r2x") * F.col("r2y")).alias("sxy"),
        dsum(F.col("r2x") * F.col("r2x")).alias("sxx"),
        dsum(F.col("r2y") * F.col("r2y")).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    return acc.select(
        n.alias("n_rows"),
        F.round(
            (n * sxy - sx * sy)
            / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)),
            6,
        ).alias("spearman_rho"),
    )
