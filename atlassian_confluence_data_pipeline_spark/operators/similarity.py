"""Vector-similarity operators (extension X3).

Cosine similarity as pure higher-order column expressions (JVM-side
fold — no UDF, no Arrow hop), plus the brute-force top-k and a bucketed
approximate variant for scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Left-to-right double-precision fold of elementwise products —
    deterministic and engine-portable (same order => same bits)."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda s, x: s + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query vector.

    ``queries`` is broadcast (assumed small); the corpus never moves.
    Returns (query_id, neighbor_id, rank, sim)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    )
    sim = cosine_similarity(F.col("__qv"), F.col("__cv"))
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("sim"))
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 1,
) -> DataFrame:
    """IVF-style approximate top-k: assign corpus vectors to their nearest
    centroid (coarse quantizer), probe only the query's ``n_probe``
    closest cells. ``centroids`` is (centroid_id, centroid ARRAY<DOUBLE>),
    small and broadcast twice. The scan per query drops from N to
    N * n_probe / n_cells — the ANN scale path."""

    def assign(df: DataFrame, out_id: str, out_vec: str, top: int) -> DataFrame:
        sim = cosine_similarity(F.col(out_vec), F.col("centroid"))
        w = Window.partitionBy(out_id).orderBy(F.col("__csim").desc(), "centroid_id")
        return (
            df.crossJoin(F.broadcast(centroids))
            .withColumn("__csim", sim)
            .withColumn("__crank", F.row_number().over(w))
            .filter(F.col("__crank") <= top)
            .drop("__csim", "__crank", "centroid")
        )

    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"))
    c_cells = assign(c, "neighbor_id", "__cv", 1)
    q_cells = assign(q, "query_id", "__qv", n_probe)
    sim = cosine_similarity(F.col("__qv"), F.col("__cv"))
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        c_cells.join(F.broadcast(q_cells), "centroid_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("sim"))
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )
