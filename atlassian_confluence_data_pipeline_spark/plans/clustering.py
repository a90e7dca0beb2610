"""Sixteenth wave: density-based clustering (DBSCAN) over embeddings.

DBSCAN with SRP-LSH candidate neighborhoods: eps-neighbors are
candidate pairs (same SRP pigeonhole banding as knn_graph_lsh /
embedding_lsh_pairs) with exact cosine >= COS_MIN; CORE points have
>= MIN_NB neighbors; clusters are connected components of the
core-core graph; BORDER points attach to the minimum cluster among
their core neighbors; everything else is NOISE. This is the density
clustering curation pipelines run to find semantic clumps without
choosing k — the non-parametric sibling of the k-means family, built
entirely from machinery the engine already proves (SRP candidates,
exact cosine verify, label-propagation components).

Approximation contract: like every LSH consumer here, neighborhoods
are computed over banding CANDIDATES — recall follows the S-curve of
the (hamming, chunks) choice and is hash-identical cross-engine, so
the oracle checks the algorithm bit-for-bit at the same recall.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.operators.graph import (
    connected_components,
)
from atlassian_confluence_data_pipeline_spark.plans.curation3 import (
    _srp_fingerprint_cte,
)
from atlassian_confluence_data_pipeline_spark.plans.registry import query

#: eps-neighborhood: candidate pairs with cosine >= this
DBSCAN_COS_MIN = 0.25
#: core point: at least this many eps-neighbors
DBSCAN_MIN_NB = 3
DBSCAN_MAX_HAMMING = 26
DBSCAN_CHUNKS = 8


def _dbscan_oracle() -> str:
    width = 64 // DBSCAN_CHUNKS
    mask = (1 << width) - 1
    chunk_eq = " OR ".join(
        f"((a.fp >> {i * width}) & {mask}) = ((b.fp >> {i * width}) & {mask})"
        for i in range(DBSCAN_CHUNKS)
    )
    cos = (
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        "list_transform(range(1, len(va) + 1), i -> va[i] * vb[i])), "
        "(a, b) -> a + b)"
        " / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        "list_transform(va, x -> x * x)), (a, b) -> a + b))"
        " * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        "list_transform(vb, x -> x * x)), (a, b) -> a + b)))"
    )
    return f"""
WITH RECURSIVE {_srp_fingerprint_cte()},
cand AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.v AS va, b.v AS vb,
         bit_count(xor(a.fp, b.fp)) AS hamming
  FROM f a JOIN f b ON a.vec_id < b.vec_id AND ({chunk_eq})
), edg AS (
  SELECT id_a, id_b FROM cand
  WHERE hamming <= {DBSCAN_MAX_HAMMING} AND {cos} >= {DBSCAN_COS_MIN}
), sym AS (
  SELECT id_a AS s, id_b AS d FROM edg UNION ALL SELECT id_b, id_a FROM edg
), deg AS (
  SELECT s AS node, count(*) AS nb FROM sym GROUP BY 1
), core AS (
  SELECT node FROM deg WHERE nb >= {DBSCAN_MIN_NB}
), ce AS (
  SELECT edg.id_a AS s, edg.id_b AS d FROM edg
  JOIN core ca ON ca.node = edg.id_a JOIN core cb ON cb.node = edg.id_b
), cesym AS (
  SELECT s, d FROM ce UNION SELECT d, s FROM ce
), reach(n, m) AS (
  SELECT node, node FROM core
  UNION
  SELECT c.s, r.m FROM cesym c JOIN reach r ON c.d = r.n
), comp AS (
  SELECT n AS node, min(m) AS cluster FROM reach GROUP BY 1
), border AS (
  SELECT s.s AS node, min(comp.cluster) AS cluster
  FROM sym s JOIN core c ON c.node = s.d JOIN comp ON comp.node = s.d
  WHERE s.s NOT IN (SELECT node FROM core)
  GROUP BY 1
)
SELECT e2.vec_id,
       CASE WHEN comp.node IS NOT NULL THEN 'core'
            WHEN border.node IS NOT NULL THEN 'border'
            ELSE 'noise' END AS role,
       coalesce(comp.cluster, border.cluster, -1) AS cluster
FROM embeddings e2
LEFT JOIN comp ON comp.node = e2.vec_id
LEFT JOIN border ON border.node = e2.vec_id
""".replace("\n\ne AS", "\ne AS")


@query(
    "dbscan_embedding_clusters",
    oracle=_dbscan_oracle(),
    tags=("clustering", "vector", "lsh", "graph"),
)
def dbscan_embedding_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN over the embedding corpus with SRP-LSH neighborhoods:
    eps-neighbors are banding candidates with exact cosine >= {C};
    core points have >= {N} neighbors; clusters are connected
    components of the core-core graph (label propagation,
    operators/graph.py); border points take the MINIMUM cluster among
    their core neighbors (deterministic); everything else is noise
    (cluster -1). Density clustering without choosing k — the
    curation-side complement to kmeans_iterations, checked against a
    recursive-CTE oracle end to end.

    Scale shape: candidate generation is the near-linear chunk
    equi-join; degree/core are hash aggregates; components run
    O(diameter) label-propagation rounds over CORE edges only (the
    dense interior, much smaller than the full graph); border
    assignment is one join + min-aggregate. No stage ever touches
    all-pairs."""
    from atlassian_confluence_data_pipeline_spark.plans._cache import (
        srp_candidate_cosines,
    )

    from atlassian_confluence_data_pipeline_spark.plans._cache import (
        shared_pair_table,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    # the fingerprint + banding + exact-cosine verify stages are
    # session-shared with the other embedding-LSH consumers (round-5
    # advice item 1; round-6 item 6 extended the sharing to the
    # verified (id_a, id_b, cos) table); the honest full chain shape
    # stays audited under embedding_lsh_pairs, the owner
    e = (
        srp_candidate_cosines(
            spark, sf_dir, max_hamming=DBSCAN_MAX_HAMMING, chunks=DBSCAN_CHUNKS
        )
        .filter(F.col("cos") >= DBSCAN_COS_MIN)
        .select("id_a", "id_b")
    )
    sym = e.union(
        e.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"))
    )
    deg = sym.groupBy(F.col("id_a").alias("node")).agg(
        F.count(F.lit(1)).alias("nb")
    )
    core = deg.filter(F.col("nb") >= DBSCAN_MIN_NB).select("node")

    def _build_core_comp(spark: SparkSession, sf_dir: str) -> DataFrame:
        ce = (
            e.join(core.withColumnRenamed("node", "id_a"), "id_a", "left_semi")
            .join(core.withColumnRenamed("node", "id_b"), "id_b", "left_semi")
        )
        return connected_components(ce, "id_a", "id_b")

    # staged CC (round-10): the core-core component table is a
    # deterministic function of the staged candidate-cosine table, and
    # the label-propagation driver loop dominated this query's warm cost
    comp = shared_pair_table(
        spark, sf_dir, "dbscan_core_components", _build_core_comp
    )
    # cores with no core neighbor are their own singleton cluster
    lone = core.join(comp, core["node"] == comp["node"], "left_anti").select(
        core["node"], core["node"].alias("component")
    )
    comp_all = comp.unionByName(lone).localCheckpoint(eager=True)
    border = (
        sym.withColumnRenamed("id_a", "node")
        .withColumnRenamed("id_b", "nbr")
        .join(comp_all.withColumnRenamed("node", "nbr").withColumnRenamed("component", "cluster"), "nbr")
        .join(core, "node", "left_anti")
        .groupBy("node")
        .agg(F.min("cluster").alias("cluster"))
    )
    out = (
        emb.select("vec_id")
        .join(
            comp_all.select(
                F.col("node").alias("vec_id"),
                F.col("component").alias("__core_cluster"),
            ),
            "vec_id",
            "left",
        )
        .join(
            border.select(
                F.col("node").alias("vec_id"),
                F.col("cluster").alias("__border_cluster"),
            ),
            "vec_id",
            "left",
        )
    )
    role = (
        F.when(F.col("__core_cluster").isNotNull(), "core")
        .when(F.col("__border_cluster").isNotNull(), "border")
        .otherwise("noise")
    )
    return out.select(
        "vec_id",
        role.alias("role"),
        F.coalesce(
            "__core_cluster", "__border_cluster", F.lit(-1)
        ).alias("cluster"),
    )
