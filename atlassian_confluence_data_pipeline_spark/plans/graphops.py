"""Graph analytics over the document similarity graph.

The near-dup pair list (the LSH scale path, plans/multimodal.py) IS a
graph; dedup_clusters already runs connected components over it. This
module adds the other standard graph pass a corpus pipeline runs:
PageRank-style centrality, which surfaces the "template hubs" — docs
near-duplicate to many others — that cluster-size counts alone miss.

Scale shape: each power iteration is one equi-join of the edge list
with the current rank vector plus one hash aggregate keyed by dst —
exactly the join/agg pattern that scales linearly in |edges| on a
cluster (GraphX/Pregel does the same dataflow underneath). The rank
vector and degree table are |nodes|-sized; at 100 TB the edge list is
the big side and it is never shuffled more than once per iteration
(partitioned by src, reused across iterations via checkpoint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.plans.multimodal import (
    _minhash_oracle,
    minhash_lsh_pairs,
)
from atlassian_confluence_data_pipeline_spark.plans.registry import query

_DAMPING = 0.85
_ITERS = 3


def _pagerank_oracle() -> str:
    """Unrolled power iteration over the minhash pair graph; per-node
    neighbor sums go through DECIMAL(38,18) so the double ranks are
    order-independent and bit-identical to the Spark loop."""
    pairs = _minhash_oracle()
    its = []
    prev = "r0"
    for k in range(1, _ITERS + 1):
        its.append(f"""
r{k} AS (
  SELECT n.node,
         CAST(0.15 AS DOUBLE) / (SELECT n FROM nn)
           + CAST(0.85 AS DOUBLE) * coalesce(s.c, CAST(0 AS DOUBLE)) AS rank
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node,
           CAST(sum(CAST(r.rank / d.dg AS DECIMAL(38,18))) AS DOUBLE) AS c
    FROM edges e
    JOIN {prev} r ON e.src = r.node
    JOIN deg d ON e.src = d.src
    GROUP BY 1
  ) s ON n.node = s.node
)""")
        prev = f"r{k}"
    return f"""
WITH pairs AS (SELECT id_a, id_b FROM ({pairs}) q),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM pairs
),
deg AS (SELECT src, count(*) AS dg FROM edges GROUP BY 1),
nodes AS (SELECT src AS node FROM deg),
nn AS (SELECT count(*) AS n FROM nodes),
r0 AS (
  SELECT node, CAST(1.0 AS DOUBLE) / (SELECT n FROM nn) AS rank FROM nodes
),{",".join(its)}
SELECT node, round(rank, 6) AS rank FROM {prev}
"""


@query(
    "pagerank_neardup_graph",
    oracle=_pagerank_oracle(),
    tags=("graph", "pagerank", "iterative", "neardup"),
)
def pagerank_neardup_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (damping 0.85, 3 iterations) over the undirected
    near-duplicate graph produced by the MinHash-LSH scale path.
    Iteration = edges ⋈ ranks (equi on src) → hash agg by dst → rank
    update; neighbor sums are DECIMAL(38,18) (order-independent), the
    damping arithmetic is plain double evaluated identically on both
    engines, so all three iterations stay bit-exact vs the unrolled SQL
    oracle. |nodes| is the only driver scalar (a count, like the
    k-means loop controls — never row data)."""
    from atlassian_confluence_data_pipeline_spark.plans._cache import (
        shared_pair_table,
    )

    pairs = shared_pair_table(
        spark, sf_dir, "minhash_lsh_pairs", minhash_lsh_pairs
    ).select("id_a", "id_b")
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).unionByName(
        pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
    )
    edges = edges.localCheckpoint(eager=False)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("dg"))
    nodes = deg.select(F.col("src").alias("node"))
    n = nodes.count()  # driver scalar: graph-node count (loop constant)
    if n == 0:  # no near-dup pairs at this SF: empty graph, empty ranks
        return spark.createDataFrame([], "node bigint, rank double")
    base = 0.15 / n  # python double == engine double on the same inputs
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    esrc = edges.join(deg, "src")
    for _ in range(_ITERS):
        sums = (
            esrc.join(ranks.withColumnRenamed("node", "src"), "src")
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("dg")).cast("decimal(38,18)").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").cast("double").alias("c"))
        )
        ranks = nodes.join(sums, "node", "left").select(
            "node",
            (
                F.lit(base)
                + F.lit(_DAMPING) * F.coalesce("c", F.lit(0.0))
            ).alias("rank"),
        )
    return ranks.select("node", F.round("rank", 6).alias("rank"))
