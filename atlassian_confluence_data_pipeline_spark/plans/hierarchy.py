"""Hierarchy-expansion query (SURVEY.md §2.3 J5) with a recursive-CTE
DuckDB oracle.

A deterministic tree is derived from the orders table (child k → parent
k div 10 when that key exists), mirroring the reference's page-tree
adjacency list (confluence_client.py:336-344). The Spark side runs the
iterative frontier operator; DuckDB checks it with WITH RECURSIVE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.operators.hierarchy import (
    expand_hierarchy,
)
from atlassian_confluence_data_pipeline_spark.plans.registry import query


@query(
    "order_tree_rollup",
    oracle="""
WITH RECURSIVE edges AS (
  SELECT c.o_orderkey AS child_id, c.o_orderkey // 10 AS parent_id
  FROM orders c JOIN orders p ON p.o_orderkey = c.o_orderkey // 10
  WHERE c.o_orderkey // 10 <> c.o_orderkey
), roots AS (
  SELECT o_orderkey AS node_id FROM orders
  WHERE NOT EXISTS (SELECT 1 FROM edges e WHERE e.child_id = o_orderkey)
), walk AS (
  SELECT node_id, node_id AS root_id, 0 AS depth FROM roots
  UNION ALL
  SELECT e.child_id, w.root_id, w.depth + 1
  FROM walk w JOIN edges e ON e.parent_id = w.node_id
)
SELECT root_id, count(*) AS n_nodes, CAST(max(depth) AS INT) AS max_depth
FROM walk GROUP BY 1 HAVING count(*) > 1
""",
    tags=("hierarchy", "recursive", "join"),
)
def order_tree_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive tree expansion J5: derive (parent, child) edges from
    order keys (k → k div 10), expand every root's subtree to a fixed
    point with the frontier-loop operator, and roll up subtree size and
    max depth per root. O(depth) shuffles total; lineage cut by periodic
    localCheckpoint."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey")
    keys = orders.select(F.col("o_orderkey").alias("key"))
    parent = (F.col("o_orderkey") / 10).cast("bigint")
    edges = (
        orders.withColumn("parent_id", parent)
        .filter(F.col("parent_id") != F.col("o_orderkey"))
        .join(keys, F.col("parent_id") == F.col("key"), "left_semi")
        .select("parent_id", F.col("o_orderkey").alias("child_id"))
        # materialized once: every loop level re-reads these edges
        .localCheckpoint(eager=True)
    )
    roots = orders.join(
        edges.select(F.col("child_id").alias("o_orderkey")), "o_orderkey", "left_anti"
    ).select(F.col("o_orderkey").alias("node_id"))
    # k -> k div 10 is strictly decreasing with a unique parent per child:
    # provably acyclic, so the visited-set guard (one anti-join per level)
    # is skipped.
    walked = expand_hierarchy(edges, roots, check_cycles=False)
    return (
        walked.groupBy("root_id")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.max("depth").cast("int").alias("max_depth"),
        )
        .filter(F.col("n_nodes") > 1)
    )
