"""Recursive hierarchy expansion (SURVEY.md §2.3 J5).

The reference walks a page tree depth-first with one HTTP round-trip per
node and a visited set (confluence_client.py:504-599). Spark (< 4.0 SQL
surface) has no recursive CTE, so the engine runs a driver-side
*frontier loop*: O(depth) shuffles instead of O(nodes) round-trips.
Each iteration joins the frontier to the edge table, anti-joins against
the visited set (the reference's cycle guard, :523,:571-575), and
local-checkpoints to cut lineage growth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def expand_hierarchy(
    edges: DataFrame,
    roots: DataFrame,
    max_depth: int = 100,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Transitive expansion from ``roots`` over ``edges``.

    Args:
        edges: (parent_id, child_id) adjacency list.
        roots: (node_id) starting frontier.
        max_depth: hard bound on iterations (skew/cycle safety net).
        checkpoint_every: localCheckpoint cadence — truncates the
            iterative lineage so plans don't grow O(depth).

    Returns (node_id, root_id, depth); roots have depth 0. Set semantics
    match the reference's DFS+visited-set walk; row order does not
    (oracle comparison is order-insensitive).
    """
    frontier = roots.select(
        F.col("node_id"), F.col("node_id").alias("root_id"), F.lit(0).alias("depth")
    ).localCheckpoint(eager=True)
    result = frontier
    for depth in range(1, max_depth + 1):
        nxt = (
            frontier.join(edges, frontier.node_id == edges.parent_id)
            .select(
                F.col("child_id").alias("node_id"),
                "root_id",
                F.lit(depth).alias("depth"),
            )
            # visited-set guard: never re-enter a node already expanded
            .join(result.select("node_id").distinct(), "node_id", "left_anti")
        )
        if depth % checkpoint_every == 0:
            nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():
            break
        result = result.unionByName(nxt)
        frontier = nxt
    return result
