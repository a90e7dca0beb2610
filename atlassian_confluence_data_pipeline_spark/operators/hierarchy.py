"""Recursive hierarchy expansion (SURVEY.md §2.3 J5).

The reference walks a page tree depth-first with one HTTP round-trip per
node and a visited set (confluence_client.py:504-599). Spark's SQL
surface has no recursive CTE, so the engine runs a driver-side
*frontier loop*: O(depth) shuffles instead of O(nodes) round-trips.

Scale notes: every level is eagerly local-checkpointed — frontiers are
small relative to the corpus, and materializing them (a) truncates the
iterative lineage (plans would otherwise grow O(depth)), (b) makes the
emptiness probe and the next join start from materialized rows instead
of recomputing the whole prefix. The visited-set anti-join (the
reference's cycle guard, :523,:571-575) is optional: callers that can
prove acyclicity (e.g. a monotonic parent function) skip one anti-join
shuffle per level.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def expand_hierarchy(
    edges: DataFrame,
    roots: DataFrame,
    max_depth: int = 100,
    check_cycles: bool = True,
) -> DataFrame:
    """Transitive expansion from ``roots`` over ``edges``.

    Args:
        edges: (parent_id, child_id) adjacency list. Reused every level —
            pass a cached/checkpointed frame for iterative reuse.
        roots: (node_id) starting frontier.
        max_depth: hard bound on iterations (skew/cycle safety net).
        check_cycles: keep the reference's visited-set guard. Set False
            when the graph is provably acyclic with unique parents — the
            per-level anti-join disappears.

    Returns (node_id, root_id, depth); roots have depth 0. Set semantics
    match the reference's DFS+visited-set walk; row order does not
    (oracle comparison is order-insensitive).
    """
    frontier = roots.select(
        F.col("node_id"), F.col("node_id").alias("root_id"), F.lit(0).alias("depth")
    ).localCheckpoint(eager=True)
    levels = [frontier]
    visited = frontier.select("node_id") if check_cycles else None
    for depth in range(1, max_depth + 1):
        nxt = frontier.join(edges, frontier.node_id == edges.parent_id).select(
            F.col("child_id").alias("node_id"),
            "root_id",
            F.lit(depth).alias("depth"),
        )
        if visited is not None:
            nxt = nxt.join(visited, "node_id", "left_anti")
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():
            break
        levels.append(nxt)
        frontier = nxt
        if visited is not None:
            visited = visited.unionByName(nxt.select("node_id")).localCheckpoint(
                eager=True
            )
    from atlassian_confluence_data_pipeline_spark import iterstats

    iterstats.record("expand_hierarchy", len(levels) - 1)
    return reduce(lambda a, b: a.unionByName(b), levels)
