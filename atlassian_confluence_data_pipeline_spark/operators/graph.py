"""Connected components over a pair/edge list — the step that turns
pairwise near-duplicate matches into dedup GROUPS (keep one doc per
component, drop the rest).

No recursive SQL in Spark, so components resolve in a driver-side
round loop. The default is the ALTERNATING STAR-CONTRACTION algorithm
(large-star / small-star, Kiveris et al., "Connected Components in
MapReduce and Beyond"): each round rewires every node toward its
neighborhood minimum, so component depth HALVES-or-better per round and
the fixpoint — a forest of stars centered at each component's minimum
id — arrives in O(log n) rounds even on path/chain graphs where plain
min-label propagation needs O(diameter) rounds (a 1000-node path: ~11
rounds vs ~999; pinned by tests/test_graph_cc.py).

Scale notes (per round, both phases):
- ONE symmetric projection, ONE min-aggregate by node, ONE equi-join —
  all shuffling on node id, map-side combine on the min;
- per-round edge frames are eagerly local-checkpointed (lineage stays
  O(1); on a cluster this becomes `checkpoint()` to durable storage);
- the convergence probe is a left-anti `isEmpty` + count — driver
  scalars, never a data collect;
- a hot node (one doc near-duplicating millions) makes its
  min-aggregate wide but associative — partial aggregation absorbs it.

``connected_components_minlabel`` keeps the round-3 min-label
propagation as the independently-simple cross-check implementation the
property tests compare against.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    a_col: str,
    b_col: str,
    max_iter: int = 50,
    stats: dict | None = None,
) -> DataFrame:
    """Resolve (a, b) undirected pairs into components by alternating
    star contraction.

    Returns (node, component) where ``component`` is the minimum node id
    reachable from ``node``. Only nodes that appear in ``pairs`` are
    returned (singletons are their own trivial component — callers that
    need them union the unpaired ids back in). With ``stats``, writes
    the round count to ``stats["rounds"]``.
    """
    nodes = (
        pairs.select(F.col(a_col).alias("node"))
        .unionByName(pairs.select(F.col(b_col).alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    edges = (
        pairs.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    rounds = 0
    for _ in range(max_iter):
        # ---- large-star: every node u connects its LARGER neighbors to
        # min(N(u) ∪ {u}) — deep branches shortcut toward local minima
        und = edges.select(F.col("a").alias("u"), F.col("b").alias("v")).unionByName(
            edges.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )
        mins = und.groupBy("u").agg(F.min("v").alias("mv"))
        large = (
            und.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(
                F.col("v").alias("a"),
                F.least(F.col("mv"), F.col("u")).alias("b"),
            )
            .filter(F.col("a") != F.col("b"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        # ---- small-star: orient each edge toward its larger endpoint,
        # then connect that node's smaller neighborhood to its minimum
        o = large.select(
            F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
        )
        mins2 = o.groupBy("u").agg(F.min("v").alias("mv"))
        part1 = (
            o.join(mins2, "u")
            .filter(F.col("v") != F.col("mv"))
            .select(F.col("v").alias("a"), F.col("mv").alias("b"))
        )
        part2 = mins2.select(F.col("u").alias("a"), F.col("mv").alias("b"))
        new_edges = (
            part1.unionByName(part2)
            .filter(F.col("a") != F.col("b"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        rounds += 1
        unchanged = (
            new_edges.count() == edges.count()
            and new_edges.join(edges, ["a", "b"], "left_anti").isEmpty()
        )
        edges = new_edges
        if unchanged:
            break
    if stats is not None:
        stats["rounds"] = rounds
    # fixpoint is a star forest: every non-root points at its component
    # minimum; roots (and fully-contracted isolated nodes) label
    # themselves
    return nodes.join(
        edges.select(F.col("a").alias("node"), F.col("b").alias("root")),
        "node",
        "left",
    ).select(
        "node", F.coalesce("root", F.col("node")).alias("component")
    )


def connected_components_minlabel(
    pairs: DataFrame, a_col: str, b_col: str, max_iter: int = 50
) -> DataFrame:
    """Min-label propagation CC — O(component diameter) rounds; kept as
    the independently-simple cross-check for the star-contraction
    default (identical output, proven by property tests)."""
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(
            pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("component"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("component").alias("neighbor_component"))
        )
        updated = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce("neighbor_component", F.col("component")),
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            updated.alias("new")
            .join(labels.alias("old"), "node")
            .filter(F.col("new.component") != F.col("old.component"))
        )
        converged = changed.isEmpty()
        labels = updated
        if converged:
            break
    return labels
