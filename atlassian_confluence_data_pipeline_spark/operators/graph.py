"""Connected components over a pair/edge list — the step that turns
pairwise near-duplicate matches into dedup GROUPS (keep one doc per
component, drop the rest).

No recursive SQL in Spark, so this is a driver-side label-propagation
loop like operators/hierarchy.py: every node starts labeled with its own
id, and each round adopts the minimum label among itself and its
neighbors. Labels only decrease, so the fixpoint is the per-component
minimum id in O(component diameter) rounds — near-dup graphs are
overwhelmingly tiny cliques (diameter 1-2), so 2-3 shuffle rounds in
practice.

Scale notes (the GraphX/Pregel CC shape):
- each round is ONE equi-join (labels onto the symmetric edge list) and
  ONE min-aggregate — both shuffle on node id, reusable partitioning;
- per-round frames are eagerly local-checkpointed (lineage stays O(1),
  the convergence probe reads materialized rows); on a cluster this
  becomes `checkpoint()` to durable storage;
- the convergence probe is `isEmpty` on the changed-label frame — a
  driver scalar, not a data collect;
- a hot node (one doc near-duplicating millions) makes that node's
  min-aggregate wide but still associative — map-side combine absorbs
  it; the alternating small-star/big-star optimization is the known
  upgrade path if components ever get deep.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame, a_col: str, b_col: str, max_iter: int = 50
) -> DataFrame:
    """Resolve (a, b) undirected pairs into components.

    Returns (node, component) where ``component`` is the minimum node id
    reachable from ``node``. Only nodes that appear in ``pairs`` are
    returned (singletons are their own trivial component — callers that
    need them union the unpaired ids back in).
    """
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
