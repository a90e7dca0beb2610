"""Adaptive connected components (round-4 brief item 5): min-label
first, star contraction on the label-contracted graph for deep shapes.
Output equivalence with both pure strategies on random graphs, the
O(log n) total-round bound on the adversarial deep path, and the
cheap-path guarantee that shallow graphs never escalate."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.operators.graph import (
    connected_components,
    connected_components_minlabel,
    connected_components_star,
)


def _labels(df):
    return {(r["node"], r["component"]) for r in df.collect()}


def test_matches_minlabel_on_random_graphs(spark):
    rng = random.Random(5)
    for trial in range(3):
        n = 300
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(int(n * (0.6 + 0.4 * trial)))
        ]
        pairs = spark.createDataFrame(edges, "a bigint, b bigint")
        adaptive = _labels(connected_components(pairs, "a", "b"))
        naive = _labels(connected_components_minlabel(pairs, "a", "b"))
        star = _labels(connected_components_star(pairs, "a", "b"))
        assert adaptive == naive == star


def test_path_graph_converges_in_log_rounds(spark):
    """1000-node path: diameter 999, so min-label would need ~999
    rounds (it is capped at 50 and would return WRONG labels); star
    contraction must converge in O(log n) — well under 2*log2(n)+4 —
    and still label every node with the path's minimum id."""
    n = 1000
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "a bigint, b bigint"
    )
    stats: dict = {}
    out = connected_components(pairs, "a", "b", stats=stats)
    got = _labels(out)
    assert got == {(i, 0) for i in range(n)}
    assert stats["escalated"] is True
    assert stats["rounds"] <= 2 * math.ceil(math.log2(n)) + 8, stats
    # the pure star strategy alone also meets the log bound
    sstats: dict = {}
    sout = connected_components_star(pairs, "a", "b", stats=sstats)
    assert _labels(sout) == got
    assert sstats["rounds"] <= 2 * math.ceil(math.log2(n)) + 4, sstats


def test_self_pairs_and_singleton_components(spark):
    pairs = spark.createDataFrame(
        [(7, 7), (1, 2), (2, 1), (9, 8)], "a bigint, b bigint"
    )
    got = _labels(connected_components(pairs, "a", "b"))
    assert got == {(7, 7), (1, 1), (2, 1), (8, 8), (9, 8)}


def test_shallow_graphs_never_escalate(spark):
    """Clique-shaped near-dup graphs must take the cheap path: min-label
    converges within the escalation budget and star never runs."""
    c1 = [(i, j) for i in range(6) for j in range(i + 1, 6)]
    c2 = [(100 + i, 100 + i + 1) for i in range(2)]  # 3-node path
    pairs = spark.createDataFrame(c1 + c2, "a bigint, b bigint")
    stats: dict = {}
    out = _labels(connected_components(pairs, "a", "b", stats=stats))
    assert stats["escalated"] is False and stats["rounds"] <= 3
    assert out == {(i, 0) for i in range(6)} | {
        (100, 100), (101, 100), (102, 100)
    }


def test_two_cliques_with_bridge(spark):
    c1 = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    c2 = [(i, j) for i in range(10, 14) for j in range(i + 1, 14)]
    pairs = spark.createDataFrame(c1 + c2 + [(4, 10)], "a bigint, b bigint")
    got = dict(_labels(connected_components(pairs, "a", "b")))
    assert all(v == 0 for v in got.values())  # bridge merges everything
    assert set(got) == set(range(5)) | set(range(10, 14))


def test_exhausted_star_budget_still_one_row_per_node(spark):
    """A deep path graph with max_iter too small to converge: the output
    may carry partial components, but it must still be exactly ONE row
    per node (un-converged star forests hold several edges per label —
    the root join reduces them, never fans out)."""
    from atlassian_confluence_data_pipeline_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    n = 64
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "a bigint, b bigint"
    )
    for fn, max_iter in [
        (connected_components, 9),   # 8 min-label rounds + 1 star round
        (connected_components, 10),
        (connected_components_star, 1),
        (connected_components_star, 2),
    ]:
        rows = fn(pairs, "a", "b", max_iter=max_iter).collect()
        assert len(rows) == n, f"{fn.__name__} max_iter={max_iter}"
        assert len({r["node"] for r in rows}) == n
