"""Wave-32 semantic invariants (graph/chain structure): BFS layer
properties, assortativity bounds, and stationary-distribution algebra."""

from __future__ import annotations

from atlassian_confluence_data_pipeline_spark.plans import QUERIES


def _rows(spark, sf_dir, name):
    return QUERIES[name].fn(spark, sf_dir).collect()


def test_bfs_layers_are_contiguous_from_seed(spark, sf_dir):
    rows = _rows(spark, sf_dir, "bfs_hops_neardup")
    if not rows:  # no near-dup pairs at this scale
        return
    by_hop: dict[int, int] = {}
    for r in rows:
        by_hop[r["hops"]] = by_hop.get(r["hops"], 0) + 1
    # exactly one seed at distance 0; no empty intermediate layer
    assert by_hop.get(0) == 1
    hops = sorted(by_hop)
    assert hops == list(range(len(hops)))
    # every node appears once
    assert len({r["doc_id"] for r in rows}) == len(rows)


def test_bfs_neighbors_of_seed_are_hop_one(spark, sf_dir):
    """Every direct neighbor of the seed in the pair table is at hop 1."""
    rows = _rows(spark, sf_dir, "bfs_hops_neardup")
    if not rows:
        return
    seed = next(r["doc_id"] for r in rows if r["hops"] == 0)
    pairs = QUERIES["near_dup_pairs_lsh"].fn(
        spark, sf_dir
    ).collect()
    nbrs = {p["doc_b"] for p in pairs if p["doc_a"] == seed} | {
        p["doc_a"] for p in pairs if p["doc_b"] == seed
    }
    dist = {r["doc_id"]: r["hops"] for r in rows}
    for n in nbrs:
        assert dist[n] == 1


def test_assortativity_is_a_valid_correlation(spark, sf_dir):
    rows = _rows(spark, sf_dir, "degree_assortativity_neardup")
    if not rows or rows[0]["n_edges"] == 0:
        return
    r = rows[0]
    assert -1.0 - 1e-9 <= r["assortativity"] <= 1.0 + 1e-9
    assert r["mean_degree"] >= 1.0  # every node in the edge list has deg>=1
    assert r["n_nodes"] > 0 and r["n_edges"] > 0
    # handshake: directed mean degree * nodes == 2 * undirected edges
    assert abs(r["mean_degree"] * r["n_nodes"] - 2 * r["n_edges"]) < 1.0


def test_stationary_distribution_is_a_fixpoint(spark, sf_dir):
    """Sums to 1, residual small, and one more hand iteration through
    the empirical transition matrix barely moves it."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from atlassian_confluence_data_pipeline_spark.catalog import load_table

    rows = _rows(spark, sf_dir, "markov_stationary_events")
    assert rows
    total = sum(r["stationary_prob"] for r in rows)
    assert abs(total - 1.0) < 1e-3
    for r in rows:
        assert 0.0 < r["stationary_prob"] < 1.0
        assert r["residual"] < 0.05
    # hand-iterate once more
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cnt = (
        ev.select(
            "event_type", F.lag("event_type").over(w).alias("prev_type")
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .count()
        .collect()
    )
    rowsum: dict[str, int] = {}
    for c in cnt:
        rowsum[c["prev_type"]] = rowsum.get(c["prev_type"], 0) + c["count"]
    v = {r["event_type"]: r["stationary_prob"] for r in rows}
    nxt = {s: 0.0 for s in v}
    for c in cnt:
        p = c["count"] / rowsum[c["prev_type"]]
        nxt[c["event_type"]] += v.get(c["prev_type"], 0.0) * p
    for s in v:
        assert abs(nxt[s] - v[s]) < 0.02
