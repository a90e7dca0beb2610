"""Structural invariants of the eighth-wave operators (quantile
sketch, bloom-prefiltered join, near-dup triangles, skyline)."""

from __future__ import annotations

from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.plans import QUERIES
from atlassian_confluence_data_pipeline_spark.plans.analytics3 import QBINS


def test_quantile_sketch_error_bounded_by_bin_width(spark, sf_dir):
    rows = sorted(
        QUERIES["binned_quantile_estimates"].fn(spark, sf_dir).collect(),
        key=lambda r: r["p"],
    )
    assert [r["p"] for r in rows] == [0.5, 0.9, 0.99]
    li = load_table(spark, sf_dir, "lineitem")
    mm = li.agg(
        F.min("l_extendedprice").alias("mn"), F.max("l_extendedprice").alias("mx")
    ).first()
    width = (mm["mx"] - mm["mn"]) / QBINS
    for r in rows:
        # interpolation keeps the estimate inside the hit bin, so the
        # error is bounded by one bin width
        assert abs(r["abs_err"]) <= width + 1e-9
    # quantiles are monotone in p, on both the sketch and exact sides
    assert rows[0]["est_quantile"] <= rows[1]["est_quantile"] <= rows[2]["est_quantile"]
    assert rows[0]["exact_quantile"] <= rows[1]["exact_quantile"] <= rows[2]["exact_quantile"]


def test_bloom_join_transparent_vs_plain_join(spark, sf_dir):
    """The bloom prefilter must not change the join result — recompute
    the plain join inline and compare."""
    from atlassian_confluence_data_pipeline_spark.plans.analytics3 import (
        BLOOM_JOIN_PRIORITY,
        BLOOM_JOIN_YEAR,
    )
    from atlassian_confluence_data_pipeline_spark.plans._exact import dsum

    got = QUERIES["bloom_semi_join_revenue"].fn(spark, sf_dir).first()
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == BLOOM_JOIN_PRIORITY)
        & (F.year("o_orderdate") == BLOOM_JOIN_YEAR)
    )
    want = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
        )
        .first()
    )
    assert got["n_lines"] == want["n_lines"]
    assert got["revenue"] == want["revenue"]
    assert got["n_lines"] > 0


def test_triangle_handshake_and_coeff_bounds(spark, sf_dir):
    df = QUERIES["neardup_triangle_stats"].fn(spark, sf_dir)
    agg = df.agg(
        F.sum("n_triangles").alias("t3"), F.count(F.lit(1)).alias("n")
    ).first()
    # each triangle contributes to exactly 3 nodes
    assert agg["t3"] % 3 == 0
    assert agg["n"] > 0
    assert df.filter(
        (F.col("clustering_coeff") < 0) | (F.col("clustering_coeff") > 1)
    ).count() == 0
    # a node with triangles must have degree >= 2
    assert df.filter(
        (F.col("n_triangles") > 0) & (F.col("degree") < 2)
    ).count() == 0


def test_pareto_window_frame_is_incremental(spark):
    """Pin the O(n) frame: the skyline's exclusive running max (inside
    distributed_prefix_rank, which pareto_orders composes) must be the
    UNBOUNDED PRECEDING .. 1 PRECEDING form (incrementally maintained).
    The UNBOUNDED FOLLOWING formulation is semantically identical but
    Spark rescans the partition tail per row — O(n^2), measured hung at
    600k rows. The operator checkpoints its windowed frame (so callers'
    plans no longer show it); the plan_probe exposes it for this pin."""
    from atlassian_confluence_data_pipeline_spark.operators.windows import (
        distributed_prefix_rank,
    )

    df = spark.range(200).select(
        F.col("id").alias("nday"), (F.col("id") * 2).alias("mx")
    )
    probe = {}
    distributed_prefix_rank(
        df, ["nday"], exclusive_maxes={"lm": "mx"}, plan_probe=probe
    )
    phys = probe["windowed"]._jdf.queryExecution().executedPlan().toString()
    assert "unboundedpreceding$()" in phys
    assert "unboundedfollowing" not in phys.lower()


def test_pareto_frontier_mutually_non_dominating_and_maximal(spark, sf_dir):
    front = QUERIES["pareto_orders"].fn(spark, sf_dir).collect()
    assert front
    pts = [(r["order_date"], r["o_totalprice"]) for r in front]
    for i, (d1, p1) in enumerate(pts):
        for j, (d2, p2) in enumerate(pts):
            if i != j:
                assert not (d2 > d1 and p2 > p1)
    # every non-frontier order is dominated by some frontier point
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("d"),
        "o_totalprice",
    )
    keys = {r["o_orderkey"] for r in front}
    others = [r for r in orders.collect() if r["o_orderkey"] not in keys]
    for r in others:
        assert any(
            d > r["d"] and p > r["o_totalprice"] for d, p in pts
        ), f"order {r['o_orderkey']} not dominated"
