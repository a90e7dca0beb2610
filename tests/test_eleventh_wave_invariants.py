"""Structural invariants of the eleventh-wave operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.plans import QUERIES
from atlassian_confluence_data_pipeline_spark.plans.retail import BASKET_MIN_SUP


def test_basket_metrics_consistent(spark, sf_dir):
    df = QUERIES["market_basket_lift"].fn(spark, sf_dir)
    assert df.count() > 0
    assert df.filter(F.col("part_a") >= F.col("part_b")).count() == 0
    assert df.filter(F.col("n_ab") < BASKET_MIN_SUP).count() == 0
    assert df.filter(
        (F.col("support") <= 0)
        | (F.col("support") > 1)
        | (F.col("confidence") <= 0)
        | (F.col("confidence") > 1)
        | (F.col("lift") <= 0)
    ).count() == 0
    # support can never exceed confidence (n_ab/N <= n_ab/n_a)
    assert df.filter(F.col("support") > F.col("confidence") + 1e-9).count() == 0


def test_grouped_median_splits_mass(spark, sf_dir):
    """At least half the rows sit at or below the reported median, and
    at least half at or above — the defining property."""
    rows = QUERIES["grouped_median_prices"].fn(spark, sf_dir).collect()
    assert rows
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    j = li.join(part, li["l_partkey"] == part["p_partkey"]).select(
        "p_brand", "l_extendedprice"
    )
    stats = {
        (r["p_brand"]): r
        for r in j.groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in rows:
        assert r["n"] == stats[r["p_brand"]]["n"]
    sample = {r["p_brand"]: r["median"] for r in rows[:5]}
    for brand, med in sample.items():
        below = j.filter(
            (F.col("p_brand") == brand) & (F.col("l_extendedprice") <= med)
        ).count()
        above = j.filter(
            (F.col("p_brand") == brand) & (F.col("l_extendedprice") >= med)
        ).count()
        n = stats[brand]["n"]
        assert below * 2 >= n
        assert above * 2 >= n


def test_seasonal_outliers_are_extreme_for_their_hour(spark, sf_dir):
    df = QUERIES["seasonal_residual_outliers"].fn(spark, sf_dir)
    assert df.filter(F.abs(F.col("resid_z")) <= 3.0).count() == 0
    assert df.filter((F.col("hod") < 0) | (F.col("hod") > 23)).count() == 0


def test_path_enumeration_consistent_with_rollup(spark, sf_dir):
    paths = QUERIES["hierarchy_path_enumeration"].fn(spark, sf_dir)
    # path starts at root and ends at node; depth = separators
    bad = paths.filter(
        ~F.col("path").startswith(F.col("root_id").cast("string"))
        | ~F.col("path").endswith(F.col("node_id").cast("string"))
    )
    assert bad.count() == 0
    seps = F.size(F.split("path", "/")) - 1
    assert paths.filter(seps != F.col("depth")).count() == 0
    # node set and per-root sizes agree with order_tree_rollup
    roll = {
        r["root_id"]: r
        for r in QUERIES["order_tree_rollup"].fn(spark, sf_dir).collect()
    }
    per_root = {
        r["root_id"]: r
        for r in paths.groupBy("root_id")
        .agg(F.count(F.lit(1)).alias("n"), F.max("depth").alias("d"))
        .collect()
    }
    for root_id, r in roll.items():
        assert per_root[root_id]["n"] == r["n_nodes"]
        assert per_root[root_id]["d"] == r["max_depth"]
