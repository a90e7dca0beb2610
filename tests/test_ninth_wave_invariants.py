"""Structural invariants of the ninth-wave warehouse operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.plans import QUERIES


def test_scd2_versions_contiguous_one_current_chain_closed(spark, sf_dir):
    df = QUERIES["scd2_user_history"].fn(spark, sf_dir)
    per_user = df.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.max("version").alias("maxv"),
        F.sum("is_current").alias("n_current"),
    )
    # versions are contiguous 1..n and exactly one row is open per user
    assert per_user.filter(F.col("n") != F.col("maxv")).count() == 0
    assert per_user.filter(F.col("n_current") != 1).count() == 0
    # closed rows have valid_from <= valid_to (string timestamps sort
    # lexically); the open row has the MAX valid_from of its user
    closed = df.filter(F.col("valid_to") != "")
    assert closed.filter(F.col("valid_from") > F.col("valid_to")).count() == 0
    latest = df.groupBy("user_id").agg(F.max("valid_from").alias("mx"))
    cur = df.filter(F.col("is_current") == 1).join(latest, "user_id")
    assert cur.filter(F.col("valid_from") != F.col("mx")).count() == 0


def test_dq_expectations_report_shape(spark, sf_dir):
    rows = QUERIES["dq_expectations_orders"].fn(spark, sf_dir).collect()
    assert len(rows) == 5
    n_checked = {r["n_checked"] for r in rows}
    assert len(n_checked) == 1 and n_checked.pop() > 0
    for r in rows:
        assert r["passed"] == (1 if r["n_violations"] == 0 else 0)
    # the synthetic fixture is clean on key uniqueness
    by_name = {r["check_name"]: r for r in rows}
    assert by_name["unique_orderkey"]["n_violations"] == 0


def test_brand_regression_r2_bounds_and_positive_slope(spark, sf_dir):
    rows = QUERIES["brand_price_regression"].fn(spark, sf_dir).collect()
    assert rows
    import math

    for r in rows:
        assert -1e-9 <= r["r2"] <= 1 + 1e-9
        assert math.isfinite(r["slope"]) and math.isfinite(r["intercept"])
        # the fitted line must pass through the group mean:
        # intercept = mean_y - slope * mean_x by construction, so the
        # intercept has the same sign region as typical prices
        assert abs(r["intercept"]) < 1e9


def test_postings_varint_bounds(spark, sf_dir):
    df = QUERIES["postings_compression_stats"].fn(spark, sf_dir)
    assert df.count() > 0
    # every delta takes >= 1 byte and < the raw 8 bytes per id
    assert df.filter(F.col("varint_bytes") < F.col("df")).count() == 0
    assert df.filter(F.col("varint_bytes") > F.col("raw_bytes")).count() == 0
    assert df.filter(F.col("compression_ratio") < 1.0).count() == 0


def test_rollup_merge_equals_direct_aggregate(spark, sf_dir):
    """merge(partial(A), partial(B)) == aggregate(A ∪ B), checked
    in-DataFrame on top of the oracle's hash proof."""
    got = {
        r["o_orderpriority"]: r
        for r in QUERIES["incremental_rollup_merge"].fn(spark, sf_dir).collect()
    }
    o = load_table(spark, sf_dir, "orders")
    direct = {
        r["o_orderpriority"]: r
        for r in o.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,6)")).cast("double"),
                2,
            ).alias("sum_val"),
        )
        .collect()
    }
    assert set(got) == set(direct)
    for k, r in got.items():
        assert r["n_rows"] == direct[k]["n_rows"]
        assert r["sum_val"] == direct[k]["sum_val"]
        assert r["min_val"] <= r["avg_val"] <= r["max_val"]
        assert r["stddev_val"] >= 0
