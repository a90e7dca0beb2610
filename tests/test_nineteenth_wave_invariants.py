"""Structural invariants of the nineteenth wave (ledger time travel,
windowed HLL)."""

from __future__ import annotations

from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.plans import QUERIES
from atlassian_confluence_data_pipeline_spark.plans.ledger import TT_CUT1, TT_CUT2


def test_time_travel_is_strict_subset_of_current_state(spark, sf_dir):
    """The as-of-snapshot-1 frame must differ from the merged state in
    exactly the delta-batch direction: every as-of row is <= the
    merged row for the same key, and keys new in batch 2 are absent."""
    asof = QUERIES["state_time_travel_orders"].fn(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    merged = (
        orders.filter(
            F.col("o_orderdate") < F.lit(TT_CUT2).cast("timestamp")
        )
        .groupBy(F.col("o_custkey").alias("id"))
        .agg(F.max("o_orderkey").alias("v2"))
    )
    j = asof.join(merged, "id")
    # no as-of version exceeds the later merged version
    assert j.filter(F.col("version") > F.col("v2")).count() == 0
    # every as-of key exists in the merged state (merge never deletes)
    assert asof.join(merged, "id", "left_anti").count() == 0
    # batch-2-only customers are invisible as-of snapshot 1
    only_b2 = (
        orders.filter(
            (F.col("o_orderdate") >= F.lit(TT_CUT1).cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(TT_CUT2).cast("timestamp"))
        )
        .select(F.col("o_custkey").alias("id"))
        .distinct()
        .join(
            orders.filter(
                F.col("o_orderdate") < F.lit(TT_CUT1).cast("timestamp")
            )
            .select(F.col("o_custkey").alias("id"))
            .distinct(),
            "id",
            "left_anti",
        )
    )
    assert asof.join(only_b2, "id").count() == 0


def test_windowed_hll_covers_windows_with_bounded_error(spark, sf_dir):
    df = QUERIES["windowed_distinct_users_hll"].fn(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    n_windows = (
        ev.select(F.window("ts", "6 hours").getField("start"))
        .distinct()
        .count()
    )
    assert df.count() == n_windows
    assert df.filter(F.col("exact_distinct") <= 0).count() == 0
    # m=256 -> 6.5% SE; small windows hit linear counting (tighter)
    assert df.filter(F.col("rel_error") > 0.3).count() == 0
