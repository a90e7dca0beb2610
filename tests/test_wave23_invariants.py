"""Wave-23 semantic invariants (bitmaps / sequence patterns / spine
fill): bit algebra consistency, category partitioning, and LOCF
correctness against a direct recomputation."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.plans import QUERIES


def _rows(spark, sf_dir, name):
    return QUERIES[name].fn(spark, sf_dir).collect()


def test_bitmap_bitcount_matches_distinct_days(spark, sf_dir):
    rows = _rows(spark, sf_dir, "daily_activity_bitmaps")
    assert rows
    ev = load_table(spark, sf_dir, "events")
    expect = {
        (r["user_id"], r["month"]): r["nd"]
        for r in ev.groupBy(
            "user_id", F.date_format("ts", "yyyy-MM").alias("month")
        )
        .agg(F.countDistinct(F.dayofmonth("ts")).alias("nd"))
        .collect()
    }
    for r in rows:
        assert r["active_days"] == expect[(r["user_id"], r["month"])]
        # flags are pure functions of the bitmap
        w1 = sum(1 << d for d in range(1, 8))
        w4 = sum(1 << d for d in range(22, 29))
        assert r["active_week1"] == (1 if r["day_bitmap"] & w1 else 0)
        assert r["active_week4"] == (1 if r["day_bitmap"] & w4 else 0)
        assert r["retained_w1_to_w4"] == (
            r["active_week1"] and r["active_week4"]
        )
        # bit 0 never set (days are 1-31)
        assert r["day_bitmap"] % 2 == 0


def test_funnel_categories_partition_sessions(spark, sf_dir):
    rows = _rows(spark, sf_dir, "session_funnel_patterns")
    assert rows
    total_sessions = (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
        .count()
    )
    assert sum(r["n_sessions"] for r in rows) == total_sessions
    assert math.isclose(sum(r["share"] for r in rows), 1.0, abs_tol=1e-4)
    allowed = {"converted", "blind_purchase", "browsed", "errored", "other"}
    assert {r["category"] for r in rows} <= allowed


def test_locf_fills_every_day_and_matches_direct(spark, sf_dir):
    rows = sorted(_rows(spark, sf_dir, "daily_revenue_locf"), key=lambda r: r["day"])
    assert rows
    # spine is dense: consecutive days with no gaps
    import datetime

    days = [datetime.date.fromisoformat(r["day"]) for r in rows]
    for a, b in zip(days, days[1:]):
        assert (b - a).days == 1
    # direct LOCF recomputation from the observed series
    daily = {
        r["d"]: float(r["rev"])
        for r in load_table(spark, sf_dir, "orders")
        .groupBy(F.date_format("o_orderdate", "yyyy-MM-dd").alias("d"))
        .agg(F.round(F.sum(F.col("o_totalprice").cast("decimal(18,6)")), 2).alias("rev"))
        .collect()
    }
    last = None
    for r in rows:
        if r["day"] in daily:
            last = (daily[r["day"]], r["day"])
            assert r["is_filled"] == 0
        else:
            assert r["is_filled"] == 1
        assert last is not None
        assert math.isclose(r["revenue"], last[0], abs_tol=0.011)
        assert r["source_day"] == last[1]
