"""Incremental rollup: folding month-batches one at a time must equal
the full recompute, bit-for-bit (decimal partials are associative)."""

from __future__ import annotations

from functools import reduce

from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.operators.incremental_agg import (
    merge_rollup,
    partial_aggregate,
    read_metrics,
)


def test_batched_rollup_equals_full_recompute(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    keys = ["o_orderpriority"]
    # split history into 4 disjoint date slices ("micro-batches")
    bounds = ["1995-01-01", "1997-01-01", "1999-01-01", "2001-01-01", "2002-01-01"]
    batches = [
        orders.filter(
            (F.col("o_orderdate") >= F.lit(lo).cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(hi).cast("timestamp"))
        )
        for lo, hi in zip(bounds, bounds[1:])
    ]
    summary = reduce(
        lambda acc, b: merge_rollup(acc, partial_aggregate(b, keys, "o_totalprice"), keys),
        batches[1:],
        partial_aggregate(batches[0], keys, "o_totalprice"),
    )
    full = partial_aggregate(orders, keys, "o_totalprice")

    def as_map(df):
        return {
            r["o_orderpriority"]: (
                r["n_rows"],
                str(r["sum_val"]),
                str(r["sum_sq"]),
                str(r["min_val"]),
                str(r["max_val"]),
            )
            for r in df.collect()
        }

    assert as_map(summary) == as_map(full)

    # derived metrics agree with direct aggregation (within rounding)
    derived = {
        r["o_orderpriority"]: (r["avg_val"], r["stddev_pop"])
        for r in read_metrics(summary).collect()
    }
    direct = {
        r["o_orderpriority"]: (round(r["a"], 4), round(r["s"], 4))
        for r in orders.groupBy("o_orderpriority")
        .agg(
            F.avg("o_totalprice").alias("a"),
            F.stddev_pop("o_totalprice").alias("s"),
        )
        .collect()
    }
    for k, (a, s) in direct.items():
        assert abs(derived[k][0] - a) < 1e-2
        assert abs(derived[k][1] - s) < 1e-2


def test_merge_handles_new_and_absent_keys(spark):
    a = spark.createDataFrame([("x", 10.0), ("x", 20.0)], ["k", "v"])
    b = spark.createDataFrame([("y", 5.0)], ["k", "v"])
    s1 = partial_aggregate(a, ["k"], "v")
    s2 = merge_rollup(s1, partial_aggregate(b, ["k"], "v"), ["k"])
    rows = {r["k"]: r for r in s2.collect()}
    assert rows["x"]["n_rows"] == 2 and float(rows["x"]["sum_val"]) == 30.0
    assert rows["y"]["n_rows"] == 1 and float(rows["y"]["min_val"]) == 5.0
