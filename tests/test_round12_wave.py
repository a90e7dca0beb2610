"""Round-12 optimization invariants: spread_scan's deterministic hash
spread, and the in-place basket-combination expressions that replaced
the order-keyed self-joins."""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.operators.skew import spread_scan


def test_spread_scan_spreads_single_split_deterministically(spark, tmp_path):
    p = str(tmp_path / "one.parquet")
    spark.range(1000).select(
        F.col("id"), (F.col("id") % 7).alias("v")
    ).coalesce(1).write.parquet(p)
    df = spark.read.parquet(p)
    assert df.rdd.getNumPartitions() == 1
    out = spread_scan(df)
    target = spark.sparkContext.defaultParallelism
    assert out.rdd.getNumPartitions() == target
    # row multiset preserved, and the assignment is a pure function of
    # row values (re-evaluating gives the identical per-partition sets —
    # the SPARK-38388 retry-safety property round-robin lacks)
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, df.collect())
    )
    parts1 = out.withColumn("p", F.spark_partition_id()).collect()
    parts2 = spread_scan(df).withColumn("p", F.spark_partition_id()).collect()
    assert sorted(map(tuple, parts1)) == sorted(map(tuple, parts2))
    # ... and it actually spreads: no partition owns more than half
    counts = (
        out.groupBy(F.spark_partition_id().alias("p")).count().collect()
    )
    assert max(r["count"] for r in counts) < 1000 / 2


def test_spread_scan_no_op_when_source_supplies_splits(spark):
    df = spark.range(0, 1000, 1, spark.sparkContext.defaultParallelism)
    # non-file source: the probe sees >= parallelism/2 splits -> unchanged
    assert spread_scan(df) is df


def test_basket_combination_expressions_match_self_join(spark):
    rows = [(1, "c"), (1, "a"), (1, "b"), (2, "x"), (2, "a"), (3, "z")]
    df = spark.createDataFrame(rows, "k int, v string")
    baskets = df.groupBy("k").agg(F.collect_set("v").alias("vs"))
    pairs_expr = F.flatten(
        F.transform(
            F.col("vs"),
            lambda x: F.transform(
                F.filter(F.col("vs"), lambda y: y > x),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    got = sorted(
        (r["k"], r["p"]["a"], r["p"]["b"])
        for r in baskets.select("k", F.explode(pairs_expr).alias("p")).collect()
    )
    by_k = {}
    for k, v in rows:
        by_k.setdefault(k, set()).add(v)
    want = sorted(
        (k, a, b)
        for k, vs in by_k.items()
        for a, b in combinations(sorted(vs), 2)
    )
    assert got == want
