"""X6 scale patterns verified for correctness and plan shape: salted
aggregation/join equivalence on a skewed fixture, and bucketed tables
joining without a shuffle exchange."""

from __future__ import annotations

import io
import contextlib

from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.operators.skew import (
    salted_agg,
    salted_join_skewed,
)


def _skewed_df(spark):
    # 90% of rows share one hot key
    hot = spark.range(0, 9000).select(
        F.lit("HOT").alias("k"), (F.col("id") % 97).cast("double").alias("v")
    )
    cold = spark.range(0, 1000).select(
        F.concat(F.lit("c"), (F.col("id") % 50).cast("string")).alias("k"),
        (F.col("id") % 31).cast("double").alias("v"),
    )
    return hot.unionByName(cold)


def test_salted_agg_matches_plain_agg(spark):
    df = _skewed_df(spark)
    plain = {
        (r["k"]): (r["n"], r["tot"])
        for r in df.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("v").cast("decimal(18,6)")).alias("tot"),
        )
        .collect()
    }
    salted = {
        (r["k"]): (r["n"], r["tot"])
        for r in salted_agg(
            df,
            ["k"],
            {
                "n": (F.count(F.lit(1)), F.sum("n")),
                "tot": (
                    F.sum(F.col("v").cast("decimal(18,6)")),
                    F.sum("tot"),
                ),
            },
        ).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain_join(spark):
    big = _skewed_df(spark)
    small = spark.createDataFrame(
        [("HOT", 1.5), ("c1", 2.0), ("c2", 3.0)], ["k", "w"]
    )
    plain = (
        big.join(small, "k")
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(F.col("v") * F.col("w")).alias("s"))
    )
    salted = (
        salted_join_skewed(big, small, "k", hot_keys=["HOT"], n_salts=8)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(F.col("v") * F.col("w")).alias("s"))
    )
    p = {r["k"]: (r["n"], round(r["s"], 6)) for r in plain.collect()}
    s = {r["k"]: (r["n"], round(r["s"], 6)) for r in salted.collect()}
    assert s == p


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    """Bucketed copies of orders/customer co-locate the join: the plan
    must contain NO Exchange on the join keys (the 100 TB repeated-join
    pattern: pay the shuffle once at write time)."""
    from atlassian_confluence_data_pipeline_spark.catalog import load_table

    warehouse = str(tmp_path / "wh")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bktest LOCATION '{warehouse}'")
    try:
        load_table(spark, sf_dir, "orders").write.bucketBy(8, "o_custkey").sortBy(
            "o_custkey"
        ).mode("overwrite").saveAsTable("bktest.orders_b")
        load_table(spark, sf_dir, "customer").withColumnRenamed(
            "c_custkey", "o_custkey"
        ).write.bucketBy(8, "o_custkey").mode("overwrite").saveAsTable(
            "bktest.customer_b"
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
        joined = spark.table("bktest.orders_b").join(
            spark.table("bktest.customer_b"), "o_custkey"
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "Exchange" not in plan, plan
        assert joined.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS bktest.orders_b")
        spark.sql("DROP TABLE IF EXISTS bktest.customer_b")
        spark.sql("DROP DATABASE IF EXISTS bktest")
