"""applyInPandas grouped-map vs the built-in window-function equivalent."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.operators.grouped import zscore_per_group


def test_zscore_matches_window_form(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    grouped = {
        r["c_custkey"]: r["zscore"]
        for r in zscore_per_group(cust, ["c_mktsegment"], "c_acctbal").collect()
    }
    w = Window.partitionBy("c_mktsegment")
    window_form = {
        r["c_custkey"]: r["z"]
        for r in cust.withColumn(
            "z",
            (F.col("c_acctbal") - F.avg("c_acctbal").over(w))
            / F.stddev_samp("c_acctbal").over(w),
        ).collect()
    }
    assert set(grouped) == set(window_form)
    for k, z in window_form.items():
        assert abs(grouped[k] - z) < 1e-9, k
