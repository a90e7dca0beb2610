"""Wave-25 semantic invariants (compliance): cascade consistency,
partition-purge correctness, and noise-mechanism bounds."""

from __future__ import annotations

from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.plans import QUERIES


def _rows(spark, sf_dir, name):
    return QUERIES[name].fn(spark, sf_dir).collect()


def test_forget_sweep_cascade_consistency(spark, sf_dir):
    rows = {r["table_name"]: r for r in _rows(spark, sf_dir, "forget_user_sweep")}
    assert set(rows) == {"customer", "orders", "lineitem"}
    for r in rows.values():
        assert 0 <= r["rows_to_delete"] <= r["rows_total"]
    # direct recount of the cascade through the FK chain
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    del_keys = cust.filter(F.col("c_custkey") % 97 == 0)
    assert rows["customer"]["rows_to_delete"] == del_keys.count()
    doomed_orders = orders.join(
        del_keys, orders.o_custkey == del_keys.c_custkey, "left_semi"
    )
    assert rows["orders"]["rows_to_delete"] == doomed_orders.count()
    assert rows["lineitem"]["rows_to_delete"] == li.join(
        doomed_orders.select("o_orderkey"),
        li.l_orderkey == F.col("o_orderkey"),
        "left_semi",
    ).count()


def test_retention_plan_partitions_and_cutoff(spark, sf_dir):
    rows = _rows(spark, sf_dir, "data_retention_plan")
    assert rows
    total = sum(r["n_rows"] for r in rows)
    assert total == load_table(spark, sf_dir, "orders").count()
    for r in rows:
        assert r["purge"] == (1 if r["year"] < "1996" else 0)
        assert r["n_rows"] > 0


def test_dp_histogram_never_leaks_exact_counts(spark, sf_dir):
    rows = _rows(spark, sf_dir, "dp_noisy_histogram")
    assert rows
    true = {
        r["c_mktsegment"]: r["n"]
        for r in load_table(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in rows:
        # noise stays within the stated bound
        assert abs(r["noisy_count"] - true[r["c_mktsegment"]]) <= r["noise_bound"]
        # the release carries its accounting metadata
        assert r["epsilon"] == 1.0
    # output schema must not contain the raw count column
    cols = set(QUERIES["dp_noisy_histogram"].fn(spark, sf_dir).columns)
    assert "true_n" not in cols
