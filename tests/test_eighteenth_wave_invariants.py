"""Structural invariants of the eighteenth wave (funnel economics,
LTV cohorts, concentration)."""

from __future__ import annotations

from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.plans import QUERIES


def test_latency_percentiles_monotone_and_nonneg(spark, sf_dir):
    rows = {r["p"]: r for r in QUERIES["conversion_latency_percentiles"].fn(spark, sf_dir).collect()}
    assert set(rows) == {0.5, 0.9}
    assert rows[0.5]["n_converters"] == rows[0.9]["n_converters"] > 0
    assert 0 <= rows[0.5]["latency_s"] <= rows[0.9]["latency_s"]


def test_value_retention_triangle_consistent(spark, sf_dir):
    df = QUERIES["value_retention_cohorts"].fn(spark, sf_dir)
    assert df.filter(F.col("weeks_since") < 0).count() == 0
    # total value across cells equals total event value (DECIMAL-exact)
    total = df.agg(
        F.round(F.sum(F.col("total_value").cast("decimal(18,6)")).cast("double"), 2)
    ).first()[0]
    ev = load_table(spark, sf_dir, "events")
    want = ev.agg(
        F.round(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 2)
    ).first()[0]
    assert abs(total - want) < 0.01
    # week-0 cell exists for every cohort (the cohort's own first week)
    w0 = df.filter(F.col("weeks_since") == 0).count()
    assert w0 == df.select("cohort_week").distinct().count()


def test_gini_bounds_and_decile_dominance(spark, sf_dir):
    row = QUERIES["customer_revenue_gini"].fn(spark, sf_dir).first()
    assert 0.0 <= row["gini"] < 1.0
    # the top decile of customers must hold at least a decile of revenue
    assert row["top_decile_share"] >= 0.1 - 1e-9
    assert row["top_decile_share"] <= 1.0
    assert row["n_customers"] > 0
