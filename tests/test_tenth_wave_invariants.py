"""Structural invariants of the tenth-wave operators (Arrow grouped
map, weighted sampling, TWAP, watermark audit)."""

from __future__ import annotations

from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.plans import QUERIES
from atlassian_confluence_data_pipeline_spark.plans.timeseries import SAMPLE_K


def test_minmax_norm_bounds_and_extremes(spark, sf_dir):
    df = QUERIES["source_minmax_normalize"].fn(spark, sf_dir)
    assert df.filter((F.col("norm") < 0) | (F.col("norm") > 1)).count() == 0
    # every multi-length source has an exact 0 and an exact 1
    per_src = df.groupBy("source").agg(
        F.min("norm").alias("mn"),
        F.max("norm").alias("mx"),
        F.count_distinct("n_chars").alias("nd"),
    )
    assert per_src.filter((F.col("nd") > 1) & (F.col("mn") != 0.0)).count() == 0
    assert per_src.filter((F.col("nd") > 1) & (F.col("mx") != 1.0)).count() == 0
    assert df.count() == load_table(spark, sf_dir, "documents").count()


def test_weighted_sample_is_length_biased_and_ranked(spark, sf_dir):
    rows = sorted(
        QUERIES["weighted_sample_wor"].fn(spark, sf_dir).collect(),
        key=lambda r: r["rank"],
    )
    assert len(rows) == SAMPLE_K
    assert [r["rank"] for r in rows] == list(range(1, SAMPLE_K + 1))
    keys = [r["sample_key"] for r in rows]
    assert keys == sorted(keys)
    assert len({r["doc_id"] for r in rows}) == SAMPLE_K
    # exponential-key sampling is weight-biased: the sample's mean
    # length must exceed the corpus mean
    corpus_mean = (
        load_table(spark, sf_dir, "documents")
        .agg(F.avg("n_chars"))
        .first()[0]
    )
    sample_mean = sum(r["n_chars"] for r in rows) / len(rows)
    assert sample_mean > corpus_mean


def test_twap_within_value_range(spark, sf_dir):
    rows = QUERIES["twap_event_values"].fn(spark, sf_dir).collect()
    assert rows
    ev = load_table(spark, sf_dir, "events")
    bounds = {
        r["event_type"]: (r["mn"], r["mx"])
        for r in ev.groupBy("event_type")
        .agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
        .collect()
    }
    for r in rows:
        mn, mx = bounds[r["event_type"]]
        assert mn - 1e-6 <= r["twap"] <= mx + 1e-6
        assert r["total_us"] > 0 and r["n_intervals"] > 0


def test_late_arrival_audit_rates_consistent(spark, sf_dir):
    df = QUERIES["late_arrival_audit"].fn(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    assert df.count() == ev.select("user_id").distinct().count()
    assert (
        df.agg(F.sum("n_events")).first()[0] == ev.count()
    )
    assert df.filter(F.col("n_late") > F.col("n_events")).count() == 0
    assert df.filter(
        (F.col("late_rate") < 0) | (F.col("late_rate") > 1)
    ).count() == 0
