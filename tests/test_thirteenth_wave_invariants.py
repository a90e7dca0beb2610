"""Structural invariants of the thirteenth-wave layout operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.plans import QUERIES
from atlassian_confluence_data_pipeline_spark.plans.layout import Z_BITS


def test_table_stats_consistent_with_table(spark, sf_dir):
    row = QUERIES["table_stats_documents"].fn(spark, sf_dir).first()
    d = load_table(spark, sf_dir, "documents")
    assert row["n_rows"] == d.count()
    assert row["null_text"] == 0
    assert row["nd_lang"] >= 1 and row["nd_source"] >= 1
    assert row["min_chars"] <= row["max_chars"]
    assert row["avg_text_len"] > 0


def test_zorder_buckets_localize_both_dimensions(spark, sf_dir):
    """The point of Z-ordering: each bucket's range in EACH dimension
    is a fraction of the full range (a single-column sort would leave
    the other dimension's per-bucket range at ~100%)."""
    rows = QUERIES["zorder_layout_keys"].fn(spark, sf_dir).collect()
    assert rows
    total = sum(r["n_rows"] for r in rows)
    li = load_table(spark, sf_dir, "lineitem")
    assert total == li.count()
    full = 1 << Z_BITS
    # buckets share the top 8 interleaved bits = 4 high bits per dim,
    # so each dimension's span within a bucket is <= 1/16 of the space
    for r in rows:
        assert r["max_part"] - r["min_part"] < full / 16 + 1
        assert r["max_supp"] - r["min_supp"] < full / 16 + 1


def test_salted_counts_equal_plain_groupby(spark, sf_dir):
    got = {
        r["event_type"]: r
        for r in QUERIES["salted_event_type_counts"].fn(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    want = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 2
            ).alias("total_value"),
        )
        .collect()
    }
    assert got.keys() == want.keys()
    for k in got:
        assert got[k]["n_events"] == want[k]["n_events"]
        assert got[k]["total_value"] == want[k]["total_value"]
