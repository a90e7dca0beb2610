"""Structural invariants of the twelfth-wave pretraining-prep ops."""

from __future__ import annotations

from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.plans import QUERIES
from atlassian_confluence_data_pipeline_spark.plans.pretrain import PAD_BUCKETS


def test_padding_buckets_partition_the_corpus(spark, sf_dir):
    rows = QUERIES["padding_waste_stats"].fn(spark, sf_dir).collect()
    assert rows
    valid = set(PAD_BUCKETS) | {PAD_BUCKETS[-1] * 2}
    assert {r["bucket"] for r in rows} <= valid
    n_docs = sum(r["n_docs"] for r in rows)
    assert n_docs == load_table(spark, sf_dir, "documents").count()
    for r in rows:
        assert 0 <= r["waste_ratio"] < 1
        if r["bucket"] <= PAD_BUCKETS[-1]:
            # non-overflow buckets: padded = n_docs*bucket - tokens
            assert (
                r["padded_tokens"]
                == r["n_docs"] * r["bucket"] - r["total_tokens"]
            )


def test_span_plan_mask_bounds_and_determinism(spark, sf_dir):
    df = QUERIES["span_corruption_plan"].fn(spark, sf_dir)
    assert df.filter(F.col("n_masked") > F.col("n_tokens")).count() == 0
    assert df.filter(
        (F.col("n_masked") < F.col("n_spans"))
        & (F.col("n_spans") > 0)
    ).count() == 0
    # ~5% starts with spans of mean length ~2 -> corpus mask ratio in
    # a loose [2%, 25%] sanity band
    agg = df.agg(
        (F.sum("n_masked") / F.sum("n_tokens")).alias("r")
    ).first()
    assert 0.02 < agg["r"] < 0.25
    # determinism: a second run produces the identical frame
    again = QUERIES["span_corruption_plan"].fn(spark, sf_dir)
    assert df.exceptAll(again).count() == 0
    assert again.exceptAll(df).count() == 0


def test_token_offsets_are_a_disjoint_cover(spark, sf_dir):
    df = QUERIES["doc_concat_token_offsets"].fn(spark, sf_dir)
    rows = sorted(df.collect(), key=lambda r: r["doc_id"])
    assert rows[0]["start_offset"] == 0
    for prev, cur in zip(rows, rows[1:]):
        assert cur["start_offset"] == prev["end_offset"]
    for r in rows:
        assert r["end_offset"] - r["start_offset"] == r["n_tokens"]
