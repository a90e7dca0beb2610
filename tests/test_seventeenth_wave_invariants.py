"""Structural invariants of the seventeenth wave."""

from __future__ import annotations

from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.plans import QUERIES
from atlassian_confluence_data_pipeline_spark.plans.paths import (
    PATH_STEPS,
    PATH_TOPK,
)


def test_session_paths_shape_and_consistency(spark, sf_dir):
    rows = QUERIES["top_session_paths"].fn(spark, sf_dir).collect()
    assert 0 < len(rows) <= PATH_TOPK
    counts = [r["n_sessions"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        steps = r["path"].split(">")
        assert 1 <= len(steps) <= PATH_STEPS
        assert all(s for s in steps)
    # total sessions across reported paths can't exceed the number of
    # sessions sessionize_events finds
    total_sessions = (
        QUERIES["sessionize_events"]
        .fn(spark, sf_dir)
        .groupBy("user_id")
        .agg(F.max("session_seq").alias("m"))
        .agg(F.sum("m"))
        .first()[0]
    )
    assert sum(counts) <= total_sessions


def test_dedup_agreement_bounds(spark, sf_dir):
    row = QUERIES["dedup_method_agreement"].fn(spark, sf_dir).first()
    assert row["n_minhash"] > 0 and row["n_simhash"] > 0
    assert row["n_common"] <= min(row["n_minhash"], row["n_simhash"])
    assert 0.0 <= row["pair_set_jaccard"] <= 1.0
