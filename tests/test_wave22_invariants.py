"""Wave-22 semantic invariants (distribution & time-series
diagnostics): bounds, conservation, and curve shape."""

from __future__ import annotations

import math

from atlassian_confluence_data_pipeline_spark.plans import QUERIES


def _rows(spark, sf_dir, name):
    return QUERIES[name].fn(spark, sf_dir).collect()


def test_acf_bounds_and_lag_domain(spark, sf_dir):
    rows = _rows(spark, sf_dir, "acf_daily_revenue")
    assert {r["lag"] for r in rows} == set(range(1, 15))
    for r in rows:
        assert -1.0 - 1e-9 <= r["acf"] <= 1.0 + 1e-9
        assert r["n_pairs"] > 0


def test_benford_shares_sum_to_one(spark, sf_dir):
    rows = _rows(spark, sf_dir, "benford_price_audit")
    assert {r["digit"] for r in rows} <= set(range(1, 10))
    assert math.isclose(sum(r["observed_share"] for r in rows), 1.0, abs_tol=1e-4)
    # Benford reference shares are the exact closed form
    for r in rows:
        assert math.isclose(
            r["benford_share"], math.log10(1 + 1 / r["digit"]), abs_tol=1e-6
        )
        assert r["chi2_term"] >= 0


def test_interarrival_shares_and_bucket_means(spark, sf_dir):
    rows = _rows(spark, sf_dir, "order_interarrival_stats")
    assert rows
    assert math.isclose(sum(r["share"] for r in rows), 1.0, abs_tol=1e-4)
    for r in rows:
        lo, hi = r["gap_weeks"] * 7, r["gap_weeks"] * 7 + 6
        assert lo <= r["avg_gap_days"] <= hi + 1e-9


def test_fano_factor_nonnegative(spark, sf_dir):
    rows = _rows(spark, sf_dir, "burstiness_event_types")
    assert rows
    for r in rows:
        assert r["fano_factor"] >= -1e-9
        assert r["mean_daily"] > 0
        assert r["n_days"] >= 1


def test_coverage_curve_is_monotone_to_one(spark, sf_dir):
    from pyspark.sql import functions as F

    from atlassian_confluence_data_pipeline_spark.catalog import load_table

    rows = sorted(
        _rows(spark, sf_dir, "vocab_coverage_curve"),
        key=lambda r: r["vocab_size"],
    )
    assert rows
    prev_cov, prev_freq = 0.0, None
    for r in rows:
        assert 0.0 < r["token_coverage"] <= 1.0
        assert r["token_coverage"] > prev_cov, "coverage strictly increases"
        prev_cov = r["token_coverage"]
        if prev_freq is not None:
            assert r["boundary_freq"] <= prev_freq, "freq ranks descend"
        prev_freq = r["boundary_freq"]
    # the last checkpoint at or past the full vocab covers everything
    docs = load_table(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(F.split(F.trim("text"), r"\s+")).alias("w"))
        .distinct()
        .count()
    )
    if rows[-1]["vocab_size"] >= vocab:
        assert math.isclose(rows[-1]["token_coverage"], 1.0, abs_tol=1e-6)
