"""Wave-40 semantic invariants (survey sampling & decomposition):
estimator sanity, decomposition conservation, and the generalization
monotonicity law."""

from __future__ import annotations

from atlassian_confluence_data_pipeline_spark.plans import QUERIES


def _rows(spark, sf_dir, name):
    return QUERIES[name].fn(spark, sf_dir).collect()


def test_horvitz_thompson_near_truth(spark, sf_dir):
    r = _rows(spark, sf_dir, "horvitz_thompson_audit")[0]
    assert 0 < r["n_sampled"] < r["n_rows"]
    # sampling fraction realized near 0.2
    frac = r["n_sampled"] / r["n_rows"]
    assert 0.1 < frac < 0.3
    # unbiased estimator with ~n/5 draws: relative error is small
    assert r["rel_error"] < 0.2
    assert abs(r["ht_estimate"] / r["true_total"] - 1) < 0.2


def test_weekly_decomposition_seasonal_sums_to_zero(spark, sf_dir):
    """Seasonal components of a mean-detrended series average to ~0
    across the 7 weekday slots (weighted by slot counts); residual
    variance is non-negative."""
    rows = _rows(spark, sf_dir, "weekly_decomposition_revenue")
    # sparse fixtures (sf0.001) have calendar gaps, so only days with a
    # complete centered window decompose — slots may be missing there
    assert 1 <= len(rows) <= 7
    for r in rows:
        assert r["residual_std"] >= 0
        assert r["n_days"] > 0
    if len(rows) == 7 and min(r["n_days"] for r in rows) >= 30:
        total_days = sum(r["n_days"] for r in rows)
        weighted = (
            sum(r["seasonal"] * r["n_days"] for r in rows) / total_days
        )
        scale = max(abs(r["seasonal"]) for r in rows) + 1.0
        assert abs(weighted) < 0.05 * scale + 1.0


def test_generalization_reduces_risk(spark, sf_dir):
    """Coarsening a quasi-identifier merges groups, so group count
    drops and rows-at-risk cannot increase."""
    r = _rows(spark, sf_dir, "k_anon_generalization_step")[0]
    assert r["coarse_groups"] <= r["fine_groups"]
    assert r["coarse_rows_at_risk"] <= r["fine_rows_at_risk"]
    assert 0.0 <= r["coarse_risk_share"] <= 1.0
    assert r["fine_rows_at_risk"] <= r["n_rows"]
