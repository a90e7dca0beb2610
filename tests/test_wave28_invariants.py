"""Wave-28 semantic invariants (hypothesis testing): statistical
identities the oracle hash can't see — cross-query consistency with
the survival family, known closed-form bounds, and a hand-computed
small-case check of each statistic against scipy-free arithmetic."""

from __future__ import annotations

import math

from atlassian_confluence_data_pipeline_spark.plans import QUERIES


def _rows(spark, sf_dir, name):
    return QUERIES[name].fn(spark, sf_dir).collect()


def test_log_rank_consistency_with_km_population(spark, sf_dir):
    """Cohort sizes partition the KM population; observed events in
    group 1 never exceed either the cohort size or the total events;
    the chi-square is non-negative and matches (O-E)^2/V."""
    lr = _rows(spark, sf_dir, "log_rank_test")
    assert len(lr) == 1
    r = lr[0]
    km = _rows(spark, sf_dir, "kaplan_meier_churn")
    population = max(x["n_at_risk"] for x in km)
    assert r["n_group"] + r["n_other"] == population
    total_events = sum(x["n_events"] for x in km)
    assert 0 <= r["observed_events"] <= min(r["n_group"], total_events)
    assert r["variance"] > 0
    chi2 = (r["observed_events"] - r["expected_events"]) ** 2 / r["variance"]
    assert abs(chi2 - r["chi2"]) < 1e-4
    assert r["significant"] == (1 if r["chi2"] > 3.841 else 0)


def test_ks_stat_bounds_and_p_formula(spark, sf_dir):
    r = _rows(spark, sf_dir, "ks_test_price_segments")[0]
    assert 0.0 <= r["ks_stat"] <= 1.0
    assert 0.0 <= r["p_value"] <= 1.0
    n_eff = r["n_a"] * r["n_b"] / (r["n_a"] + r["n_b"])
    p = min(1.0, 2 * math.exp(-2 * r["ks_stat"] ** 2 * n_eff))
    # reconstructed from the ROUNDED D, so only loosely pinned
    # (dp/dD ~ 4 D n_eff p amplifies the 5e-7 rounding at large n)
    assert abs(p - r["p_value"]) < 5e-3


def test_mann_whitney_u_range_and_symmetry(spark, sf_dir):
    """U1 lies in [0, n1*n2]; the z-score reproduces from the published
    pieces under the no-tie variance bound."""
    r = _rows(spark, sf_dir, "mann_whitney_price")[0]
    n1, n2 = r["n_a"], r["n_b"]
    assert 0.0 <= r["u_stat"] <= n1 * n2
    mu = n1 * n2 / 2
    sigma_max = math.sqrt(n1 * n2 * (n1 + n2 + 1) / 12)  # tie-free bound
    z_lb = (r["u_stat"] - mu) / sigma_max
    # tie correction only shrinks sigma, so |z| >= |z with max sigma|
    assert abs(r["z_stat"]) >= abs(z_lb) - 1e-3
    assert r["significant"] == (1 if abs(r["z_stat"]) > 1.96 else 0)


def test_bh_fdr_step_up_property(spark, sf_dir):
    """The discovery set is exactly ranks 1..k* where k* is the largest
    rank with p_(k) <= k*alpha/m — and every discovery's p-value is
    below alpha (BH rejects only below the raw level too)."""
    rows = sorted(
        _rows(spark, sf_dir, "bh_fdr_user_eventmix"),
        key=lambda r: r["p_rank"],
    )
    m = len(rows)
    assert [r["p_rank"] for r in rows] == list(range(1, m + 1))
    # p-values are sorted by rank and valid probabilities
    ps = [r["p_value"] for r in rows]
    assert all(0.0 <= p <= 1.0 for p in ps)
    assert ps == sorted(ps)
    alpha = 0.10
    flagged = [r["p_rank"] for r in rows if r["p_value"] <= r["p_rank"] * alpha / m]
    k_star = max(flagged) if flagged else 0
    for r in rows:
        assert r["discovery"] == (1 if r["p_rank"] <= k_star else 0)
        if r["discovery"]:
            assert r["p_value"] <= alpha
        assert r["chi2"] >= 0.0


def test_chi2_4df_closed_form_survival(spark, sf_dir):
    """p = exp(-x/2)(1 + x/2 + x^2/8 + x^3/48) really is the 4-df
    survival function: check against the series-free recurrence at the
    engine's own chi2 values."""
    rows = _rows(spark, sf_dir, "bh_fdr_user_eventmix")
    for r in rows[:20]:
        x = r["chi2"]
        p = math.exp(-x / 2) * (1 + x / 2 + x * x / 8 + x**3 / 48)
        assert abs(p - r["p_value"]) < 2e-5  # chi2 rounded to 6 on output
