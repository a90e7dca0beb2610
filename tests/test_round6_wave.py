"""Round-6 wave invariants: PCA power iteration, exponential smoothing,
agreement/entropy/mixture analytics (oracle parity is covered by the
registry gate; these pin the semantic invariants)."""

from __future__ import annotations

import math

from atlassian_confluence_data_pipeline_spark.plans import QUERIES


def test_pca_unit_norm_and_share(spark, sf_dir):
    rows = QUERIES["pca_top_component"].fn(spark, sf_dir).collect()
    assert len(rows) == 64
    nrm = math.sqrt(sum(r["loading"] ** 2 for r in rows))
    assert abs(nrm - 1.0) < 1e-3  # display-rounded loadings
    share = rows[0]["explained_share"]
    assert 0.0 < share <= 1.0
    assert rows[0]["eigenvalue"] > 0.0
    assert all(r["explained_share"] == share for r in rows)


def test_ewma_tracks_series(spark, sf_dir):
    rows = sorted(
        QUERIES["ewma_daily_revenue"].fn(spark, sf_dir).collect(),
        key=lambda r: r["day"],
    )
    assert rows[0]["ewma"] == rows[0]["revenue"]  # seeded at first value
    lo = min(r["revenue"] for r in rows)
    hi = max(r["revenue"] for r in rows)
    assert all(lo <= r["ewma"] <= hi for r in rows)  # convex combination


def test_holt_level_and_trend_finite(spark, sf_dir):
    rows = sorted(
        QUERIES["holt_trend_daily_revenue"].fn(spark, sf_dir).collect(),
        key=lambda r: r["day"],
    )
    assert rows[0]["trend"] == 0.0
    assert all(math.isfinite(r["level"]) and math.isfinite(r["trend"]) for r in rows)


def test_kappa_bounds_and_cells(spark, sf_dir):
    r = QUERIES["quality_labeler_agreement"].fn(spark, sf_dir).first()
    assert r["n"] == r["n11"] + r["n10"] + r["n01"] + r["n00"]
    assert -1.0 <= r["kappa"] <= 1.0
    assert 0.0 <= r["po"] <= 1.0 and 0.0 <= r["pe"] <= 1.0


def test_entropy_rate_is_weighted_mean(spark, sf_dir):
    rows = QUERIES["transition_entropy_rate"].fn(spark, sf_dir).collect()
    states = [r for r in rows if r["prev_type"] != "_RATE_"]
    rate = [r for r in rows if r["prev_type"] == "_RATE_"][0]
    assert all(r["entropy_bits"] >= 0.0 for r in rows)
    # rate == sum(weight * H) within display rounding
    approx = sum(r["weight"] * r["entropy_bits"] for r in states)
    assert abs(rate["entropy_bits"] - approx) < 1e-3
    assert abs(sum(r["weight"] for r in states) - 1.0) < 1e-3


def test_mixture_flattens_toward_uniform_as_tau_grows(spark, sf_dir):
    rows = sorted(
        QUERIES["mixture_temperature_distances"].fn(spark, sf_dir).collect(),
        key=lambda r: r["tau"],
    )
    assert [r["tau"] for r in rows] == [0.5, 0.75, 1.0, 1.5, 2.0]
    tvs = [r["tv"] for r in rows]
    # temperature > 1 flattens shares toward uniform: tv non-increasing
    assert all(a >= b - 1e-9 for a, b in zip(tvs, tvs[1:]))
    assert all(r["tv"] >= 0.0 and r["chi2"] >= 0.0 for r in rows)
