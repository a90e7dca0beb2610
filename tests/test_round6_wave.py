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


def test_psi_total_is_sum_of_contribs(spark, sf_dir):
    rows = QUERIES["psi_order_priority"].fn(spark, sf_dir).collect()
    states = [r for r in rows if r["priority"] != "_PSI_"]
    total = [r for r in rows if r["priority"] == "_PSI_"][0]
    assert abs(sum(r["psi_contrib"] for r in states) - total["psi_contrib"]) < 1e-3
    assert all(r["psi_contrib"] >= 0.0 for r in states)  # PSI terms are non-negative
    assert abs(sum(r["p_early"] for r in states) - 1.0) < 1e-3


def test_kendall_tau_bounds(spark, sf_dir):
    r = QUERIES["kendall_tau_qty_discount"].fn(spark, sf_dir).first()
    assert -1.0 <= r["tau_b"] <= 1.0
    assert r["concordant"] >= 0 and r["discordant"] >= 0
    # concordant+discordant can't exceed all x-distinct pairs
    assert r["concordant"] + r["discordant"] <= r["n"] * (r["n"] - 1) // 2


def test_bootstrap_replicates_spread_around_mean(spark, sf_dir):
    import statistics

    from atlassian_confluence_data_pipeline_spark.catalog import load_table
    from pyspark.sql import functions as F

    rows = QUERIES["poisson_bootstrap_order_means"].fn(spark, sf_dir).collect()
    assert len(rows) == 32
    true_mean = (
        load_table(spark, sf_dir, "orders")
        .agg(F.avg("o_totalprice"))
        .first()[0]
    )
    boot = [r["boot_mean"] for r in rows]
    # resample means bracket the point estimate and vary across reps
    assert min(boot) < true_mean < max(boot)
    assert statistics.pstdev(boot) > 0
    # weights are Poisson(1): effective n within 20% of the corpus size
    n = load_table(spark, sf_dir, "orders").count()
    assert all(abs(r["n_eff"] - n) < 0.2 * n for r in rows)


def test_lorenz_deciles_monotone(spark, sf_dir):
    rows = sorted(
        QUERIES["lorenz_curve_deciles"].fn(spark, sf_dir).collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in rows] == list(range(1, 11))
    shares = [r["revenue_share"] for r in rows]
    assert all(a <= b + 1e-9 for a, b in zip(shares, shares[1:]))  # sorted by revenue
    assert abs(sum(shares) - 1.0) < 1e-3


def test_dow_profile_complete(spark, sf_dir):
    rows = QUERIES["dow_revenue_profile"].fn(spark, sf_dir).collect()
    assert sorted(r["dow"] for r in rows) == list(range(7))
    assert abs(sum(r["order_share"] for r in rows) - 1.0) < 1e-3
    assert all(r["chi2_contrib"] >= 0.0 for r in rows)


def test_participation_ratio_bounds(spark, sf_dir):
    r = QUERIES["embedding_participation_ratio"].fn(spark, sf_dir).first()
    assert 1.0 <= r["participation_ratio"] <= 64.0
    assert 0.0 < r["isotropy"] <= 1.0
    assert r["trace"] > 0.0


def test_commonness_and_novelty_are_complementary_signals(spark, sf_dir):
    com = {
        r["doc_id"]: r
        for r in QUERIES["doc_ngram_commonness"].fn(spark, sf_dir).collect()
    }
    nov = {
        r["doc_id"]: r
        for r in QUERIES["doc_novelty_vs_earlier"].fn(spark, sf_dir).collect()
    }
    assert set(com) == set(nov)
    for d, r in com.items():
        assert 0.0 <= r["commonness"] <= 1.0
        assert r["n_common"] <= r["n_shingles"]
        assert 0.0 <= nov[d]["novelty"] <= 1.0
    # the earliest document's shingles are all first occurrences
    first_doc = min(nov)
    assert nov[first_doc]["novelty"] == 1.0
    # a shingle unseen elsewhere is novel AND uncommon: novelty >= 1 - commonness
    for d in nov:
        assert nov[d]["n_novel"] + com[d]["n_common"] >= com[d]["n_shingles"] - 1e-9


def test_hill_alpha_positive_heavy_tail(spark, sf_dir):
    r = QUERIES["hill_tail_customer_revenue"].fn(spark, sf_dir).first()
    assert r["k"] == 100
    assert r["xmin_cents"] > 0
    assert r["hill_alpha"] > 0.0
    assert abs(r["mean_log_excess"] * r["hill_alpha"] - 1.0) < 1e-3
