"""Wave-30 semantic invariants (robust estimation & resampling):
estimator orderings and closed-form consistency the oracle hash can't
check on its own."""

from __future__ import annotations

from atlassian_confluence_data_pipeline_spark.plans import QUERIES


def _rows(spark, sf_dir, name):
    return QUERIES[name].fn(spark, sf_dir).collect()


def test_winsorized_estimators_bracket_the_cuts(spark, sf_dir):
    r = _rows(spark, sf_dir, "winsorized_price_stats")[0]
    assert r["lo_cut"] <= r["hi_cut"]
    # both robust means live strictly inside the cut interval
    for m in (r["trimmed_mean"], r["winsor_mean"]):
        assert r["lo_cut"] <= m <= r["hi_cut"]
    # 5% symmetric trim keeps ~90% of rows (ties can keep more)
    assert r["n_kept"] >= int(0.9 * r["n_rows"])
    assert r["n_kept"] <= r["n_rows"]


def test_hodges_lehmann_is_a_walsh_average_median(spark, sf_dir):
    r = _rows(spark, sf_dir, "hodges_lehmann_daily_revenue")[0]
    assert r["n_pairs"] == r["n_days"] * (r["n_days"] + 1) // 2
    # pseudomedian of a right-skewed positive series sits below the
    # mean but is the same order of magnitude
    assert 0 < r["hl_estimate"]
    assert 0.2 * r["mean_rev"] < r["hl_estimate"] < 2.0 * r["mean_rev"]


def test_sign_permutation_null_calibration(spark, sf_dir):
    """The fixture series carries no systematic daily drift, so the
    add-one-smoothed p-value stays off the floor; p is a valid
    probability and n_extreme consistent with it."""
    r = _rows(spark, sf_dir, "sign_permutation_revenue_change")[0]
    assert r["n_replicas"] == 64
    assert 0 <= r["n_extreme"] <= 64
    assert abs(r["p_value"] - (1 + r["n_extreme"]) / 65.0) < 1e-6
    assert 0.0 < r["p_value"] <= 1.0


def test_jackknife_matches_direct_loo_computation(spark, sf_dir):
    """Recompute every leave-one-source-out mean directly and verify
    the closed-form jackknife SE."""
    import math

    from pyspark.sql import functions as F

    from atlassian_confluence_data_pipeline_spark.catalog import load_table

    r = _rows(spark, sf_dir, "jackknife_source_variance")[0]
    docs = load_table(spark, sf_dir, "documents")
    per = {
        row["source"]: (row["n"], row["s"])
        for row in docs.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("s"))
        .collect()
    }
    g = len(per)
    n_tot = sum(n for n, _ in per.values())
    s_tot = sum(s for _, s in per.values())
    thetas = [
        (s_tot - s) / (n_tot - n) for n, s in per.values()
    ]
    jk_mean = sum(thetas) / g
    jk_var = (g - 1) / g * sum((t - jk_mean) ** 2 for t in thetas)
    assert r["n_strata"] == g
    assert abs(r["full_mean"] - s_tot / n_tot) < 1e-4
    assert abs(r["jk_mean"] - jk_mean) < 1e-4
    assert abs(r["jk_se"] - math.sqrt(jk_var)) < 1e-3
