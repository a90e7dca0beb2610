"""Wave-31 semantic invariants (LM smoothing & feature engineering):
probability-mass identities, leakage exclusion, and metric algebra the
oracle hash can't check."""

from __future__ import annotations

import math

from atlassian_confluence_data_pipeline_spark.plans import QUERIES


def _rows(spark, sf_dir, name):
    return QUERIES[name].fn(spark, sf_dir).collect()


def test_kneser_ney_discount_shrinks_high_counts(spark, sf_dir):
    """KN redistributes mass: every probability is in (0, 1]; for
    bigrams whose continuation is rare, p_kn < p_mle (discount wins);
    KN never exceeds MLE by more than the full backoff mass."""
    rows = _rows(spark, sf_dir, "kneser_ney_bigrams")
    assert rows
    below = 0
    for r in rows:
        assert 0.0 < r["p_kn"] <= 1.0 + 1e-9
        assert 0.0 < r["p_mle"] <= 1.0
        if r["p_kn"] < r["p_mle"]:
            below += 1
    # the discount must actually bite somewhere
    assert below > 0


def test_llr_collocations_positive_and_sorted(spark, sf_dir):
    rows = _rows(spark, sf_dir, "llr_collocations")
    assert 0 < len(rows) <= 50
    llrs = [r["llr"] for r in rows]
    assert llrs == sorted(llrs, reverse=True)
    # a top collocation should be a strongly-associated pair
    assert llrs[0] > 0
    for r in rows:
        assert r["c"] >= 5


def test_target_encoding_excludes_own_fold(spark, sf_dir):
    """Recompute one cell's leave-fold-out mean directly from the raw
    tables and match; the encoder never equals the WITHIN-fold mean
    unless folds coincide."""
    from pyspark.sql import functions as F

    from atlassian_confluence_data_pipeline_spark.catalog import load_table

    rows = _rows(spark, sf_dir, "target_encode_oof")
    assert rows
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    fold = (
        (
            (F.lit(1_103_515_245) * (F.col("o_custkey") % 2_147_483_647)
             + 12_345) % 2_147_483_647
        ) % 5
    ).cast("int")
    base = o.join(
        c.select(F.col("c_custkey").alias("o_custkey"),
                 F.col("c_mktsegment").alias("segment")),
        "o_custkey",
    ).select(
        "segment", fold.alias("fold"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    ).cache()
    tot = base.agg(F.sum("y"), F.count(F.lit(1))).first()
    prior = tot[0] / tot[1]
    r = rows[0]
    other = base.filter(
        (F.col("segment") == r["segment"]) & (F.col("fold") != r["fold"])
    ).agg(F.sum("y"), F.count(F.lit(1))).first()
    want = (other[0] + 10 * prior) / (other[1] + 10)
    assert abs(r["oof_encoded"] - want) < 1e-5
    base.unpersist()


def test_woe_iv_identity(spark, sf_dir):
    """IV recomputes from the published per-category pieces; WOE signs
    match the good/bad share comparison."""
    rows = _rows(spark, sf_dir, "woe_information_value")
    assert rows
    g = sum(r["n_good"] for r in rows)
    b = sum(r["n_bad"] for r in rows)
    iv = 0.0
    for r in rows:
        gs, bs = r["n_good"] / g, r["n_bad"] / b
        woe = math.log(gs / bs)
        assert abs(woe - r["woe"]) < 1e-5
        iv += (gs - bs) * woe
    assert abs(iv - rows[0]["iv"]) < 1e-4
    assert all(r["iv"] == rows[0]["iv"] for r in rows)


def test_forecast_metrics_algebra(spark, sf_dir):
    r = _rows(spark, sf_dir, "forecast_backtest_metrics")[0]
    assert r["n_test"] > 0
    # RMSE >= MAE always (Jensen), both positive
    assert r["rmse"] >= r["mae"] > 0
    assert r["mape"] > 0
    assert r["mase"] > 0
