"""Wave-43 semantic invariants (feature-store joins): leakage freedom,
monotone features, and tolerance consistency."""

from __future__ import annotations

from atlassian_confluence_data_pipeline_spark.plans import QUERIES


def _rows(spark, sf_dir, name):
    return QUERIES[name].fn(spark, sf_dir).collect()


def test_pit_features_never_leak(spark, sf_dir):
    """Recompute a handful of labels' features by brute force from the
    raw events and confirm the PIT join saw EXACTLY the clicks at or
    before the label timestamp."""
    from pyspark.sql import functions as F

    from atlassian_confluence_data_pipeline_spark.catalog import load_table

    rows = _rows(spark, sf_dir, "feature_store_pit_join")
    assert rows
    ev = load_table(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select("user_id", F.unix_micros("ts").alias("t"),
                F.round(F.col("value") * 1000000).cast("bigint").alias("vq"))
        .collect()
    )
    purchases = {
        r["event_id"]: (r["user_id"], r["t"])
        for r in ev.filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", F.unix_micros("ts").alias("t"))
        .collect()
    }
    by_label = {r["label_id"]: r for r in rows}
    assert set(by_label) == set(purchases)
    for label_id in list(purchases)[:25]:
        uid, lts = purchases[label_id]
        prior = [c for c in clicks if c["user_id"] == uid and c["t"] <= lts]
        r = by_label[label_id]
        assert r["clicks_so_far"] == len(prior)
        want = sum(c["vq"] for c in prior) / 1000000
        assert abs(r["click_value_sum"] - want) < 1e-3


def test_tolerance_is_a_restriction_of_pit(spark, sf_dir):
    """Every within-tolerance match has staleness in [0, 1h]; out-of-
    tolerance rows carry NULL feature columns; the tolerance matches
    are a subset of the unbounded PIT matches (clicks_so_far > 0)."""
    pit = {
        r["label_id"]: r
        for r in _rows(spark, sf_dir, "feature_store_pit_join")
    }
    tol = _rows(spark, sf_dir, "asof_click_tolerance")
    assert len(tol) == len(pit)
    n_within = 0
    for r in tol:
        if r["within_tolerance"]:
            n_within += 1
            assert 0 <= r["staleness_us"] <= 3_600_000_000
            assert r["click_value"] is not None
            assert pit[r["purchase_id"]]["clicks_so_far"] > 0
        else:
            assert r["staleness_us"] is None
            assert r["click_value"] is None
    # dense fixture: most purchases have a recent click
    assert n_within > 0
