"""Round-4 wave (attribution & robust stats): semantic invariants the
oracle hash can't express on its own."""

from __future__ import annotations

from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.plans import QUERIES


def test_cumulative_distinct_users_is_monotone_and_totals(spark, sf_dir):
    rows = sorted(
        QUERIES["cumulative_distinct_users_daily"].fn(spark, sf_dir).collect(),
        key=lambda r: r["day"],
    )
    assert all(r["new_users"] > 0 for r in rows)
    cums = [r["cum_users"] for r in rows]
    assert cums == sorted(cums)
    assert cums[-1] == sum(r["new_users"] for r in rows)
    n_users = (
        load_table(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .count()
    )
    assert cums[-1] == n_users  # every user appears exactly once


def test_attribution_models_conserve_revenue(spark, sf_dir):
    rows = QUERIES["first_last_touch_attribution"].fn(spark, sf_dir).collect()
    by_model: dict[str, list] = {}
    for r in rows:
        by_model.setdefault(r["model"], []).append(r)
    assert set(by_model) == {"first_touch", "last_touch"}
    # both models attribute the SAME purchases, so totals must agree
    f = by_model["first_touch"]
    last = by_model["last_touch"]
    assert sum(r["n_purchases"] for r in f) == sum(
        r["n_purchases"] for r in last
    )
    assert abs(
        sum(r["revenue"] for r in f) - sum(r["revenue"] for r in last)
    ) < 0.05  # per-channel rounding only
    assert all(r["channel"] != "purchase" for r in rows)


def test_asof_next_purchase_is_forward_and_minimal(spark, sf_dir):
    out = QUERIES["asof_next_purchase"].fn(spark, sf_dir)
    rows = out.collect()
    assert rows and all(r["latency_s"] >= 0 for r in rows)
    # spot-check minimality: for one user, the matched purchase is the
    # earliest at-or-after the click
    ev = load_table(spark, sf_dir, "events")
    sample = rows[0]
    purchases = (
        ev.filter(
            (F.col("event_type") == "purchase")
            & (F.col("user_id") == sample["user_id"])
        )
        .select("ts")
        .collect()
    )
    after = [r["ts"] for r in purchases if r["ts"] >= sample["click_ts"]]
    want = min(after)
    got_lat = sample["latency_s"]
    exact = (want - sample["click_ts"]).total_seconds()
    assert int(exact) == got_lat


def test_per_source_weighted_sample_shape(spark, sf_dir):
    out = QUERIES["per_source_weighted_sample"].fn(spark, sf_dir).collect()
    by_src: dict[str, list] = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    for src, rows in by_src.items():
        assert sorted(r["rank"] for r in rows) == list(
            range(1, len(rows) + 1)
        )
        assert len(rows) <= 5
        keys = [r["sample_key"] for r in sorted(rows, key=lambda r: r["rank"])]
        assert keys == sorted(keys)  # rank follows the A-ES key


def test_mad_outliers_sane(spark, sf_dir):
    r = QUERIES["mad_robust_outliers"].fn(spark, sf_dir).first()
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    assert r["n_docs"] == n
    # selection medians bracket: at least half the docs at-or-below
    assert (
        docs.filter(F.col("n_chars") <= r["median_chars"]).count() * 2 >= n
    )
    assert 0 <= r["n_outliers"] < n
    assert abs(r["outlier_rate"] - r["n_outliers"] / n) < 1e-6
