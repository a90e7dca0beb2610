"""Structural invariants of the fourth-wave operators — properties the
row-hash oracle parity can't articulate (monotonicity, conservation,
range bounds), checked at the test scale factor."""

from __future__ import annotations

from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.plans import QUERIES


def test_funnel_stages_are_monotone_nonincreasing(spark, sf_dir):
    rows = {
        r["stage"]: r["n_users"]
        for r in QUERIES["event_funnel"].fn(spark, sf_dir).collect()
    }
    assert rows["1_signup"] >= rows["2_click"] >= rows["3_purchase"]


def test_sessionize_seq_starts_at_one_and_is_contiguous(spark, sf_dir):
    df = QUERIES["sessionize_events"].fn(spark, sf_dir)
    per_user = df.groupBy("user_id").agg(
        F.min("session_seq").alias("lo"),
        F.max("session_seq").alias("hi"),
        F.countDistinct("session_seq").alias("n"),
    )
    bad = per_user.filter(
        (F.col("lo") != 1) | (F.col("n") != F.col("hi"))
    ).count()
    assert bad == 0  # sessions numbered 1..k with no gaps per user


def test_zscore_outliers_all_exceed_threshold(spark, sf_dir):
    df = QUERIES["value_outliers_zscore"].fn(spark, sf_dir)
    assert df.filter(F.abs(F.col("zscore")) <= 3.0).count() == 0


def test_pagerank_mass_is_conserved(spark, sf_dir):
    """With every node having out-edges (undirected graph), total rank
    mass stays 1 under the damped update at every iteration."""
    df = QUERIES["pagerank_neardup_graph"].fn(spark, sf_dir)
    n = df.count()
    if n == 0:
        return  # no near-dup graph at this SF: nothing to conserve
    total = df.agg(F.sum("rank")).first()[0]
    # output ranks are rounded to 6 decimals: up to 5e-7 per node
    assert abs(total - 1.0) <= n * 5e-7


def test_pq_codes_are_valid_codebook_ids(spark, sf_dir):
    df = QUERIES["pq_codes"].fn(spark, sf_dir)
    conds = [
        (F.col(f"code{s}") < 0) | (F.col(f"code{s}") > 7) for s in range(4)
    ]
    cond = conds[0]
    for c in conds[1:]:
        cond = cond | c
    assert df.filter(cond).count() == 0
    # seed vectors must quantize to themselves (distance 0 to their own
    # subvector is the unique minimum unless duplicated, and ties break
    # to the lowest id — which is the seed's own id ordering)
    seeds = df.filter(F.col("vec_id") < 8).collect()
    assert all(r[f"code{s}"] <= 7 for r in seeds for s in range(4))


def test_transition_matrix_totals_match_event_counts(spark, sf_dir):
    """Sum of transition counts = total events minus one per active
    user (each user's first event has no predecessor)."""
    from atlassian_confluence_data_pipeline_spark.catalog import load_table

    trans = QUERIES["event_transition_matrix"].fn(spark, sf_dir)
    total_trans = trans.agg(F.sum("n")).first()[0]
    ev = load_table(spark, sf_dir, "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert total_trans == n_events - n_users
