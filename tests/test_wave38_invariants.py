"""Wave-38 semantic invariants (operational metrics): the Little's-law
identity itself, sweep-line conservation, and gap-report ordering."""

from __future__ import annotations

from atlassian_confluence_data_pipeline_spark.plans import QUERIES


def _rows(spark, sf_dir, name):
    return QUERIES[name].fn(spark, sf_dir).collect()


def test_littles_law_holds_exactly(spark, sf_dir):
    """Over a closed horizon the time-averaged concurrency EQUALS
    lambda * W — the audit's whole point: the sweep-line L and the
    closed-form rhs must agree to rounding."""
    r = _rows(spark, sf_dir, "littles_law_audit")[0]
    assert r["n_sessions"] > 0
    assert r["max_concurrency"] >= 1
    assert r["avg_concurrency"] > 0
    assert abs(r["avg_concurrency"] - r["littles_rhs"]) < 1e-4
    # peak bounds the average
    assert r["max_concurrency"] >= r["avg_concurrency"] - 1e-9
    # sanity: duration and rate are positive and consistent with L
    lhs = r["arrival_rate_per_s"] * r["avg_duration_s"]
    assert abs(lhs - r["littles_rhs"]) < 1e-3


def test_peak_concurrency_bounded_by_users(spark, sf_dir):
    from atlassian_confluence_data_pipeline_spark.catalog import load_table

    r = _rows(spark, sf_dir, "littles_law_audit")[0]
    n_users = (
        load_table(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .count()
    )
    # a user has at most one session open at a time
    assert r["max_concurrency"] <= n_users


def test_quiet_gaps_sorted_and_consistent(spark, sf_dir):
    rows = _rows(spark, sf_dir, "longest_quiet_gaps")
    assert 0 < len(rows) <= 10
    gaps = [r["gap_us"] for r in rows]
    assert gaps == sorted(gaps, reverse=True)
    for r in rows:
        assert r["gap_us"] > 0
        assert abs(r["gap_seconds"] - r["gap_us"] / 1e6) < 1e-3
