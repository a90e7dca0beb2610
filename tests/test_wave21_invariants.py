"""Wave-21 semantic invariants (governance / advanced stats /
curation): properties the oracle hash can't see — monotonicity,
bounds, and cross-query consistency."""

from __future__ import annotations

from atlassian_confluence_data_pipeline_spark.plans import QUERIES


def _rows(spark, sf_dir, name):
    return QUERIES[name].fn(spark, sf_dir).collect()


def test_k_anonymity_bounds(spark, sf_dir):
    rows = _rows(spark, sf_dir, "k_anonymity_audit")
    assert rows
    for r in rows:
        assert 0 <= r["rows_at_risk"] <= r["total_rows"]
        assert r["n_small_groups"] <= r["n_groups"]
        assert r["min_group_size"] >= 1
        assert 0.0 <= r["risk_share"] <= 1.0


def test_compaction_plan_partitions_the_corpus(spark, sf_dir):
    from atlassian_confluence_data_pipeline_spark.catalog import load_table

    rows = sorted(
        _rows(spark, sf_dir, "compaction_file_plan"), key=lambda r: r["file_id"]
    )
    docs = load_table(spark, sf_dir, "documents")
    total = docs.groupBy().sum("n_chars").first()[0]
    n_docs = docs.count()
    assert sum(r["file_bytes"] for r in rows) == total
    assert sum(r["n_docs"] for r in rows) == n_docs
    # id ranges are disjoint and ordered: files tile the doc_id stream
    for a, b in zip(rows, rows[1:]):
        assert a["last_doc"] < b["first_doc"]


def test_entity_resolution_verify_stage(spark, sf_dir):
    rows = _rows(spark, sf_dir, "entity_resolution_parts")
    assert rows
    seen = set()
    for r in rows:
        assert r["name_dist"] <= 6
        assert r["is_match"] == (1 if r["name_dist"] <= 4 else 0)
        assert r["size_diff"] in (0, 1)
        key = (r["partkey_a"], r["partkey_b"])
        assert key not in seen, "duplicate candidate pair"
        seen.add(key)
        assert r["partkey_a"] != r["partkey_b"]


def test_calibration_bins_are_consistent(spark, sf_dir):
    rows = _rows(spark, sf_dir, "calibration_bins")
    assert rows
    for r in rows:
        assert 0 <= r["bin"] <= 9
        # mean predicted score lies inside the bin's interval
        assert r["bin"] / 10 <= r["mean_score"] <= (r["bin"] + 1) / 10 + 1e-9
        assert 0.0 <= r["positive_rate"] <= 1.0
        assert r["n_positive"] <= r["n_docs"]


def test_correlation_matrix_bounds_and_shape(spark, sf_dir):
    from atlassian_confluence_data_pipeline_spark.plans.analytics4 import (
        _CORR_COLS,
    )

    rows = _rows(spark, sf_dir, "numeric_correlation_matrix")
    assert len(rows) == 6  # C(4,2) unordered column pairs
    pos = {c: i for i, c in enumerate(_CORR_COLS)}
    seen = set()
    for r in rows:
        assert -1.0 <= r["corr"] <= 1.0
        assert pos[r["col_x"]] < pos[r["col_y"]]  # upper triangle only
        seen.add((r["col_x"], r["col_y"]))
    assert len(seen) == 6


def test_kaplan_meier_is_a_survival_curve(spark, sf_dir):
    rows = sorted(
        _rows(spark, sf_dir, "kaplan_meier_churn"),
        key=lambda r: r["duration_days"],
    )
    assert rows
    prev = 1.0 + 1e-9
    at_risk_prev = None
    for r in rows:
        assert 0.0 <= r["survival"] <= 1.0
        assert r["survival"] <= prev + 1e-9, "survival must be non-increasing"
        prev = r["survival"]
        assert r["n_events"] <= r["n_at_risk"]
        if at_risk_prev is not None:
            assert r["n_at_risk"] <= at_risk_prev, "at-risk must shrink"
        at_risk_prev = r["n_at_risk"]


def test_kaplan_meier_matches_naive_reference(spark):
    """Pin the estimator against a hand-computed product on a tiny
    deterministic cohort (pure-python reference, no SQL)."""
    import math

    from atlassian_confluence_data_pipeline_spark.plans.analytics4 import (
        CHURN_HORIZON_DAYS,
        kaplan_meier_churn,
    )
    from atlassian_confluence_data_pipeline_spark.catalog import load_table

    sf_dir = "/root/testdata/sf0.001"
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate"
    ).collect()
    first, last = {}, {}
    for r in o:
        k = r["o_custkey"]
        d = r["o_orderdate"]
        first[k] = min(first.get(k, d), d)
        last[k] = max(last.get(k, d), d)
    head = max(last.values())
    cohort = [
        (
            (last[k] - first[k]).days,
            1 if (head - last[k]).days > CHURN_HORIZON_DAYS else 0,
        )
        for k in first
    ]
    # naive product-limit over sorted durations
    from collections import Counter

    leave = Counter(d for d, _ in cohort)
    events = Counter(d for d, e in cohort if e)
    n = len(cohort)
    s, expect = 1.0, {}
    for d in sorted(leave):
        dd = events.get(d, 0)
        if dd:
            s *= 1.0 - dd / n
        expect[d] = (n, dd, s)
        n -= leave[d]
    got = {
        r["duration_days"]: (r["n_at_risk"], r["n_events"], r["survival"])
        for r in kaplan_meier_churn(spark, sf_dir).collect()
    }
    assert set(got) == set(expect)
    for d, (nr, dd, s) in expect.items():
        gnr, gdd, gs = got[d]
        assert (gnr, gdd) == (nr, dd), f"duration {d}"
        assert math.isclose(gs, s, abs_tol=5e-6), f"duration {d}: {gs} vs {s}"


def test_weighted_median_covers_half_the_weight(spark, sf_dir):
    from pyspark.sql import functions as F

    from atlassian_confluence_data_pipeline_spark.catalog import load_table

    med = {
        r["p_brand"]: r["weighted_median_price"]
        for r in _rows(spark, sf_dir, "weighted_median_price")
    }
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    j = li.join(part, li.l_partkey == part.p_partkey).select(
        "p_brand", "l_extendedprice", "l_quantity"
    )
    for brand, m in list(med.items())[:5]:
        b = j.filter(F.col("p_brand") == brand)
        tot = b.groupBy().sum("l_quantity").first()[0]
        below = (
            b.filter(F.col("l_extendedprice") <= m)
            .groupBy()
            .sum("l_quantity")
            .first()[0]
        )
        strictly_below = (
            b.filter(F.col("l_extendedprice") < m)
            .groupBy()
            .sum("l_quantity")
            .first()[0]
            or 0.0
        )
        assert 2 * below >= tot - 1e-6, f"{brand}: median too low"
        assert 2 * strictly_below < tot + 1e-6, f"{brand}: median too high"


def test_curriculum_phase_sizes(spark, sf_dir):
    rows = _rows(spark, sf_dir, "curriculum_schedule")
    n = len(rows)
    tenth = n // 10
    phases = {}
    for r in rows:
        phases[r["phase"]] = phases.get(r["phase"], 0) + 1
    assert phases.get("warmup", 0) == tenth
    assert phases.get("anneal", 0) == tenth
    assert phases.get("main", 0) == n - 2 * tenth
    # ranks are a permutation of 1..n and ordered by (n_chars, doc_id)
    ranks = sorted(r["rank"] for r in rows)
    assert ranks == list(range(1, n + 1))
    by_rank = sorted(rows, key=lambda r: r["rank"])
    keys = [(r["n_chars"], r["doc_id"]) for r in by_rank]
    assert keys == sorted(keys)


def test_lexical_diversity_bounds(spark, sf_dir):
    rows = _rows(spark, sf_dir, "lexical_diversity_scores")
    assert rows
    for r in rows:
        assert 1 <= r["n_distinct"] <= r["n_words"]
        assert r["n_hapax"] <= r["n_distinct"]
        assert 0.0 < r["ttr"] <= 1.0
        assert 0.0 <= r["hapax_share"] <= 1.0
        assert r["avg_word_len"] > 0


def test_nelson_aalen_consistent_with_kaplan_meier(spark, sf_dir):
    """H(t) is non-decreasing and -ln S(t) >= H(t) (term-wise
    -ln(1-x) >= x), with equality only when no events occurred."""
    import math

    na = {
        r["duration_days"]: r
        for r in _rows(spark, sf_dir, "nelson_aalen_hazard")
    }
    km = {
        r["duration_days"]: r
        for r in _rows(spark, sf_dir, "kaplan_meier_churn")
    }
    assert set(na) == set(km)
    prev = -1.0
    for d in sorted(na):
        r = na[d]
        assert r["cumulative_hazard"] >= prev - 1e-9, "H must be non-decreasing"
        prev = r["cumulative_hazard"]
        assert (r["n_at_risk"], r["n_events"]) == (
            km[d]["n_at_risk"], km[d]["n_events"]
        )
        s = km[d]["survival"]
        if s > 0:
            assert -math.log(s) >= r["cumulative_hazard"] - 1e-6
