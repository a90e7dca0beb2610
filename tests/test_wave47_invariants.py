"""Wave-47 semantic invariants (uplift & Bloom planning): A/A null
calibration of the Qini curve and Bloom math identities."""

from __future__ import annotations

import math

from atlassian_confluence_data_pipeline_spark.plans import QUERIES


def _rows(spark, sf_dir, name):
    return QUERIES[name].fn(spark, sf_dir).collect()


def test_qini_null_experiment_hugs_zero(spark, sf_dir):
    rows = sorted(
        _rows(spark, sf_dir, "uplift_qini_deciles"),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in rows] == list(range(1, 11))
    n_total = sum(r["n_t"] + r["n_c"] for r in rows)
    for r in rows:
        assert r["n_t"] > 0 and r["n_c"] > 0
        assert -1.0 <= r["decile_uplift"] <= 1.0
    # hash assignment is ~50/50
    nt = sum(r["n_t"] for r in rows)
    assert abs(nt / n_total - 0.5) < 0.1
    # A/A: the final cumulative Qini is small relative to the
    # treated-conversion scale (binomial noise, not signal)
    total_conv_scale = max(1.0, nt * 0.5)
    assert abs(rows[-1]["qini"]) < 0.2 * total_conv_scale


def test_bloom_plan_math(spark, sf_dir):
    rows = _rows(spark, sf_dir, "bloom_sizing_plan")
    assert rows
    for r in rows:
        n = r["n_distinct"]
        m = math.ceil(-n * math.log(0.01) / math.log(2) ** 2)
        assert r["m_bits"] == m
        assert r["k_hashes"] == round(m / n * math.log(2))
        # ~9.585 bits per key at 1% fpp
        assert 9.0 < r["m_bits"] / n < 10.5
        assert abs(r["kib"] - m / 8192) < 0.01
