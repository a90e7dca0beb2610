"""Wave-26 semantic invariants (robust trend / modularity): order-
statistic and graph-identity checks the oracle hash can't express."""

from __future__ import annotations

import math

from atlassian_confluence_data_pipeline_spark.plans import QUERIES


def _rows(spark, sf_dir, name):
    return QUERIES[name].fn(spark, sf_dir).collect()


def test_robust_trend_structure(spark, sf_dir):
    rows = _rows(spark, sf_dir, "robust_trend_daily_revenue")
    assert len(rows) == 1
    r = rows[0]
    n = r["n_days"]
    assert r["n_pairs"] == n * (n - 1) // 2
    assert abs(r["mk_s"]) <= r["n_pairs"]
    # z and S agree in sign
    if r["mk_s"] > 0:
        assert r["mk_z"] > 0
    elif r["mk_s"] < 0:
        assert r["mk_z"] < 0
    # the median slope is an actual pairwise slope magnitude scale:
    # bounded by the series' max absolute single-step change
    assert math.isfinite(r["theil_sen_slope"])


def test_modularity_identities(spark, sf_dir):
    rows = _rows(spark, sf_dir, "dedup_cluster_modularity")
    assert rows
    m = sum(r["e_in"] for r in rows)
    # components make every edge intra-cluster: degree mass = 2m
    assert sum(r["deg_sum"] for r in rows) == 2 * m
    total_q = sum(r["modularity_term"] for r in rows)
    # modularity is bounded: Q = 1 - sum((d_c/2m)^2) <= 1, and > -1
    assert -1.0 <= total_q <= 1.0
    for r in rows:
        assert r["n_nodes"] >= 2  # singleton components carry no edges
        assert r["e_in"] >= 1
        assert r["deg_sum"] == 2 * r["e_in"]  # identity under components
        # a cluster of n nodes has at least n-1 and at most C(n,2) edges
        n = r["n_nodes"]
        assert n - 1 <= r["e_in"] <= n * (n - 1) // 2
