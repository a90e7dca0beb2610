"""Round-9 evaluation wave invariants (plans/evals.py additions +
dedup_aware_sample_weights)."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_ndcg_mrr_ranges_and_consistency(spark):
    from atlassian_confluence_data_pipeline_spark.plans.evals import (
        retrieval_ndcg_mrr,
    )

    rows = retrieval_ndcg_mrr(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.ndcg <= 1.0
        assert 0.0 <= r.mrr <= 1.0
        # no relevant -> both zero; any relevant -> both positive
        if r.n_relevant == 0:
            assert r.ndcg == 0.0 and r.mrr == 0.0
        else:
            assert r.ndcg > 0.0 and r.mrr > 0.0
    # a query whose top-1 is relevant has mrr exactly 1
    assert any(r.mrr == 1.0 for r in rows)


def test_conformal_coverage_meets_level(spark):
    from atlassian_confluence_data_pipeline_spark.plans.evals import (
        CONFORMAL_LEVEL,
        conformal_length_calibration,
    )

    r = conformal_length_calibration(spark, SF).collect()[0]
    assert r.n_calib > 0 and r.n_test > 0
    assert r.qhat >= 0
    # the conformal guarantee holds in expectation; with exchangeable
    # fixture splits the empirical coverage sits at/above level minus
    # finite-sample slack
    assert r.coverage >= CONFORMAL_LEVEL - 0.1


def test_dedup_weights_sum_to_content_count(spark):
    from atlassian_confluence_data_pipeline_spark.plans.curation import (
        dedup_aware_sample_weights,
    )

    rows = dedup_aware_sample_weights(spark, SF).collect()
    n_docs = len(rows)
    n_clusters = len({r.cluster_rep for r in rows})
    total_w = sum(r.weight for r in rows)
    # one unit of weight per distinct content cluster
    assert abs(total_w - n_clusters) < 1e-3
    assert n_clusters <= n_docs
    for r in rows:
        assert abs(r.weight - 1.0 / r.cluster_size) < 1e-6
