"""Dawid-Skene wave (plans/annotation.py): the fitted confusion
matrices must recover the planted noise structure."""

from __future__ import annotations

from atlassian_confluence_data_pipeline_spark.plans.annotation import (
    ANNOTATORS,
    dawid_skene_confusion,
    annotator_labels,
)

SF = "/root/testdata/sf0.001"


def test_labels_match_planted_noise_schedule(spark):
    rows = annotator_labels(spark, SF).collect()
    by = {(r.doc_id, r.annotator): r for r in rows}
    noise = {k: (a, m, r) for k, a, m, r in ANNOTATORS}
    for (doc, k), r in by.items():
        a, m, thresh = noise[k]
        if (doc * a) % m < thresh:
            assert r.observed_class != r.true_class
        else:
            assert r.observed_class == r.true_class


def test_confusion_recovers_noise_ordering(spark):
    conf = dawid_skene_confusion(spark, SF).collect()
    # mean diagonal per annotator tracks the planted noise rates
    # (2/11 < 2/7 < 2/5 -> annotator 1 cleanest, 3 noisiest)
    diag = {}
    for k in (1, 2, 3):
        cells = [r.p_conf for r in conf if r.annotator == k
                 and r.true_class == r.observed_class]
        diag[k] = sum(cells) / len(cells)
    assert diag[1] > diag[2] > diag[3]
    assert diag[1] > 0.6  # strongly diagonal for the cleanest annotator
    # every row is a probability; rows sum to ~1 per (annotator, class)
    from collections import defaultdict
    sums = defaultdict(float)
    for r in conf:
        assert 0.0 <= r.p_conf <= 1.0
        sums[(r.annotator, r.true_class)] += r.p_conf
    assert all(abs(s - 1.0) < 1e-3 for s in sums.values())
