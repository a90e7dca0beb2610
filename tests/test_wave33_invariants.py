"""Wave-33 semantic invariants (embedding-space evaluation):
cross-query consistency between the confusion matrix, silhouette, and
Fisher ratios, plus conservation identities."""

from __future__ import annotations

from atlassian_confluence_data_pipeline_spark.plans import QUERIES


def _rows(spark, sf_dir, name):
    return QUERIES[name].fn(spark, sf_dir).collect()


def test_confusion_conserves_vectors(spark, sf_dir):
    from atlassian_confluence_data_pipeline_spark.catalog import load_table

    rows = _rows(spark, sf_dir, "centroid_classifier_confusion")
    assert rows
    total = sum(r["n_vectors"] for r in rows)
    n_vecs = load_table(spark, sf_dir, "embeddings").count()
    assert total == n_vecs
    # per-true-label row sums match label counts
    from pyspark.sql import functions as F

    label_counts = {
        r["label"]: r["n"]
        for r in load_table(spark, sf_dir, "embeddings")
        .groupBy(F.col("label").cast("int").alias("label"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    by_true: dict[int, int] = {}
    for r in rows:
        by_true[r["true_label"]] = (
            by_true.get(r["true_label"], 0) + r["n_vectors"]
        )
    assert by_true == label_counts


def test_silhouette_agrees_with_confusion_diagonal(spark, sf_dir):
    """A vector classified to a FOREIGN centroid has negative
    silhouette (b < a), so per label: n_negative == misclassified
    count, up to ties at s == 0."""
    conf = _rows(spark, sf_dir, "centroid_classifier_confusion")
    sil = {r["label"]: r for r in _rows(spark, sf_dir, "centroid_silhouette_by_label")}
    miss: dict[int, int] = {}
    for r in conf:
        if r["true_label"] != r["pred_label"]:
            miss[r["true_label"]] = (
                miss.get(r["true_label"], 0) + r["n_vectors"]
            )
    for lab, s in sil.items():
        assert -1.0 <= s["avg_silhouette"] <= 1.0
        assert s["n_negative"] == miss.get(lab, 0)


def test_fisher_ratio_decomposition(spark, sf_dir):
    """Between + within variances are non-negative; the ratio
    reproduces from the published parts; 64 dims reported once each."""
    rows = _rows(spark, sf_dir, "fisher_ratio_by_dim")
    assert len(rows) == 64
    assert len({r["dim"] for r in rows}) == 64
    for r in rows:
        assert r["between_var"] >= 0
        assert r["within_var"] > 0
        want = r["between_var"] / r["within_var"]
        assert abs(want - r["fisher_ratio"]) < 1e-3 * max(1.0, want)
