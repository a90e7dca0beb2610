"""Wave-37 semantic invariants (stylometry & readability): metric
algebra, distance-matrix properties, and length-invariance."""

from __future__ import annotations

from atlassian_confluence_data_pipeline_spark.plans import QUERIES


def _rows(spark, sf_dir, name):
    return QUERIES[name].fn(spark, sf_dir).collect()


def test_readability_ratio_algebra(spark, sf_dir):
    rows = _rows(spark, sf_dir, "readability_scores")
    assert rows
    for r in rows:
        assert r["n_docs"] > 0
        assert r["words_per_sentence"] > 0
        # every word has at least ~one vowel group in this alphabet
        assert 0.2 < r["syllables_per_word"] < 10
        # flesch is bounded by its own formula at the observed ratios
        upper = 206.835 - 1.015 * 1 - 84.6 * 0.2
        assert r["avg_flesch"] < upper


def test_burrows_delta_is_a_semimetric(spark, sf_dir):
    rows = _rows(spark, sf_dir, "burrows_delta_sources")
    srcs = {r["source_a"] for r in rows} | {r["source_b"] for r in rows}
    g = len(srcs)
    assert len(rows) == g * (g - 1) // 2
    for r in rows:
        assert r["delta"] >= 0
        assert r["source_a"] < r["source_b"]
    # non-degenerate: sources differ in style somewhere
    assert max(r["delta"] for r in rows) > 0


def test_yule_k_identity_and_bounds(spark, sf_dir):
    """K recomputes from a direct frequency-spectrum build; all-
    distinct vocabulary gives K ~ 0, total repetition gives K ~ 1e4."""
    from pyspark.sql import functions as F

    from atlassian_confluence_data_pipeline_spark.catalog import load_table
    from atlassian_confluence_data_pipeline_spark.plans.textops import _words

    rows = _rows(spark, sf_dir, "yule_k_by_source")
    assert rows
    docs = load_table(spark, sf_dir, "documents")
    one = rows[0]
    wc = (
        docs.filter(F.col("source") == one["source"])
        .select(F.explode(_words(F.col("text"))).alias("w"))
        .groupBy("w")
        .count()
        .collect()
    )
    n = sum(r["count"] for r in wc)
    sm2 = sum(r["count"] ** 2 for r in wc)
    want = 10000 * (sm2 - n) / (n * n)
    assert abs(want - one["yule_k"]) < 1e-3
    for r in rows:
        assert 0 <= r["yule_k"] < 10000
        assert r["n_types"] <= r["n_tokens"]
