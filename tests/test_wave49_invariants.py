"""Wave-49 semantic invariants (distribution distances): Wasserstein
bounds vs KS, and Cramér's V range/recompute."""

from __future__ import annotations

from atlassian_confluence_data_pipeline_spark.plans import QUERIES


def _rows(spark, sf_dir, name):
    return QUERIES[name].fn(spark, sf_dir).collect()


def test_wasserstein_matches_scipy_free_recompute(spark, sf_dir):
    """Recompute W1 directly from the two sorted samples (equal-mass
    quantile coupling) and compare; W1 is bounded by the value range."""
    from pyspark.sql import functions as F

    from atlassian_confluence_data_pipeline_spark.catalog import load_table

    r = _rows(spark, sf_dir, "wasserstein_length_sources")[0]
    docs = load_table(spark, sf_dir, "documents")
    a = sorted(
        x["n_chars"]
        for x in docs.filter(F.col("source") == "src0").collect()
    )
    b = sorted(
        x["n_chars"]
        for x in docs.filter(F.col("source") == "src1").collect()
    )
    assert len(a) == r["n_a"] and len(b) == r["n_b"]
    # integral |F_a - F_b| dx via a merged sweep
    import itertools

    xs = sorted(set(a) | set(b))
    w1 = 0.0
    for x0, x1 in itertools.pairwise(xs):
        fa = sum(1 for v in a if v <= x0) / len(a)
        fb = sum(1 for v in b if v <= x0) / len(b)
        w1 += abs(fa - fb) * (x1 - x0)
    assert abs(w1 - r["wasserstein_chars"]) < 1e-3
    assert 0 <= r["wasserstein_chars"] <= max(xs) - min(xs)


def test_cramers_v_range_and_recompute(spark, sf_dir):
    from pyspark.sql import functions as F

    from atlassian_confluence_data_pipeline_spark.catalog import load_table

    r = _rows(spark, sf_dir, "cramers_v_source_lang")[0]
    assert 0.0 <= r["cramers_v"] <= 1.0
    assert r["chi2"] >= 0.0
    import math

    want_v = math.sqrt(
        r["chi2"] / (r["n_rows"] * (min(r["n_sources"], r["n_langs"]) - 1))
    )
    assert abs(want_v - r["cramers_v"]) < 1e-4
    # direct chi2 recompute over observed cells
    docs = load_table(spark, sf_dir, "documents")
    cells = docs.groupBy("source", "lang").count().collect()
    rt: dict[str, int] = {}
    ct: dict[str, int] = {}
    for c in cells:
        rt[c["source"]] = rt.get(c["source"], 0) + c["count"]
        ct[c["lang"]] = ct.get(c["lang"], 0) + c["count"]
    n = sum(rt.values())
    chi2 = sum(
        (c["count"] - rt[c["source"]] * ct[c["lang"]] / n) ** 2
        / (rt[c["source"]] * ct[c["lang"]] / n)
        for c in cells
    )
    assert abs(chi2 - r["chi2"]) < 1e-3 * max(1.0, chi2)
