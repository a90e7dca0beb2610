"""Wave-29 semantic invariants (distribution alignment / corpus
planning): properties the oracle hash can't see — rank-mapping
bijectivity, margin convergence, allocation optimality shape."""

from __future__ import annotations

import math

from atlassian_confluence_data_pipeline_spark.plans import QUERIES


def _rows(spark, sf_dir, name):
    return QUERIES[name].fn(spark, sf_dir).collect()


def test_quantile_normalize_preserves_within_source_order(spark, sf_dir):
    """Normalization is monotone within each source, lands on values
    that exist in the pooled corpus, and the extreme ranks map to the
    pooled extremes."""
    rows = _rows(spark, sf_dir, "quantile_normalize_chars")
    assert rows
    pooled = sorted(r["raw_chars"] for r in rows)
    pooled_set = set(pooled)
    by_src: dict[str, list] = {}
    for r in rows:
        assert r["norm_chars"] in pooled_set
        by_src.setdefault(r["source"], []).append(r)
    tops = set()
    for src, rs in by_src.items():
        rs.sort(key=lambda r: (r["raw_chars"], r["doc_id"]))
        norms = [r["norm_chars"] for r in rs]
        assert norms == sorted(norms), f"non-monotone mapping in {src}"
        tops.add(norms[-1])
    # the max-rank doc of EVERY source maps to the pooled maximum
    assert tops == {pooled[-1]}


def test_heaps_law_plausible_exponent(spark, sf_dir):
    r = _rows(spark, sf_dir, "heaps_law_fit")[0]
    assert r["n_points"] > 0
    # vocabulary grows, sublinearly: 0 < beta < 1 for natural-ish text
    assert 0.0 < r["beta"] < 1.0
    assert 0.0 <= r["r2"] <= 1.0
    # the fitted curve reproduces V at the corpus scale within 2x
    from atlassian_confluence_data_pipeline_spark.catalog import load_table
    from atlassian_confluence_data_pipeline_spark.plans.textops import _words
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    n = docs.select(F.sum(F.size(_words(F.col("text"))))).first()[0]
    v = (
        docs.select(F.explode(_words(F.col("text"))).alias("w"))
        .distinct()
        .count()
    )
    v_hat = math.exp(r["log_k"]) * n ** r["beta"]
    assert 0.5 < v_hat / v < 2.0


def test_neyman_allocation_sums_to_budget(spark, sf_dir):
    rows = _rows(spark, sf_dir, "neyman_allocation")
    assert rows
    share = sum(r["alloc_share"] for r in rows)
    assert abs(share - 1.0) < 1e-3
    total = sum(r["n_alloc"] for r in rows)
    # per-stratum rounding drifts by at most half a draw per stratum
    assert abs(total - 100_000) <= len(rows)
    for r in rows:
        assert r["std_chars"] > 0
        assert r["n_alloc"] >= 0


def test_ipf_margins_converge(spark, sf_dir):
    """After two full rounds the language margin is EXACT (last scaling
    was the column pass) and the source margin is close to uniform;
    weights conserve total mass."""
    rows = _rows(spark, sf_dir, "ipf_raking_mixture")
    assert rows
    total_docs = sum(r["n_docs"] for r in rows)
    n_src = len({r["source"] for r in rows})
    by_lang: dict[str, float] = {}
    lang_docs: dict[str, int] = {}
    for r in rows:
        by_lang[r["lang"]] = by_lang.get(r["lang"], 0.0) + r["weight"]
        lang_docs[r["lang"]] = lang_docs.get(r["lang"], 0) + r["n_docs"]
        assert r["weight"] > 0
        assert 0.0 <= r["row_rel_err"] < 0.5
    for lang, w in by_lang.items():
        assert abs(w - lang_docs[lang]) < 1e-3 * max(1, lang_docs[lang])
    # total mass preserved (both margins sum to the corpus size)
    assert abs(sum(by_lang.values()) - total_docs) < 1.0
    # source margin pulled toward uniform: worst row_rel_err beats the
    # raw imbalance unless the grid has structural zeros
    target = total_docs / n_src
    raw_err = max(
        abs(
            sum(r["n_docs"] for r in rows if r["source"] == s) / target - 1
        )
        for s in {r["source"] for r in rows}
    )
    fit_err = max(r["row_rel_err"] for r in rows)
    assert fit_err <= raw_err + 1e-6
