"""Wave-48 semantic invariants (savings report): the composition must
agree with the queries it summarizes."""

from __future__ import annotations

from atlassian_confluence_data_pipeline_spark.plans import QUERIES


def _rows(spark, sf_dir, name):
    return QUERIES[name].fn(spark, sf_dir).collect()


def test_savings_report_agrees_with_component_queries(spark, sf_dir):
    r = _rows(spark, sf_dir, "curation_savings_report")[0]
    # exact side vs exact_dedup_docs: removable = sum(n_copies - 1)
    exact = _rows(spark, sf_dir, "exact_dedup_docs")
    removable = sum(e["n_copies"] - 1 for e in exact)
    assert r["exact_removable_docs"] == removable
    # near-dup side vs the pair query itself
    pairs = _rows(spark, sf_dir, "near_dup_pairs_lsh")
    assert r["neardup_pairs"] == len(pairs)
    affected = {p["doc_a"] for p in pairs} | {p["doc_b"] for p in pairs}
    assert r["neardup_affected_docs"] == len(affected)
    # shares are consistent probabilities
    assert 0.0 <= r["exact_char_share"] < 1.0
    assert 0.0 <= r["neardup_doc_share"] <= 1.0
    assert r["exact_removable_chars"] <= r["total_chars"]
