"""Round-7 third wave invariants: cross-shard dup leakage and packing
source adjacency."""

from __future__ import annotations

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.plans import QUERIES


def test_cross_shard_leakage_counts_the_minhash_pairs(spark, sf_dir):
    r = QUERIES["cross_shard_dup_leakage"].fn(spark, sf_dir).first()
    n_pairs = QUERIES["minhash_lsh_pairs"].fn(spark, sf_dir).count()
    assert r["n_dup_pairs"] == n_pairs
    assert 0 <= r["n_cross_shard"] <= r["n_dup_pairs"]
    if r["n_dup_pairs"]:
        assert r["leakage_rate"] == round(
            r["n_cross_shard"] / r["n_dup_pairs"], 6
        )


def test_packing_source_adjacency_identities(spark, sf_dir):
    r = QUERIES["packing_source_adjacency"].fn(spark, sf_dir).first()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert r["n_adjacent"] == n_docs - 1
    assert r["n_cross_source_contact"] <= r["n_shared_window"] <= r["n_adjacent"]
    assert r["contamination_rate"] == round(
        r["n_cross_source_contact"] / r["n_adjacent"], 6
    )


def test_adjacency_on_crafted_boundary_corpus(spark, tmp_path):
    """Two docs of exactly CTX tokens each from different sources never
    share a window (the cut lands on the boundary); a third shorter doc
    then shares with the second."""
    from atlassian_confluence_data_pipeline_spark.plans.packing import (
        CTX_TOKENS,
    )

    out = tmp_path / "sf_adj"
    out.mkdir()
    full = " ".join(["w"] * CTX_TOKENS)
    spark.createDataFrame(
        [(1, "a", full), (2, "b", full), (3, "a", "short doc here")],
        "doc_id bigint, source string, text string",
    ).write.parquet(str(out / "documents.parquet"))
    r = QUERIES["packing_source_adjacency"].fn(spark, str(out)).first()
    # pair (1,2): boundary-aligned -> no shared window despite a<->b;
    # pair (2,3): doc 2 ends on a boundary too -> no shared window
    assert (r["n_adjacent"], r["n_shared_window"], r["n_cross_source_contact"]) == (2, 0, 0)
    # shift doc 2 off the boundary by one token and the contacts appear
    out2 = tmp_path / "sf_adj2"
    out2.mkdir()
    spark.createDataFrame(
        [(1, "a", full + " x"), (2, "b", full), (3, "a", "short doc here")],
        "doc_id bigint, source string, text string",
    ).write.parquet(str(out2 / "documents.parquet"))
    r2 = QUERIES["packing_source_adjacency"].fn(spark, str(out2)).first()
    assert r2["n_shared_window"] == 2
    assert r2["n_cross_source_contact"] == 2  # a|b and b|a contacts
