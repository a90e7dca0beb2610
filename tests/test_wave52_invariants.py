"""Round-7 second wave invariants: intra-doc repetition scores and
deterministic shard assignment."""

from __future__ import annotations

from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.plans import QUERIES
from atlassian_confluence_data_pipeline_spark.plans.curation7 import N_SHARDS


def test_repetition_scores_bounds_and_identities(spark, sf_dir):
    df = QUERIES["doc_repetition_scores"].fn(spark, sf_dir)
    bad = df.filter(
        (F.col("n_distinct") > F.col("n_grams"))
        | (F.col("top_count") < 1)
        | (F.col("dup_frac") < 0)
        | (F.col("dup_frac") > 1)
        | (F.col("top_share") <= 0)
        | (F.col("top_share") > 1)
        | (F.col("top_count") > F.col("n_grams"))
    )
    assert bad.count() == 0
    # every doc long enough to shingle appears exactly once
    docs = load_table(spark, sf_dir, "documents")
    n_shingleable = docs.filter(
        F.size(F.split(F.trim("text"), r"\s+")) >= 3
    ).count()
    assert df.count() == n_shingleable


def test_repetition_scores_on_crafted_looping_doc(spark, tmp_path):
    """'a b c' repeated 3x: 7 positional 3-grams over 3 distinct ->
    dup_frac 4/7, top_share 3/7 — checked to the rounded digit."""
    out = tmp_path / "sf_rep"
    out.mkdir()
    spark.createDataFrame(
        [(1, "a b c a b c a b c"), (2, "all distinct words here now")],
        "doc_id bigint, text string",
    ).write.parquet(str(out / "documents.parquet"))
    rows = {
        r["doc_id"]: r
        for r in QUERIES["doc_repetition_scores"].fn(spark, str(out)).collect()
    }
    r1 = rows[1]
    assert (r1["n_grams"], r1["n_distinct"], r1["top_count"]) == (7, 3, 3)
    assert r1["dup_frac"] == round(1 - 3 / 7, 6)
    assert r1["top_share"] == round(3 / 7, 6)
    r2 = rows[2]
    assert r2["dup_frac"] == 0.0 and r2["top_count"] == 1


def test_shard_assignment_partitions_and_balances(spark, sf_dir):
    df = QUERIES["shard_assignment"].fn(spark, sf_dir)
    rows = df.collect()
    docs = load_table(spark, sf_dir, "documents")
    assert sum(r["n_docs"] for r in rows) == docs.count()
    assert all(0 <= r["shard_id"] < N_SHARDS for r in rows)
    # token-weighted mean load factor is 1 by construction
    total = sum(r["n_tokens"] for r in rows)
    mean_lf = sum(r["n_tokens"] * N_SHARDS / total for r in rows) / len(rows)
    assert abs(mean_lf * len(rows) / N_SHARDS - 1.0) < 1e-9
    # deterministic: a second build yields the identical report
    again = {
        r["shard_id"]: (r["n_docs"], r["n_tokens"])
        for r in QUERIES["shard_assignment"].fn(spark, sf_dir).collect()
    }
    assert again == {r["shard_id"]: (r["n_docs"], r["n_tokens"]) for r in rows}
