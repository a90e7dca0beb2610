"""Wave-36 semantic invariants (retrieval metrics & rank correlation):
metric bounds, DCG algebra, and Spearman's relation to Pearson."""

from __future__ import annotations

import math

from atlassian_confluence_data_pipeline_spark.plans import QUERIES


def _rows(spark, sf_dir, name):
    return QUERIES[name].fn(spark, sf_dir).collect()


def test_ndcg_bounds_and_dcg_algebra(spark, sf_dir):
    rows = _rows(spark, sf_dir, "ndcg_label_retrieval")
    assert len(rows) == 10
    for r in rows:
        assert 0 <= r["n_hits"] <= 10
        assert 0.0 <= r["ndcg"] <= 1.0 + 1e-9
        assert 0.0 <= r["reciprocal_rank"] <= 1.0
        # dcg bounded by the ideal prefix of the same length
        idcg_10 = sum(1.0 / math.log2(i + 1) for i in range(1, 11))
        assert r["dcg"] <= idcg_10 + 1e-6
        # rr > 0 iff there is at least one hit
        assert (r["reciprocal_rank"] > 0) == (r["n_hits"] > 0)
        assert r["n_relevant"] > 0


def test_ndcg_consistent_with_cosine_topk(spark, sf_dir):
    """The rank-1 neighbor from cosine_topk determines each query's
    reciprocal-rank lower bound: if that neighbor shares the label,
    rr == 1."""
    from atlassian_confluence_data_pipeline_spark.catalog import load_table

    top = QUERIES["cosine_topk"].fn(spark, sf_dir).collect()
    labels = {
        r["vec_id"]: r["label"]
        for r in load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "label")
        .collect()
    }
    rr = {
        r["query_id"]: r["reciprocal_rank"]
        for r in _rows(spark, sf_dir, "ndcg_label_retrieval")
    }
    for t in top:
        if t["rank"] == 1:
            if labels[t["neighbor_id"]] == labels[t["query_id"]]:
                assert rr[t["query_id"]] == 1.0


def test_spearman_in_range_and_matches_scipy_free_recompute(
    spark, sf_dir
):
    """|rho| <= 1, and a direct pandas mid-rank recompute agrees."""
    from atlassian_confluence_data_pipeline_spark.catalog import load_table
    from pyspark.sql import functions as F

    r = _rows(spark, sf_dir, "spearman_qty_price")[0]
    assert -1.0 <= r["spearman_rho"] <= 1.0
    pdf = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.round(F.col("l_quantity") * 100).cast("bigint").alias("x"),
            F.round(F.col("l_extendedprice") * 100)
            .cast("bigint")
            .alias("y"),
        )
        .toPandas()
    )
    rx = pdf["x"].rank(method="average")
    ry = pdf["y"].rank(method="average")
    want = rx.corr(ry)
    assert abs(want - r["spearman_rho"]) < 1e-4
