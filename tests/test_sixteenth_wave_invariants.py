"""Structural invariants of the sixteenth wave: DBSCAN clustering."""

from __future__ import annotations

from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.plans import QUERIES


def test_dbscan_partitions_corpus_and_roles_consistent(spark, sf_dir):
    df = QUERIES["dbscan_embedding_clusters"].fn(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    assert df.count() == emb.count()
    roles = {r["role"] for r in df.select("role").distinct().collect()}
    assert roles <= {"core", "border", "noise"}
    assert "core" in roles and "noise" in roles
    # noise has cluster -1; clustered points have a valid rep
    assert df.filter(
        (F.col("role") == "noise") & (F.col("cluster") != -1)
    ).count() == 0
    assert df.filter(
        (F.col("role") != "noise") & (F.col("cluster") < 0)
    ).count() == 0
    # every cluster's representative is one of its own CORE members
    reps = (
        df.filter(F.col("role") == "core")
        .groupBy("cluster")
        .agg(F.min("vec_id").alias("mn"))
    )
    assert reps.filter(F.col("cluster") != F.col("mn")).count() == 0
    # border points never form their own cluster: every border cluster
    # id is also a core cluster id
    core_clusters = {
        r["cluster"]
        for r in df.filter(F.col("role") == "core")
        .select("cluster")
        .distinct()
        .collect()
    }
    border_clusters = {
        r["cluster"]
        for r in df.filter(F.col("role") == "border")
        .select("cluster")
        .distinct()
        .collect()
    }
    assert border_clusters <= core_clusters
