"""Wave-39 semantic invariants (stream matching & itemsets): FIFO
conservation laws and itemset support consistency."""

from __future__ import annotations

from atlassian_confluence_data_pipeline_spark.plans import QUERIES


def _rows(spark, sf_dir, name):
    return QUERIES[name].fn(spark, sf_dir).collect()


def test_fifo_matching_conserves_quantity(spark, sf_dir):
    """Matched quantity per part equals min(shipped, returned) exactly
    — the interval construction's conservation law — and segment
    counts obey the interval-partition bound."""
    from pyspark.sql import functions as F

    from atlassian_confluence_data_pipeline_spark.catalog import load_table

    rows = _rows(spark, sf_dir, "fifo_quantity_matching")
    assert rows
    li = load_table(spark, sf_dir, "lineitem")
    tot = {
        (r["l_partkey"], r["l_returnflag"]): r["q"]
        for r in li.filter(F.col("l_returnflag").isin("N", "R"))
        .groupBy("l_partkey", "l_returnflag")
        .agg(
            (F.sum(F.round(F.col("l_quantity") * 100)) / 100).alias("q")
        )
        .collect()
    }
    for r in rows:
        qb = tot.get((r["l_partkey"], "N"), 0.0)
        qs = tot.get((r["l_partkey"], "R"), 0.0)
        assert abs(r["matched_qty"] - min(qb, qs)) < 1e-6
        # two interval partitions of a common prefix overlap in at most
        # n_buys + n_sells - 1 segments
        assert 1 <= r["n_match_segments"] <= r["n_buys"] + r["n_sells"] - 1


def test_brand_triples_support_bounded_by_pairs(spark, sf_dir):
    """Apriori property: a triple's support cannot exceed the support
    of any of its sub-pairs (checked against a direct pair count)."""
    from pyspark.sql import functions as F

    from atlassian_confluence_data_pipeline_spark.catalog import load_table

    rows = _rows(spark, sf_dir, "frequent_brand_triples")
    assert 0 < len(rows) <= 20
    supports = [r["n_orders"] for r in rows]
    assert supports == sorted(supports, reverse=True)
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    ob = (
        li.join(
            F.broadcast(
                p.select(F.col("p_partkey").alias("l_partkey"), "p_brand")
            ),
            "l_partkey",
        )
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    top = rows[0]
    pair = (
        ob.filter(F.col("p_brand") == top["brand_1"])
        .select("l_orderkey")
        .join(
            ob.filter(F.col("p_brand") == top["brand_2"]).select(
                "l_orderkey"
            ),
            "l_orderkey",
        )
        .count()
    )
    assert top["n_orders"] <= pair
    for r in rows:
        assert r["brand_1"] < r["brand_2"] < r["brand_3"]
