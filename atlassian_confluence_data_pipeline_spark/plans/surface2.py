"""Second-wave surface queries: map functions, array sorting/slicing,
the remaining string functions, and a table-profiling job (the
data-quality sweep a training-data pipeline runs before ingestion).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.plans.registry import query


@query(
    "map_ops_events",
    oracle="""
SELECT event_id, 'k' AS key, CAST(json_extract_string(props, '$.k') AS INT) AS val
FROM events WHERE event_id < 500
UNION ALL
SELECT event_id, 'seq' AS key, CAST(event_id % 10 AS INT) AS val
FROM events WHERE event_id < 500
""",
    tags=("map", "json", "explode"),
)
def map_ops_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-column surface: parse props into MAP<STRING,INT>
    (`from_json`), `map_concat` a derived entry, explode entries back to
    rows. The oracle enumerates the same entries relationally."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    parsed = F.from_json("props", T.MapType(T.StringType(), T.IntegerType()))
    extended = F.map_concat(
        parsed,
        F.create_map(F.lit("seq"), (F.col("event_id") % 10).cast("int")),
    )
    return ev.select(
        "event_id", F.explode(extended).alias("key", "val")
    )


@query(
    "embedding_sorted_stats",
    oracle="""
SELECT vec_id,
       round(list_sort(embedding::DOUBLE[], 'DESC')[1], 6) AS top1,
       round(list_sort(embedding::DOUBLE[], 'DESC')[2], 6) AS top2,
       round(list_sort(embedding::DOUBLE[], 'DESC')[3], 6) AS top3,
       round(list_sort(embedding::DOUBLE[])[1], 6) AS bottom1
FROM embeddings WHERE vec_id < 50
""",
    tags=("array", "sort", "vector"),
)
def embedding_sorted_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """array_sort + element extraction: the 3 largest and the smallest
    embedding components per vector (the array-surface complement of
    array_max in embedding_array_ops)."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 50)
    xd = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    desc = F.reverse(F.array_sort(xd))
    return emb.select(
        "vec_id",
        F.round(F.element_at(desc, 1), 6).alias("top1"),
        F.round(F.element_at(desc, 2), 6).alias("top2"),
        F.round(F.element_at(desc, 3), 6).alias("top3"),
        F.round(F.element_at(F.array_sort(xd), 1), 6).alias("bottom1"),
    )


@query(
    "string_ops_parts",
    oracle="""
SELECT p_partkey,
       upper(p_name) AS name_upper,
       reverse(p_name) AS name_rev,
       lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS key_padded,
       repeat('*', CAST(p_size % 5 AS INT)) AS size_stars,
       CAST(strpos(p_name, ' ') AS INT) AS space_pos,
       substr(p_name, 1, 4) AS name_head,
       CAST(length(p_name) AS INT) AS name_len
FROM part WHERE p_partkey < 500
""",
    tags=("scalar", "string"),
)
def string_ops_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining string-function surface: case fold, reverse, pad,
    repeat, position, substring, length — all codegen'd built-ins."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 500)
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.reverse(F.col("p_name")).alias("name_rev"),
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("key_padded"),
        F.repeat(F.lit("*"), (F.col("p_size") % 5).cast("int")).alias("size_stars"),
        F.instr(F.col("p_name"), " ").cast("int").alias("space_pos"),
        F.substring("p_name", 1, 4).alias("name_head"),
        F.length("p_name").cast("int").alias("name_len"),
    )


@query(
    "profile_orders",
    oracle="""
SELECT 'o_orderkey' AS column_name,
       count(*) AS n_rows,
       count(o_orderkey) AS n_non_null,
       count(DISTINCT o_orderkey) AS n_distinct,
       CAST(min(o_orderkey) AS DOUBLE) AS min_val,
       CAST(max(o_orderkey) AS DOUBLE) AS max_val
FROM orders
UNION ALL
SELECT 'o_custkey', count(*), count(o_custkey), count(DISTINCT o_custkey),
       CAST(min(o_custkey) AS DOUBLE), CAST(max(o_custkey) AS DOUBLE)
FROM orders
UNION ALL
SELECT 'o_totalprice', count(*), count(o_totalprice), count(DISTINCT o_totalprice),
       round(min(o_totalprice), 2), round(max(o_totalprice), 2)
FROM orders
""",
    tags=("profile", "quality", "agg"),
)
def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table profiling (the pre-ingestion data-quality sweep): per-column
    rows / non-nulls / distincts / min / max in ONE scan — the per-column
    aggregates run as a single multi-aggregate pass, then pivot to long
    form (vs the oracle's three scans)."""
    orders = load_table(spark, sf_dir, "orders")
    agg = orders.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("o_orderkey").alias("nn_key"),
        F.countDistinct("o_orderkey").alias("nd_key"),
        F.min("o_orderkey").cast("double").alias("min_key"),
        F.max("o_orderkey").cast("double").alias("max_key"),
        F.count("o_custkey").alias("nn_cust"),
        F.countDistinct("o_custkey").alias("nd_cust"),
        F.min("o_custkey").cast("double").alias("min_cust"),
        F.max("o_custkey").cast("double").alias("max_cust"),
        F.count("o_totalprice").alias("nn_price"),
        F.countDistinct("o_totalprice").alias("nd_price"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )
    rows = [
        ("o_orderkey", "nn_key", "nd_key", "min_key", "max_key"),
        ("o_custkey", "nn_cust", "nd_cust", "min_cust", "max_cust"),
        ("o_totalprice", "nn_price", "nd_price", "min_price", "max_price"),
    ]
    parts = [
        agg.select(
            F.lit(name).alias("column_name"),
            F.col("n_rows"),
            F.col(nn).alias("n_non_null"),
            F.col(nd).alias("n_distinct"),
            F.col(mn).alias("min_val"),
            F.col(mx).alias("max_val"),
        )
        for name, nn, nd, mn, mx in rows
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
