"""Thirteenth-wave storage-layout / metastore operators.

- ANALYZE-style table statistics (per-column null counts, distincts,
  min/max, average length — the metastore stats CBOs feed on),
- Z-order layout keys: bit-interleaved (partkey, suppkey) clustering
  keys with per-bucket locality evidence — the lakehouse
  OPTIMIZE-ZORDER data-layout op, shown to actually co-locate both
  dimensions,
- salted two-stage aggregation under the oracle gate: the skew-defense
  (operators/skew.py, pytest-proven in round 2) recomputed as a
  registered query whose oracle is the PLAIN GROUP BY — hash parity is
  the transparency proof that salting never changes results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.plans.registry import query

#: z-order: bits per dimension and bucket shift
Z_BITS = 16
Z_BUCKET_SHIFT = 24  # 2^32 key space -> 256 buckets

#: salting fan-out for the salted aggregation
SALT_N = 8


# ---------------------------------------------------------------------------
# ANALYZE-style table statistics
# ---------------------------------------------------------------------------

@query(
    "table_stats_documents",
    oracle="""
WITH a AS (
  SELECT count(*) AS n,
         sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS null_text,
         count(DISTINCT lang) AS nd_lang,
         count(DISTINCT source) AS nd_source,
         CAST(min(n_chars) AS BIGINT) AS min_chars,
         CAST(max(n_chars) AS BIGINT) AS max_chars,
         round(CAST(sum(CAST(length(text) AS DECIMAL(18,0))) AS DOUBLE)
               / count(*), 4) AS avg_text_len
  FROM documents
)
SELECT CAST(n AS BIGINT) AS n_rows,
       CAST(null_text AS BIGINT) AS null_text,
       CAST(nd_lang AS BIGINT) AS nd_lang,
       CAST(nd_source AS BIGINT) AS nd_source,
       min_chars, max_chars, avg_text_len
FROM a
""",
    tags=("warehouse", "stats", "metastore"),
)
def table_stats_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style table statistics for the documents table: row
    count, per-column null counts, distinct cardinalities, min/max and
    mean text length — the metastore profile a cost-based optimizer
    (and a data catalog page) consumes. Length sums route through
    DECIMAL so the mean is bit-stable.

    Scale shape: ONE scan, one aggregate row; the two count-distincts
    add the standard two-phase exchanges (at 100 TB they would swap to
    approx_count_distinct — the exact forms are the fixture-scale
    audit)."""
    d = load_table(spark, sf_dir, "documents")
    return d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.when(F.col("text").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("null_text"),
        F.count_distinct("lang").cast("bigint").alias("nd_lang"),
        F.count_distinct("source").cast("bigint").alias("nd_source"),
        F.min("n_chars").cast("bigint").alias("min_chars"),
        F.max("n_chars").cast("bigint").alias("max_chars"),
        F.round(
            F.sum(F.length("text").cast("decimal(18,0)")).cast("double")
            / F.count(F.lit(1)),
            4,
        ).alias("avg_text_len"),
    )


# ---------------------------------------------------------------------------
# Z-order layout keys
# ---------------------------------------------------------------------------

def _interleave_sql(x: str, y: str) -> str:
    terms = []
    for i in range(Z_BITS):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


@query(
    "zorder_layout_keys",
    oracle=f"""
WITH mm AS (
  SELECT min(l_partkey) AS pmn, max(l_partkey) AS pmx,
         min(l_suppkey) AS smn, max(l_suppkey) AS smx
  FROM lineitem
), k AS (
  SELECT ((l_partkey - mm.pmn) * {(1 << Z_BITS) - 1}) // (mm.pmx - mm.pmn)
           AS x,
         ((l_suppkey - mm.smn) * {(1 << Z_BITS) - 1}) // (mm.smx - mm.smn)
           AS y
  FROM lineitem CROSS JOIN mm
), z AS (
  SELECT x, y, ({_interleave_sql('x', 'y')}) >> {Z_BUCKET_SHIFT} AS bucket
  FROM k
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(min(x) AS BIGINT) AS min_part, CAST(max(x) AS BIGINT) AS max_part,
       CAST(min(y) AS BIGINT) AS min_supp, CAST(max(y) AS BIGINT) AS max_supp
FROM z GROUP BY 1
""",
    tags=("layout", "zorder", "lakehouse"),
)
def zorder_layout_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout keys: min-max scale (partkey, suppkey)
    into the 16-bit grid (exact integer arithmetic — (v-mn)*65535 div
    span, identical on both engines) and bit-interleave them into one
    clustering key — the lakehouse OPTIMIZE-ZORDER layout op — then
    report per-bucket row counts plus BOTH dimensions' min/max. The
    narrow per-bucket ranges in both columns are the evidence that one
    sort key co-locates two filter dimensions at once (each bucket
    covers ~1/16 of each dimension's range, vs. all of one dimension
    under a single-column sort) — i.e. the file-skipping win Z-ordering
    exists for, measured in-query.

    Scale shape: the key is pure per-row bit arithmetic (32 shifts+ands
    inside whole-stage codegen, zero UDFs) after a scalar min/max
    pre-pass (loop-control collect), one hash aggregate to 256
    buckets. In production the sort-by-zkey write follows; the key
    computation shown here is the entire CPU cost added to the write."""
    li = load_table(spark, sf_dir, "lineitem")
    mm = li.agg(
        F.min("l_partkey").alias("pmn"),
        F.max("l_partkey").alias("pmx"),
        F.min("l_suppkey").alias("smn"),
        F.max("l_suppkey").alias("smx"),
    ).first()
    top = (1 << Z_BITS) - 1
    x = F.expr(
        f"CAST(((l_partkey - {mm['pmn']}) * {top})"
        f" DIV {mm['pmx'] - mm['pmn']} AS BIGINT)"
    ).alias("x")
    y = F.expr(
        f"CAST(((l_suppkey - {mm['smn']}) * {top})"
        f" DIV {mm['smx'] - mm['smn']} AS BIGINT)"
    ).alias("y")
    k = li.select(x, y)
    zkey = None
    for i in range(Z_BITS):
        xb = F.shiftleft(F.shiftright(F.col("x"), i).bitwiseAND(1), 2 * i)
        yb = F.shiftleft(
            F.shiftright(F.col("y"), i).bitwiseAND(1), 2 * i + 1
        )
        zkey = xb + yb if zkey is None else zkey + xb + yb
    z = k.select("x", "y", F.shiftright(zkey, Z_BUCKET_SHIFT).alias("bucket"))
    return z.groupBy(F.col("bucket").cast("bigint").alias("bucket")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.min("x").cast("bigint").alias("min_part"),
        F.max("x").cast("bigint").alias("max_part"),
        F.min("y").cast("bigint").alias("min_supp"),
        F.max("y").cast("bigint").alias("max_supp"),
    )


# ---------------------------------------------------------------------------
# Salted aggregation under the oracle gate
# ---------------------------------------------------------------------------

@query(
    "salted_event_type_counts",
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 2)
         AS total_value
FROM events GROUP BY 1
""",
    tags=("skew", "aggregation", "scalepath"),
)
def salted_event_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage SALTED aggregation whose oracle is the PLAIN GROUP BY:
    stage 1 aggregates on (event_type, salt) — spreading any hot key
    over {N} reducers — stage 2 merges the {N} partials per key. Hash
    parity against the unsalted SQL is the transparency proof the skew
    defense needs: salting changes the exchange geometry, never the
    numbers (DECIMAL partials keep the merged sums exact under any
    combination order).

    Scale shape: the first exchange carries (key, salt) — a hot key's
    rows split {N} ways instead of landing on one reducer; the second
    exchange moves only |keys| x {N} partial rows. This registers the
    operators/skew.py pattern (pytest-proven round 2) under the
    driver's oracle gate."""
    ev = load_table(spark, sf_dir, "events")
    salted = ev.withColumn(
        "__salt", (F.col("event_id") % SALT_N).cast("int")
    )
    partial = salted.groupBy("event_type", "__salt").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("__s"),
    )
    return partial.groupBy("event_type").agg(
        F.sum("__n").cast("bigint").alias("n_events"),
        F.round(F.sum("__s").cast("double"), 2).alias("total_value"),
    )
