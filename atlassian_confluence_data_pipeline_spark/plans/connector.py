"""Query over the custom Python DataSource connector (Phase 7): the
reference's paginated REST space-scan with pushed predicates, as a
first-class Spark source. The DuckDB oracle regenerates the connector's
deterministic corpus arithmetically, so even the custom-connector path
is value-hash-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.plans.registry import query
from atlassian_confluence_data_pipeline_spark.sources.confluence_source import (
    register,
)

N_PAGES, N_SPACES = 2000, 5


@query(
    "connector_space_scan",
    oracle=f"""
WITH pages AS (
  SELECT CAST(i AS VARCHAR) AS id,
         'SPACE_' || CAST(i % {N_SPACES} AS VARCHAR) AS space_key,
         CAST(i % 7 + 1 AS INT) AS version,
         TIMESTAMP '2025-01-01' + to_days(CAST(i % 365 AS INT)) AS last_modified
  FROM range(0, {N_PAGES}) t(i)
)
SELECT date_trunc('month', last_modified) AS month_start,
       count(*) AS n_pages,
       CAST(sum(version) AS BIGINT) AS total_version
FROM pages
WHERE space_key = 'SPACE_2' AND version >= 3
GROUP BY 1
""",
    tags=("connector", "datasource", "pushdown"),
)
def connector_space_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Space scan through the custom connector: the space-key equality
    and version range push into the source (the reference's spaceKey
    query param + CQL, confluence_client.py:299-304,:377); pagination
    becomes parallel 100-page partitions instead of a sequential
    throttled request loop. (sf_dir unused — the connector IS the
    source; options pin the corpus.)"""
    register(spark)
    pages = (
        spark.read.format("confluence_pages")
        .option("n_pages", N_PAGES)
        .option("n_spaces", N_SPACES)
        .load()
    )
    return (
        pages.filter((F.col("space_key") == "SPACE_2") & (F.col("version") >= 3))
        .groupBy(F.date_trunc("month", "last_modified").alias("month_start"))
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.sum("version").cast("bigint").alias("total_version"),
        )
    )
