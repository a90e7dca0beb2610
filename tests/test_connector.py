"""Custom Python DataSource connector: filter-pushdown absorption,
pagination partitioning, and end-to-end read correctness."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual, StringStartsWith

from atlassian_confluence_data_pipeline_spark.sources.confluence_source import (
    PAGE_BATCH,
    ConfluenceFixtureReader,
    register,
)


def test_reader_absorbs_supported_filters():
    reader = ConfluenceFixtureReader({"n_pages": "500", "n_spaces": "4"})
    remaining = list(
        reader.pushFilters(
            [
                EqualTo(("space_key",), "SPACE_1"),
                GreaterThanOrEqual(("version",), 3),
                StringStartsWith(("title",), "Page 1"),  # unsupported
            ]
        )
    )
    # supported predicates absorbed; unsupported handed back to Spark
    assert reader.space_eq == "SPACE_1"
    assert reader.version_bounds == [("GreaterThanOrEqual", 3)]
    assert len(remaining) == 1 and isinstance(remaining[0], StringStartsWith)


def test_partitions_follow_pagination():
    reader = ConfluenceFixtureReader({"n_pages": "250"})
    parts = reader.partitions()
    assert len(parts) == 3  # ceil(250/100) — the reference's limit=100 pages
    assert (parts[0].start, parts[0].end) == (0, PAGE_BATCH)
    assert (parts[2].start, parts[2].end) == (200, 250)


def test_page_throttle_rate_limits_requests(spark):
    """page_throttle_ms models the reference's time.sleep(0.5) per page
    request: with a 150 ms delay on each of 2 partition-batches the scan
    must take at least one delay of wall clock (partitions run in
    parallel), and results are unchanged."""
    import time

    register(spark)
    base = (
        spark.read.format("confluence_pages")
        .option("n_pages", 200)
        .option("n_spaces", 3)
    )
    t0 = time.monotonic()
    n = base.option("page_throttle_ms", 150).load().count()
    elapsed = time.monotonic() - t0
    assert n == 200
    assert elapsed >= 0.15


def test_end_to_end_read_and_filters(spark):
    register(spark)
    df = (
        spark.read.format("confluence_pages")
        .option("n_pages", 300)
        .option("n_spaces", 3)
        .load()
    )
    assert df.count() == 300
    one_space = df.filter(F.col("space_key") == "SPACE_0")
    assert one_space.count() == 100  # every 3rd page
    # residual (non-pushable) predicate still applied by Spark
    titled = df.filter(F.col("title") == "Page 42").collect()
    assert len(titled) == 1 and titled[0]["space_key"] == "SPACE_0"
    # pushed range semantics match engine-side evaluation
    v = df.filter((F.col("version") >= 3) & (F.col("version") < 5))
    assert v.count() == sum(1 for i in range(300) if 3 <= i % 7 + 1 < 5)
