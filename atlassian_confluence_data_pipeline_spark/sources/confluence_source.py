"""Custom Python DataSource modeling the reference's live REST connector
(SURVEY.md Phase 7; confluence_client.py:278-465).

The reference scans a remote page store 100 rows per request with
server-side predicates (`spaceKey`, `type=page`, CQL
`lastmodified>=...`). This source renders that shape in Spark's Python
Data Source API:

- **pagination -> partition planning**: one InputPartition per 100-page
  chunk, so a 1M-page space scans as 10k parallel tasks instead of the
  reference's sequential request loop (its 0.5 s/request throttle made
  bulk scans <=200 pages/s; partitions parallelize what the reference
  serialized).
- **server-side predicates -> pushFilters**: equality on `space_key` and
  range predicates on `version` are absorbed by the source exactly like
  the reference's query params / CQL; everything else is left for Spark
  to evaluate.

The 'server' is a deterministic arithmetic corpus (options: n_pages,
n_spaces) so correctness is oracle-checkable — DuckDB regenerates the
same corpus from `range()` (see plans/connector.py).
"""

from __future__ import annotations

from datetime import datetime, timedelta
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)
from pyspark.sql.types import StructType

PAGE_BATCH = 100  # reference pagination: limit=100 (confluence_client.py:294)
EPOCH = datetime(2025, 1, 1)

SCHEMA_DDL = (
    "id string, title string, space_key string, version int, "
    "last_modified timestamp, n_children int"
)


def _page(i: int, n_spaces: int) -> tuple:
    """Deterministic synthetic page — pure arithmetic so any engine can
    regenerate it (the DuckDB oracle does)."""
    return (
        str(i),
        f"Page {i}",
        f"SPACE_{i % n_spaces}",
        i % 7 + 1,
        EPOCH + timedelta(days=i % 365),
        i % 4,
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class ConfluenceFixtureReader(DataSourceReader):
    def __init__(self, options):
        self.n_pages = int(options.get("n_pages", "1000"))
        self.n_spaces = int(options.get("n_spaces", "5"))
        # per-request politeness delay, the reference's time.sleep(0.5)
        # after every page fetch (confluence_client.py:327,346,399,449).
        # Applied once per partition batch (= one 'request'); 0 = off.
        self.page_throttle_ms = int(options.get("page_throttle_ms", "0"))
        self.space_eq: str | None = None
        self.version_bounds: list[tuple[str, int]] = []

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Absorb the predicates the 'server' supports (the reference's
        spaceKey param and CQL version/date ranges); yield the rest back
        to Spark unchanged."""
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("space_key",):
                self.space_eq = f.value
            elif isinstance(
                f, (GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual)
            ) and f.attribute == ("version",):
                self.version_bounds.append((type(f).__name__, f.value))
            else:
                yield f

    def partitions(self):
        return [
            _RangePartition(s, min(s + PAGE_BATCH, self.n_pages))
            for s in range(0, self.n_pages, PAGE_BATCH)
        ]

    def _keep(self, row: tuple) -> bool:
        if self.space_eq is not None and row[2] != self.space_eq:
            return False
        v = row[3]
        for kind, bound in self.version_bounds:
            if kind == "GreaterThan" and not v > bound:
                return False
            if kind == "GreaterThanOrEqual" and not v >= bound:
                return False
            if kind == "LessThan" and not v < bound:
                return False
            if kind == "LessThanOrEqual" and not v <= bound:
                return False
        return True

    def read(self, partition: _RangePartition):
        """Yield ONE Arrow batch per partition (columnar hand-off to the
        JVM — far cheaper than per-row tuple pickling)."""
        import pyarrow as pa

        if self.page_throttle_ms > 0:
            import time

            time.sleep(self.page_throttle_ms / 1000.0)
        rows = [
            row
            for i in range(partition.start, partition.end)
            if self._keep(row := _page(i, self.n_spaces))
        ]
        if not rows:
            return
        cols = list(zip(*rows))
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(cols[0], pa.string()),
                pa.array(cols[1], pa.string()),
                pa.array(cols[2], pa.string()),
                pa.array(cols[3], pa.int32()),
                pa.array(cols[4], pa.timestamp("us")),
                pa.array(cols[5], pa.int32()),
            ],
            names=["id", "title", "space_key", "version", "last_modified", "n_children"],
        )


class ConfluenceFixtureDataSource(DataSource):
    """``spark.read.format("confluence_pages")`` — options: n_pages,
    n_spaces, page_throttle_ms (per-request rate limit; see reader)."""

    @classmethod
    def name(cls) -> str:
        return "confluence_pages"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema: StructType) -> ConfluenceFixtureReader:
        return ConfluenceFixtureReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the source + worker shipping (the
    pickled reader class must be importable on executors)."""
    from atlassian_confluence_data_pipeline_spark.pyfiles import (
        ensure_package_on_workers,
    )

    ensure_package_on_workers(spark)
    # pushFilters support is gated behind a conf (off by default)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(ConfluenceFixtureDataSource)
