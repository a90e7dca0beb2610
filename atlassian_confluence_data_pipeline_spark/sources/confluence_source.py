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

With the ``base_url`` option the same reader becomes a REAL HTTP
client: each partition issues ``GET {base_url}/pages?start=S&limit=N``
(plus pushed-filter params) through :func:`http_fetch_json`, which
reproduces the reference client's retry discipline
(confluence_client.py:113-234) exactly — 3 retries, exponential
backoff ``2s * 2^(n-1) + jitter``, a 5x-delay sleep-then-retry on 429,
retry on 5xx/connection errors/timeouts, immediate raise on other 4xx,
30 s request timeout. The synthetic corpus stays the oracle fixture;
the HTTP path is exercised by tests/test_connector.py against a local
scripted server.
"""

from __future__ import annotations

import json as _json
import random as _random
import time as _time
import urllib.error
import urllib.request
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
    SimpleDataSourceStreamReader,
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


def http_fetch_json(
    url: str,
    *,
    timeout_s: float = 30.0,
    max_retries: int = 3,
    retry_delay_s: float = 2.0,
    sleep=_time.sleep,
    rand=_random.random,
):
    """GET ``url`` and decode JSON with the reference client's retry
    table (confluence_client.py:113-234, faithful decision-for-decision):

    - attempt n > 0 first sleeps ``retry_delay * 2^(n-1) + rand()*0.5``
      (exponential backoff with jitter, :121);
    - HTTP 429 sleeps an EXTRA ``retry_delay * 5`` then retries (:195);
    - HTTP 5xx retries (:202), other 4xx raise immediately (:206);
    - connection errors / timeouts retry (:208-214);
    - after ``max_retries`` exhausted, the terminal error raises.

    ``sleep``/``rand`` are injectable so tests assert the exact delay
    schedule without real waiting."""
    retry_count = 0
    while retry_count <= max_retries:
        if retry_count > 0:
            sleep(retry_delay_s * (2 ** (retry_count - 1)) + rand() * 0.5)
        try:
            with urllib.request.urlopen(url, timeout=timeout_s) as resp:
                return _json.loads(resp.read().decode("utf-8"))
        except urllib.error.HTTPError as e:
            if e.code == 429 and retry_count < max_retries:
                sleep(retry_delay_s * 5)  # rate-limit: longer delay (:199)
                retry_count += 1
                continue
            if 500 <= e.code < 600 and retry_count < max_retries:
                retry_count += 1
                continue
            raise
        except (urllib.error.URLError, TimeoutError, OSError):
            if retry_count < max_retries:
                retry_count += 1
                continue
            raise
    raise RuntimeError(f"Failed to make request after {max_retries} retries")


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
        # live-HTTP mode: fetch each partition's rows from a REST server
        # instead of generating the synthetic corpus
        self.base_url = options.get("base_url")
        self.http_timeout_s = float(options.get("http_timeout_s", "30"))
        self.http_max_retries = int(options.get("http_max_retries", "3"))
        self.http_retry_delay_s = float(
            options.get("http_retry_delay_s", "2")
        )
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

    def _fetch_http_rows(self, partition: _RangePartition) -> list[tuple]:
        """One paginated 'request' per partition, pushed filters as
        query params (the reference's spaceKey param / CQL analog), with
        the full retry/backoff/429 discipline of http_fetch_json."""
        from urllib.parse import urlencode

        params = {
            "start": partition.start,
            "limit": partition.end - partition.start,
        }
        if self.space_eq is not None:
            params["space_key"] = self.space_eq
        for kind, bound in self.version_bounds:
            params[f"version_{kind}"] = bound
        url = f"{self.base_url.rstrip('/')}/pages?{urlencode(params)}"
        payload = http_fetch_json(
            url,
            timeout_s=self.http_timeout_s,
            max_retries=self.http_max_retries,
            retry_delay_s=self.http_retry_delay_s,
        )
        return [
            (
                str(r["id"]),
                r["title"],
                r["space_key"],
                int(r["version"]),
                datetime.fromisoformat(r["last_modified"]),
                int(r["n_children"]),
            )
            for r in payload.get("results", [])
        ]

    def read(self, partition: _RangePartition):
        """Yield ONE Arrow batch per partition (columnar hand-off to the
        JVM — far cheaper than per-row tuple pickling)."""
        import pyarrow as pa

        if self.page_throttle_ms > 0:
            import time

            time.sleep(self.page_throttle_ms / 1000.0)
        if self.base_url:
            # the server already applied pushed filters; _keep re-checks
            # client-side (belt-and-braces, same rows either way)
            rows = [r for r in self._fetch_http_rows(partition) if self._keep(r)]
        else:
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


class ConfluenceStreamReader(SimpleDataSourceStreamReader):
    """The reference's INCREMENTAL POLL as a Structured Streaming
    source (master_script.py:456-581's daily lookback loop, made a real
    stream): the offset is the next unread page index, each micro-batch
    reads up to ``pages_per_batch`` pages (the pagination window as the
    batch boundary), and because the corpus is addressed by offset
    ranges, ``readBetweenOffsets`` replays any batch EXACTLY — the
    deterministic-replay contract that makes downstream exactly-once
    sinks (audit_log, foreachBatch MERGE) end-to-end exactly-once.

    In live-HTTP mode the same offsets would drive paginated GETs
    through http_fetch_json; the synthetic corpus keeps the semantics
    testable and deterministic."""

    def __init__(self, options):
        self.n_pages = int(options.get("n_pages", "1000"))
        self.n_spaces = int(options.get("n_spaces", "5"))
        self.pages_per_batch = int(
            options.get("pages_per_batch", str(PAGE_BATCH))
        )

    def initialOffset(self) -> dict:
        return {"next": 0}

    def read(self, start: dict):
        lo = int(start["next"])
        hi = min(lo + self.pages_per_batch, self.n_pages)
        end = {"next": hi}
        return iter(
            [_page(i, self.n_spaces) for i in range(lo, hi)]
        ), end

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            [
                _page(i, self.n_spaces)
                for i in range(int(start["next"]), int(end["next"]))
            ]
        )

    def commit(self, end: dict) -> None:
        pass  # offsets are pure arithmetic; nothing to clean up


class ConfluenceFixtureDataSource(DataSource):
    """``spark.read.format("confluence_pages")`` — options: n_pages,
    n_spaces, page_throttle_ms (per-request rate limit; see reader),
    base_url (live-HTTP mode), http_timeout_s, http_max_retries,
    http_retry_delay_s (reference client retry discipline)."""

    @classmethod
    def name(cls) -> str:
        return "confluence_pages"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema: StructType) -> ConfluenceFixtureReader:
        return ConfluenceFixtureReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> ConfluenceStreamReader:
        return ConfluenceStreamReader(self.options)


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
