"""Custom Python DataSource connector: filter-pushdown absorption,
pagination partitioning, end-to-end read correctness, and the live-HTTP
mode's retry/backoff/429 discipline (reference
confluence_client.py:113-234) against a local scripted server."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual, StringStartsWith

from atlassian_confluence_data_pipeline_spark.sources.confluence_source import (
    PAGE_BATCH,
    ConfluenceFixtureReader,
    _page,
    http_fetch_json,
    register,
)


class _ScriptedServer:
    """Local HTTP server whose /pages endpoint serves the deterministic
    synthetic corpus, optionally failing the first ``fail_first``
    requests with ``fail_status`` — the retry-then-succeed fixture."""

    def __init__(self, n_pages=300, n_spaces=3, fail_first=0, fail_status=503):
        state = {"failures_left": fail_first}
        lock = threading.Lock()

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # noqa: D102 - quiet test server
                pass

            def do_GET(self):  # noqa: N802 - http.server API
                with lock:
                    if state["failures_left"] > 0:
                        state["failures_left"] -= 1
                        self.send_response(fail_status)
                        self.end_headers()
                        return
                q = parse_qs(urlparse(self.path).query)
                start = int(q.get("start", ["0"])[0])
                limit = int(q.get("limit", ["100"])[0])
                space = q.get("space_key", [None])[0]
                results = []
                for i in range(start, min(start + limit, n_pages)):
                    r = _page(i, n_spaces)
                    if space is not None and r[2] != space:
                        continue
                    results.append(
                        {
                            "id": r[0],
                            "title": r[1],
                            "space_key": r[2],
                            "version": r[3],
                            "last_modified": r[4].isoformat(),
                            "n_children": r[5],
                        }
                    )
                body = json.dumps({"results": results}).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(body)

        self.httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.url = f"http://127.0.0.1:{self.httpd.server_address[1]}"
        self.thread = threading.Thread(
            target=self.httpd.serve_forever, daemon=True
        )
        self.thread.start()

    def close(self):
        self.httpd.shutdown()
        self.httpd.server_close()


def test_http_retry_then_succeed_backoff_schedule():
    """Two 503s then success: the fetch retries with the reference's
    exponential backoff (2s * 2^(n-1), jitter injected as 0) and
    returns the payload."""
    srv = _ScriptedServer(n_pages=5, fail_first=2, fail_status=503)
    sleeps: list[float] = []
    try:
        payload = http_fetch_json(
            srv.url + "/pages?start=0&limit=5",
            sleep=sleeps.append,
            rand=lambda: 0.0,
        )
    finally:
        srv.close()
    assert len(payload["results"]) == 5
    assert sleeps == [2.0, 4.0]  # backoff before attempts 1 and 2


def test_http_429_rate_limit_backoff():
    """A 429 sleeps the reference's 5x retry_delay FIRST, then the
    normal backoff before the retry attempt (client.py:195-199)."""
    srv = _ScriptedServer(n_pages=3, fail_first=1, fail_status=429)
    sleeps: list[float] = []
    try:
        payload = http_fetch_json(
            srv.url + "/pages?start=0&limit=3",
            sleep=sleeps.append,
            rand=lambda: 0.0,
        )
    finally:
        srv.close()
    assert len(payload["results"]) == 3
    assert sleeps == [10.0, 2.0]  # 5x rate-limit sleep, then backoff


def test_http_non_retryable_4xx_raises_immediately():
    import urllib.error

    srv = _ScriptedServer(n_pages=3, fail_first=99, fail_status=404)
    sleeps: list[float] = []
    try:
        with pytest.raises(urllib.error.HTTPError):
            http_fetch_json(
                srv.url + "/pages?start=0&limit=3",
                sleep=sleeps.append,
                rand=lambda: 0.0,
            )
    finally:
        srv.close()
    assert sleeps == []  # no retry, no backoff on plain 4xx


def test_http_connection_failure_exhausts_retries():
    """An unreachable server (connection refused — the timeout-class
    failure) retries max_retries times with the full backoff ladder,
    then raises the terminal error."""
    import urllib.error

    srv = _ScriptedServer(n_pages=1)
    url = srv.url  # capture a port, then close so connections refuse
    srv.close()
    sleeps: list[float] = []
    with pytest.raises((urllib.error.URLError, OSError)):
        http_fetch_json(
            url + "/pages?start=0&limit=1",
            sleep=sleeps.append,
            rand=lambda: 0.0,
        )
    assert sleeps == [2.0, 4.0, 8.0]  # all three backoffs spent


def test_http_mode_end_to_end_matches_synthetic(spark):
    """spark.read in base_url mode against the local server returns
    EXACTLY the synthetic corpus (same rows, same pushed-filter
    behavior) — the oracle fixture validates the live path."""
    register(spark)
    srv = _ScriptedServer(n_pages=250, n_spaces=3)
    try:
        live = (
            spark.read.format("confluence_pages")
            .option("n_pages", 250)
            .option("n_spaces", 3)
            .option("base_url", srv.url)
            .load()
        )
        synth = (
            spark.read.format("confluence_pages")
            .option("n_pages", 250)
            .option("n_spaces", 3)
            .load()
        )
        assert sorted(map(tuple, live.collect())) == sorted(
            map(tuple, synth.collect())
        )
        # pushed space filter travels as a query param and agrees
        lf = live.filter(F.col("space_key") == "SPACE_1")
        assert lf.count() == synth.filter(
            F.col("space_key") == "SPACE_1"
        ).count()
    finally:
        srv.close()


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


def test_http_429_429_200_exact_delay_sequence_with_jitter():
    """Round-6 item 8: the reference's EXACT delay schedule under a
    scripted 429 -> 429 -> 200 server, jitter included. The reference
    (confluence_client.py:188-199) sleeps retry_delay*5 immediately on
    a 429, then its normal backoff ``retry_delay * 2^(n-1) +
    random()*0.5`` (:117-122) before the retry attempt — so two
    consecutive 429s produce [10, 2+j1*0.5, 10, 4+j2*0.5] with
    retry_delay=2 and jitter draws j in [0, 1)."""
    srv = _ScriptedServer(n_pages=3, fail_first=2, fail_status=429)
    sleeps: list[float] = []
    draws = iter([0.25, 0.75])
    try:
        payload = http_fetch_json(
            srv.url + "/pages?start=0&limit=3",
            sleep=sleeps.append,
            rand=lambda: next(draws),
        )
    finally:
        srv.close()
    assert len(payload["results"]) == 3
    assert sleeps == [10.0, 2.0 + 0.25 * 0.5, 10.0, 4.0 + 0.75 * 0.5]
    # jitter bounds: every backoff sleep sits inside the reference's
    # [base, base + 0.5) envelope
    for base, got in ((2.0, sleeps[1]), (4.0, sleeps[3])):
        assert base <= got < base + 0.5


def test_http_429_exhausts_retries_then_raises():
    """max_retries consecutive 429s burn the full ladder — one 5x
    rate-limit sleep per 429, one jittered backoff per retry attempt —
    and the final 429 raises (the reference re-raises after the loop,
    confluence_client.py:224-234)."""
    import urllib.error

    srv = _ScriptedServer(n_pages=3, fail_first=99, fail_status=429)
    sleeps: list[float] = []
    try:
        with pytest.raises(urllib.error.HTTPError):
            http_fetch_json(
                srv.url + "/pages?start=0&limit=3",
                sleep=sleeps.append,
                rand=lambda: 0.0,
            )
    finally:
        srv.close()
    # 3 retries: [rate-limit, backoff] x3, then attempt 4's 429 raises
    # (retry_count == max_retries -> no further rate-limit sleep)
    assert sleeps == [10.0, 2.0, 10.0, 4.0, 10.0, 8.0]
