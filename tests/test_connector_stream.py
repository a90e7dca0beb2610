"""Streaming connector source (SimpleDataSourceStreamReader): the
reference's incremental poll as a real Structured Streaming source with
checkpointable page-offset progress."""

from __future__ import annotations

import uuid

from atlassian_confluence_data_pipeline_spark.sources.confluence_source import (
    ConfluenceStreamReader,
    register,
)


def test_offset_arithmetic_and_deterministic_replay():
    r = ConfluenceStreamReader({"n_pages": "250", "pages_per_batch": "100"})
    start = r.initialOffset()
    assert start == {"next": 0}
    rows1, o1 = r.read(start)
    assert o1 == {"next": 100} and len(list(rows1)) == 100
    rows2, o2 = r.read(o1)
    assert o2 == {"next": 200}
    _, o3 = r.read(o2)
    assert o3 == {"next": 250}  # tail batch clamps to corpus size
    _, o4 = r.read(o3)
    assert o4 == {"next": 250}  # drained: offset stops advancing
    # replay of a committed range is bit-identical (exactly-once input)
    replay = list(r.readBetweenOffsets({"next": 100}, {"next": 200}))
    fresh, _ = r.read({"next": 100})
    assert replay == list(fresh)


def test_stream_reads_all_pages(spark, tmp_path):
    """Continuous micro-batches drain the whole corpus, one
    pages_per_batch page window per batch (the pagination cadence)."""
    import time

    register(spark)
    name = f"pages_{uuid.uuid4().hex[:6]}"
    q = (
        spark.readStream.format("confluence_pages")
        .option("n_pages", 350)
        .option("n_spaces", 3)
        .option("pages_per_batch", 100)
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .option(
            "checkpointLocation", str(tmp_path / f"ck_{uuid.uuid4().hex[:6]}")
        )
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.monotonic() + 120
        while time.monotonic() < deadline:
            if spark.sql(f"SELECT count(*) c FROM {name}").first()["c"] == 350:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    got = spark.sql(f"SELECT * FROM {name}").collect()
    assert len(got) == 350
    assert {r["space_key"] for r in got} == {"SPACE_0", "SPACE_1", "SPACE_2"}


def test_checkpoint_resume_reads_only_new_pages(spark, tmp_path):
    """The incremental-poll contract: a later run against the SAME
    checkpoint picks up exactly the pages that appeared since the last
    offset — never re-reading history (master_script's daily lookback,
    minus its re-scan)."""
    import time

    register(spark)
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "pages_out")

    def drain(n_pages: int, want: int) -> None:
        q = (
            spark.readStream.format("confluence_pages")
            .option("n_pages", n_pages)
            .option("pages_per_batch", 100)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(processingTime="0 seconds")
            .start()
        )
        try:
            deadline = time.monotonic() + 120
            while time.monotonic() < deadline:
                try:
                    n = spark.read.parquet(out).count()
                except Exception:
                    n = 0
                if n >= want:
                    break
                time.sleep(0.5)
        finally:
            q.stop()

    drain(n_pages=200, want=200)
    assert spark.read.parquet(out).count() == 200

    # the 'server' grew; same checkpoint — only pages 200..349 arrive
    drain(n_pages=350, want=350)
    ids = sorted(int(r["id"]) for r in spark.read.parquet(out).collect())
    assert ids == list(range(0, 350))  # no page re-read: each id exactly once
