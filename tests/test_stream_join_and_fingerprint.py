"""Stream-stream interval join vs its batch equivalent; rolling-hash
fingerprint vs a pure-python reference."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.functions.text import (
    ROLLING_BASE,
    ROLLING_MOD,
    rolling_hash,
)
from atlassian_confluence_data_pipeline_spark.streaming.jobs import (
    read_events_stream,
    stream_stream_attribution,
)


def test_stream_stream_join_matches_batch(spark, sf_dir):
    stream = stream_stream_attribution(read_events_stream(spark, sf_dir))
    name = f"ss_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(180), "stream did not finish within 180s"
        got = {
            (r["purchase_id"], r["click_id"])
            for r in spark.sql(f"SELECT * FROM {name}").collect()
        }
    finally:
        q.stop()
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    expected = {
        (r["purchase_id"], r["click_id"])
        for r in purchases.join(
            clicks,
            F.expr(
                "p_user = c_user AND click_ts <= purchase_ts "
                "AND click_ts >= purchase_ts - INTERVAL 1 HOUR"
            ),
        ).collect()
    }
    assert got == expected
    assert len(got) > 0


def test_rolling_hash_matches_python_reference(spark):
    docs = [("abc",), ("hello world",), ("",), ("a",)]
    df = spark.createDataFrame(docs, "text string")
    got = {
        r["text"]: r["h"]
        for r in df.select("text", rolling_hash(F.col("text")).alias("h")).collect()
    }

    def ref(s: str) -> int:
        h = 0
        for ch in s:
            h = (h * ROLLING_BASE + ord(ch)) % ROLLING_MOD
        return h

    for (text,) in docs:
        assert got[text] == ref(text), text
