"""applyInPandasWithState: running per-user stats across micro-batches
must converge to the batch ground truth."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.streaming.jobs import read_events_stream
from atlassian_confluence_data_pipeline_spark.streaming.stateful import (
    running_user_stats,
)


def test_running_user_stats_matches_batch(spark, sf_dir):
    stream = running_user_stats(read_events_stream(spark, sf_dir))
    name = f"st_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # update mode may emit a row per key per batch; the LAST row per key
    # is the converged state
    got = {
        r["user_id"]: (r["n_events"], round(r["total_value"], 6), r["max_event_id"])
        for r in spark.sql(
            f"""
            SELECT * FROM (
              SELECT *, row_number() OVER (
                PARTITION BY user_id ORDER BY n_events DESC
              ) AS rn FROM {name}
            ) WHERE rn = 1
            """
        ).collect()
    }
    expected = {
        r["user_id"]: (r["n"], round(r["tot"], 6), r["m"])
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("tot"),
            F.max("event_id").alias("m"),
        )
        .collect()
    }
    assert set(got) == set(expected)
    for uid, exp in expected.items():
        g = got[uid]
        assert g[0] == exp[0] and g[2] == exp[2]
        assert abs(g[1] - exp[1]) < 1e-6


def test_streaming_transitions_match_batch_across_batches(spark, tmp_path):
    """The transition straddling two micro-batches must be counted:
    summing per-batch increments over a 2-file stream equals the batch
    lag-window matrix over the union — including the cross-batch pair,
    which proves the carried state is used."""
    import uuid

    from pyspark.sql import functions as F
    from atlassian_confluence_data_pipeline_spark.streaming.stateful import (
        streaming_transition_counts,
    )

    rows1 = [
        (1, "2024-01-01 10:00:00", 7, "view", 1.0, "{}"),
        (2, "2024-01-01 10:01:00", 7, "click", 1.0, "{}"),
    ]
    rows2 = [
        (3, "2024-01-01 10:02:00", 7, "purchase", 1.0, "{}"),  # cross-batch link
        (4, "2024-01-01 10:03:00", 7, "view", 1.0, "{}"),
    ]
    schema = (
        "event_id bigint, ts string, user_id bigint, event_type string, "
        "value double, props string"
    )
    drop = tmp_path / "ev"
    drop.mkdir()
    for i, rows in enumerate([rows1, rows2]):
        spark.createDataFrame(rows, schema).withColumn(
            "ts", F.col("ts").cast("timestamp")
        ).coalesce(1).write.parquet(str(drop / f"b{i}.parquet"))

    stream = (
        spark.readStream.schema(
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double, props string"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(str(drop) + "/*.parquet")
    )
    name = f"tr_{uuid.uuid4().hex[:8]}"
    q = (
        streaming_transition_counts(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.prev_type, r.event_type): r.total
        for r in spark.sql(
            f"SELECT prev_type, event_type, sum(n) AS total FROM {name} "
            "GROUP BY 1, 2"
        ).collect()
    }
    assert got == {
        ("view", "click"): 1,
        ("click", "purchase"): 1,  # the batch-straddling transition
        ("purchase", "view"): 1,
    }
