"""StateStore.vacuum interleaved with streaming MERGE upserts/replays
(round-6 item 7): the ledger stays correct across kill/restart, vacuum
never touches the current snapshot, retained snapshots stay
time-travel-readable, and a FULL replay after vacuuming converges to
the same ledger."""

from __future__ import annotations

from datetime import datetime

from atlassian_confluence_data_pipeline_spark.operators.state import StateStore
from atlassian_confluence_data_pipeline_spark.streaming.jobs import (
    foreach_batch_state_merge,
)

EV_SCHEMA = "user_id bigint, event_id bigint, ts timestamp, event_type string"


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


#: per-file micro-batches; event ids increase so the expected ledger is
#: simply the per-user max over the prefix processed so far
BATCHES = [
    [(1, 101, _ts("2024-01-01T00:00:01"), "click"),
     (2, 102, _ts("2024-01-01T00:00:02"), "view")],
    [(1, 110, _ts("2024-01-02T00:00:01"), "click"),
     (3, 113, _ts("2024-01-02T00:00:02"), "purchase")],
    [(2, 120, _ts("2024-01-03T00:00:01"), "view"),
     (3, 121, _ts("2024-01-03T00:00:02"), "click")],
]


def _run(spark, tmp_path, store, n_files, checkpoint):
    drop = tmp_path / "drop"
    drop.mkdir(exist_ok=True)
    for i in range(n_files):
        dest = drop / f"ev{i}.parquet"
        if not dest.exists():
            spark.createDataFrame(BATCHES[i], EV_SCHEMA).coalesce(1) \
                .write.parquet(str(dest))
    stream = (
        spark.readStream.schema(EV_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(drop) + "/*.parquet")
    )
    q = (
        foreach_batch_state_merge(stream, store)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def _ledger(spark, store, snapshot=None):
    return sorted(
        (r["id"], r["version"]) for r in store.read(spark, snapshot).collect()
    )


def test_vacuum_between_restarts_preserves_ledger_and_time_travel(
    spark, tmp_path
):
    store = StateStore(str(tmp_path / "ledger"))
    ck = str(tmp_path / "ck")

    _run(spark, tmp_path, store, 1, ck)
    l1 = _ledger(spark, store)
    assert l1 == [("1", 101), ("2", 102)]
    s1 = store.current_snapshot()

    _run(spark, tmp_path, store, 2, ck)  # restart, batch 2
    l2 = _ledger(spark, store)
    assert l2 == [("1", 110), ("2", 102), ("3", 113)]
    s2 = store.current_snapshot()
    assert store.vacuum(keep=2) == []  # only 2 snapshots exist: no-op
    assert _ledger(spark, store, s1) == l1  # retained: time travel ok

    _run(spark, tmp_path, store, 3, ck)  # restart, batch 3
    l3 = _ledger(spark, store)
    assert l3 == [("1", 110), ("2", 120), ("3", 121)]
    s3 = store.current_snapshot()
    removed = store.vacuum(keep=2)
    assert removed == [s1]  # oldest dropped, never the current
    assert store.list_snapshots() == [s2, s3]
    assert store.current_snapshot() == s3
    assert _ledger(spark, store) == l3
    assert _ledger(spark, store, s2) == l2  # retained snapshot readable

    # FULL replay (fresh checkpoint, same vacuumed store): the MERGE is
    # idempotent per (id, version), so the ledger converges to l3 again
    _run(spark, tmp_path, store, 3, str(tmp_path / "ck2"))
    assert _ledger(spark, store) == l3
    # aggressive vacuum down to the current snapshot only
    store.vacuum(keep=1)
    assert store.list_snapshots() == [store.current_snapshot()]
    assert _ledger(spark, store) == l3


def test_vacuum_inside_every_trigger_is_safe(spark, tmp_path):
    """vacuum(keep=1) running INSIDE the foreachBatch loop — the
    tightest interleave with upserts — still yields the correct final
    ledger and a readable current snapshot after every trigger."""
    store = StateStore(str(tmp_path / "ledger2"))
    drop = tmp_path / "drop2"
    drop.mkdir()
    for i, rows in enumerate(BATCHES):
        spark.createDataFrame(rows, EV_SCHEMA).coalesce(1) \
            .write.parquet(str(drop / f"ev{i}.parquet"))

    from pyspark.sql import functions as F

    def merge_and_vacuum(batch_df, batch_id):
        updates = (
            batch_df.groupBy("user_id")
            .agg(
                F.max("event_id").cast("int").alias("version"),
                F.date_format(F.max("ts"), "yyyy-MM-dd'T'HH:mm:ss").alias(
                    "last_modified"
                ),
            )
            .select(
                F.col("user_id").cast("string").alias("id"),
                F.lit(None).cast("string").alias("title"),
                F.lit("events").alias("space_key"),
                "version",
                "last_modified",
                F.create_map().cast("map<string,string>").alias("output_paths"),
            )
        )
        store.upsert(batch_df.sparkSession, updates)
        store.vacuum(keep=1)
        # the just-committed snapshot must survive its own vacuum
        assert store.current_snapshot() in store.list_snapshots()

    stream = (
        spark.readStream.schema(EV_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(drop) + "/*.parquet")
    )
    q = (
        stream.writeStream.foreachBatch(merge_and_vacuum)
        .option("checkpointLocation", str(tmp_path / "ck3"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert _ledger(spark, store) == [("1", 110), ("2", 120), ("3", 121)]
    assert len(store.list_snapshots()) == 1
