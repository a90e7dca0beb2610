"""Structured Streaming jobs driven end-to-end with availableNow
triggers into memory sinks, cross-checked against their batch
equivalents (same plan, batch source)."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.operators.state import StateStore
from atlassian_confluence_data_pipeline_spark.streaming.jobs import (
    dedup_within_watermark,
    foreach_batch_state_merge,
    read_events_stream,
    sessionized_counts,
    windowed_counts,
)


def _run_to_memory(df, name: str) -> None:
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete" if df.isStreaming else "append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_windowed_counts_matches_batch(spark, sf_dir):
    stream = windowed_counts(read_events_stream(spark, sf_dir))
    name = f"wc_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    batch = load_table(spark, sf_dir, "events")
    expected = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in batch.groupBy(
            F.window("ts", "1 hour").alias("w"), F.col("event_type")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
        .collect()
    }
    assert got == expected


def test_sessionized_counts_runs(spark, sf_dir):
    stream = sessionized_counts(read_events_stream(spark, sf_dir))
    name = f"sc_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    n = spark.sql(f"SELECT count(*) AS n FROM {name}").collect()[0]["n"]
    assert n > 0


def test_dedup_within_watermark(spark, sf_dir):
    stream = dedup_within_watermark(read_events_stream(spark, sf_dir))
    name = f"dd_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql(f"SELECT user_id, event_type, count(*) AS n FROM {name} GROUP BY 1,2")
    assert out.filter(F.col("n") > 1).count() == 0  # at most one row per key


def test_max_files_per_trigger_paces_batches(spark, sf_dir, tmp_path):
    """Source rate limiting: with maxFilesPerTrigger=1 a 3-file backlog
    must drain as 3 micro-batches (not one gulp), with no rows lost."""
    import shutil

    src = tmp_path / "drops"
    src.mkdir()
    for i in range(3):
        shutil.copy(f"{sf_dir}/events.parquet", src / f"events_{i}.parquet")
    stream = read_events_stream(
        spark, str(src), max_files_per_trigger=1, glob="events_*.parquet"
    )
    batches: list[int] = []
    q = (
        stream.writeStream.foreachBatch(
            lambda df, bid: batches.append(df.count())
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    n_events = load_table(spark, sf_dir, "events").count()
    assert len(batches) == 3  # one file admitted per trigger
    assert sum(batches) == 3 * n_events


def test_foreach_batch_state_merge(spark, sf_dir, tmp_path):
    store = StateStore(str(tmp_path / "ledger"))
    stream = read_events_stream(spark, sf_dir)
    q = (
        foreach_batch_state_merge(stream, store)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    ledger = store.read(spark)
    n_users = load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    assert ledger.count() == n_users
    # per-user version is the max event id (last-write-wins)
    batch_max = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.max("event_id").alias("m"))
        .collect()
    )
    expected = {str(r["user_id"]): r["m"] for r in batch_max}
    got = {r["id"]: r["version"] for r in ledger.collect()}
    assert got == expected


def test_streaming_minhash_dedup_across_batches(spark, tmp_path):
    """A near-duplicate arriving in a LATER micro-batch must pair with
    its original from an EARLIER batch via the persisted band index."""
    import uuid

    from atlassian_confluence_data_pipeline_spark.operators.state import (
        AppendIndexStore,
    )
    from atlassian_confluence_data_pipeline_spark.streaming.jobs import (
        foreach_batch_minhash_dedup,
    )

    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    )
    near = base.replace("kappa", "kappa2")  # one-token edit: high jaccard
    other = "one two three four five six seven eight nine ten " * 2
    drop = tmp_path / "docs"
    drop.mkdir()
    # two files -> two micro-batches (maxFilesPerTrigger=1)
    spark.createDataFrame([(1, base), (2, other.strip())], "doc_id bigint, text string") \
        .coalesce(1).write.parquet(str(drop / "batch1.parquet"))
    spark.createDataFrame([(3, near)], "doc_id bigint, text string") \
        .coalesce(1).write.parquet(str(drop / "batch2.parquet"))

    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(drop) + "/*.parquet")
    )
    store = AppendIndexStore(str(tmp_path / "band_index"))
    pairs_dir = str(tmp_path / "pairs")
    q = (
        foreach_batch_minhash_dedup(stream, store, pairs_dir, jaccard=0.5)
        .option("checkpointLocation", str(tmp_path / f"ck_{uuid.uuid4().hex[:6]}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    pairs = {
        (r.id_a, r.id_b)
        for r in spark.read.parquet(pairs_dir).distinct().collect()
    }
    assert (1, 3) in pairs          # cross-batch near-dup found
    assert all(2 not in p for p in pairs)  # unrelated doc pairs with nothing
    # the index is idempotent by construction: one row per (doc, band)
    idx = store.read(spark, "doc_id bigint, hs array<bigint>, band_key bigint")
    assert idx.count() == idx.select("doc_id", "band_key").distinct().count()


def test_stream_definable_over_empty_directory(spark, tmp_path):
    """A stream over a not-yet-populated drop directory must be
    definable (static fallback schema) — the standard file-source
    bootstrap; the batch-derived schema path only exists for fixtures
    already on disk."""
    empty = tmp_path / "drop"
    empty.mkdir()
    stream = read_events_stream(spark, str(empty))
    assert stream.isStreaming
    assert dict(stream.dtypes)["ts"] == "timestamp"
    assert set(stream.columns) >= {"event_id", "ts", "user_id", "event_type"}


def test_streaming_span_dedup_across_batches(spark, tmp_path):
    """A span repeated in a LATER micro-batch must be stripped via the
    persisted span-hash index; the first batch keeps it."""
    import uuid

    from atlassian_confluence_data_pipeline_spark.operators.state import (
        AppendIndexStore,
    )
    from atlassian_confluence_data_pipeline_spark.streaming.jobs import (
        foreach_batch_span_dedup,
    )

    boiler = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    tail1 = "one two three four five six seven eight nine ten"
    tail2 = "red orange yellow green blue indigo violet black white gray"
    drop = tmp_path / "docs"
    drop.mkdir()
    spark.createDataFrame(
        [(1, f"{boiler} {tail1}")], "doc_id bigint, text string"
    ).coalesce(1).write.parquet(str(drop / "batch1.parquet"))
    spark.createDataFrame(
        [(2, f"{boiler} {tail2}")], "doc_id bigint, text string"
    ).coalesce(1).write.parquet(str(drop / "batch2.parquet"))

    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(drop) + "/*.parquet")
    )
    store = AppendIndexStore(str(tmp_path / "span_index"))
    out_dir = str(tmp_path / "clean")
    q = (
        foreach_batch_span_dedup(stream, store, out_dir, span_words=10)
        .option("checkpointLocation", str(tmp_path / f"ck_{uuid.uuid4().hex[:6]}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = {r["doc_id"]: r for r in spark.read.parquet(out_dir).collect()}
    assert rows[1]["n_spans"] == 2 and rows[1]["n_kept"] == 2
    assert rows[1]["clean_text"] == f"{boiler} {tail1}"
    # the repeated boilerplate span is stripped from the later batch
    assert rows[2]["n_spans"] == 2 and rows[2]["n_kept"] == 1
    assert rows[2]["clean_text"] == tail2
    # per-batch-distinct spans; set semantics carried by the anti-join
    idx = store.read(spark, "h bigint")
    assert idx.distinct().count() == 3
