"""Streaming audit-log sink (Python DSv2 stream writer): per-batch
atomic publication, content parity, and overwrite-idempotence under
micro-batch replay."""

from __future__ import annotations

import os
import uuid

from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.sources.audit_sink import register


def _drop_batches(spark, tmp_path, batches):
    drop = tmp_path / f"ev_{uuid.uuid4().hex[:6]}"
    drop.mkdir()
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, "line string").coalesce(1).write.parquet(
            str(drop / f"b{i}.parquet")
        )
    return (
        spark.readStream.schema("line string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(drop) + "/*.parquet")
    )


def _run(stream, out, ck):
    q = (
        stream.writeStream.format("audit_log")
        .option("path", str(out))
        .option("checkpointLocation", str(ck))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def _published(out):
    logs = {}
    for n in sorted(os.listdir(out)):
        if n.startswith("batch-") and n.endswith(".log"):
            logs[n] = sorted(
                line for line in open(os.path.join(out, n)).read().splitlines()
            )
    return logs


def test_batches_publish_atomically(spark, tmp_path):
    register(spark)
    b0 = [(f"run {i} ok",) for i in range(10)]
    b1 = [(f"audit {i}",) for i in range(7)]
    stream = _drop_batches(spark, tmp_path, [b0, b1])
    out = tmp_path / "audit"
    out.mkdir()
    _run(stream, out, tmp_path / "ck1")
    logs = _published(out)
    assert set(logs) == {
        "batch-00000000000000000000.log",
        "batch-00000000000000000001.log",
    }
    assert sorted(sum(logs.values(), [])) == sorted(
        r[0] for r in b0 + b1
    )
    assert not os.listdir(os.path.join(out, "_staging"))


def test_replay_overwrites_instead_of_duplicating(spark, tmp_path):
    """Re-running the same availableNow stream with a FRESH checkpoint
    replays batch ids 0..n — the sink must converge to the same files
    and line multiset, never append duplicates (the file-sink analog of
    the CMS batch-id guard)."""
    register(spark)
    batches = [[(f"line {i}",)] * 3 for i in range(3)]
    stream = _drop_batches(spark, tmp_path, batches)
    out = tmp_path / "audit"
    out.mkdir()
    _run(stream, out, tmp_path / "ckA")
    first = _published(out)
    _run(stream, out, tmp_path / "ckB")  # fresh checkpoint = full replay
    second = _published(out)
    assert first == second  # same files, same contents — no duplication


def test_streaming_pipeline_audit_lines(spark, sf_dir, tmp_path):
    """End-to-end flavor: event rows rendered to reference-style audit
    lines ('<ts> - <message>') and streamed to the sink."""
    from atlassian_confluence_data_pipeline_spark.catalog import load_table

    register(spark)
    ev = (
        load_table(spark, sf_dir, "events")
        .limit(50)
        .select(
            F.concat(
                F.date_format("ts", "yyyy-MM-dd HH:mm:ss"),
                F.lit(" - "),
                F.col("event_type"),
                F.lit(" by user "),
                F.col("user_id").cast("string"),
            ).alias("line")
        )
    )
    drop = tmp_path / "feed"
    drop.mkdir()
    ev.coalesce(1).write.parquet(str(drop / "b.parquet"))
    stream = (
        spark.readStream.schema("line string").parquet(str(drop) + "/*.parquet")
    )
    out = tmp_path / "audit"
    out.mkdir()
    _run(stream, out, tmp_path / "ck")
    lines = sum(_published(out).values(), [])
    assert len(lines) == 50
    assert all(" - " in line for line in lines)


def test_commit_is_byte_deterministic_across_message_order(tmp_path):
    """commit() concatenates by PARTITION index, not random staging-file
    name, so a replayed batch republishes byte-identical content even if
    the driver receives the commit messages in a different order."""
    from atlassian_confluence_data_pipeline_spark.sources.audit_sink import (
        AuditLogStreamWriter,
        _Lines,
    )

    out = tmp_path / "audit"
    out.mkdir()
    w = AuditLogStreamWriter({"path": str(out)})

    def stage(content, pid, name):
        staging = out / "_staging"
        staging.mkdir(exist_ok=True)
        f = staging / name
        f.write_text(content)
        return _Lines(
            staging_file=str(f),
            n_lines=content.count("\n"),
            partition_id=pid,
        )

    # attempt 1: staging-file names sort OPPOSITE to partition order
    m0 = stage("p0-l1\np0-l2\n", 0, "zzz")
    m1 = stage("p1-l1\n", 1, "aaa")
    w.commit([m1, m0], batchId=7)
    first = (out / "batch-00000000000000000007.log").read_bytes()
    # replay: same partitions, different random names and message order
    m0b = stage("p0-l1\np0-l2\n", 0, "mmm")
    m1b = stage("p1-l1\n", 1, "qqq")
    w.commit([m0b, m1b], batchId=7)
    second = (out / "batch-00000000000000000007.log").read_bytes()
    assert first == second == b"p0-l1\np0-l2\np1-l1\n"
