"""Streaming perceptual dedup (streaming/jobs.py
foreach_batch_image_dedup / foreach_batch_audio_dedup): a near-dup
image/track arriving in a LATER micro-batch must pair with its original
from an EARLIER batch via the persisted chunk index; undecodable
payloads must flow through as skipped rows, not failures."""

from __future__ import annotations

import uuid

import numpy as np

from atlassian_confluence_data_pipeline_spark.functions.audio import encode_wav
from atlassian_confluence_data_pipeline_spark.functions.imaging import encode_bmp
from atlassian_confluence_data_pipeline_spark.operators.state import AppendIndexStore
from atlassian_confluence_data_pipeline_spark.streaming.jobs import (
    _FP_INDEX_SCHEMA,
    foreach_batch_audio_dedup,
    foreach_batch_image_dedup,
)

_ATT_SCHEMA = "owner_id bigint, filename string, content binary"


def _texture(seed: int) -> np.ndarray:
    y, x, c = np.ogrid[:16, :16, :3]
    return (
        (seed * 31 + 7 * x * x + 13 * y * y + 5 * x * y + 101 * c) % 256
    ).astype(np.uint8)


def _near_texture(seed: int) -> np.ndarray:
    px = _texture(seed).astype(np.int64)
    px[0:2, :, :] = (px[0:2, :, :] + 128) % 256  # localized band edit
    return px.astype(np.uint8)


def _wav(seed: int, boost_at: int | None = None) -> bytes:
    n = 390
    t = np.arange(n, dtype=np.int64)
    ww = (t * 65) // n
    amp = ((seed % 37) * ww * ww + ((seed * 5) % 31) * ww + 2 * seed) % 73 + 8
    if boost_at is not None:
        amp = amp + 40 * ((ww >= boost_at) & (ww < boost_at + 6))
    carrier = np.where(t % 2 == 0, 1, -1)
    return encode_wav((128 + carrier * amp).astype(np.uint8))


def _run_stream(spark, tmp_path, job, rows_batch1, rows_batch2):
    drop = tmp_path / "drop"
    drop.mkdir()
    spark.createDataFrame(rows_batch1, _ATT_SCHEMA).coalesce(1).write.parquet(
        str(drop / "b1.parquet")
    )
    spark.createDataFrame(rows_batch2, _ATT_SCHEMA).coalesce(1).write.parquet(
        str(drop / "b2.parquet")
    )
    stream = (
        spark.readStream.schema(_ATT_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(drop) + "/*.parquet")
    )
    store = AppendIndexStore(str(tmp_path / "fp_index"))
    pairs_dir = str(tmp_path / "pairs")
    q = (
        job(stream, store, pairs_dir)
        .option("checkpointLocation", str(tmp_path / f"ck_{uuid.uuid4().hex[:6]}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    pairs = {
        (r.id_a, r.id_b)
        for r in spark.read.parquet(pairs_dir).distinct().collect()
    }
    return pairs, store


def test_streaming_image_dedup_across_batches(spark, tmp_path):
    b1 = [
        (1, "a.bmp", bytearray(encode_bmp(_texture(9)))),
        (2, "b.bmp", bytearray(encode_bmp(_texture(40)))),
    ]
    b2 = [
        (3, "c.bmp", bytearray(encode_bmp(_near_texture(9)))),
        (4, "junk.jpg", bytearray(b"\xff\xd8 not decodable")),
    ]
    pairs, store = _run_stream(
        spark, tmp_path, foreach_batch_image_dedup, b1, b2
    )
    assert (1, 3) in pairs  # cross-batch near-dup found
    assert all(4 not in p for p in pairs)  # undecodable row skipped
    idx = store.read(spark, _FP_INDEX_SCHEMA)
    # one row per (file, chunk), and the junk row never entered state
    assert idx.filter("owner_id = 4").count() == 0
    assert idx.count() == idx.select("owner_id", "chunk_id").distinct().count()


def test_streaming_audio_dedup_across_batches(spark, tmp_path):
    b1 = [
        (1, "a.wav", bytearray(_wav(300))),
        (2, "b.wav", bytearray(_wav(871))),
    ]
    b2 = [
        (3, "c.wav", bytearray(_wav(300, boost_at=20))),
        (4, "junk.mp3", bytearray(b"ID3\x04compressed")),
    ]
    pairs, store = _run_stream(
        spark, tmp_path, foreach_batch_audio_dedup, b1, b2
    )
    assert (1, 3) in pairs
    assert all(4 not in p for p in pairs)
    idx = store.read(spark, _FP_INDEX_SCHEMA)
    assert idx.filter("owner_id = 4").count() == 0


def test_streaming_image_dedup_replay_idempotent(spark, tmp_path):
    """Re-running the same availableNow stream from a FRESH checkpoint
    (a full replay) must leave the index read-equivalent — the batch
    partitions are pure functions of the batch."""
    b1 = [(1, "a.bmp", bytearray(encode_bmp(_texture(9))))]
    b2 = [(3, "c.bmp", bytearray(encode_bmp(_near_texture(9))))]
    drop = tmp_path / "drop"
    drop.mkdir()
    spark.createDataFrame(b1, _ATT_SCHEMA).coalesce(1).write.parquet(
        str(drop / "b1.parquet")
    )
    spark.createDataFrame(b2, _ATT_SCHEMA).coalesce(1).write.parquet(
        str(drop / "b2.parquet")
    )
    store = AppendIndexStore(str(tmp_path / "fp_index"))
    pairs_dir = str(tmp_path / "pairs")

    def run_once():
        stream = (
            spark.readStream.schema(_ATT_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(drop) + "/*.parquet")
        )
        q = (
            foreach_batch_image_dedup(stream, store, pairs_dir)
            .option(
                "checkpointLocation",
                str(tmp_path / f"ck_{uuid.uuid4().hex[:6]}"),
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run_once()
    first = sorted(
        map(tuple, store.read(spark, _FP_INDEX_SCHEMA).collect())
    )
    run_once()  # fresh checkpoint -> same batch ids replayed
    second = sorted(
        map(tuple, store.read(spark, _FP_INDEX_SCHEMA).collect())
    )
    assert first == second
    # pairs are at-least-once; dedup-on-read gives the stable set
    pairs = {
        (r.id_a, r.id_b)
        for r in spark.read.parquet(pairs_dir).distinct().collect()
    }
    assert pairs == {(1, 3)}


def test_streaming_video_dedup_across_batches(spark, tmp_path):
    """A single-frame-edited video arriving in a LATER micro-batch must
    pair with its group's originals from an EARLIER batch via the
    persisted frame index."""
    from pyspark.sql import functions as F

    from atlassian_confluence_data_pipeline_spark.sources.binary import (
        textured_video_attachments_from_documents,
    )
    from atlassian_confluence_data_pipeline_spark.streaming.jobs import (
        _FRAME_INDEX_SCHEMA,
        foreach_batch_video_dedup,
    )

    def vids(ids):
        docs = spark.createDataFrame([(d,) for d in ids], "doc_id bigint")
        return textured_video_attachments_from_documents(docs).collect()

    b1 = [(r["owner_id"], r["filename"], bytearray(r["content"])) for r in vids([400, 401])]
    b2 = [(r["owner_id"], r["filename"], bytearray(r["content"])) for r in vids([402])]
    b2.append((999, "junk.cbmp", bytearray(b"definitely not bmps")))
    pairs, store = _run_stream(
        spark, tmp_path, foreach_batch_video_dedup, b1, b2
    )
    assert (400, 402) in pairs and (401, 402) in pairs  # cross-batch
    assert all(999 not in p for p in pairs)  # undecodable skipped
    idx = store.read(spark, _FRAME_INDEX_SCHEMA)
    assert idx.filter("owner_id = 999").count() == 0
    assert idx.filter("owner_id = 400").count() == 8  # one row per frame


def test_streaming_video_dedup_counts_same_batch_pair_once(spark, tmp_path):
    """Regression (round-9 ADVICE): a SAME-batch video pair matches in
    both directions through universe = prior UNION bf, so without a
    (id_a, id_b, frame_index) distinct each shared frame counted twice
    and n_shared was 2x — two videos sharing only 3 frames in one
    micro-batch were wrongly emitted past MIN_SHARED_FRAMES=5. Plant a
    3-shared same-batch pair (must NOT pair) and a 6-shared same-batch
    pair (must pair with n_shared exactly 6)."""
    from atlassian_confluence_data_pipeline_spark.streaming.jobs import (
        foreach_batch_video_dedup,
    )

    def video(frame_seeds):
        return b"".join(encode_bmp(_texture(s)) for s in frame_seeds)

    # ids 10/11 share frames 0-2 (3 < threshold 5); ids 20/21 share
    # frames 0-5 (6 >= 5). Non-shared frames use disjoint seed ranges.
    b1 = [
        (10, "v10.cbmp", bytearray(video([1, 2, 3, 100, 101, 102, 103, 104]))),
        (11, "v11.cbmp", bytearray(video([1, 2, 3, 200, 201, 202, 203, 204]))),
        (20, "v20.cbmp", bytearray(video([50, 51, 52, 53, 54, 55, 300, 301]))),
        (21, "v21.cbmp", bytearray(video([50, 51, 52, 53, 54, 55, 400, 401]))),
    ]
    b2 = [(30, "v30.cbmp", bytearray(video([500, 501, 502, 503, 504, 505, 506, 507])))]
    pairs, _ = _run_stream(
        spark, tmp_path, foreach_batch_video_dedup, b1, b2
    )
    assert (10, 11) not in pairs  # 3 shared frames stays below threshold
    assert (20, 21) in pairs
    rows = spark.read.parquet(str(tmp_path / "pairs")).distinct().collect()
    by_pair = {(r.id_a, r.id_b): r.n_shared for r in rows}
    assert by_pair[(20, 21)] == 6  # counted once per shared frame
