"""Video frame-level dedup (plans/multimodal4.py): container split +
per-frame dHash semantics and planted single-frame-edit recovery."""

from __future__ import annotations

from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.sources.binary import (
    dhash_video_frames,
    split_concatenated_bmps,
    textured_video_attachments_from_documents,
)


def test_textured_videos_have_eight_decodable_frames(spark):
    docs = spark.range(100, 104).select(F.col("id").alias("doc_id"))
    vids = textured_video_attachments_from_documents(docs).collect()
    assert len(vids) == 4
    for r in vids:
        assert len(split_concatenated_bmps(bytes(r["content"]))) == 8


def test_video_variants_share_seven_of_eight_frames(spark):
    """Variants of one group differ in exactly ONE frame (index 2*v),
    so any two variants share >= 6 bit-exact frame hashes."""
    docs = spark.range(200, 204).select(F.col("id").alias("doc_id"))
    fp = dhash_video_frames(
        textured_video_attachments_from_documents(docs)
    ).collect()
    by_doc = {}
    for r in fp:
        by_doc.setdefault(r["owner_id"], {})[r["frame_index"]] = r["fh"]
    ids = sorted(by_doc)
    assert all(len(by_doc[d]) == 8 for d in ids)
    for i in range(4):
        for j in range(i + 1, 4):
            a, b = by_doc[ids[i]], by_doc[ids[j]]
            shared = sum(1 for f in range(8) if a[f] == b[f])
            assert shared >= 6  # each variant edits one distinct frame


def test_unrelated_videos_share_no_frames(spark):
    docs = spark.range(300, 320, 4).select(F.col("id").alias("doc_id"))
    fp = dhash_video_frames(
        textured_video_attachments_from_documents(docs)
    ).collect()
    by_doc = {}
    for r in fp:
        by_doc.setdefault(r["owner_id"], set()).add(r["fh"])
    ids = sorted(by_doc)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            assert not (by_doc[ids[i]] & by_doc[ids[j]])


def test_undecodable_video_payload_tolerant(spark):
    att = spark.createDataFrame(
        [(1, "x.cbmp", bytearray(b"not a bmp stream"))],
        "owner_id bigint, filename string, content binary",
    )
    rows = dhash_video_frames(att).collect()
    assert len(rows) == 1
    assert rows[0]["fh"] is None and rows[0]["err"] is not None


def test_mixed_batch_does_not_corrupt_hashes(spark):
    """REGRESSION: a batch mixing undecodable rows with valid ones must
    emit bit-identical fingerprints to a pure batch. (pd.DataFrame
    float64 inference on int+None columns rounds 64-bit hashes through
    a 53-bit mantissa — caught by the video exact-hash join, silently
    weakened the image/audio Hamming joins.)"""
    from atlassian_confluence_data_pipeline_spark.sources.binary import (
        audio_attachments_from_documents,
        dhash_images,
        fingerprint_audio,
        textured_image_attachments_from_documents,
    )

    docs = spark.range(500, 504).select(F.col("id").alias("doc_id"))
    junk = [(999, "junk.bin", bytearray(b"not media"))]
    for fixture, fp_fn, col in (
        (textured_image_attachments_from_documents, dhash_images, "dhash"),
        (audio_attachments_from_documents, fingerprint_audio, "afp"),
        (textured_video_attachments_from_documents, dhash_video_frames, "fh"),
    ):
        good = [
            (r["owner_id"], r["filename"], bytearray(r["content"]))
            for r in fixture(docs).collect()
        ]
        schema = "owner_id bigint, filename string, content binary"
        pure = spark.createDataFrame(good, schema)
        mixed = spark.createDataFrame(good + junk, schema).coalesce(1)
        a = sorted(
            (r["owner_id"], r[col])
            for r in fp_fn(pure).collect()
            if r[col] is not None
        )
        b = sorted(
            (r["owner_id"], r[col])
            for r in fp_fn(mixed).collect()
            if r[col] is not None and r["owner_id"] != 999
        )
        assert a == b, f"{col}: mixed batch corrupted fingerprints"
