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
