"""Binary/multimodal column plumbing: attachment schema, Arrow-batched
byte-feature extraction, and the REAL decode/resize/frame-sample paths
over the pure-numpy BMP/PPM codecs."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.functions.imaging import (
    decode_bmp,
    decode_image_bytes,
    decode_ppm,
    encode_bmp,
    encode_ppm,
    resize_nearest,
)
from atlassian_confluence_data_pipeline_spark.sources.binary import (
    attachments_from_documents,
    decode_image,
    extract_byte_features,
    image_attachments_from_documents,
    resize_image,
    sample_frames,
    split_concatenated_bmps,
    video_attachments_from_documents,
)


def test_attachment_schema_and_meta(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    att = attachments_from_documents(docs)
    assert [f.name for f in att.schema.fields] == [
        "owner_id",
        "filename",
        "content",
        "meta",
    ]
    row = att.filter(F.col("owner_id") == 0).collect()[0]
    assert row["filename"] == "doc_0.png"
    assert row["meta"]["mime"] == "image/png"
    assert row["meta"]["kind"] == "image"
    assert row["meta"]["n_bytes"] == len(row["content"])


def test_byte_features_roundtrip(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(20)
    att = attachments_from_documents(docs)
    feats = extract_byte_features(att).collect()
    src = {r["owner_id"]: bytes(r["content"]) for r in att.collect()}
    assert len(feats) == 20
    for r in feats:
        payload = src[r["owner_id"]]
        assert r["n_bytes"] == len(payload)
        assert r["sha"] == hashlib.sha256(payload).hexdigest()
        assert sum(r["byte_histogram"]) == len(payload)
        assert len(r["byte_histogram"]) == 16


def _gradient(d: int, h: int, w: int) -> np.ndarray:
    y, x, c = np.ogrid[:h, :w, :3]
    return ((d + 7 * x + 13 * y + 101 * c) % 256).astype(np.uint8)


def test_codec_roundtrips():
    px = _gradient(5, 3, 5)  # odd width exercises BMP row padding
    assert np.array_equal(decode_bmp(encode_bmp(px)), px)
    assert np.array_equal(decode_ppm(encode_ppm(px)), px)
    assert np.array_equal(decode_image_bytes(encode_bmp(px)), px)
    with pytest.raises(ValueError):
        decode_image_bytes(b"GIF89a not supported")
    # PPM comments/whitespace tolerance per spec
    ppm = b"P6\n# a comment\n5 3\n255\n" + px.tobytes()
    assert np.array_equal(decode_ppm(ppm), px)


def test_png_roundtrip_and_filters():
    from atlassian_confluence_data_pipeline_spark.functions.imaging import (
        decode_png,
        encode_png,
    )

    for d, h, w in [(1, 1, 1), (3, 2, 3), (9, 7, 5), (4, 16, 16)]:
        px = _gradient(d, h, w)
        data = encode_png(px)
        assert data[:8] == b"\x89PNG\r\n\x1a\n"
        assert np.array_equal(decode_png(data), px)
        assert np.array_equal(decode_image_bytes(data), px)

    # a PNG built with the FULL filter set (Sub/Up/Average/Paeth), the
    # way an external encoder would write it, must decode identically
    import struct
    import zlib

    px = _gradient(11, 4, 6)
    stride = 6 * 3
    prev = np.zeros(stride, np.int32)
    lines = []
    for y, f in enumerate([1, 2, 3, 4]):
        cur = px[y].reshape(-1).astype(np.int32)
        enc = np.zeros(stride, np.int32)
        for i in range(stride):
            a = cur[i - 3] if i >= 3 else 0
            b = prev[i]
            c = prev[i - 3] if i >= 3 else 0
            if f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = (
                    a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                )
            enc[i] = (cur[i] - pred) & 0xFF
        lines.append(bytes([f]) + bytes(enc.astype(np.uint8)))
        prev = cur
    raw = b"".join(lines)

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body))
        )

    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 6, 4, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(data), px)

    # corrupted CRC is rejected, not silently decoded
    bad = bytearray(encode_png(px))
    bad[-5] ^= 0xFF  # flip a bit inside IEND's CRC
    with pytest.raises(ValueError):
        decode_png(bytes(bad))


def test_resize_nearest_semantics():
    px = _gradient(1, 4, 6)
    out = resize_nearest(px, 3, 2)
    assert out.shape == (2, 3, 3)
    # output (y, x) takes input (floor(y*h/oh), floor(x*w/ow))
    assert np.array_equal(out[1, 2], px[2, 4])


def test_decode_image_spark_end_to_end(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(24)
    decoded = decode_image(image_attachments_from_documents(docs)).collect()
    assert len(decoded) == 24
    for r in decoded:
        d = r["owner_id"]
        assert r["err"] is None
        w, h = d % 6 + 2, d % 4 + 2
        assert (r["width"], r["height"]) == (w, h)
        expected = _gradient(d, h, w).reshape(-1)
        assert np.array_equal(np.array(r["pixels"], dtype=np.uint8), expected)
    # undecodable payloads keep the row with err, not an exception
    text_att = attachments_from_documents(docs.limit(3))
    errs = decode_image(text_att).collect()
    assert all(r["err"] is not None and r["width"] is None for r in errs)


def test_resize_image_spark(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(12)
    out = resize_image(image_attachments_from_documents(docs), 4, 4).collect()
    assert len(out) == 12
    for r in out:
        px = decode_bmp(bytes(r["content"]))
        assert px.shape == (4, 4, 3)
        d = r["owner_id"]
        src = _gradient(d, d % 4 + 2, d % 6 + 2)
        assert np.array_equal(px, resize_nearest(src, 4, 4))


def test_sample_frames_spark(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(6)
    vids = video_attachments_from_documents(docs, n_frames=8)
    # 8 frames at 40ms cadence, sampled every 120ms -> indices 0, 3, 6
    frames = sample_frames(vids, every_ms=120, frame_interval_ms=40).collect()
    by_owner: dict[int, list] = {}
    for r in frames:
        by_owner.setdefault(r["owner_id"], []).append(r)
    assert set(len(v) for v in by_owner.values()) == {3}
    for owner, rows in by_owner.items():
        assert sorted(r["frame_index"] for r in rows) == [0, 3, 6]
        for r in rows:
            assert r["ts_ms"] == r["frame_index"] * 40
            px = decode_bmp(bytes(r["frame"]))
            assert px.shape == (3, 4, 3)
    raw = vids.limit(1).collect()[0]
    assert len(split_concatenated_bmps(bytes(raw["content"]))) == 8
