"""Image near-dup dedup (plans/multimodal2.py): dHash semantics on
crafted rasters, codec-roundtrip invariance, and planted-duplicate
recovery through the banded Hamming join."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.functions.imaging import (
    dhash64,
    encode_bmp,
    encode_png,
    encode_ppm,
)
from atlassian_confluence_data_pipeline_spark.operators.lsh import simhash_near_pairs
from atlassian_confluence_data_pipeline_spark.sources.binary import dhash_images


def _texture(seed: int, h: int = 16, w: int = 16) -> np.ndarray:
    y, x, c = np.ogrid[:h, :w, :3]
    return ((seed * 31 + 7 * x * x + 13 * y * y + 5 * x * y + 101 * c) % 256).astype(
        np.uint8
    )


def test_dhash_identical_images_equal_hash():
    assert dhash64(_texture(3)) == dhash64(_texture(3))


def test_dhash_is_signed_64bit():
    vals = [dhash64(_texture(s)) for s in range(40)]
    assert all(-(1 << 63) <= v < (1 << 63) for v in vals)
    assert len(set(vals)) > 30  # textures hash apart


def test_dhash_invariant_to_constant_brightness_shift():
    """dHash compares ADJACENT grays, so a global +10 brightness (no
    wraps) must not change a single bit — the property that makes it a
    perceptual hash rather than a content hash."""
    px = _texture(5) % 200  # headroom so +10 never wraps
    assert dhash64(px.astype(np.uint8)) == dhash64((px + 10).astype(np.uint8))


def test_dhash_localized_edit_flips_few_bits():
    px = _texture(9)
    edited = px.copy()
    edited[0:4, :, :] = 255 - edited[0:4, :, :]  # invert top band
    d = dhash64(px) ^ dhash64(edited)
    ham = bin(d & ((1 << 64) - 1)).count("1")
    assert 0 < ham <= 24  # changed, but far from the ~32 of random pairs


def test_dhash_codec_roundtrip_invariance():
    """The same raster through all three real codecs must hash
    identically — decode is lossless for BMP/PPM/PNG."""
    from atlassian_confluence_data_pipeline_spark.functions.imaging import (
        decode_image_bytes,
    )

    px = _texture(7)
    hashes = {
        dhash64(decode_image_bytes(enc(px)))
        for enc in (encode_bmp, encode_ppm, encode_png)
    }
    assert hashes == {dhash64(px)}


def test_planted_duplicates_recovered_through_banded_join(spark):
    """Crafted-duplicate recovery: two exact copies plus one
    lightly-edited near-copy land in the pair output via the 16-bit
    chunk pigeonhole join; an unrelated texture does not pair with
    them at the threshold."""
    px = _texture(11)
    near = px.copy()
    near[2:5, :, :] = 255 - near[2:5, :, :]
    other = _texture(400)
    rows = [
        (1, "a.bmp", bytearray(encode_bmp(px))),
        (2, "b.ppm", bytearray(encode_ppm(px))),
        (3, "c.png", bytearray(encode_png(near))),
        (4, "d.bmp", bytearray(encode_bmp(other))),
    ]
    att = spark.createDataFrame(
        rows, "owner_id bigint, filename string, content binary"
    )
    fp = dhash_images(att).select(
        F.col("owner_id").alias("doc_id"), F.col("dhash").alias("simhash")
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_near_pairs(
            fp, "doc_id", max_hamming=16, chunks=4
        ).collect()
    }
    assert pairs.get((1, 2)) == 0  # exact copies across codecs
    assert (1, 3) in pairs and 0 < pairs[(1, 3)] <= 16
    assert not any(4 in p for p in pairs)


def test_dhash_images_tolerant_err_rows(spark):
    rows = [
        (1, "ok.bmp", bytearray(encode_bmp(_texture(1)))),
        (2, "bad.jpg", bytearray(b"\xff\xd8\xff\xe0 not decodable")),
    ]
    att = spark.createDataFrame(
        rows, "owner_id bigint, filename string, content binary"
    )
    got = {r["owner_id"]: r for r in dhash_images(att).collect()}
    assert got[1]["dhash"] is not None and got[1]["err"] is None
    assert got[2]["dhash"] is None and "unsupported" in got[2]["err"]
