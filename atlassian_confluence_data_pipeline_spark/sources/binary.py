"""Multimodal binary columns (extension X5; reference S6/J4 generalized).

The reference downloads attachments as raw bytes keyed by
(page_id, filename) (confluence_client.py:601-633) and joins them back
into documents (html_generator.py:212-248). The engine's model:

    attachments(owner_id, filename, content BINARY,
                meta STRUCT<mime, n_bytes, kind>)

Ingestion paths: ``spark.read.format("binaryFile")`` for real file
trees; here a deterministic builder derives binary payloads from the
documents fixture so the plumbing (schema, partitioning, Arrow batch
shape) is exercised without external media files.

Decode/feature-extract runs through ``mapInPandas`` — one Arrow batch
per partition. Byte-level features (size, digest, byte histogram) are
REAL, and so is image decode for BMP, PPM, and PNG (the pure
stdlib+numpy codecs in functions/imaging.py — zlib carries the PNG
path). Only transform-coded media (JPEG, audio, video codecs) remains
the documented external-library path: those payloads flow through the
same schema/batching contract and surface as tolerant-load ``err``
rows in decode_image rather than failures.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.functions.text import mime_for_filename


def attachments_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic attachment table derived from `documents`: content
    is the UTF-8 text bytes, filename extension cycles doc_id % 6 (same
    rule as the mime_types query), metadata is a typed struct."""
    ext = (
        F.when(F.col("doc_id") % 6 == 0, "png")
        .when(F.col("doc_id") % 6 == 1, "jpg")
        .when(F.col("doc_id") % 6 == 2, "pdf")
        .when(F.col("doc_id") % 6 == 3, "txt")
        .when(F.col("doc_id") % 6 == 4, "gif")
        .otherwise("xyz")
    )
    filename = F.concat(F.lit("doc_"), F.col("doc_id").cast("string"), F.lit("."), ext)
    content = F.col("text").cast("binary")
    mime = mime_for_filename(filename)
    return docs.select(
        F.col("doc_id").alias("owner_id"),
        filename.alias("filename"),
        content.alias("content"),
        F.struct(
            mime.alias("mime"),
            F.length(content).alias("n_bytes"),
            F.split(mime, "/").getItem(0).alias("kind"),
        ).alias("meta"),
    )


#: output schema of extract_byte_features
BYTE_FEATURES_SCHEMA = (
    "owner_id bigint, filename string, n_bytes int, sha string, "
    "byte_histogram array<int>"
)


def extract_byte_features(attachments: DataFrame, n_buckets: int = 16) -> DataFrame:
    """Byte-level feature extraction over the BINARY column via
    mapInPandas (Arrow-batched; numpy histogram per row). This is the
    real decode-pipeline plumbing; swap ``_features`` for an actual
    image/audio decoder where libraries exist."""
    import hashlib

    import numpy as np

    from atlassian_confluence_data_pipeline_spark.pyfiles import (
        ensure_package_on_workers,
    )

    ensure_package_on_workers()

    def _features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "owner_id": pdf["owner_id"],
                    "filename": pdf["filename"],
                    "n_bytes": pdf["content"].map(len).astype("int32"),
                    "sha": pdf["content"].map(
                        lambda b: hashlib.sha256(b).hexdigest()
                    ),
                    "byte_histogram": pdf["content"].map(
                        lambda b: np.bincount(
                            np.frombuffer(b, dtype=np.uint8) // (256 // n_buckets),
                            minlength=n_buckets,
                        ).astype("int32")
                    ),
                }
            )
            yield out

    return attachments.mapInPandas(_features, schema=BYTE_FEATURES_SCHEMA)


#: deterministic synthetic image fixtures (BMP/PPM alternating) so the
#: decode pipeline is exercised end-to-end without external media files
def image_attachments_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic image attachments derived from `documents`: small
    RGB gradients (size and pixel pattern are pure functions of doc_id),
    encoded 24-bit BMP / P6 PPM / PNG cycling on doc_id % 3 — real
    payloads for the real decoders in functions/imaging.py (PNG rides
    stdlib zlib; same pixels either way, so the decode oracle is
    container-agnostic)."""
    import numpy as np

    from atlassian_confluence_data_pipeline_spark.functions.imaging import (
        encode_bmp,
        encode_png,
        encode_ppm,
    )
    from atlassian_confluence_data_pipeline_spark.pyfiles import (
        ensure_package_on_workers,
    )

    ensure_package_on_workers()

    def _build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = d % 6 + 2, d % 4 + 2
                y, x, c = np.ogrid[:h, :w, :3]
                px = ((d + 7 * x + 13 * y + 101 * c) % 256).astype(np.uint8)
                if d % 3 == 0:
                    rows.append((d, f"img_{d}.bmp", encode_bmp(px)))
                elif d % 3 == 1:
                    rows.append((d, f"img_{d}.ppm", encode_ppm(px)))
                else:
                    rows.append((d, f"img_{d}.png", encode_png(px)))
            yield pd.DataFrame(rows, columns=["owner_id", "filename", "content"])

    return docs.select("doc_id").mapInPandas(
        _build, schema="owner_id bigint, filename string, content binary"
    )


def textured_image_attachments_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic NEAR-DUP image fixtures for the perceptual-hash
    dedup path: every group of 4 consecutive doc_ids shares one 16x16
    quadratic 'texture' (coefficients drawn from the group id mod three
    coprime ranges, so group shapes don't repeat at fixture scale) and
    each variant inverts a 4-row horizontal band — a planted, localized
    edit. dHash distribution measured at 5000 docs: 4997 distinct
    hashes, within-group Hamming centered ~12-17, 16-bit-chunk buckets
    <= 13 wide (candidate volume ~2.2x corpus size — linear). Encoded
    BMP / PPM / PNG cycling doc_id % 3, so the near-dup chain exercises
    all three real codecs."""
    import numpy as np

    from atlassian_confluence_data_pipeline_spark.functions.imaging import (
        encode_bmp,
        encode_png,
        encode_ppm,
    )
    from atlassian_confluence_data_pipeline_spark.pyfiles import (
        ensure_package_on_workers,
    )

    ensure_package_on_workers()

    def _build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                g, v = d // 4, d % 4
                y, x, c = np.ogrid[:16, :16, :3]
                px = (
                    (g % 97) * x * x
                    + ((g * 3) % 89) * y * y
                    + ((g * 7) % 83) * x * y
                    + g
                    + 101 * c
                ) % 256
                band = (y >= 4 * v) & (y < 4 * v + 4)
                px = ((px + 128 * band) % 256).astype(np.uint8)
                if d % 3 == 0:
                    rows.append((d, f"tex_{d}.bmp", encode_bmp(px)))
                elif d % 3 == 1:
                    rows.append((d, f"tex_{d}.ppm", encode_ppm(px)))
                else:
                    rows.append((d, f"tex_{d}.png", encode_png(px)))
            yield pd.DataFrame(rows, columns=["owner_id", "filename", "content"])

    return docs.select("doc_id").mapInPandas(
        _build, schema="owner_id bigint, filename string, content binary"
    )


def dhash_images(attachments: DataFrame) -> DataFrame:
    """Perceptual fingerprints over a BINARY image column: decode +
    dHash in ONE mapInPandas pass (never materializing a pixels column
    — at 100 TB the raster exists only inside the Arrow batch; the
    shuffle carries 8 bytes/image). Undecodable payloads surface as
    tolerant-load ``err`` rows with NULL dhash."""
    from atlassian_confluence_data_pipeline_spark.functions.imaging import (
        decode_image_bytes,
        dhash64,
    )
    from atlassian_confluence_data_pipeline_spark.pyfiles import (
        ensure_package_on_workers,
    )

    ensure_package_on_workers()

    def _dhash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for owner, name, content in zip(
                pdf["owner_id"], pdf["filename"], pdf["content"]
            ):
                try:
                    rows.append(
                        (owner, name, dhash64(decode_image_bytes(bytes(content))), None)
                    )
                except ValueError as exc:
                    rows.append((owner, name, None, str(exc)))
            out = pd.DataFrame(
                rows, columns=["owner_id", "filename", "dhash", "err"],
                dtype=object,
            )
            # object-dtype construction + nullable Int64: letting
            # pd.DataFrame infer float64 on a mixed batch (some
            # undecodable rows) rounds 64-bit hashes through a 53-bit
            # mantissa AT CONSTRUCTION and silently corrupts them
            out["dhash"] = pd.array(out["dhash"], dtype="Int64")
            yield out

    return attachments.select("owner_id", "filename", "content").mapInPandas(
        _dhash, schema="owner_id bigint, filename string, dhash bigint, err string"
    )


DECODE_SCHEMA = (
    "owner_id bigint, filename string, width int, height int, "
    "pixels array<int>, err string"
)


def decode_image(attachments: DataFrame) -> DataFrame:
    """X5 image decode — REAL for the formats the engine's pure-numpy
    codecs cover (24-bit BMP, P6 PPM; functions/imaging.py), via
    mapInPandas over the BINARY column: one Arrow batch per partition,
    decoder stays columnar-adjacent. Undecodable payloads keep their row
    with NULL dimensions and the reason in ``err`` (tolerant-load
    discipline, like the state reader). ``pixels`` is the flattened
    row-major RGB array — at 100 TB you would keep bytes opaque and
    compute per-batch features instead of materializing pixels, which is
    exactly what extract_byte_features does."""
    from atlassian_confluence_data_pipeline_spark.functions.imaging import (
        decode_image_bytes,
    )
    from atlassian_confluence_data_pipeline_spark.pyfiles import (
        ensure_package_on_workers,
    )

    ensure_package_on_workers()

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for owner, name, content in zip(
                pdf["owner_id"], pdf["filename"], pdf["content"]
            ):
                try:
                    px = decode_image_bytes(bytes(content))
                    rows.append(
                        (owner, name, px.shape[1], px.shape[0],
                         px.reshape(-1).astype("int32").tolist(), None)
                    )
                except ValueError as exc:
                    rows.append((owner, name, None, None, None, str(exc)))
            yield pd.DataFrame(
                rows,
                columns=["owner_id", "filename", "width", "height", "pixels", "err"],
            )

    return attachments.select("owner_id", "filename", "content").mapInPandas(
        _decode, schema=DECODE_SCHEMA
    )


RESIZE_SCHEMA = "owner_id bigint, filename string, content binary, width int, height int"
FRAME_SAMPLE_SCHEMA = (
    "owner_id bigint, filename string, frame_index int, frame binary, ts_ms bigint"
)


def resize_image(attachments: DataFrame, width: int, height: int) -> DataFrame:
    """X5 image resize — REAL nearest-neighbor resize (pure index math,
    deterministic) for decodable payloads, re-encoded as BMP.
    Undecodable rows are dropped (they carry no raster to resize); use
    decode_image to audit them."""
    import numpy as np  # noqa: F401 - imaging pulls it on the worker

    from atlassian_confluence_data_pipeline_spark.functions.imaging import (
        decode_image_bytes,
        encode_bmp,
        resize_nearest,
    )
    from atlassian_confluence_data_pipeline_spark.pyfiles import (
        ensure_package_on_workers,
    )

    ensure_package_on_workers()

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for owner, name, content in zip(
                pdf["owner_id"], pdf["filename"], pdf["content"]
            ):
                try:
                    px = decode_image_bytes(bytes(content))
                except ValueError:
                    continue
                out = encode_bmp(resize_nearest(px, width, height))
                rows.append((owner, name, out, width, height))
            yield pd.DataFrame(
                rows, columns=["owner_id", "filename", "content", "width", "height"]
            )

    return attachments.select("owner_id", "filename", "content").mapInPandas(
        _resize, schema=RESIZE_SCHEMA
    )


def split_concatenated_bmps(data: bytes) -> list[bytes]:
    """Split a concatenated-BMP stream into frames using each BMP's
    embedded file-size field (offset 2) — the engine's uncompressed
    'video' container for the frame-sampling contract."""
    import struct

    frames, pos = [], 0
    while pos + 6 <= len(data) and data[pos : pos + 2] == b"BM":
        size = struct.unpack_from("<I", data, pos + 2)[0]
        if size < 14 or pos + size > len(data):
            break
        frames.append(data[pos : pos + size])
        pos += size
    return frames


def video_attachments_from_documents(
    docs: DataFrame, n_frames: int = 8
) -> DataFrame:
    """Deterministic 'video' fixtures: ``n_frames`` BMP frames per doc
    concatenated into one binary payload (frame pixels are a pure
    function of (doc_id, frame))."""
    import numpy as np

    from atlassian_confluence_data_pipeline_spark.functions.imaging import encode_bmp
    from atlassian_confluence_data_pipeline_spark.pyfiles import (
        ensure_package_on_workers,
    )

    ensure_package_on_workers()

    def _build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                y, x, c = np.ogrid[:3, :4, :3]
                payload = b"".join(
                    encode_bmp(((d + f * 17 + 7 * x + 13 * y + c) % 256).astype("uint8"))
                    for f in range(n_frames)
                )
                rows.append((d, f"vid_{d}.cbmp", payload))
            yield pd.DataFrame(rows, columns=["owner_id", "filename", "content"])

    return docs.select("doc_id").mapInPandas(
        _build, schema="owner_id bigint, filename string, content binary"
    )


def sample_frames(
    videos: DataFrame, every_ms: int = 1000, frame_interval_ms: int = 40
) -> DataFrame:
    """X5 video frame sampling — REAL for the engine's uncompressed
    concatenated-BMP container: mapInPandas splits each payload into
    frames (one decoder pass per partition, like the PDF sink's
    converter amortization) and keeps one frame per ``every_ms`` of
    timeline (source cadence ``frame_interval_ms`` per frame).
    Compressed codecs remain the documented ffmpeg path."""
    from atlassian_confluence_data_pipeline_spark.pyfiles import (
        ensure_package_on_workers,
    )

    ensure_package_on_workers()
    stride = max(1, every_ms // frame_interval_ms)

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for owner, name, content in zip(
                pdf["owner_id"], pdf["filename"], pdf["content"]
            ):
                for idx, frame in enumerate(split_concatenated_bmps(bytes(content))):
                    if idx % stride == 0:
                        rows.append(
                            (owner, name, idx, frame, idx * frame_interval_ms)
                        )
            yield pd.DataFrame(
                rows,
                columns=["owner_id", "filename", "frame_index", "frame", "ts_ms"],
            )

    return videos.select("owner_id", "filename", "content").mapInPandas(
        _sample, schema=FRAME_SAMPLE_SCHEMA
    )


def audio_attachments_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic NEAR-DUP audio fixtures (X5 audio; the WAV sibling
    of textured_image_attachments_from_documents): every group of 4
    consecutive doc_ids shares one slowly-varying 65-window amplitude
    envelope (quadratic in the window index, coefficients from the
    group id), carried on an alternating-sign carrier around the 8-bit
    midpoint; each variant boosts 6 consecutive windows by +40 — a
    planted, localized loudness edit. Encoded as REAL 8-bit mono PCM
    RIFF/WAVE payloads (functions/audio.py encode_wav).

    Fingerprint separation measured at 2000 docs: within-group Hamming
    median 5 / p90 8, cross-group p01 21; at threshold 14 the banded
    candidate volume is ~2.0x corpus size with max bucket 9 — linear,
    never all-pairs."""
    import numpy as np

    from atlassian_confluence_data_pipeline_spark.functions.audio import (
        FP_WINDOWS,
        encode_wav,
    )
    from atlassian_confluence_data_pipeline_spark.pyfiles import (
        ensure_package_on_workers,
    )

    ensure_package_on_workers()

    def _build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = 256 + (d % 16) * 16
                g, v = d // 4, d % 4
                t = np.arange(n, dtype=np.int64)
                ww = (t * FP_WINDOWS) // n
                amp = (
                    (g % 37) * ww * ww + ((g * 5) % 31) * ww + 2 * g
                ) % 73 + 8
                band = (ww >= 16 * v) & (ww < 16 * v + 6)
                amp = amp + 40 * band
                carrier = np.where(t % 2 == 0, 1, -1)
                samples = (128 + carrier * amp).astype(np.uint8)
                rows.append((d, f"aud_{d}.wav", encode_wav(samples)))
            yield pd.DataFrame(rows, columns=["owner_id", "filename", "content"])

    return docs.select("doc_id").mapInPandas(
        _build, schema="owner_id bigint, filename string, content binary"
    )


AUDIO_FEATURES_SCHEMA = (
    "owner_id bigint, filename string, sample_rate int, n_samples int, "
    "peak_dev int, energy bigint, n_loud int, err string"
)


def extract_audio_features(attachments: DataFrame) -> DataFrame:
    """X5 audio feature extraction — REAL for the engine's RIFF/WAVE
    codec (functions/audio.py): decode + exact integer folds (peak
    deviation, energy, loud-sample count) in ONE mapInPandas pass; the
    PCM track exists only inside the Arrow batch, the shuffle carries a
    few ints per file. Undecodable payloads (compressed codecs,
    malformed headers) surface as tolerant-load ``err`` rows."""
    from atlassian_confluence_data_pipeline_spark.functions.audio import (
        audio_features,
        decode_wav,
    )
    from atlassian_confluence_data_pipeline_spark.pyfiles import (
        ensure_package_on_workers,
    )

    ensure_package_on_workers()

    def _features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for owner, name, content in zip(
                pdf["owner_id"], pdf["filename"], pdf["content"]
            ):
                try:
                    rate, samples = decode_wav(bytes(content))
                    n, peak, energy, loud = audio_features(samples)
                    rows.append((owner, name, rate, n, peak, energy, loud, None))
                except ValueError as exc:
                    rows.append(
                        (owner, name, None, None, None, None, None, str(exc))
                    )
            out = pd.DataFrame(
                rows,
                columns=[
                    "owner_id",
                    "filename",
                    "sample_rate",
                    "n_samples",
                    "peak_dev",
                    "energy",
                    "n_loud",
                    "err",
                ],
                dtype=object,
            )
            for c in ("sample_rate", "n_samples", "peak_dev", "energy", "n_loud"):
                out[c] = pd.array(out[c], dtype="Int64")
            yield out

    return attachments.select("owner_id", "filename", "content").mapInPandas(
        _features, schema=AUDIO_FEATURES_SCHEMA
    )


def fingerprint_audio(attachments: DataFrame) -> DataFrame:
    """Energy-envelope fingerprints over a BINARY audio column: decode
    + 65-window fold in ONE mapInPandas pass (the audio analogue of
    dhash_images — 8 bytes per track cross the shuffle). Undecodable
    or too-short payloads surface as tolerant-load ``err`` rows with
    NULL fingerprint."""
    from atlassian_confluence_data_pipeline_spark.functions.audio import (
        decode_wav,
        energy_fingerprint64,
    )
    from atlassian_confluence_data_pipeline_spark.pyfiles import (
        ensure_package_on_workers,
    )

    ensure_package_on_workers()

    def _fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for owner, name, content in zip(
                pdf["owner_id"], pdf["filename"], pdf["content"]
            ):
                try:
                    _, samples = decode_wav(bytes(content))
                    rows.append((owner, name, energy_fingerprint64(samples), None))
                except ValueError as exc:
                    rows.append((owner, name, None, str(exc)))
            out = pd.DataFrame(
                rows, columns=["owner_id", "filename", "afp", "err"],
                dtype=object,
            )
            # nullable Int64 — see dhash_images: float64 inference on
            # mixed batches corrupts 64-bit fingerprints
            out["afp"] = pd.array(out["afp"], dtype="Int64")
            yield out

    return attachments.select("owner_id", "filename", "content").mapInPandas(
        _fp, schema="owner_id bigint, filename string, afp bigint, err string"
    )


def textured_video_attachments_from_documents(
    docs: DataFrame, n_frames: int = 8
) -> DataFrame:
    """Deterministic NEAR-DUP video fixtures: every group of 4
    consecutive doc_ids shares the same 8-frame sequence of 16x16
    quadratic textures (frame f's texture id is group*8 + f — the same
    coefficient family as the still-image fixtures), and each variant v
    inverts a 4-row band in exactly ONE frame (index 2*v) — a planted
    single-frame edit, so variants share 7 of 8 frames bit-exact.
    Frames are real encoded BMPs concatenated into the engine's
    uncompressed 'video' container (split_concatenated_bmps)."""
    import numpy as np

    from atlassian_confluence_data_pipeline_spark.functions.imaging import encode_bmp
    from atlassian_confluence_data_pipeline_spark.pyfiles import (
        ensure_package_on_workers,
    )

    ensure_package_on_workers()

    def _build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                g, v = d // 4, d % 4
                y, x, c = np.ogrid[:16, :16, :3]
                frames = []
                for f in range(n_frames):
                    tex = g * 8 + f
                    px = (
                        (tex % 97) * x * x
                        + ((tex * 3) % 89) * y * y
                        + ((tex * 7) % 83) * x * y
                        + tex
                        + 101 * c
                    ) % 256
                    if f == 2 * v:
                        band = (y >= 4 * v) & (y < 4 * v + 4)
                        px = (px + 128 * band) % 256
                    frames.append(encode_bmp(px.astype(np.uint8)))
                rows.append((d, f"vtex_{d}.cbmp", b"".join(frames)))
            yield pd.DataFrame(rows, columns=["owner_id", "filename", "content"])

    return docs.select("doc_id").mapInPandas(
        _build, schema="owner_id bigint, filename string, content binary"
    )


def dhash_video_frames(videos: DataFrame) -> DataFrame:
    """Per-frame perceptual fingerprints over the concatenated-BMP
    video container: split + decode + dHash in ONE mapInPandas pass
    (the video analogue of dhash_images — 8 bytes per frame cross the
    shuffle, the rasters never leave the Arrow batch). Undecodable
    payloads surface as a tolerant-load ``err`` row with NULL hash."""
    from atlassian_confluence_data_pipeline_spark.functions.imaging import (
        decode_bmp,
        dhash64,
    )
    from atlassian_confluence_data_pipeline_spark.pyfiles import (
        ensure_package_on_workers,
    )

    ensure_package_on_workers()

    def _fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for owner, name, content in zip(
                pdf["owner_id"], pdf["filename"], pdf["content"]
            ):
                frames = split_concatenated_bmps(bytes(content))
                if not frames:
                    rows.append((owner, name, None, None, "no decodable frames"))
                    continue
                for idx, frame in enumerate(frames):
                    try:
                        rows.append(
                            (owner, name, idx, dhash64(decode_bmp(frame)), None)
                        )
                    except ValueError as exc:
                        rows.append((owner, name, idx, None, str(exc)))
            out = pd.DataFrame(
                rows,
                columns=["owner_id", "filename", "frame_index", "fh", "err"],
                dtype=object,
            )
            # nullable Int64 — see dhash_images: float64 inference on
            # mixed batches corrupts 64-bit frame hashes
            out["frame_index"] = pd.array(out["frame_index"], dtype="Int64")
            out["fh"] = pd.array(out["fh"], dtype="Int64")
            yield out

    return videos.select("owner_id", "filename", "content").mapInPandas(
        _fp,
        schema=(
            "owner_id bigint, filename string, frame_index int, "
            "fh bigint, err string"
        ),
    )


def audio_window_energies(attachments: DataFrame) -> DataFrame:
    """Per-track 65-window exact energy envelopes (the arrays the
    fingerprint's adjacent-compare bits are derived from), decoded and
    folded in ONE mapInPandas pass — the calibration-side companion of
    fingerprint_audio (65 bigints per track cross the shuffle)."""
    import numpy as np

    from atlassian_confluence_data_pipeline_spark.functions.audio import (
        FP_WINDOWS,
        decode_wav,
    )
    from atlassian_confluence_data_pipeline_spark.pyfiles import (
        ensure_package_on_workers,
    )

    ensure_package_on_workers()

    def _env(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for owner, name, content in zip(
                pdf["owner_id"], pdf["filename"], pdf["content"]
            ):
                try:
                    _, s = decode_wav(bytes(content))
                    n = int(s.size)
                    if n < FP_WINDOWS:
                        raise ValueError("too short for the window fold")
                    dev = s.astype(np.int64) - 128
                    sq = dev * dev
                    ww = (np.arange(n, dtype=np.int64) * FP_WINDOWS) // n
                    e = np.zeros(FP_WINDOWS, dtype=np.int64)
                    np.add.at(e, ww, sq)
                    rows.append((owner, name, e.tolist(), None))
                except ValueError as exc:
                    rows.append((owner, name, None, str(exc)))
            yield pd.DataFrame(
                rows, columns=["owner_id", "filename", "env", "err"]
            )

    return attachments.select("owner_id", "filename", "content").mapInPandas(
        _env,
        schema="owner_id bigint, filename string, env array<bigint>, err string",
    )
