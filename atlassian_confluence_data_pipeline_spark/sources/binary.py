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
REAL; actual image/audio decode is STUBBED behind NotImplementedError
because no media libraries exist in this container — the Spark-side
contract (signatures, schemas, batching) is what the engine defines.
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


def decode_image(attachments: DataFrame) -> DataFrame:  # pragma: no cover
    """STUB — image decode requires media libraries absent from this
    container. The engine-side contract: mapInPandas over the binary
    column yielding (owner_id, width, height, pixels ARRAY<ARRAY<INT>>).
    """
    raise NotImplementedError(
        "image decode needs PIL/cv2; byte-level features are implemented "
        "in extract_byte_features — same plumbing, real decoder slots in."
    )


#: contract schemas for the stubbed media transforms — the Spark-side
#: shape (signature, Arrow batching, partitioning) is the engine's part;
#: the decoder body slots in where media libs exist.
RESIZE_SCHEMA = "owner_id bigint, filename string, content binary, width int, height int"
FRAME_SAMPLE_SCHEMA = (
    "owner_id bigint, filename string, frame_index int, frame binary, ts_ms bigint"
)


def resize_image(
    attachments: DataFrame, width: int, height: int
) -> DataFrame:  # pragma: no cover
    """STUB — image resize (mapInPandas over BINARY -> RESIZE_SCHEMA,
    one Arrow batch per partition). Requires PIL/cv2."""
    raise NotImplementedError(
        f"resize to {width}x{height} needs an image library; contract "
        f"schema: {RESIZE_SCHEMA}"
    )


def sample_frames(
    videos: DataFrame, every_ms: int = 1000
) -> DataFrame:  # pragma: no cover
    """STUB — video frame sampling (mapInPandas over BINARY ->
    FRAME_SAMPLE_SCHEMA; one decoder process per partition, like the PDF
    sink's converter amortization). Requires ffmpeg/cv2."""
    raise NotImplementedError(
        f"frame sampling every {every_ms}ms needs a video library; "
        f"contract schema: {FRAME_SAMPLE_SCHEMA}"
    )
