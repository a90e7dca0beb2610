"""Binary/multimodal column plumbing: attachment schema, Arrow-batched
byte-feature extraction, decode stub contract."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.sources.binary import (
    attachments_from_documents,
    decode_image,
    extract_byte_features,
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


def test_decode_image_is_declared_stub(spark, sf_dir):
    with pytest.raises(NotImplementedError):
        decode_image(None)
