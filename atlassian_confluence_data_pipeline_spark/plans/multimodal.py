"""Multimodal + LSH queries (extensions X2/X5).

The attachment-stats query is oracle-checked (metadata plumbing is pure
SQL); the LSH queries use engine-specific hashing (xxhash64) that DuckDB
cannot reproduce, so they register rows-only — their semantics are
covered by planted-pair unit tests (tests/test_lsh.py) and by the exact
Jaccard verifier, which IS oracle-checked via near_dup_pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.operators.lsh import (
    minhash_lsh_candidates,
    simhash,
    simhash_near_pairs,
    verify_candidates_jaccard,
)
from atlassian_confluence_data_pipeline_spark.plans.registry import query
from atlassian_confluence_data_pipeline_spark.plans.textops import _shingles, _words
from atlassian_confluence_data_pipeline_spark.sources.binary import (
    attachments_from_documents,
)


@query(
    "multimodal_attachment_stats",
    oracle="""
WITH files AS (
  SELECT doc_id,
         CASE CAST(doc_id % 6 AS INT)
           WHEN 0 THEN 'image/png' WHEN 1 THEN 'image/jpeg'
           WHEN 2 THEN 'application/pdf' WHEN 3 THEN 'text/plain'
           WHEN 4 THEN 'image/gif' ELSE 'application/octet-stream' END AS mime,
         octet_length(encode(text)) AS n_bytes
  FROM documents
)
SELECT mime,
       split_part(mime, '/', 1) AS kind,
       count(*) AS n_files,
       CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
       CAST(max(n_bytes) AS INT) AS max_bytes
FROM files GROUP BY 1, 2
""",
    tags=("multimodal", "binary", "agg"),
)
def multimodal_attachment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal binary columns X5: attachments as BINARY content +
    typed STRUCT metadata (mime, size, kind), aggregated per media type.
    Exercises the binary ingestion schema end-to-end; byte payload sizes
    are oracle-exact."""
    docs = load_table(spark, sf_dir, "documents")
    att = attachments_from_documents(docs)
    return (
        att.groupBy(
            F.col("meta.mime").alias("mime"), F.col("meta.kind").alias("kind")
        )
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("meta.n_bytes").cast("bigint").alias("total_bytes"),
            F.max("meta.n_bytes").cast("int").alias("max_bytes"),
        )
    )


@query("minhash_lsh_pairs", oracle=None, tags=("dedup", "neardup", "lsh"))
def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup X2 (scale path): shingle -> 32-perm MinHash
    -> 8-band bucket join -> exact-Jaccard verify >= 0.05. Candidate
    generation is an equi-join on band buckets (near-linear); the O(n^2)
    all-pairs comparison never happens. Rows-only check: xxhash64 is not
    reproducible in DuckDB; semantics covered by tests/test_lsh.py."""
    docs = load_table(spark, sf_dir, "documents")
    sh = (
        docs.select("doc_id", _words(F.col("text")).alias("w"))
        .select("doc_id", _shingles(F.col("w")).alias("sh"))
        .filter(F.size("sh") > 0)
        .persist()
    )
    cand = minhash_lsh_candidates(sh, "doc_id", "sh")
    return verify_candidates_jaccard(cand, sh, "doc_id", "sh", threshold=0.05).select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    )


@query("simhash_pairs", oracle=None, tags=("dedup", "neardup", "simhash"))
def simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup X2: 64-bit fingerprint per doc (explode + one
    HashAggregate), candidate pairs via 16-bit chunk pigeonhole banding,
    exact Hamming filter <= 12. Rows-only (engine-specific hash)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", _words(F.col("text")).alias("toks"))
    hashes = simhash(toks, "doc_id", "toks")
    return simhash_near_pairs(hashes, "doc_id", max_hamming=12)
