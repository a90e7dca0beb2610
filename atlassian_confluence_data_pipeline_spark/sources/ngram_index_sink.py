"""Inverted n-gram index materialization — the decontamination-probe
SINK: one posting row per (distinct 3-word shingle hash, document),
written as ``bucket=N/`` partitioned parquet behind the same atomic
manifest discipline as the curated-shard sink (shard_sink.py).

Why it exists: at 100 TB, "does this benchmark sentence appear in the
corpus?" must not be a corpus scan. With postings bucketed by
``h % n_buckets``, a probe set of shingle hashes reads ONLY its bucket
directories (static partition pruning on the bucket column) and
answers membership with one small equi-join — the offline index behind
decontaminate_overlap's online form.

Commit protocol: stage to a hidden ``.tmp-data-{nonce}`` dir, read the
staged bytes back for the manifest's bucket/posting counts, publish by
rename + atomic manifest replace, sweep superseded dirs after the
flip. Replays are idempotent (the index is a deterministic function of
the fixtures).

Reference analog: the reference's state index keyed by page id
(utilities/state_manager.py:60-99) generalized to a content-keyed
posting index.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "MANIFEST.json"

#: posting buckets — the unit of probe-side partition pruning
N_BUCKETS = 64


def _sweep_stale(out_path: str, keep: str | None) -> None:
    for d in os.listdir(out_path):
        p = os.path.join(out_path, d)
        if d.startswith(".tmp-data-") or (
            d.startswith("data-") and d != keep and os.path.isdir(p)
        ):
            shutil.rmtree(p, ignore_errors=True)


def materialize_ngram_index(
    spark: SparkSession,
    sf_dir: str,
    out_path: str,
    n_buckets: int = N_BUCKETS,
) -> dict:
    """Build and atomically publish the inverted shingle index under
    ``out_path``. Returns the committed manifest dict.

    Written columns: bucket (= h % n_buckets, the partition key),
    h (the 3-shingle rolling hash), doc_id. Scale shape: the posting
    list is the session-shared exploded-shingle stage (one corpus fold,
    narrow bigints); the write is one partitioned parquet job; the
    manifest rollup is one aggregate over the staged files."""
    from atlassian_confluence_data_pipeline_spark.plans.curation6 import (
        _exploded_shingles,
    )

    os.makedirs(out_path, exist_ok=True)
    nonce = uuid.uuid4().hex[:12]
    staging = os.path.join(out_path, f".tmp-data-{nonce}")
    postings = _exploded_shingles(spark, sf_dir).select(
        (F.col("h") % n_buckets).cast("int").alias("bucket"),
        "h",
        "doc_id",
    )
    postings.write.mode("overwrite").partitionBy("bucket").parquet(staging)

    staged = spark.read.parquet(staging)
    stats = staged.agg(
        F.count(F.lit(1)).alias("n_postings"),
        F.countDistinct("h").alias("n_ngrams"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.countDistinct("bucket").alias("n_buckets_present"),
    ).collect()[0]

    final_dir = f"data-{nonce}"
    os.rename(staging, os.path.join(out_path, final_dir))
    manifest = {
        "data_dir": final_dir,
        "n_buckets": n_buckets,
        "n_postings": int(stats["n_postings"]),
        "n_ngrams": int(stats["n_ngrams"]),
        "n_docs": int(stats["n_docs"]),
        "n_buckets_present": int(stats["n_buckets_present"]),
        "committed_at": time.time(),
    }
    tmp_manifest = os.path.join(out_path, f".tmp-manifest-{nonce}")
    with open(tmp_manifest, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp_manifest, os.path.join(out_path, MANIFEST))
    _sweep_stale(out_path, keep=final_dir)
    return manifest


def read_ngram_index(spark: SparkSession, out_path: str) -> DataFrame:
    """The committed view: read the manifest pointer, then the data dir
    it names — never a half-written staging dir."""
    with open(os.path.join(out_path, MANIFEST)) as fh:
        manifest = json.load(fh)
    return spark.read.parquet(
        os.path.join(out_path, manifest["data_dir"])
    )


def probe_ngram_index(
    spark: SparkSession,
    out_path: str,
    probe_docs: DataFrame,
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """Decontamination probe: shingle the probe docs with the SAME
    portable hash family, then join ONLY the buckets the probe hashes
    land in (an IN-list filter on the partition column — static
    partition pruning, so a 10-shingle probe touches at most 10 of the
    ``n_buckets`` directories, never the whole index). Returns
    (probe_id, doc_id, n_shared) — corpus documents sharing at least
    one shingle with each probe."""
    from atlassian_confluence_data_pipeline_spark.functions.text import (
        rolling_hash,
    )
    from atlassian_confluence_data_pipeline_spark.operators.lsh import (
        shingle_hashes_from_word_hashes,
    )

    probe = (
        probe_docs.select(
            "probe_id", F.split(F.trim(F.col("text")), r"\s+").alias("w")
        )
        .select(
            "probe_id",
            F.transform(F.col("w"), rolling_hash).alias("wh"),
        )
        .select(
            "probe_id",
            F.explode(
                shingle_hashes_from_word_hashes(F.col("wh"))
            ).alias("h"),
        )
        .select("probe_id", "h", (F.col("h") % n_buckets).cast("int").alias("bucket"))
    )
    # bounded collect: one int per probe shingle bucket (<= n_buckets)
    buckets = [
        r["bucket"] for r in probe.select("bucket").distinct().collect()
    ]
    index = read_ngram_index(spark, out_path).filter(
        F.col("bucket").isin(buckets)
    )
    return (
        probe.join(index, ["bucket", "h"])
        .groupBy("probe_id", "doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
    )
