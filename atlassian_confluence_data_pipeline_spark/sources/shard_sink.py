"""Curated-shard materialization — the capstone SINK job (round-7
next-round item 2): chain the full-curation survivors
(plans/curation.py curated_survivor_docs) through the portable shard
placement and shard-local packing (plans/curation8.py
shard_packed_frame) into the artifact a training run actually
consumes: ``shard_id=N/`` partitioned parquet behind an ATOMIC
manifest.

Commit protocol (the AppendIndexStore / html_sink pointer-flip
discipline, applied to a batch corpus build):

- the whole dataset is written to a hidden ``.tmp-data-{nonce}``
  staging dir — a failed/killed job never touches the published view;
- the staged files are READ BACK to compute the manifest's per-shard
  row/token/window counts (so the manifest describes the bytes on
  disk, not the plan that produced them);
- publish = rename staging to ``data-{nonce}``, then write the
  manifest JSON via tmp-file + ``os.replace`` (atomic on POSIX) — a
  reader either sees the previous complete corpus or the new one;
- the superseded ``data-*`` dir is removed AFTER the pointer flip;
  ``.tmp-*`` leftovers from crashed runs are swept on the next
  publish. Replays are idempotent: the content is a deterministic
  function of the input fixtures, so re-running flips the pointer to
  a byte-equivalent corpus.

Reference analog: the output_generator stage (html_generator.py:50-64
writes the consumable artifact tree) generalized to the training-data
deliverable.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.plans.packing import CTX_TOKENS

MANIFEST = "MANIFEST.json"


def _sweep_stale(out_path: str, keep: str | None) -> None:
    """Remove crashed-run staging dirs and superseded data dirs (all
    but ``keep``). Best-effort; the manifest pointer is the truth."""
    for d in os.listdir(out_path):
        p = os.path.join(out_path, d)
        if d.startswith(".tmp-data-") or (
            d.startswith("data-") and d != keep and os.path.isdir(p)
        ):
            shutil.rmtree(p, ignore_errors=True)


def materialize_curated_shards(
    spark: SparkSession,
    sf_dir: str,
    out_path: str,
    ctx_tokens: int = CTX_TOKENS,
) -> dict:
    """Run curate -> shard -> pack -> write and atomically publish the
    result under ``out_path``. Returns the committed manifest dict.

    Written columns: shard_id, doc_id, lang, source, text, tok,
    shard_cum (inclusive per-shard token prefix), window_id (the
    shard-local CTX window the document STARTS in), split (1 when the
    window's right edge chops it). Files are partitioned by shard_id,
    so a training worker reads exactly its ``shard_id=N/`` directory.

    Scale shape: the curation stages are the engine's scale-path
    variants (banded LSH, digest hash-agg); the per-shard prefix is
    the range-bucketed two-pass distributed_prefix_rank (no whole-shard
    single task); the write is one shuffle-free partitioned parquet
    job; manifest stats are one aggregate over the staged files."""
    from atlassian_confluence_data_pipeline_spark.plans.curation import (
        curated_survivor_docs,
    )
    from atlassian_confluence_data_pipeline_spark.plans.curation8 import (
        shard_packed_frame,
    )

    os.makedirs(out_path, exist_ok=True)
    survivors = curated_survivor_docs(spark, sf_dir).withColumn(
        "tok", F.col("n_words").cast("bigint")
    )
    packed = shard_packed_frame(
        survivors.select("doc_id", "lang", "source", "text", "tok")
    ).select(
        "shard_id",
        "doc_id",
        "lang",
        "source",
        "text",
        "tok",
        "shard_cum",
        "window_id",
        "split",
    )

    nonce = f"{time.time_ns():x}"
    staging = os.path.join(out_path, f".tmp-data-{nonce}")
    packed.write.mode("overwrite").partitionBy("shard_id").parquet(staging)

    # manifest stats from the BYTES ON DISK, not the plan
    staged = spark.read.parquet(staging)
    per_shard = {
        int(r["shard_id"]): {
            "n_docs": int(r["n_docs"]),
            "n_tokens": int(r["n_tokens"]),
            "n_windows": int(r["n_windows"]),
            "n_chopped": int(r["n_chopped"]),
        }
        for r in staged.groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tok").alias("n_tokens"),
            F.expr(f"(sum(tok) + {ctx_tokens - 1}) DIV {ctx_tokens}").alias(
                "n_windows"
            ),
            F.sum("split").alias("n_chopped"),
        )
        .collect()
    }
    n_files = sum(
        1
        for root, _, files in os.walk(staging)
        for f in files
        if f.endswith(".parquet")
    )
    manifest = {
        "dir": f"data-{nonce}",
        "sf_dir": sf_dir,
        "ctx_tokens": ctx_tokens,
        "n_files": n_files,
        "n_docs": sum(s["n_docs"] for s in per_shard.values()),
        "n_tokens": sum(s["n_tokens"] for s in per_shard.values()),
        "n_windows": sum(s["n_windows"] for s in per_shard.values()),
        "n_chopped": sum(s["n_chopped"] for s in per_shard.values()),
        "shards": {str(k): v for k, v in sorted(per_shard.items())},
    }

    data_dir = os.path.join(out_path, f"data-{nonce}")
    os.rename(staging, data_dir)
    tmp = os.path.join(out_path, f".ptr-{nonce}")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(out_path, MANIFEST))
    _sweep_stale(out_path, keep=f"data-{nonce}")
    return manifest


def read_manifest(out_path: str) -> dict | None:
    p = os.path.join(out_path, MANIFEST)
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return json.load(fh)


def read_curated_shards(spark: SparkSession, out_path: str) -> DataFrame:
    """Load the committed corpus through the manifest pointer — never
    by globbing (a half-published directory is invisible)."""
    man = read_manifest(out_path)
    if man is None:
        raise FileNotFoundError(f"no committed corpus under {out_path}")
    return spark.read.parquet(os.path.join(out_path, man["dir"]))


# ---------------------------------------------------------------------------
# Incremental curated-shard maintenance (round-9 VERDICT item 3): the
# streaming curation job composes with this appender so each
# micro-batch's ACCEPTED docs extend the shard-partitioned corpus
# behind the manifest flip, instead of a full rebuild per batch.
# ---------------------------------------------------------------------------

def _empty_incremental_manifest(ctx_tokens: int) -> dict:
    return {
        "format": "incremental",
        "ctx_tokens": ctx_tokens,
        "batches": [],
        "dirs": [],
        "n_docs": 0,
        "n_tokens": 0,
        "n_chopped": 0,
        "shards": {},
    }


def append_shard_batch(
    spark: SparkSession,
    accepted: DataFrame,
    out_path: str,
    batch_id: int,
    ctx_tokens: int = CTX_TOKENS,
) -> dict:
    """Append ONE micro-batch of curated docs ``(doc_id, text, tok)``
    to an incrementally-maintained shard corpus under ``out_path``.

    Packing contract: ARRIVAL order — each batch's docs pack at the
    END of their shard, continuing from the per-shard token offsets the
    committed manifest records (within a batch, doc_id order — the
    shard_packed_frame prefix). Equals the single-batch build whenever
    arrival order is doc_id order, the same equivalence contract as
    foreach_batch_curation (streaming/jobs.py).

    Crash safety mirrors materialize_curated_shards: batch data is
    staged to ``.tmp-batch-{id}``, renamed to ``batch-{id}``, and only
    then does the manifest flip (tmp + ``os.replace``). Replays are
    idempotent at EVERY crash point: a batch already in the manifest is
    a no-op (offsets never double-advance); a ``batch-{id}`` dir
    without a manifest entry is a crashed flip and is rebuilt in place.
    The window arithmetic (window_id, split) is recomputed against the
    offset cumulative sums, so chop flags are identical to a one-shot
    build over the concatenated arrivals."""
    from atlassian_confluence_data_pipeline_spark.plans.curation8 import (
        shard_packed_frame,
    )

    os.makedirs(out_path, exist_ok=True)
    man = read_manifest(out_path)
    if man is None:
        man = _empty_incremental_manifest(ctx_tokens)
    if man.get("format") != "incremental":
        raise ValueError(
            f"{out_path} holds a '{man.get('format', 'full')}' corpus; "
            "incremental append requires an incremental manifest"
        )
    if int(man["ctx_tokens"]) != int(ctx_tokens):
        raise ValueError(
            f"ctx_tokens mismatch: corpus committed at {man['ctx_tokens']}, "
            f"append requested {ctx_tokens} — window ids would be inconsistent"
        )
    bid = int(batch_id)
    if bid in man["batches"]:
        return man  # committed replay -> no-op

    accepted = accepted.select("doc_id", "text", "tok")
    if accepted.isEmpty():
        # An all-rejected micro-batch must still COMMIT: a zero-row
        # partitioned write leaves only _SUCCESS behind and the staged
        # read-back raises UNABLE_TO_INFER_SCHEMA, which would
        # crash-loop every replay. Record the batch id (so replays
        # no-op) and flip the manifest without a data dir.
        man["batches"].append(bid)
        tmp = os.path.join(out_path, f".ptr-{bid}")
        with open(tmp, "w") as fh:
            json.dump(man, fh, indent=1, sort_keys=True)
        os.replace(tmp, os.path.join(out_path, MANIFEST))
        return man

    packed = shard_packed_frame(accepted)
    offsets = {int(k): int(v["n_tokens"]) for k, v in man["shards"].items()}
    if offsets:
        off_df = spark.createDataFrame(
            [(k, v) for k, v in offsets.items()], "__osh int, __off bigint"
        )
        packed = (
            packed.join(
                F.broadcast(off_df),
                packed["shard_id"] == off_df["__osh"],
                "left",
            )
            .withColumn(
                "shard_cum",
                F.col("shard_cum") + F.coalesce(F.col("__off"), F.lit(0)),
            )
            .drop("__osh", "__off")
        )
    win = F.expr(f"(shard_cum - tok) DIV {ctx_tokens}")
    endw = F.expr(f"(shard_cum - 1) DIV {ctx_tokens}")
    packed = (
        packed.withColumn("window_id", win)
        .withColumn("split", F.when(endw > win, 1).otherwise(0))
        .select(
            "shard_id", "doc_id", "text", "tok",
            "shard_cum", "window_id", "split",
        )
    )

    staging = os.path.join(out_path, f".tmp-batch-{bid}")
    shutil.rmtree(staging, ignore_errors=True)
    packed.write.mode("overwrite").partitionBy("shard_id").parquet(staging)

    # stats from the bytes on disk, not the plan
    staged = spark.read.parquet(staging)
    rows = (
        staged.groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tok").alias("n_tokens"),
            F.sum("split").alias("n_chopped"),
        )
        .collect()
    )

    data_dir = os.path.join(out_path, f"batch-{bid}")
    # a data dir without a manifest entry is a crashed flip -> rebuild
    shutil.rmtree(data_dir, ignore_errors=True)
    os.rename(staging, data_dir)

    n_docs = n_tokens = n_chopped = 0
    for r in rows:
        s = man["shards"].setdefault(
            str(int(r["shard_id"])),
            {"n_docs": 0, "n_tokens": 0, "n_chopped": 0},
        )
        s["n_docs"] += int(r["n_docs"])
        s["n_tokens"] += int(r["n_tokens"])
        s["n_chopped"] += int(r["n_chopped"])
        n_docs += int(r["n_docs"])
        n_tokens += int(r["n_tokens"])
        n_chopped += int(r["n_chopped"])
    man["batches"].append(bid)
    if rows:
        man["dirs"].append(f"batch-{bid}")
    man["n_docs"] += n_docs
    man["n_tokens"] += n_tokens
    man["n_chopped"] += n_chopped
    # windows derive from per-shard token mass, identical to the batch
    # sink's ceil-division over each shard's final cumulative count
    man["n_windows"] = sum(
        (s["n_tokens"] + ctx_tokens - 1) // ctx_tokens
        for s in man["shards"].values()
    )

    tmp = os.path.join(out_path, f".ptr-{bid}")
    with open(tmp, "w") as fh:
        json.dump(man, fh, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(out_path, MANIFEST))
    return man


def read_incremental_shards(spark: SparkSession, out_path: str) -> DataFrame:
    """Load the committed incremental corpus through the manifest
    pointer — only ``batch-*`` dirs the manifest lists are visible, so
    a crashed flip's orphan data is invisible exactly like the batch
    sink's ``.tmp-*`` staging."""
    man = read_manifest(out_path)
    if man is None or man.get("format") != "incremental":
        raise FileNotFoundError(
            f"no committed incremental corpus under {out_path}"
        )
    dirs = [os.path.join(out_path, d) for d in man["dirs"]]
    if not dirs:
        raise FileNotFoundError(f"incremental corpus under {out_path} is empty")
    # one read per batch dir, unioned: each dir is its own shard_id=N/
    # partition tree, and Spark's multi-path partition discovery rejects
    # sibling roots with independent partition layouts
    out = spark.read.parquet(dirs[0])
    for d in dirs[1:]:
        out = out.unionByName(spark.read.parquet(d))
    return out


# ---------------------------------------------------------------------------
# Generic batch-keyed manifest-flip sink (round-11 VERDICT item 6): the
# append_shard_batch commit protocol for arbitrary per-batch increment
# tables — streaming DPO pairs use it; any foreachBatch emitter can.
# ---------------------------------------------------------------------------

def append_manifest_batch(
    spark: SparkSession,
    df: DataFrame,
    out_path: str,
    batch_id: int,
    fmt: str = "increments",
) -> dict:
    """Append ONE micro-batch increment table under ``out_path`` behind
    the manifest flip. Crash safety mirrors append_shard_batch: stage
    to ``.tmp-batch-{id}``, rename to ``batch-{id}``, then flip the
    manifest (tmp + ``os.replace``). Replays are idempotent at EVERY
    crash point — a batch already in the manifest is a no-op; a
    ``batch-{id}`` dir without a manifest entry is a crashed flip and
    is rebuilt in place; an empty batch commits manifest-only (the
    all-rejected-batch lesson, append_shard_batch)."""
    os.makedirs(out_path, exist_ok=True)
    man = read_manifest(out_path)
    if man is None:
        man = {"format": fmt, "batches": [], "dirs": [], "n_rows": 0}
    if man.get("format") != fmt:
        raise ValueError(
            f"{out_path} holds a '{man.get('format', 'full')}' artifact;"
            f" append requires format '{fmt}'"
        )
    bid = int(batch_id)
    if bid in man["batches"]:
        return man  # committed replay -> no-op

    def _flip() -> None:
        tmp = os.path.join(out_path, f".ptr-{bid}")
        with open(tmp, "w") as fh:
            json.dump(man, fh, indent=1, sort_keys=True)
        os.replace(tmp, os.path.join(out_path, MANIFEST))

    if df.isEmpty():
        man["batches"].append(bid)
        _flip()
        return man
    staging = os.path.join(out_path, f".tmp-batch-{bid}")
    shutil.rmtree(staging, ignore_errors=True)
    df.write.mode("overwrite").parquet(staging)
    n_rows = spark.read.parquet(staging).count()
    data_dir = os.path.join(out_path, f"batch-{bid}")
    # a data dir without a manifest entry is a crashed flip -> rebuild
    shutil.rmtree(data_dir, ignore_errors=True)
    os.rename(staging, data_dir)
    man["batches"].append(bid)
    man["dirs"].append(f"batch-{bid}")
    man["n_rows"] += int(n_rows)
    _flip()
    return man


def read_manifest_batches(
    spark: SparkSession, out_path: str, schema: str, fmt: str = "increments"
) -> DataFrame:
    """Union of all committed increment batches under ``out_path`` —
    only manifest-listed dirs are visible (orphaned crashed-flip data
    is invisible); an empty/absent artifact reads as an empty frame of
    ``schema``."""
    man = read_manifest(out_path)
    if man is not None and man.get("format") != fmt:
        raise FileNotFoundError(
            f"no committed '{fmt}' artifact under {out_path}"
        )
    if man is None or not man["dirs"]:
        return spark.createDataFrame([], schema)
    return spark.read.parquet(
        *[os.path.join(out_path, d) for d in man["dirs"]]
    )
