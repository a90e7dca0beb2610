"""Round-10 ADVICE regression tests: empty-micro-batch shard append,
conformal empty-calibration guard, nested-rewrite fingerprint
freshness, and legacy-reap identity scoping."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.plans import _cache
from atlassian_confluence_data_pipeline_spark.sources.shard_sink import (
    append_shard_batch,
    read_manifest,
)

CTX = 16
BASE = " ".join(f"w{i:02d}" for i in range(1, 21))


def _tok_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string").select(
        "doc_id",
        "text",
        F.size(F.split(F.trim("text"), r"\s+")).cast("bigint").alias("tok"),
    )


def test_append_empty_batch_commits_and_noops(spark, tmp_path):
    """ADVICE (high): an all-rejected micro-batch must COMMIT (record
    its batch id, flip the manifest, write no data dir) instead of
    crashing on the zero-row partitioned staging read — which made
    every streaming replay crash-loop."""
    out = str(tmp_path / "out")
    empty = _tok_df(spark, [(1, BASE)]).filter("doc_id < 0")

    # empty FIRST batch: manifest created, no data dirs, no counts
    man0 = append_shard_batch(spark, empty, out, 0, ctx_tokens=CTX)
    assert man0["batches"] == [0]
    assert man0["dirs"] == []
    assert man0["n_docs"] == 0
    assert not os.path.isdir(os.path.join(out, "batch-0"))
    assert read_manifest(out) == man0  # flip actually happened

    # replay of the committed empty batch is a strict no-op
    assert append_shard_batch(spark, empty, out, 0, ctx_tokens=CTX) == man0

    # the stream continues: a later non-empty batch appends normally
    man1 = append_shard_batch(
        spark, _tok_df(spark, [(10, BASE)]), out, 1, ctx_tokens=CTX
    )
    assert man1["batches"] == [0, 1]
    assert man1["n_docs"] == 1

    # and an empty batch AFTER data keeps all committed counts intact
    man2 = append_shard_batch(spark, empty, out, 2, ctx_tokens=CTX)
    assert man2["batches"] == [0, 1, 2]
    assert man2["n_docs"] == man1["n_docs"]
    assert man2["shards"] == man1["shards"]


def test_conformal_empty_calibration_yields_null_qhat(spark, tmp_path):
    """ADVICE (low): an empty hash-calibration split must yield NULL
    qhat and zero coverage (the oracle's scalar-subquery semantics),
    not a TypeError from int(None)."""
    from atlassian_confluence_data_pipeline_spark.functions.text import (
        rolling_hash,
    )
    from atlassian_confluence_data_pipeline_spark.plans.evals import (
        _CONF_SPLIT_MOD,
        conformal_length_calibration,
    )

    sf = tmp_path / "sf"
    sf.mkdir()
    # keep only doc_ids that hash OUT of the calibration split
    docs = (
        spark.range(1, 200)
        .select(
            F.col("id").alias("doc_id"),
            F.lit("alpha beta gamma delta").alias("text"),
            F.lit("en").alias("lang"),
            F.lit("wiki").alias("source"),
            F.lit(22).cast("bigint").alias("n_chars"),
        )
        .filter(rolling_hash(F.col("doc_id").cast("string")) % _CONF_SPLIT_MOD != 0)
        .limit(25)
    )
    assert docs.count() > 0
    docs.write.parquet(str(sf / "documents.parquet"))

    r = conformal_length_calibration(spark, str(sf)).collect()[0]
    assert r.n_calib == 0
    assert r.qhat is None
    assert r.n_test > 0
    assert r.coverage == 0.0


def test_fingerprint_rotates_on_nested_rewrite(spark, tmp_path):
    """ADVICE (low): rewriting a parquet file inside a NESTED subdir
    (root mtime unchanged) must still rotate the fingerprint — the memo
    key is the full stat profile, not the root mtime."""
    sf = tmp_path / "sf"
    nested = sf / "documents.parquet"  # spark writes a dir of parts
    sf.mkdir()
    spark.range(5).select(F.col("id").alias("doc_id")).coalesce(1).write.parquet(
        str(nested)
    )
    root_stat = sf.stat()
    fp1 = _cache._fixture_fingerprint(str(sf))
    assert _cache._fixture_fingerprint(str(sf)) == fp1  # memo stable

    time.sleep(0.05)
    # in-place rewrite of the part files, then pin the ROOT mtime back
    spark.range(7).select(F.col("id").alias("doc_id")).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(nested))
    os.utime(sf, ns=(root_stat.st_atime_ns, root_stat.st_mtime_ns))
    assert _cache._fixture_fingerprint(str(sf)) != fp1


def test_legacy_reap_scoped_to_same_basename(tmp_path):
    """ADVICE (low): old-format (no 8-hex path key) cache dirs are only
    reaped when they share this entry's sf_dir BASENAME — a pre-round-9
    process on a different fixture root keeps its warm cache."""
    root = tmp_path / "cc"
    entry_parent = root / ("sf0.1-" + "a" * 8 + "-" + "b" * 16)
    entry = entry_parent / "stage"
    entry.mkdir(parents=True)

    same_base_legacy = root / ("sf0.1-" + "c" * 16)
    other_base_legacy = root / ("sf0.01-" + "d" * 16)
    same_base_current = root / ("sf0.1-" + "e" * 8 + "-" + "f" * 16)
    for p in (same_base_legacy, other_base_legacy, same_base_current):
        p.mkdir(parents=True)
        (p / "marker").write_text("x")
        past = time.time() - 2 * _cache._REAP_GRACE_SECONDS
        os.utime(p, (past, past))

    _cache._reap_stale(entry)

    assert not same_base_legacy.exists()  # our identity's legacy: reaped
    assert other_base_legacy.exists()  # other fixture root: spared
    # current-format sibling of ANOTHER identity (different path key,
    # same basename) is also spared — identity is the full prefix
    assert same_base_current.exists()
