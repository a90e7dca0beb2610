"""Cross-session chain cache (plans/_cache.py): disk warm-start
correctness, fingerprint invalidation, kill-switch, and crash-leftover
hygiene (age-gated reaping — the state.py grace-period lesson)."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.plans import _cache


def _mk_sf_dir(spark, tmp_path, n=20):
    sf = tmp_path / "sf"
    sf.mkdir()
    spark.range(n).select(
        F.col("id").alias("doc_id"), F.col("id").cast("string").alias("text")
    ).write.parquet(str(sf / "documents.parquet"))
    return str(sf)


def _fresh_session_state():
    """Simulate a process restart for the cache layers."""
    _cache._PAIR_CACHE.clear()
    _cache._FP_CACHE.clear()


def test_warm_start_skips_rebuild_and_matches(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(
        _cache, "_chain_cache_root", lambda: tmp_path / "cc"
    )
    sf = _mk_sf_dir(spark, tmp_path)
    calls = []

    def builder(spark, sf_dir):
        calls.append(1)
        return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", (F.col("doc_id") * 2).alias("v")
        )

    cold = sorted(
        map(tuple, _cache.shared_pair_table(spark, sf, "t1", builder).collect())
    )
    assert calls == [1]
    _fresh_session_state()
    warm = sorted(
        map(tuple, _cache.shared_pair_table(spark, sf, "t1", builder).collect())
    )
    assert warm == cold
    assert calls == [1]  # disk hit: builder never re-ran


def test_fixture_change_rotates_fingerprint(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(
        _cache, "_chain_cache_root", lambda: tmp_path / "cc"
    )
    sf = _mk_sf_dir(spark, tmp_path)
    calls = []

    def builder(spark, sf_dir):
        calls.append(1)
        return spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")

    _cache.shared_pair_table(spark, sf, "t2", builder).collect()
    _fresh_session_state()
    # regenerate the fixture (different size + mtime -> new digest)
    spark.range(25).select(
        F.col("id").alias("doc_id"), F.lit("changed").alias("text")
    ).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    out = _cache.shared_pair_table(spark, sf, "t2", builder)
    assert calls == [1, 1]  # rebuilt, not served stale
    assert out.count() == 25


def test_kill_switch_bypasses_disk(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(
        _cache, "_chain_cache_root", lambda: tmp_path / "cc"
    )
    monkeypatch.setenv("SPARK_GRAFT_NO_CHAIN_CACHE", "1")
    sf = _mk_sf_dir(spark, tmp_path)
    _cache.shared_pair_table(
        spark,
        sf,
        "t3",
        lambda s, d: s.read.parquet(f"{d}/documents.parquet").select("doc_id"),
    ).collect()
    assert not (tmp_path / "cc").exists()


def test_reap_is_age_gated(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(
        _cache, "_chain_cache_root", lambda: tmp_path / "cc"
    )
    sf = _mk_sf_dir(spark, tmp_path)
    fp_dir = _cache._disk_dir(sf, "x").parent
    root = fp_dir.parent
    sfname = fp_dir.name.rsplit("-", 1)[0]
    # plant: an OLD crashed .tmp dir, a FRESH .tmp dir, an OLD orphaned
    # fingerprint sibling, and a FRESH orphaned sibling
    fp_dir.mkdir(parents=True)
    old_tmp = fp_dir / ".tmp-crashed"
    old_tmp.mkdir()
    fresh_tmp = fp_dir / ".tmp-inflight"
    fresh_tmp.mkdir()
    old_sib = root / f"{sfname}-0000000000000000"
    old_sib.mkdir()
    fresh_sib = root / f"{sfname}-1111111111111111"
    fresh_sib.mkdir()
    past = time.time() - 7200
    os.utime(old_tmp, (past, past))
    os.utime(old_sib, (past, past))
    _cache.shared_pair_table(
        spark,
        sf,
        "x",
        lambda s, d: s.read.parquet(f"{d}/documents.parquet").select("doc_id"),
    ).collect()
    assert not old_tmp.exists()  # crashed leftover reaped
    assert fresh_tmp.exists()  # in-flight write untouched (grace)
    assert not old_sib.exists()  # rotated fingerprint reaped
    assert fresh_sib.exists()  # fresh sibling untouched (grace)
