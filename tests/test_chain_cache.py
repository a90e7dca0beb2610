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


def test_same_basename_roots_are_disjoint_identities(
    spark, tmp_path, monkeypatch
):
    """Round-9 ADVICE (medium): two fixture roots that share a BASENAME
    (two checkouts both holding an 'sf0.1') must key disjoint cache
    dirs, and reaping triggered from one must never delete the other's
    old-but-live entry."""
    monkeypatch.setattr(_cache, "_chain_cache_root", lambda: tmp_path / "cc")
    a_root = tmp_path / "fixA"
    b_root = tmp_path / "fixB"
    for r in (a_root, b_root):
        (r / "sf0.1").mkdir(parents=True)
    sf_a, sf_b = str(a_root / "sf0.1"), str(b_root / "sf0.1")
    spark.range(5).select(F.col("id").alias("doc_id")).write.parquet(
        f"{sf_a}/documents.parquet"
    )
    spark.range(7).select(F.col("id").alias("doc_id")).write.parquet(
        f"{sf_b}/documents.parquet"
    )
    dir_a = _cache._disk_dir(sf_a, "t")
    dir_b = _cache._disk_dir(sf_b, "t")
    assert dir_a.parent != dir_b.parent
    assert dir_a.parent.name.split("-")[0] == dir_b.parent.name.split("-")[0]

    def builder(s, d):
        return s.read.parquet(f"{d}/documents.parquet").select("doc_id")

    # build B's cache, then age it past the grace window
    _cache.shared_pair_table(spark, sf_b, "t", builder).collect()
    past = time.time() - 7200
    os.utime(dir_b.parent, (past, past))
    # building A's cache runs the reaper from A's identity
    _cache.shared_pair_table(spark, sf_a, "t", builder).collect()
    assert (dir_b / "_SUCCESS").exists()  # B's old warm cache survived
    # but an old orphan of A's OWN identity is reaped
    own_orphan = dir_a.parent.parent / (
        dir_a.parent.name.rsplit("-", 1)[0] + "-aaaaaaaaaaaaaaaa"
    )
    own_orphan.mkdir()
    os.utime(own_orphan, (past, past))
    _fresh_session_state()
    _cache.shared_pair_table(spark, sf_a, "t2", builder).collect()
    assert not own_orphan.exists()


def test_disk_read_touches_mtime(spark, tmp_path, monkeypatch):
    """Warm reads must refresh the fingerprint dir's mtime so an
    actively-read entry stays inside the reap grace window (directory
    mtimes don't advance on reads by themselves)."""
    monkeypatch.setattr(_cache, "_chain_cache_root", lambda: tmp_path / "cc")
    sf = _mk_sf_dir(spark, tmp_path)

    def builder(s, d):
        return s.read.parquet(f"{d}/documents.parquet").select("doc_id")

    _cache.shared_pair_table(spark, sf, "t", builder).collect()
    fp_dir = _cache._disk_dir(sf, "t").parent
    past = time.time() - 7200
    os.utime(fp_dir, (past, past))
    _fresh_session_state()
    _cache.shared_pair_table(spark, sf, "t", builder)  # disk warm read
    assert time.time() - fp_dir.stat().st_mtime < 60


def test_code_fingerprint_rotates_on_dep_change(tmp_path, monkeypatch):
    """Round-9 ADVICE (low): the fixture fingerprint folds a hash of the
    chain-semantics modules' source, so editing a builder dep orphans
    persisted stages without a manual _CHAIN_VERSION bump."""
    dep = tmp_path / "dep.py"
    dep.write_text("SEMANTICS = 1\n")
    monkeypatch.setattr(_cache, "_CODE_DEPS", (str(dep),))
    monkeypatch.setattr(_cache, "_CODE_FP_CACHE", [])
    first = _cache._code_fingerprint()
    monkeypatch.setattr(_cache, "_CODE_FP_CACHE", [])
    assert _cache._code_fingerprint() == first  # stable when unchanged
    dep.write_text("SEMANTICS = 2\n")
    monkeypatch.setattr(_cache, "_CODE_FP_CACHE", [])
    assert _cache._code_fingerprint() != first


def test_fingerprint_memo_has_freshness_probe(spark, tmp_path):
    """Round-9 ADVICE (low): regenerating fixtures while the process is
    alive must rotate the fingerprint WITHOUT a manual memo clear — the
    memo key carries the sf_dir root mtime as a coarse freshness
    probe."""
    sf = _mk_sf_dir(spark, tmp_path)
    fp1 = _cache._fixture_fingerprint(sf)
    assert _cache._fixture_fingerprint(sf) == fp1  # memo hit, stable
    time.sleep(0.05)
    spark.range(3).select(F.col("id").alias("doc_id")).write.mode(
        "overwrite"
    ).parquet(f"{sf}/documents.parquet")
    assert _cache._fixture_fingerprint(sf) != fp1  # no stale memo served
