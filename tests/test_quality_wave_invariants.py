"""Data-quality wave invariants: the checks must themselves be checked
— healthy fixtures produce clean reports, and seeded corruption is
caught."""

from __future__ import annotations

from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.plans import QUERIES


def test_fixtures_have_referential_integrity(spark, sf_dir):
    rows = {
        r["fk"]: r["n_orphans"]
        for r in QUERIES["referential_integrity_orphans"]
        .fn(spark, sf_dir)
        .collect()
    }
    assert set(rows) == {
        "lineitem->orders",
        "orders->customer",
        "customer->nation",
        "supplier->nation",
    }
    assert all(v == 0 for v in rows.values())


def test_orphan_detector_catches_seeded_corruption(spark, sf_dir, tmp_path):
    """Drop some parent orders from a copy of the fixture: the orphan
    count must equal the number of lineitem rows whose parent vanished."""
    import shutil

    src = sf_dir
    dst = str(tmp_path / "corrupt")
    shutil.copytree(src, dst)
    o = load_table(spark, src, "orders")
    kept = o.filter(F.col("o_orderkey") % 97 != 0)
    dropped_keys = o.filter(F.col("o_orderkey") % 97 == 0).select("o_orderkey")
    want = (
        load_table(spark, src, "lineitem")
        .join(
            dropped_keys.withColumnRenamed("o_orderkey", "l_orderkey"),
            "l_orderkey",
            "left_semi",
        )
        .count()
    )
    import os

    shutil.rmtree(os.path.join(dst, "orders.parquet"), ignore_errors=True)
    kept.write.mode("overwrite").parquet(os.path.join(dst, "orders.parquet"))
    rows = {
        r["fk"]: r["n_orphans"]
        for r in QUERIES["referential_integrity_orphans"].fn(spark, dst).collect()
    }
    assert rows["lineitem->orders"] == want > 0
    assert rows["customer->nation"] == 0  # untouched chains stay clean


def test_uniqueness_audit_clean_and_consistent(spark, sf_dir):
    rows = {
        r["pk"]: r for r in QUERIES["key_uniqueness_audit"].fn(spark, sf_dir).collect()
    }
    for r in rows.values():
        assert r["n_dup_rows"] == r["n_rows"] - r["n_keys"]
    # the three genuine primary keys are clean...
    for pk in ("orders.o_orderkey", "customer.c_custkey", "documents.doc_id"):
        assert rows[pk]["n_dup_rows"] == 0
    # ...and the synthetic lineitem fixture does NOT enforce its
    # composite key — the audit must catch exactly those duplicates
    li = load_table(spark, sf_dir, "lineitem")
    want = li.count() - li.select("l_orderkey", "l_linenumber").distinct().count()
    assert rows["lineitem.(l_orderkey,l_linenumber)"]["n_dup_rows"] == want > 0


def test_freshness_head_has_zero_lag(spark, sf_dir):
    rows = QUERIES["freshness_lag_report"].fn(spark, sf_dir).collect()
    lags = {r["event_type"]: r["lag_s"] for r in rows}
    assert min(lags.values()) == 0  # some type owns the stream head
    assert all(v >= 0 for v in lags.values())


def test_volume_anomaly_trailing_counts(spark, sf_dir):
    rows = QUERIES["volume_anomaly_trailing"].fn(spark, sf_dir).collect()
    # the first calendar day has no trailing history and must be absent
    days = sorted(r["day"] for r in rows)
    all_days = sorted(
        r["d"]
        for r in load_table(spark, sf_dir, "events")
        .select(F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("d"))
        .distinct()
        .collect()
    )
    assert days == all_days[1:]
    for r in rows:
        assert 1 <= r["n_trail"] <= 7
        assert r["anomaly"] in (0, 1)
