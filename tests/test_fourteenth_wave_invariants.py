"""Structural invariants of the fourteenth wave: portable HLL
(batch queries + the streaming cross-batch register merge)."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.operators.sketches import (
    HLL_M,
    hll_registers,
)
from atlassian_confluence_data_pipeline_spark.operators.state import StateStore
from atlassian_confluence_data_pipeline_spark.plans import QUERIES


def test_hll_estimate_within_sketch_error(spark, sf_dir):
    row = QUERIES["hll_distinct_orders"].fn(spark, sf_dir).first()
    assert row["exact_distinct"] > 0
    # m=256 gives ~1.04/sqrt(256) = 6.5% standard error; allow ~4 sigma
    assert row["rel_error"] < 0.26
    assert row["hll_estimate"] > 0


def test_hll_merge_is_exact(spark, sf_dir):
    row = QUERIES["hll_merge_users"].fn(spark, sf_dir).first()
    assert row["merge_exact_match"] == 1
    assert row["est_merged"] == row["est_direct"]


def test_streaming_hll_equals_batch_sketch(spark, sf_dir, tmp_path):
    """Two micro-batches merged through the StateStore must produce
    registers bit-identical to the batch sketch over the union."""
    from atlassian_confluence_data_pipeline_spark.streaming.jobs import (
        foreach_batch_hll_distinct,
    )

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    half = ev.count() // 2
    a = ev.filter(F.col("event_id") % 2 == 0)
    b = ev.filter(F.col("event_id") % 2 == 1)
    drop = tmp_path / "ev"
    drop.mkdir()
    a.coalesce(1).write.parquet(str(drop / "b1.parquet"))
    b.coalesce(1).write.parquet(str(drop / "b2.parquet"))

    stream = (
        spark.readStream.schema("event_id bigint, user_id bigint")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(drop) + "/*.parquet")
    )
    store = StateStore(str(tmp_path / "hll_regs"))
    q = (
        foreach_batch_hll_distinct(stream, store)
        .option(
            "checkpointLocation", str(tmp_path / f"ck_{uuid.uuid4().hex[:6]}")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    stored = {
        (r["reg"], r["mx"]) for r in store.read(spark).collect()
    }
    batch = {
        (r["reg"], r["mx"])
        for r in hll_registers(ev, F.col("user_id")).collect()
    }
    assert stored == batch
    assert len(stored) <= HLL_M
    assert half > 0


def test_kmv_estimates_positive_and_union_bounds(spark, sf_dir):
    row = QUERIES["kmv_intersection_users"].fn(spark, sf_dir).first()
    assert row["est_a"] > 0 and row["est_b"] > 0
    # union estimate at least as large as each side's
    assert row["est_union"] >= max(row["est_a"], row["est_b"]) - 1e-6
    assert row["est_intersection"] >= 0
    assert row["exact_intersection"] >= 0


def test_groupwise_hll_covers_types_with_bounded_error(spark, sf_dir):
    rows = QUERIES["hll_distinct_users_by_type"].fn(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    assert len(rows) == ev.select("event_type").distinct().count()
    for r in rows:
        assert r["exact_distinct"] > 0
        assert r["rel_error"] < 0.3  # 4+ sigma at m=256
