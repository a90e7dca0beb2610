"""Round-7 empty/small-input parity guards (round-6 ADVICE items):
hill_tail with < K+1 customers and transition_entropy_rate with zero
transitions must return EMPTY frames exactly like their oracles."""

from __future__ import annotations

import pytest

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.plans import QUERIES


@pytest.fixture()
def tiny_sf(spark, sf_dir, tmp_path):
    """A shrunken fixture dir: <= 3 customers' orders, and events
    reduced to ONE row per user (zero per-user transitions)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    out = tmp_path / "sf_tiny"
    out.mkdir()
    orders = load_table(spark, sf_dir, "orders")
    keep = [r["o_custkey"] for r in orders.select("o_custkey").distinct().limit(3).collect()]
    orders.filter(F.col("o_custkey").isin(keep)).write.parquet(
        str(out / "orders.parquet")
    )
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    (
        events.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") == 1)
        .drop("__r")
        .write.parquet(str(out / "events.parquet"))
    )
    return str(out)


def test_hill_tail_fewer_than_k_plus_one_customers_is_empty(spark, tiny_sf):
    df = QUERIES["hill_tail_customer_revenue"].fn(spark, tiny_sf)
    assert df.count() == 0
    assert df.columns == ["k", "xmin_cents", "mean_log_excess", "hill_alpha"]


def test_transition_entropy_rate_zero_transitions_is_empty(spark, tiny_sf):
    df = QUERIES["transition_entropy_rate"].fn(spark, tiny_sf)
    assert df.count() == 0
    assert df.columns == ["prev_type", "n_out", "entropy_bits", "weight"]


def test_iterstats_and_mmr_stats_are_thread_isolated():
    """Concurrent query builds must not interleave telemetry (round-6
    ADVICE): each thread sees only its own reset/record sequence."""
    import threading

    from atlassian_confluence_data_pipeline_spark import iterstats
    from atlassian_confluence_data_pipeline_spark.plans.curation4 import (
        MMR_STATS,
    )

    barrier = threading.Barrier(2, timeout=30)
    seen: dict[str, tuple] = {}

    def worker(tag: str, n: int) -> None:
        iterstats.reset()
        MMR_STATS["cluster_jobs"] = 0
        barrier.wait()          # both threads have reset
        iterstats.record("op", n)
        MMR_STATS["cluster_jobs"] = n
        barrier.wait()          # both threads have recorded
        seen[tag] = (iterstats.snapshot().get("op"), MMR_STATS["cluster_jobs"])

    t1 = threading.Thread(target=worker, args=("a", 7))
    t2 = threading.Thread(target=worker, args=("b", 13))
    t1.start(); t2.start(); t1.join(30); t2.join(30)
    assert seen["a"] == (7, 7)
    assert seen["b"] == (13, 13)
