"""Structural invariants of the fifteenth wave: monitoring ops and
the streaming Count-Min merge."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.operators.state import StateStore
from atlassian_confluence_data_pipeline_spark.plans import QUERIES


def test_cusum_starts_and_ends_near_zero(spark, sf_dir):
    """CUSUM of deviations from the series' own mean telescopes to ~0
    at the last point (cum_n - n*mean = 0 up to float round-off)."""
    rows = sorted(
        QUERIES["cusum_drift_daily_revenue"].fn(spark, sf_dir).collect(),
        key=lambda r: r["day"],
    )
    assert rows
    assert abs(rows[-1]["cusum"]) < 1.0  # telescoping identity
    assert all(r["drift_flag"] in (0, 1) for r in rows)
    assert all(r["revenue"] > 0 for r in rows)


def test_ab_test_is_an_aa_test(spark, sf_dir):
    """The hash split carries no treatment effect, so the z-stat must
    be unremarkable — a 5-sigma 'effect' would mean the split or the
    moment math is broken."""
    row = QUERIES["ab_test_value_ztest"].fn(spark, sf_dir).first()
    assert row["n_control"] > 0 and row["n_treatment"] > 0
    assert abs(row["z_stat"]) < 5.0
    assert row["significant"] == (1 if abs(row["z_stat"]) > 1.96 else 0)


def test_streaming_cms_equals_batch_cells_and_overestimates(
    spark, sf_dir, tmp_path
):
    from atlassian_confluence_data_pipeline_spark.functions.text import (
        ROLLING_MOD,
        rolling_hash,
    )
    from atlassian_confluence_data_pipeline_spark.plans.analytics import (
        CMS_WIDTH,
        _cms_perms,
    )
    from atlassian_confluence_data_pipeline_spark.streaming.jobs import (
        foreach_batch_cms_merge,
    )

    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    a = ev.filter(F.col("event_id") % 2 == 0)
    b = ev.filter(F.col("event_id") % 2 == 1)
    drop = tmp_path / "ev"
    drop.mkdir()
    a.coalesce(1).write.parquet(str(drop / "b1.parquet"))
    b.coalesce(1).write.parquet(str(drop / "b2.parquet"))

    stream = (
        spark.readStream.schema("event_id bigint, event_type string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(drop) + "/*.parquet")
    )
    store = StateStore(str(tmp_path / "cms"))
    q = (
        foreach_batch_cms_merge(stream, store)
        .option(
            "checkpointLocation", str(tmp_path / f"ck_{uuid.uuid4().hex[:6]}")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    # batch-compute the same cells over ALL events
    h = rolling_hash(F.col("event_type").cast("string"))
    cells = ev.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("row"),
                        (((F.lit(p) * h + F.lit(q2)) % ROLLING_MOD) % CMS_WIDTH)
                        .cast("int")
                        .alias("cell"),
                    )
                    for j, (p, q2) in enumerate(_cms_perms())
                ]
            )
        ).alias("rc")
    ).select("rc.row", "rc.cell")
    batch = {
        (r["row"], r["cell"]): r["cnt"]
        for r in cells.groupBy("row", "cell")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .collect()
    }
    stored = {
        (r["row"], r["cell"]): r["cnt"]
        for r in store.read(spark).filter(F.col("row") >= 0).collect()
    }
    assert stored == batch

    # replay safety: re-running the same availableNow stream against a
    # FRESH checkpoint restarts batch ids at 0 — both are <= the
    # persisted last-applied marker, so the additive merge must NOT be
    # applied twice (the ADVICE replay-double-count scenario).
    q2 = (
        foreach_batch_cms_merge(stream, store)
        .option(
            "checkpointLocation", str(tmp_path / f"ck_{uuid.uuid4().hex[:6]}")
        )
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(180)
    replayed = {
        (r["row"], r["cell"]): r["cnt"]
        for r in store.read(spark).filter(F.col("row") >= 0).collect()
    }
    assert replayed == batch

    # estimate (min over rows) >= exact for every key
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    perms = _cms_perms()
    import functools

    def rh(s: str) -> int:
        return functools.reduce(
            lambda acc, ch: (acc * 257 + ord(ch)) % ROLLING_MOD, s, 0
        )

    for key, n in exact.items():
        est = min(
            stored.get(
                (j, ((p * rh(key) + q2) % ROLLING_MOD) % CMS_WIDTH), 0
            )
            for j, (p, q2) in enumerate(perms)
        )
        assert est >= n
