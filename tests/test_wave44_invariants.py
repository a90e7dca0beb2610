"""Wave-44 semantic invariants (Markov attribution): removal-effect
monotonicity, share normalization, and consistency with the raw
conversion rate."""

from __future__ import annotations

from atlassian_confluence_data_pipeline_spark.plans import QUERIES


def _rows(spark, sf_dir, name):
    return QUERIES[name].fn(spark, sf_dir).collect()


def test_removal_effects_well_formed(spark, sf_dir):
    rows = _rows(spark, sf_dir, "markov_attribution_removal")
    assert len(rows) == 4
    p_full = rows[0]["p_conversion"]
    assert 0.0 < p_full < 1.0
    share_sum = 0.0
    for r in rows:
        # removing transitions can only REMOVE conversion paths
        assert r["p_without_channel"] <= p_full + 1e-9
        assert r["removal_effect"] >= -1e-9
        assert 0.0 <= r["attribution_share"] <= 1.0
        assert r["p_conversion"] == p_full
        share_sum += r["attribution_share"]
    assert abs(share_sum - 1.0) < 1e-3


def test_conversion_rate_matches_session_share(spark, sf_dir):
    """The chain's absorption probability from START approximates the
    empirical share of sessions that convert (truncated at 25
    iterations, so it is a slight UNDER-estimate)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from atlassian_confluence_data_pipeline_spark.catalog import load_table

    rows = _rows(spark, sf_dir, "markov_attribution_removal")
    p_model = rows[0]["p_conversion"]
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag(F.unix_micros("ts")).over(w)
    sess = (
        ev.withColumn(
            "new_sess",
            F.when(
                prev.isNull()
                | (F.unix_micros("ts") - prev > 1_800_000_000),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "seq",
            F.sum("new_sess").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy("user_id", "seq")
        .agg(
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("conv")
        )
    )
    agg = sess.agg(F.avg("conv"), F.count(F.lit(1))).first()
    empirical = agg[0]
    # the Markov chain is a model, not a tautology: it should land in
    # the same regime as the empirical per-session conversion share
    assert 0.3 * empirical < p_model < 1.7 * empirical
