"""Wave-50 semantic invariants (changepoint): argmax optimality and
statistic algebra."""

from __future__ import annotations

from atlassian_confluence_data_pipeline_spark.plans import QUERIES


def _rows(spark, sf_dir, name):
    return QUERIES[name].fn(spark, sf_dir).collect()


def test_changepoint_is_the_global_argmax(spark, sf_dir):
    """Recompute the split scores by brute force over the collected day
    series and confirm the reported split maximizes the statistic."""
    from pyspark.sql import functions as F

    from atlassian_confluence_data_pipeline_spark.catalog import load_table

    r = _rows(spark, sf_dir, "revenue_changepoint")[0]
    daily = sorted(
        (
            x["dnum"],
            x["cents"],
        )
        for x in load_table(spark, sf_dir, "orders")
        .groupBy(
            F.datediff(
                F.to_date("o_orderdate"), F.lit("1992-01-01")
            ).alias("dnum")
        )
        .agg(
            (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("bigint")
            .alias("cents")
        )
        .collect()
    )
    n = len(daily)
    t = sum(c for _, c in daily)
    best = None
    s = 0
    for k, (dnum, c) in enumerate(daily[:-1], start=1):
        s += c
        ml = s / k
        mr = (t - s) / (n - k)
        score = k * (n - k) / n * (ml - mr) ** 2
        if best is None or score > best[0]:
            best = (score, dnum, k, ml, mr)
    assert best is not None
    assert r["split_after_dnum"] == best[1]
    assert r["n_days_left"] == best[2]
    assert abs(r["mean_left"] - best[3] / 100) < 0.02
    assert abs(r["mean_right"] - best[4] / 100) < 0.02
    import math

    want_root = math.sqrt(best[0]) / 100
    assert abs(r["score_root"] - want_root) < max(0.01, 1e-6 * want_root)
    # means differ across the split (else no changepoint exists at all)
    assert r["score_root"] > 0
