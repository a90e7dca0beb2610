"""Wave-45 semantic invariants (closed-form cross-validation): the
moment-algebra CV must agree with an explicit predict-and-score pass."""

from __future__ import annotations

from atlassian_confluence_data_pipeline_spark.plans import QUERIES


def _rows(spark, sf_dir, name):
    return QUERIES[name].fn(spark, sf_dir).collect()


def test_cv_matches_explicit_prediction_pass(spark, sf_dir):
    """For one fold, score the held-out rows explicitly with the fold's
    published coefficients and reproduce the algebraic test RMSE."""
    import math

    from pyspark.sql import functions as F

    from atlassian_confluence_data_pipeline_spark.catalog import load_table

    rows = sorted(_rows(spark, sf_dir, "kfold_cv_ridge"), key=lambda r: r["fold"])
    assert len(rows) == 5
    total_n = sum(r["n_test"] for r in rows)
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    assert total_n == li.count()
    r0 = rows[0]
    fold = (
        (
            (F.lit(1_103_515_245) * (F.col("l_orderkey") % 2_147_483_647)
             + 12_345) % 2_147_483_647
        ) % 5
    ).cast("int")
    test = (
        li.join(
            F.broadcast(
                p.select(F.col("p_partkey").alias("l_partkey"),
                         "p_retailprice")
            ),
            "l_partkey",
        )
        .select(
            fold.alias("fold"),
            F.round(F.col("l_quantity") * 100).cast("bigint").alias("x1"),
            F.round(F.col("p_retailprice") * 100).cast("bigint").alias("x2"),
            F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("y"),
        )
        .filter(F.col("fold") == r0["fold"])
        .collect()
    )
    assert len(test) == r0["n_test"]
    w1, w2, w3 = r0["intercept"], r0["coef_quantity"], r0["coef_retailprice"]
    sse = sum(
        (t["y"] - (w1 + w2 * t["x1"] + w3 * t["x2"])) ** 2 for t in test
    )
    rmse = math.sqrt(sse / len(test)) / 100
    # coefficients published at 6 decimals, so the recomputation drifts
    # slightly; it must still be the same number to ~4 significant digits
    assert abs(rmse - r0["test_rmse"]) / r0["test_rmse"] < 1e-3


def test_cv_folds_are_balanced_and_stable(spark, sf_dir):
    rows = _rows(spark, sf_dir, "kfold_cv_ridge")
    ns = [r["n_test"] for r in rows]
    assert max(ns) < 2 * min(ns)  # hash folds are near-uniform
    rmses = [r["test_rmse"] for r in rows]
    assert all(r > 0 for r in rmses)
    # folds see the same data-generating process: spread is bounded
    assert max(rmses) < 2 * min(rmses)
