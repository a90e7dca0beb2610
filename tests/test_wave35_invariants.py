"""Wave-35 semantic invariants (closed-form model fitting): solve
correctness against an independent numpy solve, Newton-step direction,
and the conformal coverage guarantee."""

from __future__ import annotations

from atlassian_confluence_data_pipeline_spark.plans import QUERIES


def _rows(spark, sf_dir, name):
    return QUERIES[name].fn(spark, sf_dir).collect()


def test_ridge_matches_numpy_solve(spark, sf_dir):
    """Rebuild the regularized normal equations with numpy from the raw
    tables and compare the closed-form solution."""
    import numpy as np

    from atlassian_confluence_data_pipeline_spark.catalog import load_table
    from pyspark.sql import functions as F

    r = _rows(spark, sf_dir, "ridge_regression_closed_form")[0]
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rows = (
        li.join(
            F.broadcast(
                p.select(
                    F.col("p_partkey").alias("l_partkey"), "p_retailprice"
                )
            ),
            "l_partkey",
        )
        .select(
            F.round(F.col("l_quantity") * 100).cast("bigint").alias("x1"),
            F.round(F.col("p_retailprice") * 100).cast("bigint").alias("x2"),
            F.round(F.col("l_extendedprice") * 100)
            .cast("bigint")
            .alias("y"),
        )
        .collect()
    )
    X = np.array([[1.0, float(x["x1"]), float(x["x2"])] for x in rows])
    y = np.array([float(x["y"]) for x in rows])
    lam = 1000.0
    w = np.linalg.solve(X.T @ X + lam * np.eye(3), X.T @ y)
    assert abs(w[0] - r["intercept"]) < max(1e-3, 1e-5 * abs(w[0]))
    assert abs(w[1] - r["coef_quantity"]) < 1e-3
    assert abs(w[2] - r["coef_retailprice"]) < 1e-3
    # the fixture assigns revenue independently of qty/price, so the
    # fit is weak — r2 only needs to be a valid share
    assert 0.0 <= r["r2"] <= 1.0


def test_logistic_step_moves_toward_the_labels(spark, sf_dir):
    """The Newton step from 0 is an ascent direction: the linear score
    X w must correlate positively with (y - 1/2) in aggregate —
    equivalently g'w > 0 where g is the gradient at 0."""
    import numpy as np

    from atlassian_confluence_data_pipeline_spark.catalog import load_table
    from atlassian_confluence_data_pipeline_spark.plans.textops import _words
    from pyspark.sql import functions as F

    r = _rows(spark, sf_dir, "logistic_newton_step")[0]
    docs = load_table(spark, sf_dir, "documents")
    rows = docs.select(
        F.col("n_chars").cast("bigint").alias("x1"),
        F.size(_words(F.col("text"))).cast("bigint").alias("x2"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    ).collect()
    X = np.array([[1.0, float(x["x1"]), float(x["x2"])] for x in rows])
    y = np.array([float(x["y"]) for x in rows])
    g = X.T @ (y - 0.5)
    w = np.array([r["w_intercept"], r["w_chars"], r["w_words"]])
    assert float(g @ w) > 0
    # and it matches the explicit IRLS step 4 (X'X)^-1 g
    w_np = 4 * np.linalg.solve(X.T @ X, g)
    assert np.allclose(w, w_np, rtol=1e-3, atol=1e-6)
    assert r["n_pos"] <= r["n_rows"]


def test_conformal_coverage_near_nominal(spark, sf_dir):
    """Split-conformal guarantees >= 1 - alpha coverage in expectation;
    on a null split the realized coverage sits near 0.9 (within
    finite-sample noise)."""
    r = _rows(spark, sf_dir, "split_conformal_coverage")[0]
    assert r["n_calibration"] > 0 and r["n_test"] > 0
    assert r["q_hat"] > 0
    import math

    se = math.sqrt(0.9 * 0.1 / r["n_test"])
    assert r["coverage"] > 0.9 - 5 * se - 0.02
    assert r["coverage"] <= 1.0
