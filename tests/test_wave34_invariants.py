"""Wave-34 semantic invariants (pricing economics): HHI bounds,
elasticity A/A behavior, dispersion algebra, and DiD cell consistency."""

from __future__ import annotations

from atlassian_confluence_data_pipeline_spark.plans import QUERIES


def _rows(spark, sf_dir, name):
    return QUERIES[name].fn(spark, sf_dir).collect()


def test_hhi_bounds_and_floor(spark, sf_dir):
    rows = _rows(spark, sf_dir, "hhi_brand_concentration")
    assert rows
    for r in rows:
        # HHI lives in [10000/n_brands, 10000]
        assert 10000 / r["n_brands"] - 1e-6 <= r["hhi"] <= 10000 + 1e-6
        assert r["total_revenue"] > 0


def test_elasticity_regression_is_well_formed(spark, sf_dir):
    """Every brand fits on >1 part, r2 is a valid share, and the
    brand slopes agree in sign with the pooled relation (the fixture
    couples quantity to price, so slopes are coherently signed)."""
    rows = _rows(spark, sf_dir, "price_elasticity_loglog")
    assert rows
    for r in rows:
        assert 0.0 <= r["r2"] <= 1.0
        assert r["n_parts"] > 1
    mean_e = sum(r["elasticity"] for r in rows) / len(rows)
    neg = sum(1 for r in rows if r["elasticity"] < 0)
    # a coherent demand-side fixture: most brand slopes share the
    # pooled sign
    if mean_e < 0:
        assert neg > len(rows) // 2
    else:
        assert neg <= len(rows) // 2


def test_price_dispersion_algebra(spark, sf_dir):
    rows = _rows(spark, sf_dir, "price_dispersion_by_type")
    assert rows
    for r in rows:
        assert r["std_price"] >= 0
        assert r["mean_price"] > 0
        want = r["std_price"] / r["mean_price"]
        assert abs(want - r["coeff_variation"]) < 1e-3


def test_did_identity(spark, sf_dir):
    r = _rows(spark, sf_dir, "promo_uplift_did")[0]
    want = (r["promo_late"] - r["promo_early"]) - (
        r["control_late"] - r["control_early"]
    )
    assert abs(want - r["did_uplift"]) < 1e-3
    assert r["n_promo"] > 0 and r["n_control"] > 0
