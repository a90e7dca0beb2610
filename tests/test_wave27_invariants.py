"""Wave-27 semantic invariants: prefix-filter completeness vs brute
force (the algorithm's correctness guarantee) and MI information-
theory bounds."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.plans import QUERIES


def _rows(spark, sf_dir, name):
    return QUERIES[name].fn(spark, sf_dir).collect()


def _grams(s: str) -> frozenset:
    return frozenset(s[i:i + 3] for i in range(len(s) - 2))


def test_prefix_filter_matches_brute_force(spark, sf_dir):
    """The prefix filter must lose NO qualifying pair (exactness of the
    technique) and report exact intersection/union sizes."""
    names = [
        r["name"]
        for r in load_table(spark, sf_dir, "part")
        .select(F.col("p_name").alias("name"))
        .distinct()
        .collect()
    ]
    expect = {}
    for i, a in enumerate(names):
        ga = _grams(a)
        for b in names[i + 1:]:
            x, y = sorted((a, b))
            gb = _grams(b)
            inter = len(ga & gb)
            un = len(ga | gb)
            if 5 * inter >= 3 * un:
                expect[(x, y)] = (inter, un)
    got = {
        (r["name_a"], r["name_b"]): (r["n_common"], r["n_union"])
        for r in _rows(spark, sf_dir, "prefix_filter_jaccard_join")
    }
    assert got == expect
    for r in _rows(spark, sf_dir, "prefix_filter_jaccard_join"):
        assert math.isclose(
            r["jaccard"], r["n_common"] / r["n_union"], abs_tol=1e-6
        )
        assert r["jaccard"] >= 0.6 - 1e-9


def test_mutual_information_bounds(spark, sf_dir):
    rows = _rows(spark, sf_dir, "categorical_mutual_information")
    assert len(rows) == 2
    for r in rows:
        # MI is nonnegative (within the 12-decimal term rounding) and
        # bounded by min entropy <= ln(min cardinality)
        assert r["mutual_info"] >= -1e-6
        assert r["mutual_info"] <= math.log(min(r["card_x"], r["card_y"])) + 1e-6
        assert -1e-6 <= r["normalized_mi"] <= 1.0 + 1e-6
        assert r["n"] > 0
