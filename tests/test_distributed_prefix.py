"""distributed_prefix_rank — the two-pass replacement for unpartitioned
global windows (round-4 brief item 1).

Semantic contract: identical output to the naive single-partition
``Window.orderBy(...)`` forms (inclusive prefix sum, 1-based row_number,
exclusive prefix max) for arbitrary data, including duplicate order
keys, constant keys, skew, and degenerate range counts. Plan contract:
the big window is PARTITIONED (hash by range bucket) — no
single-partition WindowExec anywhere in the operator's plan.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.operators.windows import (
    distributed_prefix_rank,
)


def _naive(df, order_by, with_max=True):
    wi = Window.orderBy(*order_by).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wx = Window.orderBy(*order_by).rowsBetween(
        Window.unboundedPreceding, -1
    )
    cols = [
        "k",
        "v",
        F.sum("v").over(wi).alias("cs"),
    ]
    if with_max:
        cols.append(F.max("v").over(wx).alias("xm"))
    cols.append(F.row_number().over(Window.orderBy(*order_by)).alias("i"))
    return df.select(*cols)


def _rows(spark, rows):
    return spark.createDataFrame(rows, "k bigint, v bigint")


@pytest.mark.parametrize("num_ranges", [1, 4, 32])
def test_matches_naive_window_with_duplicates_and_skew(spark, num_ranges):
    rng = random.Random(13)
    # heavy skew: half the rows share 3 hot keys; plus duplicates
    rows = [(rng.randint(0, 10**9), rng.randint(1, 1000)) for _ in range(4000)]
    rows += [(7, rng.randint(1, 1000)) for _ in range(2000)]
    rows += [(rows[i][0], rows[i][1]) for i in range(100)]  # exact dups
    df = _rows(spark, rows)
    got = distributed_prefix_rank(
        df,
        ["k", "v"],
        sums={"cs": "v"},
        rank_col="i",
        exclusive_maxes={"xm": "v"},
        num_ranges=num_ranges,
    )
    want = _naive(df, ["k", "v"])
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_constant_key_domain(spark):
    df = _rows(spark, [(5, i % 17 + 1) for i in range(500)])
    got = distributed_prefix_rank(
        df, ["k", "v"], sums={"cs": "v"}, rank_col="i", num_ranges=8
    )
    want = _naive(df, ["k", "v"], with_max=False)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_decimal_sums_stay_exact(spark):
    import decimal

    rows = [(i, decimal.Decimal(f"{i}.{i % 10}00001")) for i in range(1, 400)]
    df = spark.createDataFrame(rows, "k bigint, v decimal(18,6)")
    got = distributed_prefix_rank(df, ["k"], sums={"cs": "v"}, num_ranges=8)
    wi = Window.orderBy("k").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = df.select("k", "v", F.sum("v").over(wi).alias("cs"))
    g = {r["k"]: r["cs"] for r in got.collect()}
    w = {r["k"]: r["cs"] for r in want.collect()}
    assert g == w  # Decimal equality — bit-exact, no float drift


def test_plan_has_no_single_partition_window(spark):
    import re

    df = _rows(spark, [(i * 37 % 1000, i) for i in range(2000)])
    got = distributed_prefix_rank(
        df, ["k", "v"], sums={"cs": "v"}, rank_col="i", num_ranges=16
    )
    phys = got._jdf.queryExecution().executedPlan().toString()
    # every windowspecdefinition must lead with a partition column (a
    # bare attribute, not an "expr ASC/DESC NULLS ..." ordering clause)
    assert not re.search(
        r"windowspecdefinition\([^,()]+ (?:ASC|DESC) NULLS", phys
    ), phys


def test_noop_without_outputs(spark):
    df = _rows(spark, [(1, 2)])
    assert distributed_prefix_rank(df, ["k"]) is df


def test_modular_chain_matches_sequential(spark):
    from atlassian_confluence_data_pipeline_spark.operators.windows import (
        distributed_modular_chain,
    )

    MOD, A = 2_147_483_647, 1_103_515_245
    rng = random.Random(9)
    rows = [
        (rng.randint(0, 10**9), i, rng.randint(0, 2**40))
        for i in range(3000)
    ]
    df = spark.createDataFrame(rows, "k bigint, i bigint, h bigint")
    for nr in (1, 16):
        got = {
            (r["k"], r["i"]): r["chain"]
            for r in distributed_modular_chain(
                df, ["k", "i"], "h", "chain", A, MOD, num_ranges=nr
            ).collect()
        }
        y, want = 0, {}
        for k, i, h in sorted(rows):
            y = (A * y + h % MOD) % MOD
            want[(k, i)] = y
        assert got == want  # exact integer parity with the sequential scan


def test_plan_audit_window_detector_on_plan_text():
    """The audit's unpartitioned-window detector reads plan text; pin
    its behavior on both shapes so audit regressions are loud."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from plan_audit import _has_unpartitioned_window

    partitioned = (
        "Window [sum(v#1L) windowspecdefinition(bucket#53, k#0L ASC NULLS"
        " FIRST, specifiedwindowframe(...)) AS s#55L], [bucket#53]"
    )
    unpartitioned = (
        "Window [sum(v#1L) windowspecdefinition(k#0L ASC NULLS FIRST,"
        " specifiedwindowframe(...)) AS s#55L], [k#0L ASC NULLS FIRST]"
    )
    assert not _has_unpartitioned_window(partitioned)
    assert _has_unpartitioned_window(unpartitioned)
    assert _has_unpartitioned_window(partitioned + "\n" + unpartitioned)


def test_kth_smallest_matches_sorted_reference(spark):
    """Distributed selection returns exactly the kth order statistics a
    full sort would, including under duplicates and negative values."""
    import random

    from atlassian_confluence_data_pipeline_spark.operators.windows import (
        kth_smallest,
    )

    rng = random.Random(7)
    vals = [rng.randint(-50, 50) * 1.5 for _ in range(997)] + [3.0] * 25
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    ref = sorted(vals)
    ks = [1, 2, 511, 512, len(vals) - 1, len(vals)]
    got = kth_smallest(df, "v", ks)
    for k in ks:
        assert got[k] == ref[k - 1], k
    # out-of-range ranks are an explicit error
    import pytest

    with pytest.raises(ValueError):
        kth_smallest(df, "v", [0])
    with pytest.raises(ValueError):
        kth_smallest(df, "v", [len(vals) + 1])


def test_kth_smallest_ignores_nulls(spark):
    """NULLs must not occupy ranks: the kth smallest is defined over the
    non-null domain (a NULL would otherwise land in bucket 0 and shift
    every requested rank)."""
    from atlassian_confluence_data_pipeline_spark.operators.windows import (
        kth_smallest,
    )

    vals = [5.0, None, 1.0, None, 3.0, 2.0, None, 4.0]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = kth_smallest(df, "v", [1, 3, 5])
    assert got == {1: 1.0, 3: 3.0, 5: 5.0}


def test_kth_smallest_skew_refinement_and_extra_sums(spark):
    """Round-11 internals: (a) a zero-centered heavy distribution under
    an equal-width bucketizer lands the median rank in one giant bucket
    — the iterative refinement (forced here by a tiny refine_rows
    threshold) must still return the exact order statistics; (b) the
    constant-bucket shortcut answers duplicate plateaus without a sort;
    (c) extra_sums piggybacks exact integer sums on the count pass."""
    import random

    from atlassian_confluence_data_pipeline_spark.operators.windows import (
        equal_width_bucketizer,
        kth_smallest,
    )

    rng = random.Random(11)
    # heavy-centered: most mass within +-1, tails to +-1e6 (the pair-
    # slope profile that collapsed equal-width buckets in robust_trend)
    vals = [rng.gauss(0.0, 0.5) for _ in range(3000)] + [
        rng.uniform(-1e6, 1e6) for _ in range(60)
    ]
    sgns = [1 if v > 0 else (-1 if v < 0 else 0) for v in vals]
    df = spark.createDataFrame(list(zip(vals, sgns)), "v double, sgn int")
    ref = sorted(vals)
    ks = [1, len(vals) // 2, len(vals) // 2 + 1, len(vals)]
    got, extras = kth_smallest(
        df,
        "v",
        ks,
        bucket_of=equal_width_bucketizer(-1e6, 1e6, 32),
        extra_sums={"s": "sgn"},
        refine_rows=100,  # force the skew-refinement loop on test data
    )
    for k in ks:
        assert got[k] == ref[k - 1], k
    assert extras["s"] == sum(sgns)

    # constant plateau: every rank resolves from the count pass alone
    plateau = spark.createDataFrame([(7.5,)] * 40, "v double")
    got2 = kth_smallest(
        plateau, "v", [1, 20, 40], bucket_of=equal_width_bucketizer(0, 10, 8)
    )
    assert got2 == {1: 7.5, 20: 7.5, 40: 7.5}
