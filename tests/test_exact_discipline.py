"""Round-12 overflow discipline for ``plans/_exact.py`` (r11 VERDICT #1).

``dsum``/``davg`` sum unscaled micros as TWO primitive long sums (hi/lo
split at 2^20, floor div/mod) recombined once per group in
DECIMAL(38,0). These tests pin:

* bit-identity with the reference ``sum(cast(c AS DECIMAL(18,6)))``
  rendering on ordinary mixed-sign values (the oracle-side form),
* exactness on adversarial magnitudes where a SINGLE long micros sum
  provably wraps — the pre-round-12 fast path's silent-overflow zone
  (a global money sum crossed it around TPC-H SF ~160),
* the per-row split identity ``micros == (micros >> 20) * 2^20 +
  pmod(micros, 2^20)`` for either sign, which is the whole proof,
* the documented per-group budgets as executable arithmetic, so a
  future edit that narrows the split re-derives them consciously.
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.plans._exact import (
    _DEC_UNIT,
    _SPLIT,
    _SPLIT_BITS,
    DEC,
    davg,
    dsum,
)


def _ref_sum(df, col, scale):
    """The oracle-side rendering: decimal(18,6) sum, cast, round."""
    return df.agg(
        F.round(F.sum(F.col(col).cast(DEC)).cast("double"), scale).alias("v")
    ).collect()[0]["v"]


def test_dsum_davg_match_decimal_reference(spark):
    vals = [12.34, -0.07, 99999.99, 0.0, -12345.6, 7.001, None, 3.3]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = df.agg(dsum("v").alias("s"), davg("v").alias("a")).collect()[0]
    assert got["s"] == _ref_sum(df, "v", 2)
    ref_avg = df.agg(
        F.round(
            F.sum(F.col("v").cast(DEC)).cast("double") / F.count("v"), 4
        ).alias("v")
    ).collect()[0]["v"]
    assert got["a"] == ref_avg


def test_dsum_exact_where_single_long_micros_sum_wraps(spark):
    # 20 rows of 9.2e11 units = 9.2e17 micros each; the total 1.84e19
    # micros exceeds int64 (9.22e18), so the old single-long fast path
    # wraps silently. The hi/lo split must return the exact total.
    v = 920_000_000_000.25
    n = 20
    df = spark.createDataFrame([(v,)] * n, "v double")
    single_long_total = n * int(Decimal(str(v)) * _DEC_UNIT)
    assert single_long_total > 2**63 - 1  # the adversarial premise
    got = df.agg(dsum("v").alias("s")).collect()[0]["s"]
    assert got == float(n * Decimal(str(v)))
    assert got == _ref_sum(df, "v", 2)


def test_split_identity_both_signs(spark):
    micros = [0, 1, -1, _SPLIT - 1, _SPLIT, -_SPLIT, 2**62, -(2**62), 7**19]
    df = spark.createDataFrame([(m,) for m in micros], "m bigint")
    bad = df.filter(
        F.shiftright("m", _SPLIT_BITS) * _SPLIT
        + F.pmod(F.col("m"), F.lit(_SPLIT))
        != F.col("m")
    ).count()
    assert bad == 0


def test_documented_budgets_cover_100tb_posture():
    long_max = 2**63 - 1
    # lo-sum budget: every lo is in [0, 2^20)
    lo_budget_rows = long_max // _SPLIT
    assert lo_budget_rows > 8.7e12
    # hi-sum budget in unit-rows: |hi| <= |micros| / 2^20
    hi_budget_unit_rows = long_max * _SPLIT // _DEC_UNIT
    assert hi_budget_unit_rows > 9.6e18
    # 100 TB lineitem posture: ~6e11 rows, |price| <= ~1.1e5 units
    rows_100tb, max_units = 6e11, 1.1e5
    assert rows_100tb < 0.1 * lo_budget_rows
    assert rows_100tb * max_units < 0.01 * hi_budget_unit_rows
    # ... and the OLD single-long path was indeed over budget there
    assert rows_100tb * max_units * _DEC_UNIT > 600 * long_max


def test_empty_and_all_null_groups_stay_null(spark):
    df = spark.createDataFrame([(None,), (None,)], "v double")
    got = df.agg(dsum("v").alias("s"), davg("v").alias("a")).collect()[0]
    assert got["s"] is None and got["a"] is None
