"""Portable HyperLogLog (register-based distinct sketch).

The mergeable distinct-counting structure every 100 TB pipeline runs
instead of count(DISTINCT): each key hashes once; its low bits pick one
of ``HLL_M`` registers and the rank of the first set bit in the
remaining bits updates that register via max. Registers form a monoid
(merge = element-wise max), so partial sketches combine across
partitions, batches, sources, and streaming micro-batches without ever
revisiting data.

Engine-portable by construction: the hash is the house affine family
over values already reduced below 2^31, and the first-set-bit rank is
an integer CASE ladder — no count-leading-zeros intrinsic, no libm —
so DuckDB reproduces every register bit-for-bit. The estimator
(alpha_m * m^2 / sum 2^-M_j, with the standard small-range linear
counting correction) is the same double expression on both engines.

Spark's own approx_count_distinct wraps HllSketch natively; this
operator exists because its internals are NOT reproducible in an
external oracle — here every register is hash-checkable, which is what
the correctness gate (and any cross-system reconciliation) needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.functions.text import ROLLING_MOD
from atlassian_confluence_data_pipeline_spark.operators.lsh import MINHASH_PERMS

#: register count (power of two) and its standard bias constant
#: (alpha_m = 0.7213 / (1 + 1.079/m) for m >= 128, Flajolet et al. 2007)
HLL_M = 256
HLL_ALPHA = 0.7213 / (1 + 1.079 / 256)
#: bits of hash left after the 8 register-index bits (hash < 2^31)
HLL_W_BITS = 23
#: the affine perm drawn for the HLL hash
HLL_PERM = MINHASH_PERMS[50]
#: avalanche finalizer multiplier (golden-ratio constant; products with
#: h < 2^31 stay < 2^63)
HLL_MIX = 2654435761


def hll_hash(key: Column) -> Column:
    """Mixed hash into [0, 2^31): affine perm then a multiply-xor-shift
    FINALIZER. The finalizer matters: a bare affine map is linear, so
    over SEQUENTIAL keys (the common id shape) the remainder bits form
    an arithmetic progression and the register ranks are systematically
    biased — measured 65% HLL error on 500 sequential ids, vs ~sketch
    noise after mixing (pinned by tests/test_wave_properties.py). Pure
    integer ops (xor, shift, mod) so any engine reproduces it; the key
    reduces below 2^31 first (overflow discipline)."""
    a, b = HLL_PERM
    h1 = (F.lit(a) * (key % ROLLING_MOD) + F.lit(b)) % ROLLING_MOD
    h2 = h1.bitwiseXOR(F.shiftright(h1, 15))
    h3 = (F.lit(HLL_MIX) * h2) % ROLLING_MOD
    return h3.bitwiseXOR(F.shiftright(h3, 13))


def hll_hash_sql(key: str) -> str:
    """DuckDB rendering of :func:`hll_hash`, bit-for-bit."""
    a, b = HLL_PERM
    h1 = f"(({a} * ({key} % {ROLLING_MOD}) + {b}) % {ROLLING_MOD})"
    h2 = f"xor({h1}, {h1} >> 15)"
    h3 = f"(({HLL_MIX} * {h2}) % {ROLLING_MOD})"
    return f"xor({h3}, {h3} >> 13)"


def hll_register_index(h: Column) -> Column:
    return (h % HLL_M).cast("int")


def hll_rank(h: Column) -> Column:
    """Rank (1-based position of the first set bit, scanning from the
    most significant of the {W} remainder bits; W+1 when all zero) as
    an integer CASE ladder — no CLZ intrinsic, bit-identical in any
    engine."""
    w = (h / HLL_M).cast("bigint")  # floor division: h >= 0
    expr = F.lit(HLL_W_BITS + 1)
    # build from the LAST position backwards so earlier WHENs win
    cond = None
    for p in range(HLL_W_BITS, 0, -1):
        bit = F.shiftright(w, HLL_W_BITS - p).bitwiseAND(1)
        cond = F.when(bit == 1, p).otherwise(
            expr if cond is None else cond
        )
    return cond.cast("int")


def hll_rank_sql(w: str) -> str:
    """DuckDB rendering of :func:`hll_rank` over remainder ``w``."""
    ladder = f"{HLL_W_BITS + 1}"
    for p in range(HLL_W_BITS, 0, -1):
        ladder = (
            f"CASE WHEN (({w} >> {HLL_W_BITS - p}) & 1) = 1 "
            f"THEN {p} ELSE {ladder} END"
        )
    return ladder


def hll_registers(df: DataFrame, key: Column, extra_keys=()) -> DataFrame:
    """Collapse ``df`` to one register table: (*extra_keys, reg, mx) —
    max rank per register (per group). One narrow projection + one
    hash aggregate; the register table is at most |groups| x {M} rows."""
    h = hll_hash(key)
    proj = df.select(
        *extra_keys,
        hll_register_index(h).alias("reg"),
        hll_rank(h).alias("rank"),
    )
    return proj.groupBy(*extra_keys, "reg").agg(F.max("rank").alias("mx"))


def hll_estimate_sql(reg_rel: str) -> str:
    """DuckDB estimate over a relation with columns (reg, mx): the raw
    HLL estimator with linear-counting correction. ``m - count(*)``
    registers are implicit zeros."""
    m = HLL_M
    raw = (
        f"CAST('{HLL_ALPHA!r}' AS DOUBLE) * {m} * {m} / "
        f"(({m} - count(*)) * CAST(1.0 AS DOUBLE)"
        f" + sum(power(CAST(2.0 AS DOUBLE), -mx)))"
    )
    zeros = f"({m} - count(*))"
    return (
        f"CASE WHEN {raw} <= 2.5 * {m} AND {zeros} > 0 "
        f"THEN {m} * ln(CAST({m} AS DOUBLE) / {zeros}) ELSE {raw} END"
    )


def hll_estimate_col(n_regs: Column, sum_pow: Column) -> Column:
    """Spark estimate from (non-zero register count, sum of 2^-mx) —
    the SAME double expression as :func:`hll_estimate_sql`."""
    m = HLL_M
    raw = (
        F.lit(HLL_ALPHA)
        * m
        * m
        / ((m - n_regs).cast("double") + sum_pow)
    )
    zeros = (m - n_regs).cast("double")
    return F.when(
        (raw <= 2.5 * m) & (zeros > 0),
        m * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)
