"""Incremental materialized rollups (the hypertable-rollup pattern).

At 100 TB you do not rescan history to refresh a dashboard aggregate:
you maintain a summary table of *mergeable partial aggregates* (count,
sum, min, max — any commutative monoid) keyed by the rollup dimensions,
and fold each new micro-batch in with one MERGE-shaped combine. This is
the aggregate analog of the state ledger (operators/state.py): the
reference's run counters (master_script.py:294-300) persisted and
combined across runs instead of recomputed.

avg/stddev derive from (sum, count, sum_sq) at read time — derived
metrics are never stored, only mergeable partials.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: partial-aggregate columns maintained per group
PARTIALS = ("n_rows", "sum_val", "sum_sq", "min_val", "max_val")


def partial_aggregate(
    batch: DataFrame, keys: Sequence[str], value_col: str
) -> DataFrame:
    """Collapse one batch to mergeable partials per key."""
    v = F.col(value_col).cast("decimal(18,6)")
    # pin partial dtypes so the summary schema is STABLE across merges
    # (unpinned, Spark's decimal-widening rules drift the scale as the
    # merge chain deepens and the table schema would change per batch)
    return batch.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(v).cast("decimal(30,6)").alias("sum_val"),
        F.sum(v * v).cast("decimal(38,12)").alias("sum_sq"),
        F.min(v).alias("min_val"),
        F.max(v).alias("max_val"),
    )


def merge_rollup(
    summary: DataFrame, batch_partials: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Fold a batch's partials into the summary: full outer combine per
    key, monoid-merge each partial. One shuffle on the rollup keys;
    cost is O(|summary| + |batch|), independent of history size."""
    s = summary.select(
        *keys, *[F.col(c).alias(f"__s_{c}") for c in PARTIALS]
    )
    b = batch_partials.select(
        *keys, *[F.col(c).alias(f"__b_{c}") for c in PARTIALS]
    )
    joined = s.join(b, list(keys), "full_outer")

    def add(c: str):
        return F.coalesce(F.col(f"__s_{c}"), F.lit(0)) + F.coalesce(
            F.col(f"__b_{c}"), F.lit(0)
        )

    # least/greatest skip NULLs in Spark -> exactly the monoid identity
    # we need for keys present on only one side
    return joined.select(
        *keys,
        add("n_rows").cast("bigint").alias("n_rows"),
        add("sum_val").cast("decimal(30,6)").alias("sum_val"),
        add("sum_sq").cast("decimal(38,12)").alias("sum_sq"),
        F.least(F.col("__s_min_val"), F.col("__b_min_val")).alias("min_val"),
        F.greatest(F.col("__s_max_val"), F.col("__b_max_val")).alias("max_val"),
    )


def read_metrics(summary: DataFrame) -> DataFrame:
    """Derived metrics from the stored partials (computed at read time)."""
    mean = F.col("sum_val").cast("double") / F.col("n_rows")
    var = F.col("sum_sq").cast("double") / F.col("n_rows") - mean * mean
    return summary.select(
        "*",
        F.round(mean, 6).alias("avg_val"),
        F.round(F.sqrt(F.greatest(var, F.lit(0.0))), 6).alias("stddev_pop"),
    )
