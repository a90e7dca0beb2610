"""Skew-handling operators (extension X6; SURVEY.md §7 hard-point 6).

The reference's per-space sweep (master_script.py:496-558) is the skew
analog: one hot space key dominates the run. At 100 TB a hot key turns
one reducer into the whole job's critical path. Two standing remedies,
plus AQE:

- **Two-phase (salted) aggregation**: aggregate on (key, salt) first —
  the hot key's rows spread over ``n_salts`` reducers — then combine the
  partials per key. Works for any associative aggregate; this module
  ships count/sum forms.
- **Replicated (salted) join**: explode the small side to every salt of
  the hot keys so the big side's salted rows still find their match.
- **AQE skew-join splitting** (session.py turns it on) handles the
  sort-merge case automatically at runtime; the explicit operators are
  for aggregations and for engines/paths AQE does not cover.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, salt_col: str = "__salt") -> DataFrame:
    """Uniform random-ish salt derived deterministically from the row's
    whole content hash (no rand(): deterministic re-runs, no RNG state
    in recovery paths)."""
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(*df.columns), F.lit(n_salts)).cast("int")
    )


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[Column, Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation: partial on (keys + salt), final on keys.

    ``aggs`` maps output column -> (partial_agg_expr, final_agg_expr over
    the partial column). Example::

        salted_agg(df, ["k"], {
            "n":   (F.count(F.lit(1)),      F.sum("n")),
            "tot": (F.sum(F.col("v")),      F.sum("tot")),
        })

    The hot key's input spreads across ``n_salts`` partial groups, so no
    single reducer sees the whole key until the (tiny) partial rows
    combine."""
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(*keys, "__salt").agg(
        *[expr.alias(name) for name, (expr, _) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[final.alias(name) for name, (_, final) in aggs.items()]
    )


def salted_join_skewed(
    big: DataFrame,
    small: DataFrame,
    key: str,
    hot_keys: Sequence,
    n_salts: int = 16,
) -> DataFrame:
    """Inner equi-join where ``big`` is skewed on ``hot_keys``.

    Hot rows of the big side get a deterministic salt in [0, n_salts);
    the small side replicates its hot rows across every salt. Non-hot
    rows join on salt 0 with no replication. Join key becomes
    (key, salt) — the hot key's work spreads over n_salts tasks."""
    hot = F.col(key).isin(list(hot_keys))
    big_salted = big.withColumn(
        "__salt",
        F.when(hot, F.pmod(F.xxhash64(*big.columns), F.lit(n_salts)))
        .otherwise(F.lit(0))
        .cast("int"),
    )
    salts = F.when(
        hot, F.sequence(F.lit(0), F.lit(n_salts - 1))
    ).otherwise(F.array(F.lit(0)))
    # generators cannot be nested inside other expressions: explode bare
    small_replicated = small.withColumn("__salt", F.explode(salts))
    return big_salted.join(small_replicated, [key, "__salt"]).drop("__salt")
