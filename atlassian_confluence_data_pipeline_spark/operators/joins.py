"""Join operators: semi/anti membership, CDC delta, lookup joins.

Re-expresses the reference's Python set/dict-membership joins
(reference: master_script.py:561, :417-421; state_manager.py:55-82;
html_generator.py:212-248) as Catalyst equi-joins. Catalyst picks
BroadcastHashJoin when a side fits under the broadcast threshold, else
SortMergeJoin; callers can force broadcast for known-small dims.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def anti_join(df: DataFrame, other: DataFrame, on: str | Sequence[str]) -> DataFrame:
    """Rows of ``df`` whose key is NOT present in ``other``.

    Reference J1: ``if page_id not in current_state`` (master_script.py:561).
    """
    return df.join(other, on, "left_anti")


def semi_join(df: DataFrame, other: DataFrame, on: str | Sequence[str]) -> DataFrame:
    """Rows of ``df`` whose key IS present in ``other`` (EXISTS).

    Reference J2: "space already seen?" (master_script.py:417-421).
    """
    return df.join(other, on, "left_semi")


def lookup_join(
    facts: DataFrame,
    dim: DataFrame,
    on: str | Sequence[str],
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Enrich a large fact table with a small dimension.

    Reference J4: attachment -> page lookup (html_generator.py:212-248).
    Broadcasting the dim avoids shuffling the 100 TB fact side entirely.
    """
    return facts.join(F.broadcast(dim) if broadcast_dim else dim, on, how)


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_value_cols: Sequence[str],
) -> DataFrame:
    """As-of join (backward): for every left row, attach the latest right
    row with ``right_ts <= left_ts`` within the same ``on`` key.

    Spark has no native ASOF JOIN; a naive range join explodes to
    O(|left|x|right|) per key. This implementation is the scalable
    union-and-carry-forward form: tag right rows 0 / left rows 1, sort
    each key's timeline once, and carry the last non-null right value
    forward with an unbounded-preceding window — one shuffle on the key,
    O(n log n) per key, no pair blowup.

    ``right`` must be unique per (on, right_ts) — pre-aggregate ties
    upstream or the carried value is nondeterministic (same caveat as
    native ASOF implementations).
    """
    from pyspark.sql import Window

    carried = [f"__r_{c}" for c in right_value_cols]
    r = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__tag"),
        *[F.col(c).alias(a) for c, a in zip(right_value_cols, carried)],
    )
    l_cols = left.columns
    l = left.select(
        *l_cols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__tag"),
        *[F.lit(None).cast(t.dataType).alias(a)
          for t, a in zip(
              [right.schema[c] for c in right_value_cols], carried
          )],
    )
    merged = r.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_cols if c != on],
        on,
        "__ts",
        "__tag",
        *carried,
    ).unionByName(l.select(*[c for c in l_cols if c != on], on, "__ts", "__tag", *carried))
    # right rows sort before left rows at equal ts => ties are inclusive
    # (right_ts == left_ts counts), matching ASOF ... ON l.ts >= r.ts
    w = (
        Window.partitionBy(on)
        .orderBy("__ts", "__tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for a in carried:
        merged = merged.withColumn(a, F.last(a, ignorenulls=True).over(w))
    out = merged.filter(F.col("__tag") == 1).drop("__ts", "__tag")
    for c, a in zip(right_value_cols, carried):
        out = out.withColumnRenamed(a, f"asof_{c}")
    return out


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_value_cols: Sequence[str],
) -> DataFrame:
    """As-of join (forward): for every left row, attach the EARLIEST
    right row with ``right_ts >= left_ts`` within the same ``on`` key —
    the next-event direction (click -> next purchase), mirroring
    :func:`asof_join_backward`'s union-and-carry form with the merged
    timeline walked DESCENDING: sorting each key's rows by ts
    descending (right rows before left at equal ts, so ties are
    inclusive) and carrying the last non-null right value makes the
    carried value the smallest right_ts at-or-after each left row. One
    shuffle on the key, no range-join pair explosion.

    ``right`` must be unique per (on, right_ts), as with backward."""
    from pyspark.sql import Window

    carried = [f"__r_{c}" for c in right_value_cols]
    r = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__tag"),
        *[F.col(c).alias(a) for c, a in zip(right_value_cols, carried)],
    )
    l_cols = left.columns
    l = left.select(
        *l_cols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__tag"),
        *[F.lit(None).cast(t.dataType).alias(a)
          for t, a in zip(
              [right.schema[c] for c in right_value_cols], carried
          )],
    )
    merged = r.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_cols if c != on],
        on,
        "__ts",
        "__tag",
        *carried,
    ).unionByName(l.select(*[c for c in l_cols if c != on], on, "__ts", "__tag", *carried))
    # descending ts; right rows (tag 0) first at equal ts => right_ts ==
    # left_ts counts, matching ASOF ... ON l.ts <= r.ts
    w = (
        Window.partitionBy(on)
        .orderBy(F.desc("__ts"), F.asc("__tag"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for a in carried:
        merged = merged.withColumn(a, F.last(a, ignorenulls=True).over(w))
    out = merged.filter(F.col("__tag") == 1).drop("__ts", "__tag")
    for c, a in zip(right_value_cols, carried):
        out = out.withColumnRenamed(a, f"asof_{c}")
    return out


def cdc_delta(
    current: DataFrame,
    state: DataFrame,
    key: str | Sequence[str],
    current_version: Column,
    state_version_col: str,
    change_col: str = "change_type",
) -> DataFrame:
    """Classify current rows as ``new`` / ``updated``, dropping unchanged.

    Reference J3 (state_manager.py:55-82): a row is processed iff its key
    is absent from the state ledger (-> 'new') or the ledger's version is
    older (-> 'updated'); rows with ``state.version >= current`` are
    skipped (state_manager.py:72).

    ``state`` must carry ``state_version_col`` plus the key columns; it is
    typically small relative to ``current`` (broadcast-able) but the join
    is left to Catalyst/AQE since at 100 TB the ledger can be huge too.
    """
    keys = [key] if isinstance(key, str) else list(key)
    state_sel = state.select(*keys, F.col(state_version_col).alias("__v_state"))
    joined = current.join(state_sel, keys, "left")
    is_new = F.col("__v_state").isNull()
    is_updated = F.col("__v_state") < current_version
    return (
        joined.filter(is_new | is_updated)
        .withColumn(change_col, F.when(is_new, F.lit("new")).otherwise(F.lit("updated")))
        .drop("__v_state")
    )
