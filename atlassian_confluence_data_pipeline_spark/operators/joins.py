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


def _asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_value_cols: Sequence[str],
    forward: bool,
) -> DataFrame:
    """Shared union-and-carry as-of machinery.

    All right value columns travel as ONE struct carried by a single
    ``last(ignorenulls=True)``: per-column carries would, when a matched
    right row holds a NULL in one column, fill that column from a
    DIFFERENT (earlier/later-ts) right row — a mixed-row result that
    diverges from ASOF semantics (the nearest row's NULL must survive).
    The struct itself is non-null on every right row (even when all its
    fields are null), so the carry always lands on exactly one row.
    """
    from pyspark.sql import Window

    r = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__tag"),
        F.struct(*[F.col(c) for c in right_value_cols]).alias("__rv"),
    )
    rv_type = r.schema["__rv"].dataType
    l_cols = left.columns
    l = left.select(
        *l_cols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast(rv_type).alias("__rv"),
    )
    merged = r.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_cols if c != on],
        on,
        "__ts",
        "__tag",
        "__rv",
    ).unionByName(l.select(*[c for c in l_cols if c != on], on, "__ts", "__tag", "__rv"))
    # right rows (tag 0) sort before left rows at equal ts in BOTH
    # directions => ties are inclusive (right_ts == left_ts matches),
    # matching ASOF ... ON l.ts >= r.ts (backward) / l.ts <= r.ts (forward)
    order = [F.desc("__ts"), F.asc("__tag")] if forward else [F.asc("__ts"), F.asc("__tag")]
    w = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = merged.withColumn("__rv", F.last("__rv", ignorenulls=True).over(w))
    return (
        merged.filter(F.col("__tag") == 1)
        .select(
            *l_cols,
            *[F.col("__rv")[c].alias(f"asof_{c}") for c in right_value_cols],
        )
    )


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
    each key's timeline once, and carry the last non-null right-row
    STRUCT forward with an unbounded-preceding window — one shuffle on
    the key, O(n log n) per key, no pair blowup, and all value columns
    come from the SAME matched row (a NULL field in the nearest right
    row stays NULL rather than being backfilled from an older row).

    ``right`` must be unique per (on, right_ts) — pre-aggregate ties
    upstream or the carried value is nondeterministic (same caveat as
    native ASOF implementations).
    """
    return _asof_join(
        left, right, on, left_ts, right_ts, right_value_cols, forward=False
    )


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
    timeline walked DESCENDING; all value columns come from the same
    matched right row (struct carry, see ``_asof_join``).

    ``right`` must be unique per (on, right_ts), as with backward."""
    return _asof_join(
        left, right, on, left_ts, right_ts, right_value_cols, forward=True
    )


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
