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
