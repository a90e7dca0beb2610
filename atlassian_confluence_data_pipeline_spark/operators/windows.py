"""Window / ranking / top-k operators (SURVEY.md §2.5).

The reference never orders rows (API order taken as-is; its only analog
is the results[0] first-match pick, confluence_client.py:272-273); the
engine exposes the standard analytic surface. Top-k goes through
``TakeOrderedAndProject`` (per-partition heap + driver merge of k rows,
no global sort) — the plan that survives a 100x scale-up.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k(df: DataFrame, order_cols: Sequence[Column], k: int) -> DataFrame:
    """Global top-k. ``order_cols`` must be a total order (add a unique
    tie-breaker) so results are deterministic across engines."""
    return df.orderBy(*order_cols).limit(k)


def top_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Top-k within each group via row_number (deterministic with a
    tie-broken ordering). Engine form of the reference's first-match pick
    (W1) generalized to k > 1."""
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)
