"""Dedup / set operators: exact, latest-per-key, union-dedup.

Reference analogs: visited-set dedup during scans (confluence_client.py:
292,315-318), union of updated+missing phases with skip-seen
(master_script.py:487-490,:525,:553-558), last-write-wins state upsert
(state_manager.py:93-99). All land on HashAggregate / window physical
plans — map-side partial aggregation makes these shuffle-light at scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_exact(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """Exact dedup on ``cols`` (or all columns). Reference D1."""
    return df.dropDuplicates(list(cols) if cols else None)


def dedup_by_hash(df: DataFrame, text_col: str, keep_col: str) -> DataFrame:
    """Exact content dedup via sha2-256 of ``text_col`` (extension X1).

    Hashing first means the shuffle key is a fixed-width 64-char digest
    rather than an arbitrarily large document body — at 100 TB the
    exchange moves hashes + small keys, not page-size strings. Keeps the
    row with the minimal ``keep_col`` per content hash (deterministic).
    """
    hashed = df.withColumn("__h", F.sha2(F.col(text_col), 256))
    w = Window.partitionBy("__h").orderBy(F.col(keep_col).asc())
    return hashed.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__h", "__rn")


def latest_per_key(
    df: DataFrame, keys: Sequence[str], order_cols: Sequence[str]
) -> DataFrame:
    """Keep the single latest row per key (highest ``order_cols``).

    Reference W2: last-write-wins upsert semantics (state_manager.py:93-99)
    made explicit and deterministic via row_number over a descending sort.
    """
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order_cols])
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def union_dedup(a: DataFrame, b: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Union two phases' outputs, keeping one row per key (first frame wins).

    Reference D2: updated-pages ∪ missing-pages with skip-seen
    (master_script.py:487-558). Implemented as union + priority window so
    it stays a single shuffle instead of a join followed by a union.
    """
    tagged = a.withColumn("__src", F.lit(0)).unionByName(b.withColumn("__src", F.lit(1)))
    w = Window.partitionBy(*keys).orderBy(F.col("__src").asc())
    return tagged.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__src", "__rn")
