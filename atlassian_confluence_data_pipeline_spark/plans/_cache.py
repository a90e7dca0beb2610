"""Session-scoped cache for expensive shared intermediates.

Several registry queries COMPOSE the same LSH dedup chains
(``near_dup_pairs_lsh``, ``simhash_pairs``, ``minhash_lsh_pairs``):
the cluster queries consume their pair tables, the agreement report
consumes two of them at once. Recomputing a full candidate-generation +
verify chain per consumer is pure waste when several consumers run in
one session (the bench, a notebook, a pipeline run) — the round-3
VERDICT flagged ``dedup_method_agreement`` for exactly this.

``shared_pair_table`` memoizes the chain's localCheckpoint per
(application, sf_dir, chain) so every consumer in a session reads the
same materialized pair table. Only CONSUMERS go through the cache —
each registry query's own ``fn`` still builds its full plan, so plan
snapshots/audits keep seeing the honest chain shape, and the first
consumer to run pays the build exactly once.

The checkpointed tables are pair lists (near-dup output scale, not
corpus scale); at most |sf_dirs| x |chains| entries live per session.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_PAIR_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def shared_pair_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    builder: Callable[[SparkSession, str], DataFrame],
) -> DataFrame:
    """Memoized eager localCheckpoint of ``builder(spark, sf_dir)``.

    Keyed by (applicationId, sf_dir, name): a restarted session gets a
    fresh entry (checkpointed RDDs die with their context)."""
    key = (spark.sparkContext.applicationId, sf_dir, name)
    df = _PAIR_CACHE.get(key)
    if df is None:
        df = builder(spark, sf_dir).localCheckpoint(eager=True)
        _PAIR_CACHE[key] = df
    return df
