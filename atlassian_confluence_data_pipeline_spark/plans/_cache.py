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


def srp_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-memoized SRP fingerprint frame ``(vec_id, simhash)`` over
    the embeddings table — the stage every embedding-LSH consumer
    (``embedding_lsh_pairs``, ``dbscan_embedding_clusters``,
    ``knn_graph_lsh``, ``hard_negative_mining``) starts from. The frame
    is corpus-cardinality but two narrow columns (id + one bigint), so
    the checkpoint is cheap relative to re-running the 64-fold
    hyperplane projection per consumer (round-5 VERDICT: the top-4
    bench costs each rebuilt this chain, ~20 s of the 216 s wall)."""
    from atlassian_confluence_data_pipeline_spark.catalog import load_table
    from atlassian_confluence_data_pipeline_spark.operators.lsh import (
        with_srp_fingerprint,
    )

    def _build(spark: SparkSession, sf_dir: str) -> DataFrame:
        emb = load_table(spark, sf_dir, "embeddings")
        return with_srp_fingerprint(
            emb.select("vec_id", "embedding"), "embedding"
        ).select("vec_id", "simhash")

    return shared_pair_table(spark, sf_dir, "srp_fingerprints", _build)


def srp_candidates(
    spark: SparkSession, sf_dir: str, max_hamming: int, chunks: int
) -> DataFrame:
    """Session-memoized SRP banding-candidate pairs ``(id_a, id_b)`` at
    a given (max_hamming, chunks) config, built on the shared
    fingerprint frame. All four embedding-LSH consumers currently run at
    (26, 8), so they share ONE entry; a consumer that diverges its
    config gets its own keyed entry automatically."""
    from atlassian_confluence_data_pipeline_spark.operators.lsh import (
        simhash_near_pairs,
    )

    def _build(spark: SparkSession, sf_dir: str) -> DataFrame:
        return simhash_near_pairs(
            srp_fingerprints(spark, sf_dir),
            "vec_id",
            max_hamming=max_hamming,
            chunks=chunks,
        )

    return shared_pair_table(
        spark, sf_dir, f"srp_candidates_h{max_hamming}c{chunks}", _build
    )
