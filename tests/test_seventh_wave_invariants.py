"""Structural invariants of the seventh-wave operators (chunking,
vocab coverage, source caps, Bloom decontamination, whitening,
farthest-point selection, hard-negative mining) — properties the
row-hash oracle parity can't articulate (coverage, monotonicity,
no-false-negative guarantees), checked at the test scale factor."""

from __future__ import annotations

from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.plans import QUERIES
from atlassian_confluence_data_pipeline_spark.plans.curation4 import (
    CHUNK_S,
    CHUNK_W,
    MMR_K,
    SOURCE_CAP,
)


def test_chunks_cover_every_token_with_fixed_stride(spark, sf_dir):
    """Chunk i spans tokens [i*S+1, i*S+W]; together the chunks must
    cover the whole document: interior chunks are exactly W tokens and
    the last chunk reaches the final token."""
    ch = QUERIES["chunk_documents"].fn(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("n_words")
    )
    per_doc = ch.groupBy("doc_id").agg(
        F.max("chunk_id").alias("last_id"),
        F.min("n_tokens").alias("min_len"),
        F.max("n_tokens").alias("max_len"),
        F.sum(
            F.when(F.col("n_tokens") < CHUNK_W, 1).otherwise(0)
        ).alias("n_short"),
    )
    j = per_doc.join(docs, "doc_id")
    # every chunk fits the window; at most one (the last) is short
    assert j.filter(F.col("max_len") > CHUNK_W).count() == 0
    assert j.filter(F.col("n_short") > 1).count() == 0
    # the last chunk's span reaches the final token: last_id*S + its
    # length == n_words (slice clamps exactly at the tail)
    covered = j.filter(
        F.col("last_id") * CHUNK_S
        + F.when(F.col("n_words") >= CHUNK_W, CHUNK_W).otherwise(0)
        < F.col("n_words")
    )
    # interior coverage: consecutive starts differ by S < W, so any gap
    # would show as last chunk not reaching n_words
    assert covered.filter(F.col("n_words") > CHUNK_W).count() == 0


def test_vocab_oov_bounds_and_doc_count(spark, sf_dir):
    df = QUERIES["vocab_oov_rates"].fn(spark, sf_dir)
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert df.count() == n_docs
    assert df.filter(
        (F.col("n_oov") < 0) | (F.col("n_oov") > F.col("n_tokens"))
    ).count() == 0
    assert df.filter((F.col("oov_rate") < 0) | (F.col("oov_rate") > 1)).count() == 0


def test_source_cap_kept_is_min_of_cap_and_docs(spark, sf_dir):
    rows = QUERIES["docs_per_source_cap"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_kept"] == min(r["n_docs"], SOURCE_CAP)
        assert 0.0 < r["kept_char_share"] <= 1.0
        # capped sources keep the LONGEST docs, so their char share
        # must be at least their doc-count share
        if r["n_docs"] > r["n_kept"]:
            assert r["kept_char_share"] >= r["n_kept"] / r["n_docs"] - 1e-9


def test_bloom_never_misses_exact_hits(spark, sf_dir):
    """THE Bloom property: false positives allowed, false negatives
    never — every exact n-gram hit must also hit the filter."""
    df = QUERIES["bloom_decontaminate"].fn(spark, sf_dir)
    assert df.filter(F.col("n_bloom_hits") < F.col("n_exact_hits")).count() == 0
    assert df.filter(F.col("n_false_pos") < 0).count() == 0
    # and it must agree with the exact decontamination query on the
    # set of truly-contaminated documents
    exact = QUERIES["decontaminate_overlap"].fn(spark, sf_dir)
    mine = df.filter(F.col("n_exact_hits") > 0).select("doc_id")
    theirs = exact.select("doc_id")
    assert mine.exceptAll(theirs).count() == 0
    assert theirs.exceptAll(mine).count() == 0


def test_whitening_standardizes_each_dimension(spark, sf_dir):
    """After per-dim standardization the corpus-wide mean of every
    dimension is 0 and the variance 1, so mean(wmean) ~ 0 and
    mean(wnorm^2) ~ n_dims."""
    df = QUERIES["embedding_whitening"].fn(spark, sf_dir)
    row = df.agg(
        F.avg("wmean").alias("m"),
        F.avg(F.col("wnorm") * F.col("wnorm")).alias("msq"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    assert abs(row["m"]) < 1e-6
    assert abs(row["msq"] - 64.0) < 0.05
    assert row["n"] > 0


def test_mmr_radii_non_increasing_and_distinct(spark, sf_dir):
    rows = sorted(
        QUERIES["mmr_diverse_select"].fn(spark, sf_dir).collect(),
        key=lambda r: r["rank"],
    )
    assert [r["rank"] for r in rows] == list(range(1, MMR_K + 1))
    ids = [r["vec_id"] for r in rows]
    assert len(set(ids)) == MMR_K
    # greedy farthest-point radii are non-increasing after the seed
    radii = [r["min_dist"] for r in rows[1:]]
    assert all(a >= b - 1e-12 for a, b in zip(radii, radii[1:]))
    assert all(r > 0 for r in radii)
    # tournament pre-filter: seed + pool + one pass per certified miss —
    # strictly fewer corpus jobs than the old K-round shape (8)
    from atlassian_confluence_data_pipeline_spark.plans.curation4 import (
        MMR_STATS,
    )

    assert MMR_STATS["cluster_jobs"] == 2 + MMR_STATS["recollects"]
    assert MMR_STATS["cluster_jobs"] < MMR_K


def test_hard_negatives_cross_label_and_positives_same_label(spark, sf_dir):
    df = QUERIES["hard_negative_mining"].fn(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("label").cast("int").alias("label")
    )
    j = (
        df.join(emb.withColumnRenamed("vec_id", "anchor").withColumnRenamed("label", "l_a"), "anchor")
        .join(emb.withColumnRenamed("vec_id", "pos_id").withColumnRenamed("label", "l_p"), "pos_id")
        .join(emb.withColumnRenamed("vec_id", "neg_id").withColumnRenamed("label", "l_n"), "neg_id")
    )
    assert j.filter(F.col("l_a") != F.col("l_p")).count() == 0
    assert j.filter(F.col("l_a") == F.col("l_n")).count() == 0
    # at most NEG_K negatives per anchor, ranks in {1..NEG_K}
    assert df.filter((F.col("neg_rank") < 1) | (F.col("neg_rank") > 2)).count() == 0
    per_anchor = df.groupBy("anchor").count()
    assert per_anchor.filter(F.col("count") > 2).count() == 0
