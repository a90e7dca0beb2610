"""LSH semantics on planted near-duplicates: MinHash banding must
recall pairs with high Jaccard; SimHash must pair shuffled/perturbed
docs and keep unrelated docs apart; the exact verifier must agree with
a brute-force Jaccard computation."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.operators.lsh import (
    minhash_lsh_candidates,
    simhash,
    simhash_near_pairs,
    verify_candidates_jaccard,
)
from atlassian_confluence_data_pipeline_spark.plans.textops import _shingles, _words


def _corpus(spark):
    """10 random docs + 3 planted near-dup pairs (small perturbations)."""
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(300)]
    docs = []
    for i in range(10):
        docs.append((i, " ".join(rng.choice(vocab) for _ in range(80))))
    # planted pairs: copy with a few token edits -> very high jaccard
    for j, base_id in enumerate([0, 3, 7]):
        words = docs[base_id][1].split()
        words[5] = "edited"
        words[40] = "tokens"
        docs.append((100 + j, " ".join(words)))
    return spark.createDataFrame(docs, ["doc_id", "text"])


PLANTED = {(0, 100), (3, 101), (7, 102)}


def test_minhash_lsh_recalls_planted_pairs(spark):
    docs = _corpus(spark)
    sh = docs.select("doc_id", _shingles(_words(F.col("text"))).alias("sh")).persist()
    cand = minhash_lsh_candidates(sh, "doc_id", "sh")
    verified = verify_candidates_jaccard(cand, sh, "doc_id", "sh", threshold=0.5)
    got = {(r["id_a"], r["id_b"]) for r in verified.collect()}
    assert PLANTED <= got
    # verifier agrees with brute-force jaccard on a planted pair
    row = verified.filter((F.col("id_a") == 0) & (F.col("id_b") == 100)).collect()[0]
    a = set(sh.filter(F.col("doc_id") == 0).collect()[0]["sh"])
    b = set(sh.filter(F.col("doc_id") == 100).collect()[0]["sh"])
    assert abs(row["jaccard"] - len(a & b) / len(a | b)) < 1e-12


def test_minhash_no_false_high_jaccard(spark):
    """Random docs (jaccard ~0) must not survive a 0.5-threshold verify."""
    docs = _corpus(spark)
    sh = docs.select("doc_id", _shingles(_words(F.col("text"))).alias("sh")).persist()
    verified = verify_candidates_jaccard(
        minhash_lsh_candidates(sh, "doc_id", "sh"), sh, "doc_id", "sh", 0.5
    )
    got = {(r["id_a"], r["id_b"]) for r in verified.collect()}
    assert got == PLANTED


def test_simhash_pairs_planted(spark):
    docs = _corpus(spark)
    toks = docs.select("doc_id", _words(F.col("text")).alias("toks"))
    fp = simhash(toks, "doc_id", "toks")
    assert fp.count() == 13
    pairs = simhash_near_pairs(fp, "doc_id", max_hamming=16)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert PLANTED <= got
    # unrelated random docs should sit far apart in hamming space
    unrelated = {(a, b) for a, b in got if (a, b) not in PLANTED and a < 10 and b < 10}
    assert len(unrelated) <= 2  # allow rare chance collisions, not wholesale


def test_srp_fingerprint_recalls_planted_vector_pair(spark):
    """Near-identical vectors differ in few fingerprint bits, so the
    chunk-banded candidate join must surface them; an orthogonal vector
    must not pair with either at a high cosine."""
    import random

    from pyspark.sql import functions as F

    from atlassian_confluence_data_pipeline_spark.operators.lsh import (
        simhash_near_pairs,
        with_srp_fingerprint,
    )
    from atlassian_confluence_data_pipeline_spark.operators.similarity import (
        cosine_similarity,
    )

    rng = random.Random(7)
    base = [rng.uniform(-1, 1) for _ in range(64)]
    near = [x + rng.uniform(-0.01, 0.01) for x in base]
    rows = [(1, base), (2, near)] + [
        (i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(3, 13)
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    fps = with_srp_fingerprint(df, "embedding").select("vec_id", "simhash")
    cand = simhash_near_pairs(fps, "vec_id", max_hamming=10, chunks=8)
    va = df.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    vb = df.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    verified = (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cos", cosine_similarity(F.col("va"), F.col("vb")))
        .filter(F.col("cos") >= 0.9)
    )
    got = {(r.id_a, r.id_b) for r in verified.collect()}
    assert got == {(1, 2)}


def test_srp_arrow_variant_matches_portable_fold(spark, sf_dir):
    """The production numpy-matmul SRP path must produce the same
    fingerprints as the oracle-portable HOF fold on the fixture corpus
    (they can differ only when a running dot sits within float
    round-off of zero — absent from the fixture by measure)."""
    from atlassian_confluence_data_pipeline_spark.catalog import load_table
    from atlassian_confluence_data_pipeline_spark.operators.lsh import (
        with_srp_fingerprint,
        with_srp_fingerprint_arrow,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    fold = {
        r["vec_id"]: r["simhash"]
        for r in with_srp_fingerprint(emb, "embedding").select("vec_id", "simhash").collect()
    }
    arrow = {
        r["vec_id"]: r["simhash"]
        for r in with_srp_fingerprint_arrow(emb, "embedding").select("vec_id", "simhash").collect()
    }
    assert fold == arrow
