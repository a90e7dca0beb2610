"""Image near-dup dedup (the perceptual-hash modality of X2/X5).

The text dedup family (MinHash/SimHash, plans/multimodal.py) gets its
image sibling here: perceptual difference-hash (dHash) fingerprints
computed from REAL decoded rasters (the pure-numpy BMP/PPM/PNG codecs,
functions/imaging.py), then the same Hamming chunk-pigeonhole banding
the SimHash path uses (operators/lsh.py simhash_near_pairs) — an
equi-join on 16-bit fingerprint chunks, never an all-pairs comparison.

Hash-checked END TO END: the textured near-dup fixtures are pure
integer functions of doc_id (sources/binary.py), so DuckDB re-derives
every gray value, every dHash bit, and every banded pair symbolically —
a byte-level bug in any of the three codecs, the nearest-neighbor
resample, the gray fold, or the bit packing breaks the value hash.

Reference analog: attachment byte handling
(api_client/confluence_client.py:601-633) generalized to the
perceptual-dedup operator a training-data pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.operators.lsh import simhash_near_pairs
from atlassian_confluence_data_pipeline_spark.plans.registry import query

#: Hamming radius for "near-duplicate image". The planted within-group
#: edits in the textured fixtures measure ~12-17 bits apart; 16 keeps
#: most planted pairs while cross-group chunk collisions stay rare
#: (measured: 539 pairs over 500 docs, 5649 over 5000 — linear).
DHASH_MAX_HAMMING = 16
DHASH_CHUNKS = 4


def _gray_sql(xe: str, ye: str) -> str:
    """DuckDB rendering of one resized-gray sample of the textured
    fixture: the 16x16 quadratic texture + variant row-band inversion
    (sources/binary.py textured_image_attachments_from_documents),
    sampled at original coords (``xe``, ``ye``), channel-averaged the
    way functions/imaging.py dhash64 does ((r+g+b)//3)."""
    base = (
        f"(gg % 97) * {xe} * {xe} + ((gg * 3) % 89) * {ye} * {ye}"
        f" + ((gg * 7) % 83) * {xe} * {ye} + gg"
        f" + 128 * (CASE WHEN {ye} >= 4 * vv AND {ye} < 4 * vv + 4"
        f" THEN 1 ELSE 0 END)"
    )
    terms = " + ".join(f"(({base} + {101 * c}) % 256)" for c in range(3))
    return f"(({terms}) // 3)"


def _dhash_fp_cte() -> str:
    """CTE chain ``dims -> gm -> fp`` producing (doc_id, dhash):
    the 9x8 nearest-neighbor resample is index math ((x*16)//9,
    (y*16)//8 = 2*y), the 64 bits are adjacent-column gray compares,
    bit 63 packs as the negative two's-complement literal (DuckDB's
    checked shift rejects 1 << 63)."""
    gray = _gray_sql("((x * 16) // 9)", "(2 * y)")
    return f"""
dims AS (
  SELECT doc_id, doc_id // 4 AS gg, doc_id % 4 AS vv FROM documents
), gm AS (
  SELECT doc_id,
         list_transform(range(0, 8), y ->
           list_transform(range(0, 9), x -> {gray})) AS gm
  FROM dims
), fp AS (
  SELECT doc_id,
         CAST(list_sum(list_transform(range(0, 64), i ->
           CASE WHEN gm[i // 8 + 1][i % 8 + 1] > gm[i // 8 + 1][i % 8 + 2]
                THEN CASE WHEN i = 63
                          THEN CAST(-9223372036854775808 AS BIGINT)
                          ELSE (CAST(1 AS BIGINT) << CAST(i AS INT)) END
                ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS dhash
  FROM gm
)"""


def _dhash_oracle() -> str:
    return f"WITH {_dhash_fp_cte()}\nSELECT doc_id, dhash FROM fp"


def _image_neardup_oracle() -> str:
    width = 64 // DHASH_CHUNKS
    mask = (1 << width) - 1
    chunk_eq = " OR ".join(
        f"((a.dhash >> {i * width}) & {mask}) = ((b.dhash >> {i * width}) & {mask})"
        for i in range(DHASH_CHUNKS)
    )
    return f"""
WITH {_dhash_fp_cte()}
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.dhash, b.dhash)) AS INT) AS hamming
FROM fp a JOIN fp b
  ON a.doc_id < b.doc_id AND ({chunk_eq})
WHERE bit_count(xor(a.dhash, b.dhash)) <= {DHASH_MAX_HAMMING}
"""


@query(
    "image_dhash_fingerprints",
    oracle=_dhash_oracle(),
    tags=("multimodal", "image", "dedup", "fingerprint"),
)
def image_dhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual dHash per image, hash-checked end to end: workers
    encode the textured fixtures (BMP/PPM/PNG cycling doc_id % 3), the
    pure-numpy decoders decode them back, dhash64 resamples to 9x8 and
    packs 64 adjacent-gray-compare bits — and the value must equal what
    DuckDB derives symbolically from the doc_id arithmetic. One
    mapInPandas pass; the raster never leaves the Arrow batch. Since
    round 9 the pass is the session+disk-shared ``_cache.py`` stage
    (warm sessions read the persisted fingerprint table)."""
    from atlassian_confluence_data_pipeline_spark.plans._cache import (
        image_dhash_fp,
    )

    return image_dhash_fp(spark, sf_dir)


@query(
    "image_near_dup_pairs",
    oracle=_image_neardup_oracle(),
    tags=("multimodal", "image", "dedup", "neardup", "lsh"),
)
def image_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup X2/X5: dHash fingerprints (real decode, see
    image_dhash_fingerprints) -> the SAME Hamming chunk-pigeonhole
    banding as the SimHash text path (operators/lsh.py
    simhash_near_pairs: equi-join on 16-bit chunk values, exact
    popcount filter <= 16, distinct) — candidate volume is linear in
    the corpus (measured ~2.2x rows at 5000 docs, max bucket 13), and
    the 100 TB shape is the banded equi-join, never all-pairs. The
    oracle reproduces fixtures, resample, gray fold, bit pack, chunk
    join, and threshold bit-for-bit."""
    from atlassian_confluence_data_pipeline_spark.plans._cache import (
        image_dhash_fp,
    )

    fp = image_dhash_fp(spark, sf_dir).select(
        "doc_id", F.col("dhash").alias("simhash")
    )
    return simhash_near_pairs(
        fp, "doc_id", max_hamming=DHASH_MAX_HAMMING, chunks=DHASH_CHUNKS
    )


def _fidelity_oracle() -> str:
    """All banded candidates (no Hamming threshold) joined to the
    symbolic 768-cell rasters; per-Hamming exact pixel-L1 totals."""
    base = (
        "(gg % 97) * x * x + ((gg * 3) % 89) * y * y"
        " + ((gg * 7) % 83) * x * y + gg"
        " + 128 * (CASE WHEN y >= 4 * vv AND y < 4 * vv + 4"
        " THEN 1 ELSE 0 END)"
    )
    width = 64 // DHASH_CHUNKS
    mask = (1 << width) - 1
    chunk_eq = " OR ".join(
        f"((a.dhash >> {i * width}) & {mask}) = ((b.dhash >> {i * width}) & {mask})"
        for i in range(DHASH_CHUNKS)
    )
    return f"""
WITH {_dhash_fp_cte()}, px AS (
  SELECT doc_id,
         flatten(flatten(list_transform(range(0, 16), y ->
           list_transform(range(0, 16), x ->
             list_transform(range(0, 3), c -> ({base} + 101 * c) % 256)))))
           AS px
  FROM dims
), cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         bit_count(xor(a.dhash, b.dhash)) AS hamming
  FROM fp a JOIN fp b ON a.doc_id < b.doc_id AND ({chunk_eq})
), l1t AS (
  SELECT c.hamming,
         list_sum(list_transform(range(1, 769),
           i -> abs(pa.px[i] - pb.px[i]))) AS l1
  FROM cand c
  JOIN px pa ON pa.doc_id = c.id_a
  JOIN px pb ON pb.doc_id = c.id_b
)
SELECT CAST(hamming AS INT) AS hamming,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(l1) AS BIGINT) AS total_l1
FROM l1t GROUP BY 1
"""


@query(
    "dhash_hamming_fidelity",
    oracle=_fidelity_oracle(),
    tags=("multimodal", "image", "dedup", "calibration"),
)
def dhash_hamming_fidelity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash FIDELITY calibration — the image analogue of
    minhash_estimate_calibration: for every banded candidate pair (NO
    Hamming threshold, so the full curve is visible), the exact
    raster-L1 distance is folded JVM-side and rolled up per Hamming
    distance. Monotone total_l1/n_pairs growth across hamming buckets
    is the evidence that the 64-bit fingerprint orders pairs the way
    true pixel distance does — the property the dedup threshold relies
    on. Scale shape: candidates are the banded equi-join (~2x corpus);
    the L1 is one zip_with/aggregate fold per candidate, rasters join
    by id (decoded once, never all-pairs)."""
    # both legs are session+disk-shared _cache.py stages (round 9): the
    # dHash fingerprints and the decoded rasters each materialize once
    # per fixture fingerprint, and a fresh session warm-starts from the
    # persisted parquet instead of re-encoding + re-decoding the corpus
    from atlassian_confluence_data_pipeline_spark.plans._cache import (
        image_dhash_fp,
        image_pixel_rasters,
    )

    fp = image_dhash_fp(spark, sf_dir).select(
        "doc_id", F.col("dhash").alias("simhash")
    )
    cand = simhash_near_pairs(fp, "doc_id", max_hamming=63, chunks=DHASH_CHUNKS)
    px = image_pixel_rasters(spark, sf_dir)
    pa = px.select(F.col("doc_id").alias("id_a"), F.col("px").alias("pa"))
    pb = px.select(F.col("doc_id").alias("id_b"), F.col("px").alias("pb"))
    l1 = F.aggregate(
        F.zip_with("pa", "pb", lambda a, b: F.abs(a - b)),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    return (
        cand.join(pa, "id_a")
        .join(pb, "id_b")
        .select("hamming", l1.alias("l1"))
        .groupBy("hamming")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum("l1").cast("bigint").alias("total_l1"),
        )
    )
