"""Audio feature extraction and near-dup dedup (the audio modality of
X2/X5).

Completes the modality matrix: text dedup (MinHash/SimHash,
plans/multimodal.py), image dedup (perceptual dHash,
plans/multimodal2.py), and now audio — a real RIFF/WAVE codec
(functions/audio.py), exact integer feature folds, and a 65-window
energy-envelope fingerprint banded through the SAME Hamming
chunk-pigeonhole join (operators/lsh.py simhash_near_pairs) the
SimHash and dHash paths use: an equi-join on 16-bit fingerprint
chunks, never an all-pairs comparison.

Hash-checked END TO END: the near-dup WAV fixtures are pure integer
functions of doc_id (sources/binary.py audio_attachments_from_documents
— envelope-on-carrier synthesis), so DuckDB re-derives every decoded
sample's deviation, every window energy, every fingerprint bit, and
every banded pair symbolically. A byte off in the RIFF header layout,
the PCM parse, or the window index math breaks the value hash.

Reference analog: attachment byte handling
(api_client/confluence_client.py:601-633) generalized to the audio
dedup/feature operators a training-data pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.functions.audio import FP_WINDOWS
from atlassian_confluence_data_pipeline_spark.operators.lsh import simhash_near_pairs
from atlassian_confluence_data_pipeline_spark.plans.registry import query
from atlassian_confluence_data_pipeline_spark.sources.binary import (
    audio_attachments_from_documents,
    extract_audio_features,
)

#: Hamming radius for "near-duplicate track". The planted within-group
#: loudness edits measure median 5 / p90 8 bits apart, cross-group p01
#: is 21 (2000-doc study, sources/binary.py docstring); 14 keeps ~all
#: planted pairs at ~2.0x-corpus candidate volume (max bucket 9).
AFP_MAX_HAMMING = 14
AFP_CHUNKS = 4

#: the fixture's sample-count rule: 256 + (doc_id % 16) * 16
_N_SQL = "(256 + (doc_id % 16) * 16)"

#: per-sample envelope amplitude at sample index ``t`` (carrier-free:
#: dev(t) = +-amp(t), so dev^2 = amp^2 and |dev| = amp — the oracle
#: never needs the sign)
_AMP_SQL = (
    "((((gg % 37) * ww * ww + ((gg * 5) % 31) * ww + 2 * gg) % 73) + 8"
    " + CASE WHEN ww >= 16 * vv AND ww < 16 * vv + 6 THEN 40 ELSE 0 END)"
)

def _features_oracle() -> str:
    return f"""
WITH dims AS (
  SELECT doc_id, {_N_SQL} AS n, doc_id // 4 AS gg, doc_id % 4 AS vv
  FROM documents
), s AS (
  SELECT doc_id, n, gg, vv, unnest(range(0, n)) AS t FROM dims
), a AS (
  SELECT doc_id, n, {_AMP_SQL} AS amp
  FROM (SELECT s.*, (t * {FP_WINDOWS}) // n AS ww FROM s)
)
SELECT doc_id, 8000 AS sample_rate, CAST(max(n) AS INT) AS n_samples,
       CAST(max(amp) AS INT) AS peak_dev,
       CAST(sum(amp * amp) AS BIGINT) AS energy,
       CAST(sum(CASE WHEN amp >= 64 THEN 1 ELSE 0 END) AS INT) AS n_loud
FROM a GROUP BY doc_id
"""


def _afp_cte() -> str:
    """CTE chain ``... -> fp`` producing (doc_id, afp): per-window
    exact energies via one GROUP BY, then 64 adjacent-compare bits
    packed with the bit-63 negative two's-complement literal (DuckDB's
    checked shift rejects 1 << 63 — same trick as the dHash oracle)."""
    return f"""
dims AS (
  SELECT doc_id, {_N_SQL} AS n, doc_id // 4 AS gg, doc_id % 4 AS vv
  FROM documents
), s AS (
  SELECT doc_id, n, gg, vv, unnest(range(0, n)) AS t FROM dims
), a AS (
  SELECT doc_id, ww, {_AMP_SQL} AS amp
  FROM (SELECT s.*, (t * {FP_WINDOWS}) // n AS ww FROM s)
), win AS (
  SELECT doc_id, ww, sum(amp * amp) AS e FROM a GROUP BY doc_id, ww
), earr AS (
  SELECT doc_id, list(e ORDER BY ww) AS e_arr FROM win GROUP BY doc_id
), fp AS (
  SELECT doc_id,
         CAST(list_sum(list_transform(range(0, {FP_WINDOWS - 1}), i ->
           CASE WHEN e_arr[i + 2] > e_arr[i + 1]
                THEN CASE WHEN i = 63
                          THEN CAST(-9223372036854775808 AS BIGINT)
                          ELSE (CAST(1 AS BIGINT) << CAST(i AS INT)) END
                ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS afp
  FROM earr
)"""


def _afp_oracle() -> str:
    return f"WITH {_afp_cte()}\nSELECT doc_id, afp FROM fp"


def _audio_neardup_oracle() -> str:
    width = 64 // AFP_CHUNKS
    mask = (1 << width) - 1
    chunk_eq = " OR ".join(
        f"((a.afp >> {i * width}) & {mask}) = ((b.afp >> {i * width}) & {mask})"
        for i in range(AFP_CHUNKS)
    )
    return f"""
WITH {_afp_cte()}
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.afp, b.afp)) AS INT) AS hamming
FROM fp a JOIN fp b
  ON a.doc_id < b.doc_id AND ({chunk_eq})
WHERE bit_count(xor(a.afp, b.afp)) <= {AFP_MAX_HAMMING}
"""


@query(
    "audio_feature_stats",
    oracle=_features_oracle(),
    tags=("multimodal", "audio", "features"),
)
def audio_feature_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 audio feature extraction, hash-checked end to end: workers
    synthesize the WAV fixtures, the real RIFF parser decodes them
    back, and the exact integer folds (peak deviation, energy, loud-
    sample count) must equal what DuckDB derives symbolically from the
    doc_id arithmetic. One mapInPandas pass; the PCM track never
    leaves the Arrow batch."""
    docs = load_table(spark, sf_dir, "documents")
    feats = extract_audio_features(audio_attachments_from_documents(docs))
    return feats.select(
        F.col("owner_id").alias("doc_id"),
        "sample_rate",
        "n_samples",
        "peak_dev",
        "energy",
        "n_loud",
    )


@query(
    "audio_fingerprints",
    oracle=_afp_oracle(),
    tags=("multimodal", "audio", "dedup", "fingerprint"),
)
def audio_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Energy-envelope fingerprint per track (functions/audio.py
    energy_fingerprint64): decode + 65-window exact-energy fold + 64
    adjacent-compare bits, reproduced bit-for-bit by the DuckDB
    oracle's symbolic window algebra. Since round 9 the pass is the
    session+disk-shared ``_cache.py`` stage (warm sessions read the
    persisted fingerprint table)."""
    from atlassian_confluence_data_pipeline_spark.plans._cache import (
        audio_fp64,
    )

    return audio_fp64(spark, sf_dir)


@query(
    "audio_near_dup_pairs",
    oracle=_audio_neardup_oracle(),
    tags=("multimodal", "audio", "dedup", "neardup", "lsh"),
)
def audio_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-dup X2/X5: energy-envelope fingerprints (real WAV
    decode, see audio_fingerprints) -> the SAME Hamming chunk-
    pigeonhole banding as the SimHash text path and the dHash image
    path (operators/lsh.py simhash_near_pairs: equi-join on 16-bit
    chunk values, exact popcount filter <= 14, distinct) — candidate
    volume is linear in the corpus (measured ~2.0x rows at 2000 docs,
    max bucket 9), and the 100 TB shape is the banded equi-join, never
    all-pairs. The oracle reproduces synthesis, decode, window
    energies, bit pack, chunk join, and threshold bit-for-bit."""
    from atlassian_confluence_data_pipeline_spark.plans._cache import (
        audio_fp64,
    )

    fp = audio_fp64(spark, sf_dir).select(
        "doc_id", F.col("afp").alias("simhash")
    )
    return simhash_near_pairs(
        fp, "doc_id", max_hamming=AFP_MAX_HAMMING, chunks=AFP_CHUNKS
    )


def _afp_fidelity_oracle() -> str:
    """All banded candidates (no Hamming threshold) joined to the
    symbolic window-energy envelopes; per-Hamming exact envelope-L1
    totals."""
    width = 64 // AFP_CHUNKS
    mask = (1 << width) - 1
    chunk_eq = " OR ".join(
        f"((a.afp >> {i * width}) & {mask}) = ((b.afp >> {i * width}) & {mask})"
        for i in range(AFP_CHUNKS)
    )
    return f"""
WITH {_afp_cte()}, cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         bit_count(xor(a.afp, b.afp)) AS hamming
  FROM fp a JOIN fp b ON a.doc_id < b.doc_id AND ({chunk_eq})
), l1t AS (
  SELECT c.hamming,
         list_sum(list_transform(range(1, {FP_WINDOWS + 1}),
           i -> abs(ea.e_arr[i] - eb.e_arr[i]))) AS l1
  FROM cand c
  JOIN earr ea ON ea.doc_id = c.id_a
  JOIN earr eb ON eb.doc_id = c.id_b
)
SELECT CAST(hamming AS INT) AS hamming,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(l1) AS BIGINT) AS total_l1
FROM l1t GROUP BY 1
"""


@query(
    "afp_hamming_fidelity",
    oracle=_afp_fidelity_oracle(),
    tags=("multimodal", "audio", "dedup", "calibration"),
)
def afp_hamming_fidelity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-fingerprint FIDELITY calibration — the audio leg of
    dhash_hamming_fidelity: per banded candidate pair (NO threshold),
    the exact window-energy-envelope L1 distance folded JVM-side and
    rolled up per Hamming distance. Monotone growth is the evidence
    the 64 adjacent-compare bits order tracks the way the true
    envelope distance does. Candidates are the banded equi-join;
    envelopes join by id, decoded once."""
    from atlassian_confluence_data_pipeline_spark.operators.lsh import (
        simhash_near_pairs,
    )

    # both legs are session+disk-shared _cache.py stages (round 9):
    # fingerprints and envelopes each materialize once per fixture
    # fingerprint; warm sessions skip the synth + decode entirely
    from atlassian_confluence_data_pipeline_spark.plans._cache import (
        audio_envelopes,
        audio_fp64,
    )

    fp = audio_fp64(spark, sf_dir).select(
        "doc_id", F.col("afp").alias("simhash")
    )
    cand = simhash_near_pairs(fp, "doc_id", max_hamming=63, chunks=AFP_CHUNKS)
    env = audio_envelopes(spark, sf_dir)
    ea = env.select(F.col("doc_id").alias("id_a"), F.col("env").alias("ea"))
    eb = env.select(F.col("doc_id").alias("id_b"), F.col("env").alias("eb"))
    l1 = F.aggregate(
        F.zip_with("ea", "eb", lambda a, b: F.abs(a - b)),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    return (
        cand.join(ea, "id_a")
        .join(eb, "id_b")
        .select("hamming", l1.alias("l1"))
        .groupBy("hamming")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum("l1").cast("bigint").alias("total_l1"),
        )
    )
