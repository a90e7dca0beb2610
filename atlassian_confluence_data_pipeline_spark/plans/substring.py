"""Exact-substring dedup (suffix-array family, X1/X2).

The one standard LLM-dedup granularity the hash/shingle/span queries
don't answer: VERBATIM cross-document token overlaps of at least K
tokens, reported as MAXIMAL runs (the deduplicate-text-datasets /
"Deduplicating Training Data Makes Language Models Better" semantics,
re-expressed for a shuffle engine). A true distributed suffix array is
pointless on Spark — the equivalent result comes from fixed-K rolling
window hashes + island detection:

1. per-word rolling hashes (ONE char fold per word, the
   ``minhash_doc_hashes`` idiom) combined into POSITIONAL K-token
   window hashes (``shingle_hashes_from_word_hashes`` with
   ``distinct=False``);
2. a doc-frequency gate keeps window hashes shared by >= 2 documents
   (the join driver) and drops hashes in more than ``MAX_WINDOW_DF``
   documents — the boilerplate guard that keeps bucket joins linear at
   corpus scale (a license header shared by millions of pages would
   otherwise explode the pair count quadratically);
3. an equi-join on the window hash yields matching positions; runs of
   consecutive windows on one (doc_a, doc_b) DIAGONAL (pos_b - pos_a
   constant) are merged to maximal overlaps with the gaps-and-islands
   anchor (``pos_a - row_number()``) — a window partitioned by pair +
   diagonal, never by the corpus.

A K-token window match at consecutive positions p..p+n-1 is exactly a
verbatim (n + K - 1)-token overlap, so ``len_tokens`` is the true
maximal run length. 64-bit-ish hash collisions (the fold is mod 2^31)
are reproduced identically by the oracle; at 100 TB the fold widens to
128 bits and the semantics are unchanged.

Scale shape: windows are linear in corpus tokens; the DF gate is one
hash aggregate; candidate pairs are linear in truly-shared windows
(bounded by MAX_WINDOW_DF^2 per hash); the island window sees one
pair-diagonal at a time. SCALING.md carries the x8 row.

Reference analog: none (the reference has no dedup surface) — this is
part of the LLM-pipeline extension mandate (SURVEY §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.functions.text import (
    ROLLING_MOD,
    rolling_hash,
)
from atlassian_confluence_data_pipeline_spark.operators.lsh import (
    BAND_BASE,
    shingle_hashes_from_word_hashes,
)
from atlassian_confluence_data_pipeline_spark.plans.multimodal import _rh_sql
from atlassian_confluence_data_pipeline_spark.plans.registry import query
from atlassian_confluence_data_pipeline_spark.plans.textops import _words

#: minimum verbatim overlap, in tokens — the window width. 12 sits in
#: the published 10-50 range (WebText dedup used 13-gram windows) and
#: the fixtures carry planted 23-93 token runs well above it.
MIN_OVERLAP_TOKENS = 12

#: boilerplate guard: window hashes appearing in more documents than
#: this are dropped before the pair join (at sf0.01/sf0.1 the fixture
#: max doc-frequency is 3, so the gate is semantics-neutral here; at
#: corpus scale it bounds every hash bucket's pair fan-out)
MAX_WINDOW_DF = 32


def _substring_oracle() -> str:
    k = MIN_OVERLAP_TOKENS
    comb = "wh[i]"
    for j in range(1, k):
        comb = f"(({comb}) * {BAND_BASE} + wh[i+{j}]) % {ROLLING_MOD}"
    return f"""
WITH w AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents
), wht AS (
  SELECT doc_id, list_transform(w, t -> {_rh_sql('t')}) AS wh FROM w
), sp AS (
  SELECT doc_id, wh,
         unnest(range(1, greatest(len(wh) - {k - 2}, 1))) AS i
  FROM wht
), win AS (
  SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, {comb} AS h FROM sp
), hd AS (
  SELECT h FROM win GROUP BY h
  HAVING count(DISTINCT doc_id) BETWEEN 2 AND {MAX_WINDOW_DF}
), m AS (
  SELECT win.* FROM win JOIN hd USING (h)
), p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pos_a, b.pos AS pos_b
  FROM m a JOIN m b ON a.h = b.h AND a.doc_id < b.doc_id
), isl AS (
  SELECT doc_a, doc_b, pos_b - pos_a AS diag, pos_a, pos_b,
         pos_a - row_number() OVER (
           PARTITION BY doc_a, doc_b, pos_b - pos_a ORDER BY pos_a
         ) AS island
  FROM p
)
SELECT doc_a, doc_b,
       CAST(min(pos_a) AS BIGINT) AS start_a,
       CAST(min(pos_b) AS BIGINT) AS start_b,
       CAST(count(*) + {k - 1} AS BIGINT) AS len_tokens
FROM isl GROUP BY doc_a, doc_b, diag, island
"""


@query(
    "exact_substring_overlaps",
    oracle=_substring_oracle(),
    tags=("curation", "dedup", "text", "substring"),
)
def exact_substring_overlaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal verbatim cross-document token overlaps of >=
    MIN_OVERLAP_TOKENS tokens — exact-substring dedup via positional
    K-window rolling hashes + diagonal island merge (module docstring).
    Output: one row per maximal run, ``(doc_a, doc_b, start_a, start_b,
    len_tokens)`` with 0-based token offsets."""
    k = MIN_OVERLAP_TOKENS
    docs = load_table(spark, sf_dir, "documents")
    wh = docs.select(
        "doc_id",
        F.transform(_words(F.col("text")), rolling_hash).alias("wh"),
    )
    win = wh.select(
        "doc_id",
        F.posexplode(
            shingle_hashes_from_word_hashes(F.col("wh"), n=k, distinct=False)
        ).alias("pos", "h"),
    ).select("doc_id", F.col("pos").cast("bigint").alias("pos"), "h")
    # DF gate: one hash aggregate; >= 2 drives the join, <= MAX_WINDOW_DF
    # bounds per-bucket pair fan-out (boilerplate guard)
    hd = (
        win.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter((F.col("nd") >= 2) & (F.col("nd") <= MAX_WINDOW_DF))
        .select("h")
    )
    m = win.join(hd, "h")
    a = m.select(
        "h", F.col("doc_id").alias("doc_a"), F.col("pos").alias("pos_a")
    )
    b = m.select(
        "h", F.col("doc_id").alias("doc_b"), F.col("pos").alias("pos_b")
    )
    pairs = (
        a.join(b, "h")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "pos_a", "pos_b")
    )
    diag = (F.col("pos_b") - F.col("pos_a")).alias("diag")
    w = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pos_a")
    isl = pairs.select(
        "doc_a", "doc_b", "pos_a", diag
    ).withColumn("island", F.col("pos_a") - F.row_number().over(w))
    return isl.groupBy("doc_a", "doc_b", "diag", "island").agg(
        F.min("pos_a").cast("bigint").alias("start_a"),
        (F.min("pos_a") + F.col("diag")).cast("bigint").alias("start_b"),
        (F.count(F.lit(1)) + F.lit(k - 1)).cast("bigint").alias("len_tokens"),
    ).select("doc_a", "doc_b", "start_a", "start_b", "len_tokens")
