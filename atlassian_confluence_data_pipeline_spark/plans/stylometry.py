"""Stylometry & readability wave (37): Flesch reading ease, Burrows'
Delta source-attribution distances, and Yule's K vocabulary richness.

The style layer of text curation: readability gates (too-hard /
too-degenerate text), authorship-style distances between sources (the
classic Burrows' Delta — which corpora 'write alike', a duplication /
provenance signal invisible to near-dup hashing), and the
frequency-spectrum richness index (Yule's K — repetitive template text
scores high). Counting is pure regex/array expressions (no Python);
every cross-row reduction is exact integers or 9-rounded DECIMAL sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.plans.registry import query
from atlassian_confluence_data_pipeline_spark.plans.textops import _words

#: Burrows' Delta marker-word count (the most frequent corpus words)
_DELTA_WORDS = 30


@query(
    "readability_scores",
    oracle=r"""
WITH perdoc AS (
  SELECT source,
         CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
           AS w,
         greatest(CAST(len(regexp_extract_all(text, '[.!?]+'))
                       AS BIGINT), 1) AS s,
         greatest(CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                       AS BIGINT), 1) AS syl
  FROM documents
), scored AS (
  SELECT source, w, s, syl,
         round(206.835 - 1.015 * (CAST(w AS DOUBLE) / s)
               - 84.6 * (CAST(syl AS DOUBLE) / w), 9) AS flesch
  FROM perdoc
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(CAST(sum(CAST(w AS DECIMAL(38,0))) AS DOUBLE)
             / sum(CAST(s AS DECIMAL(38,0))), 6) AS words_per_sentence,
       round(CAST(sum(CAST(syl AS DECIMAL(38,0))) AS DOUBLE)
             / sum(CAST(w AS DECIMAL(38,0))), 6) AS syllables_per_word,
       round(CAST(sum(CAST(flesch AS DECIMAL(28,12))) AS DOUBLE)
             / count(*), 6) AS avg_flesch
FROM scored GROUP BY 1
""",
    tags=("stylometry", "readability", "text"),
)
def readability_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading ease per source: 206.835 - 1.015(words/sentences)
    - 84.6(syllables/words), with sentences from punctuation runs and
    syllables from vowel-group counts (the standard regex
    approximation) — the readability gate a curation pipeline applies
    before/after cleaning, reported with its two driving ratios.

    Scale shape: per-document counting is three regex/array expressions
    (JVM codegen, no Python); the rollup is one hash aggregate with
    exact integer token/sentence/syllable sums and 9-rounded DECIMAL
    flesch sums."""
    docs = load_table(spark, sf_dir, "documents")
    w = F.size(_words(F.col("text"))).cast("bigint")
    s = F.greatest(
        F.size(
            F.regexp_extract_all("text", F.lit(r"[.!?]+"), F.lit(0))
        ).cast("bigint"),
        F.lit(1),
    )
    syl = F.greatest(
        F.size(
            F.regexp_extract_all(
                F.lower(F.col("text")), F.lit(r"[aeiouy]+"), F.lit(0)
            )
        ).cast("bigint"),
        F.lit(1),
    )
    flesch = F.round(
        206.835
        - 1.015 * (w.cast("double") / s)
        - 84.6 * (syl.cast("double") / w),
        9,
    )
    perdoc = docs.select(
        "source",
        w.alias("w"),
        s.alias("s"),
        syl.alias("syl"),
        flesch.alias("flesch"),
    )
    return perdoc.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.round(
            F.sum(F.col("w").cast("decimal(38,0)")).cast("double")
            / F.sum(F.col("s").cast("decimal(38,0)")),
            6,
        ).alias("words_per_sentence"),
        F.round(
            F.sum(F.col("syl").cast("decimal(38,0)")).cast("double")
            / F.sum(F.col("w").cast("decimal(38,0)")),
            6,
        ).alias("syllables_per_word"),
        F.round(
            F.sum(F.col("flesch").cast("decimal(28,12)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("avg_flesch"),
    )


@query(
    "burrows_delta_sources",
    oracle=rf"""
WITH words AS (
  SELECT source, unnest(regexp_split_to_array(trim(text), '\s+')) AS word
  FROM documents
), top AS (
  SELECT word FROM (
    SELECT word, count(*) AS c FROM words GROUP BY 1
    ORDER BY c DESC, word LIMIT {_DELTA_WORDS}
  )
), srctot AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n FROM words GROUP BY 1
), freq AS (
  SELECT srctot.source, top.word,
         CAST(coalesce(cnt.c, 0) AS DOUBLE) / srctot.n AS f
  FROM srctot CROSS JOIN top
  LEFT JOIN (
    SELECT source, word, CAST(count(*) AS BIGINT) AS c
    FROM words GROUP BY 1, 2
  ) cnt ON cnt.source = srctot.source AND cnt.word = top.word
), mom AS (
  SELECT word, CAST(count(*) AS DOUBLE) AS g,
         CAST(sum(CAST(round(f, 9) AS DECIMAL(28,12))) AS DOUBLE) AS s1,
         CAST(sum(CAST(round(f * f, 9) AS DECIMAL(28,12))) AS DOUBLE) AS s2
  FROM freq GROUP BY 1
), z AS (
  SELECT freq.source, freq.word,
         CASE WHEN (s2 - s1 * s1 / g) <= 0 THEN 0.0
              ELSE round((f - s1 / g) / sqrt((s2 - s1 * s1 / g) / g), 9)
         END AS z
  FROM freq JOIN mom USING (word)
)
SELECT a.source AS source_a, b.source AS source_b,
       round(CAST(sum(CAST(round(abs(a.z - b.z), 9) AS DECIMAL(28,12)))
                  AS DOUBLE) / {_DELTA_WORDS}, 6) AS delta
FROM z a JOIN z b ON a.word = b.word AND a.source < b.source
GROUP BY 1, 2
""",
    tags=("stylometry", "attribution", "text"),
)
def burrows_delta_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burrows' Delta between every pair of sources: z-score the
    relative frequencies of the {_DELTA_WORDS} most frequent corpus
    words across sources, then Delta(a,b) = mean |z_a - z_b| — the
    classic stylometric distance (low Delta = the sources 'write
    alike': shared boilerplate, shared provenance, or template
    duplication that near-dup hashing can't see because no two
    documents match).

    Scale shape: the corpus-sized work is ONE (source, word) count
    aggregate; the marker list is a {_DELTA_WORDS}-row TakeOrdered;
    everything after runs on the |sources| x {_DELTA_WORDS} bounded
    frequency grid (moments, z-scores, and the pairwise rollup) with
    9-rounded DECIMAL sums."""
    from atlassian_confluence_data_pipeline_spark.plans._cache import (
        doc_word_positions,
    )

    # session-staged token stream (round 11) — replaces both the
    # per-build regex explode AND the per-build localCheckpoint
    words = doc_word_positions(spark, sf_dir).select("source", "word")
    top = (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), "word")
        .limit(_DELTA_WORDS)
        .select("word")
    )
    srctot = words.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    cnt = words.join(F.broadcast(top), "word").groupBy(
        "source", "word"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    freq = (
        srctot.crossJoin(F.broadcast(top))
        .join(cnt, ["source", "word"], "left")
        .select(
            "source",
            "word",
            (
                F.coalesce(F.col("c"), F.lit(0)).cast("double")
                / F.col("n")
            ).alias("f"),
        )
        .localCheckpoint(eager=True)
    )
    mom = freq.groupBy("word").agg(
        F.count(F.lit(1)).cast("double").alias("g"),
        F.sum(F.round(F.col("f"), 9).cast("decimal(28,12)"))
        .cast("double")
        .alias("s1"),
        F.sum(F.round(F.col("f") * F.col("f"), 9).cast("decimal(28,12)"))
        .cast("double")
        .alias("s2"),
    )
    var = F.col("s2") - F.col("s1") * F.col("s1") / F.col("g")
    z = freq.join(F.broadcast(mom), "word").select(
        "source",
        "word",
        F.when(var <= 0, F.lit(0.0))
        .otherwise(
            F.round(
                (F.col("f") - F.col("s1") / F.col("g"))
                / F.sqrt(var / F.col("g")),
                9,
            )
        )
        .alias("z"),
    )
    a = z.select(
        F.col("source").alias("source_a"),
        "word",
        F.col("z").alias("za"),
    )
    b = z.select(
        F.col("source").alias("source_b"),
        "word",
        F.col("z").alias("zb"),
    )
    return (
        a.join(F.broadcast(b), "word")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(
            F.round(
                F.sum(
                    F.round(F.abs(F.col("za") - F.col("zb")), 9).cast(
                        "decimal(28,12)"
                    )
                ).cast("double")
                / _DELTA_WORDS,
                6,
            ).alias("delta")
        )
    )


@query(
    "yule_k_by_source",
    oracle=r"""
WITH words AS (
  SELECT source, unnest(regexp_split_to_array(trim(text), '\s+')) AS word
  FROM documents
), wc AS (
  SELECT source, word, CAST(count(*) AS BIGINT) AS m
  FROM words GROUP BY 1, 2
), acc AS (
  SELECT source,
         CAST(sum(m) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS n_types,
         CAST(sum(CAST(m * m AS DECIMAL(38,0))) AS DOUBLE) AS sm2
  FROM wc GROUP BY 1
)
SELECT source, n_tokens, n_types,
       round(10000 * (sm2 - n_tokens)
             / (CAST(n_tokens AS DOUBLE) * n_tokens), 4) AS yule_k
FROM acc
""",
    tags=("stylometry", "richness", "text"),
)
def yule_k_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yule's K vocabulary-richness index per source:
    K = 10^4 (sum m_w^2 - N) / N^2 over the word-frequency spectrum —
    high K = repetitive vocabulary (template/boilerplate text), low K =
    rich vocabulary; unlike type-token ratio it is (asymptotically)
    length-invariant, so sources of different sizes compare fairly.

    Scale shape: one (source, word) count aggregate, one source-domain
    rollup with exact integer spectrum moments (m² summed in
    DECIMAL(38,0)), closed-form finish."""
    from atlassian_confluence_data_pipeline_spark.plans._cache import (
        doc_word_positions,
    )

    # session-staged token stream (round 11)
    wc = (
        doc_word_positions(spark, sf_dir)
        .select("source", "word")
        .groupBy("source", "word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    )
    acc = wc.groupBy("source").agg(
        F.sum("m").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        F.sum((F.col("m") * F.col("m")).cast("decimal(38,0)"))
        .cast("double")
        .alias("sm2"),
    )
    return acc.select(
        "source",
        "n_tokens",
        "n_types",
        F.round(
            10000
            * (F.col("sm2") - F.col("n_tokens"))
            / (F.col("n_tokens").cast("double") * F.col("n_tokens")),
            4,
        ).alias("yule_k"),
    )
