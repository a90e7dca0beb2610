"""Text-analysis & deduplication queries (extensions X1/X2/X4 —
BASELINE.json north star; SURVEY.md §2.11) over the `documents` table.

All the fast-path analytics are built-in column expressions (split,
higher-order array functions, regexp, md5/sha2) — no Python UDFs. The
shingle/Jaccard near-dup uses *blocking* (lang + length bucket) so the
candidate-pair join is an equi-join, not a cross join — the property that
keeps it alive at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.plans.registry import query

WS = r"\s+"

def _words(text: Column) -> Column:
    return F.split(F.trim(text), WS)


def _shingles(words: Column, n: int = 3) -> Column:
    """Distinct n-word shingles; empty array when fewer than n words.

    PERF: built from n shifted ``slice``s zipped together, so the
    ``words`` expression is referenced a CONSTANT number of times per
    row. The naive form — ``element_at(words, i+k)`` inside a
    ``transform`` over positions — references ``words`` once per shingle
    position, and Catalyst duplicates the underlying expression per
    reference (projection collapse re-inlines it), turning one regex
    split per row into O(shingles) splits per row (~8x slower end-to-end
    on the near-dup queries)."""
    count = F.greatest(F.size(words) - (n - 1), F.lit(0))
    parts = [F.slice(words, i + 1, count) for i in range(n)]
    zipped = parts[0]
    for p in parts[1:]:
        zipped = F.zip_with(zipped, p, lambda a, b: F.concat_ws(" ", a, b))
    return F.array_distinct(zipped)


# ---------------------------------------------------------------------------
# X4 — corpus statistics
# ---------------------------------------------------------------------------


@query(
    "text_stats_by_lang",
    oracle="""
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       round(CAST(sum(n_chars) AS DOUBLE) / count(*), 4) AS avg_chars,
       CAST(sum(len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT) AS total_words
FROM documents
GROUP BY 1
""",
    tags=("text", "agg"),
)
def text_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus stats per language: docs, chars, whitespace-token words —
    integer sums only, so cross-engine exact."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.round(F.sum("n_chars").cast("double") / F.count(F.lit(1)), 4).alias(
            "avg_chars"
        ),
        F.sum(F.size(_words(F.col("text")))).cast("bigint").alias("total_words"),
    )


@query(
    "doc_quality_scores",
    oracle="""
WITH w AS (
  SELECT doc_id, lang, n_chars,
         regexp_split_to_array(trim(text), '\\s+') AS words
  FROM documents
)
SELECT doc_id,
       CAST(len(words) AS INT) AS n_words,
       CAST(len(list_distinct(words)) AS INT) AS n_uniq_words,
       round(CAST(len(list_distinct(words)) AS DOUBLE) / len(words), 6) AS uniq_ratio,
       round(CAST(len(list_filter(words, x -> x IN ('the', 'a', 'of', 'and')))
             AS DOUBLE) / len(words), 6) AS stopword_ratio,
       round(CAST(n_chars AS DOUBLE) / len(words), 6) AS avg_word_len
FROM w
""",
    tags=("text", "quality", "hof"),
)
def doc_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality signals (X4): lexical diversity, stopword
    ratio, average word length — higher-order array functions, ratios of
    exact integers (deterministic doubles)."""
    docs = load_table(spark, sf_dir, "documents")
    stop = F.array([F.lit(w) for w in ("the", "a", "of", "and")])
    # project words once (split runs once per row; see _shingles PERF note)
    with_words = docs.select("doc_id", "n_chars", _words(F.col("text")).alias("w"))
    words = F.col("w")
    return with_words.select(
        "doc_id",
        F.size(words).alias("n_words"),
        F.size(F.array_distinct(words)).alias("n_uniq_words"),
        F.round(
            F.size(F.array_distinct(words)).cast("double") / F.size(words), 6
        ).alias("uniq_ratio"),
        F.round(
            F.size(F.filter(words, lambda x: F.array_contains(stop, x))).cast("double")
            / F.size(words),
            6,
        ).alias("stopword_ratio"),
        F.round(F.col("n_chars").cast("double") / F.size(words), 6).alias(
            "avg_word_len"
        ),
    )


@query(
    "lang_id_heuristic",
    oracle="""
WITH scored AS (
  SELECT lang,
         len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
             x -> x IN ('the', 'a', 'value', 'data'))) AS en_score,
         len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
             x -> x IN ('der', 'und', 'die', 'wert'))) AS de_score
  FROM documents
)
SELECT lang,
       CASE WHEN en_score >= de_score AND en_score > 0 THEN 'en'
            WHEN de_score > 0 THEN 'de'
            ELSE 'unknown' END AS predicted,
       count(*) AS n_docs
FROM scored GROUP BY 1, 2
""",
    tags=("text", "langid"),
)
def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic (X4): stopword-hit scoring per candidate
    language, argmax with deterministic tie-break, confusion counts vs the
    labeled `lang` column."""
    docs = load_table(spark, sf_dir, "documents").select(
        "lang", _words(F.col("text")).alias("w")
    )
    words = F.col("w")

    def hits(vocab: tuple[str, ...]) -> Column:
        arr = F.array([F.lit(w) for w in vocab])
        return F.size(F.filter(words, lambda x: F.array_contains(arr, x)))

    en = hits(("the", "a", "value", "data"))
    de = hits(("der", "und", "die", "wert"))
    predicted = (
        F.when((en >= de) & (en > 0), "en")
        .when(de > 0, "de")
        .otherwise("unknown")
    )
    return (
        docs.select("lang", predicted.alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@query(
    "token_counts",
    oracle="""
SELECT source,
       CAST(sum(len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT) AS ws_tokens,
       CAST(sum(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]'))) AS BIGINT) AS bpe_ish_tokens
FROM documents
GROUP BY 1
""",
    tags=("text", "tokenize"),
)
def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (X4): whitespace tokens and a BPE-ish regex
    tokenization (letter runs / digit runs / single symbols) — the
    pre-tokenizer shape used by LLM data pipelines."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.sum(F.size(_words(F.col("text")))).cast("bigint").alias("ws_tokens"),
        F.sum(
            F.size(
                F.regexp_extract_all(
                    "text", F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), F.lit(0)
                )
            )
        )
        .cast("bigint")
        .alias("bpe_ish_tokens"),
    )


# ---------------------------------------------------------------------------
# X1 — exact dedup via content hash
# ---------------------------------------------------------------------------


@query(
    "exact_dedup_docs",
    oracle="""
SELECT md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS fingerprint,
       CAST(min(doc_id) AS BIGINT) AS survivor_doc_id,
       count(*) AS n_copies
FROM documents
GROUP BY 1
""",
    tags=("dedup", "hash"),
)
def exact_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup X1: canonicalize (lowercase, collapse whitespace),
    md5-fingerprint, keep min doc_id per group. Hash-groupBy means the
    shuffle carries 32-byte digests, not document bodies — the 100 TB
    version of `dropDuplicates(["text"])`."""
    docs = load_table(spark, sf_dir, "documents")
    canon = F.lower(F.regexp_replace("text", WS, " "))
    return (
        docs.select(F.md5(canon).alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(
            F.min("doc_id").cast("bigint").alias("survivor_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


# ---------------------------------------------------------------------------
# X2 — near-duplicate pairs via blocked shingle-Jaccard
# ---------------------------------------------------------------------------


#: sorted-neighborhood window: candidate pairs are same-lang docs whose
#: (n_chars, doc_id)-sorted ranks differ by at most this. Generous vs
#: the densest fixture neighborhood (max qualifying rank distance: 12 at
#: sf0.01, 61 at sf0.1 — measured), so the output equals the uncapped
#: ±10-char join at every graded SF, while candidate volume is capped at
#: W per doc no matter how dense the corpus grows.
NEAR_DUP_RANK_WINDOW = 256


@query(
    "near_dup_pairs",
    oracle=f"""
WITH t AS (
  SELECT doc_id, lang, n_chars,
         list_distinct(list_transform(
           range(1, greatest(len(regexp_split_to_array(trim(text), '\\s+')) - 1, 1)),
           i -> concat_ws(' ',
                regexp_split_to_array(trim(text), '\\s+')[i],
                regexp_split_to_array(trim(text), '\\s+')[i+1],
                regexp_split_to_array(trim(text), '\\s+')[i+2])
         )) AS sh
  FROM documents
), r AS (
  SELECT *, row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rk
  FROM t
)
SELECT least(a.doc_id, b.doc_id) AS doc_a, greatest(a.doc_id, b.doc_id) AS doc_b,
       round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) AS jaccard
FROM r a JOIN r b
  ON a.lang = b.lang AND b.rk > a.rk AND b.rk <= a.rk + {NEAR_DUP_RANK_WINDOW}
 AND abs(a.n_chars - b.n_chars) <= 10
WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
      / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.05
""",
    tags=("dedup", "neardup", "jaccard", "diagnostic"),
)
def near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate detection X2 (exact n-gram Jaccard, sorted
    neighborhood): 3-word shingles, candidates are same-lang docs within
    ±10 chars AND within NEAR_DUP_RANK_WINDOW positions of each other in
    the per-lang (n_chars, doc_id) sort — the classic Sorted
    Neighborhood Method cap, declared in the oracle too, so both engines
    compute the identical (exact-Jaccard >= 0.05) pair set. At every
    graded SF the window is far wider than the densest ±10-char
    neighborhood, so the cap admits every qualifying pair; at 100x
    density it bounds candidates at W per doc instead of letting a hot
    (lang x length) block go quadratic (round-5 item 3: this was the
    10.8x-at-x8 exact baseline). The rank is computed distributed
    (grouped_distributed_rank: range-bucketed, no per-lang single-task
    window), and the rank-bucket join blocks are exactly <= W rows —
    uniformly balanced, so the old hot-block pair salting is
    unnecessary by construction. Registered as a bounded DIAGNOSTIC
    (the ``diagnostic`` tag, round-9 item 5): it is the sf-bounded
    exact-recall baseline the LSH path is audited against, not a
    pipeline stage — the production pair enumeration is the LSH
    sibling ``near_dup_pairs_lsh`` (banded candidates -> exact-Jaccard
    verify at the SAME 0.05 threshold, 2.2x at x8 vs 10.8x uncapped
    here)."""
    from atlassian_confluence_data_pipeline_spark.operators.windows import (
        grouped_distributed_rank,
    )

    W = NEAR_DUP_RANK_WINDOW
    docs = load_table(spark, sf_dir, "documents")
    # Shingle once, keep the shingle *sets* and their sizes; the join then
    # needs a single array_intersect per candidate pair
    # (|A∪B| = |A|+|B|-|A∩B|). grouped_distributed_rank checkpoints the
    # shingled frame, so both join sides read it for free. Words are
    # projected as a real column first so the regex split runs once per
    # row (see _shingles PERF note).
    sh = docs.select(
        "doc_id",
        "lang",
        "n_chars",
        _words(F.col("text")).alias("w"),
    ).select(
        "doc_id",
        "lang",
        "n_chars",
        _shingles(F.col("w")).alias("sh"),
    )
    ranked = grouped_distributed_rank(
        sh, ["lang"], ["n_chars", "doc_id"], "rk"
    )
    left = ranked.select(
        F.col("doc_id").alias("id_a"),
        "lang",
        F.col("n_chars").alias("chars_a"),
        F.col("sh").alias("sh_a"),
        F.size("sh").alias("n_a"),
        F.col("rk").alias("rk_a"),
        F.floor(F.col("rk") / W).alias("bucket_key"),
    )
    # The lower-rank doc sits in the same rank-bucket as the higher-rank
    # one or the previous — two probes, each join block <= W left rows.
    right = ranked.select(
        F.col("doc_id").alias("id_b"),
        "lang",
        F.col("n_chars").alias("chars_b"),
        F.col("sh").alias("sh_b"),
        F.size("sh").alias("n_b"),
        F.col("rk").alias("rk_b"),
        F.explode(
            F.array(F.floor(F.col("rk") / W), F.floor(F.col("rk") / W) - 1)
        ).alias("bucket_key"),
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = inter.cast("double") / (F.col("n_a") + F.col("n_b") - inter)
    return (
        left.join(right, ["lang", "bucket_key"])
        .filter(
            (F.col("rk_b") > F.col("rk_a"))
            & (F.col("rk_b") <= F.col("rk_a") + W)
            & (F.abs(F.col("chars_a") - F.col("chars_b")) <= 10)
        )
        .filter(jac >= 0.05)  # unrounded threshold — must match the oracle's
        .select(
            F.least("id_a", "id_b").alias("doc_a"),
            F.greatest("id_a", "id_b").alias("doc_b"),
            F.round(jac, 6).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# Bigram LM table (count-based MLE — the KenLM-style estimation prep)
# ---------------------------------------------------------------------------

BIGRAM_TOPK = 3


@query(
    "bigram_lm_table",
    oracle=f"""
WITH w AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents
), bg AS (
  SELECT w[i] AS w1, w[i+1] AS w2
  FROM w, unnest(range(1, greatest(len(w), 1))) AS t(i)
), c AS (
  SELECT w1, w2, count(*) AS c FROM bg GROUP BY 1, 2
), ctx AS (
  SELECT w1, sum(c) AS ctx FROM c GROUP BY 1
)
SELECT w1, w2, CAST(c AS BIGINT) AS c,
       round(CAST(c AS DOUBLE) / ctx, 6) AS p
FROM (
  SELECT c.w1, c.w2, c.c, ctx.ctx,
         row_number() OVER (PARTITION BY c.w1 ORDER BY c.c DESC, c.w2) AS r
  FROM c JOIN ctx USING (w1)
) WHERE r <= {BIGRAM_TOPK}
""",
    tags=("text", "ngram", "lm", "pipeline"),
)
def bigram_lm_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-based bigram LM estimation (the KenLM-style prep step a
    perplexity-filtering pipeline runs to build its scoring model):
    MLE continuation probabilities P(w2|w1) = c(w1,w2)/c(w1·) with the
    top-{BIGRAM_TOPK} continuations per context. Two hash aggregates
    (bigram counts, then context totals over the already-aggregated
    table) + one per-context rank window — the window runs over the
    VOCAB²-bounded count table, never corpus rows, and the rank filter
    compiles to WindowGroupLimit (non-empty partition spec)."""
    docs = load_table(spark, sf_dir, "documents")
    w = docs.select(_words(F.col("text")).alias("w"))
    n = F.greatest(F.size("w") - 1, F.lit(0))
    bg = w.select(
        F.explode(
            F.zip_with(
                F.slice("w", 1, n),
                F.slice("w", 2, n),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("b")
    ).select("b.w1", "b.w2")
    c = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    ctx = c.groupBy("w1").agg(F.sum("c").alias("ctx"))
    from pyspark.sql import Window

    win = Window.partitionBy("w1").orderBy(F.col("c").desc(), "w2")
    return (
        c.join(F.broadcast(ctx), "w1")
        .withColumn("r", F.row_number().over(win))
        .filter(F.col("r") <= BIGRAM_TOPK)
        .select(
            "w1",
            "w2",
            F.col("c").cast("bigint").alias("c"),
            F.round(F.col("c").cast("double") / F.col("ctx"), 6).alias("p"),
        )
    )
