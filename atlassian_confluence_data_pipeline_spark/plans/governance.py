"""Data-governance & layout queries (wave 21): k-anonymity audit,
small-file compaction planning, blocked entity resolution, and
classifier calibration.

The reference pipeline ships data out of a governed system (Confluence
spaces with per-space access, master_script.py's per-space export
loops); an engine that re-hosts that data at 100 TB needs the
governance surface itself: who is re-identifiable (k-anonymity), how
the physical layout should be compacted (the small-files problem the
reference's one-file-per-page sink creates, html_generator.py:50-64),
which records are the same real-world entity (the reference dedups
pages only by id, state_manager.py:55-82 — entity resolution is the
fuzzy generalization), and whether a quality classifier's scores can
be trusted as probabilities (calibration).

Exactness discipline: every score here is integer counts, DECIMAL
sums, or a fixed closed-form float on identical integer inputs — both
engines hash-match bit-for-bit (plans/_exact.py rationale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.operators.windows import (
    distributed_prefix_rank,
)
from atlassian_confluence_data_pipeline_spark.plans.registry import query

_DEC = "decimal(18,6)"


# ---------------------------------------------------------------------------
# k-anonymity audit
# ---------------------------------------------------------------------------

@query(
    "k_anonymity_audit",
    oracle="""
WITH g AS (
  SELECT c_mktsegment,
         c_nationkey,
         CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
         count(*) AS grp_n
  FROM customer
  GROUP BY 1, 2, 3
)
SELECT c_mktsegment,
       count(*) AS n_groups,
       CAST(sum(CASE WHEN grp_n < 5 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_small_groups,
       CAST(sum(CASE WHEN grp_n < 5 THEN grp_n ELSE 0 END) AS BIGINT)
         AS rows_at_risk,
       CAST(sum(grp_n) AS BIGINT) AS total_rows,
       CAST(min(grp_n) AS BIGINT) AS min_group_size,
       round(CAST(sum(CASE WHEN grp_n < 5 THEN grp_n ELSE 0 END) AS DOUBLE)
             / sum(grp_n), 6) AS risk_share
FROM g
GROUP BY 1
""",
    tags=("governance", "privacy", "agg"),
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (k=5) over the customer table's quasi-identifier
    tuple (market segment, nation, account-balance band): a row is
    re-identifiable when its QI group has fewer than k members. Reports,
    per segment, how many QI groups exist, how many are small, and the
    share of rows at risk — the table a privacy review actually reads.

    Scale shape: ONE hash aggregate to the QI-group domain (map-side
    combine absorbs the 100 TB fact side) and one tiny re-aggregate to
    segments. The balance band is floor(bal/1000) — 2-decimal doubles
    divided by 1000 floor identically in both engines (values are either
    exact multiples or >= 0.01 away from a boundary)."""
    cust = load_table(spark, sf_dir, "customer")
    g = cust.groupBy(
        "c_mktsegment",
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 1000.0).cast("bigint").alias("bal_band"),
    ).agg(F.count(F.lit(1)).alias("grp_n"))
    small = F.when(F.col("grp_n") < 5, F.col("grp_n")).otherwise(F.lit(0))
    return g.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum((F.col("grp_n") < 5).cast("int")).cast("bigint").alias("n_small_groups"),
        F.sum(small).cast("bigint").alias("rows_at_risk"),
        F.sum("grp_n").cast("bigint").alias("total_rows"),
        F.min("grp_n").cast("bigint").alias("min_group_size"),
        F.round(
            F.sum(small).cast("double") / F.sum("grp_n"), 6
        ).alias("risk_share"),
    )


# ---------------------------------------------------------------------------
# Compaction / small-files planning
# ---------------------------------------------------------------------------

#: target compacted file size in bytes (n_chars as byte proxy). Small at
#: fixture scale so the plan has multiple files to check; a production
#: run sets 128-512 MiB.
COMPACTION_TARGET = 65536


@query(
    "compaction_file_plan",
    oracle=f"""
WITH c AS (
  SELECT doc_id, n_chars,
         sum(n_chars) OVER (ORDER BY doc_id
                            ROWS UNBOUNDED PRECEDING) AS cum
  FROM documents
)
SELECT CAST(floor(CAST(cum - n_chars AS DOUBLE) / {COMPACTION_TARGET}) AS BIGINT)
         AS file_id,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS file_bytes,
       min(doc_id) AS first_doc,
       max(doc_id) AS last_doc
FROM c
GROUP BY 1
""",
    tags=("governance", "layout", "prefix"),
)
def compaction_file_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction plan: stream documents in doc_id order,
    cut a new output file every COMPACTION_TARGET bytes (fixed-stride
    binning of the cumulative byte stream — deterministic and
    prefix-expressible, unlike greedy reset-at-boundary packing), and
    report each planned file's row count, byte size, and id range. The
    reference's one-HTML-file-per-page sink (html_generator.py:50-64)
    is exactly the layout this repairs.

    Scale shape: the global byte cumsum runs through
    distributed_prefix_rank (per-range partial sums + a <= num_ranges
    boundary exchange — no single-partition window), then one hash
    aggregate to the file domain. Exact integer arithmetic throughout."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    c = distributed_prefix_rank(
        docs.localCheckpoint(eager=True), ["doc_id"], sums={"cum": "n_chars"}
    )
    return (
        c.withColumn(
            "file_id",
            F.floor(
                (F.col("cum") - F.col("n_chars")).cast("double")
                / COMPACTION_TARGET
            ).cast("bigint"),
        )
        .groupBy("file_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("file_bytes"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


# ---------------------------------------------------------------------------
# Blocked entity resolution
# ---------------------------------------------------------------------------

@query(
    "entity_resolution_parts",
    oracle="""
SELECT a.p_partkey AS partkey_a,
       b.p_partkey AS partkey_b,
       a.p_name AS name_a,
       b.p_name AS name_b,
       levenshtein(a.p_name, b.p_name) AS name_dist,
       CAST(b.p_size - a.p_size AS INT) AS size_diff,
       round(abs(b.p_retailprice - a.p_retailprice), 2) AS price_gap,
       CASE WHEN levenshtein(a.p_name, b.p_name) <= 4 THEN 1 ELSE 0 END
         AS is_match
FROM part a
JOIN part b
  ON split_part(a.p_name, ' ', 2) = split_part(b.p_name, ' ', 2)
 AND b.p_size - a.p_size BETWEEN 0 AND 1
 AND (b.p_size > a.p_size OR a.p_partkey < b.p_partkey)
WHERE levenshtein(a.p_name, b.p_name) <= 6
""",
    tags=("governance", "entity-resolution", "join", "blocking"),
)
def entity_resolution_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked entity resolution over parts: candidate pairs must share
    a blocking key (the noun of the two-word name AND near-equal size —
    a band of width 1), then a verify stage scores name edit distance
    and price gap and classifies matches (lev <= 4). The blocked
    candidate set replaces the quadratic all-pairs comparison — the same
    band-join discipline as the LSH dedup family, applied to fuzzy
    entity matching.

    Scale shape: the size band |b.size - a.size| in {0, 1} is TWO
    equi-joins on (noun, size) — never an inequality/cross join; block
    population per (noun, size) key stays bounded by the size domain, so
    pair volume grows linearly with parts. Oracle runs the literal
    quadratic blocked join; identical output proves the band-join
    rewrite. Integer distances + 2-decimal price gaps: cross-engine
    exact.

    The scored candidate table is STAGED in the warm chain cache
    (round-11 VERDICT item 3): deterministic in fixture + builder
    code, so a warm session skips the two block joins + Levenshtein
    verify and reads the persisted pair parquet."""
    from atlassian_confluence_data_pipeline_spark.plans._cache import (
        shared_pair_table,
    )

    return shared_pair_table(
        spark, sf_dir, "entity_resolution_pairs", _build_entity_pairs
    )


def _build_entity_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_size", "p_retailprice",
        F.split(F.col("p_name"), " ").getItem(1).alias("noun"),
    )
    a = part.alias("a")
    b = part.alias("b")
    lev = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))

    def _verified(cond) -> DataFrame:
        return (
            a.join(b, cond, "inner")
            .filter(lev <= 6)
            .select(
                F.col("a.p_partkey").alias("partkey_a"),
                F.col("b.p_partkey").alias("partkey_b"),
                F.col("a.p_name").alias("name_a"),
                F.col("b.p_name").alias("name_b"),
                lev.cast("bigint").alias("name_dist"),
                (F.col("b.p_size") - F.col("a.p_size")).cast("int").alias("size_diff"),
                F.round(
                    F.abs(F.col("b.p_retailprice") - F.col("a.p_retailprice")), 2
                ).alias("price_gap"),
                F.when(lev <= 4, F.lit(1)).otherwise(F.lit(0)).alias("is_match"),
            )
        )

    same = (F.col("a.noun") == F.col("b.noun")) & (
        F.col("a.p_size") == F.col("b.p_size")
    ) & (F.col("a.p_partkey") < F.col("b.p_partkey"))
    plus1 = (F.col("a.noun") == F.col("b.noun")) & (
        F.col("b.p_size") == F.col("a.p_size") + 1
    )
    return _verified(same).unionByName(_verified(plus1))


# ---------------------------------------------------------------------------
# Classifier calibration
# ---------------------------------------------------------------------------

@query(
    "calibration_bins",
    oracle="""
WITH feat AS (
  SELECT doc_id,
         len(regexp_split_to_array(trim(text), '\\s+')) AS n_words,
         len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
             w -> w IN ('the', 'a', 'of', 'and', 'to', 'in', 'is', 'it')))
           AS n_stop,
         CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS label
  FROM documents
), scored AS (
  SELECT doc_id, label,
         CAST(n_stop AS DOUBLE) / n_words AS stop_ratio,
         CASE WHEN n_words >= 200 THEN 1.0
              ELSE CAST(n_words AS DOUBLE) / 200 END AS len_score
  FROM feat WHERE n_words > 0
), s2 AS (
  SELECT doc_id, label,
         0.5 * stop_ratio + 0.5 * len_score AS score
  FROM scored
)
SELECT CAST(CASE WHEN score >= 1.0 THEN 9
            ELSE floor(score * 10) END AS INT) AS bin,
       count(*) AS n_docs,
       round(CAST(sum(CAST(round(score, 8) AS DECIMAL(18,10))) AS DOUBLE)
             / count(*), 6) AS mean_score,
       CAST(sum(label) AS BIGINT) AS n_positive,
       round(CAST(sum(label) AS DOUBLE) / count(*), 6) AS positive_rate
FROM s2
GROUP BY 1
""",
    tags=("governance", "calibration", "quality"),
)
def calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram for a document-quality score: bin the score
    into deciles and compare mean predicted score against the empirical
    positive rate per bin — the calibration table that decides whether a
    filter threshold can be read as a probability. Score is a fixed
    linear blend of stopword ratio and length saturation; the label is
    the length-based quality proxy (n_chars >= 300).

    Exactness: the score is a closed-form float on integer inputs
    (identical in both engines); the per-bin mean routes through
    DECIMAL(18,10) sums of the 8-decimal-rounded score so partition
    order can't move the hash. One hash aggregate — scale-trivial."""
    stop = ("the", "a", "of", "and", "to", "in", "is", "it")
    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.trim(F.col("text")), r"\s+")
    feat = docs.select(
        "doc_id",
        F.size(words).alias("n_words"),
        F.size(
            F.filter(words, lambda w: w.isin(*stop))
        ).alias("n_stop"),
        F.when(F.col("n_chars") >= 300, F.lit(1)).otherwise(F.lit(0)).alias("label"),
    ).filter(F.col("n_words") > 0)
    stop_ratio = F.col("n_stop").cast("double") / F.col("n_words")
    len_score = F.when(F.col("n_words") >= 200, F.lit(1.0)).otherwise(
        F.col("n_words").cast("double") / 200
    )
    s2 = feat.select(
        "doc_id", "label", (0.5 * stop_ratio + 0.5 * len_score).alias("score")
    )
    bin_ = F.when(F.col("score") >= 1.0, F.lit(9)).otherwise(
        F.floor(F.col("score") * 10)
    ).cast("int")
    return s2.groupBy(bin_.alias("bin")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(
            F.sum(F.round(F.col("score"), 8).cast("decimal(18,10)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_score"),
        F.sum("label").cast("bigint").alias("n_positive"),
        F.round(F.sum("label").cast("double") / F.count(F.lit(1)), 6).alias(
            "positive_rate"
        ),
    )
