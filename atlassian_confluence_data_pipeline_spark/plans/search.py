"""Full-text retrieval queries over the `documents` corpus: an
inverted-index build and BM25 top-k ranking.

A training-data pipeline needs retrieval both for curation (find the
corpus documents most similar to a benchmark prompt = contamination
screening) and for RAG-style serving. Both queries here are pure
DataFrame compositions — tokenize with `split`, aggregate with hash
aggregates — no Python in the hot path, and every float is produced by
an identical expression tree on the Spark and DuckDB sides so the
driver's value-hash check holds bit-for-bit.

Reference parity: the reference's search surface is its CQL `search`
endpoint usage (`api_client/confluence_client.py` space/page queries);
this module supplies the analytical equivalent over the local corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.plans.registry import query
from atlassian_confluence_data_pipeline_spark.plans.textops import _words

#: BM25 constants (classic Robertson defaults) — shared with the oracle
#: SQL via f-string so both engines evaluate the same literals.
BM25_K1 = 1.5
BM25_B = 0.75
BM25_TOPK = 20
#: the fixed "search request" — terms present in the fixture vocabulary
BM25_QUERY_TERMS = ("join", "scan", "window")

POSTINGS_CAP = 12

_TERMS_SQL = ", ".join(f"'{t}'" for t in BM25_QUERY_TERMS)


@query(
    "bm25_topk",
    oracle=f"""
WITH l AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS words
  FROM documents
), d AS (
  SELECT doc_id, len(words) AS dl, words FROM l
), st AS (
  SELECT count(*) AS n, sum(dl) AS sumdl FROM d
), t AS (
  SELECT doc_id, dl, unnest(words) AS term FROM d
), tf AS (
  SELECT doc_id, dl, term, count(*) AS tf
  FROM t WHERE term IN ({_TERMS_SQL})
  GROUP BY doc_id, dl, term
), df AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
), sc AS (
  SELECT tf.doc_id, tf.term,
         ln(((st.n - df.df) + 0.5) / (df.df + 0.5) + 1.0)
           * (tf.tf * {BM25_K1 + 1.0})
           / (tf.tf + {BM25_K1} * ({1.0 - BM25_B} + {BM25_B} * (tf.dl / (st.sumdl::DOUBLE / st.n)))) AS s
  FROM tf JOIN df USING (term) CROSS JOIN st
), agg AS (
  SELECT doc_id,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(s ORDER BY term)),
                     (a, b) -> a + b) AS score
  FROM sc GROUP BY doc_id
)
SELECT doc_id, round(score, 6) AS score
FROM (SELECT doc_id, score,
             row_number() OVER (ORDER BY score DESC, doc_id) AS r
      FROM agg)
WHERE r <= {BM25_TOPK}
""",
    tags=("search", "ranking", "text"),
)
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k retrieval, expressed as three hash aggregates and one
    tiny broadcast join. Corpus stats (N, avgdl) and per-term df are a
    handful of rows — broadcast; the corpus-sized side is touched twice
    (lengths + term counts) and never shuffled on anything except the
    final per-doc aggregate. avgdl is computed as exact-integer
    sum(dl)/n (one double division) and the per-doc score is a
    term-ORDERED fold, so both engines add the per-term partial scores
    in the same sequence — bit-identical doubles, hash-checkable.

    At 100 TB: df/N/avgdl remain tiny broadcast state; tf is a map-side
    combine per document; the only global shuffle keys on doc_id. The
    final top-k is TakeOrderedAndProject (per-task partial top-k,
    driver merge of k-row heads) — never a single-partition sort."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select("doc_id", _words(F.col("text")).alias("words")).select(
        "doc_id", F.size("words").alias("dl"), "words"
    )
    st = d.agg(
        F.count("*").alias("n"), F.sum("dl").alias("sumdl")
    )  # 1 row -> broadcast
    tf = (
        d.select("doc_id", "dl", F.explode("words").alias("term"))
        .filter(F.col("term").isin(*BM25_QUERY_TERMS))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    avgdl = F.col("sumdl").cast("double") / F.col("n")
    idf = F.log(((F.col("n") - F.col("df")) + F.lit(0.5)) / (F.col("df") + F.lit(0.5)) + F.lit(1.0))
    s = (
        idf
        * (F.col("tf") * F.lit(BM25_K1 + 1.0))
        / (
            F.col("tf")
            + F.lit(BM25_K1)
            * (F.lit(1.0 - BM25_B) + F.lit(BM25_B) * (F.col("dl") / avgdl))
        )
    )
    sc = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(st))
        .select("doc_id", "term", s.alias("s"))
    )
    agg = (
        sc.groupBy("doc_id")
        .agg(F.sort_array(F.collect_list(F.struct("term", "s"))).alias("ts"))
        .select(
            "doc_id",
            F.aggregate(
                "ts", F.lit(0.0), lambda acc, x: acc + x["s"]
            ).alias("score"),
        )
    )
    # global top-k as orderBy+limit -> TakeOrderedAndProject: per-task
    # partial top-k merged on the driver. A row_number window with an
    # EMPTY partition spec is NOT WindowGroupLimit-optimized (verified
    # on Spark 4.1) — it would move every scored doc to one partition
    # and sort it there. Ties break on doc_id, so the row set is
    # deterministic and identical to the oracle's r <= k filter.
    return (
        agg.orderBy(F.col("score").desc(), "doc_id")
        .limit(BM25_TOPK)
        .select("doc_id", F.round("score", 6).alias("score"))
    )


@query(
    "inverted_index_postings",
    oracle=f"""
WITH t AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
  FROM documents
), td AS (
  SELECT DISTINCT term, doc_id FROM t
)
SELECT term, count(*) AS df,
       array_to_string(list_sort(list(doc_id))[1:{POSTINGS_CAP}], ',') AS sample_postings
FROM td
GROUP BY term
""",
    tags=("search", "index", "text"),
)
def inverted_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index construction: term -> document frequency + the
    first `POSTINGS_CAP` doc ids of the (sorted) posting list. One
    explode + one distinct + one hash aggregate, shuffled on the term —
    the exact shape of a distributed index build. Posting lists are
    capped and rendered as a joined string so the driver's scalar
    value-hash applies; at scale the uncapped lists would be written
    per-term to a partitioned sink instead of returned."""
    from atlassian_confluence_data_pipeline_spark.plans._cache import (
        doc_word_positions,
    )

    # session-staged token stream (round 11)
    td = (
        doc_word_positions(spark, sf_dir)
        .select(F.col("word").alias("term"), "doc_id")
        .distinct()
    )
    return td.groupBy("term").agg(
        F.count("*").alias("df"),
        F.array_join(
            F.slice(F.sort_array(F.collect_list("doc_id")), 1, POSTINGS_CAP), ","
        ).alias("sample_postings"),
    )
