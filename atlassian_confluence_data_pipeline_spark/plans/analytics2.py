"""Analytics wave 4: sequence transitions, hybrid-search rank fusion,
join-key skew diagnostics, and the remaining ranking-function surface.

Scale shapes:

- transition matrix: lag window PARTITIONED by user_id (never global),
  then one hash aggregate — the sessionization pattern.
- RRF: each input ranking is cut to its top-100 by TakeOrdered first
  (never a global row_number over the corpus); ranks are assigned
  inside the bounded candidate frames and fused with a full outer
  join on doc_id.
- skew report: per-key counts (one hash agg), top-20 via TakeOrdered,
  then the share denominator attaches via a constant-key broadcast
  equi-join — a BroadcastHashJoin, not a nested-loop cross.
- deciles: ntile/percent_rank/cume_dist windows PARTITIONED by market
  segment (dim-bounded partitions, shuffle by segment only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.plans.registry import query

_RRF_K = 60
_RRF_N = 100


@query(
    "event_transition_matrix",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events
)
SELECT prev_type, event_type, count(*) AS n
FROM seq WHERE prev_type IS NOT NULL
GROUP BY 1, 2
""",
    tags=("events", "window", "lag", "markov"),
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts between event types per
    user: lag() over a user_id-partitioned window (deterministic
    (ts, event_id) order), then one hash aggregate. The window shuffle
    is keyed by user_id — bounded partitions at any corpus size.
    The grid itself rides the session-staged transition-count stage
    (plans/_cache.py) shared with the entropy-rate and stationary-
    distribution consumers — the lag window runs once per session."""
    from atlassian_confluence_data_pipeline_spark.plans._cache import (
        event_transition_counts,
    )

    return event_transition_counts(spark, sf_dir).select(
        "prev_type", "event_type", F.col("c").alias("n")
    )


@query(
    "rrf_hybrid_search",
    oracle=f"""
WITH scored AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '\\bspark\\b')) AS tf,
         n_chars
  FROM documents
),
top_a AS (
  SELECT doc_id, row_number() OVER (ORDER BY tf DESC, doc_id) AS rank_a
  FROM (SELECT * FROM scored ORDER BY tf DESC, doc_id LIMIT {_RRF_N}) t
),
top_b AS (
  SELECT doc_id, row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rank_b
  FROM (SELECT * FROM scored ORDER BY n_chars DESC, doc_id LIMIT {_RRF_N}) t
),
fused AS (
  SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
         coalesce(CAST(1 AS DOUBLE) / ({_RRF_K} + a.rank_a), CAST(0 AS DOUBLE))
           + coalesce(CAST(1 AS DOUBLE) / ({_RRF_K} + b.rank_b), CAST(0 AS DOUBLE))
           AS rrf
  FROM top_a a FULL OUTER JOIN top_b b ON a.doc_id = b.doc_id
)
SELECT doc_id, round(rrf, 6) AS rrf,
       CAST(row_number() OVER (ORDER BY rrf DESC, doc_id) AS INT) AS rnk
FROM fused
QUALIFY rnk <= 20
""",
    tags=("search", "rrf", "fusion", "topk"),
)
def rrf_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of two retrieval signals — term frequency
    of 'spark' (lexical) and document length (prior) — the standard
    hybrid-search merge. Each ranking is first cut to its top-100 by
    TakeOrderedAndProject (a global row_number over the corpus never
    happens); ranks are assigned inside the bounded 100-row frames,
    fused with 1/(60+rank) via a full outer join on doc_id."""
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        F.regexp_count("text", F.lit(r"\bspark\b")).alias("tf"),
        "n_chars",
    )

    def top_ranked(order_col: str, rank_name: str) -> DataFrame:
        cut = scored.orderBy(F.desc(order_col), F.asc("doc_id")).limit(_RRF_N)
        w = Window.orderBy(F.desc(order_col), F.asc("doc_id"))
        return cut.select(
            "doc_id", F.row_number().over(w).alias(rank_name)
        )

    a = top_ranked("tf", "rank_a")
    b = top_ranked("n_chars", "rank_b")
    fused = (
        a.join(b, "doc_id", "full_outer")
        .select(
            "doc_id",
            (
                F.coalesce(
                    F.lit(1.0) / (_RRF_K + F.col("rank_a")), F.lit(0.0)
                )
                + F.coalesce(
                    F.lit(1.0) / (_RRF_K + F.col("rank_b")), F.lit(0.0)
                )
            ).alias("rrf"),
        )
    )
    wf = Window.orderBy(F.desc("rrf"), F.asc("doc_id"))
    return (
        fused.withColumn("rnk", F.row_number().over(wf).cast("int"))
        .filter(F.col("rnk") <= 20)
        .select("doc_id", F.round("rrf", 6).alias("rrf"), "rnk")
    )


@query(
    "join_key_skew_report",
    oracle="""
WITH per_key AS (
  SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY 1
),
tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM per_key),
top AS (
  SELECT o_custkey, cnt FROM per_key ORDER BY cnt DESC, o_custkey LIMIT 20
)
SELECT t.o_custkey, t.cnt,
       round(CAST(t.cnt AS DOUBLE) / tot.total, 6) AS share
FROM top t CROSS JOIN tot
""",
    tags=("diagnostics", "skew", "topk", "broadcast"),
)
def join_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic: the 20 heaviest o_custkey values with
    their share of the table — the report you run BEFORE choosing a
    salting factor (operators/skew.py). One hash aggregate, top-20 via
    TakeOrderedAndProject, and the denominator attaches as a 1-row
    broadcast cross (Catalyst constant-folds any literal join key, so
    this is the same intentional 20x1 BNLJ as bm25_topk /
    nation_acctbal_share — whitelisted in plan_audit)."""
    orders = load_table(spark, sf_dir, "orders")
    per_key = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("cnt"))
    tot = per_key.agg(F.sum("cnt").alias("total"))
    top = per_key.orderBy(F.desc("cnt"), F.asc("o_custkey")).limit(20)
    return (
        top.join(F.broadcast(tot))
        .select(
            "o_custkey",
            "cnt",
            F.round(F.col("cnt").cast("double") / F.col("total"), 6).alias(
                "share"
            ),
        )
    )


@query(
    "customer_decile_stats",
    oracle="""
SELECT c_custkey, c_mktsegment,
       CAST(ntile(10) OVER w AS INT) AS decile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cum_dist
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
""",
    tags=("window", "ntile", "rank"),
)
def customer_decile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining ranking-function surface — ntile(10),
    percent_rank, cume_dist — over customers within each market
    segment (deterministic (acctbal DESC, custkey) order). Windows are
    PARTITIONED by segment, so the shuffle is keyed and bounded; the
    rank ratios are exact rationals computed identically on both
    engines."""
    cust = load_table(spark, sf_dir, "customer")
    w = (
        Window.partitionBy("c_mktsegment")
        .orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    )
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(10).over(w).cast("int").alias("decile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cum_dist"),
    )


@query(
    "subsample_replicate_means",
    oracle="""
WITH reps AS (
  SELECT b.b AS rep_id, o.o_orderkey, o.o_totalprice
  FROM orders o
  CROSS JOIN (SELECT unnest(generate_series(0, 9)) AS b) b
  WHERE (((o.o_orderkey % 2147483648) * 1103515245 + b.b * 12345)
         % 2147483648) % 2 = 0
)
SELECT rep_id, count(*) AS n_rows,
       round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             / count(*), 4) AS mean_price
FROM reps GROUP BY 1
""",
    tags=("sampling", "bootstrap", "stats"),
)
def subsample_replicate_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subsampling-based error bars: 10 deterministic half-samples of
    orders (portable affine hash over (o_orderkey, rep)), each reduced
    to its replicate mean — the distributed answer to "how stable is
    this statistic", without any row ever being collected. The 10x
    row fan-out happens map-side (explode straight into partial
    aggregates — one shuffle of 10 partial rows per partition);
    replicate means are DECIMAL-exact."""
    orders = load_table(spark, sf_dir, "orders")
    reps = orders.select(
        "o_orderkey",
        "o_totalprice",
        F.explode(F.sequence(F.lit(0).cast("long"), F.lit(9).cast("long"))).alias("rep_id"),
    ).filter(
        # key reduced below 2^31 before the multiply (overflow
        # discipline: the product must stay < 2^62 for ANY key range)
        (
            (
                (F.col("o_orderkey") % 2147483648) * 1103515245
                + F.col("rep_id") * 12345
            )
            % 2147483648
        )
        % 2
        == 0
    )
    return reps.groupBy("rep_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)),
            4,
        ).alias("mean_price"),
    )
