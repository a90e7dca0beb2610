"""Seventeenth wave: navigation-path analytics + dedup-method
agreement.

- top session paths: the ordered event-type sequence of each user
  session (gap-based sessionization, first 5 steps), counted and
  top-k'd — the product-analytics "what journeys do users take"
  report, and the sequence-level complement of the single-step
  transition matrix (event_transition_matrix),
- dedup detector agreement: the MinHash-LSH and SimHash near-dup
  detectors run over the same corpus and their PAIR SETS are compared
  (sizes, overlap, Jaccard) — the calibration read that says whether
  two detectors see the same duplication structure or complementary
  slices of it (method triangulation before choosing the production
  detector).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.plans.registry import query

#: sessionization gap (seconds) — same bound as sessionize_events
PATH_GAP_S = 1800
#: path depth and report size
PATH_STEPS = 5
PATH_TOPK = 20


@query(
    "top_session_paths",
    oracle=f"""
WITH o AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id))
                   > {PATH_GAP_S} * 1000000
         THEN 1 ELSE 0 END AS new_sess
  FROM events
), s AS (
  SELECT user_id, ts, event_id, event_type,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM o
), p AS (
  SELECT user_id, session_seq,
         array_to_string(
           (list(event_type ORDER BY ts, event_id))[1:{PATH_STEPS}], '>')
           AS path
  FROM s GROUP BY 1, 2
)
SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
FROM p GROUP BY 1
ORDER BY n_sessions DESC, path LIMIT {PATH_TOPK}
""",
    tags=("events", "paths", "sessionization", "analytics"),
)
def top_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top navigation paths: gap-sessionize events (30-min bound, the
    sessionize_events logic), take each session's FIRST {K} event
    types in (ts, event_id) order as a '>'-joined path string, and
    report the {N} most common paths — the user-journey report, and
    the sequence-level complement of event_transition_matrix's
    single-step counts.

    Scale shape: one keyed window pass (lag + running sum, both on the
    user partition), one hash aggregate per session collecting at most
    the session's events (ordered in-array, sliced to {K}), one path
    count aggregate, global top-k via TakeOrderedAndProject."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    new_sess = F.when(
        prev_ts.isNull()
        | (
            F.unix_micros("ts") - F.unix_micros(prev_ts)
            > PATH_GAP_S * 1_000_000
        ),
        1,
    ).otherwise(0)
    s = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.sum(new_sess)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("session_seq"),
    )
    path = F.concat_ws(
        ">",
        F.slice(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda r: r["event_type"],
            ),
            1,
            PATH_STEPS,
        ),
    )
    p = s.groupBy("user_id", "session_seq").agg(path.alias("path"))
    return (
        p.groupBy("path")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(PATH_TOPK)
    )


def _agreement_oracle() -> str:
    from atlassian_confluence_data_pipeline_spark.plans import multimodal
    from atlassian_confluence_data_pipeline_spark.plans.registry import QUERIES

    mh = QUERIES["near_dup_pairs_lsh"].oracle
    sh = QUERIES["simhash_pairs"].oracle
    return f"""
WITH mh AS ({mh}),
sh AS ({sh}),
mhp AS (SELECT doc_a AS a, doc_b AS b FROM mh),
shp AS (SELECT id_a AS a, id_b AS b FROM sh),
c AS (SELECT count(*) AS n_common FROM mhp JOIN shp USING (a, b)),
nm AS (SELECT count(*) AS n FROM mhp),
ns AS (SELECT count(*) AS n FROM shp)
SELECT CAST(nm.n AS BIGINT) AS n_minhash,
       CAST(ns.n AS BIGINT) AS n_simhash,
       CAST(c.n_common AS BIGINT) AS n_common,
       round(CAST(c.n_common AS DOUBLE)
             / (nm.n + ns.n - c.n_common), 6) AS pair_set_jaccard
FROM nm CROSS JOIN ns CROSS JOIN c
"""


@query(
    "dedup_method_agreement",
    oracle=_agreement_oracle(),
    tags=("dedup", "diagnostic", "lsh"),
)
def dedup_method_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup detector agreement: run the MinHash-LSH (string-shingle
    Jaccard) and SimHash (Hamming) near-dup detectors over the same
    corpus and compare their PAIR SETS — sizes, intersection, and the
    Jaccard of the two sets. The triangulation read before picking a
    production detector: high agreement says either suffices; low
    agreement says they see complementary duplication (and the union
    is worth its cost). Both detectors are the engine's existing
    oracle-proven chains, composed.

    Scale shape: two near-linear LSH chains + one equi-join of their
    (small) pair lists + scalar counts — the comparison itself costs
    nothing beyond the detectors."""
    from atlassian_confluence_data_pipeline_spark.plans._cache import (
        shared_pair_table,
    )
    from atlassian_confluence_data_pipeline_spark.plans.multimodal import (
        near_dup_pairs_lsh,
        simhash_pairs,
    )

    mh = shared_pair_table(
        spark, sf_dir, "near_dup_pairs_lsh", near_dup_pairs_lsh
    ).select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    sh = shared_pair_table(
        spark, sf_dir, "simhash_pairs", simhash_pairs
    ).select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    common = mh.join(sh, ["a", "b"]).agg(
        F.count(F.lit(1)).alias("n_common")
    )
    nm = mh.agg(F.count(F.lit(1)).alias("n_minhash"))
    ns = sh.agg(F.count(F.lit(1)).alias("n_simhash"))
    return (
        nm.crossJoin(ns)
        .crossJoin(common)
        .select(
            F.col("n_minhash").cast("bigint").alias("n_minhash"),
            F.col("n_simhash").cast("bigint").alias("n_simhash"),
            F.col("n_common").cast("bigint").alias("n_common"),
            F.round(
                F.col("n_common").cast("double")
                / (
                    F.col("n_minhash")
                    + F.col("n_simhash")
                    - F.col("n_common")
                ),
                6,
            ).alias("pair_set_jaccard"),
        )
    )
