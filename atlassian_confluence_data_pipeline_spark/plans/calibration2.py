"""Calibration & graph-local / PPS wave (41): expected calibration
error of the engine-fitted classifier, local clustering coefficients
of the near-dup graph, and probability-proportional-to-size systematic
sampling.

Ties earlier waves together: the logistic Newton step (wave 35)
produces scores — ECE measures whether those scores mean what they
say; the near-dup pair table produces a graph — the local clustering
coefficient says which nodes sit in dense duplication pockets; the
document-size column drives a PPS systematic sample whose selection is
one distributed prefix pass over cumulative size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.operators.windows import (
    distributed_prefix_rank,
)
from atlassian_confluence_data_pipeline_spark.plans.registry import query

#: calibration bin count (equal-width on the score axis)
_N_BINS = 10

#: PPS systematic sampling: one draw per this many characters
_PPS_STEP = 20_000


@query(
    "expected_calibration_error",
    oracle=r"""
WITH x AS (
  SELECT CAST(n_chars AS BIGINT) AS x1,
         CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
           AS x2,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
  FROM documents
), g AS (
  SELECT CAST(count(*) AS DOUBLE) AS m11,
         CAST(sum(CAST(x1 AS DECIMAL(38,0))) AS DOUBLE) AS m12,
         CAST(sum(CAST(x2 AS DECIMAL(38,0))) AS DOUBLE) AS m13,
         CAST(sum(CAST(x1 * x1 AS DECIMAL(38,0))) AS DOUBLE) AS m22,
         CAST(sum(CAST(x1 * x2 AS DECIMAL(38,0))) AS DOUBLE) AS m23,
         CAST(sum(CAST(x2 * x2 AS DECIMAL(38,0))) AS DOUBLE) AS m33,
         CAST(sum(CAST(2 * y - 1 AS DECIMAL(38,0))) AS DOUBLE) / 2 AS v1,
         CAST(sum(CAST(x1 * (2 * y - 1) AS DECIMAL(38,0))) AS DOUBLE) / 2
           AS v2,
         CAST(sum(CAST(x2 * (2 * y - 1) AS DECIMAL(38,0))) AS DOUBLE) / 2
           AS v3,
         CAST(count(*) AS BIGINT) AS n
  FROM x
), det AS (
  SELECT *,
         m11 * (m22 * m33 - m23 * m23)
         - m12 * (m12 * m33 - m23 * m13)
         + m13 * (m12 * m23 - m22 * m13) AS dt
  FROM g
), w AS (
  SELECT *,
         4 * (((m22 * m33 - m23 * m23) * v1
               + (m13 * m23 - m12 * m33) * v2
               + (m12 * m23 - m13 * m22) * v3) / dt) AS w1,
         4 * (((m13 * m23 - m12 * m33) * v1
               + (m11 * m33 - m13 * m13) * v2
               + (m12 * m13 - m11 * m23) * v3) / dt) AS w2,
         4 * (((m12 * m23 - m13 * m22) * v1
               + (m12 * m13 - m11 * m23) * v2
               + (m11 * m22 - m12 * m12) * v3) / dt) AS w3
  FROM det
), scored AS (
  SELECT x.y,
         round(1 / (1 + exp(-(w.w1 + w.w2 * x.x1 + w.w3 * x.x2))), 9)
           AS p
  FROM x CROSS JOIN w
), binned AS (
  SELECT least(CAST(floor(p * 10) AS BIGINT), 9) AS bin, y, p
  FROM scored
), per_bin AS (
  SELECT bin, CAST(count(*) AS BIGINT) AS n_b,
         CAST(sum(CAST(p AS DECIMAL(28,12))) AS DOUBLE) / count(*)
           AS conf,
         CAST(sum(y) AS DOUBLE) / count(*) AS acc
  FROM binned GROUP BY 1
), tot AS (SELECT CAST(sum(n_b) AS BIGINT) AS n FROM per_bin)
SELECT per_bin.bin, per_bin.n_b,
       round(per_bin.conf, 6) AS avg_confidence,
       round(per_bin.acc, 6) AS accuracy,
       round((SELECT CAST(sum(CAST(round(
                 abs(pb.acc - pb.conf) * pb.n_b, 9) AS DECIMAL(28,12)))
               AS DOUBLE) FROM per_bin pb) / tot.n, 6) AS ece
FROM per_bin CROSS JOIN tot
""",
    tags=("calibration", "classifier", "evaluation"),
)
def expected_calibration_error(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Expected calibration error of the wave-35 logistic model: score
    every document with the EXACT one-Newton-step weights, bin scores
    into 10 equal-width bins, and report per-bin confidence vs realized
    accuracy plus the n-weighted ECE — the "do the probabilities mean
    anything" audit that must accompany any learned quality scorer.

    Scale shape: the weight fit is the wave-35 1-row exact-moment
    aggregate; scoring is a narrow per-row sigmoid on literal weights
    (9-rounded so both engines bin identically); calibration is one
    10-bin hash aggregate with DECIMAL confidence sums."""
    from atlassian_confluence_data_pipeline_spark.plans.textops import _words

    # the wave-35 registry outputs are rounded to 9 decimals; the
    # oracle scores with UNROUNDED weights, so recompute them through
    # the shared closed form — both engines then score with
    # bit-identical weights
    docs = load_table(spark, sf_dir, "documents")
    x = docs.select(
        F.col("n_chars").cast("bigint").alias("x1"),
        F.size(_words(F.col("text"))).cast("bigint").alias("x2"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    )

    def dsum(c):
        return F.sum(c.cast("decimal(38,0)")).cast("double")

    gr = x.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        dsum(F.col("x1")).alias("m12"),
        dsum(F.col("x2")).alias("m13"),
        dsum(F.col("x1") * F.col("x1")).alias("m22"),
        dsum(F.col("x1") * F.col("x2")).alias("m23"),
        dsum(F.col("x2") * F.col("x2")).alias("m33"),
        dsum(2 * F.col("y") - 1).alias("tv1"),
        dsum(F.col("x1") * (2 * F.col("y") - 1)).alias("tv2"),
        dsum(F.col("x2") * (2 * F.col("y") - 1)).alias("tv3"),
    ).first()
    from atlassian_confluence_data_pipeline_spark.plans.fitting import _solve3

    m = (
        float(gr["n"]),
        gr["m12"],
        gr["m13"],
        gr["m22"],
        gr["m23"],
        gr["m33"],
    )
    v = (gr["tv1"] / 2, gr["tv2"] / 2, gr["tv3"] / 2)
    s1, s2, s3 = _solve3(m, v)
    w1, w2, w3 = 4 * s1, 4 * s2, 4 * s3
    p = F.round(
        1
        / (
            1
            + F.exp(
                -(
                    F.lit(w1)
                    + F.lit(w2) * F.col("x1")
                    + F.lit(w3) * F.col("x2")
                )
            )
        ),
        9,
    )
    binned = x.select(
        "y",
        p.alias("p"),
    ).select(
        "y",
        "p",
        F.least(F.floor(F.col("p") * 10).cast("bigint"), F.lit(9)).alias(
            "bin"
        ),
    )
    per_bin = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_b"),
        (
            F.sum(F.col("p").cast("decimal(28,12)")).cast("double")
            / F.count(F.lit(1))
        ).alias("conf"),
        (F.sum("y").cast("double") / F.count(F.lit(1))).alias("acc"),
    ).localCheckpoint(eager=True)
    tot = per_bin.agg(
        F.sum("n_b").cast("bigint").alias("n"),
        F.sum(
            F.round(
                F.abs(F.col("acc") - F.col("conf")) * F.col("n_b"), 9
            ).cast("decimal(28,12)")
        )
        .cast("double")
        .alias("werr"),
    ).first()
    ece = tot["werr"] / tot["n"]
    return per_bin.select(
        "bin",
        "n_b",
        F.round("conf", 6).alias("avg_confidence"),
        F.round("acc", 6).alias("accuracy"),
        F.round(F.lit(ece), 6).alias("ece"),
    )


def _lsh_pairs_sql() -> str:
    from atlassian_confluence_data_pipeline_spark.plans import (  # noqa: F401
        multimodal,
    )
    from atlassian_confluence_data_pipeline_spark.plans.registry import (
        QUERIES,
    )

    return QUERIES["near_dup_pairs_lsh"].oracle


@query(
    "local_clustering_coefficients",
    oracle="""
WITH pairs AS ({pairs}),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION ALL SELECT doc_b, doc_a FROM pairs
), deg AS (
  SELECT a AS node, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY 1
), tri AS (
  SELECT e1.a AS node, CAST(count(*) AS BIGINT) AS t2
  FROM edges e1
  JOIN edges e2 ON e2.a = e1.b AND e2.b <> e1.a
  JOIN edges e3 ON e3.a = e2.b AND e3.b = e1.a
  GROUP BY 1
)
SELECT deg.node AS doc_id, deg.deg,
       CAST(coalesce(tri.t2, 0) / 2 AS BIGINT) AS n_triangles,
       round(CASE WHEN deg.deg < 2 THEN 0.0
             ELSE CAST(coalesce(tri.t2, 0) AS DOUBLE)
                  / (deg.deg * (deg.deg - 1)) END, 6) AS clustering
FROM deg LEFT JOIN tri ON tri.node = deg.node
""",
    tags=("calibration", "graph", "structure"),
)
def local_clustering_coefficients(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Local clustering coefficient per near-dup node: the share of a
    node's neighbor pairs that are themselves connected — C=1 marks a
    clique-like duplication pocket (template families), C=0 a star
    (one canonical doc with many independent variants); the per-node
    refinement of neardup_triangle_stats' global count.

    Scale shape: triangles per node come from the standard two-hop
    edge-list self-join closed by a third equi-join (every join keyed
    on node ids — no cartesian); degrees are one aggregate; the pair
    table is the session-shared LSH chain."""
    from atlassian_confluence_data_pipeline_spark.plans._cache import (
        shared_pair_table,
    )
    from atlassian_confluence_data_pipeline_spark.plans.multimodal import (
        near_dup_pairs_lsh,
    )

    p = shared_pair_table(
        spark, sf_dir, "near_dup_pairs_lsh", near_dup_pairs_lsh
    ).select("doc_a", "doc_b")
    edges = (
        p.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
        .union(p.select(F.col("doc_b").alias("a"), F.col("doc_a").alias("b")))
        .localCheckpoint(eager=True)
    )
    deg = edges.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("deg")
    )
    e1 = edges.select(F.col("a").alias("n0"), F.col("b").alias("n1"))
    e2 = edges.select(F.col("a").alias("n1"), F.col("b").alias("n2"))
    e3 = edges.select(F.col("a").alias("n2"), F.col("b").alias("n0b"))
    tri = (
        e1.join(e2, "n1")
        .filter(F.col("n2") != F.col("n0"))
        .join(e3, "n2")
        .filter(F.col("n0b") == F.col("n0"))
        .groupBy(F.col("n0").alias("node"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("t2"))
    )
    j = deg.join(tri, "node", "left")
    t2 = F.coalesce(F.col("t2"), F.lit(0))
    return j.select(
        F.col("node").alias("doc_id"),
        "deg",
        (t2 / 2).cast("bigint").alias("n_triangles"),
        F.round(
            F.when(F.col("deg") < 2, F.lit(0.0)).otherwise(
                t2.cast("double") / (F.col("deg") * (F.col("deg") - 1))
            ),
            6,
        ).alias("clustering"),
    )


def _finalize_lcc_oracle() -> None:
    import dataclasses

    from atlassian_confluence_data_pipeline_spark.plans.registry import (
        QUERIES,
    )

    spec = QUERIES["local_clustering_coefficients"]
    QUERIES["local_clustering_coefficients"] = dataclasses.replace(
        spec, oracle=spec.oracle.format(pairs=_lsh_pairs_sql())
    )


_finalize_lcc_oracle()


@query(
    "pps_systematic_sample",
    oracle=f"""
WITH d AS (
  SELECT doc_id, source, CAST(n_chars AS BIGINT) AS sz FROM documents
), cum AS (
  SELECT doc_id, source, sz,
         sum(sz) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS c
  FROM d
), hits AS (
  SELECT doc_id, source, sz
  FROM cum
  WHERE (c // {_PPS_STEP}) - ((c - sz) // {_PPS_STEP}) >= 1
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_sampled,
       CAST(sum(sz) AS BIGINT) AS sampled_chars
FROM hits GROUP BY 1
""",
    tags=("calibration", "sampling", "prefix"),
)
def pps_systematic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic probability-proportional-to-size sampling: walk the
    cumulative character axis and take one document per {_PPS_STEP}
    characters (a doc is selected iff a step boundary falls inside its
    cumulative interval) — big documents are proportionally more likely
    to host a boundary, the classic PPS design, and the whole draw is
    deterministic integer arithmetic. Reported per source so mixture
    skew in the sample is visible.

    Scale shape: the cumulative axis is ONE distributed prefix pass
    over the doc stream; selection is a pure integer-division
    projection; the report is a source-domain aggregate."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.col("n_chars").cast("bigint").alias("sz")
    )
    cum = distributed_prefix_rank(d, ["doc_id"], sums={"c": "sz"})
    hits = cum.filter(
        F.expr(f"(c div {_PPS_STEP}) - ((c - sz) div {_PPS_STEP}) >= 1")
    )
    return hits.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sampled"),
        F.sum("sz").cast("bigint").alias("sampled_chars"),
    )
