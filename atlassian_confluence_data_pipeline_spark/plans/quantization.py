"""Round-4 wave: embedding quantization + categorical statistics.

- int8 embedding quantization with an in-query RECALL AUDIT: per-dim
  affine int8 codes (the memory-bound ANN deployment format — 4x
  smaller than float32, integer dot products), ranked against the
  exact-cosine top-k so the quality cost of quantization is measured
  IN the engine rather than asserted;
- deterministic grouped MODE (most frequent value, ties to the
  smallest) — the categorical summary built-ins leave tie-ordering
  undefined, so the engine form pins it with a count-then-rank pick.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.plans.registry import query

#: quantized-recall parameters (mirror cosine_topk's fixture shape)
Q8_QUERIES = 10
Q8_TOPK = 5
Q8_EPS = 1e-12


def _q8_oracle() -> str:
    cos = (
        "list_sum(list_transform(range(1, len({a})+1), i -> {a}[i] * {b}[i]))"
        " / (sqrt(list_sum(list_transform({a}, x -> CAST(x AS DOUBLE)"
        " * x))) * sqrt(list_sum(list_transform({b}, x ->"
        " CAST(x AS DOUBLE) * x))))"
    )
    return f"""
WITH comp AS (
  SELECT vec_id, unnest(range(1, len(embedding)+1)) AS pos,
         unnest(embedding::DOUBLE[]) AS v
  FROM embeddings
), st AS (
  SELECT pos, min(v) AS mn,
         greatest((max(v) - min(v)) / 255, {Q8_EPS}) AS w
  FROM comp GROUP BY 1
), e8 AS (
  SELECT c.vec_id,
         list(CAST(round((c.v - st.mn) / st.w) AS BIGINT) - 128
              ORDER BY c.pos) AS q
  FROM comp c JOIN st USING (pos) GROUP BY c.vec_id
), ex AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), exact AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id
  FROM ex a JOIN ex b ON a.vec_id < {Q8_QUERIES} AND a.vec_id <> b.vec_id
  QUALIFY row_number() OVER (
    PARTITION BY a.vec_id
    ORDER BY {cos.format(a='a.v', b='b.v')} DESC, b.vec_id
  ) <= {Q8_TOPK}
), quant AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id
  FROM e8 a JOIN e8 b ON a.vec_id < {Q8_QUERIES} AND a.vec_id <> b.vec_id
  QUALIFY row_number() OVER (
    PARTITION BY a.vec_id
    ORDER BY {cos.format(a='a.q', b='b.q')} DESC, b.vec_id
  ) <= {Q8_TOPK}
)
SELECT e.query_id,
       CAST(count(q.neighbor_id) AS BIGINT) AS n_common,
       round(CAST(count(q.neighbor_id) AS DOUBLE) / {Q8_TOPK}, 2)
         AS recall_at_{Q8_TOPK}
FROM exact e LEFT JOIN quant q
  ON e.query_id = q.query_id AND e.neighbor_id = q.neighbor_id
GROUP BY 1
"""


@query(
    "int8_topk_recall",
    oracle=_q8_oracle(),
    tags=("similarity", "vector", "quantization", "scalepath"),
)
def int8_topk_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """int8 embedding quantization with an in-query recall audit: every
    vector quantizes to per-dimension affine int8 codes (min/width from
    the corpus — the standard memory-bound ANN format: 4x smaller,
    integer dot products), then each query's quantized-cosine top-{K}
    is compared to the exact-cosine top-{K} and recall@{K} reported per
    query. The measurement a deployment makes BEFORE swapping floats
    for codes.

    Scale shape: the per-dim stats are 64 loop-control rows (the
    whitening-moments discipline) embedded as literal arrays; coding is
    a narrow projection; ranking reuses the brute-force-topk shape on
    the broadcast query side. Quantized dots are INTEGER arithmetic —
    exact in both engines; only the final normalization is float, from
    identical integers."""
    emb = load_table(spark, sf_dir, "embeddings")
    stats = sorted(
        (
            (r["pos"], r["mn"], r["mx"])
            for r in emb.select(
                F.posexplode("embedding").alias("pos", "v")
            )
            .groupBy("pos")
            .agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
            .collect()
        ),
        key=lambda t: t[0],
    )
    mn_lit = F.lit([float(mn) for _, mn, _ in stats])
    w_lit = F.lit(
        [max((mx - mn) / 255, Q8_EPS) for _, mn, mx in stats]
    )
    vec = F.col("embedding")
    codes = F.transform(
        F.sequence(F.lit(1), F.size(vec)),
        lambda i: (
            F.round(
                (F.element_at(vec, i) - F.element_at(mn_lit, i))
                / F.element_at(w_lit, i)
            ).cast("bigint")
            - 128
        ),
    )
    # each side's norm folds once per VECTOR instead of twice per pair
    # (bit-identical reuse — same fold, same division shape; round 11.
    # A localCheckpoint of the coded frame was measured WORSE: the
    # materialization costs more than re-evaluating the cheap code
    # transform per ranking.)
    def _nrm(a):
        return F.sqrt(
            F.aggregate(
                a,
                F.lit(0.0).cast("double"),
                lambda acc, x: acc + x.cast("double") * x,
            )
        )

    base = emb.select(
        "vec_id",
        "embedding",
        codes.alias("q"),
        _nrm(F.col("embedding")).alias("__ne"),
        _nrm(codes).alias("__nq"),
    )
    norm_col = {"embedding": "__ne", "q": "__nq"}

    def _dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x,
        )

    def _topk(col: str) -> DataFrame:
        nc = norm_col[col]
        qs = base.filter(F.col("vec_id") < Q8_QUERIES).select(
            F.col("vec_id").alias("query_id"),
            F.col(col).alias("qa"),
            F.col(nc).alias("__na"),
        )
        cs = base.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col(col).alias("cb"),
            F.col(nc).alias("__nb"),
        )
        pairs = (
            F.broadcast(qs)
            .join(cs, F.col("query_id") != F.col("neighbor_id"))
            .select(
                "query_id",
                "neighbor_id",
                (
                    _dot(F.col("qa"), F.col("cb"))
                    / (F.col("__na") * F.col("__nb"))
                ).alias("sim"),
            )
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("sim"), F.asc("neighbor_id")
        )
        return (
            pairs.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= Q8_TOPK)
            .select("query_id", "neighbor_id")
        )

    exact = _topk("embedding")
    quant = _topk("q").withColumnRenamed("neighbor_id", "qn")
    return (
        exact.join(
            quant,
            (exact["query_id"] == quant["query_id"])
            & (exact["neighbor_id"] == quant["qn"]),
            "left",
        )
        .groupBy(exact["query_id"].alias("query_id"))
        .agg(
            F.count("qn").cast("bigint").alias("n_common"),
            F.round(F.count("qn").cast("double") / Q8_TOPK, 2).alias(
                f"recall_at_{Q8_TOPK}"
            ),
        )
    )


@query(
    "grouped_mode_priority",
    oracle="""
WITH counts AS (
  SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
  FROM orders GROUP BY 1, 2
)
SELECT o_orderstatus, o_orderpriority AS mode_priority,
       CAST(cnt AS BIGINT) AS n_rows
FROM counts
QUALIFY row_number() OVER (
  PARTITION BY o_orderstatus ORDER BY cnt DESC, o_orderpriority
) = 1
""",
    tags=("agg", "mode", "categorical"),
)
def grouped_mode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DETERMINISTIC grouped mode: the most frequent order priority per
    order status, ties broken to the lexicographically smallest value.
    Built-in ``mode()`` leaves tie order undefined in both engines, so
    the engine form is the count-then-rank pick — one hash aggregate to
    the (group, value) census plus a keyed window over it (census
    scale, never fact scale)."""
    o = load_table(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.desc("cnt"), F.asc("o_orderpriority")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_priority"),
            F.col("cnt").cast("bigint").alias("n_rows"),
        )
    )


#: PQ-ADC search parameters (mirror cosine_topk's fixture shape)
ADC_QUERIES = 10
ADC_TOPK = 5


#: hash-sampling rule for the audit's exact leg: a query is audited
#: iff (A * query_id + B) % MOD is even — deterministic, engine-exact
#: integer arithmetic (the LSH-family affine-hash discipline). At the
#: fixture's 10 queries this samples 5; at scale the exact leg's cost
#: is half the query load instead of all of it (and the divisor is the
#: knob).
ADC_AUDIT_A = 1_000_003
ADC_AUDIT_B = 17
ADC_AUDIT_MOD = 2_147_483_647


def _adc_sampled_sql(qid: str) -> str:
    return f"({ADC_AUDIT_A} * {qid} + {ADC_AUDIT_B}) % {ADC_AUDIT_MOD} % 2 = 0"


def _adc_core_ctes() -> str:
    """Shared CTE prefix of the two ADC oracles: codebook, codes, query
    LUTs, and the ADC-ranked pair list (NO exact leg)."""
    from atlassian_confluence_data_pipeline_spark.plans.embeddings2 import (
        _CODEBOOK,
        _SUBS,
        pq_subdist_sql_duck,
    )

    enc_dists = ",\n         ".join(
        f"{pq_subdist_sql_duck('e.embedding', 'c.embedding', s)} AS d{s}"
        for s in range(_SUBS)
    )
    lut_dists = ",\n         ".join(
        f"{pq_subdist_sql_duck('q.embedding', 'c.embedding', s)} AS d{s}"
        for s in range(_SUBS)
    )
    codes = ",\n       ".join(
        f"first(cid ORDER BY d{s} ASC, cid ASC) AS code{s}"
        for s in range(_SUBS)
    )
    lut_joins = "\n  ".join(
        f"JOIN lut l{s} ON l{s}.query_id = q.query_id"
        f" AND l{s}.cid = db.code{s}"
        for s in range(_SUBS)
    )
    adc = " + ".join(f"l{s}.d{s}" for s in range(_SUBS))
    return f"""
WITH cb AS (
  SELECT vec_id AS cid, embedding FROM embeddings WHERE vec_id < {_CODEBOOK}
),
d AS (
  SELECT e.vec_id, c.cid,
         {enc_dists}
  FROM embeddings e CROSS JOIN cb c
),
codes AS (
  SELECT vec_id,
       {codes}
  FROM d GROUP BY vec_id
),
q AS (
  SELECT vec_id AS query_id, embedding FROM embeddings
  WHERE vec_id < {ADC_QUERIES}
),
lut AS (
  SELECT q.query_id, c.cid,
         {lut_dists}
  FROM q CROSS JOIN cb c
),
db AS (
  SELECT e.vec_id AS neighbor_id, e.embedding, c.*
  FROM embeddings e JOIN codes c ON e.vec_id = c.vec_id
),
pairs AS (
  SELECT q.query_id, db.neighbor_id,
         {adc} AS adc
  FROM q JOIN db ON q.query_id <> db.neighbor_id
  {lut_joins}
),
ranked AS (
  SELECT query_id, neighbor_id, adc,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY adc ASC, neighbor_id) AS r
  FROM pairs
)"""


def _adc_search_oracle() -> str:
    return (
        _adc_core_ctes()
        + f"""
SELECT query_id, neighbor_id, CAST(r AS INT) AS rank,
       round(adc, 6) AS adc_dist
FROM ranked WHERE r <= {ADC_TOPK}
"""
    )


def _adc_oracle() -> str:
    exd = (
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        "list_transform(generate_series(1, len(q.embedding)), "
        "i -> (q.embedding[i]::DOUBLE - db.embedding[i]::DOUBLE)"
        " * (q.embedding[i]::DOUBLE - db.embedding[i]::DOUBLE))), "
        "(acc, x) -> acc + x)"
    )
    return (
        _adc_core_ctes()
        + f""",
expairs AS (
  SELECT q.query_id, db.neighbor_id,
         {exd} AS exd
  FROM q JOIN db ON q.query_id <> db.neighbor_id
  WHERE {_adc_sampled_sql('q.query_id')}
),
extop AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY exd ASC, neighbor_id) AS rx
    FROM expairs
  ) WHERE rx <= {ADC_TOPK}
)
SELECT r.query_id, r.neighbor_id, CAST(r.r AS INT) AS rank,
       round(r.adc, 6) AS adc_dist,
       CASE WHEN {_adc_sampled_sql('r.query_id')}
            THEN CAST(CASE WHEN e.neighbor_id IS NOT NULL
                           THEN 1 ELSE 0 END AS INT)
            ELSE NULL END AS exact_hit
FROM ranked r
LEFT JOIN extop e
  ON e.query_id = r.query_id AND e.neighbor_id = r.neighbor_id
WHERE r.r <= {ADC_TOPK}
"""
    )


def _adc_frames(spark: SparkSession, sf_dir: str):
    """Shared builders for the ADC pair: (q, db, adc_expr) where q is
    the query frame (query_id, lut0..lutS) with one exact-distance LUT
    array per subspace, db is (neighbor_id, code0..codeS), and adc_expr
    sums the S LUT lookups. Both frames are STAGED in the warm chain
    cache (round-11 optimization): the encode/LUT stages are ~512-term
    literal expression trees whose bench-scale cost is Catalyst +
    codegen, re-paid per consumer when inlined — the three ADC
    consumers now share one build per session. Neither staged frame
    carries floats; exact-leg consumers re-attach vectors from the
    embeddings table themselves (ids + floats, a narrow scan)."""
    from atlassian_confluence_data_pipeline_spark.plans._cache import (
        pq_code_table,
        pq_query_luts,
    )
    from atlassian_confluence_data_pipeline_spark.plans.embeddings2 import (
        _SUBS,
    )

    db = pq_code_table(spark, sf_dir).select(
        F.col("vec_id").alias("neighbor_id"),
        *[F.col(f"code{s}") for s in range(_SUBS)],
    )
    q = pq_query_luts(spark, sf_dir)
    adc = None
    for s in range(_SUBS):
        term = F.element_at(F.col(f"lut{s}"), F.col(f"code{s}").cast("int") + 1)
        adc = term if adc is None else adc + term
    return q, db, adc


def _adc_sampled_expr(qid) -> "F.Column":  # noqa: ANN001
    return (
        (F.lit(ADC_AUDIT_A) * qid + F.lit(ADC_AUDIT_B))
        % F.lit(ADC_AUDIT_MOD)
        % 2
        == 0
    )


@query(
    "pq_adc_search",
    oracle=_adc_search_oracle(),
    tags=("similarity", "vector", "quantization", "ann", "scalepath"),
)
def pq_adc_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ asymmetric-distance (ADC) top-{K} search — the PRODUCTION
    deployment of the ``pq_codes`` index (X3 at 100 TB: the corpus
    lives as {SUBS} bytes of codes per vector, never as floats). Each
    query builds a {SUBS}x{CB} lookup table of EXACT squared subspace
    distances to the codebook (query side keeps its floats — that's
    the asymmetry); every database vector's approximate distance is
    {SUBS} LUT lookups summed, and the per-query top-{K} comes off a
    PARTITIONED rank window. No exact leg anywhere in the plan — the
    quality audit is the hash-sampled sibling ``pq_adc_topk`` (the
    ivf_ann_topk / ivf_recall_audit split, round-11 VERDICT item 5).

    Scale shape: codes and LUTs are flat literal/codegen arithmetic
    (no HOF in the encode path — the pq_codes two-stage form, shared
    kernels in embeddings2.py); search is the cosine_topk
    broadcast-BNLJ shape ({Q}-row query side under the != condition,
    documented in PLANS.md). The LUT-sum scan replaces a 64-mult
    float dot per pair with {SUBS} array lookups over 16x less memory
    traffic, and the scan's input projection carries ONLY ids + codes."""
    q, db, adc = _adc_frames(spark, sf_dir)
    pairs = (
        F.broadcast(q)
        .join(db, F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", adc.alias("adc"))
    )
    w_adc = Window.partitionBy("query_id").orderBy(
        F.asc("adc"), F.asc("neighbor_id")
    )
    return (
        pairs.select(
            "query_id",
            "neighbor_id",
            "adc",
            F.row_number().over(w_adc).alias("r"),
        )
        .filter(F.col("r") <= ADC_TOPK)
        .select(
            "query_id",
            "neighbor_id",
            F.col("r").cast("int").alias("rank"),
            F.round("adc", 6).alias("adc_dist"),
        )
    )


@query(
    "pq_adc_topk",
    oracle=_adc_oracle(),
    tags=("similarity", "vector", "quantization", "ann", "calibration"),
)
def pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-ADC top-{K} with the SAMPLED exact-recall audit — the
    calibration sibling of ``pq_adc_search`` (round-11 VERDICT item 5:
    the audit leg is no longer carried per pair for every query). The
    ADC ranking is identical to the production search; additionally,
    for the hash-SAMPLED queries ((A*query_id+B) % MOD even — half the
    query load at the fixture, the knob at scale) the exact squared-L2
    top-{K} is computed and each reported neighbor is flagged
    ``exact_hit``; unsampled queries carry NULL. This is the
    ivf_recall_audit discipline: the index is graded continuously on a
    deterministic sample instead of paying the full float scan per
    query.

    Scale shape: the ADC leg is the production shape (codes-only
    projection); the exact leg's broadcast query side is the sampled
    half, and its ranking window is PARTITIONED by query_id. Sampling
    is affine-hash integer arithmetic — engine-exact."""
    q, db, adc = _adc_frames(spark, sf_dir)
    pairs = (
        F.broadcast(q)
        .join(db, F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", adc.alias("adc"))
    )
    w_adc = Window.partitionBy("query_id").orderBy(
        F.asc("adc"), F.asc("neighbor_id")
    )
    ranked = pairs.select(
        "query_id",
        "neighbor_id",
        "adc",
        F.row_number().over(w_adc).alias("r"),
    ).filter(F.col("r") <= ADC_TOPK)
    # exact leg: sampled queries only, floats confined to this branch —
    # vectors re-attached from the embeddings table (the staged ADC
    # frames are codes/LUTs only)
    emb = load_table(spark, sf_dir, "embeddings")
    exd = F.aggregate(
        F.sequence(F.lit(1), F.size("qv")),
        F.lit(0.0),
        lambda acc, i: acc
        + (
            F.element_at(F.col("qv"), i).cast("double")
            - F.element_at(F.col("nv"), i).cast("double")
        )
        * (
            F.element_at(F.col("qv"), i).cast("double")
            - F.element_at(F.col("nv"), i).cast("double")
        ),
    )
    qs = emb.filter(F.col("vec_id") < ADC_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    ).filter(_adc_sampled_expr(F.col("query_id")))
    w_ex = Window.partitionBy("query_id").orderBy(
        F.asc("exd"), F.asc("neighbor_id")
    )
    extop = (
        F.broadcast(qs)
        .join(
            emb.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("embedding").alias("nv"),
            ),
            F.col("query_id") != F.col("neighbor_id"),
        )
        .select("query_id", "neighbor_id", exd.alias("exd"))
        .select(
            "query_id",
            "neighbor_id",
            F.row_number().over(w_ex).alias("rx"),
        )
        .filter(F.col("rx") <= ADC_TOPK)
        .select("query_id", "neighbor_id", F.lit(1).alias("hit"))
    )
    return ranked.join(extop, ["query_id", "neighbor_id"], "left").select(
        "query_id",
        "neighbor_id",
        F.col("r").cast("int").alias("rank"),
        F.round("adc", 6).alias("adc_dist"),
        F.when(
            _adc_sampled_expr(F.col("query_id")),
            F.coalesce(F.col("hit"), F.lit(0)),
        )
        .otherwise(F.lit(None))
        .cast("int")
        .alias("exact_hit"),
    )


def _adc_recall_oracle() -> str:
    return f"""
WITH audited AS ({_adc_oracle()})
SELECT query_id,
       CAST(sum(exact_hit) AS BIGINT) AS n_hits,
       round(CAST(sum(exact_hit) AS DOUBLE) / {ADC_TOPK}, 6)
         AS recall_at_k
FROM audited
WHERE exact_hit IS NOT NULL
GROUP BY 1
"""


@query(
    "pq_adc_recall",
    oracle=_adc_recall_oracle(),
    tags=("similarity", "quantization", "ann", "eval", "calibration"),
)
def pq_adc_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@{K} of the PQ-ADC index on the hash-SAMPLED audit
    queries, AS A QUERY — the rollup a retrieval pipeline alerts on
    (the ivf_recall_audit shape applied to the sampled PQ audit): per
    sampled query, how many of the ADC top-{K} fall in the exact
    squared-L2 top-{K}. Continuous index-quality monitoring at the
    cost of the sampled leg only; unsampled queries never enter.

    Scale shape: one aggregate over the audit's <= K rows per sampled
    query; all upstream shapes are pq_adc_topk's (codes-only ADC scan
    + sampled exact leg)."""
    audited = pq_adc_topk(spark, sf_dir).filter(
        F.col("exact_hit").isNotNull()
    )
    return audited.groupBy("query_id").agg(
        F.sum("exact_hit").cast("bigint").alias("n_hits"),
        F.round(
            F.sum("exact_hit").cast("double") / ADC_TOPK, 6
        ).alias("recall_at_k"),
    )
