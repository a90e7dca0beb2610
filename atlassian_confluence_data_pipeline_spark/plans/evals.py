"""Evaluation wave (24): ANN index quality, tokenizer fertility, and
cross-dimension covariance — the measurement layer a retrieval /
tokenization / embedding pipeline needs before trusting its own
indexes.

``ivf_ann_topk`` ships an index; ``ivf_recall_audit`` grades it
against brute force inside the engine (recall@k as a query, not a
notebook). ``token_counts`` counts two tokenizations;
``tokenizer_fertility_by_lang`` turns them into the fertility ratio
tokenizer papers report per language. ``embedding_whitening`` takes
per-dimension moments; ``embedding_covariance_block`` adds the
CROSS-dimension second moments (the input to PCA) with the same
quantize-to-exact-integers discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.plans.registry import query

#: same lossless quantizer as embedding_whitening (|v| < 1 in fixtures)
_QS = 1 << 20

#: leading dimensions in the covariance block (full d x d is d^2/2
#: aggregates — the block keeps the demonstration cheap; production
#: would shard pairs over jobs)
_COV_DIMS = 8

_N_QUERIES = 10
_K = 5

_COS = (
    "list_sum(list_transform(range(1, len({a})+1), i -> {a}[i] * {b}[i]))"
    " / (sqrt(list_sum(list_transform({a}, x -> x * x)))"
    " * sqrt(list_sum(list_transform({b}, x -> x * x))))"
)


def _ivf_recall_oracle() -> str:
    return f"""
WITH comp AS (
  SELECT label, vec_id,
         unnest(range(1, len(embedding)+1)) AS pos,
         unnest(embedding::DOUBLE[]) AS v
  FROM embeddings
), cm AS (
  SELECT label, pos,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(v ORDER BY vec_id)),
                     (a, b) -> a + b) / count(*) AS m
  FROM comp GROUP BY label, pos
), cent AS (
  SELECT label AS centroid_id, list(m ORDER BY pos) AS c FROM cm GROUP BY label
), e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), exact AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY q.vec_id ORDER BY
             {_COS.format(a='q.v', b='c.v')} DESC, c.vec_id) AS r
    FROM e q CROSS JOIN e c
    WHERE q.vec_id < {_N_QUERIES} AND q.vec_id <> c.vec_id
  ) WHERE r <= {_K}
), ca AS (
  SELECT * FROM (
    SELECT e.vec_id AS neighbor_id, e.v AS cv, cent.centroid_id,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY
             {_COS.format(a='e.v', b='cent.c')} DESC, cent.centroid_id) AS r
    FROM e CROSS JOIN cent
  ) WHERE r = 1
), qa AS (
  SELECT * FROM (
    SELECT e.vec_id AS query_id, e.v AS qv, cent.centroid_id,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY
             {_COS.format(a='e.v', b='cent.c')} DESC, cent.centroid_id) AS r
    FROM e CROSS JOIN cent WHERE e.vec_id < {_N_QUERIES}
  ) WHERE r <= 2
), approx AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
             ORDER BY {_COS.format(a='qv', b='cv')} DESC, neighbor_id) AS rnk
    FROM qa JOIN ca USING (centroid_id)
    WHERE query_id <> neighbor_id
  ) WHERE rnk <= {_K}
)
SELECT exact.query_id,
       CAST(count(approx.neighbor_id) AS BIGINT) AS n_hits,
       round(CAST(count(approx.neighbor_id) AS DOUBLE) / {_K}, 6)
         AS recall_at_k
FROM exact LEFT JOIN approx
  ON exact.query_id = approx.query_id
 AND exact.neighbor_id = approx.neighbor_id
GROUP BY 1
"""


@query(
    "ivf_recall_audit",
    oracle=_ivf_recall_oracle(),
    tags=("similarity", "ann", "eval", "vector"),
)
def ivf_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the IVF index against brute force, per query, AS A
    QUERY — the index-quality gate a retrieval pipeline runs after
    (re)building cells, not a notebook afterthought. Exact top-5 comes
    from the broadcast brute-force scan; approximate top-5 from the
    same 2-probe IVF plan ``ivf_ann_topk`` ships; recall is the overlap
    count over k (exact integer arithmetic).

    Scale shape: the exact side broadcasts the 10-query frame against
    the corpus (corpus never moves — one pass); the IVF side scans
    ~2/cells of the corpus; the overlap is an equi-join on
    (query_id, neighbor_id) between two k-row-per-query frames."""
    from atlassian_confluence_data_pipeline_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
    )
    from atlassian_confluence_data_pipeline_spark.plans.analytics import (
        _deterministic_mean_vectors,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    exact = brute_force_topk(emb, queries, k=_K).select(
        "query_id", "neighbor_id"
    )
    centroids = _deterministic_mean_vectors(emb, "label").select(
        F.col("label").alias("centroid_id"), F.col("mean_vec").alias("centroid")
    )
    approx = ivf_topk(
        emb, queries, k=_K, centroids=centroids, n_probe=2
    ).select("query_id", F.col("neighbor_id").alias("a_neighbor"))
    hit = approx.withColumn("hit", F.lit(1))
    return (
        exact.join(
            hit,
            (exact.query_id == hit.query_id)
            & (exact.neighbor_id == hit.a_neighbor),
            "left",
        )
        .groupBy(exact.query_id)
        .agg(
            F.sum(F.coalesce("hit", F.lit(0))).cast("bigint").alias("n_hits"),
            F.round(
                F.sum(F.coalesce("hit", F.lit(0))).cast("double") / _K, 6
            ).alias("recall_at_k"),
        )
    )


@query(
    "tokenizer_fertility_by_lang",
    oracle="""
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT)
         AS ws_tokens,
       CAST(sum(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]')))
         AS BIGINT) AS bpe_ish_tokens,
       round(CAST(sum(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]')))
             AS DOUBLE)
             / sum(len(regexp_split_to_array(trim(text), '\\s+'))), 6)
         AS fertility,
       round(CAST(sum(n_chars) AS DOUBLE)
             / sum(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]'))), 4)
         AS chars_per_token
FROM documents
GROUP BY 1
""",
    tags=("curation", "tokenizer", "text"),
)
def tokenizer_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language: subword-ish tokens per
    whitespace word (the per-language cost metric tokenizer papers
    report — high-fertility languages pay more sequence length per
    word) plus chars-per-token compression. Same two tokenizations as
    ``token_counts``, aggregated to the language axis with exact
    integer ratios. One hash aggregate over the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    bpe = F.size(
        F.regexp_extract_all(
            F.col("text"), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), F.lit(0)
        )
    )
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(ws).cast("bigint").alias("ws_tokens"),
        F.sum(bpe).cast("bigint").alias("bpe_ish_tokens"),
        F.round(F.sum(bpe).cast("double") / F.sum(ws), 6).alias("fertility"),
        F.round(F.sum("n_chars").cast("double") / F.sum(bpe), 4).alias(
            "chars_per_token"
        ),
    )


@query(
    "embedding_covariance_block",
    oracle=f"""
WITH q AS (
  SELECT vec_id, pos, CAST(floor(v * {float(_QS)!r}) AS BIGINT) AS qv
  FROM (
    SELECT vec_id,
           unnest(range(1, len(embedding)+1)) AS pos,
           unnest(embedding::DOUBLE[]) AS v
    FROM embeddings
  ) WHERE pos <= {_COV_DIMS}
), marg AS (
  SELECT pos, sum(qv) AS s, count(*) AS n FROM q GROUP BY 1
), pairs AS (
  SELECT a.pos AS pos_i, b.pos AS pos_j,
         sum(a.qv * b.qv) AS sij, count(*) AS n
  FROM q a JOIN q b ON a.vec_id = b.vec_id AND b.pos >= a.pos
  GROUP BY 1, 2
)
SELECT CAST(pos_i - 1 AS INT) AS dim_i,
       CAST(pos_j - 1 AS INT) AS dim_j,
       CAST(CAST(p.n * sij - mi.s * mj.s AS DECIMAL(38,0)) AS VARCHAR)
         AS cov_numerator,
       round((CAST(p.n AS DOUBLE) * sij - CAST(mi.s AS DOUBLE) * mj.s)
             / (CAST(p.n AS DOUBLE) * p.n)
             / {float(_QS * _QS)!r}, 10) AS covariance
FROM pairs p
JOIN marg mi ON mi.pos = p.pos_i
JOIN marg mj ON mj.pos = p.pos_j
""",
    tags=("vector", "statistics", "eval"),
)
def embedding_covariance_block(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-dimension covariance of the first {_COV_DIMS} embedding
    dimensions — the second-moment block PCA consumes
    (embedding_whitening covers the diagonal; this adds the
    off-diagonal structure that says which dimensions co-vary).

    Exactness: floats quantize to exact integers (floor(v*2^20),
    lossless for |v| < 1 fixtures — the embedding_whitening
    discipline); pair products and marginal sums are exact integer
    aggregates; the covariance double is one identical closed form,
    and the raw integer numerator ships alongside it so the hash also
    pins the EXACT value. Scale shape: one posexplode limited to the
    block dims (corpus x 8 rows), one self equi-join on vec_id
    (corpus x 36 pair rows), two hash aggregates — no all-pairs over
    vectors, only over the constant dimension block."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = (
        emb.select("vec_id", F.posexplode("embedding").alias("pos0", "v"))
        .filter(F.col("pos0") < _COV_DIMS)
        .select(
            "vec_id",
            (F.col("pos0") + 1).alias("pos"),
            F.floor(F.col("v").cast("double") * float(_QS)).cast("bigint").alias("qv"),
        )
        .localCheckpoint(eager=True)
    )
    marg = q.groupBy("pos").agg(
        F.sum("qv").alias("s"), F.count(F.lit(1)).alias("n")
    )
    a = q.select("vec_id", F.col("pos").alias("pos_i"), F.col("qv").alias("qa"))
    b = q.select(
        F.col("vec_id").alias("vb"), F.col("pos").alias("pos_j"), F.col("qv").alias("qb")
    )
    pairs = (
        a.join(b, (a.vec_id == b.vb) & (F.col("pos_j") >= F.col("pos_i")))
        .groupBy("pos_i", "pos_j")
        .agg(
            F.sum(F.col("qa") * F.col("qb")).alias("sij"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    mi = marg.select(F.col("pos").alias("pos_i"), F.col("s").alias("si"))
    mj = marg.select(F.col("pos").alias("pos_j"), F.col("s").alias("sj"))
    return (
        pairs.join(F.broadcast(mi), "pos_i")
        .join(F.broadcast(mj), "pos_j")
        .select(
            (F.col("pos_i") - 1).cast("int").alias("dim_i"),
            (F.col("pos_j") - 1).cast("int").alias("dim_j"),
            (F.col("n") * F.col("sij") - F.col("si") * F.col("sj"))
            .cast("decimal(38,0)")
            .cast("string")
            .alias("cov_numerator"),
            F.round(
                (
                    F.col("n").cast("double") * F.col("sij")
                    - F.col("si").cast("double") * F.col("sj")
                )
                / (F.col("n").cast("double") * F.col("n"))
                / float(_QS * _QS),
                10,
            ).alias("covariance"),
        )
    )
