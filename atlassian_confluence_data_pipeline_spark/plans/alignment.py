"""Distribution-alignment / corpus-planning wave (29): quantile
normalization across sources, Heaps'-law vocabulary-growth fit,
Neyman-optimal stratified allocation, and IPF (raking) mixture
balancing.

These are the planning ops a training-data pipeline runs BEFORE
sampling: put per-source score scales on one footing (quantile
normalize), predict vocabulary growth from corpus growth (Heaps), size
per-stratum samples for minimum variance (Neyman), and reweight the
source x language grid to target margins (IPF — the classic raking
estimator). Cross-engine discipline as everywhere: exact integer /
DECIMAL accumulation wherever a sum crosses a shuffle, libm only on
already-identical doubles, every corpus-sized cumulative or rank pass
through ``distributed_prefix_rank``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.operators.windows import (
    distributed_prefix_rank,
)
from atlassian_confluence_data_pipeline_spark.plans.registry import query
from atlassian_confluence_data_pipeline_spark.plans.textops import _words

#: total sample budget the Neyman allocation distributes
_SAMPLE_TOTAL = 100_000

#: decimal type for margin sums of 9-rounded weights (exact, associative)
_WDEC = "decimal(28,12)"


@query(
    "quantile_normalize_chars",
    oracle="""
WITH d AS (SELECT doc_id, source, n_chars FROM documents),
t AS (SELECT count(*) AS n FROM d),
r AS (
  SELECT doc_id, source, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars, doc_id) AS i,
         count(*) OVER (PARTITION BY source) AS n_s
  FROM d
), g AS (
  SELECT n_chars AS pooled_chars,
         row_number() OVER (ORDER BY n_chars, doc_id) AS grank
  FROM d
)
SELECT r.doc_id, r.source,
       CAST(r.n_chars AS BIGINT) AS raw_chars,
       CAST(g.pooled_chars AS BIGINT) AS norm_chars
FROM r CROSS JOIN t
JOIN g ON g.grank = ((r.i * t.n - 1) // r.n_s) + 1
""",
    tags=("alignment", "quantile", "prefix"),
)
def quantile_normalize_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization of a per-source score (document length)
    onto the POOLED distribution: a doc at within-source rank i of n_s
    maps to the pooled value at global rank ceil(i*N/n_s) — after
    normalization every source has (as near as integral ranks allow)
    the same score distribution, so cross-source thresholds mean the
    same thing everywhere. The rank arithmetic is pure-integer ceiling
    division ((i*N - 1) div n_s) + 1, exact at any corpus size.

    Scale shape: the within-source rank is a PARTITIONED window; the
    pooled rank runs through distributed_prefix_rank (the global-order
    pass that must never be a single-partition window); the mapping is
    one equi-join on the target rank. Ties break on doc_id on both
    sides, so the mapping is a deterministic function of the data."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    n_total = d.count()
    w_src = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    r = d.select(
        "doc_id",
        "source",
        "n_chars",
        F.row_number().over(w_src).alias("i"),
        F.count(F.lit(1))
        .over(Window.partitionBy("source"))
        .alias("n_s"),
    )
    g = distributed_prefix_rank(
        d.select(F.col("n_chars").alias("pooled_chars"), F.col("doc_id")),
        ["pooled_chars", "doc_id"],
        rank_col="grank",
    ).select("pooled_chars", "grank")
    target = F.expr(f"((i * {n_total} - 1) div n_s) + 1")
    return (
        r.withColumn("grank", target)
        .join(g, "grank")
        .select(
            "doc_id",
            "source",
            F.col("n_chars").cast("bigint").alias("raw_chars"),
            F.col("pooled_chars").cast("bigint").alias("norm_chars"),
        )
    )


@query(
    "heaps_law_fit",
    oracle=r"""
WITH words AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS word
  FROM documents
), first_occ AS (
  SELECT min(doc_id) AS doc_id FROM words GROUP BY word
), newt AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS newt FROM first_occ GROUP BY 1
), perdoc AS (
  SELECT d.doc_id,
         CAST(len(regexp_split_to_array(trim(d.text), '\s+')) AS BIGINT)
           AS toks,
         coalesce(newt.newt, 0) AS newt
  FROM documents d LEFT JOIN newt ON newt.doc_id = d.doc_id
), cum AS (
  SELECT sum(toks) OVER w AS n, sum(newt) OVER w AS v
  FROM perdoc
  WINDOW w AS (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
), pts AS (
  SELECT round(ln(CAST(n AS DOUBLE)), 9) AS x,
         round(ln(CAST(v AS DOUBLE)), 9) AS y
  FROM cum WHERE n > 0 AND v > 0
), acc AS (
  SELECT CAST(count(*) AS DOUBLE) AS m,
         CAST(sum(CAST(x AS DECIMAL(28,12))) AS DOUBLE) AS sx,
         CAST(sum(CAST(y AS DECIMAL(28,12))) AS DOUBLE) AS sy,
         CAST(sum(CAST(round(x * y, 9) AS DECIMAL(28,12))) AS DOUBLE) AS sxy,
         CAST(sum(CAST(round(x * x, 9) AS DECIMAL(28,12))) AS DOUBLE) AS sxx,
         CAST(sum(CAST(round(y * y, 9) AS DECIMAL(28,12))) AS DOUBLE) AS syy
  FROM pts
)
SELECT CAST(m AS BIGINT) AS n_points,
       round((m * sxy - sx * sy) / (m * sxx - sx * sx), 6) AS beta,
       round((sy - (m * sxy - sx * sy) / (m * sxx - sx * sx) * sx) / m, 6)
         AS log_k,
       round((m * sxy - sx * sy) * (m * sxy - sx * sy)
             / ((m * sxx - sx * sx) * (m * syy - sy * sy)), 6) AS r2
FROM acc
""",
    tags=("alignment", "regression", "prefix"),
)
def heaps_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law fit V(n) = K n^beta of vocabulary growth: stream the
    corpus in doc_id order, track cumulative tokens n and cumulative
    DISTINCT vocabulary V (each term counted at its first-occurrence
    document), and fit the log-log OLS line — the planning curve that
    answers "how much new vocabulary does the next 10x of corpus buy".

    Scale shape: first occurrences are one hash aggregate on the term
    domain (min doc_id per term — no sort); both cumulative series come
    out of ONE distributed prefix pass over the per-doc frame; the OLS
    moments are 9-rounded doubles summed in DECIMAL(28,12) (the exact-
    moment regression discipline of brand_price_regression), so the
    closed-form slope/intercept/r2 are bit-identical across engines."""
    from atlassian_confluence_data_pipeline_spark.plans._cache import (
        doc_word_positions,
    )

    # both the first-occurrence table and the per-doc token counts ride
    # the session-staged token stream — the two regex explodes this
    # query re-ran per build (every doc yields >= 1 token, so the
    # per-doc count == size(words) and the left join covers all docs)
    exploded = doc_word_positions(spark, sf_dir).select("doc_id", "word")
    newt = (
        exploded.groupBy("word")
        .agg(F.min("doc_id").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("newt"))
    )
    perdoc = (
        exploded.groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("toks"))
        .join(newt, "doc_id", "left")
        .select(
            "doc_id", "toks", F.coalesce("newt", F.lit(0)).alias("newt")
        )
    )
    cum = distributed_prefix_rank(
        perdoc, ["doc_id"], sums={"n": "toks", "v": "newt"}
    )
    pts = cum.filter((F.col("n") > 0) & (F.col("v") > 0)).select(
        F.round(F.log(F.col("n").cast("double")), 9).alias("x"),
        F.round(F.log(F.col("v").cast("double")), 9).alias("y"),
    )

    def dsum(c):
        return F.sum(c.cast(_WDEC)).cast("double")

    acc = pts.agg(
        F.count(F.lit(1)).cast("double").alias("m"),
        dsum(F.col("x")).alias("sx"),
        dsum(F.col("y")).alias("sy"),
        dsum(F.round(F.col("x") * F.col("y"), 9)).alias("sxy"),
        dsum(F.round(F.col("x") * F.col("x"), 9)).alias("sxx"),
        dsum(F.round(F.col("y") * F.col("y"), 9)).alias("syy"),
    )
    m, sx, sy = F.col("m"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    beta = (m * sxy - sx * sy) / (m * sxx - sx * sx)
    return acc.select(
        m.cast("bigint").alias("n_points"),
        F.round(beta, 6).alias("beta"),
        F.round((sy - (m * sxy - sx * sy) / (m * sxx - sx * sx) * sx) / m, 6)
        .alias("log_k"),
        F.round(
            (m * sxy - sx * sy)
            * (m * sxy - sx * sy)
            / ((m * sxx - sx * sx) * (m * syy - sy * sy)),
            6,
        ).alias("r2"),
    )


@query(
    "neyman_allocation",
    oracle=f"""
WITH m AS (
  SELECT source, count(*) AS n,
         CAST(sum(n_chars) AS BIGINT) AS s,
         CAST(sum(n_chars * n_chars) AS BIGINT) AS q
  FROM documents GROUP BY 1
), st AS (
  SELECT source, n,
         sqrt((q - CAST(s AS DOUBLE) * s / n) / (n - 1)) AS sd
  FROM m
), wts AS (
  SELECT source, n, sd,
         round(CAST(n AS DOUBLE) * sd, 6) AS nhsh
  FROM st
), den AS (
  SELECT CAST(sum(CAST(nhsh AS DECIMAL(28,12))) AS DOUBLE) AS d FROM wts
)
SELECT source, CAST(n AS BIGINT) AS n_docs,
       round(sd, 6) AS std_chars,
       round(nhsh / den.d, 6) AS alloc_share,
       CAST(round({_SAMPLE_TOTAL} * nhsh / den.d) AS BIGINT) AS n_alloc
FROM wts CROSS JOIN den
""",
    tags=("alignment", "sampling", "stats"),
)
def neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal stratified sample allocation: a budget of
    {_SAMPLE_TOTAL} draws split across sources proportional to
    N_h * S_h (stratum size x stratum std of document length) — the
    allocation that minimizes the variance of the stratified mean.

    Scale shape: one hash aggregate to the source domain with EXACT
    integer moments (n_chars and its square are bigints — no float sum
    crosses the shuffle), the per-stratum std in closed form on those
    exact inputs, and the normalizing constant as a 1-row eager
    aggregate of 6-rounded DECIMAL terms (order-independent even though
    the stratum count is tiny)."""
    docs = load_table(spark, sf_dir, "documents")
    m = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_chars").cast("bigint").alias("s"),
        F.sum(F.col("n_chars") * F.col("n_chars")).cast("bigint").alias("q"),
    )
    sd = F.sqrt(
        (F.col("q") - F.col("s").cast("double") * F.col("s") / F.col("n"))
        / (F.col("n") - 1)
    )
    wts = m.select(
        "source",
        "n",
        sd.alias("sd"),
        F.round(F.col("n").cast("double") * sd, 6).alias("nhsh"),
    ).localCheckpoint(eager=True)
    den = (
        wts.agg(F.sum(F.col("nhsh").cast(_WDEC)).cast("double").alias("d"))
        .first()["d"]
    )
    return wts.select(
        "source",
        F.col("n").cast("bigint").alias("n_docs"),
        F.round("sd", 6).alias("std_chars"),
        F.round(F.col("nhsh") / F.lit(den), 6).alias("alloc_share"),
        F.round(F.lit(_SAMPLE_TOTAL) * F.col("nhsh") / F.lit(den))
        .cast("bigint")
        .alias("n_alloc"),
    )


def _ipf_sql() -> str:
    """Two full IPF rounds (row, col, row, col) as unrolled CTEs; every
    margin sum aggregates 9-rounded weights in DECIMAL so replay order
    can't move it."""
    row_scale = (
        "round(CAST({w} AS DOUBLE) * t_row / "
        "CAST(sum(CAST({w} AS DECIMAL(28,12))) OVER (PARTITION BY source)"
        " AS DOUBLE), 9)"
    )
    col_scale = (
        "round(CAST({w} AS DOUBLE) * t_col / "
        "CAST(sum(CAST({w} AS DECIMAL(28,12))) OVER (PARTITION BY lang)"
        " AS DOUBLE), 9)"
    )
    return f"""
WITH cells AS (
  SELECT source, lang, CAST(count(*) AS BIGINT) AS w0
  FROM documents GROUP BY 1, 2
), tgt AS (
  SELECT source, lang, w0,
         (SELECT CAST(count(*) AS DOUBLE)
                 / count(DISTINCT source) FROM documents) AS t_row,
         CAST((SELECT count(*) FROM documents d2
               WHERE d2.lang = cells.lang) AS DOUBLE) AS t_col
  FROM cells
), i1 AS (SELECT *, {row_scale.format(w='w0')} AS w1 FROM tgt),
i2 AS (SELECT *, {col_scale.format(w='w1')} AS w2 FROM i1),
i3 AS (SELECT *, {row_scale.format(w='w2')} AS w3 FROM i2),
i4 AS (SELECT *, {col_scale.format(w='w3')} AS w4 FROM i3)
SELECT source, lang, w0 AS n_docs,
       round(w4, 6) AS weight,
       round(abs(CAST(sum(CAST(w4 AS DECIMAL(28,12)))
                      OVER (PARTITION BY source) AS DOUBLE)
                 / t_row - 1), 6) AS row_rel_err
FROM i4
"""


@query(
    "ipf_raking_mixture",
    oracle=_ipf_sql(),
    tags=("alignment", "mixture", "iterative"),
)
def ipf_raking_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative proportional fitting (raking) of the source x language
    cell counts to target margins: UNIFORM source shares (balance the
    mixture across sources) while PRESERVING the observed language
    margin — two full IPF rounds (row-scale, col-scale, twice), the
    classic survey-weighting estimator, here the training-mixture
    balancer ("equal data per source, don't distort languages").
    row_rel_err reports how far the source margin still is after round
    two.

    Scale shape: the cell domain is |sources| x |languages| — one hash
    aggregate from the corpus, then four PARTITIONED window scalings
    over that tiny frame (never a corpus-sized shuffle, never a global
    window). Each scaling rounds to 9 decimals and every margin sum
    aggregates those rounded weights in DECIMAL(28,12), so the whole
    iteration is deterministic and engine-exact despite being float
    arithmetic at heart."""
    docs = load_table(spark, sf_dir, "documents")
    cells = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("w0")
    )
    head = docs.agg(
        F.count(F.lit(1)).alias("total"),
        F.countDistinct("source").alias("n_src"),
    ).first()
    t_row = float(head["total"]) / head["n_src"]
    lang_tot = docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("double").alias("t_col")
    )
    g = cells.join(F.broadcast(lang_tot), "lang").withColumn(
        "t_row", F.lit(t_row)
    )

    def rescale(df: DataFrame, w: str, out: str, by: str, tgt: str):
        wsum = (
            F.sum(F.col(w).cast(_WDEC))
            .over(Window.partitionBy(by))
            .cast("double")
        )
        return df.withColumn(
            out,
            F.round(F.col(w).cast("double") * F.col(tgt) / wsum, 9),
        )

    g = rescale(g, "w0", "w1", "source", "t_row")
    g = rescale(g, "w1", "w2", "lang", "t_col")
    g = rescale(g, "w2", "w3", "source", "t_row")
    g = rescale(g, "w3", "w4", "lang", "t_col")
    row_sum = (
        F.sum(F.col("w4").cast(_WDEC))
        .over(Window.partitionBy("source"))
        .cast("double")
    )
    return g.select(
        "source",
        "lang",
        F.col("w0").alias("n_docs"),
        F.round("w4", 6).alias("weight"),
        F.round(F.abs(row_sum / F.col("t_row") - 1), 6).alias("row_rel_err"),
    )
