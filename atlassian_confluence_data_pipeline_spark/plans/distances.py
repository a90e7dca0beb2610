"""Distribution-distance wave (49): exact 1-D Wasserstein distance
between sources and Cramér's V association.

Two distances that complete the comparison toolbox: KS (wave 28) gives
the sup-norm between distributions, the Wasserstein-1 distance gives
the L1 transport cost (how far mass must MOVE — the quantity domain-
shift monitoring actually wants, in the metric's own units), and
Cramér's V turns the chi-square contingency into a [0,1] association
strength (the effect size mutual information lacks a scale for)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.operators.windows import (
    distributed_prefix_rank,
)
from atlassian_confluence_data_pipeline_spark.plans.registry import query

#: the two sources compared by the Wasserstein readout
_SRC_A = "src0"
_SRC_B = "src1"


@query(
    "wasserstein_length_sources",
    oracle=f"""
WITH d AS (
  SELECT source, CAST(n_chars AS BIGINT) AS v FROM documents
  WHERE source IN ('{_SRC_A}', '{_SRC_B}')
), byv AS (
  SELECT v,
         CAST(sum(CASE WHEN source = '{_SRC_A}' THEN 1 ELSE 0 END)
              AS BIGINT) AS ca,
         CAST(sum(CASE WHEN source = '{_SRC_B}' THEN 1 ELSE 0 END)
              AS BIGINT) AS cb
  FROM d GROUP BY 1
), tot AS (
  SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb
  FROM byv
), cum AS (
  SELECT v,
         sum(ca) OVER w AS cum_a, sum(cb) OVER w AS cum_b,
         lead(v) OVER (ORDER BY v) AS v_next
  FROM byv WINDOW w AS (ORDER BY v ROWS UNBOUNDED PRECEDING)
), seg AS (
  SELECT CAST(round(abs(CAST(cum_a AS DOUBLE) / tot.na
                        - CAST(cum_b AS DOUBLE) / tot.nb)
                    * (v_next - v), 9) AS DECIMAL(28,12)) AS area
  FROM cum CROSS JOIN tot WHERE v_next IS NOT NULL
)
SELECT tot.na AS n_a, tot.nb AS n_b,
       round(CAST(sum(seg.area) AS DOUBLE), 6) AS wasserstein_chars
FROM seg CROSS JOIN tot
GROUP BY 1, 2
""",
    tags=("distances", "distribution", "prefix"),
)
def wasserstein_length_sources(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact 1-D Wasserstein (earth-mover) distance between two
    sources' document-length distributions: W1 = integral |F_a - F_b|
    over the value axis, evaluated exactly as sum over distinct values
    of |CDF gap| x (distance to the next value) — the transport cost in
    CHARACTERS, the drift units a curation SLO can actually be written
    in (KS tells you the worst gap; W1 tells you how much work it is to
    fix).

    Scale shape: the KS machinery extended by one column — one hash
    aggregate to the distinct-value domain, ONE distributed prefix pass
    for both CDFs, the next-value gap via the rank+1 equi-join pattern,
    and a 9-rounded DECIMAL area sum."""
    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("source").isin(_SRC_A, _SRC_B))
        .select("source", F.col("n_chars").cast("bigint").alias("v"))
    )
    byv = d.groupBy("v").agg(
        F.sum(F.when(F.col("source") == _SRC_A, 1).otherwise(0))
        .cast("bigint")
        .alias("ca"),
        F.sum(F.when(F.col("source") == _SRC_B, 1).otherwise(0))
        .cast("bigint")
        .alias("cb"),
    ).localCheckpoint(eager=True)
    tot = byv.agg(
        F.sum("ca").cast("bigint").alias("na"),
        F.sum("cb").cast("bigint").alias("nb"),
    ).first()
    na, nb = tot["na"], tot["nb"]
    cum = distributed_prefix_rank(
        byv, ["v"], sums={"cum_a": "ca", "cum_b": "cb"}, rank_col="rk"
    ).localCheckpoint(eager=True)
    nxt = cum.select((F.col("rk") - 1).alias("rk"), F.col("v").alias("v_next"))
    seg = cum.join(nxt, "rk").select(
        F.round(
            F.abs(
                F.col("cum_a").cast("double") / na
                - F.col("cum_b").cast("double") / nb
            )
            * (F.col("v_next") - F.col("v")),
            9,
        )
        .cast("decimal(28,12)")
        .alias("area")
    )
    return seg.agg(
        F.lit(na).cast("bigint").alias("n_a"),
        F.lit(nb).cast("bigint").alias("n_b"),
        F.round(F.sum("area").cast("double"), 6).alias(
            "wasserstein_chars"
        ),
    )


@query(
    "cramers_v_source_lang",
    oracle="""
WITH cell AS (
  SELECT source, lang, CAST(count(*) AS BIGINT) AS o
  FROM documents GROUP BY 1, 2
), rm AS (SELECT source, CAST(sum(o) AS BIGINT) AS r FROM cell GROUP BY 1),
cm AS (SELECT lang, CAST(sum(o) AS BIGINT) AS c FROM cell GROUP BY 1),
tot AS (SELECT CAST(sum(o) AS BIGINT) AS n,
               CAST(count(DISTINCT source) AS BIGINT) AS nr,
               CAST(count(DISTINCT lang) AS BIGINT) AS nc
        FROM cell),
terms AS (
  SELECT CAST(round(
           (cell.o - CAST(rm.r AS DOUBLE) * cm.c / tot.n)
           * (cell.o - CAST(rm.r AS DOUBLE) * cm.c / tot.n)
           / (CAST(rm.r AS DOUBLE) * cm.c / tot.n), 9)
         AS DECIMAL(28,12)) AS t
  FROM cell JOIN rm USING (source) JOIN cm USING (lang) CROSS JOIN tot
)
SELECT tot.n AS n_rows, tot.nr AS n_sources, tot.nc AS n_langs,
       round(CAST(sum(terms.t) AS DOUBLE), 6) AS chi2,
       round(sqrt(CAST(sum(terms.t) AS DOUBLE)
                  / (tot.n * (least(tot.nr, tot.nc) - 1))), 6)
         AS cramers_v
FROM terms CROSS JOIN tot
GROUP BY 1, 2, 3
""",
    tags=("distances", "association", "stats"),
)
def cramers_v_source_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V between source and language: the chi-square
    contingency statistic normalized to [0, 1] — the effect-size
    companion to categorical_mutual_information (MI has no absolute
    scale; V = 0.1 is weak and V = 0.5 is strong in ANY table) telling
    you whether language mix is a property of the source or of the
    corpus.

    Scale shape: one (source, lang) cell aggregate, two margin rollups,
    chi-square terms over the bounded cell grid with 9-rounded DECIMAL
    sums, closed-form finish. NB the statistic sums OBSERVED cells only
    (identically on both engines); zero cells' expected mass is omitted
    — a slight understatement when the grid is sparse, exact when it is
    dense (the fixture's is, which the invariant test pins at the
    driver scale)."""
    docs = load_table(spark, sf_dir, "documents")
    cell = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("o")
    ).localCheckpoint(eager=True)
    rm = cell.groupBy("source").agg(F.sum("o").cast("bigint").alias("r"))
    cm = cell.groupBy("lang").agg(F.sum("o").cast("bigint").alias("c"))
    head = cell.agg(
        F.sum("o").cast("bigint").alias("n"),
        F.countDistinct("source").cast("bigint").alias("nr"),
        F.countDistinct("lang").cast("bigint").alias("nc"),
    ).first()
    n, nr, nc = head["n"], head["nr"], head["nc"]
    e = F.col("r").cast("double") * F.col("c") / F.lit(n)
    terms = (
        cell.join(rm, "source")
        .join(cm, "lang")
        .select(
            F.round(
                (F.col("o") - e) * (F.col("o") - e) / e, 9
            )
            .cast("decimal(28,12)")
            .alias("t")
        )
    )
    chi2 = F.sum("t").cast("double")
    return terms.agg(
        F.lit(n).cast("bigint").alias("n_rows"),
        F.lit(nr).cast("bigint").alias("n_sources"),
        F.lit(nc).cast("bigint").alias("n_langs"),
        F.round(chi2, 6).alias("chi2"),
        F.round(
            F.sqrt(chi2 / (n * (min(nr, nc) - 1))), 6
        ).alias("cramers_v"),
    )
