"""Pricing-economics wave (34): Herfindahl market concentration,
log-log price elasticity, price dispersion, and promotion uplift via
difference-in-differences.

The revenue-analytics layer over the lineitem/part/customer star: who
concentrates each market (HHI — the antitrust screen), how demand
responds to price (elasticity from the cross-part log-log fit), how
scattered prices are within a category (CV), and whether discounts
actually lift net revenue once secular drift is removed (DiD — the
causal-inference 2x2 every promo analysis starts from). Exactness as
everywhere: money is exact DECIMAL cents, shares and logs are
identical float shapes on exact inputs, and every sum of float terms
is 9-rounded and DECIMAL-accumulated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.plans.registry import query

#: promotion definition and DiD period split
_PROMO_DISCOUNT = 0.05
_SPLIT_DATE = "1998-07-01"

_DEC = "decimal(18,2)"


@query(
    "hhi_brand_concentration",
    oracle="""
WITH rev AS (
  SELECT p_type, p_brand,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT)
           AS cents
  FROM lineitem JOIN part ON p_partkey = l_partkey
  GROUP BY 1, 2
), tot AS (
  SELECT p_type, CAST(sum(cents) AS BIGINT) AS t,
         CAST(count(*) AS BIGINT) AS n_brands
  FROM rev GROUP BY 1
)
SELECT rev.p_type,
       tot.n_brands,
       round(CAST(tot.t AS DOUBLE) / 100, 2) AS total_revenue,
       round(CAST(sum(CAST(round(
           (CAST(rev.cents AS DOUBLE) / tot.t)
           * (CAST(rev.cents AS DOUBLE) / tot.t) * 10000, 9)
         AS DECIMAL(28,12))) AS DOUBLE), 2) AS hhi
FROM rev JOIN tot USING (p_type)
GROUP BY 1, 2, 3
""",
    tags=("economics", "concentration", "stats"),
)
def hhi_brand_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman index of brand revenue concentration within
    each part type — the standard market-concentration screen (10000 =
    monopoly; under ~1500 = unconcentrated). Shares are doubles of
    exact integer cents; the share-squared terms are 9-rounded and
    DECIMAL-summed per type.

    Scale shape: one fact-scan hash aggregate to the (type, brand)
    domain (part-dimension join broadcast), one type-domain rollup, one
    bounded-domain HHI aggregate — corpus-sized work is a single
    scan."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev = (
        li.join(
            F.broadcast(
                p.select(
                    F.col("p_partkey").alias("l_partkey"),
                    "p_type",
                    "p_brand",
                )
            ),
            "l_partkey",
        )
        .groupBy("p_type", "p_brand")
        .agg(
            (F.sum(F.col("l_extendedprice").cast(_DEC)) * 100)
            .cast("bigint")
            .alias("cents")
        )
        .localCheckpoint(eager=True)
    )
    tot = rev.groupBy("p_type").agg(
        F.sum("cents").cast("bigint").alias("t"),
        F.count(F.lit(1)).cast("bigint").alias("n_brands"),
    )
    share = F.col("cents").cast("double") / F.col("t")
    return (
        rev.join(F.broadcast(tot), "p_type")
        .groupBy(
            "p_type",
            "n_brands",
            F.round(F.col("t").cast("double") / 100, 2).alias(
                "total_revenue"
            ),
        )
        .agg(
            F.round(
                F.sum(
                    F.round(share * share * 10000, 9).cast("decimal(28,12)")
                ).cast("double"),
                2,
            ).alias("hhi")
        )
    )


@query(
    "price_elasticity_loglog",
    oracle="""
WITH d AS (
  SELECT p_brand,
         CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT)
           AS qty_c
  FROM lineitem JOIN part ON p_partkey = l_partkey
  GROUP BY 1, p_partkey, 2
), pts AS (
  SELECT p_brand,
         round(ln(CAST(price_cents AS DOUBLE)), 9) AS x,
         round(ln(CAST(qty_c AS DOUBLE)), 9) AS y
  FROM d WHERE qty_c > 0
), acc AS (
  SELECT p_brand, CAST(count(*) AS DOUBLE) AS m,
         CAST(sum(CAST(x AS DECIMAL(28,12))) AS DOUBLE) AS sx,
         CAST(sum(CAST(y AS DECIMAL(28,12))) AS DOUBLE) AS sy,
         CAST(sum(CAST(round(x * y, 9) AS DECIMAL(28,12))) AS DOUBLE) AS sxy,
         CAST(sum(CAST(round(x * x, 9) AS DECIMAL(28,12))) AS DOUBLE) AS sxx,
         CAST(sum(CAST(round(y * y, 9) AS DECIMAL(28,12))) AS DOUBLE) AS syy
  FROM pts GROUP BY 1
)
SELECT p_brand, CAST(m AS BIGINT) AS n_parts,
       round((m * sxy - sx * sy) / (m * sxx - sx * sx), 6) AS elasticity,
       round((m * sxy - sx * sy) * (m * sxy - sx * sy)
             / ((m * sxx - sx * sx) * (m * syy - sy * sy)), 6) AS r2
FROM acc
""",
    tags=("economics", "regression", "stats"),
)
def price_elasticity_loglog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand price elasticity of demand: OLS slope of ln(quantity
    sold) on ln(retail price) across the brand's parts — the log-log
    specification whose slope IS the elasticity (-1 = unit-elastic;
    the fixture couples quantity to price, so brand slopes come out
    coherently negative, with r2 as the fit-quality check).

    Scale shape: demand aggregates per (brand, part) in one fact scan
    (broadcast part dim); the regression moments are the engine's
    exact-moment OLS discipline (9-rounded logs of exact integers,
    DECIMAL sums) grouped by brand — a second aggregate over the
    part-domain frame."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    d = (
        li.join(
            F.broadcast(
                p.select(
                    F.col("p_partkey").alias("l_partkey"),
                    "p_brand",
                    "p_retailprice",
                )
            ),
            "l_partkey",
        )
        .groupBy(
            "p_brand",
            "l_partkey",
            F.round(F.col("p_retailprice") * 100)
            .cast("bigint")
            .alias("price_cents"),
        )
        .agg(
            (F.sum(F.col("l_quantity").cast(_DEC)) * 100)
            .cast("bigint")
            .alias("qty_c")
        )
    )
    pts = d.filter(F.col("qty_c") > 0).select(
        "p_brand",
        F.round(F.log(F.col("price_cents").cast("double")), 9).alias("x"),
        F.round(F.log(F.col("qty_c").cast("double")), 9).alias("y"),
    )

    def dsum(c):
        return F.sum(c.cast("decimal(28,12)")).cast("double")

    acc = pts.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("double").alias("m"),
        dsum(F.col("x")).alias("sx"),
        dsum(F.col("y")).alias("sy"),
        dsum(F.round(F.col("x") * F.col("y"), 9)).alias("sxy"),
        dsum(F.round(F.col("x") * F.col("x"), 9)).alias("sxx"),
        dsum(F.round(F.col("y") * F.col("y"), 9)).alias("syy"),
    )
    m, sx, sy = F.col("m"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    return acc.select(
        "p_brand",
        m.cast("bigint").alias("n_parts"),
        F.round((m * sxy - sx * sy) / (m * sxx - sx * sx), 6).alias(
            "elasticity"
        ),
        F.round(
            (m * sxy - sx * sy)
            * (m * sxy - sx * sy)
            / ((m * sxx - sx * sx) * (m * syy - sy * sy)),
            6,
        ).alias("r2"),
    )


@query(
    "price_dispersion_by_type",
    oracle="""
WITH c AS (
  SELECT p_type, CAST(round(p_retailprice * 100) AS BIGINT) AS cents
  FROM part
), acc AS (
  SELECT p_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(cents AS DECIMAL(38,0))) AS DOUBLE) AS s1,
         CAST(sum(CAST(cents * cents AS DECIMAL(38,0))) AS DOUBLE) AS s2
  FROM c GROUP BY 1
)
SELECT p_type, n,
       round(s1 / n / 100, 2) AS mean_price,
       round(sqrt((s2 - s1 * s1 / n) / (n - 1)) / 100, 4) AS std_price,
       round(sqrt((s2 - s1 * s1 / n) / (n - 1)) / (s1 / n), 6)
         AS coeff_variation
FROM acc
""",
    tags=("economics", "dispersion", "stats"),
)
def price_dispersion_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price dispersion per part type: mean, std, and the coefficient
    of variation of retail prices — the scale-free dispersion measure
    that compares categories with different price levels (the 'law of
    one price' violation readout). Exact integer-cent moments, one
    dimension-table aggregate."""
    p = load_table(spark, sf_dir, "part")
    c = p.select(
        "p_type",
        F.round(F.col("p_retailprice") * 100).cast("bigint").alias("cents"),
    )
    acc = c.groupBy("p_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("cents").cast("decimal(38,0)"))
        .cast("double")
        .alias("s1"),
        F.sum((F.col("cents") * F.col("cents")).cast("decimal(38,0)"))
        .cast("double")
        .alias("s2"),
    )
    sd = F.sqrt(
        (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
        / (F.col("n") - 1)
    )
    return acc.select(
        "p_type",
        "n",
        F.round(F.col("s1") / F.col("n") / 100, 2).alias("mean_price"),
        F.round(sd / 100, 4).alias("std_price"),
        F.round(sd / (F.col("s1") / F.col("n")), 6).alias(
            "coeff_variation"
        ),
    )


@query(
    "promo_uplift_did",
    oracle=f"""
WITH cells AS (
  SELECT CASE WHEN l_discount >= {_PROMO_DISCOUNT} THEN 1 ELSE 0 END
           AS promo,
         CASE WHEN CAST(l_shipdate AS DATE) >= DATE '{_SPLIT_DATE}'
              THEN 1 ELSE 0 END AS late,
         CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
           AS net_c
  FROM lineitem
), m AS (
  SELECT promo, late, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(net_c AS DECIMAL(38,0))) AS DOUBLE) / count(*)
           AS mean_c
  FROM cells GROUP BY 1, 2
), g AS (
  SELECT
    (SELECT mean_c FROM m WHERE promo = 1 AND late = 1) AS p1,
    (SELECT mean_c FROM m WHERE promo = 1 AND late = 0) AS p0,
    (SELECT mean_c FROM m WHERE promo = 0 AND late = 1) AS c1,
    (SELECT mean_c FROM m WHERE promo = 0 AND late = 0) AS c0,
    (SELECT sum(n) FROM m WHERE promo = 1) AS n_promo,
    (SELECT sum(n) FROM m WHERE promo = 0) AS n_control
)
SELECT CAST(n_promo AS BIGINT) AS n_promo,
       CAST(n_control AS BIGINT) AS n_control,
       round(p0 / 100, 4) AS promo_early,
       round(p1 / 100, 4) AS promo_late,
       round(c0 / 100, 4) AS control_early,
       round(c1 / 100, 4) AS control_late,
       round(((p1 - p0) - (c1 - c0)) / 100, 4) AS did_uplift
FROM g
""",
    tags=("economics", "causal", "did"),
)
def promo_uplift_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences estimate of the discount program's
    effect on mean net line revenue: (promo_late - promo_early) -
    (control_late - control_early) — the 2x2 that removes both the
    permanent promo/control level gap and the secular time drift,
    leaving the program effect (under parallel trends; the fixture is
    null-by-construction, so this doubles as an A/A check).

    Scale shape: ONE fact scan into a 4-cell hash aggregate with exact
    integer-cent DECIMAL sums; the DiD arithmetic is a closed form on 4
    scalars."""
    li = load_table(spark, sf_dir, "lineitem")
    cells = li.select(
        F.when(F.col("l_discount") >= _PROMO_DISCOUNT, 1)
        .otherwise(0)
        .alias("promo"),
        F.when(
            F.to_date("l_shipdate") >= F.lit(_SPLIT_DATE), 1
        )
        .otherwise(0)
        .alias("late"),
        F.round(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
        )
        .cast("bigint")
        .alias("net_c"),
    )
    m = (
        cells.groupBy("promo", "late")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            (
                F.sum(F.col("net_c").cast("decimal(38,0)")).cast("double")
                / F.count(F.lit(1))
            ).alias("mean_c"),
        )
        .collect()
    )
    cell = {(r["promo"], r["late"]): r for r in m}
    p1, p0 = cell[(1, 1)]["mean_c"], cell[(1, 0)]["mean_c"]
    c1, c0 = cell[(0, 1)]["mean_c"], cell[(0, 0)]["mean_c"]
    n_promo = cell[(1, 1)]["n"] + cell[(1, 0)]["n"]
    n_control = cell[(0, 1)]["n"] + cell[(0, 0)]["n"]
    return spark.range(1).select(
        F.lit(n_promo).cast("bigint").alias("n_promo"),
        F.lit(n_control).cast("bigint").alias("n_control"),
        F.round(F.lit(p0) / 100, 4).alias("promo_early"),
        F.round(F.lit(p1) / 100, 4).alias("promo_late"),
        F.round(F.lit(c0) / 100, 4).alias("control_early"),
        F.round(F.lit(c1) / 100, 4).alias("control_late"),
        F.round((F.lit(p1) - F.lit(p0) - (F.lit(c1) - F.lit(c0))) / 100, 4)
        .alias("did_uplift"),
    )
