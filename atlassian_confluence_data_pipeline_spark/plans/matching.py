"""Stream-matching & itemset wave (39): FIFO quantity matching via
cumulative-interval overlap, and frequent brand triples.

Two classic "SQL-hard" operations in set-based form: FIFO matching
(allocate returned quantity against shipped quantity in ship order —
the inventory/lot-accounting primitive) rendered as an interval-overlap
join of per-part cumulative-quantity ranges (no loops, no per-row
state), and 3-itemset mining (the step beyond market_basket_lift's
pairs) as an ordered triple self-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.plans.registry import query

_TRIPLE_TOPK = 20


@query(
    "fifo_quantity_matching",
    oracle="""
WITH li AS (
  SELECT l_partkey, l_returnflag,
         CAST(round(l_quantity * 100) AS BIGINT) AS q,
         l_shipdate, l_orderkey, l_linenumber
  FROM lineitem WHERE l_returnflag IN ('N', 'R')
), buys AS (
  SELECT l_partkey, q,
         coalesce(sum(q) OVER w, 0) AS lo, coalesce(sum(q) OVER w, 0) + q AS hi
  FROM li WHERE l_returnflag = 'N'
  WINDOW w AS (PARTITION BY l_partkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
), sells AS (
  SELECT l_partkey, q,
         coalesce(sum(q) OVER w, 0) AS lo, coalesce(sum(q) OVER w, 0) + q AS hi
  FROM li WHERE l_returnflag = 'R'
  WINDOW w AS (PARTITION BY l_partkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
), seg AS (
  SELECT b.l_partkey,
         least(b.hi, s.hi) - greatest(b.lo, s.lo) AS overlap
  FROM buys b JOIN sells s
    ON b.l_partkey = s.l_partkey AND b.lo < s.hi AND s.lo < b.hi
), bt AS (
  SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_buys,
         CAST(sum(q) AS BIGINT) AS q_buy
  FROM buys GROUP BY 1
), st AS (
  SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_sells,
         CAST(sum(q) AS BIGINT) AS q_sell
  FROM sells GROUP BY 1
)
SELECT seg.l_partkey, bt.n_buys, st.n_sells,
       CAST(count(*) AS BIGINT) AS n_match_segments,
       round(CAST(sum(CAST(seg.overlap AS DECIMAL(38,0))) AS DOUBLE)
             / 100, 2) AS matched_qty
FROM seg JOIN bt USING (l_partkey) JOIN st USING (l_partkey)
GROUP BY 1, 2, 3
""",
    tags=("matching", "interval", "window"),
)
def fifo_quantity_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIFO matching of returned quantity (R lines) against shipped
    quantity (N lines) per part, in ship-date order — the lot-
    accounting allocation. The trick that makes it set-based: each
    line's quantity becomes a HALF-OPEN INTERVAL on its flag's
    cumulative-quantity axis; a buy matches a sell exactly where their
    intervals overlap, so FIFO allocation is ONE interval-overlap join
    (matched quantity per part = total overlap = min(shipped,
    returned) — conserved by construction, which the invariant test
    pins).

    Scale shape: the cumulative axes are part-KEYED windows (bounded
    per-part partitions, never global); the overlap join is an
    equi-join on partkey with a range residual — per-part blocks, no
    cartesian. Quantities are exact integer cents end to end."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("N", "R")
    ).select(
        "l_partkey",
        "l_returnflag",
        F.round(F.col("l_quantity") * 100).cast("bigint").alias("q"),
        "l_shipdate",
        "l_orderkey",
        "l_linenumber",
    )
    # ONE (part, flag)-keyed window pass builds BOTH cumulative axes
    # (round 12): partitioning by (l_partkey, l_returnflag) gives each
    # flag its own partitions with the identical within-partition
    # order, so one scan + one exchange + one window sort + one
    # checkpoint replaces the former per-side pair of each.
    w = (
        Window.partitionBy("l_partkey", "l_returnflag")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    lo = F.coalesce(F.sum("q").over(w), F.lit(0))
    both = li.select(
        "l_partkey",
        "l_returnflag",
        "q",
        lo.alias("lo"),
        (lo + F.col("q")).alias("hi"),
    ).localCheckpoint(eager=True)

    def axis(flag: str) -> DataFrame:
        return both.filter(F.col("l_returnflag") == flag).select(
            "l_partkey", "q", "lo", "hi"
        )

    buys = axis("N")
    sells = axis("R")
    seg = buys.alias("b").join(
        sells.alias("s"),
        (F.col("b.l_partkey") == F.col("s.l_partkey"))
        & (F.col("b.lo") < F.col("s.hi"))
        & (F.col("s.lo") < F.col("b.hi")),
    ).select(
        F.col("b.l_partkey").alias("l_partkey"),
        (
            F.least(F.col("b.hi"), F.col("s.hi"))
            - F.greatest(F.col("b.lo"), F.col("s.lo"))
        ).alias("overlap"),
    )
    bt = buys.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_buys"),
        F.sum("q").cast("bigint").alias("q_buy"),
    )
    st = sells.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sells"),
        F.sum("q").cast("bigint").alias("q_sell"),
    )
    return (
        seg.join(bt, "l_partkey")
        .join(st, "l_partkey")
        .groupBy("l_partkey", "n_buys", "n_sells")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_match_segments"),
            F.round(
                F.sum(F.col("overlap").cast("decimal(38,0)")).cast("double")
                / 100,
                2,
            ).alias("matched_qty"),
        )
    )


@query(
    "frequent_brand_triples",
    oracle=f"""
WITH ob AS (
  SELECT DISTINCT l_orderkey, p_brand
  FROM lineitem JOIN part ON p_partkey = l_partkey
)
SELECT a.p_brand AS brand_1, b.p_brand AS brand_2, c.p_brand AS brand_3,
       CAST(count(*) AS BIGINT) AS n_orders
FROM ob a
JOIN ob b ON b.l_orderkey = a.l_orderkey AND b.p_brand > a.p_brand
JOIN ob c ON c.l_orderkey = a.l_orderkey AND c.p_brand > b.p_brand
GROUP BY 1, 2, 3
ORDER BY n_orders DESC, brand_1, brand_2, brand_3
LIMIT {_TRIPLE_TOPK}
""",
    tags=("matching", "itemset", "topk"),
)
def frequent_brand_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent 3-itemsets of brands co-purchased in one order — the
    step beyond market_basket_lift's pairs, mined as an ordered triple
    self-join (brand_1 < brand_2 < brand_3 canonicalizes each set to
    exactly one row, the Apriori candidate construction in join form).

    Scale shape (round 12): ONE order-keyed hash aggregate both dedups
    (order, brand) and assembles each order's brand set (collect_set);
    the ordered-triple candidates are then an IN-PLACE per-basket
    combination expression (z > y > x over the set — fan-out bounded by
    basket size: TPC-H orders hold <= 7 lines, so <= 35 triples), which
    replaces the former distinct + two order-keyed self-joins, so
    corpus rows cross exactly one exchange; the report is a TakeOrdered
    top-{_TRIPLE_TOPK}."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    baskets = (
        li.join(
            F.broadcast(
                p.select(F.col("p_partkey").alias("l_partkey"), "p_brand")
            ),
            "l_partkey",
        )
        .groupBy("l_orderkey")
        .agg(F.collect_set("p_brand").alias("brands"))
        .select("brands")
    )
    triples = F.flatten(
        F.transform(
            F.col("brands"),
            lambda x: F.flatten(
                F.transform(
                    F.filter(F.col("brands"), lambda y: y > x),
                    lambda y: F.transform(
                        F.filter(F.col("brands"), lambda z: z > y),
                        lambda z: F.struct(
                            x.alias("brand_1"),
                            y.alias("brand_2"),
                            z.alias("brand_3"),
                        ),
                    ),
                )
            ),
        )
    )
    return (
        baskets.select(F.explode(triples).alias("t"))
        .select("t.brand_1", "t.brand_2", "t.brand_3")
        .groupBy("brand_1", "brand_2", "brand_3")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
        .orderBy(
            F.col("n_orders").desc(), "brand_1", "brand_2", "brand_3"
        )
        .limit(_TRIPLE_TOPK)
    )
