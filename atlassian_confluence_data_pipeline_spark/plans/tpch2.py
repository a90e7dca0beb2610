"""Second TPC-H-shaped wave: the multi-way-join and correlated-scalar
shapes not yet in ``tpch_like.py`` — national market share (Q8),
product-profit rollup (Q9), a HAVING-vs-global-scalar cut (Q11), and
the sole-late-supplier blame report (Q21).

The fixture schema lacks ``partsupp`` and lineitem commit/receipt
dates, so Q9's supplycost is modeled from ``p_retailprice`` and Q21's
lateness from ``l_shipdate > o_orderdate + 60 days`` — the join/agg
topology (which is what these queries exercise) is unchanged.

Scale notes (PLANS.md): the fact table joins run dim-side-broadcast
(region/nation/supplier/part all tiny relative to lineitem at any SF);
Q21 reduces lineitem to one hash aggregate keyed by l_orderkey —
count-distinct + conditional min in a single shuffle — instead of the
textbook EXISTS/NOT-EXISTS double self-join, which would shuffle
lineitem three times.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.plans._exact import DEC
from atlassian_confluence_data_pipeline_spark.plans.registry import query


@query(
    "market_share_q8",
    oracle="""
SELECT extract(year FROM o.o_orderdate) AS o_year,
       round(CAST(sum(CASE WHEN n2.n_name = 'NATION_0'
                           THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))
                           ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
             / CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) AS DOUBLE),
             6) AS mkt_share
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
JOIN region r   ON n1.n_regionkey = r.r_regionkey AND r.r_name = 'AMERICA'
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
JOIN part p     ON l.l_partkey = p.p_partkey AND p.p_type = 'ECONOMY'
GROUP BY 1
""",
    tags=("join", "multi-join", "conditional-agg", "broadcast"),
)
def market_share_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: NATION_0 suppliers' share of ECONOMY-part revenue sold
    to AMERICA-region customers, by order year — an 8-table star join
    where every dimension side broadcasts and lineitem is touched once.
    Share = conditional DECIMAL sum / total DECIMAL sum, divided in
    DOUBLE identically on both engines."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part")

    cust_nation = (
        c.join(
            F.broadcast(n.withColumnRenamed("n_nationkey", "c_nationkey")),
            "c_nationkey",
        )
        .join(
            F.broadcast(
                r.filter(F.col("r_name") == "AMERICA").withColumnRenamed(
                    "r_regionkey", "n_regionkey"
                )
            ),
            "n_regionkey",
        )
        .select("c_custkey")
    )
    supp_nation = s.join(
        F.broadcast(
            n.select(
                F.col("n_nationkey").alias("s_nationkey"),
                F.col("n_name").alias("supp_nation"),
            )
        ),
        "s_nationkey",
    ).select(F.col("s_suppkey").alias("l_suppkey"), "supp_nation")
    econ_parts = p.filter(F.col("p_type") == "ECONOMY").select(
        F.col("p_partkey").alias("l_partkey")
    )

    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)
    nation_vol = F.when(F.col("supp_nation") == "NATION_0", vol).otherwise(
        F.lit(0).cast(DEC)
    )
    return (
        l.join(F.broadcast(econ_parts), "l_partkey")
        .join(
            o.select("o_orderkey", "o_custkey", "o_orderdate").withColumnRenamed(
                "o_orderkey", "l_orderkey"
            ),
            "l_orderkey",
        )
        .join(cust_nation.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey")
        .join(F.broadcast(supp_nation), "l_suppkey")
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                F.sum(nation_vol).cast("double") / F.sum(vol).cast("double"), 6
            ).alias("mkt_share")
        )
    )


@query(
    "product_profit_q9",
    oracle="""
SELECT n.n_name AS supp_nation,
       extract(year FROM o.o_orderdate) AS o_year,
       round(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                           - 0.5 * p.p_retailprice * l.l_quantity AS DECIMAL(18,6)))
                  AS DOUBLE), 2) AS profit
FROM lineitem l
JOIN part p     ON l.l_partkey = p.p_partkey AND p.p_name LIKE '%red%'
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN orders o   ON l.l_orderkey = o.o_orderkey
GROUP BY 1, 2
""",
    tags=("join", "multi-join", "agg", "broadcast"),
)
def product_profit_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: profit on red parts by supplier nation and year.
    Supply cost is modeled as 0.5 * p_retailprice (no partsupp in the
    fixture); the per-row profit expression is exact in DECIMAL(18,6)
    (all factors are <=2-decimal and quantity is integral), so the
    grouped sums are order-independent and bit-identical to DuckDB."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")

    red_parts = p.filter(F.col("p_name").like("%red%")).select(
        F.col("p_partkey").alias("l_partkey"), "p_retailprice"
    )
    supp_nation = s.join(
        F.broadcast(
            n.select(
                F.col("n_nationkey").alias("s_nationkey"),
                F.col("n_name").alias("supp_nation"),
            )
        ),
        "s_nationkey",
    ).select(F.col("s_suppkey").alias("l_suppkey"), "supp_nation")

    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
    ).cast(DEC)
    return (
        l.join(F.broadcast(red_parts), "l_partkey")
        .join(
            o.select("o_orderkey", "o_orderdate").withColumnRenamed(
                "o_orderkey", "l_orderkey"
            ),
            "l_orderkey",
        )
        .join(F.broadcast(supp_nation), "l_suppkey")
        .groupBy("supp_nation", F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(F.round(F.sum(profit).cast("double"), 2).alias("profit"))
    )


@query(
    "nation_acctbal_share",
    oracle="""
WITH tot AS (
  SELECT sum(CAST(s_acctbal AS DECIMAL(18,6))) AS t FROM supplier
)
SELECT n.n_name AS n_name,
       round(CAST(sum(CAST(s.s_acctbal AS DECIMAL(18,6))) AS DOUBLE), 2) AS nation_bal
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
CROSS JOIN tot
GROUP BY n.n_name, tot.t
HAVING sum(CAST(s.s_acctbal AS DECIMAL(18,6))) * 20 > tot.t
""",
    tags=("agg", "scalar-subquery", "having", "broadcast"),
)
def nation_acctbal_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: nations holding more than 1/20 of global supplier
    account balance — a grouped aggregate filtered against a global
    scalar. The scalar is a 1-row DECIMAL aggregate broadcast onto the
    25-row grouped frame (intentional BNLJ, see plan_audit whitelist);
    the threshold compare is DECIMAL-exact (bal * 20 > total), so no
    float division can flip membership between engines."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    tot = s.agg(F.sum(F.col("s_acctbal").cast(DEC)).alias("t"))
    by_nation = (
        s.join(
            F.broadcast(
                n.select(
                    F.col("n_nationkey").alias("s_nationkey"), "n_name"
                )
            ),
            "s_nationkey",
        )
        .groupBy("n_name")
        .agg(F.sum(F.col("s_acctbal").cast(DEC)).alias("bal"))
    )
    return (
        by_nation.join(F.broadcast(tot))
        .filter(F.col("bal") * 20 > F.col("t"))
        .select(
            "n_name", F.round(F.col("bal").cast("double"), 2).alias("nation_bal")
        )
    )


@query(
    "sole_late_suppliers",
    oracle="""
WITH ord AS (
  SELECT l.l_orderkey,
         count(DISTINCT l.l_suppkey) AS n_supp,
         count(DISTINCT CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                             THEN l.l_suppkey END) AS n_late,
         min(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                  THEN l.l_suppkey END) AS late_supp
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderstatus = 'F'
  GROUP BY 1
)
SELECT s.s_name AS s_name, count(*) AS numwait
FROM ord
JOIN supplier s ON ord.late_supp = s.s_suppkey
WHERE ord.n_supp >= 2 AND ord.n_late = 1
GROUP BY 1
""",
    tags=("join", "agg", "exists", "anti"),
)
def sole_late_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: suppliers who were the ONLY late shipper on a
    finished multi-supplier order (late = shipped >60 days after the
    order date; the fixture has no commit/receipt dates). Instead of
    the textbook EXISTS + NOT-EXISTS double self-join (three shuffles
    of lineitem), the per-order facts — supplier count, late-supplier
    count, the sole late supplier — come from ONE hash aggregate keyed
    by l_orderkey; the blame assignment is then a broadcast join to the
    supplier dim. min(CASE...) is the deterministic representative and
    is only consumed when n_late = 1, where it is unique."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")

    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    late_supp = F.when(late, F.col("l_suppkey"))
    ord_facts = (
        l.join(
            o.filter(F.col("o_orderstatus") == "F")
            .select("o_orderkey", "o_orderdate")
            .withColumnRenamed("o_orderkey", "l_orderkey"),
            "l_orderkey",
        )
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct(late_supp).alias("n_late"),
            F.min(late_supp).alias("late_supp"),
        )
    )
    return (
        ord_facts.filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
        .join(
            F.broadcast(s.select(F.col("s_suppkey").alias("late_supp"), "s_name")),
            "late_supp",
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
