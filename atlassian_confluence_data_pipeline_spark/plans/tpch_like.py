"""TPC-H-shaped relational queries adapted to the fixture star schema.

These widen the relational surface with the classic decision-support
shapes the reference has no analog for (SURVEY.md §2.4-2.5 ABSENT
notes): EXISTS/IN subqueries, correlated scalar subqueries
(decorrelated to joins), disjunctive pushdown, group-count histograms,
ratio aggregates, and HAVING-subquery filters. Query numbers reference
the TPC-H shapes they mirror; all are adapted to the available columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.plans._exact import DEC, dsum, sql_dsum
from atlassian_confluence_data_pipeline_spark.plans.registry import query


@query(
    "priority_with_late_lines",  # Q4 shape
    oracle="""
SELECT o_orderpriority, count(*) AS n_orders
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY 1
""",
    tags=("join", "semi", "subquery"),
)
def priority_with_late_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: EXISTS-correlated semi join — orders in a quarter having
    at least one line shipped >60 days after order date."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (li.l_orderkey == orders.o_orderkey)
        & (li.l_shipdate > F.date_add(orders.o_orderdate, 60)),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_orders"))


@query(
    "nation_pair_trade",  # Q7 shape
    oracle=f"""
SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
       CAST(year(l.l_shipdate) AS INT) AS ship_year,
       {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS volume
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
WHERE cn.n_name IN ('NATION_1', 'NATION_2') AND sn.n_name IN ('NATION_1', 'NATION_2')
  AND cn.n_name <> sn.n_name
GROUP BY 1, 2, 3
""",
    tags=("join", "agg"),
)
def nation_pair_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: cross-nation trade volume by year between two nations
    (both directions), dims broadcast, fact joins shuffled."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    cn = nation.select(
        F.col("n_nationkey").alias("cnk"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("cust_nation").isin("NATION_1", "NATION_2"))
    sn = nation.select(
        F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation")
    ).filter(F.col("supp_nation").isin("NATION_1", "NATION_2"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cn), cust.c_nationkey == F.col("cnk"))
        .join(F.broadcast(sn), supp.s_nationkey == F.col("snk"))
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy(
            "cust_nation", "supp_nation", F.year("l_shipdate").alias("ship_year")
        )
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"))
    )


@query(
    "returnflag_priority_matrix",  # Q12 shape
    oracle="""
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
            AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
            AS BIGINT) AS low_line_count
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1998-01-01' AND l.l_shipdate < TIMESTAMP '1999-01-01'
GROUP BY 1
""",
    tags=("join", "agg", "case"),
)
def returnflag_priority_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: conditional CASE counts after a fact-fact join with a
    pushed date window."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
    )


@query(
    "customer_order_histogram",  # Q13 shape
    oracle="""
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY 1
)
GROUP BY 1
""",
    tags=("join", "agg", "histogram"),
)
def customer_order_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: double aggregation — orders per customer (zero-order
    customers included via left join), then the distribution of those
    counts."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "promo_revenue_ratio",  # Q14 shape
    oracle="""
SELECT round(
         100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
             THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6)) END)
           AS DOUBLE)
         / CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6)))
           AS DOUBLE), 4) AS promo_pct
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-06-01' AND l.l_shipdate < TIMESTAMP '1997-07-01'
""",
    tags=("join", "agg", "ratio"),
)
def promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: conditional-revenue ratio (percent of promo revenue in
    a month) — a single global aggregate from exact decimal sums."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-06-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev)).cast("double")
                / F.sum(rev).cast("double"),
                4,
            ).alias("promo_pct")
        )
    )


@query(
    "top_supplier_revenue",  # Q15 shape
    oracle="""
WITH revenue AS (
  SELECT l_suppkey, sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY 1
)
SELECT s.s_suppkey, s.s_name, round(CAST(r.total_rev AS DOUBLE), 2) AS total_rev
FROM revenue r JOIN supplier s ON s.s_suppkey = r.l_suppkey
WHERE r.total_rev = (SELECT max(total_rev) FROM revenue)
""",
    tags=("join", "agg", "subquery"),
)
def top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: scalar MAX subquery against a derived revenue view —
    the top supplier(s) of a quarter. The max is joined back, not
    collected."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    revenue = li.groupBy("l_suppkey").agg(
        F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)).alias(
            "total_rev"
        )
    )
    max_rev = revenue.agg(F.max("total_rev").alias("m"))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(max_rev), revenue.total_rev == F.col("m"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("total_rev").cast("double"), 2).alias("total_rev"),
        )
    )


@query(
    "brand_type_supplier_counts",  # Q16 shape
    oracle="""
SELECT p.p_brand AS p_brand, p.p_type AS p_type,
       count(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#1' AND p.p_type NOT IN ('PROMO', 'ECONOMY')
  AND p.p_size IN (1, 5, 9, 13, 17)
GROUP BY 1, 2
""",
    tags=("join", "agg", "distinct"),
)
def brand_type_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: COUNT DISTINCT suppliers per (brand, type) with NOT/
    NOT-IN/IN predicate mix pushed into the dim scan."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").isin("PROMO", "ECONOMY"))
        & (F.col("p_size").isin(1, 5, 9, 13, 17))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "small_quantity_revenue",  # Q17 shape
    oracle="""
SELECT round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0, 4)
         AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN (
  SELECT l_partkey, sum(CAST(l_quantity AS DECIMAL(18,6))) AS sum_qty,
         count(*) AS cnt
  FROM lineitem GROUP BY 1
) a ON a.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#3'
  AND CAST(l.l_quantity AS DECIMAL(18,6)) * 2 * a.cnt < a.sum_qty
""",
    tags=("join", "agg", "correlated"),
)
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: correlated scalar subquery (per-part average quantity)
    decorrelated into an aggregate + join — lines below half their
    part's average quantity. The threshold compare is kept DECIMAL-exact
    by multiplying through: q < 0.5 * sum/cnt  ⟺  2*cnt*q < sum — no
    floating-point average whose last ULP could flip membership between
    engines."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    stats = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        F.sum(F.col("l_quantity").cast(DEC)).alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt"),
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(stats, li.l_partkey == F.col("a_partkey"))
        .filter(F.col("l_quantity").cast(DEC) * 2 * F.col("cnt") < F.col("sum_qty"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast(DEC)).cast("double") / 7.0, 4
            ).alias("avg_yearly")
        )
    )


@query(
    "large_quantity_orders",  # Q18 shape
    oracle="""
SELECT c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       round(CAST(sum(CAST(l.l_quantity AS DECIMAL(18,6))) AS DOUBLE), 2) AS total_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 250
)
GROUP BY 1, 2, 3, 4
""",
    tags=("join", "agg", "subquery", "having"),
)
def large_quantity_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: IN-subquery with HAVING — orders whose total quantity
    exceeds a threshold, rejoined for customer detail. The IN becomes a
    semi join on the aggregated key set."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 250)
        .select("l_orderkey")
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey, "left_semi")
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(
            F.round(F.sum(F.col("l_quantity").cast(DEC)).cast("double"), 2).alias(
                "total_qty"
            )
        )
    )


@query(
    "disjunctive_discount_revenue",  # Q19 shape
    oracle=f"""
SELECT {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity >= 1 AND l.l_quantity <= 21)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25 AND l.l_quantity >= 10 AND l.l_quantity <= 30)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35 AND l.l_quantity >= 20 AND l.l_quantity <= 40)
""",
    tags=("join", "filter", "disjunction"),
)
def disjunctive_discount_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: three-way disjunctive predicate spanning both join
    sides — Catalyst extracts the common subexpressions it can push
    (brand/size IN-lists to the part scan) and evaluates the residual
    after the join."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 21)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return j.filter(cond).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    )


@query(
    "rich_inactive_customers",  # Q22 shape
    oracle="""
WITH avg_bal AS (
  SELECT sum(CAST(c_acctbal AS DECIMAL(18,6))) AS s, count(*) AS n
  FROM customer WHERE c_acctbal > 0
)
SELECT c.c_mktsegment AS c_mktsegment,
       count(*) AS numcust,
       round(CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,6))) AS DOUBLE), 2) AS totacctbal
FROM customer c CROSS JOIN avg_bal
WHERE CAST(c.c_acctbal AS DECIMAL(18,6)) * avg_bal.n > avg_bal.s
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_orderdate >= TIMESTAMP '1999-01-01'
  )
GROUP BY 1
""",
    tags=("join", "anti", "subquery", "agg"),
)
def rich_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: scalar-average subquery + NOT EXISTS anti join —
    above-average-balance customers with no RECENT order (the pure
    never-ordered form matches almost nobody in this data). The scalar
    aggregate is broadcast, never collected; the threshold compare is
    DECIMAL-exact (bal * n > sum) so no float-average ULP can flip
    membership between engines."""
    cust = load_table(spark, sf_dir, "customer")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.sum(F.col("c_acctbal").cast(DEC)).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal").cast(DEC) * F.col("n") > F.col("s"))
        .join(orders, "c_custkey", "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum(F.col("c_acctbal").cast(DEC)).cast("double"), 2).alias(
                "totacctbal"
            ),
        )
    )
