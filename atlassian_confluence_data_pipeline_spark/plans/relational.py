"""Relational core queries (SURVEY.md §2.1-2.6): scans, filters, joins,
aggregations, windows, top-k, set ops — each paired with DuckDB oracle SQL.

These are the engine's demonstration queries over the driver fixtures.
The *operators* they exercise live in ``operators/``; each query's
docstring cites the reference behavior it re-expresses (file:line into
/root/reference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.operators.dedup import union_dedup
from atlassian_confluence_data_pipeline_spark.operators.joins import (
    anti_join,
    lookup_join,
    semi_join,
)
from atlassian_confluence_data_pipeline_spark.operators.windows import (
    top_k_per_group,
)
from atlassian_confluence_data_pipeline_spark.plans._exact import (
    davg,
    dsum,
    sql_davg,
    sql_dsum,
)
from atlassian_confluence_data_pipeline_spark.plans.registry import query

# Fixed cutoffs (orders span 1995-01-01 .. 2001-08-01) so results are
# deterministic — the analog of the reference's now()-relative lookback
# (master_script.py:279) pinned for reproducibility.
RECENT = "2001-06-01 00:00:00"
SHIP_END = "2001-09-01 00:00:00"


def _ts(s: str):
    return F.lit(s).cast("timestamp")


# ---------------------------------------------------------------------------
# Flagship: incremental CDC classification (SURVEY.md §7 minimum slice)
# ---------------------------------------------------------------------------


@query(
    "cdc_classify_orders",
    oracle=f"""
WITH state AS (
  SELECT DISTINCT o_custkey
  FROM orders WHERE o_orderdate < TIMESTAMP '{RECENT}'
), recent AS (
  SELECT * FROM orders WHERE o_orderdate >= TIMESTAMP '{RECENT}'
)
SELECT
  CASE WHEN s.o_custkey IS NULL THEN 'new' ELSE 'updated' END AS change_type,
  r.o_orderpriority AS o_orderpriority,
  count(*) AS n_orders,
  {sql_dsum('r.o_totalprice')} AS total_price
FROM recent r LEFT JOIN state s ON r.o_custkey = s.o_custkey
GROUP BY 1, 2
""",
    tags=("flagship", "cdc", "join", "agg"),
)
def cdc_classify_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-refresh classification: scan the 'recent' window, left
    join the state ledger (keys seen before the cutoff), classify each row
    new/updated, aggregate counts per group.

    Re-expresses the reference's core semantic — CDC vs a persisted state
    table (state_manager.py:55-82) + per-outcome grouped counters
    (master_script.py:106-113, 590-609) — as one declarative plan: the
    ledger side is distinct keys (small) so Catalyst broadcasts it; at
    100 TB both sides shuffle on the key with AQE skew handling.
    """
    orders = load_table(spark, sf_dir, "orders")
    recent = orders.filter(F.col("o_orderdate") >= _ts(RECENT))
    state = (
        orders.filter(F.col("o_orderdate") < _ts(RECENT))
        .select("o_custkey")
        .distinct()
        .withColumn("__seen", F.lit(1))
    )
    return (
        recent.join(F.broadcast(state), "o_custkey", "left")
        .withColumn(
            "change_type",
            F.when(F.col("__seen").isNull(), "new").otherwise("updated"),
        )
        .groupBy("change_type", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("total_price"),
        )
    )


# ---------------------------------------------------------------------------
# Scan + filter + aggregate (TPC-H Q1 shape) — S3/P2/A1 analogs
# ---------------------------------------------------------------------------


@query(
    "pricing_summary",
    oracle=f"""
SELECT
  l_returnflag,
  l_linestatus,
  {sql_dsum('l_quantity')} AS sum_qty,
  {sql_dsum('l_extendedprice')} AS sum_base_price,
  {sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
  {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
  {sql_davg('l_quantity')} AS avg_qty,
  {sql_davg('l_extendedprice')} AS avg_price,
  {sql_davg('l_discount')} AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{SHIP_END}'
GROUP BY l_returnflag, l_linestatus
""",
    tags=("scan", "filter", "agg"),
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-scan grouped aggregation with a pushed-down date predicate
    (P2 semantics, master_script.py:277-289). The filter and the two-column
    grouping reach the Parquet scan as PushedFilters + pruned ReadSchema;
    HashAggregate runs partial (map-side) then final — one shuffle of
    6 groups regardless of input size.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= _ts(SHIP_END))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Multi-join + top-k (TPC-H Q3 shape) — J-family + §2.5 top-k
# ---------------------------------------------------------------------------


@query(
    "top_revenue_orders",
    oracle=f"""
SELECT
  l_orderkey,
  round(CAST(rev AS DOUBLE), 2) AS revenue,
  o_orderdate,
  o_orderpriority
FROM (
  SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
         sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) AS rev
  FROM customer c
  JOIN orders o ON c.c_custkey = o.o_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE c.c_mktsegment = 'BUILDING'
    AND o.o_orderdate < TIMESTAMP '2000-01-01'
    AND l.l_shipdate > TIMESTAMP '2000-01-01'
  GROUP BY 1, 2, 3
) ORDER BY rev DESC, l_orderkey LIMIT 10
""",
    tags=("join", "agg", "topk"),
)
def top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-way join + grouped revenue + global top-10.

    The customer side is filtered to one segment then broadcast; the
    orders⋈lineitem join shuffles on the order key. Top-k orders by the
    *exact* decimal revenue (tie-broken by key) so both engines rank
    identically, then rounds for output. Physical plan: the limit becomes
    TakeOrderedAndProject — per-partition heaps, no global sort.
    """
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < _ts("2000-01-01 00:00:00")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > _ts("2000-01-01 00:00:00")
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).alias("rev"))
        .orderBy(F.col("rev").desc(), F.col("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            F.round(F.col("rev").cast("double"), 2).alias("revenue"),
            "o_orderdate",
            "o_orderpriority",
        )
    )


# ---------------------------------------------------------------------------
# Star join across 6 tables (TPC-H Q5 shape)
# ---------------------------------------------------------------------------


@query(
    "regional_revenue",
    oracle=f"""
SELECT n.n_name AS n_name, {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY 1
""",
    tags=("join", "agg", "broadcast"),
)
def regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six-table star join: big fact (lineitem) ⋈ orders shuffle join, all
    dimension sides (customer-by-nation, supplier, nation, region)
    broadcast. Region/nation are tiny catalogs (S5 analog); Catalyst
    prunes them to the joined columns only.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1998-01-01 00:00:00"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Anti / semi joins — J1 / J2
# ---------------------------------------------------------------------------


@query(
    "customers_without_recent_orders",
    oracle=f"""
SELECT c.c_custkey, c.c_name, c.c_mktsegment
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderdate >= TIMESTAMP '{RECENT}'
)
""",
    tags=("join", "anti"),
)
def customers_without_recent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join — the reference's 'missing pages' sweep
    (``if page_id not in current_state``, master_script.py:561): customers
    with no order in the recent window. Anti join against the filtered,
    deduplicated key set; broadcastable when the recent window is small.
    """
    cust = load_table(spark, sf_dir, "customer")
    recent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= _ts(RECENT))
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return anti_join(cust, recent, "c_custkey").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@query(
    "customers_with_recent_orders",
    oracle=f"""
SELECT c.c_custkey, c.c_name
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderdate >= TIMESTAMP '{RECENT}'
)
""",
    tags=("join", "semi"),
)
def customers_with_recent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join (EXISTS) — the reference's 'space already seen?'
    membership probe (master_script.py:417-421)."""
    cust = load_table(spark, sf_dir, "customer")
    recent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= _ts(RECENT))
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return semi_join(cust, recent, "c_custkey").select("c_custkey", "c_name")


# ---------------------------------------------------------------------------
# Broadcast lookup join — J4
# ---------------------------------------------------------------------------


@query(
    "brand_revenue",
    oracle=f"""
SELECT p.p_brand AS p_brand,
       count(*) AS n_items,
       {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY 1
""",
    tags=("join", "broadcast", "agg"),
)
def brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈dimension lookup join (reference J4: attachment→page lookup,
    html_generator.py:212-248). The part dim is broadcast so the 100 TB
    lineitem side never shuffles for the join; the only exchange is the
    6-ish-group final aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        lookup_join(li, part, li.l_partkey == part.p_partkey, how="inner")
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Grouped outcome stats — A1..A4
# ---------------------------------------------------------------------------


@query(
    "order_outcome_stats",
    oracle=f"""
SELECT
  o_orderstatus,
  count(*) AS n_total,
  CAST(sum(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END) AS BIGINT) AS n_large,
  CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent,
  count(DISTINCT o_custkey) AS n_customers,
  {sql_davg('o_totalprice', 2)} AS avg_price
FROM orders
GROUP BY 1
""",
    tags=("agg",),
)
def order_outcome_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-outcome grouped counters — the declarative form of the
    reference's mutable stats dict (master_script.py:106-113, 241-253,
    590-609): conditional counts via sum(when), distinct customers, avg.
    """
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(F.col("o_totalprice") > 200000, 1).otherwise(0))
        .cast("bigint")
        .alias("n_large"),
        F.sum(F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0))
        .cast("bigint")
        .alias("n_urgent"),
        F.countDistinct("o_custkey").alias("n_customers"),
        davg("o_totalprice", 2).alias("avg_price"),
    )


@query(
    "cube_returnflag_status",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       count(*) AS n_rows, {sql_dsum('l_quantity')} AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
    tags=("agg", "cube"),
)
def cube_returnflag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (engine extension per SURVEY §2.4 ABSENT note) —
    all 2^2 grouping combinations in one pass (Expand + HashAggregate)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"), dsum("l_quantity").alias("sum_qty")
    )


@query(
    "rollup_region_nation_customers",
    oracle="""
SELECT r.r_name AS r_name, n.n_name AS n_name, count(*) AS n_customers
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP (r_name, n_name)
""",
    tags=("agg", "rollup", "join"),
)
def rollup_region_nation_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (region → nation → grand total) over a
    double-broadcast dimension join."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


# ---------------------------------------------------------------------------
# Windows / ranking / top-k per group — §2.5
# ---------------------------------------------------------------------------


@query(
    "top3_orders_per_customer",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(row_number() OVER (
           PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
         ) AS INT) AS rn
  FROM orders
) WHERE rn <= 3
""",
    tags=("window", "topk"),
)
def top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via row_number (reference W1 results[0] pick,
    confluence_client.py:272-273, generalized). Single hash-partition
    shuffle on the group key; WindowExec streams sorted groups."""
    orders = load_table(spark, sf_dir, "orders")
    out = top_k_per_group(
        orders,
        ["o_custkey"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
        k=3,
    )
    return out.select(
        "o_custkey", "o_orderkey", "o_totalprice", F.col("rn").cast("int").alias("rn")
    )


@query(
    "latest_order_per_customer",
    oracle="""
SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC
  ) AS rn
  FROM orders
) WHERE rn = 1
""",
    tags=("window", "dedup"),
)
def latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-row-per-key — the engine's W2 operator: the reference's
    last-write-wins state upsert (state_manager.py:93-99) made explicit
    and deterministic (version desc, key desc tie-break)."""
    from atlassian_confluence_data_pipeline_spark.operators.dedup import latest_per_key

    orders = load_table(spark, sf_dir, "orders")
    return latest_per_key(orders, ["o_custkey"], ["o_orderdate", "o_orderkey"]).select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
    )


@query(
    "running_quantity",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity,
       round(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) OVER (
         PARTITION BY l_orderkey ORDER BY l_linenumber
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS DOUBLE), 2) AS running_qty
FROM lineitem
WHERE l_orderkey % 97 = 1
""",
    tags=("window", "frame"),
)
def running_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate-over-frame window: running sum within an order by line
    number (unique within the partition → deterministic). Decimal inner
    sum keeps the running values bit-identical across engines."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 97 == 1)
    w = (
        Window.partitionBy("l_orderkey")
        .orderBy("l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.round(
            F.sum(F.col("l_quantity").cast("decimal(18,6)")).over(w).cast("double"), 2
        ).alias("running_qty"),
    )


@query(
    "order_price_lag",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice,
       lag(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
       ) AS prev_price,
       lead(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
       ) AS next_price
FROM orders
WHERE o_custkey < 100
""",
    tags=("window", "lag"),
)
def order_price_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead analytics over a per-customer order timeline (unique
    (date, key) ordering). Pass-through doubles — no rounding needed."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
    )


@query(
    "top10_orders",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
""",
    tags=("topk", "sort"),
)
def top10_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global ORDER BY + LIMIT top-k → TakeOrderedAndProject (per-partition
    heaps, k-row driver merge; no global sort even at 100 TB)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# Set operations — §2.6
# ---------------------------------------------------------------------------


@query(
    "repeat_buyers_intersect",
    oracle="""
SELECT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
INTERSECT
SELECT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
""",
    tags=("setop",),
)
def repeat_buyers_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (engine surface for the reference's ABSENT set ops,
    SURVEY §2.6): customers active in both 1995 and 1996."""
    orders = load_table(spark, sf_dir, "orders")
    y95 = orders.filter(
        (F.col("o_orderdate") >= _ts("1995-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1996-01-01 00:00:00"))
    ).select("o_custkey")
    y96 = orders.filter(
        (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1997-01-01 00:00:00"))
    ).select("o_custkey")
    return y95.intersect(y96)


@query(
    "churned_buyers_except",
    oracle="""
SELECT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
EXCEPT
SELECT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
""",
    tags=("setop",),
)
def churned_buyers_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: customers active in 1995 but not 1996 (set-difference form
    of the reference's anti-join J1)."""
    orders = load_table(spark, sf_dir, "orders")
    y95 = orders.filter(
        (F.col("o_orderdate") >= _ts("1995-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1996-01-01 00:00:00"))
    ).select("o_custkey")
    y96 = orders.filter(
        (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1997-01-01 00:00:00"))
    ).select("o_custkey")
    return y95.subtract(y96)  # EXCEPT DISTINCT (set semantics, like the SQL)


@query(
    "union_dedup_windows",
    oracle="""
WITH u AS (
  SELECT * FROM orders
  WHERE o_orderdate >= TIMESTAMP '1995-06-01' AND o_orderdate < TIMESTAMP '1996-01-01'
  UNION
  SELECT * FROM orders
  WHERE o_orderdate >= TIMESTAMP '1995-09-01' AND o_orderdate < TIMESTAMP '1996-04-01'
)
SELECT o_orderpriority, count(*) AS n_orders
FROM u GROUP BY 1
""",
    tags=("setop", "dedup", "agg"),
)
def union_dedup_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union of two overlapping scan phases + dedup by key — the
    reference's updated ∪ missing sweep with skip-seen
    (master_script.py:487-490, :553-558), via the union_dedup operator
    (single window pass, no join)."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(
        (F.col("o_orderdate") >= _ts("1995-06-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1996-01-01 00:00:00"))
    )
    b = orders.filter(
        (F.col("o_orderdate") >= _ts("1995-09-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1996-04-01 00:00:00"))
    )
    return union_dedup(a, b, ["o_orderkey"]).groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
