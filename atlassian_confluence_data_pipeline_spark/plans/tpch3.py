"""Third TPC-H-shaped wave: the remaining classic decision-support
shapes — minimum-cost supplier selection (Q2), the single-scan filtered
forecast aggregate (Q6), returned-item customer ranking (Q10), and the
excess-stock nested-subquery cut (Q20).

The fixture schema lacks ``partsupp``, so Q2/Q20's per-(part, supplier)
attributes are MODELED with exact integer arithmetic over the key pair
(deterministic, reproducible in any engine — the same discipline as
tpch2.py's supplycost model): the supplying relation is the distinct
(l_partkey, l_suppkey) set observed in lineitem, Q2's cost is an
integer number of cents derived from the keys, and Q20's available
quantity is a small integer derived the same way. The join/agg topology
each query exercises — decorrelated per-group MIN with a deterministic
arg-min pick, full-pushdown single scan, grouped top-k with
TakeOrderedAndProject, and aggregate-then-semi-join — is unchanged.

Scale notes (PLANS.md): Q2 and Q20 reduce lineitem to one hash
aggregate on (l_partkey, l_suppkey) before any dimension join — the
only wide exchange each pays; every dimension side broadcasts. Q6 is a
single scan with every predicate pushed. Q10's LIMIT 20 lowers to
TakeOrderedAndProject (no global sort materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.plans._exact import DEC, dsum, sql_dsum
from atlassian_confluence_data_pipeline_spark.plans.registry import query


@query(
    "forecast_revenue_change",
    oracle="""
SELECT round(CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,6)))
             AS DOUBLE), 2) AS revenue_delta,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND l_discount >= CAST(0.05 AS DOUBLE)
  AND l_discount <= CAST(0.07 AS DOUBLE)
  AND l_quantity < CAST(24 AS DOUBLE)
""",
    tags=("scan", "pushdown", "agg"),
)
def forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 shape: revenue increase if mid-band discounts on small
    quantities had been eliminated — ONE scan of lineitem with every
    predicate (date range, discount band, quantity cap) pushed to the
    parquet reader and a single ungrouped DECIMAL-exact sum. The
    discount band compares double-to-double on both engines (the oracle
    casts its literals) so no decimal-vs-float coercion can flip a row."""
    li = load_table(spark, sf_dir, "lineitem")
    f = li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_discount") >= F.lit(0.05))
        & (F.col("l_discount") <= F.lit(0.07))
        & (F.col("l_quantity") < F.lit(24.0))
    )
    return f.agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue_delta"),
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
    )


@query(
    "returned_item_customers",
    oracle=f"""
SELECT c.c_custkey, c.c_name, n.n_name AS n_name,
       {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate <  TIMESTAMP '1997-07-01'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
""",
    tags=("join", "agg", "topk", "broadcast"),
)
def returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: the 20 customers who returned the most revenue in a
    half-year window — fact-fact join reduced by pushed filters, dims
    broadcast, then a grouped DECIMAL sum and a global top-k that lowers
    to TakeOrderedAndProject (per-partition heaps, no full sort). The
    rounded revenue is bit-identical cross-engine (DECIMAL sum), so the
    (revenue DESC, c_custkey) cut selects the same 20 rows."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")

    rev = dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    return (
        li.select("l_orderkey", "l_extendedprice", "l_discount")
        .join(
            orders.select(
                F.col("o_orderkey").alias("l_orderkey"), "o_custkey"
            ),
            "l_orderkey",
        )
        .join(
            F.broadcast(
                cust.select(
                    F.col("c_custkey").alias("o_custkey"),
                    "c_name",
                    "c_nationkey",
                )
            ),
            "o_custkey",
        )
        .join(
            F.broadcast(
                nation.select(F.col("n_nationkey").alias("c_nationkey"), "n_name")
            ),
            "c_nationkey",
        )
        .groupBy(
            F.col("o_custkey").alias("c_custkey"), F.col("c_name"), F.col("n_name")
        )
        .agg(rev)
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


#: Q2's modeled per-(part, supplier) cost in CENTS — pure integer
#: arithmetic over the key pair, exact in any engine (no partsupp table;
#: see module docstring)
_COST_CENTS_SQL = "(5000 + (l_partkey * 31 + l_suppkey * 17) % 2000)"


@query(
    "min_cost_supplier",
    oracle=f"""
WITH supply AS (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
), cand AS (
  SELECT s.l_partkey AS p_partkey, s.l_suppkey AS s_suppkey,
         {_COST_CENTS_SQL} AS cost_cents
  FROM supply s
  JOIN supplier su ON s.l_suppkey = su.s_suppkey
  JOIN nation n    ON su.s_nationkey = n.n_nationkey
  JOIN region r    ON n.n_regionkey = r.r_regionkey AND r.r_name = 'AMERICA'
), ranked AS (
  SELECT p_partkey, s_suppkey, cost_cents,
         row_number() OVER (PARTITION BY p_partkey
                            ORDER BY cost_cents, s_suppkey) AS rn
  FROM cand
)
SELECT k.p_partkey, p.p_name, su.s_name, n.n_name AS n_name,
       round(CAST(k.cost_cents AS DOUBLE) / 100, 2) AS supply_cost
FROM ranked k
JOIN part p     ON k.p_partkey = p.p_partkey
                AND p.p_type = 'ECONOMY' AND p.p_size <= 10
JOIN supplier su ON k.s_suppkey = su.s_suppkey
JOIN nation n    ON su.s_nationkey = n.n_nationkey
WHERE k.rn = 1
""",
    tags=("join", "subquery", "argmin", "window", "broadcast"),
)
def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: for every small ECONOMY part, the cheapest supplier in
    region AMERICA — the classic correlated-MIN subquery decorrelated
    into a per-part arg-min. The supplying relation is the distinct
    (l_partkey, l_suppkey) pairs observed in lineitem (one hash
    aggregate — the query's only wide exchange); the modeled cost is
    exact integer cents so the (cost, s_suppkey) arg-min is totally
    ordered and both engines pick the identical winner. Region and part
    filters broadcast; the final detail joins broadcast too."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    part = load_table(spark, sf_dir, "part")

    amer_supp = (
        supp.join(
            F.broadcast(
                nation.select(
                    F.col("n_nationkey").alias("s_nationkey"),
                    "n_regionkey",
                    "n_name",
                )
            ),
            "s_nationkey",
        )
        .join(
            F.broadcast(
                region.filter(F.col("r_name") == "AMERICA").select("r_regionkey")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(F.col("s_suppkey").alias("l_suppkey"), "s_name", "n_name")
    )

    # Round 12: the part predicate prunes BEFORE the wide exchange (the
    # per-part arg-min is independent across parts, so filtering parts
    # first cannot change any winner) — the distinct and the arg-min
    # now see only small-ECONOMY rows instead of the whole supplying
    # relation; and the arg-min itself is a min(struct) hash aggregate
    # (map-side partials) instead of a row_number window (full
    # shuffle + sort) — min over (cost, suppkey, ...) structs picks the
    # identical totally-ordered winner.
    small_econ = part.filter(
        (F.col("p_type") == "ECONOMY") & (F.col("p_size") <= 10)
    ).select("p_partkey", "p_name")
    supply = (
        li.select("l_partkey", "l_suppkey")
        .join(
            F.broadcast(small_econ.select("p_partkey")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    cost_cents = (
        F.lit(5000)
        + (F.col("l_partkey") * 31 + F.col("l_suppkey") * 17) % 2000
    ).alias("cost_cents")
    cand = supply.join(F.broadcast(amer_supp), "l_suppkey").select(
        F.col("l_partkey").alias("p_partkey"),
        F.col("l_suppkey").alias("s_suppkey"),
        cost_cents,
        "s_name",
        "n_name",
    )
    best = cand.groupBy("p_partkey").agg(
        F.min(
            F.struct("cost_cents", "s_suppkey", "s_name", "n_name")
        ).alias("w")
    )
    return best.join(F.broadcast(small_econ), "p_partkey").select(
        "p_partkey",
        "p_name",
        F.col("w.s_name").alias("s_name"),
        F.col("w.n_name").alias("n_name"),
        F.round(F.col("w.cost_cents").cast("double") / 100, 2).alias(
            "supply_cost"
        ),
    )


#: Q20's modeled available stock per (part, supplier) — small exact
#: integer derived from the key pair (no partsupp table)
_AVAIL_SQL = "((l_partkey * 7 + l_suppkey * 11) % 20 + 1)"


@query(
    "excess_stock_suppliers",
    oracle=f"""
WITH shipped AS (
  SELECT l_partkey, l_suppkey,
         sum(CAST(l_quantity AS DECIMAL(18,6))) AS qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1998-01-01'
  GROUP BY 1, 2
), excess AS (
  SELECT sh.l_suppkey
  FROM shipped sh
  JOIN part p ON sh.l_partkey = p.p_partkey AND p.p_name LIKE '%blue%'
  WHERE CAST(2 * {_AVAIL_SQL} AS DECIMAL(18,6)) > sh.qty
)
SELECT su.s_suppkey, su.s_name, n.n_name AS n_name
FROM supplier su
JOIN nation n ON su.s_nationkey = n.n_nationkey
WHERE EXISTS (SELECT 1 FROM excess e WHERE e.l_suppkey = su.s_suppkey)
""",
    tags=("join", "semi", "subquery", "agg"),
)
def excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: suppliers holding excess stock of blue parts — stock
    exceeding half the quantity they shipped in 1997. The textbook
    nested IN-subqueries decorrelate to: one hash aggregate of lineitem
    on (l_partkey, l_suppkey) (the only wide exchange), a broadcast
    part-name filter, an exact DECIMAL threshold compare (2*avail > qty
    — no float division), then a LEFT SEMI join into the supplier dim
    (broadcast nation attaches the detail column). Available stock is
    modeled as exact integer arithmetic over the key pair (module
    docstring)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    shipped = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("qty"))
    )
    blue = part.filter(F.col("p_name").like("%blue%")).select(
        F.col("p_partkey").alias("l_partkey")
    )
    avail = (F.col("l_partkey") * 7 + F.col("l_suppkey") * 11) % 20 + 1
    excess = (
        shipped.join(F.broadcast(blue), "l_partkey")
        .filter((2 * avail).cast(DEC) > F.col("qty"))
        .select(F.col("l_suppkey").alias("s_suppkey"))
    )
    named = supp.join(
        F.broadcast(
            nation.select(
                F.col("n_nationkey").alias("s_nationkey"), "n_name"
            )
        ),
        "s_nationkey",
    ).select("s_suppkey", "s_name", "n_name")
    return named.join(excess, "s_suppkey", "left_semi")
