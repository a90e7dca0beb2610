"""Eleventh-wave retail/time-series analytics.

- market-basket association mining (pair support / confidence / lift —
  the Apriori level-2 pass, the standard co-purchase analysis),
- grouped EXACT medians by count-selection (no per-group sort-and-pick
  UDF: cumulative counts over distinct values select the median
  positionally — the distributed-exact-median shape),
- seasonal residual outliers (per (type, hour-of-day) DECIMAL-exact
  moments, |z| > 3 against the seasonal baseline — the de-seasonalized
  sibling of value_outliers_zscore),
- hierarchy path enumeration (materialized '/'-joined root paths via
  the frontier loop — the BOM/path-index build over the same derived
  order tree as order_tree_rollup, checked by a recursive-CTE oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.plans.registry import query

#: market basket: minimum pair support (absolute co-occurrence count)
BASKET_MIN_SUP = 3

#: seasonal outliers: residual z threshold
SEASONAL_Z = 3.0

_DEC = "decimal(18,6)"


# ---------------------------------------------------------------------------
# Market-basket association mining
# ---------------------------------------------------------------------------

@query(
    "market_basket_lift",
    oracle=f"""
WITH b AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), n AS (
  SELECT count(DISTINCT l_orderkey) AS n_orders FROM b
), item AS (
  SELECT l_partkey, count(*) AS n_item FROM b GROUP BY 1
), pair AS (
  SELECT a.l_partkey AS part_a, c.l_partkey AS part_b,
         count(*) AS n_ab
  FROM b a JOIN b c ON a.l_orderkey = c.l_orderkey
                   AND a.l_partkey < c.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= {BASKET_MIN_SUP}
)
SELECT p.part_a, p.part_b, CAST(p.n_ab AS BIGINT) AS n_ab,
       round(CAST(p.n_ab AS DOUBLE) / n.n_orders, 6) AS support,
       round(CAST(p.n_ab AS DOUBLE) / ia.n_item, 6) AS confidence,
       round(CAST(p.n_ab AS DOUBLE) * n.n_orders
             / (ia.n_item * ib.n_item), 6) AS lift
FROM pair p
JOIN item ia ON ia.l_partkey = p.part_a
JOIN item ib ON ib.l_partkey = p.part_b
CROSS JOIN n
""",
    tags=("retail", "association", "join"),
)
def market_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association mining (Apriori level 2): for every
    part pair co-purchased in >= {MIN} orders, the pair's support,
    confidence (a -> b over the a<b orientation) and lift — the
    co-purchase analysis behind recommendations and shelf placement.

    Scale shape (round 12): ONE order-keyed hash aggregate both dedups
    the (order, part) pairs (collect_set) and assembles each basket as
    an array — the pair generator is then an IN-PLACE per-basket
    combination expression (y > x over the set; fan-out bounded by the
    square of basket size, ~7 lines here), replacing the former
    distinct + basket-keyed self-join, so corpus rows cross exactly one
    exchange. Item supports come from exploding the same staged basket
    frame; the basket count attaches as one literal scalar
    (loop-control collect). The support floor prunes before the metric
    joins."""
    li = load_table(spark, sf_dir, "lineitem")
    baskets = (
        li.select("l_orderkey", "l_partkey")
        .groupBy("l_orderkey")
        .agg(F.collect_set("l_partkey").alias("parts"))
        .select("parts")
        .localCheckpoint(eager=True)
    )
    n_orders = baskets.count()
    item = (
        baskets.select(F.explode("parts").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n_item"))
    )
    combos = F.flatten(
        F.transform(
            F.col("parts"),
            lambda x: F.transform(
                F.filter(F.col("parts"), lambda y: y > x),
                lambda y: F.struct(x.alias("part_a"), y.alias("part_b")),
            ),
        )
    )
    pair = (
        baskets.select(F.explode(combos).alias("p"))
        .select("p.part_a", "p.part_b")
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= BASKET_MIN_SUP)
    )
    ia = item.select(
        F.col("l_partkey").alias("part_a"), F.col("n_item").alias("n_a")
    )
    ib = item.select(
        F.col("l_partkey").alias("part_b"), F.col("n_item").alias("n_b")
    )
    return (
        pair.join(F.broadcast(ia), "part_a")
        .join(F.broadcast(ib), "part_b")
        .select(
            "part_a",
            "part_b",
            F.col("n_ab").cast("bigint").alias("n_ab"),
            F.round(F.col("n_ab").cast("double") / n_orders, 6).alias(
                "support"
            ),
            F.round(F.col("n_ab").cast("double") / F.col("n_a"), 6).alias(
                "confidence"
            ),
            F.round(
                F.col("n_ab").cast("double")
                * n_orders
                / (F.col("n_a") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
    )


# ---------------------------------------------------------------------------
# Grouped exact medians by count selection
# ---------------------------------------------------------------------------

@query(
    "grouped_median_prices",
    oracle="""
WITH j AS (
  SELECT p.p_brand, l.l_extendedprice AS v
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
), vc AS (
  SELECT p_brand, v, count(*) AS c FROM j GROUP BY 1, 2
), cum AS (
  SELECT p_brand, v, c,
         sum(c) OVER (PARTITION BY p_brand ORDER BY v) AS cum,
         sum(c) OVER (PARTITION BY p_brand) AS n
  FROM vc
)
SELECT p_brand, CAST(max(n) AS BIGINT) AS n,
       round(min(CASE WHEN cum >= (n + 1) // 2 THEN v END), 2) AS median
FROM cum GROUP BY 1
""",
    tags=("stats", "median", "window"),
)
def grouped_median_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand EXACT median price by count selection: aggregate to
    distinct (brand, value) counts, cumulate within brand in value
    order, and pick the first value whose cumulative count reaches
    position ceil(n/2) (the lower median — deterministic, no
    interpolation). This is the distributed exact-median shape: group
    state is |distinct values|, never |rows|, and no per-group
    sort-and-collect UDF exists anywhere.

    Scale shape: one hash aggregate collapses rows to distinct values,
    one brand-partitioned cumulative window over those values, one
    final aggregate — the row-count never transits a window. Skewed
    brands bound the window partition by their distinct-value count."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    j = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"]).select(
        "p_brand", F.col("l_extendedprice").alias("v")
    )
    vc = j.groupBy("p_brand", "v").agg(F.count(F.lit(1)).alias("c"))
    wcum = Window.partitionBy("p_brand").orderBy("v")
    wall = Window.partitionBy("p_brand")
    cum = vc.select(
        "p_brand",
        "v",
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(wall).alias("n"),
    )
    target = F.floor((F.col("n") + 1) / 2)
    return cum.groupBy("p_brand").agg(
        F.max("n").cast("bigint").alias("n"),
        F.round(
            F.min(F.when(F.col("cum") >= target, F.col("v"))), 2
        ).alias("median"),
    )


# ---------------------------------------------------------------------------
# Seasonal residual outliers
# ---------------------------------------------------------------------------

@query(
    "seasonal_residual_outliers",
    oracle=f"""
WITH st AS (
  SELECT event_type, hour(ts) AS hod,
         count(*) AS n,
         CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s1,
         CAST(sum(CAST(value * value AS DECIMAL(18,6))) AS DOUBLE) AS s2
  FROM events GROUP BY 1, 2
)
SELECT e.event_id, e.event_type, CAST(hour(e.ts) AS INT) AS hod,
       round(e.value, 2) AS value,
       round((e.value - s1 / n) / sqrt((s2 - s1 * s1 / n) / (n - 1)), 4)
         AS resid_z
FROM events e JOIN st ON e.event_type = st.event_type
                     AND hour(e.ts) = st.hod
WHERE st.n > 1
  AND abs((e.value - s1 / n) / sqrt((s2 - s1 * s1 / n) / (n - 1)))
      > {SEASONAL_Z}
""",
    tags=("events", "outliers", "seasonal", "broadcast"),
)
def seasonal_residual_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal outlier detection: z-score each event against its
    (event_type, hour-of-day) baseline — the de-seasonalized sibling of
    value_outliers_zscore, catching values that are normal globally but
    anomalous FOR THAT HOUR (the nightly-batch-spike / daytime-lull
    distinction a flat threshold misses). Moments are DECIMAL-exact so
    the |z| > {Z} membership test is bit-identical cross-engine.

    Scale shape: the baseline is |types| x 24 rows — broadcast back
    onto the stream; one scan builds it, one scan scores. No window
    over the event table."""
    ev = load_table(spark, sf_dir, "events")
    hod = F.hour("ts")
    st = ev.groupBy("event_type", hod.alias("hod")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast(_DEC)).cast("double").alias("s1"),
        F.sum((F.col("value") * F.col("value")).cast(_DEC))
        .cast("double")
        .alias("s2"),
    )
    z = (F.col("value") - F.col("s1") / F.col("n")) / F.sqrt(
        (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
        / (F.col("n") - 1)
    )
    return (
        ev.withColumn("hod", hod.cast("int"))
        .join(F.broadcast(st), ["event_type", "hod"])
        .filter((F.col("n") > 1) & (F.abs(z) > SEASONAL_Z))
        .select(
            "event_id",
            "event_type",
            "hod",
            F.round("value", 2).alias("value"),
            F.round(z, 4).alias("resid_z"),
        )
    )


# ---------------------------------------------------------------------------
# Hierarchy path enumeration
# ---------------------------------------------------------------------------

@query(
    "hierarchy_path_enumeration",
    oracle="""
WITH RECURSIVE edges AS (
  SELECT c.o_orderkey AS child_id, c.o_orderkey // 10 AS parent_id
  FROM orders c JOIN orders p ON p.o_orderkey = c.o_orderkey // 10
  WHERE c.o_orderkey // 10 <> c.o_orderkey
), roots AS (
  SELECT o_orderkey AS node_id FROM orders
  WHERE NOT EXISTS (SELECT 1 FROM edges e WHERE e.child_id = o_orderkey)
), walk AS (
  SELECT node_id, node_id AS root_id, 0 AS depth,
         CAST(node_id AS VARCHAR) AS path
  FROM roots
  UNION ALL
  SELECT e.child_id, w.root_id, w.depth + 1,
         w.path || '/' || CAST(e.child_id AS VARCHAR)
  FROM walk w JOIN edges e ON e.parent_id = w.node_id
)
SELECT node_id, root_id, CAST(depth AS INT) AS depth, path
FROM walk
""",
    tags=("hierarchy", "recursive", "path"),
)
def hierarchy_path_enumeration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-path enumeration over the derived order tree (the
    same k -> k div 10 adjacency as order_tree_rollup): every node's
    full '/'-joined path from its root — the path-index build BOM
    explosions and tree-breadcrumb UIs consume, and the column a
    LIKE-prefix query can then answer subtree membership with.

    Scale shape (round-11): the adjacency is ARITHMETIC (k -> k div 10),
    so a node's entire candidate ancestor chain is its <= 18 decimal
    prefixes — the recursive frontier walk (O(depth) sequential
    join+checkpoint+isEmpty driver jobs, ~16 jobs on the fixtures)
    collapses to ONE plan: explode each node's prefixes (bounded
    fan-out, narrow rows), one ANTI-join against the key set finds each
    node's first MISSING ancestor, and the walk's reachability is
    exactly the contiguous run below that gap (the node under the gap
    is its chain's root, because its parent key is absent — the same
    stopping rule the frontier walk applies level by level), so
    depth = first gap - 1 via a plain min aggregate. root and path are
    decimal-string prefixes of the key itself (exact integer
    arithmetic, no list collection). Two narrow shuffles, zero driver
    loops."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey")
    nodes = orders.select(F.col("o_orderkey").alias("node_id"))
    # candidate ancestors p_i = k div 10^i for i = 1..digits(k): the
    # chain stops at p = 0's self-loop (the edge relation's parent !=
    # child clause), so exactly digits(k) candidates exist and the LAST
    # one is 0 — a legitimate parent when key 0 is present (it is in
    # the fixtures). k = 0 itself has no candidates (its only edge is
    # the excluded self-loop). p_19 is 0 for any int64, hence the
    # literal tail slot; slice keeps positions aligned with i - 1.
    digits = F.when(
        F.col("o_orderkey") >= 1,
        F.length(F.col("o_orderkey").cast("string")).cast("int"),
    ).otherwise(F.lit(0))
    anc = F.slice(
        F.array(
            *[F.expr(f"o_orderkey div {10 ** i}") for i in range(1, 19)],
            F.expr("CAST(0 AS BIGINT)"),
        ),
        F.lit(1),
        digits,
    )
    pref = orders.select(
        F.col("o_orderkey").alias("node_id"),
        F.posexplode(anc).alias("i0", "p"),
    ).select("node_id", (F.col("i0") + 1).cast("int").alias("i"), "p")
    keys = orders.select(F.col("o_orderkey").alias("p"))
    # depth = (first MISSING prefix) - 1, or the full candidate count
    # when every prefix exists: one anti-join + a plain min aggregate —
    # no per-group list collection, map-side partials all the way
    miss = (
        pref.join(keys, "p", "left_anti")
        .groupBy("node_id")
        .agg((F.min("i") - 1).cast("int").alias("dm"))
    )
    enriched = nodes.join(miss, "node_id", "left")
    s = F.col("node_id").cast("string")
    ln = F.when(F.col("node_id") >= 1, F.length(s).cast("int")).otherwise(
        F.lit(0)
    )
    d_col = F.coalesce(F.col("dm"), ln)
    # ancestors are decimal-string prefixes: p_j = the first L - j
    # characters of str(k) for j < L, and 0 at j = L (k div 10^L) —
    # exact integer arithmetic via substring, no float pow anywhere
    root = F.when(
        d_col < ln, F.substring(s, 1, ln - d_col).cast("bigint")
    ).otherwise(F.lit(0).cast("bigint"))
    path = F.concat_ws(
        "/",
        F.transform(
            F.sequence(d_col, F.lit(0), F.lit(-1)),
            lambda j: F.when(j < ln, F.substring(s, F.lit(1), ln - j)).otherwise(
                F.lit("0")
            ),
        ),
    )
    return enriched.select(
        "node_id",
        root.alias("root_id"),
        d_col.alias("depth"),
        path.alias("path"),
    )
