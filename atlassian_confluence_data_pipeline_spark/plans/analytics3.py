"""Eighth-wave analytics operators.

Scale-pattern demonstrations that round out the OLAP surface:

- a single-pass fixed-bin quantile sketch next to the exact quantile
  (the constant-memory estimate every monitoring pipeline substitutes
  for a global sort, with its error audited in-query),
- a Bloom-prefiltered join (the runtime-filter pattern: the probe side
  is pruned by a constant-size bitmap BEFORE the join — result
  provably identical to the plain join, which is exactly what the
  oracle runs),
- per-node triangle counts + local clustering coefficients over the
  LSH near-dup graph (the community-density diagnostic on the dedup
  graph's structure),
- a Pareto-frontier (skyline) query over orders via a running-max
  window — the O(n log n) form of the quadratic NOT EXISTS dominance
  test the oracle runs.

House float discipline throughout: DECIMAL-exact money sums
(plans/_exact.py), literal doubles carried bit-exactly between the
Python driver and both engines, integer bin arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.functions.text import ROLLING_MOD
from atlassian_confluence_data_pipeline_spark.plans._exact import dsum, sql_dsum
from atlassian_confluence_data_pipeline_spark.plans.curation4 import (
    BLOOM_BITS,
    BLOOM_PROBES,
)
from atlassian_confluence_data_pipeline_spark.operators.windows import (
    distributed_prefix_rank,
    equal_width_bucketizer,
    kth_smallest,
)
from atlassian_confluence_data_pipeline_spark.plans.registry import query

#: quantile sketch: fixed equi-width bin count (constant memory)
QBINS = 256
QPROBS = (0.5, 0.9, 0.99)

#: bloom semi-join: dim-side predicate
BLOOM_JOIN_PRIORITY = "1-URGENT"
BLOOM_JOIN_YEAR = 1995


# ---------------------------------------------------------------------------
# Single-pass binned quantile sketch vs exact
# ---------------------------------------------------------------------------

def _quantile_oracle() -> str:
    probs = ", ".join(f"({p!r})" for p in QPROBS)
    return f"""
WITH mm AS (
  SELECT min(l_extendedprice) AS mn, max(l_extendedprice) AS mx,
         count(*) AS n
  FROM lineitem
), p(p) AS (VALUES {probs}),
binned AS (
  SELECT least(CAST(floor((l_extendedprice - mm.mn)
                          / ((mm.mx - mm.mn) / {QBINS})) AS INT),
               {QBINS - 1}) AS bin
  FROM lineitem CROSS JOIN mm
), bc AS (
  SELECT bin, count(*) AS cnt FROM binned GROUP BY 1
), cum AS (
  SELECT bin, cnt, sum(cnt) OVER (ORDER BY bin) AS cum FROM bc
), k AS (
  SELECT p.p, CAST(ceil(p.p * mm.n) AS BIGINT) AS k FROM p CROSS JOIN mm
), hit AS (
  SELECT k.p, k.k, min(cum.bin) AS bin
  FROM k JOIN cum ON cum.cum >= k.k GROUP BY 1, 2
), est AS (
  SELECT h.p, h.k, h.bin, c.cnt, c.cum - c.cnt AS cumprev
  FROM hit h JOIN cum c ON c.bin = h.bin
), vd AS (
  SELECT l_extendedprice AS v, count(*) AS cnt FROM lineitem GROUP BY 1
), vcum AS (
  SELECT v, sum(cnt) OVER (ORDER BY v) AS cum FROM vd
), exact AS (
  SELECT k.p, min(vcum.v) AS exact_q
  FROM k JOIN vcum ON vcum.cum >= k.k GROUP BY 1
)
SELECT e.p,
       round(mm.mn + ((mm.mx - mm.mn) / {QBINS})
             * (e.bin + CAST(e.k - e.cumprev AS DOUBLE) / e.cnt), 6)
         AS est_quantile,
       round(x.exact_q, 2) AS exact_quantile,
       round(abs(round(mm.mn + ((mm.mx - mm.mn) / {QBINS})
                       * (e.bin + CAST(e.k - e.cumprev AS DOUBLE) / e.cnt), 6)
                 - round(x.exact_q, 2)), 6) AS abs_err
FROM est e JOIN exact x ON e.p = x.p CROSS JOIN mm
"""


@query(
    "binned_quantile_estimates",
    oracle=_quantile_oracle(),
    tags=("stats", "sketch", "quantile", "scalepath"),
)
def binned_quantile_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass fixed-bin quantile sketch with an in-query error
    audit: estimate p50/p90/p99 of l_extendedprice from a {B}-bin
    equi-width histogram (one scan, constant memory — the shape that
    replaces a global sort at 100 TB), next to the EXACT quantile
    (first value whose cumulative count reaches ceil(p*n)) and the
    absolute error. Both engines share the bin edges bit-for-bit:
    min/max/width are the same doubles, bins are integer arithmetic.

    Scale shape: the sketch is one hash aggregate to {B} rows and a
    {B}-row cumulative window (constant-bounded domain — fine
    unpartitioned). The exact audit column rides the two-pass
    distributed prefix sum over DISTINCT values
    (distributed_prefix_rank: per-range cumulative counts + boundary-
    offset add — no single-partition window even for the audit).
    min/max are scalar loop-control aggregates."""
    li = load_table(spark, sf_dir, "lineitem").select("l_extendedprice")
    mm = li.agg(
        F.min("l_extendedprice").alias("mn"),
        F.max("l_extendedprice").alias("mx"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    mn, mx, n = float(mm["mn"]), float(mm["mx"]), int(mm["n"])
    width = (mx - mn) / QBINS

    binned = li.select(
        F.least(
            F.floor((F.col("l_extendedprice") - mn) / width).cast("int"),
            F.lit(QBINS - 1),
        ).alias("bin")
    )
    bc = binned.groupBy("bin").agg(F.count(F.lit(1)).alias("cnt"))
    cum = bc.withColumn(
        "cum", F.sum("cnt").over(Window.orderBy("bin"))
    )
    import math

    kdf = spark.createDataFrame(
        [(float(p), int(math.ceil(p * n))) for p in QPROBS], "p double, k bigint"
    )
    hit = (
        kdf.join(cum, F.col("cum") >= F.col("k"))
        .groupBy("p", "k")
        .agg(F.min("bin").alias("bin"))
    )
    est = hit.join(cum.withColumnRenamed("bin", "bin2"), F.col("bin2") == F.col("bin")).select(
        "p",
        "k",
        "bin",
        "cnt",
        (F.col("cum") - F.col("cnt")).alias("cumprev"),
    )
    # exact audit column: "the first value whose cumulative count
    # reaches ceil(p*n)" IS the kth order statistic — distributed
    # SELECTION over the raw column (O(1) equal-width buckets over the
    # known min/max, only hit buckets sorted) replaces the round-10
    # shape's distinct-value domain table + checkpointed prefix pass:
    # at sf0.1 the price domain is ~97% distinct, so that "domain"
    # table WAS the corpus and its materialization pure overhead
    ks = sorted({int(math.ceil(p * n)) for p in QPROBS})
    sel = kth_smallest(
        li,
        "l_extendedprice",
        ks,
        bucket_of=equal_width_bucketizer(mn, mx, 32),
    )
    exact = spark.createDataFrame(
        [(float(p), float(sel[int(math.ceil(p * n))])) for p in QPROBS],
        "p double, exact_q double",
    )
    est_q = F.round(
        mn
        + width
        * (F.col("bin") + (F.col("k") - F.col("cumprev")).cast("double") / F.col("cnt")),
        6,
    )
    return (
        est.join(exact, "p")
        .select(
            "p",
            est_q.alias("est_quantile"),
            F.round("exact_q", 2).alias("exact_quantile"),
            F.round(F.abs(est_q - F.round("exact_q", 2)), 6).alias("abs_err"),
        )
    )


# ---------------------------------------------------------------------------
# Bloom-prefiltered join (runtime-filter pattern)
# ---------------------------------------------------------------------------

@query(
    "bloom_semi_join_revenue",
    oracle=f"""
SELECT CAST(count(*) AS BIGINT) AS n_lines,
       {sql_dsum("l.l_extendedprice * (1 - l.l_discount)")} AS revenue
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderpriority = '{BLOOM_JOIN_PRIORITY}'
  AND year(o.o_orderdate) = {BLOOM_JOIN_YEAR}
""",
    tags=("join", "bloom", "runtime-filter", "scalepath"),
)
def bloom_semi_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered join — the runtime-filter pattern: the
    filtered dim side (urgent {Y} orders) populates a constant-size
    Bloom bitmap over its join keys; the fact side (lineitem) probes
    the bitmap BEFORE the join, so only possibly-matching rows reach
    the shuffle/build; the exact join then removes the bitmap's false
    positives. The result is PROVABLY identical to the plain join —
    the oracle runs the plain join, so the parity hash is the
    transparency proof.

    Scale shape: this is the explicit, engine-portable form of what
    Spark's injected runtime filters / DPP do natively — at 100 TB the
    bitmap (production: ~1e9 bits, broadcast once per executor) prunes
    the probe side at the SCAN, cutting shuffle volume by the join's
    selectivity. Bitmap build collects <= {BITS} positions (fixed-size
    loop-control data); the dim side itself also broadcasts (it is
    filter-tiny), so no fact-side shuffle survives at all."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == BLOOM_JOIN_PRIORITY)
        & (F.year("o_orderdate") == BLOOM_JOIN_YEAR)
    )

    def _pos(j: int, k):
        # key reduced below 2^31 before the affine multiply (overflow
        # discipline: a*k must stay < 2^62 for ANY key range)
        a, b = BLOOM_PROBES[j]
        return (
            (F.lit(a) * (k % ROLLING_MOD) + F.lit(b)) % ROLLING_MOD
        ) % BLOOM_BITS

    set_positions = sorted(
        r["p"]
        for r in orders.select(
            F.explode(
                F.array(*[_pos(j, F.col("o_orderkey")) for j in range(3)])
            ).alias("p")
        )
        .distinct()
        .collect()
    )
    bitmap = [0] * BLOOM_BITS
    for p in set_positions:
        bitmap[p] = 1
    ba = F.expr("array(" + ",".join(str(v) for v in bitmap) + ")")
    probed = li.filter(
        (F.element_at(ba, (_pos(0, F.col("l_orderkey")) + 1).cast("int")) == 1)
        & (F.element_at(ba, (_pos(1, F.col("l_orderkey")) + 1).cast("int")) == 1)
        & (F.element_at(ba, (_pos(2, F.col("l_orderkey")) + 1).cast("int")) == 1)
    )
    return probed.join(
        F.broadcast(orders.select("o_orderkey")),
        probed["l_orderkey"] == F.col("o_orderkey"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "revenue"
        ),
    )


# ---------------------------------------------------------------------------
# Triangles + clustering coefficients on the near-dup graph
# ---------------------------------------------------------------------------

def _triangle_oracle() -> str:
    from atlassian_confluence_data_pipeline_spark.plans import multimodal  # noqa: F401
    from atlassian_confluence_data_pipeline_spark.plans.registry import QUERIES

    pairs_sql = QUERIES["near_dup_pairs_lsh"].oracle
    return f"""
WITH pairs AS ({pairs_sql}),
e AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
), und AS (
  SELECT a, b FROM e UNION ALL SELECT b, a FROM e
), deg AS (
  SELECT a AS node, CAST(count(*) AS BIGINT) AS degree FROM und GROUP BY 1
), tri AS (
  SELECT e1.a AS a, e1.b AS b, e2.b AS c
  FROM e e1 JOIN e e2 ON e2.a = e1.b
  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
), pertri AS (
  SELECT a AS node FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
), tcount AS (
  SELECT node, CAST(count(*) AS BIGINT) AS n_triangles FROM pertri GROUP BY 1
)
SELECT d.node AS doc_id, d.degree,
       coalesce(t.n_triangles, 0) AS n_triangles,
       round(CASE WHEN d.degree >= 2
             THEN 2.0 * coalesce(t.n_triangles, 0)
                  / (d.degree * (d.degree - 1))
             ELSE 0.0 END, 6) AS clustering_coeff
FROM deg d LEFT JOIN tcount t USING (node)
"""


@query(
    "neardup_triangle_stats",
    oracle=_triangle_oracle(),
    tags=("graph", "dedup", "diagnostic"),
)
def neardup_triangle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts and local clustering coefficients over
    the LSH near-dup graph — the community-density diagnostic that
    separates tight duplicate CLIQUES (coefficient ~1: templated spam,
    mirrored pages) from chain-like borderline matches (coefficient ~0)
    before choosing cluster-collapse policy. Triangles enumerate once
    each via the a<b<c ordered edge list (every near-dup pair is
    emitted id_a < id_b), i.e. the standard two-join wedge-close.

    Scale shape: the edge list comes from the near-linear LSH chain
    (checkpointed once, reused by all three join sites); the wedge join
    is an equi-join on the shared endpoint and the close is an
    equi-join on (a, c) — triangle work scales with wedge count, the
    graph-native cost, never with the corpus. Degree/triangle tallies
    are hash aggregates with map-side partials."""
    from atlassian_confluence_data_pipeline_spark.plans._cache import (
        shared_pair_table,
    )
    from atlassian_confluence_data_pipeline_spark.plans.multimodal import (
        near_dup_pairs_lsh,
    )

    e = shared_pair_table(
        spark, sf_dir, "near_dup_pairs_lsh", near_dup_pairs_lsh
    ).select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    und = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = und.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("degree")
    )
    e1 = e
    e2 = e.select(F.col("a").alias("b"), F.col("b").alias("c"))
    e3 = e.select(F.col("a").alias("a3"), F.col("b").alias("c3"))
    tri = (
        e1.join(e2, "b")
        .join(
            e3,
            (F.col("a3") == F.col("a")) & (F.col("c3") == F.col("c")),
        )
        .select("a", "b", "c")
    )
    pertri = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
    )
    tcount = pertri.groupBy("node").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_triangles")
    )
    coeff = F.when(
        F.col("degree") >= 2,
        2.0
        * F.col("n_triangles").cast("double")
        / (F.col("degree") * (F.col("degree") - 1)),
    ).otherwise(0.0)
    return (
        deg.join(tcount, "node", "left")
        .select(
            F.col("node").alias("doc_id"),
            "degree",
            F.coalesce("n_triangles", F.lit(0)).alias("n_triangles"),
        )
        .select(
            "doc_id",
            "degree",
            "n_triangles",
            F.round(coeff, 6).alias("clustering_coeff"),
        )
    )


# ---------------------------------------------------------------------------
# Pareto frontier (skyline)
# ---------------------------------------------------------------------------

@query(
    "pareto_orders",
    oracle="""
SELECT a.o_orderkey, strftime(a.o_orderdate, '%Y-%m-%d') AS order_date,
       round(a.o_totalprice, 2) AS o_totalprice
FROM orders a
WHERE NOT EXISTS (
  SELECT 1 FROM orders b
  WHERE b.o_orderdate > a.o_orderdate
    AND b.o_totalprice > a.o_totalprice
)
""",
    tags=("window", "skyline", "analytics"),
)
def pareto_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier (skyline) over orders on (recency, price): an
    order survives unless some other order is STRICTLY later AND
    strictly more expensive. The engine runs the O(n log n) form — a
    running max of price over strictly-later order dates (range frame
    on the day number), keep rows the running max never exceeds —
    where the oracle runs the literal quadratic NOT EXISTS dominance
    test; identical results prove the rewrite.

    Scale shape: the distributed prefix-MAX composition the reference
    formulation reduces to: the fact table first collapses to one max
    price per DAY (hash aggregate — the only pass over the corpus),
    then distributed_prefix_rank computes the exclusive running max
    over strictly-later days on the |days| series (per-range window +
    boundary max offsets — no single-partition window; ordering by
    NEGATED day number renders 'strictly later' as 'strictly
    preceding'), and the tiny day->threshold map broadcasts back onto
    the facts for the keep filter. Dominance by a SAME-day order is
    impossible by definition (the dominator must be strictly later),
    so the per-day collapse is lossless."""
    orders = load_table(spark, sf_dir, "orders")
    day = F.datediff(F.col("o_orderdate"), F.lit("1992-01-01"))
    daymax = (
        orders.groupBy(day.alias("day"))
        .agg(F.max("o_totalprice").alias("mx"))
        .withColumn("nday", -F.col("day"))
        .localCheckpoint(eager=True)
    )
    # exclusive prefix max in nday order == max over strictly LATER days
    lm = distributed_prefix_rank(
        daymax, ["nday"], exclusive_maxes={"lm": "mx"}
    ).select("day", "lm")
    return (
        orders.withColumn("day", day)
        .join(F.broadcast(lm), "day", "left")
        .filter(F.col("lm").isNull() | (F.col("lm") <= F.col("o_totalprice")))
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
        )
    )
