"""Markov attribution wave (44): data-driven channel attribution via
removal effects on the session Markov chain.

The step past first/last-touch (plans/attribution.py): model each
session as a Markov chain over channels with CONV/NULL absorbing
states, compute the conversion (absorption) probability from START,
then re-compute it with each channel REMOVED — a channel's removal
effect (1 - P_removed/P_full) is its causal-ish contribution, and
normalized removal effects are the Markov attribution shares
(Anderl et al.'s removal-effect model, the industry-standard
data-driven attribution).

Absorption probabilities are the fixpoint of
v(s) = p(s->CONV) + sum_t p(s->t) v(t); both engines run the SAME
truncated iteration ({_N_ITERS} unrolled steps, each product 12-rounded
and DECIMAL-summed, each state value 9-rounded), so the result is
bit-identical by construction — convergence error is shared, not
drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.plans.registry import query

#: session gap (microseconds) — the engine's 30-minute session bound
_GAP_US = 1_800_000_000

#: absorption-iteration depth (shared EXACTLY by engine and oracle)
_N_ITERS = 25

#: non-converting channels (the fixture's event vocabulary sans purchase)
_CHANNELS = ("click", "error", "signup", "view")


def _chain_sql() -> str:
    """Shared oracle CTEs: sessionized event paths truncated at first
    purchase -> row-normalized transition probabilities with START /
    CONV / NULL states."""
    return f"""
e AS (
  SELECT user_id, epoch_us(ts) AS tus, event_id, event_type FROM events
), g AS (
  SELECT *, CASE WHEN lag(tus) OVER w IS NULL
                 OR tus - lag(tus) OVER w > {_GAP_US} THEN 1 ELSE 0 END
              AS new_sess
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)
), s AS (
  SELECT user_id, tus, event_id, event_type,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY tus, event_id
                             ROWS UNBOUNDED PRECEDING) AS seq
  FROM g
), ordered AS (
  SELECT user_id, seq, event_type,
         row_number() OVER (PARTITION BY user_id, seq
                            ORDER BY tus, event_id) AS rn
  FROM s
), fp AS (
  SELECT user_id, seq, min(rn) AS fp FROM ordered
  WHERE event_type = 'purchase' GROUP BY 1, 2
), lab AS MATERIALIZED (
  SELECT o.user_id, o.seq, o.rn,
         CASE WHEN o.event_type = 'purchase' THEN 'CONV'
              ELSE o.event_type END AS st
  FROM ordered o LEFT JOIN fp USING (user_id, seq)
  WHERE fp.fp IS NULL OR o.rn <= fp.fp
), trans0 AS (
  SELECT st AS dst,
         lag(st) OVER (PARTITION BY user_id, seq ORDER BY rn) AS src
  FROM lab
), mids AS (SELECT src, dst FROM trans0 WHERE src IS NOT NULL),
starts AS (SELECT 'START' AS src, st AS dst FROM lab WHERE rn = 1),
ends AS (
  SELECT l.st AS src, 'NULL' AS dst
  FROM lab l JOIN (SELECT user_id, seq, max(rn) AS mx FROM lab
                   GROUP BY 1, 2) m
    ON m.user_id = l.user_id AND m.seq = l.seq AND l.rn = m.mx
  WHERE l.st <> 'CONV'
), alltr AS (
  SELECT * FROM starts UNION ALL SELECT * FROM mids
  UNION ALL SELECT * FROM ends
), cnt AS MATERIALIZED (
  SELECT src, dst, CAST(count(*) AS BIGINT) AS c FROM alltr GROUP BY 1, 2
), rowsum AS (SELECT src, CAST(sum(c) AS BIGINT) AS t FROM cnt GROUP BY 1),
p AS MATERIALIZED (
  SELECT src, dst, round(CAST(c AS DOUBLE) / t, 9) AS p
  FROM cnt JOIN rowsum USING (src)
), scen AS (
  SELECT unnest(['full', {', '.join(repr(c) for c in _CHANNELS)}])
    AS scenario
), states AS (
  SELECT DISTINCT src AS s FROM p
), live AS (
  SELECT scenario, s FROM states CROSS JOIN scen
  WHERE scenario = 'full' OR s <> scenario
), tt AS MATERIALIZED (
  SELECT scen.scenario, p.src, p.dst, p.p
  FROM p CROSS JOIN scen
  WHERE p.dst NOT IN ('CONV', 'NULL')
    AND (scen.scenario = 'full'
         OR (p.src <> scen.scenario AND p.dst <> scen.scenario))
), base AS MATERIALIZED (
  SELECT live.scenario, live.s,
         coalesce((SELECT pc.p FROM p pc
                   WHERE pc.src = live.s AND pc.dst = 'CONV'), 0.0) AS b
  FROM live
)"""


def _absorption_sql() -> str:
    # every iteration CTE is MATERIALIZED: without the barrier DuckDB
    # inlines the whole 25-deep chain into one tree and its join-order
    # planner blows up combinatorially (observed: minutes of planning
    # at sf0.01); materialization makes planning linear in depth
    steps = [
        "v1 AS MATERIALIZED (SELECT scenario, s, round(b, 9) AS v FROM base)"
    ]
    for k in range(1, _N_ITERS):
        steps.append(
            f"""v{k + 1} AS MATERIALIZED (
  SELECT base.scenario, base.s,
         round(base.b + coalesce(agg.acc, 0.0), 9) AS v
  FROM base LEFT JOIN (
    SELECT tt.scenario, tt.src AS s,
           CAST(sum(CAST(round(tt.p * v{k}.v, 12) AS DECIMAL(28,14)))
                AS DOUBLE) AS acc
    FROM tt JOIN v{k} ON v{k}.scenario = tt.scenario
                     AND v{k}.s = tt.dst
    GROUP BY 1, 2
  ) agg ON agg.scenario = base.scenario AND agg.s = base.s
)"""
        )
    return ",\n".join(steps)


def _attribution_oracle() -> str:
    last = f"v{_N_ITERS}"
    return f"""
WITH {_chain_sql().strip()},
{_absorption_sql()},
pstart AS (
  SELECT scenario, v FROM {last} WHERE s = 'START'
), eff AS (
  SELECT scenario AS channel,
         (SELECT v FROM pstart WHERE scenario = 'full') AS p_full,
         v AS p_removed,
         round(1 - v / (SELECT v FROM pstart WHERE scenario = 'full'), 9)
           AS removal_effect
  FROM pstart WHERE scenario <> 'full'
), tot AS (
  SELECT CAST(sum(CAST(round(removal_effect, 9) AS DECIMAL(28,12)))
              AS DOUBLE) AS t
  FROM eff
)
SELECT eff.channel,
       round(eff.p_full, 6) AS p_conversion,
       round(eff.p_removed, 6) AS p_without_channel,
       round(eff.removal_effect, 6) AS removal_effect,
       round(eff.removal_effect / tot.t, 6) AS attribution_share
FROM eff CROSS JOIN tot
"""


@query(
    "markov_attribution_removal",
    oracle=_attribution_oracle(),
    tags=("attribution", "markov", "iterative"),
)
def markov_attribution_removal(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Markov removal-effect channel attribution: sessions become paths
    START -> channels -> CONV (first purchase) / NULL (no purchase);
    the chain's absorption probability from START is the baseline
    conversion rate; removing each channel (its transitions vanish,
    their mass falls to NULL) and re-absorbing gives the channel's
    removal effect 1 - P_removed/P_full; normalized effects are the
    attribution shares — the data-driven model that, unlike first/last
    touch, credits ASSISTING channels.

    Scale shape: path construction is keyed sessionize windows + one
    (src, dst) count aggregate — the ONLY corpus-sized work; the five
    absorption computations run {_N_ITERS} unrolled iterations over a
    |scenarios| x |states| <= 30-row frame (joins on a bounded matrix,
    checkpointed every few steps to keep lineage flat). Every
    iteration's products are 12-rounded DECIMAL sums and every state
    value 9-rounded, so both engines truncate to the identical
    fixpoint approximation."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "user_id",
        F.unix_micros("ts").alias("tus"),
        "event_id",
        "event_type",
    )
    w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    prev = F.lag("tus").over(w)
    g = e.withColumn(
        "new_sess",
        F.when(prev.isNull() | (F.col("tus") - prev > _GAP_US), 1).otherwise(
            0
        ),
    )
    s = g.withColumn(
        "seq",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    ws = Window.partitionBy("user_id", "seq").orderBy("tus", "event_id")
    ordered = s.select(
        "user_id",
        "seq",
        "event_type",
        F.row_number().over(ws).alias("rn"),
    )
    fp = (
        ordered.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "seq")
        .agg(F.min("rn").alias("fp"))
    )
    lab = (
        ordered.join(fp, ["user_id", "seq"], "left")
        .filter(F.col("fp").isNull() | (F.col("rn") <= F.col("fp")))
        .select(
            "user_id",
            "seq",
            "rn",
            F.when(F.col("event_type") == "purchase", F.lit("CONV"))
            .otherwise(F.col("event_type"))
            .alias("st"),
        )
        .localCheckpoint(eager=True)
    )
    wl = Window.partitionBy("user_id", "seq").orderBy("rn")
    mids = (
        lab.withColumn("src", F.lag("st").over(wl))
        .filter(F.col("src").isNotNull())
        .select("src", F.col("st").alias("dst"))
    )
    starts = lab.filter(F.col("rn") == 1).select(
        F.lit("START").alias("src"), F.col("st").alias("dst")
    )
    mx = lab.groupBy("user_id", "seq").agg(F.max("rn").alias("mx"))
    ends = (
        lab.join(mx, ["user_id", "seq"])
        .filter((F.col("rn") == F.col("mx")) & (F.col("st") != "CONV"))
        .select(F.col("st").alias("src"), F.lit("NULL").alias("dst"))
    )
    # cnt/p are <= ~150-row frames over the checkpointed `lab`; the
    # round-10 shape eagerly checkpointed both, paying two sequential
    # driver jobs to avoid re-running a sub-second aggregate — the
    # single collect below evaluates the whole (deterministic, exact-
    # integer) subtree in one job instead (round 11)
    cnt = (
        starts.union(mids)
        .union(ends)
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    rowsum = cnt.groupBy("src").agg(F.sum("c").alias("t"))
    p = cnt.join(rowsum, "src").select(
        "src",
        "dst",
        F.round(F.col("c").cast("double") / F.col("t"), 9).alias("p"),
    )

    # The chain matrix is BOUNDED (|states| <= 7, |scenarios| = 5,
    # <= ~150 cells) — loop-control scale, the k-means-codebook class —
    # so the 25 absorption iterations run on the DRIVER over the
    # collected matrix instead of 25 rounds of tiny Spark jobs (which
    # cost ~90s of scheduler overhead for 30-row frames). Rounding
    # mimics Spark's F.round exactly (decimal HALF_UP on repr).
    from decimal import ROUND_HALF_UP, Decimal

    def _r(x: float, n: int) -> float:
        return float(
            Decimal(repr(x)).quantize(
                Decimal(1).scaleb(-n), rounding=ROUND_HALF_UP
            )
        )

    prows = p.collect()
    states = sorted({r["src"] for r in prows})
    scenarios = ["full", *_CHANNELS]
    pstart = {}
    for scen in scenarios:
        live = [st for st in states if scen == "full" or st != scen]
        pc = {
            r["src"]: r["p"]
            for r in prows
            if r["dst"] == "CONV" and r["src"] in live
        }
        tt = [
            (r["src"], r["dst"], r["p"])
            for r in prows
            if r["dst"] not in ("CONV", "NULL")
            and r["src"] in live
            and (scen == "full" or r["dst"] != scen)
        ]
        v = {st: _r(pc.get(st, 0.0), 9) for st in live}
        for _ in range(1, _N_ITERS):
            acc = {st: Decimal(0) for st in live}
            for src, dst, pr in tt:
                if dst in v:
                    acc[src] += Decimal(repr(_r(pr * v[dst], 12)))
            v = {
                st: _r(pc.get(st, 0.0) + float(acc[st]), 9)
                for st in live
            }
        pstart[scen] = v.get("START", 0.0)
    p_full = pstart["full"]
    # final arithmetic through Spark expressions (same rounding engine
    # as every other query), from the unrounded absorption values
    eff_df = spark.createDataFrame(
        [(c, float(p_full), float(pstart[c])) for c in _CHANNELS],
        "channel string, p_full double, p_removed double",
    ).withColumn(
        "re", F.round(1 - F.col("p_removed") / F.col("p_full"), 9)
    ).localCheckpoint(eager=True)
    tot = (
        eff_df.agg(
            F.sum(F.round(F.col("re"), 9).cast("decimal(28,12)"))
            .cast("double")
            .alias("t")
        ).first()["t"]
    )
    return eff_df.select(
        "channel",
        F.round("p_full", 6).alias("p_conversion"),
        F.round("p_removed", 6).alias("p_without_channel"),
        F.round("re", 6).alias("removal_effect"),
        F.round(F.col("re") / F.lit(tot), 6).alias("attribution_share"),
    )
