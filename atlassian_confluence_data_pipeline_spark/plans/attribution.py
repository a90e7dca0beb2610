"""Round-4 wave: attribution & robust-statistics analytics.

The marketing/product-analytics surface a warehouse team runs daily,
each piece exercising a scale-pattern the engine now owns:

- cumulative distinct users by day — EXACT cumulative distinct via the
  first-appearance reduction + the distributed prefix sum (the shape
  that replaces a quadratic day-by-day COUNT(DISTINCT)),
- first-touch / last-touch revenue attribution — per-user keyed windows
  with IGNORE NULLS carries (no cross-user state, no self-join),
- forward as-of join (click -> NEXT purchase) — the time-reversed
  sibling of asof_last_click via operators/joins.asof_join_forward,
- per-source weighted sampling without replacement — the keyed
  (stratified) form of weighted_sample_wor's Efraimidis-Spirakis draw,
- median / MAD robust outlier detection — exact integer medians by
  count selection over distributed prefix sums (no global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.functions.text import ROLLING_MOD
from atlassian_confluence_data_pipeline_spark.operators.joins import (
    asof_join_forward,
)
from atlassian_confluence_data_pipeline_spark.operators.lsh import MINHASH_PERMS
from atlassian_confluence_data_pipeline_spark.operators.windows import (
    distributed_prefix_rank,
)
from atlassian_confluence_data_pipeline_spark.plans.registry import query

_DEC = "decimal(18,6)"

#: per-source weighted sample: affine perm for the uniform draw + k
STRAT_SAMPLE_PERM = MINHASH_PERMS[54]
STRAT_SAMPLE_K = 5

#: robust outliers: MAD multiplier (3 sigma via the normal-consistency
#: constant 1.4826)
MAD_SIGMA = 3.0
MAD_CONSISTENCY = 1.4826


@query(
    "cumulative_distinct_users_daily",
    oracle="""
WITH f AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS d FROM events GROUP BY 1
), pd AS (
  SELECT d, count(*) AS nu FROM f GROUP BY 1
)
SELECT strftime(d, '%Y-%m-%d') AS day,
       CAST(nu AS BIGINT) AS new_users,
       CAST(sum(nu) OVER (ORDER BY d) AS BIGINT) AS cum_users
FROM pd
""",
    tags=("events", "retention", "distinct", "prefix"),
)
def cumulative_distinct_users_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users-to-date curve: EXACT cumulative distinct user count per
    day. The naive form recomputes COUNT(DISTINCT) over a growing
    prefix per day (quadratic); the engine form is the first-appearance
    reduction — each user contributes exactly once, on their first
    active day — then ONE distributed prefix sum over the day series.
    Growth reporting's headline curve at linear cost.

    Scale shape: one per-user hash aggregate over the facts, one |days|
    aggregate, then distributed_prefix_rank (per-range cumsum +
    boundary offsets — no single-partition window)."""
    ev = load_table(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("d"))
    pd_ = (
        f.groupBy("d")
        .agg(F.count(F.lit(1)).alias("nu"))
        .withColumn("dnum", F.datediff(F.col("d"), F.lit("1970-01-01")))
        .localCheckpoint(eager=True)
    )
    cum = distributed_prefix_rank(pd_, ["dnum"], sums={"cum_users": "nu"})
    return cum.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("nu").cast("bigint").alias("new_users"),
        F.col("cum_users").cast("bigint").alias("cum_users"),
    )


@query(
    "first_last_touch_attribution",
    oracle=f"""
WITH t AS (
  SELECT user_id, event_type, value,
         first_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                     IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS first_touch,
         last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS last_touch
  FROM events
), p AS (
  SELECT * FROM t WHERE event_type = 'purchase' AND first_touch IS NOT NULL
), u AS (
  SELECT 'first_touch' AS model, first_touch AS channel, value FROM p
  UNION ALL
  SELECT 'last_touch' AS model, last_touch AS channel, value FROM p
)
SELECT model, channel,
       CAST(count(*) AS BIGINT) AS n_purchases,
       round(CAST(sum(CAST(value AS {_DEC.upper()})) AS DOUBLE), 2)
         AS revenue
FROM u GROUP BY 1, 2
""",
    tags=("events", "attribution", "window", "funnel"),
)
def first_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue attribution under the two standard single-touch models:
    each purchase credits its user's FIRST non-purchase event type
    (first-touch) and the LATEST one before the purchase (last-touch);
    revenue rolls up per (model, channel). The report that decides
    channel budgets — both models from ONE pass.

    Scale shape: two IGNORE-NULLS carries over a per-user keyed window
    (no cross-user state, no self-join, no range join), then a tiny
    (model, channel) hash aggregate; DECIMAL-exact revenue."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    touch = F.when(F.col("event_type") != "purchase", F.col("event_type"))
    p = (
        ev.select(
            "user_id",
            "event_type",
            "value",
            F.first(touch, ignorenulls=True).over(w).alias("first_touch"),
            F.last(touch, ignorenulls=True).over(w).alias("last_touch"),
        )
        .filter(
            (F.col("event_type") == "purchase")
            & F.col("first_touch").isNotNull()
        )
    )
    u = p.select(
        F.lit("first_touch").alias("model"),
        F.col("first_touch").alias("channel"),
        "value",
    ).unionByName(
        p.select(
            F.lit("last_touch").alias("model"),
            F.col("last_touch").alias("channel"),
            "value",
        )
    )
    return u.groupBy("model", "channel").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
        F.round(F.sum(F.col("value").cast(_DEC)).cast("double"), 2).alias(
            "revenue"
        ),
    )


@query(
    "asof_next_purchase",
    oracle="""
WITH clicks AS (
  SELECT user_id, ts, max(event_id) AS click_id
  FROM events WHERE event_type = 'click' GROUP BY 1, 2
), purchases AS (
  SELECT user_id, ts, min(event_id) AS purchase_id,
         arg_min(value, event_id) AS value
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
)
SELECT c.click_id, c.user_id, c.ts AS click_ts,
       p.purchase_id AS next_purchase_id,
       CAST((epoch_us(p.ts) - epoch_us(c.ts)) // 1000000 AS BIGINT)
         AS latency_s,
       round(p.value, 2) AS purchase_value
FROM clicks c ASOF JOIN purchases p
  ON c.user_id = p.user_id AND c.ts <= p.ts
""",
    tags=("asof", "join", "events", "funnel"),
)
def asof_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: each click gets the same user's NEXT purchase
    at-or-after it — the conversion-window primitive (asof_last_click's
    time-reversed sibling). Implemented with the union/carry operator
    walked descending (operators/joins.asof_join_forward — one shuffle
    per key, no range-join explosion); DuckDB checks it with a native
    forward ASOF JOIN. Ties per (user, ts) pre-aggregate
    deterministically on both sides."""
    ev = load_table(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
        .select("user_id", F.col("ts").alias("click_ts"), "click_id")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(
            F.min("event_id").alias("purchase_id"),
            F.min_by("value", "event_id").alias("p_value"),
        )
        .select(
            "user_id",
            F.col("ts").alias("p_ts"),
            "purchase_id",
            "p_value",
        )
    )
    joined = asof_join_forward(
        clicks,
        purchases,
        on="user_id",
        left_ts="click_ts",
        right_ts="p_ts",
        right_value_cols=["purchase_id", "p_ts", "p_value"],
    )
    return joined.filter(F.col("asof_purchase_id").isNotNull()).select(
        "click_id",
        "user_id",
        "click_ts",
        F.col("asof_purchase_id").alias("next_purchase_id"),
        F.floor(
            (
                F.unix_micros("asof_p_ts") - F.unix_micros("click_ts")
            )
            / 1_000_000
        )
        .cast("bigint")
        .alias("latency_s"),
        F.round("asof_p_value", 2).alias("purchase_value"),
    )


def _strat_sample_oracle() -> str:
    a, b = STRAT_SAMPLE_PERM
    return f"""
WITH u AS (
  SELECT doc_id, source, n_chars,
         CAST(({a} * (doc_id % {ROLLING_MOD}) + {b}) % {ROLLING_MOD}
              + 1 AS DOUBLE) / {ROLLING_MOD + 1} AS u
  FROM documents WHERE n_chars > 0
), keyed AS (
  SELECT doc_id, source, n_chars, -ln(u) / n_chars AS k FROM u
)
SELECT doc_id, source, n_chars, round(k, 9) AS sample_key,
       CAST(row_number() OVER (PARTITION BY source ORDER BY k, doc_id)
            AS INT) AS rank
FROM keyed
QUALIFY rank <= {STRAT_SAMPLE_K}
"""


@query(
    "per_source_weighted_sample",
    oracle=_strat_sample_oracle(),
    tags=("curation", "sampling", "weighted", "stratified"),
)
def per_source_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source weighted sampling WITHOUT replacement: the
    Efraimidis-Spirakis exponential-key draw of weighted_sample_wor,
    stratified — the k lowest keys WITHIN EACH source form that
    stratum's exact weighted sample (the per-domain sample sheet a
    curation audit pulls). Hash-derived uniforms keep the draw
    reproducible cross-engine and cross-run.

    Scale shape: narrow key projection + ONE keyed window (partitioned
    by source — never a global sort); at 100 TB each stratum ranks
    independently; a per-partition top-k heap (the TakeOrdered
    discipline, applied per key via the aggregate-heap pattern) is the
    next rung if strata themselves become huge."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    a, b = STRAT_SAMPLE_PERM
    u = (
        (
            (F.lit(a) * (F.col("doc_id") % ROLLING_MOD) + F.lit(b))
            % ROLLING_MOD
            + 1
        ).cast("double")
        / (ROLLING_MOD + 1)
    )
    keyed = docs.select(
        "doc_id", "source", "n_chars", (-F.log(u) / F.col("n_chars")).alias("k")
    )
    w = Window.partitionBy("source").orderBy("k", "doc_id")
    return (
        keyed.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= STRAT_SAMPLE_K)
        .select(
            "doc_id",
            "source",
            "n_chars",
            F.round("k", 9).alias("sample_key"),
            "rank",
        )
    )


@query(
    "mad_robust_outliers",
    oracle=f"""
WITH n AS (SELECT count(*) AS n FROM documents),
vd AS (SELECT n_chars AS v, count(*) AS c FROM documents GROUP BY 1),
vc AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum FROM vd),
med AS (
  SELECT min(v) AS med FROM vc CROSS JOIN n WHERE cum >= ceil(n / 2.0)
),
dd AS (
  SELECT abs(d.n_chars - med.med) AS dev, count(*) AS c
  FROM documents d CROSS JOIN med GROUP BY 1
),
dc AS (SELECT dev, sum(c) OVER (ORDER BY dev) AS cum FROM dd),
mad AS (
  SELECT min(dev) AS mad FROM dc CROSS JOIN n WHERE cum >= ceil(n / 2.0)
),
fl AS (
  SELECT count(*) AS n_outliers
  FROM documents d CROSS JOIN med CROSS JOIN mad
  WHERE abs(d.n_chars - med.med)
        > {MAD_SIGMA} * {MAD_CONSISTENCY} * mad.mad
)
SELECT CAST(n.n AS BIGINT) AS n_docs,
       CAST(med.med AS BIGINT) AS median_chars,
       CAST(mad.mad AS BIGINT) AS mad_chars,
       CAST(fl.n_outliers AS BIGINT) AS n_outliers,
       round(CAST(fl.n_outliers AS DOUBLE) / n.n, 6) AS outlier_rate
FROM n CROSS JOIN med CROSS JOIN mad CROSS JOIN fl
""",
    tags=("stats", "robust", "outlier", "prefix"),
)
def mad_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD robust outlier detection over document lengths: the
    EXACT integer median by count selection, the median absolute
    deviation the same way over the deviation distribution, and the
    count of documents outside the {MAD_SIGMA}-sigma band (MAD scaled
    by the normal-consistency constant). The outlier detector that
    survives the heavy-tailed length distributions z-scores choke on.

    Scale shape (round-11): both medians are kth-order statistics via
    kth_smallest DISTRIBUTED SELECTION with O(1) equal-width bucket
    routing over the known value ranges (never a global sort or
    single-partition window; the operator's skew-refinement loop
    bounds the sorted task for any length distribution) — replacing
    two distinct-value domain checkpoints + prefix passes; the final
    flag pass is one narrow scan."""
    from atlassian_confluence_data_pipeline_spark.operators.windows import (
        equal_width_bucketizer,
        kth_smallest,
    )

    docs = load_table(spark, sf_dir, "documents")
    st = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("n_chars").alias("mn"),
        F.max("n_chars").alias("mx"),
    ).first()
    n = int(st["n"])
    mn, mx = int(st["mn"]), int(st["mx"])
    half = -(-n // 2)  # ceil(n/2), integer
    med = int(
        kth_smallest(
            docs.select("n_chars"),
            "n_chars",
            [half],
            bucket_of=equal_width_bucketizer(mn, mx, 32),
        )[half]
    )
    devs = docs.select(
        F.abs(F.col("n_chars") - F.lit(med)).alias("dev")
    )
    # every deviation lies in [0, max(|mn - med|, |mx - med|)]
    dev_hi = max(abs(mn - med), abs(mx - med))
    mad = int(
        kth_smallest(
            devs,
            "dev",
            [half],
            bucket_of=equal_width_bucketizer(0, dev_hi, 32),
        )[half]
    )
    thr = MAD_SIGMA * MAD_CONSISTENCY * mad
    fl = docs.filter(
        F.abs(F.col("n_chars") - F.lit(med)) > F.lit(thr)
    ).count()
    return docs.sparkSession.createDataFrame(
        [(n, med, mad, fl, round(fl / n, 6))],
        "n_docs bigint, median_chars bigint, mad_chars bigint, "
        "n_outliers bigint, outlier_rate double",
    )
