"""Language-model smoothing & feature-engineering wave (31):
Kneser-Ney bigram smoothing, Dunning log-likelihood collocations,
out-of-fold target encoding, weight-of-evidence / information value,
and a seasonal-naive forecast backtest.

The modelling-prep layer: the smoothed LM a perplexity filter actually
scores with (plain MLE — bigram_lm_table — assigns zero mass to unseen
continuations), the collocation test that beats PMI on rare words, the
two classic leakage-controlled categorical encoders, and the honest
backtest a forecast gets judged by. Exactness discipline: every count
is an exact integer aggregate, every formula on counts is an identical
float shape in both engines, every sum of float terms is 9-rounded and
accumulated in DECIMAL — nothing order-dependent crosses a shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.plans.registry import query
from atlassian_confluence_data_pipeline_spark.plans.textops import _words

#: Kneser-Ney absolute discount (the standard 0.75)
_KN_D = 0.75

#: bigram support floor for the reported LM / collocation tables
_MIN_BIGRAM = 3
_MIN_COLLOC = 5
_COLLOC_TOPK = 50

#: out-of-fold encoding: fold count, smoothing pseudo-count, house hash
_N_FOLDS = 5
_SMOOTH_M = 10
_TE_MOD = 2_147_483_647
_TE_A = 1_103_515_245
_TE_B = 12_345

#: forecast backtest: season length and holdout length (days)
_SEASON = 7
_HOLDOUT = 28

_BIGRAM_SQL = r"""
w AS (
  SELECT regexp_split_to_array(trim(text), '\s+') AS w FROM documents
), bg AS (
  SELECT w[i] AS w1, w[i+1] AS w2
  FROM w, unnest(range(1, greatest(len(w), 1))) AS t(i)
), c AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c FROM bg GROUP BY 1, 2
)"""


def _bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of the shared bigram-count CTE (the bigram_lm_table
    zip_with extraction — array ops, no Python)."""
    docs = load_table(spark, sf_dir, "documents")
    w = docs.select(_words(F.col("text")).alias("w"))
    n = F.greatest(F.size("w") - 1, F.lit(0))
    bg = w.select(
        F.explode(
            F.zip_with(
                F.slice("w", 1, n),
                F.slice("w", 2, n),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("b")
    ).select("b.w1", "b.w2")
    return bg.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )


@query(
    "kneser_ney_bigrams",
    oracle=f"""
WITH {_BIGRAM_SQL.strip()}
, ctx AS (
  SELECT w1, CAST(sum(c) AS BIGINT) AS ctx,
         CAST(count(*) AS BIGINT) AS n1p
  FROM c GROUP BY 1
), cont AS (
  SELECT w2, CAST(count(*) AS BIGINT) AS cont FROM c GROUP BY 1
), nbig AS (SELECT CAST(count(*) AS BIGINT) AS nb FROM c)
SELECT c.w1, c.w2, c.c,
       round(CAST(c.c AS DOUBLE) / ctx.ctx, 6) AS p_mle,
       round((CAST(c.c AS DOUBLE) - {_KN_D}) / ctx.ctx
             + {_KN_D} * ctx.n1p / ctx.ctx
               * (CAST(cont.cont AS DOUBLE) / nbig.nb), 6) AS p_kn
FROM c
JOIN ctx USING (w1) JOIN cont USING (w2) CROSS JOIN nbig
WHERE c.c >= {_MIN_BIGRAM}
""",
    tags=("features", "lm", "smoothing"),
)
def kneser_ney_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram probabilities — the smoothing a
    perplexity filter actually ships (bigram_lm_table's plain MLE gives
    unseen continuations zero mass and common words inflated backoff):
    P_kn(w2|w1) = (c(w1,w2) - D)/c(w1.) + D * N1+(w1,.)/c(w1.) *
    Pcont(w2), where Pcont is the CONTINUATION probability
    N1+(.,w2)/|bigrams| — "how many contexts does w2 complete", the KN
    insight that keeps 'Francisco' from inheriting 'San Francisco''s
    raw frequency.

    Scale shape: bigram extraction is the zip_with array pipeline (no
    Python); counts, context totals, continuation counts are three hash
    aggregates on the VOCAB²-bounded count table; the final frame is
    two vocab-keyed equi-joins plus a literal total. Every probability
    is an identical float shape over exact bigints on both engines."""
    c = _bigram_counts(spark, sf_dir).localCheckpoint(eager=True)
    ctx = c.groupBy("w1").agg(
        F.sum("c").cast("bigint").alias("ctx"),
        F.count(F.lit(1)).cast("bigint").alias("n1p"),
    )
    cont = c.groupBy("w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("cont")
    )
    nb = c.count()
    p_kn = (F.col("c").cast("double") - _KN_D) / F.col("ctx") + (
        F.lit(_KN_D) * F.col("n1p") / F.col("ctx")
    ) * (F.col("cont").cast("double") / F.lit(nb))
    return (
        c.filter(F.col("c") >= _MIN_BIGRAM)
        .join(F.broadcast(ctx), "w1")
        .join(F.broadcast(cont), "w2")
        .select(
            "w1",
            "w2",
            "c",
            F.round(F.col("c").cast("double") / F.col("ctx"), 6).alias(
                "p_mle"
            ),
            F.round(p_kn, 6).alias("p_kn"),
        )
    )


def _xlx(e: str) -> str:
    return f"CASE WHEN {e} = 0 THEN 0.0 ELSE {e} * ln(CAST({e} AS DOUBLE)) END"


@query(
    "llr_collocations",
    oracle=f"""
WITH {_BIGRAM_SQL.strip()}
, r AS (SELECT w1, CAST(sum(c) AS BIGINT) AS r1 FROM c GROUP BY 1),
col AS (SELECT w2, CAST(sum(c) AS BIGINT) AS c2 FROM c GROUP BY 1),
n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM c),
k AS (
  SELECT c.w1, c.w2, c.c AS k11,
         r.r1 - c.c AS k12, col.c2 - c.c AS k21,
         n.n - r.r1 - col.c2 + c.c AS k22, n.n AS n
  FROM c JOIN r USING (w1) JOIN col USING (w2) CROSS JOIN n
  WHERE c.c >= {_MIN_COLLOC}
)
SELECT w1, w2, CAST(k11 AS BIGINT) AS c,
       round(2 * ({_xlx('k11')} + {_xlx('k12')} + {_xlx('k21')}
                  + {_xlx('k22')} + {_xlx('n')}
                  - {_xlx('(k11 + k12)')} - {_xlx('(k21 + k22)')}
                  - {_xlx('(k11 + k21)')} - {_xlx('(k12 + k22)')}), 4)
         AS llr
FROM k
ORDER BY llr DESC, w1, w2
LIMIT {_COLLOC_TOPK}
""",
    tags=("features", "collocation", "topk"),
)
def llr_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dunning log-likelihood-ratio collocations: the 2x2 contingency
    test (bigram vs its margins) that stays calibrated on rare words
    where PMI explodes — LLR = 2 * [ sum k ln k (cells) + N ln N
    - sum (margins ln margin) ], chi-square-distributed under
    independence. Reported: the top-{_COLLOC_TOPK} strongest
    collocations with support >= {_MIN_COLLOC}.

    Scale shape: the same vocab²-bounded count table as the LM queries,
    two margin aggregates, one literal total; the LLR is a fixed
    9-term float expression over exact bigints (identical shape both
    engines — ties broken by the bigram itself), and the top-k is a
    TakeOrderedAndProject, never a global sort."""
    c = _bigram_counts(spark, sf_dir).localCheckpoint(eager=True)
    r = c.groupBy("w1").agg(F.sum("c").cast("bigint").alias("r1"))
    col2 = c.groupBy("w2").agg(F.sum("c").cast("bigint").alias("c2"))
    n_tot = c.agg(F.sum("c")).first()[0]
    k = (
        c.filter(F.col("c") >= _MIN_COLLOC)
        .join(F.broadcast(r), "w1")
        .join(F.broadcast(col2), "w2")
        .select(
            "w1",
            "w2",
            F.col("c").alias("k11"),
            (F.col("r1") - F.col("c")).alias("k12"),
            (F.col("c2") - F.col("c")).alias("k21"),
            (F.lit(n_tot) - F.col("r1") - F.col("c2") + F.col("c")).alias(
                "k22"
            ),
            F.lit(n_tot).alias("n"),
        )
    )

    def xlx(col_expr):
        return F.when(col_expr == 0, F.lit(0.0)).otherwise(
            col_expr * F.log(col_expr.cast("double"))
        )

    llr = 2 * (
        xlx(F.col("k11"))
        + xlx(F.col("k12"))
        + xlx(F.col("k21"))
        + xlx(F.col("k22"))
        + xlx(F.col("n"))
        - xlx(F.col("k11") + F.col("k12"))
        - xlx(F.col("k21") + F.col("k22"))
        - xlx(F.col("k11") + F.col("k21"))
        - xlx(F.col("k12") + F.col("k22"))
    )
    return (
        k.select(
            "w1",
            "w2",
            F.col("k11").cast("bigint").alias("c"),
            F.round(llr, 4).alias("llr"),
        )
        .orderBy(F.col("llr").desc(), "w1", "w2")
        .limit(_COLLOC_TOPK)
    )


@query(
    "target_encode_oof",
    oracle=f"""
WITH base AS (
  SELECT c_mktsegment AS segment,
         CAST((({_TE_A} * (o_custkey % {_TE_MOD}) + {_TE_B})
               % {_TE_MOD}) % {_N_FOLDS} AS INT) AS fold,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
  FROM orders JOIN customer ON c_custkey = o_custkey
), sf AS (
  SELECT segment, fold,
         CAST(count(*) AS BIGINT) AS n_sf,
         CAST(sum(y) AS BIGINT) AS s_sf
  FROM base GROUP BY 1, 2
), seg AS (
  SELECT segment, CAST(sum(n_sf) AS BIGINT) AS n_s,
         CAST(sum(s_sf) AS BIGINT) AS s_s
  FROM sf GROUP BY 1
), prior AS (
  SELECT CAST(sum(s_s) AS DOUBLE) / sum(n_s) AS p FROM seg
)
SELECT sf.segment, sf.fold, sf.n_sf AS n_rows,
       round((CAST(seg.s_s - sf.s_sf AS DOUBLE) + {_SMOOTH_M} * prior.p)
             / ((seg.n_s - sf.n_sf) + {_SMOOTH_M}), 6) AS oof_encoded
FROM sf JOIN seg USING (segment) CROSS JOIN prior
""",
    tags=("features", "encoding", "leakage"),
)
def target_encode_oof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-fold smoothed target encoding of the market segment
    against the order-finalized label: rows in fold k are encoded with
    the target mean computed from the OTHER folds only (the leakage
    control that keeps the encoder honest in cross-validation), with
    m={_SMOOTH_M} additive smoothing toward the global prior. The fold
    is the house affine hash of the customer key — deterministic, so
    both engines assign identical folds and the encoder is a pure
    function of the data.

    Scale shape: one (segment, fold) hash aggregate over the fact
    stream, then the leave-fold-out means are closed-form arithmetic on
    (segment totals - fold cell) — |segments| x |folds| rows, no second
    pass over the data, no window anywhere."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    fold = (
        (
            (
                F.lit(_TE_A) * (F.col("o_custkey") % _TE_MOD)
                + F.lit(_TE_B)
            )
            % _TE_MOD
        )
        % _N_FOLDS
    ).cast("int")
    base = o.join(
        c.select(
            F.col("c_custkey").alias("o_custkey"),
            F.col("c_mktsegment").alias("segment"),
        ),
        "o_custkey",
    ).select(
        "segment",
        fold.alias("fold"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    sf = base.groupBy("segment", "fold").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sf"),
        F.sum("y").cast("bigint").alias("s_sf"),
    ).localCheckpoint(eager=True)
    seg = sf.groupBy("segment").agg(
        F.sum("n_sf").cast("bigint").alias("n_s"),
        F.sum("s_sf").cast("bigint").alias("s_s"),
    )
    tot = seg.agg(
        F.sum("s_s").cast("double").alias("s"), F.sum("n_s").alias("n")
    ).first()
    prior = tot["s"] / tot["n"]
    return sf.join(F.broadcast(seg), "segment").select(
        "segment",
        "fold",
        F.col("n_sf").alias("n_rows"),
        F.round(
            (
                (F.col("s_s") - F.col("s_sf")).cast("double")
                + F.lit(_SMOOTH_M) * F.lit(prior)
            )
            / ((F.col("n_s") - F.col("n_sf")) + _SMOOTH_M),
            6,
        ).alias("oof_encoded"),
    )


@query(
    "woe_information_value",
    oracle="""
WITH base AS (
  SELECT c_mktsegment AS segment,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS bad
  FROM orders JOIN customer ON c_custkey = o_custkey
), seg AS (
  SELECT segment,
         CAST(sum(1 - bad) AS BIGINT) AS n_good,
         CAST(sum(bad) AS BIGINT) AS n_bad
  FROM base GROUP BY 1
), tot AS (
  SELECT CAST(sum(n_good) AS BIGINT) AS g,
         CAST(sum(n_bad) AS BIGINT) AS b
  FROM seg
), w AS (
  SELECT segment, n_good, n_bad,
         round(ln((CAST(n_good AS DOUBLE) / tot.g)
                  / (CAST(n_bad AS DOUBLE) / tot.b)), 9) AS woe,
         CAST(n_good AS DOUBLE) / tot.g
           - CAST(n_bad AS DOUBLE) / tot.b AS share_gap
  FROM seg CROSS JOIN tot
), iv AS (
  SELECT CAST(sum(CAST(round(share_gap * woe, 9) AS DECIMAL(28,12)))
              AS DOUBLE) AS iv
  FROM w
)
SELECT segment, n_good, n_bad,
       round(woe, 6) AS woe,
       round(iv.iv, 6) AS iv
FROM w CROSS JOIN iv
""",
    tags=("features", "woe", "stats"),
)
def woe_information_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight of evidence + information value of the market segment for
    predicting order finalization — the credit-scoring encoder/screen:
    WOE_c = ln((good_c/G)/(bad_c/B)) per category, and
    IV = sum (good_c/G - bad_c/B) * WOE_c summarizes the whole
    feature's separating power (rule of thumb: < 0.02 useless,
    > 0.5 suspicious). The fixture is near-independent, so IV also
    A/A-checks the encoder.

    Scale shape: one hash aggregate to the category domain, one 1-row
    total, closed-form WOE per category; the IV sum accumulates
    9-rounded DECIMAL terms over the bounded category domain (order-
    independent even at 5 rows — the engine's discipline is uniform)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    base = o.join(
        c.select(
            F.col("c_custkey").alias("o_custkey"),
            F.col("c_mktsegment").alias("segment"),
        ),
        "o_custkey",
    ).select(
        "segment",
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("bad"),
    )
    seg = base.groupBy("segment").agg(
        F.sum(1 - F.col("bad")).cast("bigint").alias("n_good"),
        F.sum("bad").cast("bigint").alias("n_bad"),
    ).localCheckpoint(eager=True)
    tot = seg.agg(
        F.sum("n_good").cast("bigint").alias("g"),
        F.sum("n_bad").cast("bigint").alias("b"),
    ).first()
    g, b = tot["g"], tot["b"]
    woe = F.round(
        F.log(
            (F.col("n_good").cast("double") / F.lit(g))
            / (F.col("n_bad").cast("double") / F.lit(b))
        ),
        9,
    )
    gap = F.col("n_good").cast("double") / F.lit(g) - F.col("n_bad").cast(
        "double"
    ) / F.lit(b)
    w = seg.select(
        "segment", "n_good", "n_bad", woe.alias("woe"), gap.alias("share_gap")
    ).localCheckpoint(eager=True)
    iv = (
        w.agg(
            F.sum(
                F.round(F.col("share_gap") * F.col("woe"), 9).cast(
                    "decimal(28,12)"
                )
            )
            .cast("double")
            .alias("iv")
        ).first()["iv"]
    )
    return w.select(
        "segment",
        "n_good",
        "n_bad",
        F.round("woe", 6).alias("woe"),
        F.round(F.lit(iv), 6).alias("iv"),
    )


@query(
    "forecast_backtest_metrics",
    oracle=f"""
WITH daily AS (
  SELECT date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
           AS dnum,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
           AS cents
  FROM orders GROUP BY 1
), head AS (SELECT max(dnum) AS h FROM daily),
test AS (
  SELECT a.dnum, a.cents, f.cents AS fc
  FROM daily a
  JOIN daily f ON f.dnum = a.dnum - {_SEASON}
  CROSS JOIN head
  WHERE a.dnum > head.h - {_HOLDOUT}
), train_naive AS (
  SELECT abs(a.cents - p.cents) AS ad
  FROM daily a
  JOIN daily p ON p.dnum = a.dnum - 1
  CROSS JOIN head
  WHERE a.dnum <= head.h - {_HOLDOUT}
), te AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(abs(cents - fc) AS DECIMAL(38,0))) AS DOUBLE)
           / count(*) AS mae_c,
         CAST(sum(CAST(CAST(cents - fc AS DECIMAL(19,0))
                       * CAST(cents - fc AS DECIMAL(19,0))
                       AS DECIMAL(38,0))) AS DOUBLE) / count(*) AS mse_c,
         CAST(sum(CAST(round(CAST(abs(cents - fc) AS DOUBLE) / cents, 9)
                       AS DECIMAL(28,12))) AS DOUBLE) / count(*) AS mape
  FROM test
), tr AS (
  SELECT CAST(sum(CAST(ad AS DECIMAL(38,0))) AS DOUBLE) / count(*)
           AS naive_mae_c
  FROM train_naive
)
SELECT te.n AS n_test,
       round(te.mae_c / 100, 6) AS mae,
       round(sqrt(te.mse_c) / 100, 6) AS rmse,
       round(te.mape, 6) AS mape,
       round(te.mae_c / tr.naive_mae_c, 6) AS mase
FROM te CROSS JOIN tr
""",
    tags=("features", "forecast", "backtest"),
)
def forecast_backtest_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backtest of the seasonal-naive forecast (predict each of the
    last {_HOLDOUT} days with the value {_SEASON} days earlier) —
    MAE / RMSE / MAPE plus MASE, the scale-free headline metric that
    divides by the TRAINING period's one-step naive MAE (MASE < 1 =
    "beats naive"; the only defensible cross-series comparison).

    Scale shape: the corpus collapses to the calendar-bounded day
    series; forecast and naive baselines are equi-joins on shifted day
    numbers (no window, no sort); absolute errors and squared errors
    accumulate as EXACT integer cents in DECIMAL(38,0) (squares via
    DECIMAL multiply — immune to bigint overflow at any revenue), and
    the ratio-based MAPE terms are 9-rounded DECIMAL sums."""
    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.groupBy(
            F.datediff(F.to_date("o_orderdate"), F.lit("1992-01-01")).alias(
                "dnum"
            )
        )
        .agg(
            (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("bigint")
            .alias("cents")
        )
        .localCheckpoint(eager=True)
    )
    h = daily.agg(F.max("dnum")).first()[0]
    fcast = daily.select(
        (F.col("dnum") + _SEASON).alias("dnum"), F.col("cents").alias("fc")
    )
    test = (
        daily.filter(F.col("dnum") > h - _HOLDOUT)
        .join(fcast, "dnum")
    )
    prev = daily.select(
        (F.col("dnum") + 1).alias("dnum"), F.col("cents").alias("pc")
    )
    train = (
        daily.filter(F.col("dnum") <= h - _HOLDOUT)
        .join(prev, "dnum")
        .select(F.abs(F.col("cents") - F.col("pc")).alias("ad"))
    )
    diff = F.col("cents") - F.col("fc")
    te = test.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        (
            F.sum(F.abs(diff).cast("decimal(38,0)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mae_c"),
        (
            F.sum(
                (
                    diff.cast("decimal(19,0)") * diff.cast("decimal(19,0)")
                ).cast("decimal(38,0)")
            ).cast("double")
            / F.count(F.lit(1))
        ).alias("mse_c"),
        (
            F.sum(
                F.round(
                    F.abs(diff).cast("double") / F.col("cents"), 9
                ).cast("decimal(28,12)")
            ).cast("double")
            / F.count(F.lit(1))
        ).alias("mape"),
    )
    naive_mae = (
        train.agg(
            (
                F.sum(F.col("ad").cast("decimal(38,0)")).cast("double")
                / F.count(F.lit(1))
            ).alias("m")
        ).first()["m"]
    )
    return te.select(
        F.col("n").alias("n_test"),
        F.round(F.col("mae_c") / 100, 6).alias("mae"),
        F.round(F.sqrt(F.col("mse_c")) / 100, 6).alias("rmse"),
        F.round("mape", 6).alias("mape"),
        F.round(F.col("mae_c") / F.lit(naive_mae), 6).alias("mase"),
    )
