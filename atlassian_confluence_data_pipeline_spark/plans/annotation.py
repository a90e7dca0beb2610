"""Multi-annotator label aggregation (Dawid-Skene EM).

Labeled training data rarely comes from one annotator; the standard
aggregation model is Dawid & Skene (1979): latent true classes, one
confusion matrix per annotator, fit by EM. This wave synthesizes a
DETERMINISTIC 3-annotator labeling of the documents table (true class =
``lang``; annotator k corrupts docs where ``(doc_id * a_k) % m_k <
r_k`` to the next class in sorted order — noise rates 2/11, 2/7, 2/5)
and runs DS_ITERS fixed EM iterations, recovering each annotator's
confusion matrix. The fixture noise ordering (annotator 3 noisiest) is
recovered in the fitted diagonals — the pytest pins it.

Float determinism: the M-step reductions over the corpus are EXACT
DECIMAL(38,18) hash aggregates — decimal addition is associative and
commutative, so the distributed sums are order-free and engine-exact
(the poisson_bootstrap DECIMAL-moment idiom); everything row-local
(likelihood products over the K annotators, the per-document posterior
normalization) is a fixed-order fold inside one row's arrays. DS_ITERS
iterations therefore reproduce bit-for-bit in the oracle's unrolled
materialized-CTE chain.

Scale shape (the textbook EM-on-Spark form): posteriors live as one
wide array column per document; each round is ONE corpus pass — the
M-step is a decimal hash aggregate whose result is MODEL-sized (K·C² +
C cells, collected to the driver like the kmeans centroids) and the
E-step re-broadcasts the model as literals and normalizes row-locally
(no shuffle for the partition function). The per-iteration posterior
frame is checkpointed so plan depth stays O(1) per round.

Reference analog: none — §2.11 LLM-pipeline extension mandate (label
quality for supervised fine-tuning data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.plans.registry import query

#: fixed EM iterations (the iteration count IS the semantics)
DS_ITERS = 4

#: Laplace-style smoothing on confusion cells — keeps every probability
#: strictly positive so no likelihood product collapses to 0
DS_ALPHA = 0.01

#: (annotator id, multiplier, modulus, rate): doc is mislabeled by
#: annotator k when (doc_id * a) % m < r
ANNOTATORS = ((1, 3, 11, 2), (2, 5, 7, 2), (3, 7, 5, 2))


def _ofold_sql(x: str, k: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list({x} ORDER BY {k})),"
        " (a, b) -> a + b)"
    )


_ANN_VALUES = ", ".join(f"({k}, {a}, {m}, {r})" for k, a, m, r in ANNOTATORS)

_ANN_CTE = f"""classes AS MATERIALIZED (
  SELECT lang AS c,
         CAST(row_number() OVER (ORDER BY lang) - 1 AS BIGINT) AS idx
  FROM (SELECT DISTINCT lang FROM documents)
), nc AS (SELECT count(*) AS n FROM classes),
truth AS MATERIALIZED (
  SELECT d.doc_id, d.lang AS true_c, c.idx
  FROM documents d JOIN classes c ON d.lang = c.c
),
ann AS MATERIALIZED (
  SELECT t.doc_id, k.k, t.true_c,
         CASE WHEN (t.doc_id * k.a) % k.m < k.r
              THEN (SELECT c FROM classes
                    WHERE idx = (t.idx + 1) % (SELECT n FROM nc))
              ELSE t.true_c END AS obs
  FROM truth t
  CROSS JOIN (VALUES {_ANN_VALUES}) AS k(k, a, m, r)
)"""


def _ds_iter_cte(i, prev: str, with_posteriors: bool = True) -> str:
    z_fold = _ofold_sql("v", "c")
    dec = "DECIMAL(38, 18)"
    head = f"""pi{i} AS MATERIALIZED (
  SELECT c, CAST(sum(CAST(q AS {dec})) AS DOUBLE)
              / (SELECT count(*) FROM truth) AS pi
  FROM {prev} GROUP BY c
), cnum{i} AS MATERIALIZED (
  SELECT a.k, q.c, a.obs, sum(CAST(q.q AS {dec})) AS s
  FROM ann a JOIN {prev} q ON a.doc_id = q.doc_id
  GROUP BY a.k, q.c, a.obs
), cden{i} AS MATERIALIZED (
  SELECT k, c, sum(s) AS d FROM cnum{i} GROUP BY k, c
), conf{i} AS MATERIALIZED (
  SELECT x.k, x.c, cl.c AS obs,
         (CAST(coalesce(n.s, 0) AS DOUBLE) + {DS_ALPHA})
           / (CAST(x.d AS DOUBLE) + {DS_ALPHA} * (SELECT n FROM nc)) AS p
  FROM cden{i} x CROSS JOIN classes cl
  LEFT JOIN cnum{i} n ON n.k = x.k AND n.c = x.c AND n.obs = cl.c
)"""
    if not with_posteriors:
        return head
    return head + f""", lik{i} AS MATERIALIZED (
  SELECT a.doc_id, cf.c,
         list_reduce(list_prepend(CAST(1.0 AS DOUBLE),
                                  list(cf.p ORDER BY a.k)),
                     (a1, b1) -> a1 * b1) AS prod
  FROM ann a JOIN conf{i} cf ON cf.k = a.k AND cf.obs = a.obs
  GROUP BY a.doc_id, cf.c
), un{i} AS MATERIALIZED (
  SELECT l.doc_id, l.c, l.prod * p.pi AS v
  FROM lik{i} l JOIN pi{i} p ON l.c = p.c
), z{i} AS MATERIALIZED (
  SELECT doc_id, {z_fold} AS z FROM un{i} GROUP BY doc_id
), q{i} AS MATERIALIZED (
  SELECT u.doc_id, u.c, u.v / z.z AS q
  FROM un{i} u JOIN z{i} z ON u.doc_id = z.doc_id
)"""


def _ds_oracle() -> str:
    blocks = [
        _ANN_CTE,
        """q0 AS MATERIALIZED (
  SELECT a.doc_id, c.c,
         CAST(sum(CASE WHEN a.obs = c.c THEN 1 ELSE 0 END) AS DOUBLE)
           / {n} AS q
  FROM ann a CROSS JOIN classes c
  GROUP BY a.doc_id, c.c
)""".format(n=len(ANNOTATORS)),
    ]
    prev = "q0"
    for i in range(1, DS_ITERS + 1):
        blocks.append(_ds_iter_cte(i, prev))
        prev = f"q{i}"
    blocks.append(_ds_iter_cte("F", prev, with_posteriors=False))
    return (
        "WITH "
        + ",\n".join(blocks)
        + """
SELECT k AS annotator, c AS true_class, obs AS observed_class,
       round(p, 6) AS p_conf
FROM confF
"""
    )


def _class_list(spark: SparkSession, sf_dir: str) -> list[str]:
    """Sorted class domain, materialized on the driver — the bounded
    5-value lang set, collected once (no unpartitioned ranking window
    over even 5 rows)."""
    docs = load_table(spark, sf_dir, "documents")
    return sorted(
        r["lang"] for r in docs.select("lang").distinct().collect()
    )


def _annotator_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, k, true_c, obs) — the synthesized 3-annotator labels."""
    docs = load_table(spark, sf_dir, "documents")
    cls = _class_list(spark, sf_dir)
    classes = spark.createDataFrame(
        [(c, i) for i, c in enumerate(cls)], "c string, idx bigint"
    )
    n_classes = len(cls)
    nxt = classes.select(
        F.col("idx").alias("__nidx"), F.col("c").alias("__next_c")
    )
    truth = docs.select("doc_id", F.col("lang").alias("true_c")).join(
        F.broadcast(classes.withColumnRenamed("c", "true_c")), "true_c"
    )
    ann = truth.select(
        "doc_id",
        "true_c",
        "idx",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("k"),
                        F.lit(a).alias("a"),
                        F.lit(m).alias("m"),
                        F.lit(r).alias("r"),
                    )
                    for k, a, m, r in ANNOTATORS
                ]
            )
        ).alias("an"),
    ).select(
        "doc_id",
        "true_c",
        F.col("an.k").alias("k"),
        ((F.col("idx") + 1) % F.lit(n_classes)).alias("__nidx"),
        ((F.col("doc_id") * F.col("an.a")) % F.col("an.m") < F.col("an.r")).alias(
            "__noisy"
        ),
    )
    return (
        ann.join(F.broadcast(nxt), "__nidx")
        .select(
            "doc_id",
            "k",
            "true_c",
            F.when(F.col("__noisy"), F.col("__next_c"))
            .otherwise(F.col("true_c"))
            .alias("obs"),
        )
    )


def _ordered_fold(struct_key, val_col, init=0.0, mult=False):
    """F.aggregate over array_sort(collect_list(struct(key, val)))."""
    op = (lambda a, b: a * b) if mult else (lambda a, b: a + b)
    return F.aggregate(
        F.transform(
            F.array_sort(F.collect_list(F.struct(struct_key, val_col))),
            lambda s: s[val_col],
        ),
        F.lit(float(init)),
        op,
    )


@query(
    "annotator_labels",
    oracle=f"""
WITH {_ANN_CTE}
SELECT doc_id, k AS annotator, true_c AS true_class, obs AS observed_class
FROM ann
""",
    tags=("annotation", "labels", "quality"),
)
def annotator_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministic 3-annotator labeling of the documents table
    (module docstring) — the fixture every annotation-quality query in
    this wave consumes, exposed and oracle-checked on its own."""
    return _annotator_labels(spark, sf_dir).select(
        "doc_id",
        F.col("k").alias("annotator"),
        F.col("true_c").alias("true_class"),
        F.col("obs").alias("observed_class"),
    )


@query(
    "dawid_skene_confusion",
    oracle=_ds_oracle(),
    tags=("annotation", "quality", "fitting", "iterative"),
)
def dawid_skene_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dawid-Skene EM, DS_ITERS fixed iterations from the majority-vote
    soft initialization: E-step posteriors ``q_d(c) ∝ π_c ·
    Π_k conf_k(c, obs_kd)``, M-step priors and smoothed confusion
    matrices. Output: every annotator's fitted 5x5 confusion matrix.

    Execution shape (the 100 TB EM-on-Spark form): posteriors live as
    ONE wide array column per document; the model state (π + the K·C²
    confusion cells) is collected to the driver each round and
    re-broadcast as literals, so every round is a single corpus pass —
    one groupBy(doc_id) with a class-ordered array fold and a row-LOCAL
    normalization (no second shuffle for the partition function).
    Driver-side reductions replicate the oracle's ORDER BY folds
    exactly (IEEE doubles, same order), so all DS_ITERS rounds
    reproduce bit-for-bit in the unrolled-CTE oracle."""
    cls = _class_list(spark, sf_dir)
    C = len(cls)
    K = len(ANNOTATORS)
    cls_arr = F.array(*[F.lit(c) for c in cls])
    labels = (
        _annotator_labels(spark, sf_dir)
        .select(
            "doc_id",
            "k",
            "obs",
            (F.array_position(cls_arr, F.col("obs")) - 1).alias("oi"),
        )
        .localCheckpoint(eager=True)
    )
    n_docs = labels.select("doc_id").distinct().count()

    # one wide row per doc: class-ordered posterior array, k-ordered obs
    per_doc = labels.groupBy("doc_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("k", "oi"))),
            lambda st: st["oi"],
        ).alias("ois")
    )
    qv0 = F.transform(
        F.sequence(F.lit(0), F.lit(C - 1)),
        lambda c: F.size(F.filter("ois", lambda o: o == c)).cast("double")
        / F.lit(float(K)),
    )
    # docs x (K+C) narrow columns — small enough that one partition
    # beats 32-task scheduling for the per-round aggregate + checkpoint
    q = (
        per_doc.select("doc_id", "ois", qv0.alias("qv"))
        .coalesce(1)
        .localCheckpoint(eager=True)
    )

    def collect_model(qf):
        """Distributed M-step: π and confusion numerators as EXACT
        DECIMAL(38,18) hash aggregates (order-free, engine-exact — the
        poisson_bootstrap DECIMAL-moment idiom), then only the
        MODEL-sized result (K·C² + C cells) comes to the driver, where
        the smoothed divisions run in double like the oracle's."""
        from decimal import Decimal

        dec = "decimal(38,18)"
        flat = qf.select(
            F.explode(
                F.zip_with(
                    F.sequence(F.lit(1), F.lit(K)),
                    F.col("ois"),
                    lambda k, oi: F.struct(k.alias("k"), oi.alias("oi")),
                )
            ).alias("ko"),
            "qv",
        ).select(
            F.col("ko.k").alias("k"),
            F.col("ko.oi").alias("oi"),
            F.posexplode("qv").alias("c", "qc"),
        )
        num_rows = (
            flat.groupBy("k", "oi", "c")
            .agg(F.sum(F.col("qc").cast(dec)).alias("s"))
            .collect()
        )
        zero = Decimal(0)
        num = {(k + 1, o, c): zero for k in range(K) for o in range(C) for c in range(C)}
        for r in num_rows:
            num[(int(r["k"]), int(r["oi"]), int(r["c"]))] = r["s"]
        # π falls out of the numerators for free: every doc contributes
        # q_d(c) to exactly one (k=1, obs) cell, and decimal addition is
        # exact, so Σ_o num[(1,o,c)] == Σ_d q_d(c) to the bit — no
        # second corpus aggregate needed
        pi = [
            float(sum(num[(1, o, c)] for o in range(C))) / n_docs
            for c in range(C)
        ]
        conf = {}
        for k in range(1, K + 1):
            for c in range(C):
                den = float(sum(num[(k, o, c)] for o in range(C)))
                for o in range(C):
                    conf[(k, o, c)] = (float(num[(k, o, c)]) + DS_ALPHA) / (
                        den + DS_ALPHA * C
                    )
        return pi, conf

    for _ in range(DS_ITERS):
        pi, conf = collect_model(q)
        # E-step: per doc, per class c: pi_c * prod_k conf[k, obs_k, c],
        # normalized row-locally with the class-ordered left fold
        conf_arrs = F.array(
            *[
                F.array(
                    *[
                        F.array(
                            *[F.lit(conf[(k, o, c)]) for c in range(C)]
                        )
                        for o in range(C)
                    ]
                )
                for k in range(1, K + 1)
            ]
        )
        pi_arr = F.array(*[F.lit(p) for p in pi])
        ones = F.array(*[F.lit(1.0)] * C)
        # ois is k-ordered, so a left fold over it is ORDER BY k
        prod = F.aggregate(
            F.zip_with(
                F.sequence(F.lit(0), F.lit(K - 1)),
                F.col("ois"),
                lambda ki, oi: F.element_at(
                    F.element_at(conf_arrs, ki + 1), oi.cast("int") + 1
                ),
            ),
            ones,
            lambda acc, arr: F.zip_with(acc, arr, lambda a, b: a * b),
        )
        v = F.zip_with(prod, pi_arr, lambda a, b: a * b)
        z = F.aggregate(v, F.lit(0.0), lambda a, b: a + b)
        q = q.select(
            "doc_id",
            "ois",
            F.transform(v, lambda x: x / z).alias("qv"),
        ).localCheckpoint(eager=True)  # already 1 partition (narrow)

    from atlassian_confluence_data_pipeline_spark import iterstats

    iterstats.record("dawid_skene_confusion", DS_ITERS)
    _, conf = collect_model(q)
    out_rows = [
        (k, cls[c], cls[o], conf[(k, o, c)])
        for k in range(1, K + 1)
        for c in range(C)
        for o in range(C)
    ]
    return spark.createDataFrame(
        out_rows,
        "annotator int, true_class string, observed_class string, p_conf double",
    ).select(
        "annotator",
        "true_class",
        "observed_class",
        # round ENGINE-side: Spark/DuckDB round half-up; Python's
        # builtin is half-even and would diverge on exact ties
        F.round("p_conf", 6).alias("p_conf"),
    )
