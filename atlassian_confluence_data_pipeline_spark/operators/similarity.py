"""Vector-similarity operators (extension X3).

Cosine similarity as pure higher-order column expressions (JVM-side
fold — no UDF, no Arrow hop), plus the brute-force top-k and a bucketed
approximate variant for scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Left-to-right double-precision fold of elementwise products —
    deterministic and engine-portable (same order => same bits)."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda s, x: s + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query vector.

    ``queries`` is broadcast (assumed small); the corpus never moves
    ACROSS the cluster (the conditional spread_scan only engages on a
    source that yields fewer splits than the session's parallelism —
    the single-row-group fixture case, where the |queries| dot folds
    per corpus row would otherwise serialize onto one core; round 12).
    Each side's L2 norm is folded ONCE per vector in its own projection
    (``sqrt(dot(v, v))`` reused across pairs is bit-identical to
    re-folding it per pair) so the per-pair work is one dot fold
    instead of three. Returns (query_id, neighbor_id, rank, sim)."""
    from atlassian_confluence_data_pipeline_spark.operators.skew import (
        spread_scan,
    )

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        l2_norm(F.col(vec_col)).alias("__qn"),
    )
    c = spread_scan(corpus.select(id_col, vec_col)).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        l2_norm(F.col(vec_col)).alias("__cn"),
    )
    sim = dot(F.col("__qv"), F.col("__cv")) / (F.col("__qn") * F.col("__cn"))
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("sim"))
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


def collect_centroids(cent: DataFrame) -> list:
    """Materialize a (centroid_id, centroid) frame as a sorted Python
    list. Centroids are k tiny rows (k = cell count, never corpus
    size) — loop-control-scale data, the same class as 1-row
    aggregates; the corpus itself never reaches the driver."""
    return sorted(
        ((r["centroid_id"], list(r["centroid"])) for r in cent.collect()),
        key=lambda t: t[0],
    )


def assign_nearest_centroid(
    df: DataFrame,
    cent_rows: list,
    vec_col: str = "embedding",
    sim_col: str | None = None,
    norm_col: str | None = None,
) -> DataFrame:
    """Nearest-centroid assignment as a NARROW map: the centroids are
    embedded as one literal array-of-structs column (a single F.expr
    string — ~k*dim F.lit calls would cost ~0.5 s of py4j roundtrips
    per plan build) and each row picks argmax-cosine with a strict-`>`
    left fold — no join, no window, no Exchange between the scan and
    whatever aggregates follow. Ties break to the SMALLEST centroid_id
    (ascending-id fold order + strict `>`), bit-matching a
    ``row_number() OVER (ORDER BY sim DESC, centroid_id)`` pick.

    Float parity: each centroid's norm is pre-folded in Python with the
    same left-to-right binary64 ``s += x*x`` sequence the SQL fold
    uses; doubles serialize via repr() (shortest round-trip form)
    inside CAST('…' AS DOUBLE), parsed correctly-rounded back to the
    identical bits. Returns ``df``'s columns plus ``centroid_id``; with
    ``sim_col``, also the winning cosine itself (the projection onto
    the assigned centroid — semantic_dedup's sub-cell axis)."""
    import math

    def _d(v: float) -> str:
        return f"CAST('{v!r}' AS DOUBLE)"

    structs = []
    for cid, vec in cent_rows:
        s = 0.0
        for x in vec:  # left-to-right, same bits as l2_norm's fold
            s += x * x
        cv = ", ".join(_d(float(x)) for x in vec)
        structs.append(
            f"named_struct('cid', CAST({int(cid)} AS INT), "
            f"'cv', array({cv}), 'cn', {_d(math.sqrt(s))})"
        )
    carr = F.expr("array(" + ", ".join(structs) + ")")
    # hoist the row norm into its own projection so the k-way fold reads
    # it as a bound column instead of re-folding it per centroid
    cols = list(df.columns)
    with_norm = df.select(*cols, l2_norm(F.col(vec_col)).alias("__en"))
    sims = F.transform(
        carr,
        lambda c: F.struct(
            (dot(F.col(vec_col), c["cv"]) / (F.col("__en") * c["cn"])).alias("s"),
            c["cid"].alias("cid"),
        ),
    )
    best = F.aggregate(
        sims,
        F.struct(
            F.lit(float("-inf")).alias("s"), F.lit(None).cast("int").alias("cid")
        ),
        lambda a, x: F.when(x["s"] > a["s"], x).otherwise(a),
    )
    out = [best["cid"].alias("centroid_id")]
    if sim_col is not None:
        out.append(best["s"].alias(sim_col))
    if norm_col is not None:
        # the row norm is already folded for the argmax — callers whose
        # downstream cosines need it reuse the identical value instead
        # of re-folding it per pair
        out.append(F.col("__en").alias(norm_col))
    return with_norm.select(*out, *cols)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    centroids: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 1,
    cent_rows: list | None = None,
) -> DataFrame:
    """IVF-style approximate top-k: assign corpus vectors to their nearest
    centroid (coarse quantizer), probe only the query's ``n_probe``
    closest cells. ``centroids`` is (centroid_id, centroid ARRAY<DOUBLE>),
    small — collected once for the corpus-side literal argmax (narrow
    map, no exchange; see :func:`assign_nearest_centroid`) and broadcast
    for the tiny query side's top-``n_probe`` window. The scan per query
    drops from N to N * n_probe / n_cells — the ANN scale path.

    ``cent_rows``: already-collected ``[(centroid_id, vec)]`` rows (the
    session-staged label centroids) — skips both the centroid
    aggregation job and the collect."""

    if cent_rows is None:
        if centroids is None:
            raise ValueError("ivf_topk: pass centroids or cent_rows")
        cent_rows = collect_centroids(centroids)
    # rebuild the k collected rows as a LOCAL relation for the query
    # side: referencing the original `centroids` plan here would execute
    # its (corpus-sized) aggregation a second time in the main job
    cent_local = corpus.sparkSession.createDataFrame(
        [(int(cid), [float(x) for x in vec]) for cid, vec in cent_rows],
        "centroid_id int, centroid array<double>",
    )

    def assign(df: DataFrame, out_id: str, out_vec: str, top: int) -> DataFrame:
        sim = cosine_similarity(F.col(out_vec), F.col("centroid"))
        w = Window.partitionBy(out_id).orderBy(F.col("__csim").desc(), "centroid_id")
        return (
            df.crossJoin(F.broadcast(cent_local))
            .withColumn("__csim", sim)
            .withColumn("__crank", F.row_number().over(w))
            .filter(F.col("__crank") <= top)
            .drop("__csim", "__crank", "centroid")
        )

    from atlassian_confluence_data_pipeline_spark.operators.skew import (
        spread_scan,
    )

    # conditional spread (round 12): the k-way centroid argmax below is
    # a per-row fold chain that serializes on a single-split source
    c = spread_scan(corpus.select(id_col, vec_col)).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        l2_norm(F.col(vec_col)).alias("__qn"),
    )
    # the corpus-side norm is the argmax's own fold, re-exposed; the
    # query-side norm folds once per query row — the probe-pair cosine
    # then pays ONE dot fold per pair instead of three
    c_cells = assign_nearest_centroid(c, cent_rows, "__cv", norm_col="__cn")
    q_cells = assign(q, "query_id", "__qv", n_probe)
    sim = dot(F.col("__qv"), F.col("__cv")) / (F.col("__qn") * F.col("__cn"))
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        c_cells.join(F.broadcast(q_cells), "centroid_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("sim"))
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )
