"""Prefix-filter set-similarity join (wave 27) — the database-
literature similarity join (SSJoin/PPJoin family: Chaudhuri et al.
2006, Xiao et al. 2008) rendered as DataFrame ops.

The third candidate-generation technique in the engine's similarity
toolbox, alongside banded MinHash (probabilistic, operators/lsh.py)
and blocking (entity_resolution_parts): prefix filtering is EXACT —
with records' token sets sorted by a global rarity order, two sets can
reach Jaccard >= t only if their first ``L - ceil(t*L) + 1`` tokens
intersect, so joining on prefix tokens alone provably loses no
qualifying pair (the invariant test checks against brute force).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.plans.registry import query

#: Jaccard threshold as an exact rational (3/5) — prefix lengths use
#: integer ceil((3L+4) div 5), never float 0.6*L (whose binary
#: representation rounds 0.6*5 to 3.0000000000000004 and breaks ceil)
_T_NUM, _T_DEN = 3, 5


@query(
    "prefix_filter_jaccard_join",
    oracle=f"""
WITH names AS (
  SELECT DISTINCT p_name AS name FROM part
), grams AS (
  SELECT name,
         unnest(list_distinct(list_transform(
           range(1, len(name) - 1), i -> substr(name, i, 3)))) AS gram
  FROM names
), df AS (
  SELECT gram, count(*) AS gdf FROM grams GROUP BY 1
), rec AS (
  SELECT g.name,
         list(g.gram ORDER BY df.gdf, g.gram) AS toks,
         count(*) AS L
  FROM grams g JOIN df ON g.gram = df.gram
  GROUP BY 1
), pre AS (
  SELECT name, toks, L,
         unnest(list_slice(toks, 1,
           CAST(L - (({_T_NUM} * L + {_T_DEN} - 1) // {_T_DEN}) + 1
                AS INT))) AS ptok
  FROM rec
), cand AS (
  SELECT DISTINCT a.name AS name_a, b.name AS name_b
  FROM pre a JOIN pre b ON a.ptok = b.ptok AND a.name < b.name
), v AS (
  SELECT c.name_a, c.name_b,
         len(list_intersect(ra.toks, rb.toks)) AS inter,
         ra.L + rb.L - len(list_intersect(ra.toks, rb.toks)) AS un
  FROM cand c
  JOIN rec ra ON ra.name = c.name_a
  JOIN rec rb ON rb.name = c.name_b
)
SELECT name_a, name_b,
       CAST(inter AS BIGINT) AS n_common,
       CAST(un AS BIGINT) AS n_union,
       round(CAST(inter AS DOUBLE) / un, 6) AS jaccard
FROM v
WHERE {_T_DEN} * inter >= {_T_NUM} * un
""",
    tags=("similarity", "join", "prefix-filter", "text"),
)
def prefix_filter_jaccard_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self similarity-join of the part-name vocabulary at character-
    3-gram Jaccard >= 0.6 via EXACT prefix filtering: sort each name's
    gram set by global rarity (ascending document frequency, gram
    tie-break), keep only the first L - ceil(0.6L) + 1 grams, and join
    records that share a PREFIX gram — provably no qualifying pair is
    lost, and the candidate space shrinks from all-pairs to
    rare-gram collisions. Verification is exact set intersection with
    the threshold tested in INTEGER cross-multiplied form
    (5*inter >= 3*union — no float boundary).

    Scale shape: the record domain is the DISTINCT name vocabulary
    (dedup-first — identical strings collapse before any pairing, the
    same discipline exact_dedup_docs applies to documents); gram DF is
    one hash aggregate; the candidate join is an equi-join on prefix
    grams whose fan-out the rarity ordering minimizes (rarest grams
    have the fewest collisions). On a 100 TB corpus the same plan runs
    with the corpus's distinct-string domain sharded by gram hash."""
    part = load_table(spark, sf_dir, "part")
    names = part.select(F.col("p_name").alias("name")).distinct()
    # substring with a dynamic start needs expr(): F.substring takes
    # literal positions only
    grams = names.select(
        "name",
        F.explode(
            F.array_distinct(
                F.expr(
                    "transform(sequence(1, length(name) - 2),"
                    " i -> substring(name, i, 3))"
                )
            )
        ).alias("gram"),
    )
    df_ = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("gdf"))
    rec = (
        grams.join(df_, "gram")
        .groupBy("name")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("gdf", "gram"))),
                lambda s: s["gram"],
            ).alias("toks"),
            F.count(F.lit(1)).alias("L"),
        )
        .localCheckpoint(eager=True)
    )
    plen = (
        F.col("L")
        - F.expr(f"({_T_NUM} * L + {_T_DEN} - 1) div {_T_DEN}")
        + 1
    ).cast("int")
    pre = rec.select(
        "name",
        F.explode(F.slice(F.col("toks"), 1, plen)).alias("ptok"),
    )
    a = pre.select(F.col("name").alias("name_a"), F.col("ptok"))
    b = pre.select(F.col("name").alias("name_b"), F.col("ptok"))
    cand = (
        a.join(b, "ptok")
        .filter(F.col("name_a") < F.col("name_b"))
        .select("name_a", "name_b")
        .distinct()
    )
    ra = rec.select(
        F.col("name").alias("name_a"),
        F.col("toks").alias("ta"),
        F.col("L").alias("la"),
    )
    rb = rec.select(
        F.col("name").alias("name_b"),
        F.col("toks").alias("tb"),
        F.col("L").alias("lb"),
    )
    inter = F.size(F.array_intersect("ta", "tb"))
    un = F.col("la") + F.col("lb") - inter
    return (
        cand.join(ra, "name_a")
        .join(rb, "name_b")
        .filter(_T_DEN * inter >= _T_NUM * un)
        .select(
            "name_a",
            "name_b",
            inter.cast("bigint").alias("n_common"),
            un.cast("bigint").alias("n_union"),
            F.round(inter.cast("double") / un, 6).alias("jaccard"),
        )
    )
