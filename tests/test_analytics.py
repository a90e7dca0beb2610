"""Accuracy/semantic tests for the non-oracle analytics operators:
approximate distinct error bounds, IVF ANN recall vs brute force, and
the as-of join against a per-row reference computation."""

from __future__ import annotations

from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.plans import QUERIES
from atlassian_confluence_data_pipeline_spark.operators.similarity import (
    brute_force_topk,
)


def test_approx_distinct_within_bounds(spark, sf_dir):
    approx = {
        r["p_brand"]: r
        for r in QUERIES["approx_distinct_parts"].fn(spark, sf_dir).collect()
    }
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    exact = {
        r["p_brand"]: r
        for r in li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.countDistinct("l_orderkey").alias("orders"),
            F.countDistinct("l_suppkey").alias("suppliers"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for brand, row in exact.items():
        # the query's hash-checked surface: exact counts + the 5% band
        # booleans each engine computes from its own sketch (rsd=0.01)
        assert approx[brand]["exact_orders"] == row["orders"]
        assert approx[brand]["exact_suppliers"] == row["suppliers"]
        assert approx[brand]["orders_within_5pct"]
        assert approx[brand]["suppliers_within_5pct"]


def test_ivf_ann_recall_vs_brute_force(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(emb, queries, k=5)
    exact_pairs = {
        (r["query_id"], r["neighbor_id"]) for r in exact.collect()
    }
    approx_pairs = {
        (r["query_id"], r["neighbor_id"])
        for r in QUERIES["ivf_ann_topk"].fn(spark, sf_dir).collect()
    }
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    # label centroids are a coarse quantizer; probing 2/10 cells must
    # still recover a solid fraction of true neighbors
    assert recall >= 0.3, f"recall={recall}"
    # every approximate result is a real vector pair, ranked, deduped
    assert all(q != n for q, n in approx_pairs)


def test_asof_join_matches_per_row_reference(spark, sf_dir):
    out = QUERIES["asof_last_click"].fn(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select("user_id", "ts", "event_id")
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in clicks:
        by_user.setdefault(r["user_id"], []).append((r["ts"], r["event_id"]))
    for rows in by_user.values():
        rows.sort()
    import bisect

    for r in out[:200]:
        rows = by_user[r["user_id"]]
        # latest click with ts <= purchase_ts; ties -> max event_id
        i = bisect.bisect_right([t for t, _ in rows], r["purchase_ts"])
        assert i > 0
        best_ts = rows[i - 1][0]
        best_id = max(eid for t, eid in rows if t == best_ts)
        assert r["asof_click_ts"] == best_ts
        assert r["asof_click_id"] == best_id


def test_span_dedup_invariants(spark, sf_dir):
    """Structural invariants of the C4-style span dedup: kept counts
    bounded by totals, fully-unique documents reconstruct verbatim,
    and every duplicated span survives in exactly one place."""
    from atlassian_confluence_data_pipeline_spark.catalog import load_table
    from atlassian_confluence_data_pipeline_spark.plans.curation import (
        span_dedup_docs,
    )

    out = span_dedup_docs(spark, sf_dir)
    rows = {r["doc_id"]: r for r in out.collect()}
    docs = {
        r["doc_id"]: " ".join(r["text"].strip().split())
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    assert set(rows) == set(docs)
    assert all(0 <= r["n_kept"] <= r["n_spans"] for r in rows.values())
    # a doc that lost nothing reconstructs to its normalized original
    untouched = [d for d, r in rows.items() if r["n_kept"] == r["n_spans"]]
    assert untouched, "fixture should contain docs with no duplicated spans"
    for d in untouched[:20]:
        assert rows[d]["clean_text"] == docs[d]
    # global uniqueness: no span string appears twice across clean texts
    from collections import Counter

    span_counts = Counter()
    for r in rows.values():
        words = r["clean_text"].split()
        # only count full spans (the trailing partial span is unique by
        # construction of the first-occurrence rule over full strings)
        for i in range(0, len(words) - 9, 10):
            span_counts[" ".join(words[i : i + 10])] += 1
    # spans may straddle reconstruction boundaries after removals, so
    # assert on documents that lost nothing (their span grid is intact)
    intact_counts = Counter()
    for d in untouched:
        words = rows[d]["clean_text"].split()
        for i in range(0, len(words), 10):
            intact_counts[" ".join(words[i : i + 10])] += 1
    assert all(c == 1 for c in intact_counts.values())


def test_semantic_dedup_invariants(spark, sf_dir):
    """Every cell keeps at least one member; dropped vectors always
    have a kept-or-earlier cell-mate above the cosine floor is hard to
    re-verify cheaply, but the minimum vec_id of every cell must be
    kept (it can never have a lower-id mate)."""
    from atlassian_confluence_data_pipeline_spark.plans.analytics import (
        semantic_dedup,
    )

    out = semantic_dedup(spark, sf_dir).collect()
    by_cell: dict[int, list] = {}
    for r in out:
        by_cell.setdefault(r["centroid_id"], []).append(r)
    for cell, members in by_cell.items():
        assert any(m["keep"] for m in members), f"cell {cell} kept nothing"
        min_member = min(members, key=lambda m: m["vec_id"])
        assert min_member["keep"], "lowest vec_id of a cell must be kept"


def test_asof_null_fields_come_from_the_matched_row(spark):
    """A NULL value column on the matched right row must stay NULL — not
    be backfilled from a different-ts right row (struct carry, not
    per-column carry)."""
    from atlassian_confluence_data_pipeline_spark.operators.joins import (
        asof_join_backward,
        asof_join_forward,
    )

    left = spark.createDataFrame(
        [(1, 100)], "k int, lts int"
    )
    right = spark.createDataFrame(
        [(1, 50, "old", 5.0), (1, 90, None, 9.0), (1, 120, None, 12.0),
         (1, 150, "new", 15.0)],
        "k int, rts int, label string, score double",
    )
    back = asof_join_backward(
        left, right, "k", "lts", "rts", ["label", "score"]
    ).collect()
    assert len(back) == 1
    # nearest at-or-before ts=100 is rts=90 whose label IS null
    assert back[0]["asof_label"] is None
    assert back[0]["asof_score"] == 9.0
    fwd = asof_join_forward(
        left, right, "k", "lts", "rts", ["label", "score"]
    ).collect()
    assert len(fwd) == 1
    # nearest at-or-after ts=100 is rts=120 whose label IS null
    assert fwd[0]["asof_label"] is None
    assert fwd[0]["asof_score"] == 12.0
