"""Round-7 packing-wave invariants: concat-and-chop accounting."""

from __future__ import annotations

from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.catalog import load_table
from atlassian_confluence_data_pipeline_spark.plans import QUERIES
from atlassian_confluence_data_pipeline_spark.plans.packing import CTX_TOKENS


def test_pack_sequences_conserves_docs_and_tokens(spark, sf_dir):
    per_win = QUERIES["pack_sequences"].fn(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    tok_total = docs.select(
        F.sum(F.size(F.split(F.trim("text"), r"\s+"))).alias("t")
    ).first()["t"]
    tot = per_win.agg(
        F.sum("n_docs_started").alias("d"),
        F.sum("n_tokens_started").alias("t"),
        F.sum("n_chopped").alias("c"),
        F.min("window_id").alias("lo"),
        F.max("window_id").alias("hi"),
    ).first()
    assert tot["d"] == docs.count()
    assert tot["t"] == tok_total
    assert tot["c"] <= tot["d"]
    assert tot["lo"] == 0
    # start-windows are a subset of [0, ceil(total/CTX)): the last
    # window that can START a doc is the one holding the final token
    assert tot["hi"] <= (tok_total - 1) // CTX_TOKENS


def test_packing_summary_consistent_with_per_window_view(spark, sf_dir):
    s = QUERIES["packing_summary"].fn(spark, sf_dir).first()
    per_win = QUERIES["pack_sequences"].fn(spark, sf_dir)
    tot = per_win.agg(
        F.sum("n_docs_started").alias("d"),
        F.sum("n_tokens_started").alias("t"),
        F.sum("n_chopped").alias("c"),
    ).first()
    assert s["n_docs"] == tot["d"]
    assert s["n_tokens"] == tot["t"]
    assert s["n_chopped"] == tot["c"]
    assert s["n_windows"] == (s["n_tokens"] + CTX_TOKENS - 1) // CTX_TOKENS
    assert 0.0 <= s["chop_rate"] <= 1.0


def test_pack_chop_flag_matches_direct_computation(spark, sf_dir):
    """A document is chopped iff its token span crosses a CTX boundary:
    re-derive per-doc flags with an independent (collected, sf0.001)
    prefix computation and compare totals."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("tok"))
        .orderBy("doc_id")
        .collect()
    )
    cum = 0
    chopped = 0
    for r in docs:
        start_w = cum // CTX_TOKENS
        cum += r["tok"]
        end_w = (cum - 1) // CTX_TOKENS
        if end_w > start_w:
            chopped += 1
    got = (
        QUERIES["pack_sequences"].fn(spark, sf_dir)
        .agg(F.sum("n_chopped").alias("c"))
        .first()["c"]
    )
    assert got == chopped


def test_pack_plan_has_no_unpartitioned_window(spark, sf_dir):
    """The global prefix must be the range-bucketed two-pass operator,
    never a single-partition WindowExec over the corpus."""
    import re

    df = QUERIES["pack_sequences"].fn(spark, sf_dir)
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert not re.search(
        r"windowspecdefinition\([^,()]+ (?:ASC|DESC) NULLS", phys
    )
