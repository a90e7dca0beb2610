"""Exact-substring dedup (plans/substring.py): planted verbatim runs
must surface as maximal (start_a, start_b, len_tokens) islands — not
split, not extended — and sub-threshold overlaps must not appear."""

from __future__ import annotations

import pytest

from atlassian_confluence_data_pipeline_spark.plans.substring import (
    MIN_OVERLAP_TOKENS,
    exact_substring_overlaps,
)


def _mk_docs(spark, tmp_path, rows):
    sf = tmp_path / "sf"
    sf.mkdir()
    spark.createDataFrame(rows, "doc_id bigint, text string").write.parquet(
        str(sf / "documents.parquet")
    )
    return str(sf)


def _tok(prefix, n, start=0):
    return " ".join(f"{prefix}{i}" for i in range(start, start + n))


def test_planted_verbatim_run_is_maximal(spark, tmp_path):
    k = MIN_OVERLAP_TOKENS
    shared = _tok("s", 20)  # 20-token verbatim block (> k)
    rows = [
        (1, _tok("a", 5) + " " + shared + " " + _tok("b", 7)),
        (2, _tok("c", 9) + " " + shared + " " + _tok("d", 3)),
        (3, _tok("e", 40)),  # no overlap with anyone
    ]
    sf = _mk_docs(spark, tmp_path, rows)
    out = {
        (r.doc_a, r.doc_b): (r.start_a, r.start_b, r.len_tokens)
        for r in exact_substring_overlaps(spark, sf).collect()
    }
    # exactly one maximal run, at the right offsets, exactly 20 tokens
    assert out == {(1, 2): (5, 9, 20)}


def test_sub_threshold_overlap_not_reported(spark, tmp_path):
    k = MIN_OVERLAP_TOKENS
    shared = _tok("s", k - 1)  # one token short of the window width
    rows = [
        (1, shared + " " + _tok("x", 10)),
        (2, shared + " " + _tok("y", 10)),
    ]
    sf = _mk_docs(spark, tmp_path, rows)
    assert exact_substring_overlaps(spark, sf).count() == 0


def test_two_disjoint_runs_stay_separate_islands(spark, tmp_path):
    k = MIN_OVERLAP_TOKENS
    r1, r2 = _tok("p", k + 2), _tok("q", k + 5)
    rows = [
        (1, r1 + " " + _tok("a", 6) + " " + r2),
        (2, r2 + " " + _tok("b", 9) + " " + r1),
    ]
    sf = _mk_docs(spark, tmp_path, rows)
    runs = {
        (r.start_a, r.start_b, r.len_tokens)
        for r in exact_substring_overlaps(spark, sf).collect()
    }
    # r1: doc1 offset 0, doc2 offset (k+5)+9; r2: doc1 (k+2)+6, doc2 0
    assert runs == {
        (0, (k + 5) + 9, k + 2),
        ((k + 2) + 6, 0, k + 5),
    }


def test_boilerplate_df_gate(spark, tmp_path, monkeypatch):
    """Window hashes shared by more than MAX_WINDOW_DF docs are dropped
    before the pair join (the scale guard)."""
    import atlassian_confluence_data_pipeline_spark.plans.substring as sub

    monkeypatch.setattr(sub, "MAX_WINDOW_DF", 3)
    k = MIN_OVERLAP_TOKENS
    boiler = _tok("lic", k + 4)  # "license header" in every doc
    rows = [(i, boiler + " " + _tok(f"u{i}_", 15)) for i in range(1, 6)]
    sf = _mk_docs(spark, tmp_path, rows)
    # 5 docs share it > MAX_WINDOW_DF=3 -> gated out entirely
    assert sub.exact_substring_overlaps(spark, sf).count() == 0


def test_apply_form_removes_span_from_higher_id_only(spark, tmp_path):
    from atlassian_confluence_data_pipeline_spark.plans.substring import (
        exact_substring_dedup_docs,
    )

    k = MIN_OVERLAP_TOKENS
    shared = _tok("s", k + 8)
    a_head, a_tail = _tok("a", 4), _tok("b", 3)
    c_head = _tok("c", 6)
    rows = [
        (1, a_head + " " + shared + " " + a_tail),
        (2, c_head + " " + shared),
        (3, _tok("z", 30)),
    ]
    sf = _mk_docs(spark, tmp_path, rows)
    out = {r.doc_id: r for r in exact_substring_dedup_docs(spark, sf).collect()}
    # doc 1 (first occurrence) keeps everything
    assert out[1].n_removed == 0
    assert out[1].clean_text == rows[0][1]
    # doc 2 loses exactly the shared span, keeps its own head
    assert out[2].n_removed == k + 8
    assert out[2].n_kept == 6
    assert out[2].clean_text == c_head
    # untouched doc is passthrough
    assert out[3].n_removed == 0 and out[3].clean_text == rows[2][1]
    # token accounting closes
    for r in out.values():
        assert r.n_tokens == r.n_kept + r.n_removed
