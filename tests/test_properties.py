"""Property-based tests (SURVEY.md §5 layer 3) for semantics-critical
invariants: the lexical-vs-timestamp date-compare parity the reference
relies on (§1.2), MERGE idempotence/monotonicity, union-dedup priority,
and filename-sanitization safety."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from hypothesis import given, settings, strategies as st

from atlassian_confluence_data_pipeline_spark.functions.text import (
    FORBIDDEN_FILENAME_CHARS,
)

# ---------------------------------------------------------------------------
# §1.2: the reference compares ISO-8601 timestamp STRINGS lexically
# against 'YYYY-MM-DD' date strings (master_script.py:279,284-285). The
# engine uses real timestamps with >= day-midnight. Property: the two
# agree for every timestamp, including the inclusive boundary day.
# ---------------------------------------------------------------------------

_timestamps = st.datetimes(
    min_value=datetime(1990, 1, 1), max_value=datetime(2030, 12, 31)
)
_dates = st.dates(min_value=datetime(1990, 1, 1).date(), max_value=datetime(2030, 12, 31).date())


@given(ts=_timestamps, cutoff=_dates)
@settings(max_examples=500, deadline=None)
def test_lexical_date_compare_equals_timestamp_compare(ts, cutoff):
    lexical = ts.isoformat() >= cutoff.strftime("%Y-%m-%d")
    timestamped = ts >= datetime(cutoff.year, cutoff.month, cutoff.day)
    assert lexical == timestamped


# ---------------------------------------------------------------------------
# merge_state algebra
# ---------------------------------------------------------------------------

_ledger_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9).map(str),  # id (collision-prone)
        st.integers(min_value=1, max_value=50),  # version
    ),
    min_size=0,
    max_size=12,
)


@pytest.mark.usefixtures("spark")
@given(state_rows=_ledger_rows, update_rows=_ledger_rows)
@settings(max_examples=15, deadline=None)
def test_merge_state_properties(spark, state_rows, update_rows):
    from atlassian_confluence_data_pipeline_spark.operators.state import merge_state

    schema = "id string, version int"
    # ledger itself is unique per key (take max version per id)
    state_map: dict[str, int] = {}
    for i, v in state_rows:
        state_map[i] = max(state_map.get(i, 0), v)
    state = spark.createDataFrame(list(state_map.items()) or [], schema)
    updates = spark.createDataFrame(update_rows or [], schema)
    merged = {r["id"]: r["version"] for r in merge_state(state, updates, "id", "version").collect()}

    update_max = {}
    for i, v in update_rows:
        update_max[i] = max(update_max.get(i, 0), v)
    # expected: updates win on their keys (latest version), others survive
    expected = dict(state_map)
    expected.update(update_max)
    assert merged == expected

    # idempotence: merging the same updates again changes nothing
    merged_df = merge_state(state, updates, "id", "version")
    again = {
        r["id"]: r["version"]
        for r in merge_state(merged_df, updates, "id", "version").collect()
    }
    assert again == merged


# ---------------------------------------------------------------------------
# union_dedup priority
# ---------------------------------------------------------------------------


@pytest.mark.usefixtures("spark")
@given(
    a_rows=st.lists(st.tuples(st.integers(0, 6), st.text("ab", max_size=3)), max_size=8),
    b_rows=st.lists(st.tuples(st.integers(0, 6), st.text("ab", max_size=3)), max_size=8),
)
@settings(max_examples=15, deadline=None)
def test_union_dedup_first_frame_wins(spark, a_rows, b_rows):
    from atlassian_confluence_data_pipeline_spark.operators.dedup import union_dedup

    schema = "k int, payload string"
    # make each frame unique per key first (operator contract: phases are
    # already deduped; cross-phase priority is what is under test)
    a_map = dict(reversed(a_rows))
    b_map = dict(reversed(b_rows))
    a = spark.createDataFrame(list(a_map.items()) or [], schema)
    b = spark.createDataFrame(list(b_map.items()) or [], schema)
    out = {r["k"]: r["payload"] for r in union_dedup(a, b, ["k"]).collect()}
    expected = dict(b_map)
    expected.update(a_map)  # frame a has priority
    assert out == expected


# ---------------------------------------------------------------------------
# sanitize_filename safety
# ---------------------------------------------------------------------------


@pytest.mark.usefixtures("spark")
@given(
    names=st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            min_size=1,
            max_size=260,
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=10, deadline=None)
def test_sanitize_filename_safe(spark, names):
    from pyspark.sql import functions as F

    from atlassian_confluence_data_pipeline_spark.functions.text import (
        sanitize_filename,
    )

    df = spark.createDataFrame([(n,) for n in names], "name string")
    out = [r["s"] for r in df.select(sanitize_filename(F.col("name")).alias("s")).collect()]
    for s in out:
        assert len(s) <= 200
        assert not any(c in s for c in FORBIDDEN_FILENAME_CHARS.replace("_", ""))
