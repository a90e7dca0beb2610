"""AppendIndexStore: O(batch) streaming-index partitions (round-6)."""

from __future__ import annotations

from atlassian_confluence_data_pipeline_spark.operators.state import (
    AppendIndexStore,
)

SCHEMA = "doc_id bigint, fp string"


def test_empty_read_has_schema(spark, tmp_path):
    st = AppendIndexStore(str(tmp_path / "idx"))
    df = st.read(spark, SCHEMA)
    assert df.count() == 0
    assert df.columns == ["doc_id", "fp"]
    assert not st.has_data()


def test_partitions_accumulate_and_replay_overwrites(spark, tmp_path):
    st = AppendIndexStore(str(tmp_path / "idx"))
    st.write_batch(spark.createDataFrame([(1, "a"), (2, "b")], SCHEMA), 0)
    st.write_batch(spark.createDataFrame([(3, "c")], SCHEMA), 1)
    assert st.has_data()
    rows = sorted(
        (r["doc_id"], r["fp"]) for r in st.read(spark, SCHEMA).collect()
    )
    assert rows == [(1, "a"), (2, "b"), (3, "c")]
    # replayed batch overwrites ONLY its own partition — identical rows
    # leave the union unchanged, changed rows replace just that batch
    st.write_batch(spark.createDataFrame([(1, "a"), (2, "b")], SCHEMA), 0)
    rows2 = sorted(
        (r["doc_id"], r["fp"]) for r in st.read(spark, SCHEMA).collect()
    )
    assert rows2 == rows
    st.write_batch(spark.createDataFrame([(9, "z")], SCHEMA), 1)
    rows3 = sorted(
        (r["doc_id"], r["fp"]) for r in st.read(spark, SCHEMA).collect()
    )
    assert rows3 == [(1, "a"), (2, "b"), (9, "z")]


# ---------------------------------------------------------------------------
# Compaction (round-7: bound the per-micro-batch small-file growth)
# ---------------------------------------------------------------------------


def _all_rows(spark, st):
    return sorted(
        (r["doc_id"], r["fp"]) for r in st.read(spark, SCHEMA).collect()
    )


def _batch_dir_count(st):
    import os

    return sum(1 for d in os.listdir(st.path) if d.startswith("batch="))


def _compacted_dir_count(st):
    import os

    return sum(1 for d in os.listdir(st.path) if d.startswith("compacted-"))


def test_compact_read_equivalence_and_bounded_partitions(spark, tmp_path):
    """100 synthetic micro-batches -> compact -> identical read, bounded
    partition count (the round-6 top item's done-bar)."""
    st = AppendIndexStore(str(tmp_path / "idx"))
    expect = []
    for b in range(100):
        rows = [(b * 10 + j, f"fp{b}-{j}") for j in range(2)]
        expect.extend(rows)
        st.write_batch(spark.createDataFrame(rows, SCHEMA), b)
    assert _batch_dir_count(st) == 100
    wm = st.compact(spark, SCHEMA, keep_recent=5)
    assert wm == 94
    assert _batch_dir_count(st) == 5
    assert _compacted_dir_count(st) == 1
    assert _all_rows(spark, st) == sorted(expect)
    # incremental: more batches, second compact folds the PRIOR
    # consolidated partition too — still exactly one compacted dir
    for b in range(100, 110):
        rows = [(b * 10, f"fp{b}-0")]
        expect.extend(rows)
        st.write_batch(spark.createDataFrame(rows, SCHEMA), b)
    assert st.compact(spark, SCHEMA, keep_recent=5) == 104
    assert _batch_dir_count(st) == 5
    assert _compacted_dir_count(st) == 1
    assert _all_rows(spark, st) == sorted(expect)
    # nothing new to fold -> no-op
    assert st.compact(spark, SCHEMA, keep_recent=5) is None


def test_replay_of_compacted_batch_is_noop(spark, tmp_path):
    """A restart replaying a batch BELOW the compaction watermark must
    not duplicate its rows: the rewritten batch dir is invisible."""
    st = AppendIndexStore(str(tmp_path / "idx"))
    for b in range(10):
        st.write_batch(spark.createDataFrame([(b, f"fp{b}")], SCHEMA), b)
    st.compact(spark, SCHEMA, keep_recent=2)
    before = _all_rows(spark, st)
    st.write_batch(spark.createDataFrame([(3, "fp3")], SCHEMA), 3)  # replay
    assert _all_rows(spark, st) == before
    assert st.compact(spark, SCHEMA, keep_recent=2) is None  # still folded


def test_crash_before_pointer_flip_leaves_old_view(spark, tmp_path, monkeypatch):
    """Compaction dies after writing the consolidated partition but
    BEFORE the manifest commit: readers keep the pre-compaction view,
    and a retried compaction converges."""
    st = AppendIndexStore(str(tmp_path / "idx"))
    for b in range(10):
        st.write_batch(spark.createDataFrame([(b, f"fp{b}")], SCHEMA), b)
    before = _all_rows(spark, st)

    def boom(new_dir, new_max):
        raise RuntimeError("crash before commit")

    monkeypatch.setattr(st, "_commit_pointer", boom)
    import pytest as _pytest

    with _pytest.raises(RuntimeError):
        st.compact(spark, SCHEMA, keep_recent=2)
    assert _all_rows(spark, st) == before  # old pointer, dirs intact
    monkeypatch.undo()
    assert st.compact(spark, SCHEMA, keep_recent=2) == 7
    assert _all_rows(spark, st) == before
    assert _batch_dir_count(st) == 2


def test_crash_after_commit_before_cleanup_is_consistent(
    spark, tmp_path, monkeypatch
):
    """Compaction dies AFTER the manifest commit but before deleting the
    folded inputs: leftover batch dirs sit below the watermark and are
    ignored; a later compaction reaps them."""
    st = AppendIndexStore(str(tmp_path / "idx"))
    for b in range(10):
        st.write_batch(spark.createDataFrame([(b, f"fp{b}")], SCHEMA), b)
    before = _all_rows(spark, st)

    def boom(srcs):
        raise RuntimeError("crash after commit")

    monkeypatch.setattr(st, "_post_commit_cleanup", boom)
    import pytest as _pytest

    with _pytest.raises(RuntimeError):
        st.compact(spark, SCHEMA, keep_recent=2)
    # committed: new view is live and EQUIVALENT despite leftovers
    assert _all_rows(spark, st) == before
    assert _batch_dir_count(st) == 10  # leftovers below the watermark
    monkeypatch.undo()
    # replay of a folded batch mid-recovery stays invisible
    st.write_batch(spark.createDataFrame([(0, "fp0")], SCHEMA), 0)
    assert _all_rows(spark, st) == before


def test_write_batch_crash_leaves_target_untouched(spark, tmp_path, monkeypatch):
    """write_batch renames a finished .tmp dir into place: a crash
    before the rename leaves the previous batch partition fully
    readable (committer-v2 half-written files can never surface)."""
    st = AppendIndexStore(str(tmp_path / "idx"))
    st.write_batch(spark.createDataFrame([(1, "a")], SCHEMA), 0)
    before = _all_rows(spark, st)

    def boom(tmp, target):
        raise RuntimeError("crash before swap")

    monkeypatch.setattr(st, "_swap_in", boom)
    import pytest as _pytest

    with _pytest.raises(RuntimeError):
        st.write_batch(spark.createDataFrame([(2, "b")], SCHEMA), 0)
    assert _all_rows(spark, st) == before
    monkeypatch.undo()
    st.write_batch(spark.createDataFrame([(2, "b")], SCHEMA), 0)
    assert _all_rows(spark, st) == [(2, "b")]
