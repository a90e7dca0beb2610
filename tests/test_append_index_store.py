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
