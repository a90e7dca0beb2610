"""Streaming preference ingestion (foreach_batch_preference_state):
chopped duel streams must recover the batch win-rate matrix exactly,
and full replays must be no-ops."""

from __future__ import annotations

import uuid

from atlassian_confluence_data_pipeline_spark.operators.state import (
    AppendIndexStore,
)
from atlassian_confluence_data_pipeline_spark.plans.preference import (
    _duel_frame,
    preference_winrate_matrix,
)
from atlassian_confluence_data_pipeline_spark.streaming.jobs import (
    _DUEL_INDEX_SCHEMA,
    foreach_batch_preference_state,
    read_preference_state,
)

SF = "/root/testdata/sf0.001"
_SCHEMA = "s_a string, s_b string, winner string"


def _run(spark, tmp_path, batches, checkpoint=None):
    drop = tmp_path / "drop"
    drop.mkdir(exist_ok=True)
    for i, rows in enumerate(batches):
        dest = drop / f"b{i}.parquet"
        if not dest.exists():
            spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.parquet(
                str(dest)
            )
    store = AppendIndexStore(str(tmp_path / "duel_state"))
    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(drop) + "/*.parquet")
    )
    q = (
        foreach_batch_preference_state(stream, store)
        .option(
            "checkpointLocation",
            checkpoint or str(tmp_path / f"ck_{uuid.uuid4().hex[:6]}"),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return store


def _matrix(df):
    return sorted(map(tuple, df.collect()))


def test_chopped_stream_equals_batch_matrix(spark, tmp_path):
    duels = [
        (r.s_a, r.s_b, r.winner)
        for r in _duel_frame(spark, SF).orderBy("id_a", "id_b").collect()
    ]
    cut = len(duels) // 3
    store = _run(
        spark, tmp_path, [duels[:cut], duels[cut : 2 * cut], duels[2 * cut :]]
    )
    got = _matrix(read_preference_state(spark, store))
    want = _matrix(preference_winrate_matrix(spark, SF))
    assert got == want


def test_replay_is_noop(spark, tmp_path):
    duels = [
        (r.s_a, r.s_b, r.winner) for r in _duel_frame(spark, SF).collect()
    ]
    batches = [duels[: len(duels) // 2], duels[len(duels) // 2 :]]
    store = _run(spark, tmp_path, batches, checkpoint=str(tmp_path / "ck1"))
    before = _matrix(read_preference_state(spark, store))
    n_before = store.read(spark, _DUEL_INDEX_SCHEMA).count()
    # fresh checkpoint -> both batches replayed against warm state
    _run(spark, tmp_path, batches, checkpoint=str(tmp_path / "ck2"))
    assert _matrix(read_preference_state(spark, store)) == before
    assert store.read(spark, _DUEL_INDEX_SCHEMA).count() == n_before
