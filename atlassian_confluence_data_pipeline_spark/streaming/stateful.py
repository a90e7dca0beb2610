"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md §2.9: 'keyed mutable state across runs' — the reference's
state ledger held in memory between pages, state_manager.py:84-102 —
as a true streaming stateful transform).

Per user, the operator maintains (count, total value, max event id)
across micro-batches and emits the updated running row each batch —
the streaming rendering of the reference's accumulate-then-report
counters (master_script.py:294-300, 590-609).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double, max_event_id bigint"
STATE_SCHEMA = "n bigint, total double, max_id bigint"


def _update_user_state(
    key: Tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total, max_id = state.get
    else:
        n, total, max_id = 0, 0.0, -1
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
        max_id = max(max_id, int(pdf["event_id"].max()))
    state.update((n, total, max_id))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [total],
            "max_event_id": [max_id],
        }
    )


def running_user_stats(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Arbitrary stateful per-key aggregation over the stream. State is
    a fixed-width tuple per user — bounded memory regardless of stream
    length; the watermark bounds how long idle keys are retained by the
    engine's state store."""
    from atlassian_confluence_data_pipeline_spark.pyfiles import (
        ensure_package_on_workers,
    )

    ensure_package_on_workers()
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_state,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


TRANSITION_OUTPUT_SCHEMA = (
    "user_id bigint, prev_type string, event_type string, n bigint"
)
TRANSITION_STATE_SCHEMA = "last_type string"


def _update_transitions(
    key: Tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    last_type = state.get[0] if state.exists else None
    counts: dict = {}
    for pdf in batches:
        pdf = pdf.sort_values(["ts", "event_id"])
        types = pdf["event_type"].tolist()
        prevs = [last_type] + types[:-1]
        for p, t in zip(prevs, types):
            if p is not None:
                counts[(p, t)] = counts.get((p, t), 0) + 1
        if types:
            last_type = types[-1]
    state.update((last_type,))
    if counts:
        ks = sorted(counts)
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(ks),
                "prev_type": [k[0] for k in ks],
                "event_type": [k[1] for k in ks],
                "n": [counts[k] for k in ks],
            }
        )


def streaming_transition_counts(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming first-order transition counts per user: the batch
    `event_transition_matrix` semantics with the LAST event type of
    each micro-batch carried in keyed state, so the first event of
    batch N+1 correctly pairs with the last event of batch N — the
    link a per-batch lag window cannot see. State is one string per
    user (bounded); each batch emits ITS OWN transition increments
    (append-style update), which downstream sums into the matrix."""
    from atlassian_confluence_data_pipeline_spark.pyfiles import (
        ensure_package_on_workers,
    )

    ensure_package_on_workers()
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_transitions,
            outputStructType=TRANSITION_OUTPUT_SCHEMA,
            stateStructType=TRANSITION_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
