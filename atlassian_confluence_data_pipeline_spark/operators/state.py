"""State ledger: the processed-versions table + MERGE-style upsert (K3).

The reference persists a key->version dict as one JSON file and rewrites
the whole file after every processed page (state_manager.py:84-102,
:42-49 — O(state) I/O per row). The engine's rendering:

- the ledger is a DataFrame/Parquet *table* keyed by ``id``;
- upsert is a set-level MERGE — ``state ⟕anti updates ∪ updates`` — one
  shuffle per batch, not one rewrite per row;
- multi-version batches resolve to latest-per-key first (W2; the
  reference gets this implicitly from sequential overwrite, :93-99);
- persistence is snapshot directories + an atomic pointer file, the
  Delta-less rendering of ``MERGE INTO`` with atomic visibility.
"""

from __future__ import annotations

import json
import os
import tempfile
import time
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from atlassian_confluence_data_pipeline_spark.operators.dedup import latest_per_key

#: reference ledger row shape (state_manager.py:93-99)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("title", T.StringType(), True),
        T.StructField("space_key", T.StringType(), True),
        T.StructField("version", T.IntegerType(), True),
        T.StructField("last_modified", T.StringType(), True),
        T.StructField(
            "output_paths", T.MapType(T.StringType(), T.StringType()), True
        ),
    ]
)


def merge_state(
    state: DataFrame,
    updates: DataFrame,
    key: str | Sequence[str] = "id",
    version_col: str = "version",
) -> DataFrame:
    """Last-write-wins MERGE of ``updates`` into ``state``.

    Updates are first collapsed to the highest version per key
    (deterministic W2), then: unmatched state rows survive, matched keys
    take the update row, new keys insert — exactly
    ``MERGE INTO state USING u ON key WHEN MATCHED UPDATE * WHEN NOT
    MATCHED INSERT *``, as an anti-join + union (one shuffle each)."""
    keys = [key] if isinstance(key, str) else list(key)
    u = latest_per_key(updates, keys, [version_col])
    return state.join(u.select(*keys), keys, "left_anti").unionByName(u)


class StateStore:
    """Snapshot-directory ledger with an atomic current-pointer.

    Layout::

        {path}/snapshot-{epoch_ns}/   <- parquet snapshots
        {path}/_CURRENT               <- JSON {"snapshot": "snapshot-..."}

    ``write`` writes the new snapshot fully, then atomically replaces the
    pointer (os.replace) — readers always see a complete snapshot, never
    a partial one. This is the engine's Delta-less MERGE commit protocol;
    on a real deployment the same operator writes through Delta/Iceberg.
    """

    POINTER = "_CURRENT"

    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)

    def _pointer_path(self) -> str:
        return os.path.join(self.path, self.POINTER)

    def current_snapshot(self) -> str | None:
        try:
            with open(self._pointer_path()) as fh:
                return json.load(fh)["snapshot"]
        except (FileNotFoundError, KeyError, json.JSONDecodeError):
            return None  # missing/corrupt pointer -> empty ledger
            # (tolerant-load parity with state_manager.py:20-40)

    def list_snapshots(self) -> list[str]:
        """All retained snapshots, oldest first (names embed epoch-ns)."""
        return sorted(
            d for d in os.listdir(self.path) if d.startswith("snapshot-")
        )

    def read(self, spark: SparkSession, snapshot: str | None = None) -> DataFrame:
        """Read the current ledger, or time-travel to a named snapshot
        (every upsert retains its full predecessor until vacuumed)."""
        snap = snapshot or self.current_snapshot()
        if snap is None:
            return spark.createDataFrame([], STATE_SCHEMA)
        return spark.read.parquet(os.path.join(self.path, snap))

    def vacuum(self, keep: int = 3) -> list[str]:
        """Drop all but the newest ``keep`` snapshots (never the current
        one). Returns the removed snapshot names."""
        import shutil

        snaps = self.list_snapshots()
        current = self.current_snapshot()
        removable = [s for s in snaps[:-keep] if s != current] if keep else [
            s for s in snaps if s != current
        ]
        for s in removable:
            shutil.rmtree(os.path.join(self.path, s), ignore_errors=True)
        return removable

    def write(self, df: DataFrame) -> str:
        snap = f"snapshot-{time.time_ns()}"
        df.write.mode("overwrite").parquet(os.path.join(self.path, snap))
        fd, tmp = tempfile.mkstemp(dir=self.path, prefix=".ptr-")
        with os.fdopen(fd, "w") as fh:
            json.dump({"snapshot": snap}, fh)
        os.replace(tmp, self._pointer_path())  # atomic visibility flip
        return snap

    def upsert(
        self,
        spark: SparkSession,
        updates: DataFrame,
        key: str | Sequence[str] = "id",
        version_col: str = "version",
    ) -> DataFrame:
        """Read-merge-write one batch; returns the merged ledger."""
        merged = merge_state(self.read(spark), updates, key, version_col)
        # materialize before the pointer flip so the new snapshot never
        # lazily re-reads the directory it is replacing
        merged = merged.localCheckpoint(eager=True)
        self.write(merged)
        return merged


class AppendIndexStore:
    """Append-only, batch-partitioned index for streaming jobs whose
    state only GROWS (band indexes, fingerprint sets) — the O(batch)
    complement to StateStore's O(state) snapshot rewrite.

    Layout::

        {path}/batch={batch_id}/   <- one parquet dir per micro-batch

    ``write_batch`` overwrites ONLY its own batch partition, so a
    replayed micro-batch (restart recovery) rewrites the identical
    rows instead of growing the index — idempotent by layout, no
    read-modify-write, no snapshot churn. ``read`` unions every batch
    partition (Spark partition discovery; the synthetic ``batch``
    column is dropped). A streaming index that is instead REVISED
    per key belongs in StateStore's MERGE path, not here."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)

    def _batch_dirs(self) -> list[str]:
        return sorted(
            os.path.join(self.path, d)
            for d in os.listdir(self.path)
            if d.startswith("batch=")
        )

    def has_data(self) -> bool:
        return bool(self._batch_dirs())

    def read(self, spark: SparkSession, schema: str) -> DataFrame:
        """Union of all batch partitions; empty frame of ``schema``
        when nothing has been written yet. Partitions are listed
        explicitly and the schema supplied (no glob discovery, no
        inference — both flake on freshly-written directories)."""
        dirs = self._batch_dirs()
        if not dirs:
            return spark.createDataFrame([], schema)
        return spark.read.schema(schema).parquet(*dirs)

    def write_batch(self, df: DataFrame, batch_id: int) -> None:
        df.write.mode("overwrite").parquet(
            os.path.join(self.path, f"batch={int(batch_id)}")
        )
