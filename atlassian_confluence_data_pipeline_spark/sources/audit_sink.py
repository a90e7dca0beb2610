"""K4/K5 as an OFFICIAL Spark STREAMING sink: a Python Data Source V2
stream writer for the reference's append-only audit log
(secure_cookie_manager.py:80-88 ``_audit_log`` — timestamped lines in
one file; master_script's run reports are the same shape).

The reference appends a line per event to a shared file — unreplayable
and racy. The engine's rendering keeps the audit content but makes the
sink EXACTLY-ONCE under micro-batch replay:

- each task stages its lines and reports them in the commit message;
- the driver's per-batch ``commit(messages, batchId)`` publishes ONE
  file named by the batch id (``batch-{id:020d}.log``) with an atomic
  rename. A replayed batch (failure after publish, before the
  streaming checkpoint committed) re-publishes the SAME filename with
  the same content — overwrite-idempotent, the file-sink analog of the
  CMS merge's batch-id guard (streaming/jobs.py);
- ``abort`` drops the staging data; published batches are never touched.

Usage::

    df.writeStream.format("audit_log").option("path", dir)
      .option("line_col", "line").option("checkpointLocation", ck).start()
"""

from __future__ import annotations

import os
import uuid
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    WriterCommitMessage,
)
from pyspark.sql.types import Row, StructType

STAGING = "_staging"


@dataclass
class _Lines(WriterCommitMessage):
    staging_file: str
    n_lines: int
    partition_id: int = -1


class AuditLogStreamWriter(DataSourceStreamWriter):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("audit_log sink requires a path")
        self.line_col = options.get("line_col", "line")

    def write(self, iterator: Iterator[Row]) -> WriterCommitMessage:
        from pyspark import TaskContext

        staging_dir = os.path.join(self.path, STAGING)
        os.makedirs(staging_dir, exist_ok=True)
        fname = os.path.join(staging_dir, uuid.uuid4().hex)
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else -1
        n = 0
        with open(fname, "w") as fh:
            for row in iterator:
                fh.write((row[self.line_col] or "") + "\n")
                n += 1
        return _Lines(staging_file=fname, n_lines=n, partition_id=pid)

    def commit(self, messages, batchId: int) -> None:
        # deterministic batch filename => replays overwrite, not append.
        # Concatenate in PARTITION order (one message per partition), not
        # staging-file order (uuid names are random per attempt), so a
        # replayed batch republishes byte-identical content — the
        # docstring's idempotence claim holds for bytes, not just the
        # line multiset.
        final = os.path.join(self.path, f"batch-{batchId:020d}.log")
        tmp = final + ".tmp"
        with open(tmp, "w") as out:
            for m in sorted(
                (m for m in messages if m is not None),
                key=lambda m: (m.partition_id, m.staging_file),
            ):
                with open(m.staging_file) as fh:
                    out.write(fh.read())
                os.remove(m.staging_file)
        os.replace(tmp, final)  # atomic publish

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.staging_file):
                os.remove(m.staging_file)


class AuditLogDataSource(DataSource):
    """``df.writeStream.format("audit_log")`` — options: path, line_col."""

    @classmethod
    def name(cls) -> str:
        return "audit_log"

    def schema(self) -> str:  # pragma: no cover - writer-only source
        return "line string"

    def streamWriter(
        self, schema: StructType, overwrite: bool
    ) -> AuditLogStreamWriter:
        return AuditLogStreamWriter(self.options)


def register(spark) -> None:
    from atlassian_confluence_data_pipeline_spark.pyfiles import (
        ensure_package_on_workers,
    )

    ensure_package_on_workers(spark)
    spark.dataSource.register(AuditLogDataSource)
