"""Custom Python DataSource *writer*: the reference's alert output as
a sink format with a real commit protocol.

The reference's Phase-5 consumer prints one NORMAL/ALERT line per
record from a single-threaded callback (realtime_inference.py:126-139)
— output is unordered console text with no delivery guarantee. This
sink makes that surface a format: ``df.writeStream.format
("alert_sink").option("path", dir)`` writes one line per row, with
two properties the reference lacks:

- **Task-level two-phase commit**: each task writes a uniquely named
  temp file and returns its name in a ``WriterCommitMessage``; only
  the driver's ``commit(messages, batchId)`` publishes them under
  ``batch-<id>/`` (rename), and ``abort`` removes the orphans. A
  failed/retried task therefore never leaves partial output — the
  file-sink analog of Spark's V2 write protocol, and strictly
  stronger than the reference's fire-and-forget print.
- **Partition-parallel**: alert formatting and writing happen on every
  executor; the reference is bound to one Python thread.

Batch writes (``df.write.format("alert_sink")``) share the same task
protocol with a single publish directory.
"""

from __future__ import annotations

import os
import uuid
from dataclasses import dataclass
from typing import Iterator, List, Optional

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclass
class _FileCommit(WriterCommitMessage):
    tmp_path: str
    rows: int


def _write_lines(options, iterator: Iterator) -> _FileCommit:
    """Task side: write all rows to a unique temp file, return its name.

    Rows must carry a string column named ``line`` (the formatted alert
    — functions/telemetry.alert_line produces reference-parity text)."""
    path = options.get("path")
    if not path:
        raise ValueError("alert_sink requires .option('path', <dir>)")
    tmp_dir = os.path.join(path, "_tmp")
    os.makedirs(tmp_dir, exist_ok=True)
    tmp = os.path.join(tmp_dir, f"task-{uuid.uuid4().hex}.txt")
    n = 0
    with open(tmp, "w", encoding="utf-8") as f:
        for row in iterator:
            f.write(row.line + "\n")
            n += 1
    return _FileCommit(tmp_path=tmp, rows=n)


def _publish(messages: List[Optional[_FileCommit]], out_dir: str) -> None:
    """Driver side: atomically move every task file into the published
    directory; called exactly once per successful batch."""
    os.makedirs(out_dir, exist_ok=True)
    for i, m in enumerate(messages):
        if m is not None:
            os.replace(m.tmp_path, os.path.join(out_dir, f"part-{i:05d}.txt"))


def _discard(messages: List[Optional[_FileCommit]]) -> None:
    for m in messages:
        if m is not None and os.path.exists(m.tmp_path):
            os.remove(m.tmp_path)


class AlertStreamWriter(DataSourceStreamWriter):
    def __init__(self, options) -> None:
        self.options = options

    def write(self, iterator) -> _FileCommit:
        return _write_lines(self.options, iterator)

    def commit(self, messages, batchId: int) -> None:  # noqa: N803 (API name)
        _publish(messages, os.path.join(self.options["path"], f"batch-{batchId}"))

    def abort(self, messages, batchId: int) -> None:  # noqa: N803
        _discard(messages)


class AlertBatchWriter(DataSourceWriter):
    def __init__(self, options) -> None:
        self.options = options

    def write(self, iterator) -> _FileCommit:
        return _write_lines(self.options, iterator)

    def commit(self, messages) -> None:
        _publish(messages, self.options["path"])

    def abort(self, messages) -> None:
        _discard(messages)


class AlertSinkDataSource(DataSource):
    """``format("alert_sink")`` — register via
    ``spark.dataSource.register(AlertSinkDataSource)``. Expects a
    single string column ``line``; option ``path`` is the output dir.

    Local-filesystem paths only (os-level rename is the commit
    primitive); an object-store variant would swap in a multipart
    upload finalize, same protocol."""

    @classmethod
    def name(cls) -> str:
        return "alert_sink"

    def writer(self, schema, overwrite: bool) -> AlertBatchWriter:
        return AlertBatchWriter(self.options)

    def streamWriter(self, schema, overwrite: bool) -> AlertStreamWriter:
        return AlertStreamWriter(self.options)
