"""Size-OR-time buffered delivery — Firehose ``BufferingHints`` parity
(phase3-kinesis-s3.yaml:86-88: ``SizeInMBs: 5`` / ``IntervalInSeconds:
300``), the one reference flush semantic ``lake_sink`` could not
express (SURVEY §2.1 O13's former documented deviation).

Structured Streaming has no size-based trigger, so the buffer lives in
the SINK, where Firehose keeps it too: each micro-batch is staged as
gzip JSON part files; a delivery — moving every staged file under the
arrival-time ``telemetry/YYYY/MM/DD/HH/`` prefix — happens when the
staged bytes reach ``max_bytes`` OR ``max_secs`` has elapsed since the
last delivery, whichever comes first. That is byte-for-byte the
BufferingHints contract, including the prefix being DELIVERY-time
(Firehose stamps objects with arrival time; ``lake_sink``'s
event-time partitioning is the engine's separate improvement path).

Delivery semantics: AT-LEAST-ONCE — exactly Firehose's own guarantee,
and deliberately so (the stronger exactly-once path is ``lake_sink``'s
file-sink commit log). The mechanics:

- staging is per-batch ``mode("overwrite")`` → a replayed micro-batch
  rewrites its own staging dir instead of duplicating it;
- promotion renames each staged part file to a name embedding its
  batch id (rename is atomic per file; a crash mid-promotion leaves
  the remainder staged, and the next trigger's promotion retries
  them — nothing is lost, nothing renamed twice);
- a batch replayed AFTER its files were promoted stages fresh copies,
  which a later delivery promotes again → duplicate delivery, the
  at-least-once case. Consumers dedup within watermark (the engine's
  standing at-least-once posture, SURVEY §2.3).

Scale: staged-byte accounting walks ONE prefix whose size is bounded
by ``max_bytes`` + one trigger's input — O(flush budget), never
O(history). On a 1000-executor cluster the write is distributed
(executors write staging parts); only the cheap list-and-rename
promotion runs on the driver, mirroring Firehose's control/data
split. Promotion here uses local-filesystem ``os.replace`` (the
engine's lake is a posix path, as everywhere in this repo); on
HDFS/S3 swap the three fs calls (list/getsize/rename) for the
store's — rename is atomic on HDFS, and on S3 a manifest-commit
replaces it (the same adaptation ``lake_sink``'s file-sink log
already gets from Spark's committers).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from .pipeline import GOOD_PREFIX

#: Firehose BufferingHints defaults (phase3-kinesis-s3.yaml:86-88).
BUFFER_MAX_BYTES = 5 * 1024 * 1024
BUFFER_MAX_SECS = 300


class SizeOrTimeBuffer:
    """The foreachBatch callable implementing the buffer; separable
    from the stream so tests can drive it with static frames."""

    def __init__(
        self,
        path: str,
        max_bytes: int = BUFFER_MAX_BYTES,
        max_secs: float = BUFFER_MAX_SECS,
        prefix: str = GOOD_PREFIX,
        clock=time.time,
    ) -> None:
        self.path = path
        self.staging = os.path.join(path, ".staging")
        self.prefix = prefix
        self.max_bytes = max_bytes
        self.max_secs = max_secs
        self.clock = clock
        # Persisted last-delivery stamp AND delivery counter: a
        # restarted query resumes the interval from the marker instead
        # of resetting it (Firehose's clock does not reset when a
        # consumer restarts), and delivered object names keep their
        # monotonic delivery id across restarts (the counter would
        # otherwise restart at delivery000000- inside the same hour
        # prefix — never a collision thanks to the Spark part UUIDs,
        # but a lying monitoring metric).
        self._marker = os.path.join(path, ".last_delivery")
        self._last_flush, self.deliveries = self._read_marker()

    def _read_marker(self) -> tuple[float, int]:
        try:
            with open(self._marker) as fh:
                lines = fh.read().splitlines()
            t = float(lines[0].strip())
            # pre-r14 markers carried only the stamp: counter resumes 0
            n = int(lines[1].strip()) if len(lines) > 1 else 0
            return t, n
        except (OSError, ValueError, IndexError):
            # first start: the interval begins NOW, and durably so — a
            # restart must resume this interval, not restart it
            t = self.clock()
            self._write_marker(t, 0)
            return t, 0

    def _write_marker(self, t: float, deliveries: int) -> None:
        # write-then-rename: a crash mid-write must never leave a torn
        # marker, or the restart path would silently reset BOTH the
        # interval stamp and the delivery counter — the two regressions
        # the marker exists to prevent
        os.makedirs(self.path, exist_ok=True)
        tmp = f"{self._marker}.tmp"
        with open(tmp, "w") as fh:
            fh.write(f"{t!r}\n{deliveries}")
        os.replace(tmp, self._marker)

    def _staged_files(self) -> list[str]:
        out = []
        for root, _, files in os.walk(self.staging):
            for f in files:
                if f.endswith(".gz"):
                    out.append(os.path.join(root, f))
        return sorted(out)

    def staged_bytes(self) -> int:
        return sum(os.path.getsize(f) for f in self._staged_files())

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        # Stage this batch (idempotent under replay: overwrite of the
        # batch's OWN dir). Executors write the gzip parts in parallel.
        # The write is UNCONDITIONAL: an empty batch yields zero ``.gz``
        # parts (Spark skips empty partitions for text-based formats)
        # and its side-file-only dir is swept below — cheaper than the
        # former per-batch ``isEmpty()``, which planned the batch twice
        # (one Spark job for the probe, one for the write).
        (
            batch_df.write.mode("overwrite")
            .option("compression", "gzip")
            .json(os.path.join(self.staging, f"batch_{batch_id}"))
        )
        self.maybe_deliver()

    def _sweep(self) -> None:
        """Remove batch dirs that hold no deliverable ``.gz`` parts.

        Spark's local writes leave ``_SUCCESS`` and ``.crc`` side files
        in every batch dir, so after promotion the dir is never empty —
        without deleting those leftovers first, staging would keep one
        dir per micro-batch FOREVER and ``_staged_files()`` would walk
        the whole history each trigger (O(history), breaking the
        O(flush budget) scale contract). Any dir still holding a
        ``.gz`` (e.g. one being retried after a crash mid-promotion)
        is left alone."""
        for root, dirs, files in list(os.walk(self.staging, topdown=False)):
            if root == self.staging:
                continue
            if any(f.endswith(".gz") for f in files):
                continue
            for f in files:  # committer side files only at this point
                try:
                    os.remove(os.path.join(root, f))
                except OSError:
                    pass
            if not os.listdir(root):
                os.rmdir(root)

    def maybe_deliver(self, force: bool = False) -> int:
        """Promote staged files if a BufferingHints condition holds.
        Returns the number of files delivered (0 = no flush due)."""
        now = self.clock()
        self._sweep()
        staged = self._staged_files()
        if not staged:
            # Firehose delivers nothing on an empty buffer; the
            # interval clock still advances so a later lone record
            # is not flushed instantly by a long-expired timer.
            if now - self._last_flush >= self.max_secs:
                self._last_flush = now
                self._write_marker(now, self.deliveries)
            return 0
        due = (
            force
            or sum(os.path.getsize(f) for f in staged) >= self.max_bytes
            or now - self._last_flush >= self.max_secs
        )
        if not due:
            return 0
        # Arrival-time prefix, stamped at DELIVERY (Firehose default
        # prefix layout, docs/phase3-kinesis-s3.md parity).
        t = time.gmtime(now)
        dated = os.path.join(
            self.path,
            self.prefix,
            f"{t.tm_year:04d}",
            f"{t.tm_mon:02d}",
            f"{t.tm_mday:02d}",
            f"{t.tm_hour:02d}",
        )
        os.makedirs(dated, exist_ok=True)
        moved = 0
        for src in staged:
            # batch id rides in the delivered name so a replayed batch's
            # re-promotion cannot collide with the original object.
            batch_dir = os.path.basename(os.path.dirname(src))
            dst = os.path.join(
                dated, f"delivery{self.deliveries:06d}-{batch_dir}-{os.path.basename(src)}"
            )
            os.replace(src, dst)  # atomic per file
            moved += 1
        # sweep the now-.gz-free batch dirs (side files included) so
        # staged_bytes stays an O(flush budget) walk, never O(history)
        self._sweep()
        self.deliveries += 1
        self._last_flush = now
        self._write_marker(now, self.deliveries)
        return moved


def buffered_lake_sink(
    good: DataFrame,
    path: str,
    checkpoint: str,
    max_bytes: int = BUFFER_MAX_BYTES,
    max_secs: float = BUFFER_MAX_SECS,
    trigger: str = "5 seconds",
    available_now: bool = False,
) -> tuple[StreamingQuery, SizeOrTimeBuffer]:
    """O13 full parity: gzip JSON landing flushed on size(5 MB)-OR-
    time(300 s), whichever first — Firehose BufferingHints semantics
    with Firehose's own at-least-once delivery. The micro-batch
    trigger only paces STAGING (how often the size check runs);
    delivery cadence is governed by the hints.

    Returns (query, buffer) — the buffer exposes ``deliveries`` /
    ``staged_bytes()`` for monitoring and ``maybe_deliver(force=True)``
    for a drain-on-shutdown."""
    buf = SizeOrTimeBuffer(path, max_bytes=max_bytes, max_secs=max_secs)
    writer = (
        good.writeStream.foreachBatch(buf)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger:
        writer = writer.trigger(processingTime=trigger)
    return writer.start(), buf
