"""Firehose BufferingHints parity — the size(5 MB)-OR-time(300 s)
flush (phase3-kinesis-s3.yaml:86-88) as `streaming/buffered_sink.py`.

The buffer logic is driven DIRECTLY with static frames and a fake
clock (deterministic — no timing races, per the r12 flaky-test
lesson); one end-to-end test runs it as a real foreachBatch sink over
an availableNow stream.
"""

from __future__ import annotations

import glob
import gzip
import os

from pyspark.sql import functions as F

from real_time_predictive_maintenance_data_pipeline_spark.streaming.buffered_sink import (
    SizeOrTimeBuffer,
    buffered_lake_sink,
)


def _frame(spark, n, tag="x", width=200):
    return spark.range(n).select(
        F.concat(F.lit(f"{tag}-"), F.col("id").cast("string")).alias("k"),
        F.lit("v" * width).alias("pad"),
    )


def _delivered(path):
    return sorted(
        glob.glob(os.path.join(path, "telemetry", "*", "*", "*", "*", "*"))
    )


class FakeClock:
    def __init__(self, t=1_000_000.0):
        self.t = t

    def __call__(self):
        return self.t


def test_size_flush_crosses_threshold(spark, tmp_path):
    """No delivery below the size hint; delivery exactly when staged
    bytes cross it; staging drains; layout is gzip under the
    delivery-time telemetry/YYYY/MM/DD/HH prefix."""
    clock = FakeClock()
    buf = SizeOrTimeBuffer(
        str(tmp_path), max_bytes=3000, max_secs=10**9, clock=clock
    )
    batch_id = 0
    while buf.staged_bytes() < 3000 and buf.deliveries == 0:
        buf(_frame(spark, 20, tag=str(batch_id)), batch_id)
        batch_id += 1
    assert buf.deliveries == 1
    assert buf.staged_bytes() == 0
    files = _delivered(str(tmp_path))
    assert files and all(f.endswith(".gz") for f in files)
    # the prefix is delivery-time: one dated dir, derived from the
    # (frozen) clock
    import time as _t

    t = _t.gmtime(clock.t)
    assert f"/{t.tm_year:04d}/{t.tm_mon:02d}/" in files[0]
    # content survives the gzip roundtrip
    with gzip.open(files[0], "rt") as fh:
        assert '"pad"' in fh.read(500)


def test_time_flush_after_interval(spark, tmp_path):
    """Below the size hint, the interval alone flushes — and only once
    the interval has actually elapsed."""
    clock = FakeClock()
    buf = SizeOrTimeBuffer(
        str(tmp_path), max_bytes=10**9, max_secs=300, clock=clock
    )
    buf(_frame(spark, 5), 0)
    assert buf.deliveries == 0
    clock.t += 299
    assert buf.maybe_deliver() == 0
    clock.t += 2
    assert buf.maybe_deliver() > 0
    assert buf.deliveries == 1 and buf.staged_bytes() == 0


def test_empty_buffer_advances_interval_clock(spark, tmp_path):
    """An empty buffer delivers nothing, but the interval clock still
    advances — a later lone record must not be flushed instantly by a
    long-expired timer."""
    clock = FakeClock()
    buf = SizeOrTimeBuffer(
        str(tmp_path), max_bytes=10**9, max_secs=300, clock=clock
    )
    clock.t += 10_000
    assert buf.maybe_deliver() == 0  # nothing staged, clock re-arms
    buf(_frame(spark, 3), 0)
    assert buf.deliveries == 0  # NOT instantly flushed
    clock.t += 301
    assert buf.maybe_deliver() > 0


def test_replayed_batch_stages_idempotently(spark, tmp_path):
    """A replayed micro-batch overwrites its OWN staging dir — staged
    bytes do not double before delivery (the common replay window)."""
    clock = FakeClock()
    buf = SizeOrTimeBuffer(
        str(tmp_path), max_bytes=10**9, max_secs=10**9, clock=clock
    )
    df = _frame(spark, 25)
    buf(df, 7)
    first = buf.staged_bytes()
    buf(df, 7)  # replay
    assert buf.staged_bytes() == first
    assert buf.maybe_deliver(force=True) > 0


def test_replay_after_promotion_is_at_least_once(spark, tmp_path):
    """A batch replayed AFTER its files were promoted re-stages and
    re-delivers under a non-colliding name — duplicate content, never
    lost or overwritten (Firehose's own at-least-once)."""
    clock = FakeClock()
    buf = SizeOrTimeBuffer(
        str(tmp_path), max_bytes=10**9, max_secs=10**9, clock=clock
    )
    df = _frame(spark, 10)
    buf(df, 3)
    buf.maybe_deliver(force=True)
    n1 = len(_delivered(str(tmp_path)))
    buf(df, 3)  # replay after promotion
    buf.maybe_deliver(force=True)
    n2 = len(_delivered(str(tmp_path)))
    assert n2 == 2 * n1  # duplicated, not collided


def test_marker_survives_restart(spark, tmp_path):
    """A restarted buffer resumes the delivery interval from the
    persisted marker instead of resetting it (Firehose's clock does
    not reset when a consumer restarts)."""
    clock = FakeClock()
    buf = SizeOrTimeBuffer(
        str(tmp_path), max_bytes=10**9, max_secs=300, clock=clock
    )
    buf(_frame(spark, 5), 0)
    clock.t += 200  # 200s into the interval, then "crash"
    buf2 = SizeOrTimeBuffer(
        str(tmp_path), max_bytes=10**9, max_secs=300, clock=clock
    )
    assert buf2.maybe_deliver() == 0  # only 200s elapsed per marker
    clock.t += 101
    assert buf2.maybe_deliver() > 0  # 301s since the ORIGINAL start


def test_staging_swept_clean_after_delivery(spark, tmp_path):
    """r14 (r13 ADVICE): promotion must leave staging EMPTY — Spark's
    local writes leave _SUCCESS/.crc side files in each batch dir, and
    without sweeping them the dirs survive rmdir forever, making every
    staged_bytes() walk O(history) instead of O(flush budget)."""
    clock = FakeClock()
    buf = SizeOrTimeBuffer(
        str(tmp_path), max_bytes=10**9, max_secs=10**9, clock=clock
    )
    for b in range(3):
        buf(_frame(spark, 10, tag=str(b)), b)
    # empty batches leave side-file-only dirs too; they must be swept
    buf(_frame(spark, 0), 3)
    assert buf.maybe_deliver(force=True) > 0
    assert os.listdir(buf.staging) == []  # no batch dirs survive


def test_delivery_counter_survives_restart(spark, tmp_path):
    """r14 (r13 ADVICE): the delivery counter in delivered object names
    is persisted beside the interval marker — a restarted buffer keeps
    numbering monotonically instead of restarting at delivery000000-
    inside the same hour prefix."""
    clock = FakeClock()
    buf = SizeOrTimeBuffer(
        str(tmp_path), max_bytes=10**9, max_secs=10**9, clock=clock
    )
    buf(_frame(spark, 5), 0)
    buf.maybe_deliver(force=True)
    assert buf.deliveries == 1
    # "crash" and restart: counter resumes from the marker
    buf2 = SizeOrTimeBuffer(
        str(tmp_path), max_bytes=10**9, max_secs=10**9, clock=clock
    )
    assert buf2.deliveries == 1
    buf2(_frame(spark, 5), 1)
    buf2.maybe_deliver(force=True)
    names = [os.path.basename(f) for f in _delivered(str(tmp_path))]
    assert any(n.startswith("delivery000000-") for n in names)
    assert any(n.startswith("delivery000001-") for n in names)
    assert not any(
        n.startswith("delivery000000-batch_1-") for n in names
    )  # the post-restart delivery did NOT reuse id 0


def test_buffered_lake_sink_end_to_end(spark, tmp_path):
    """The real sink over an availableNow stream: stage via
    foreachBatch, drain-on-shutdown, byte parity on the content."""
    src = tmp_path / "src"
    src.mkdir()
    (src / "a.json").write_text(
        "\n".join(
            f'{{"machineId":"M1","temperature":66.0,"vibration":1.3,"timestamp":{t}}}'
            for t in range(40)
        )
    )
    stream = (
        spark.readStream.schema("machineId string, temperature double, "
                                "vibration double, timestamp long")
        .json(str(src))
    )
    q, buf = buffered_lake_sink(
        stream,
        str(tmp_path / "lake"),
        str(tmp_path / "ck"),
        max_bytes=10**9,
        max_secs=10**9,
        available_now=True,
    )
    q.awaitTermination(120)
    assert buf.deliveries == 0  # neither hint reached: still buffered
    assert buf.maybe_deliver(force=True) > 0  # drain-on-shutdown
    back = spark.read.option("recursiveFileLookup", "true").json(
        os.path.join(str(tmp_path / "lake"), "telemetry")
    )
    assert back.count() == 40
    assert set(back.columns) >= {"machineId", "temperature", "vibration", "timestamp"}


def test_catalog_entry_reports_size_deliveries(spark):
    """The driver-visible catalog entry must prove the SIZE leg fired
    mid-stream (n_size_deliveries >= 1 before the forced drain) and
    that every landed row survived the staged gzip roundtrip."""
    from real_time_predictive_maintenance_data_pipeline_spark.plans import (
        all_queries,
    )

    from .conftest import SF_SMOKE

    row = (
        all_queries()["telemetry_buffered_sink"].spark(spark, SF_SMOKE).first()
    )
    assert row.n_rows == 3000
    assert row.all_gzip
    assert row.n_size_deliveries >= 1  # the 5 MB-hint analog fired pre-drain
    assert row.n_deliveries_total >= row.n_size_deliveries
    assert row.n_files >= row.n_deliveries_total  # every delivery moved files


def test_restart_from_checkpoint_is_at_least_once(spark, tmp_path):
    """r15 (r14 verdict task 6): the REAL ``buffered_lake_sink`` through
    a kill-and-restart with the checkpoint intact. The crash point is
    the canonical at-least-once window — sink side effects done, offset
    commit missing — produced deterministically by deleting the LAST
    entry of the checkpoint's ``commits/`` log after a clean
    availableNow drain (exactly the state a crash between foreachBatch
    and commit leaves behind). On restart Spark replays that batch; the
    sink must lose NOTHING, keep delivery ids monotone across the
    restart (marker-resumed counter), and deliver the replayed batch
    AGAIN — at-least-once, never at-most-once."""
    from collections import Counter

    src = tmp_path / "src"
    src.mkdir()

    def write_file(name, keys):
        (src / name).write_text(
            "\n".join(f'{{"k":"{k}","pad":"{"v" * 50}"}}' for k in keys)
        )

    def stream():
        return (
            spark.readStream.schema("k string, pad string")
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
        )

    lake, ck = str(tmp_path / "lake"), str(tmp_path / "ck")
    write_file("f0.json", [f"a{i}" for i in range(20)])
    write_file("f1.json", [f"b{i}" for i in range(20)])
    q, buf = buffered_lake_sink(
        stream(), lake, ck, max_bytes=10**9, max_secs=10**9, available_now=True
    )
    assert q.awaitTermination(120)
    q.stop()  # release the checkpoint registration before the restart
    assert buf.maybe_deliver(force=True) > 0
    d1 = buf.deliveries
    assert d1 == 1

    # the crash window: batch f1's staging landed, its commit vanishes
    # (a real crash writes neither the entry nor its Hadoop .crc
    # sibling — leaving the .crc behind would fail the re-commit rename)
    commits_dir = os.path.join(ck, "commits")
    commits = sorted(c for c in os.listdir(commits_dir) if not c.startswith("."))
    os.remove(os.path.join(commits_dir, commits[-1]))
    crc = os.path.join(commits_dir, f".{commits[-1]}.crc")
    if os.path.exists(crc):
        os.remove(crc)

    write_file("f2.json", [f"c{i}" for i in range(20)])
    q2, buf2 = buffered_lake_sink(
        stream(), lake, ck, max_bytes=10**9, max_secs=10**9, available_now=True
    )
    assert q2.awaitTermination(120)
    assert buf2.maybe_deliver(force=True) > 0
    # monotone delivery ids: the marker resumed the counter, not reset it
    assert buf2.deliveries == d1 + 1
    ids = sorted(
        int(os.path.basename(f).split("-")[0].removeprefix("delivery"))
        for f in _delivered(lake)
    )
    assert ids[0] == 0 and ids[-1] == 1 and ids == sorted(ids)

    back = spark.read.option("recursiveFileLookup", "true").json(
        os.path.join(lake, "telemetry")
    )
    counts = Counter(r.k for r in back.select("k").collect())
    # no data loss: every key from all three files landed
    assert set(counts) == {f"{p}{i}" for p in "abc" for i in range(20)}
    # at-least-once, not at-most-once: exactly the replayed batch (f1,
    # the batch whose commit was lost) landed twice; nothing else did
    assert {k for k, c in counts.items() if c >= 2} == {
        f"b{i}" for i in range(20)
    }
