"""Custom Python DataSource writer (``alert_sink``): batch + streaming
two-phase commit, reference-parity alert lines on disk."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from real_time_predictive_maintenance_data_pipeline_spark.functions.telemetry import (
    alert_line,
)
from real_time_predictive_maintenance_data_pipeline_spark.sources.alert_sink import (
    AlertSinkDataSource,
)


def _lines_under(root):
    out = []
    for dirpath, _, files in os.walk(root):
        for fn in sorted(files):
            if fn.endswith(".txt"):
                with open(os.path.join(dirpath, fn), encoding="utf-8") as f:
                    out.extend(f.read().splitlines())
    return out


def test_batch_write_publishes_all_rows(spark, tmp_path):
    spark.dataSource.register(AlertSinkDataSource)
    df = spark.createDataFrame(
        [(0, 66.0, 1.3), (1, 86.5, 3.4)], "prediction int, t double, v double"
    ).select(alert_line(F.col("prediction"), F.col("t"), F.col("v")).alias("line"))
    out = str(tmp_path / "alerts")
    df.repartition(2).write.format("alert_sink").option("path", out).mode(
        "append"
    ).save()
    lines = _lines_under(out)
    assert len(lines) == 2
    # O27 parity: '%.2f' formatting survives the sink byte-for-byte.
    assert any("86.50" in ln and "3.40" in ln for ln in lines)
    assert any("66.00" in ln and "1.30" in ln for ln in lines)
    # commit protocol: no stray temp files remain
    assert _lines_under(os.path.join(out, "_tmp")) == []


def test_stream_write_commits_per_batch(spark, tmp_path):
    spark.dataSource.register(AlertSinkDataSource)
    src = tmp_path / "in"
    src.mkdir()
    (src / "a.json").write_text(
        '{"prediction":1,"t":90.0,"v":4.0}\n{"prediction":0,"t":67.0,"v":1.4}'
    )
    stream = (
        spark.readStream.schema("prediction int, t double, v double")
        .json(str(src))
        .select(alert_line(F.col("prediction"), F.col("t"), F.col("v")).alias("line"))
    )
    out = str(tmp_path / "alerts")
    q = (
        stream.writeStream.format("alert_sink")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="1 second")
        .start()
    )
    def _published():
        if not os.path.isdir(out):
            return []
        return [d for d in os.listdir(out) if d.startswith("batch-")]

    try:
        deadline = time.time() + 60
        # wait for the driver-side commit (publish), not the task temp
        # files — _tmp contents don't count until commit renames them
        while time.time() < deadline and not _published():
            time.sleep(1)
        assert _published(), "no batch-<id> directory was committed"
        lines = _lines_under(os.path.join(out, _published()[0]))
        assert len(lines) == 2
        assert any("90.00" in ln for ln in lines)
    finally:
        q.stop()
