"""Custom Python DataSource (``telemetry_sim``): batch parallelism,
determinism, filter pushdown, streaming offsets + replay."""

from __future__ import annotations

import time

from real_time_predictive_maintenance_data_pipeline_spark.sources.generator import (
    ANOMALY_PROBABILITY,
    MACHINE_ID,
    TEMP_MAX,
    TEMP_MIN,
)
from real_time_predictive_maintenance_data_pipeline_spark.sources.pysource import (
    DEFAULT_BASE_TS,
    TelemetryDataSource,
)


def _register(spark):
    spark.dataSource.register(TelemetryDataSource)


def _batch(spark, **opts):
    r = spark.read.format("telemetry_sim")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_batch_shape_and_distributions(spark):
    _register(spark)
    df = _batch(spark, rows=5000, partitions=8)
    assert df.rdd.getNumPartitions() == 8
    rows = df.collect()
    assert len(rows) == 5000
    assert [f.name for f in df.schema] == [
        "machineId",
        "temperature",
        "vibration",
        "timestamp",
    ]
    # Distributional parity with IoTSimulator.java:37-49 (never exact
    # values, SURVEY §7.4): normals in [65,70), anomalies in [80,85).
    assert all(r.machineId == MACHINE_ID for r in rows)
    n_anom = sum(1 for r in rows if r.temperature >= TEMP_MAX)
    assert all(
        TEMP_MIN <= r.temperature < TEMP_MAX or 80.0 <= r.temperature < 85.0
        for r in rows
    )
    # p=0.10, n=5000 → ~5 sigma CI
    assert abs(n_anom / 5000 - ANOMALY_PROBABILITY) < 0.03
    # 1 Hz grid from the fixed anchor
    ts = sorted(r.timestamp for r in rows)
    assert ts[0] == DEFAULT_BASE_TS and ts[-1] == DEFAULT_BASE_TS + 4999


def test_batch_deterministic_replay(spark):
    _register(spark)
    a = sorted(map(tuple, _batch(spark, rows=300, partitions=3).collect()))
    b = sorted(map(tuple, _batch(spark, rows=300, partitions=7).collect()))
    assert a == b  # same rows regardless of split; pure fn of (seed, rid)
    c = sorted(map(tuple, _batch(spark, rows=300, partitions=3, seed=7).collect()))
    assert a != c


def test_batch_filter_pushdown_machine_eq(spark):
    _register(spark)
    df = _batch(spark, rows=1000, numMachines=4).filter(
        "machineId = 'NC_Machine_001'"
    )
    rows = df.collect()
    # round-robin rid % 4 == 1
    assert len(rows) == 250
    assert all(r.machineId == "NC_Machine_001" for r in rows)


def test_stream_offsets_and_exactly_once(spark, tmp_path):
    _register(spark)
    stream = (
        spark.readStream.format("telemetry_sim")
        .option("rowsPerBatch", 50)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("t_pysource")
        .outputMode("append")
        .trigger(processingTime="1 second")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline and spark.table("t_pysource").count() < 150:
            time.sleep(1)
        rows = spark.table("t_pysource").collect()
        assert len(rows) >= 150
        # Offsets advance a contiguous rid range: timestamps are the
        # dense 1 Hz grid with no duplicates (exactly-once, not the
        # reference's at-least-once QoS 1).
        ts = sorted(r.timestamp for r in rows)
        assert ts == list(range(DEFAULT_BASE_TS, DEFAULT_BASE_TS + len(ts)))
    finally:
        q.stop()
