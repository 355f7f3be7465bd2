"""Kafka transport plumbing (O7/O23) — exercised WITHOUT a broker.

The container ships no Kafka broker or spark-sql-kafka package
(SURVEY §7.3: Kafka is the production stand-in for MQTT transport), so
these tests pin everything short of the socket: the complete
reader/writer option sets, the producer wire projection
(key/value serialization), and the clear failure mode when the
connector package is absent.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_time_predictive_maintenance_data_pipeline_spark.functions.telemetry import (
    to_payload_json,
)
from real_time_predictive_maintenance_data_pipeline_spark.sources.generator import (
    stream_telemetry_batch,
)
from real_time_predictive_maintenance_data_pipeline_spark.sources.streams import (
    TELEMETRY_TOPIC,
    kafka_payload_source,
    kafka_sink_options,
    kafka_source_options,
    kafka_wire_frame,
)


def test_source_options_complete():
    opts = kafka_source_options(
        "broker:9092",
        ssl_options={"kafka.ssl.truststore.location": "/certs/ca.jks"},
    )
    assert opts["kafka.bootstrap.servers"] == "broker:9092"
    assert opts["subscribe"] == TELEMETRY_TOPIC == "factory/telemetry"
    assert opts["startingOffsets"] == "latest"
    assert opts["maxOffsetsPerTrigger"] == "100000"  # backpressure bound
    assert opts["failOnDataLoss"] == "false"
    # O8-as-config: mTLS material rides kafka.ssl.* passthrough
    assert opts["kafka.ssl.truststore.location"] == "/certs/ca.jks"


def test_source_options_unbounded_backpressure():
    opts = kafka_source_options("b:9092", max_offsets_per_trigger=None)
    assert "maxOffsetsPerTrigger" not in opts


def test_sink_options_complete(tmp_path):
    opts = kafka_sink_options("broker:9092", "factory/telemetry", str(tmp_path / "ck"))
    assert opts["topic"] == "factory/telemetry"
    assert opts["checkpointLocation"].endswith("ck")


def test_wire_frame_key_value_serialization(spark):
    """Producer projection: (key, value) both strings; key carries the
    machineId shard routing (phase2-iot-kinesis.yaml:66); value is the
    exact wire JSON."""
    batch = stream_telemetry_batch(spark, n=50)
    payloads = batch.select(
        "machineId",
        to_payload_json(
            F.col("machineId"),
            F.col("temperature"),
            F.col("vibration"),
            F.col("timestamp"),
        ).alias("value"),
    )
    wire = kafka_wire_frame(payloads)
    assert [(f.name, f.dataType.simpleString()) for f in wire.schema.fields] == [
        ("key", "string"),
        ("value", "string"),
    ]
    rows = wire.collect()
    assert len(rows) == 50
    assert all(r.key == "NC_Machine_AC" for r in rows)  # IoTSimulator.java:34
    assert all(r.value.startswith('{"machineId":"NC_Machine_AC"') for r in rows)


def test_wire_frame_keyless(spark):
    batch = stream_telemetry_batch(spark, n=5).select(F.lit("x").alias("value"))
    wire = kafka_wire_frame(batch, key_col=None)
    assert wire.columns == ["value"]


def test_kafka_source_fails_clearly_without_connector(spark):
    """Without the spark-sql-kafka package the source must fail at
    load() with the standard missing-data-source error — not silently
    misconfigure."""
    with pytest.raises(Exception, match="[Kk]afka"):
        kafka_payload_source(spark, "localhost:9092")
