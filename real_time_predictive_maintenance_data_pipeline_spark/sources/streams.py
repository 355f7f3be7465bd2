"""Streaming source/sink builders — the transport layer behind the
telemetry plans (SURVEY §2.3: O7/O12/O23).

The engine's plans are transport-agnostic: every streaming operator in
``streaming/`` consumes a DataFrame with a string ``value`` column (the
wire payload) and doesn't care whether it came from Kafka, files, or
the rate simulator. These builders centralize the three transports:

- ``file_payload_source`` / file sinks: used by tests and the lake —
  fully exercised in this container.
- ``kafka_payload_source`` / ``kafka_payload_sink``: the production
  transport (the engine's stand-in for MQTT/Kinesis — MQTT is
  transport, not semantics, SURVEY §7.3). The container ships no Kafka
  connector or broker, so these raise a clear error at ``.load()`` /
  ``.start()`` time if the spark-sql-kafka package is absent; the
  OPTIONS they set (subscribe, startingOffsets, maxOffsetsPerTrigger
  for backpressure, kafka.ssl.* passthrough for O8-style mTLS) are the
  complete production configuration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TELEMETRY_TOPIC = "factory/telemetry"  # IoTSimulator.java:31


def file_payload_source(spark: SparkSession, path: str) -> DataFrame:
    """Line-per-payload file stream (each line one JSON wire record)."""
    return spark.readStream.text(path)  # column: value (string)


def socket_payload_source(
    spark: SparkSession, host: str = "127.0.0.1", port: int = 9999
) -> DataFrame:
    """O23 over a REAL network transport available in this container:
    Spark's built-in ``socket`` source reads newline-delimited wire
    payloads from a live TCP connection, normalized to the same string
    ``value`` column every downstream plan consumes — so the
    subscribe→parse→quarantine path is exercised over actual network
    bytes (``test_socket_transport_live``), not just file stand-ins.

    NOT a production transport: the socket source keeps no offsets, so
    it cannot replay after failure (O12) — Kafka remains the production
    subscribe path; this is the live-wire smoke the reference gets from
    its MQTT broker connection (realtime_inference.py:81-89)."""
    return (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", str(port))
        .load()
    )  # column: value (string)


def kafka_source_options(
    bootstrap_servers: str,
    topic: str = TELEMETRY_TOPIC,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = 100_000,
    ssl_options: dict | None = None,
) -> dict[str, str]:
    """The complete ``format("kafka")`` reader configuration, as a pure
    dict (testable without a broker or the spark-sql-kafka package).

    ``maxOffsetsPerTrigger`` is the backpressure bound the reference
    lacks entirely (its loop blocks at 1 msg/s); ``ssl_options`` passes
    ``kafka.ssl.*`` entries through, which is where the reference's
    mTLS material (O8, AwsIotSslUtil.java:52-64) lives in a Spark
    deployment — connector config, not engine code.
    """
    opts: dict[str, str] = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
        # at-least-once parity with MQTT QoS 1 (IoTSimulator.java:55):
        # Kafka + checkpointed offsets give effectively-once to
        # idempotent sinks, strictly stronger than the reference.
        "failOnDataLoss": "false",
    }
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    for k, v in (ssl_options or {}).items():
        opts[str(k)] = str(v)
    return opts


def kafka_payload_source(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str = TELEMETRY_TOPIC,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = 100_000,
    ssl_options: dict | None = None,
) -> DataFrame:
    """Kafka subscribe source normalized to a string ``value`` column
    (Kafka delivers ``value: binary``; every downstream plan consumes
    the decoded JSON payload string, realtime_inference.py:102)."""
    reader = spark.readStream.format("kafka")
    for k, v in kafka_source_options(
        bootstrap_servers, topic, starting_offsets, max_offsets_per_trigger, ssl_options
    ).items():
        reader = reader.option(k, v)
    return reader.load().select(F.col("value").cast("string").alias("value"))


def kafka_wire_frame(payloads: DataFrame, key_col: str | None = "machineId") -> DataFrame:
    """Project a payload frame onto the Kafka producer wire schema
    (``key: string, value: string`` — the connector serializes both to
    bytes). Keying by machineId reproduces the reference's shard
    routing (phase2-iot-kinesis.yaml:66): per-key ordering within a
    partition, horizontal scale across keys. Pure projection — shared
    by the real sink and the broker-less tests."""
    cols = [F.col("value").cast("string").alias("value")]
    if key_col is not None and key_col in payloads.columns:
        cols.insert(0, F.col(key_col).cast("string").alias("key"))
    return payloads.select(*cols)


def kafka_sink_options(
    bootstrap_servers: str, topic: str, checkpoint: str
) -> dict[str, str]:
    """The complete ``format("kafka")`` writer configuration as a pure
    dict; ``checkpointLocation`` carries the replayable-offset contract
    (O12 — Kinesis 24 h retention analog, phase2-iot-kinesis.yaml:23)."""
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "topic": topic,
        "checkpointLocation": checkpoint,
    }


def kafka_payload_sink(
    payloads: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint: str,
    key_col: str | None = "machineId",
):
    """Kafka publish sink (O7 parity). Returns the started
    StreamingQuery."""
    out = kafka_wire_frame(payloads, key_col)
    writer = out.writeStream.format("kafka")
    for k, v in kafka_sink_options(bootstrap_servers, topic, checkpoint).items():
        writer = writer.option(k, v)
    return writer.start()
