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


def kafka_payload_source(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str = TELEMETRY_TOPIC,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = 100_000,
    ssl_options: dict | None = None,
) -> DataFrame:
    """Kafka subscribe source normalized to a string ``value`` column.

    ``max_offsets_per_trigger`` is the backpressure bound the reference
    lacks entirely (its loop blocks at 1 msg/s); ``ssl_options`` passes
    ``kafka.ssl.*`` entries through, which is where the reference's
    mTLS material (O8) lives in a Spark deployment.
    """
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", max_offsets_per_trigger)
    for k, v in (ssl_options or {}).items():
        reader = reader.option(k, v)
    return reader.load().select(F.col("value").cast("string").alias("value"))


def kafka_payload_sink(
    payloads: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint: str,
    key_col: str | None = "machineId",
):
    """Kafka publish sink. Keying by machineId reproduces the
    reference's shard routing (phase2-iot-kinesis.yaml:66) — per-key
    ordering within a partition, horizontal scale across keys.

    Returns the started StreamingQuery.
    """
    cols = [F.col("value").cast("string").alias("value")]
    if key_col is not None and key_col in payloads.columns:
        cols.insert(0, F.col(key_col).cast("string").alias("key"))
    out = payloads.select(*cols)
    return (
        out.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
        .start()
    )
