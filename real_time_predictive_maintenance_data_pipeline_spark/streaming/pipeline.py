"""Streaming parity pipelines — the reference's Phases 2/3/5 as
Structured Streaming plans (SURVEY §2.3, §3.2, §3.3).

Reference dataflows reproduced here:

- **Relay + lake landing** (phase2-iot-kinesis.yaml:61-66,
  phase3-kinesis-s3.yaml:81-89): key-partitioning by machineId (O11),
  micro-batch buffering 300 s (O13), GZIP (O14), date/hour path layout
  with an error quarantine prefix (O15) → ``lake_sink`` +
  ``quarantine_split``.
- **Real-time inference** (realtime_inference.py:92-139): subscribe →
  JSON parse with drop-malformed (O24) → feature projection (O25) →
  model scoring (O26) → formatted console alert (O27) →
  ``scored_alert_stream``. Per-message callbacks become vectorized
  micro-batch ``model.transform`` — the engine's core win.
- **Improvement mode** (SURVEY §2.3): at-least-once QoS-1 duplicates
  removed via ``dropDuplicatesWithinWatermark``; event-time windowed
  stats via watermark + tumbling window (the reference carries event
  time but never windows on it).

Scale notes (100 TB / 1000-executor design):
- Sources are declarative — swap the rate/file source for Kafka with
  ``maxOffsetsPerTrigger`` for backpressure; plans are unchanged.
- The scoring path is stateless: it scales linearly with input
  partitions, no shuffle at all (verified: plan is Scan → Project →
  Filter → Project; the RF model broadcast rides task closures).
- Stateful ops (dedup, windows) shuffle once on the state key; with
  machineId as key, one machine = one state partition — mirror of the
  reference's Kinesis shard keying.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..functions.telemetry import alert_line, parse_payload

#: Firehose buffering hint parity: 300 s flush (phase3-kinesis-s3.yaml:87-88).
#: The 5 MB size trigger has no Spark analog — documented deviation
#: (SURVEY §7.3): time-based trigger only.
LAKE_TRIGGER = "300 seconds"

GOOD_PREFIX = "telemetry"  # phase3-kinesis-s3.yaml:84
ERROR_PREFIX = "telemetry_errors"  # phase3-kinesis-s3.yaml:85


def parse_telemetry(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """O24: PERMISSIVE JSON parse of the wire payload into typed columns.

    Output columns: machineId, temperature, vibration, timestamp, plus
    ``_corrupt`` (the raw payload, only for rows that failed to parse or
    failed field validation — realtime_inference.py:101-114 drops these
    with a warning; we keep them addressable for the quarantine sink).
    """
    parsed = raw.withColumn("_p", parse_payload(F.col(value_col)))
    valid = (
        F.col("_p").isNotNull()
        & F.col("_p.temperature").isNotNull()
        & F.col("_p.vibration").isNotNull()
    )
    return parsed.select(
        F.col("_p.machineId").alias("machineId"),
        F.col("_p.temperature").alias("temperature"),
        F.col("_p.vibration").alias("vibration"),
        F.col("_p.timestamp").alias("timestamp"),
        F.when(~valid, F.col(value_col)).alias("_corrupt"),
    )


def quarantine_split(parsed: DataFrame) -> tuple[DataFrame, DataFrame]:
    """O15/O24: (good, quarantine) pair. Good rows drop the ``_corrupt``
    marker; quarantined rows carry the original payload only — the
    engine's version of Firehose's ``telemetry_errors/`` prefix."""
    good = parsed.filter(F.col("_corrupt").isNull()).drop("_corrupt")
    bad = parsed.filter(F.col("_corrupt").isNotNull()).select(
        F.col("_corrupt").alias("value")
    )
    return good, bad


def _date_parts(event_ts: Column) -> list[Column]:
    """Firehose default path layout YYYY/MM/DD/HH (O15,
    docs/phase3-kinesis-s3.md:45) as partition columns derived from
    event time — partition pruning then works for time-range queries,
    which the reference's opaque S3 prefixes never could."""
    return [
        F.year(event_ts).alias("year"),
        F.month(event_ts).alias("month"),
        F.dayofmonth(event_ts).alias("day"),
        F.hour(event_ts).alias("hour"),
    ]


def lake_sink(
    good: DataFrame,
    path: str,
    checkpoint: str,
    trigger: str | None = LAKE_TRIGGER,
    available_now: bool = False,
) -> StreamingQuery:
    """O11–O15: gzip JSON lake landing, partitioned year/month/day/hour.

    Exactly-once to the file sink (Spark's sink log) — strictly stronger
    than Firehose's at-least-once. ``available_now`` drains the source
    then stops (test/replay mode)."""
    event_ts = F.timestamp_seconds(F.col("timestamp"))
    out = good.select("*", *_date_parts(event_ts))
    writer = (
        out.writeStream.format("json")
        .option("compression", "gzip")
        .option("path", f"{path}/{GOOD_PREFIX}")
        .option("checkpointLocation", checkpoint)
        .partitionBy("year", "month", "day", "hour")
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger:
        writer = writer.trigger(processingTime=trigger)
    return writer.start()


def quarantine_sink(
    bad: DataFrame, path: str, checkpoint: str, available_now: bool = False
) -> StreamingQuery:
    """O15: failed payloads land verbatim under ``telemetry_errors/``."""
    writer = (
        bad.writeStream.format("text")
        .option("path", f"{path}/{ERROR_PREFIX}")
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def scored_alert_stream(model, parsed_good: DataFrame) -> DataFrame:
    """O25–O27: vectorized scoring + alert formatting on a stream.

    ``model.transform`` works unchanged on streaming DataFrames
    (VectorAssembler + RF are row-local); the output adds an integer
    ``prediction`` and the byte-exact ``alert`` line of
    realtime_inference.py:126-139."""
    from ..ml.anomaly import score

    scored = score(model, parsed_good)
    return scored.withColumn(
        "alert",
        alert_line(F.col("prediction"), F.col("temperature"), F.col("vibration")),
    )


def dedup_stream(
    parsed_good: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """Improvement mode (SURVEY §2.3 delivery row): QoS-1 at-least-once
    duplicates collapsed on (machineId, timestamp) with bounded state —
    ``dropDuplicatesWithinWatermark`` keys state by the pair and expires
    it past the watermark, so state size is O(rate × watermark), not
    O(history)."""
    return (
        parsed_good.withColumn("event_time", F.timestamp_seconds(F.col("timestamp")))
        .withWatermark("event_time", watermark)
        .dropDuplicatesWithinWatermark(["machineId", "timestamp"])
    )


def alert_foreach_batch_sink(
    alerts: DataFrame,
    out_dir: str,
    checkpoint: str,
    available_now: bool = False,
) -> StreamingQuery:
    """O7/O27 sink surface via ``foreachBatch``: per-micro-batch alert
    summary written idempotently.

    ``foreachBatch`` hands us (batch_df, batch_id); writing each batch
    under ``batch_id=<n>`` with overwrite makes replays idempotent —
    if a batch is re-run after a crash, it overwrites its own output
    instead of duplicating (Spark's replay guarantee: same batch_id →
    same data). This is the engine's stand-in for any transactional /
    upsert sink (Kafka producer, JDBC merge), with try/except
    log-and-continue fault handling matching the reference's per-message
    try/except (realtime_inference.py:117-123)."""
    from pyspark.sql import functions as _F

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        try:
            summary = batch_df.groupBy("prediction").agg(
                _F.count(_F.lit(1)).alias("n"),
                _F.round(_F.avg("temperature"), 2).alias("avg_temp"),
            )
            (
                summary.write.mode("overwrite").json(
                    f"{out_dir}/batch_id={batch_id}"
                )
            )
        except Exception as exc:  # log-and-continue (reference parity)
            print(f"[alert-sink] batch {batch_id} failed: {exc}")

    writer = (
        alerts.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def session_stream(
    parsed_good: DataFrame,
    gap: str = "30 seconds",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Event-time session windows per machine (dynamic-gap sessionization
    — the streaming twin of the batch ``rel_sessionize`` query).

    ``F.session_window`` closes a session after ``gap`` of event-time
    silence; state per key is one open session (start, end, aggregates),
    expired by the watermark — bounded regardless of stream length."""
    with_ts = parsed_good.withColumn(
        "event_time", F.timestamp_seconds(F.col("timestamp"))
    ).withWatermark("event_time", watermark)
    return with_ts.groupBy(
        F.session_window("event_time", gap).alias("session"), F.col("machineId")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("temperature"), 2).alias("avg_temp"),
    )


def windowed_stats_stream(
    parsed_good: DataFrame,
    window: str = "1 minute",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Engine improvement (SURVEY §2.3 event-time row): tumbling
    event-time sensor stats per machine. The reference carries event
    time (IoTSimulator.java:182) but never windows on it."""
    with_ts = parsed_good.withColumn(
        "event_time", F.timestamp_seconds(F.col("timestamp"))
    ).withWatermark("event_time", watermark)
    return with_ts.groupBy(
        F.window("event_time", window).alias("win"), F.col("machineId")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("temperature"), 2).alias("avg_temp"),
        F.round(F.max("temperature"), 2).alias("max_temp"),
        F.round(F.avg("vibration"), 2).alias("avg_vib"),
        F.round(F.max("vibration"), 2).alias("max_vib"),
    )
