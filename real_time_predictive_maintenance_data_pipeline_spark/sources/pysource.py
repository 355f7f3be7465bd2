"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API):
the reference's telemetry producer as a first-class Spark source.

The reference's Phase-1 producer is an imperative publish loop
(IoTSimulator.java:153-188) and its Phase-5 consumer a blocking MQTT
subscribe callback (realtime_inference.py:81-89). This module exposes
that data as a *source format* instead: ``spark.read.format
("telemetry_sim")`` / ``spark.readStream.format("telemetry_sim")``,
so telemetry plugs into every engine operator exactly like parquet or
Kafka does — scan options, partition parallelism, filter pushdown,
streaming offsets, replay.

Design properties (all absent from the reference transport):

- **Partition-parallel**: the batch reader splits ``rows`` across
  ``partitions`` input splits; a 1000-executor cluster generates
  telemetry at full width, vs the reference's 1 Hz single loop.
- **Deterministic & replayable**: every row's draws are keyed on its
  global row id (seeded BLAKE2 of (seed, rid)) — no RNG state is
  carried between rows, partitions, or retries, so any task retry or
  streaming replay regenerates identical rows. Same rationale as the
  hash-draw columns in streaming/simulator.py.
- **Filter pushdown** (``pushFilters``): ``machineId = 'X'`` equality
  is applied inside the generator, so non-matching rows are never
  materialized or Arrow-shipped — the Python-source analog of a
  parquet PushedFilters row-group skip.
- **Streaming offsets**: the stream reader tracks a monotonic row
  counter as its offset; ``readBetweenOffsets`` regenerates any
  committed range bit-identically (exactly-once replay, vs the
  reference's at-least-once QoS 1).

Distributions match the reference (ranges IoTSimulator.java:37-46,
anomaly p=0.10 :49, +15°C/+2 mm/s spikes :45-46, Unix-seconds
timestamps :182); tests assert distributional parity, never exact
values, per SURVEY §7.4.
"""

from __future__ import annotations

import hashlib
import struct
from dataclasses import dataclass
from typing import Iterator, Tuple

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from .generator import (
    ANOMALY_PROBABILITY,
    ANOMALY_TEMP_DELTA,
    ANOMALY_VIB_DELTA,
    MACHINE_ID,
    TEMP_MAX,
    TEMP_MIN,
    VIB_MAX,
    VIB_MIN,
)

TELEMETRY_DDL = "machineId string, temperature double, vibration double, timestamp long"

#: Fixed epoch anchor so batch output is a pure function of (seed, rows).
DEFAULT_BASE_TS = 1_700_000_000


def _u01(seed: int, rid: int, stream: int) -> float:
    """Uniform [0,1) draw keyed on (seed, rid, stream) — stateless, so
    any subset of rows can be regenerated in any order on any worker."""
    h = hashlib.blake2b(
        struct.pack("<qqq", seed, rid, stream), digest_size=8
    ).digest()
    return struct.unpack("<Q", h)[0] / 2**64


def _row(rid: int, seed: int, base_ts: int, num_machines: int) -> Tuple:
    if num_machines == 1:
        machine = MACHINE_ID  # IoTSimulator.java:34
    else:
        machine = f"NC_Machine_{rid % num_machines:03d}"
    temp = _u01(seed, rid, 1) * (TEMP_MAX - TEMP_MIN) + TEMP_MIN
    vib = _u01(seed, rid, 2) * (VIB_MAX - VIB_MIN) + VIB_MIN
    if _u01(seed, rid, 0) < ANOMALY_PROBABILITY:  # IoTSimulator.java:154
        temp += ANOMALY_TEMP_DELTA
        vib += ANOMALY_VIB_DELTA
    return (machine, temp, vib, base_ts + rid)  # 1 Hz grid, Unix seconds


def _opts(options) -> tuple[int, int, int]:
    seed = int(options.get("seed", 42))
    base_ts = int(options.get("baseTs", DEFAULT_BASE_TS))
    num_machines = int(options.get("numMachines", 1))
    return seed, base_ts, num_machines


@dataclass
class _RangePartition(InputPartition):
    start: int
    end: int


class TelemetryBatchReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.options = options
        self.machine_eq: str | None = None

    def pushFilters(self, filters):  # noqa: N802 (API name)
        """Accept machineId equality; everything else stays in Spark.

        Returns a concrete list (not a generator) so the acceptance
        side effect happens before Spark inspects the remainder."""
        unsupported = []
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("machineId",):
                self.machine_eq = f.value
            else:
                unsupported.append(f)
        return unsupported

    def partitions(self):
        rows = int(self.options.get("rows", 10_000))
        n_parts = int(self.options.get("partitions", 8))
        n_parts = max(1, min(n_parts, rows or 1))
        step = (rows + n_parts - 1) // n_parts
        return [
            _RangePartition(lo, min(lo + step, rows)) for lo in range(0, rows, step)
        ]

    def read(self, partition: _RangePartition) -> Iterator[Tuple]:
        seed, base_ts, num_machines = _opts(self.options)
        for rid in range(partition.start, partition.end):
            row = _row(rid, seed, base_ts, num_machines)
            if self.machine_eq is not None and row[0] != self.machine_eq:
                continue
            yield row


class TelemetryStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options) -> None:
        self.options = options

    def initialOffset(self) -> dict:
        return {"rid": 0}

    def read(self, start: dict) -> Tuple[Iterator[Tuple], dict]:
        batch = int(self.options.get("rowsPerBatch", 100))
        end = {"rid": start["rid"] + batch}
        return self.readBetweenOffsets(start, end), end

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[Tuple]:
        seed, base_ts, num_machines = _opts(self.options)
        # A concrete list, not a generator: the simple-stream protocol
        # pickles the prefetched rows to ship them to executor tasks.
        return [
            _row(rid, seed, base_ts, num_machines)
            for rid in range(start["rid"], end["rid"])
        ]


class TelemetryDataSource(DataSource):
    """``format("telemetry_sim")`` — register once per session via
    ``spark.dataSource.register(TelemetryDataSource)``.

    Batch options: rows, partitions, seed, baseTs, numMachines.
    Stream options: rowsPerBatch, seed, baseTs, numMachines.
    """

    @classmethod
    def name(cls) -> str:
        return "telemetry_sim"

    def schema(self) -> str:
        return TELEMETRY_DDL

    def reader(self, schema) -> TelemetryBatchReader:
        return TelemetryBatchReader(self.options)

    def simpleStreamReader(self, schema) -> TelemetryStreamReader:
        return TelemetryStreamReader(self.options)


def register(spark) -> None:
    """Idempotent session registration of the telemetry source."""
    spark.dataSource.register(TelemetryDataSource)
