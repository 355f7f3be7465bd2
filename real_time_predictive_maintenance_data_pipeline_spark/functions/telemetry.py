"""Telemetry column expressions: payload (de)serialization and alert
formatting, with bit-exact parity to the reference's strings.

- JSON payload schema: SURVEY §1.2 / IoTSimulator.java:63-75.
- Alert lines: realtime_inference.py:126-139 — `%.2f` formatted values,
  ANSI color + emoji wrappers. We reproduce the exact strings via
  ``format_string`` so console output matches byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Telemetry stream schema (IoTSimulator.java:63-75; timestamp is Unix
#: seconds per :182). Schema-first engine decision per SURVEY §1.3.
TELEMETRY_SCHEMA = StructType(
    [
        StructField("machineId", StringType()),
        StructField("temperature", DoubleType()),
        StructField("vibration", DoubleType()),
        StructField("timestamp", LongType()),
    ]
)

# ANSI escapes matching realtime_inference.py's COLOR_* constants.
_RED_BOLD = "\x1b[91m\x1b[1m"
_GREEN = "\x1b[92m"
_RESET = "\x1b[0m"

ALERT_FMT = (
    _RED_BOLD
    + "\U0001f6a8 [ALERT] ANOMALY DETECTED! Machine failure imminent! "
    + "Temp: %.2f°C, Vib: %.2f mm/s \U0001f6a8"
    + _RESET
)
NORMAL_FMT = _GREEN + "[NORMAL]" + _RESET + " Temp: %.2f°C, Vib: %.2f mm/s"


def to_payload_json(machine_id: Column, temperature: Column, vibration: Column, timestamp: Column) -> Column:
    """Struct-pack + JSON-serialize (O5+O6 parity: Gson default config)."""
    return F.to_json(
        F.struct(
            machine_id.alias("machineId"),
            temperature.alias("temperature"),
            vibration.alias("vibration"),
            timestamp.alias("timestamp"),
        )
    )


def parse_payload(raw: Column) -> Column:
    """PERMISSIVE JSON parse into the telemetry struct (O24 parity:
    malformed rows → null struct, caller routes them to quarantine)."""
    return F.from_json(raw, TELEMETRY_SCHEMA)


def alert_line(prediction: Column, temperature: Column, vibration: Column) -> Column:
    """O27 parity: prediction==1 → red ALERT line, else green NORMAL line,
    `%.2f` floats (realtime_inference.py:128-137)."""
    return F.when(
        prediction == 1,
        F.format_string(ALERT_FMT, temperature, vibration),
    ).otherwise(F.format_string(NORMAL_FMT, temperature, vibration))
