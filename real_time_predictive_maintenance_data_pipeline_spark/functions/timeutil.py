"""Timezone-robust epoch conversions.

The testdata parquet stores naive ``timestamp[us]`` columns, which
Spark 4 reads as TIMESTAMP_NTZ (``spark.sql.parquet.inferTimestampNTZ``
default). ``unix_micros``/``cast('double')`` reject NTZ, and any
NTZ→LTZ cast would re-introduce a session-timezone dependency the
DuckDB oracle (which treats naive timestamps as wall-clock) doesn't
have. ``timestamp_diff`` between two NTZ values is pure wall-clock
arithmetic — identical to DuckDB's ``epoch_us``/``epoch`` on naive
timestamps in ANY session timezone.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_us(col: Column | str) -> Column:
    """Microseconds since epoch of a (naive) timestamp's wall-clock
    value — DuckDB ``epoch_us(ts)`` parity, session-tz independent.

    Accepts TIMESTAMP_NTZ directly; LTZ inputs are first cast to NTZ
    (wall clock in session tz) so both arrive at the same arithmetic.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_diff(
        "MICROSECOND",
        F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
        c.cast("timestamp_ntz"),
    )


def epoch_seconds(col: Column | str) -> Column:
    """Fractional seconds since epoch (double) — DuckDB ``epoch(ts)``
    parity, keeps microsecond precision."""
    return epoch_us(col).cast("double") / 1_000_000.0
