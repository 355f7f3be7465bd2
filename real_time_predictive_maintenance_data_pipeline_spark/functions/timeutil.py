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


def epoch_bucket(col: Column | str, step_seconds: int) -> Column:
    """Epoch-second bucket floor of a timestamp — ``FLOOR(epoch(ts) /
    step) * step`` as a BIGINT, the DuckDB-parity bucketing expression
    shared by the resampling/changepoint/decomposition paths.

    True FLOOR, not cast-truncation: a pre-1970 timestamp (negative
    epoch) must bucket DOWN like the oracle's FLOOR, while
    ``cast('long')`` truncates toward zero and would land one step
    high."""
    return (
        F.floor(epoch_us(col) / 1_000_000 / F.lit(step_seconds)).cast("long")
        * step_seconds
    )


def ordered_fold_sum(arr: Column) -> Column:
    """Deterministic sum of a double array: sort, then fold
    sequentially. Engines associate plain SUM() partials differently
    (segment trees vs running adds), which diverges under rounding;
    folding a VALUE-SORTED list adds identical addends in identical
    order on every engine (DuckDB mirror:
    ``list_reduce(list_prepend(0.0, list(x ORDER BY x)), (a,b) -> a+b)``).
    """
    return F.aggregate(F.array_sort(arr), F.lit(0.0), lambda a, v: a + v)
