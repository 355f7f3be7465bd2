"""Boundary validation for non-finite measures — the batch twin of the
streaming PERMISSIVE-parse quarantine.

Why this exists: the engine runs Spark 4's default ANSI mode, where a
single NaN or ±Inf reaching a ``cast(bigint)`` is a job-killing
CAST_OVERFLOW — and the exact-integer-cents convention
(``ROUND(x * 100)`` then cast) that makes the catalog's float parity
bit-stable puts such a cast downstream of nearly every measure column.
The r11 NaN/Inf audit measured the blast radius: ~50 of 314 catalog
queries die if one non-finite double reaches them, and MLlib rejects
non-finite vectors outright ("Vector values MUST NOT be NaN or
Infinity").

The 100 TB answer is NOT a defensive guard inside every query — that
is 300 queries' worth of redundant predicates for a property of the
DATA, not of any one computation. It is the same answer the streaming
path already implements for malformed JSON (PERMISSIVE parse +
quarantine prefix, reference parity O24): validate ONCE at the lake
boundary, route violating rows to a quarantine output, and let every
downstream query assume finite measures. ``finite_split`` is that
boundary operator; ``events_finite_quarantine`` in
``plans/governance.py`` is its catalog entry, and
``tests/test_naninf_inputs.py`` pins the contract end-to-end: after
the split, EVERY catalog query completes on a fixture poisoned with
NaN/±Inf in every double column.

Scale: both outputs are plain filters over the input — pushable
predicates, no shuffle, no UDF; the split costs one scan each side
(or nothing extra when only the clean side is consumed).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_INF = float("inf")


def _col_nonfinite(c: str) -> Column:
    """True when the scalar double column holds NaN or ±Inf; NULL rows
    are NOT flagged (a missing measure is the null-handling contract's
    business — see tests/test_null_inputs.py — not a poison value)."""
    col = F.col(c)
    return F.coalesce(F.isnan(col) | (F.abs(col) >= _INF), F.lit(False))


def _array_nonfinite(c: str) -> Column:
    """True when any element of the float/double array column is NaN or
    ±Inf; NULL arrays (and NULL elements) are not flagged."""
    bad = F.exists(
        F.col(c).cast("array<double>"),
        lambda x: F.isnan(x) | (F.abs(x) >= _INF),
    )
    return F.coalesce(bad, F.lit(False))


def nonfinite_pred(
    cols: tuple[str, ...],
    array_cols: tuple[str, ...] = (),
    bounds: dict[str, tuple[float, float]] | None = None,
    ts_bounds: dict[str, tuple[str, str]] | None = None,
    array_dims: dict[str, int] | None = None,
) -> Column:
    """OR of the per-column non-finite flags — True exactly for rows the
    split quarantines. ``bounds`` optionally adds a plausibility range
    per scalar column: a FINITE 1e300 reading poisons the downstream
    exact-cents ``cast(bigint)`` exactly like Inf (ANSI CAST_OVERFLOW
    is about range, not just finiteness), so a boundary validator that
    knows the sensor's physical range should reject outside it. NULLs
    are never flagged by a bound.

    ``ts_bounds`` is the TEMPORAL twin (r12 extreme-timestamp audit,
    ``tests/test_ts_inputs.py``): {column: (lo, hi)} with ISO-string
    endpoints, flagging timestamps outside the closed-open [lo, hi)
    plausibility window. Two measured reasons a corrupt timestamp is
    poison, not just noise: (a) a year-1900 or year-9999 row turns any
    gap-bounded generator (hourly gap-fill / interpolation
    ``sequence`` explodes) into a ~70M-row-per-key job that never
    finishes; (b) anything past 2262-04-11 overflows Arrow's
    nanosecond range, so EVERY pandas-UDF path fed the column dies
    with ArrowInvalid. The literals are cast to the column's own type
    (TIMESTAMP vs TIMESTAMP_NTZ both work).

    ``array_dims`` is the DIMENSION leg (r12 ragged-embedding audit,
    ``tests/test_ragged_inputs.py``): {column: expected_length},
    flagging non-null arrays whose size differs — a truncated, empty,
    or over-long vector among fixed-dim embeddings kills MLlib fits
    and transforms deep in Scala (KMeans/PCA/LSH dimension mismatch),
    breaks PQ's numpy reshape, and silently corrupts any zip_with dot
    product that happens to tolerate it. NULL arrays pass (missing is
    the null contract's business)."""
    pred = F.lit(False)
    for c in cols:
        pred = pred | _col_nonfinite(c)
    for c in array_cols:
        pred = pred | _array_nonfinite(c)
    for c, (lo, hi) in (bounds or {}).items():
        col = F.col(c)
        pred = pred | F.coalesce((col < lo) | (col > hi), F.lit(False))
    for c, (lo, hi) in (ts_bounds or {}).items():
        col = F.col(c)
        # ISO-string literals: Catalyst coerces the STRING side of a
        # binary comparison to the timestamp column's own type, so one
        # spelling works for TIMESTAMP and TIMESTAMP_NTZ columns alike
        pred = pred | F.coalesce(
            (col < F.lit(lo)) | (col >= F.lit(hi)), F.lit(False)
        )
    for c, dim in (array_dims or {}).items():
        pred = pred | F.coalesce(
            F.size(F.col(c)) != F.lit(int(dim)), F.lit(False)
        )
    return pred


def measure_columns(df: DataFrame) -> tuple[tuple[str, ...], tuple[str, ...]]:
    """(scalar double/float columns, float/double-array columns) of ``df`` —
    the generic boundary-validation surface, derived from the schema so
    no per-table hardcoding drifts when fixtures evolve. This is THE
    definition of "measure column" shared by the catalog's boundary
    entries (``events_finite_quarantine`` / ``lake_finite_quarantine``
    in ``plans/governance.py``) and the NaN/Inf audit
    (``tests/test_naninf_inputs.py``), so the audit provably cleans the
    same surface the catalog validates."""
    from pyspark.sql.types import ArrayType, DoubleType, FloatType

    scalars, arrays = [], []
    for fld in df.schema.fields:
        # FloatType scalars are part of the surface too (r12 ADVICE):
        # no fixture carries one today, but a float32 measure column
        # would hit the same downstream NaN/Inf hazards as a double,
        # and this function is THE shared definition — excluding
        # float32 here would silently shrink the boundary with no test
        # going red. isnan/abs work on floats unchanged.
        if isinstance(fld.dataType, (DoubleType, FloatType)):
            scalars.append(fld.name)
        elif isinstance(fld.dataType, ArrayType) and isinstance(
            fld.dataType.elementType, (DoubleType, FloatType)
        ):
            arrays.append(fld.name)
    return tuple(scalars), tuple(arrays)


def temporal_columns(df: DataFrame) -> tuple[str, ...]:
    """Timestamp(-NTZ) columns of ``df`` — the temporal
    boundary-validation surface, schema-derived like
    ``measure_columns``. Shared by ``lake_temporal_quarantine`` and the
    extreme-timestamp audit (``tests/test_ts_inputs.py``)."""
    from pyspark.sql.types import TimestampNTZType, TimestampType

    return tuple(
        fld.name
        for fld in df.schema.fields
        if isinstance(fld.dataType, (TimestampType, TimestampNTZType))
    )


def finite_split(
    df: DataFrame,
    cols: tuple[str, ...],
    array_cols: tuple[str, ...] = (),
    bounds: dict[str, tuple[float, float]] | None = None,
    ts_bounds: dict[str, tuple[str, str]] | None = None,
    array_dims: dict[str, int] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Split ``df`` into (clean, quarantined) on measure finiteness.

    ``clean`` holds every row whose listed scalar columns and
    float-array columns contain no NaN/±Inf — and, when ``bounds``
    (numeric), ``ts_bounds`` (temporal, ISO strings, [lo, hi)), or
    ``array_dims`` (fixed vector length) gives a column a plausibility
    contract, no violating value (NULLs pass everywhere — they are
    legal missing values, handled per-query); ``quarantined`` holds
    the exact complement, ready to be written to a quarantine prefix
    for inspection, mirroring the streaming path's malformed-JSON
    split at ``streaming/pipeline.py``.
    """
    bad = nonfinite_pred(cols, array_cols, bounds, ts_bounds, array_dims)
    return df.filter(~bad), df.filter(bad)
