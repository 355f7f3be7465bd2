"""As-of (temporal) join as a scalable DataFrame composition.

Spark has no native ASOF JOIN. The naive formulation — non-equi join on
``l.ts >= r.ts`` + keep-latest — plans a BroadcastNestedLoopJoin and
explodes quadratically. This implementation uses the union + windowed
last-observation-carried-forward trick instead:

1. Tag left rows (side=1) and right rows (side=0), union by name.
2. Sort within each key partition by (ts, side) — a right row at the
   exact same timestamp sorts before the left row, giving inclusive
   (>=) backward-join semantics.
3. ``last(payload, ignorenulls=True)`` over rows-unbounded-preceding
   carries the most recent right payload forward onto each left row.
4. Keep only left rows.

Cost: ONE shuffle on the key (same as any equi-join), no row
multiplication, no nested loop — this survives 100 TB sides, unlike
the range-join formulation. Payload is packed into a single struct so
genuinely-NULL right payload fields don't break carry-forward.

``direction`` completes the pandas ``merge_asof`` surface:
'backward' (default, right_ts <= left_ts), 'forward'
(right_ts >= left_ts, via first-following over the mirrored sort
order), 'nearest' (both passes over the SAME key partitioning — the
exchange is reused, only a second in-partition sort is added — then
pick the smaller |Δt|, backward winning ties). ``tolerance_us`` nulls
out matches farther than the given microsecond distance, evaluated on
the matched row's timestamp carried inside the payload struct.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pyspark.sql.types import NumericType

from ..functions.timeutil import epoch_us


def _ts_us(df: DataFrame, col: str) -> Column:
    """Microsecond (or raw numeric) ordinal of a timestamp column —
    numeric ts columns (test fixtures, pre-epoched data) pass through,
    real timestamps go through the NTZ-safe epoch_us."""
    if isinstance(df.schema[col].dataType, NumericType):
        return F.col(col).cast("long")
    return epoch_us(F.col(col))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    payload_cols: Sequence[str] | None = None,
    direction: str = "backward",
    tolerance_us: int | None = None,
) -> DataFrame:
    """As-of join: for each left row, attach the payload of the right
    row with equal key(s) whose timestamp is the latest <= left_ts
    ('backward'), the earliest >= left_ts ('forward'), or the closest
    in either direction ('nearest', backward wins exact ties).

    ``payload_cols`` defaults to every right column except keys + ts.
    Right's timestamp column may itself be listed as a payload column to
    surface the matched time. Left rows with no match (or none within
    ``tolerance_us``) keep NULL payload (left-outer semantics).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown asof direction {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    if payload_cols is None:
        payload_cols = [c for c in right.columns if c not in (*keys, right_ts)]
    payload_cols = list(payload_cols)

    # Normalize both sides to: keys, __ts, __side, payload-struct
    # (+ the matched timestamp, for tolerance/nearest arithmetic).
    # Null-timestamp RIGHT rows are excluded up front: they sort first
    # under the ascending window order (nulls first), so the backward
    # carry-forward would otherwise attach their payload to every left
    # row that has no real earlier match — wrong results, silently.
    # (pandas merge_asof refuses NaT keys outright; here: no timestamp,
    # no match.) Left null-ts rows are handled symmetrically below.
    r = right.filter(F.col(right_ts).isNotNull()).select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(
            _ts_us(right, right_ts).alias("__mts_us"),
            *[F.col(c) for c in payload_cols],
        ).alias("__payload"),
    )
    left_cols = [c for c in left.columns]
    l = left.select(
        *left_cols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
    )

    unioned = l.unionByName(r, allowMissingColumns=True)

    # backward: rights sort BEFORE lefts at equal ts, so the inclusive
    # [-inf, current] frame sees the same-timestamp right.
    back_w = (
        Window.partitionBy(*keys)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # forward: rights sort AFTER lefts at equal ts, so the inclusive
    # [current, +inf] frame sees the same-timestamp right.
    fwd_w = (
        Window.partitionBy(*keys)
        .orderBy("__ts", F.desc("__side"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )

    carried = unioned
    if direction in ("backward", "nearest"):
        carried = carried.withColumn(
            "__back", F.last("__payload", ignorenulls=True).over(back_w)
        )
    if direction in ("forward", "nearest"):
        carried = carried.withColumn(
            "__fwd", F.first("__payload", ignorenulls=True).over(fwd_w)
        )

    lts_us = (
        F.col("__ts").cast("long")
        if isinstance(left.schema[left_ts].dataType, NumericType)
        else epoch_us(F.col("__ts"))
    )

    def dist(payload: Column) -> Column:
        return F.abs(lts_us - payload.getField("__mts_us"))

    if direction == "backward":
        matched = F.col("__back")
    elif direction == "forward":
        matched = F.col("__fwd")
    else:
        back, fwd = F.col("__back"), F.col("__fwd")
        matched = (
            F.when(back.isNull(), fwd)
            .when(fwd.isNull(), back)
            .when(dist(back) <= dist(fwd), back)  # backward wins ties
            .otherwise(fwd)
        )

    # A left row without a timestamp cannot match anything (under the
    # forward sort it would otherwise sit at the partition head and
    # grab the first real right payload) — keep the row, null the
    # payload: left-outer cardinality is preserved.
    matched = F.when(F.col("__ts").isNotNull(), matched)

    if tolerance_us is not None:
        matched = F.when(dist(matched) <= F.lit(tolerance_us), matched)

    out = carried.filter(F.col("__side") == 1)
    return out.select(
        *left_cols,
        *[matched.getField(c).alias(c) for c in payload_cols],
    )
