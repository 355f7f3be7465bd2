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
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    payload_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Backward as-of join: for each left row, attach the payload of the
    latest right row with ``right_ts <= left_ts`` and equal key(s).

    ``payload_cols`` defaults to every right column except keys + ts.
    Right's timestamp column may itself be listed as a payload column to
    surface the matched time. Left rows with no match keep NULL payload
    (left-outer semantics).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if payload_cols is None:
        payload_cols = [c for c in right.columns if c not in (*keys, right_ts)]
    payload_cols = list(payload_cols)

    # Normalize both sides to: keys, __ts, __side, payload-struct, left-cols
    r = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("__payload"),
    )
    left_cols = [c for c in left.columns]
    l = left.select(
        *left_cols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
    )

    unioned = l.unionByName(r, allowMissingColumns=True)

    w = (
        Window.partitionBy(*keys)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "__matched", F.last("__payload", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("__side") == 1).select(
        *left_cols,
        *[F.col(f"__matched.{c}").alias(c) for c in payload_cols],
    )
    return out
