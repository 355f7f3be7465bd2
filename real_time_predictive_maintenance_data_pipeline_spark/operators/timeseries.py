"""Time-series resampling + gap filling — sensor-data preparation ops
(the predictive-maintenance domain's missing-data workhorse).

The reference consumes a perfectly regular 1 Hz stream and a perfect
1-minute historical grid, so it never needs this; real telemetry has
gaps (dropped QoS-1 messages, machine downtime). ``resample_locf``
regularizes an irregular series onto a fixed grid with
last-observation-carried-forward semantics.

Scale design: the grid is generated per key with ``sequence()``
(JVM-side, no driver loop); observations are bucket-aggregated BEFORE
the grid join so the join is grid×1 per bucket, never row×row; LOCF is
one window pass per key ordered by bucket. Total: two shuffles on the
key (agg + window), both on the same key so AQE/bucketing can reuse the
exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.timeutil import epoch_bucket, epoch_us


def resample_locf(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step_seconds: int = 3600,
) -> DataFrame:
    """Regularize (key, ts, value) onto a ``step_seconds`` grid.

    Output: (key, bucket_ts, obs_avg, filled_avg, is_gap) — one row per
    grid bucket from each key's first to last observation; ``obs_avg``
    is the in-bucket mean (null for empty buckets), ``filled_avg``
    carries the last non-null bucket mean forward, ``is_gap`` marks
    filled rows.
    """
    # epoch_bucket handles TIMESTAMP_NTZ inputs (unix_timestamp would
    # fall back to a second-granularity string parse on NTZ)
    bucket = F.timestamp_seconds(epoch_bucket(F.col(ts_col), step_seconds))

    # per-bucket aggregation first — the grid join then matches 1:1
    obs = (
        df.select(F.col(key_col).alias("key"), bucket.alias("bucket_ts"), F.col(value_col).alias("v"))
        .groupBy("key", "bucket_ts")
        .agg(F.avg("v").alias("obs_avg"))
    )

    # per-key grid via sequence() — distributed, no driver materialization
    spans = obs.groupBy("key").agg(
        F.min("bucket_ts").alias("lo"), F.max("bucket_ts").alias("hi")
    )
    grid = spans.select(
        "key",
        F.explode(
            F.sequence("lo", "hi", F.expr(f"INTERVAL {step_seconds} SECONDS"))
        ).alias("bucket_ts"),
    )

    joined = grid.join(obs, ["key", "bucket_ts"], "left")
    w = (
        Window.partitionBy("key")
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "key",
        "bucket_ts",
        "obs_avg",
        F.last("obs_avg", ignorenulls=True).over(w).alias("filled_avg"),
        F.col("obs_avg").isNull().alias("is_gap"),
    )


def resample_interpolate(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step_seconds: int = 3600,
) -> DataFrame:
    """Like :func:`resample_locf` but gaps are LINEARLY INTERPOLATED
    between the neighboring observed buckets instead of carried
    forward — the right fill for slowly-drifting physical sensors
    (temperature ramps) where LOCF introduces a staircase bias.

    Same two-shuffle shape as LOCF (bucket agg + windows on the key);
    the backward/forward neighbor scan is two window passes over the
    same partitioning, so the exchange is reused. Buckets outside the
    first/last observation of a key have no bracketing pair and stay
    null (``filled_avg`` is null, ``is_edge`` true).

    Output: (key, bucket_ts, obs_avg, filled_avg, is_gap, is_edge).
    """
    step = F.lit(step_seconds)
    bucket_epoch = epoch_bucket(F.col(ts_col), step_seconds)

    obs = (
        df.select(
            F.col(key_col).alias("key"),
            bucket_epoch.alias("bucket_e"),
            F.col(value_col).alias("v"),
        )
        .groupBy("key", "bucket_e")
        .agg(F.avg("v").alias("obs_avg"))
    )
    spans = obs.groupBy("key").agg(
        F.min("bucket_e").alias("lo"), F.max("bucket_e").alias("hi")
    )
    grid = spans.select(
        "key", F.explode(F.sequence("lo", "hi", step)).alias("bucket_e")
    )
    j = grid.join(obs, ["key", "bucket_e"], "left")

    back = (
        Window.partitionBy("key")
        .orderBy("bucket_e")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy("key")
        .orderBy("bucket_e")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_e = F.when(F.col("obs_avg").isNotNull(), F.col("bucket_e"))
    prev_v = F.last("obs_avg", ignorenulls=True).over(back)
    prev_e = F.last(obs_e, ignorenulls=True).over(back)
    next_v = F.first("obs_avg", ignorenulls=True).over(fwd)
    next_e = F.first(obs_e, ignorenulls=True).over(fwd)
    frac = (F.col("bucket_e") - prev_e) / (next_e - prev_e)
    filled = (
        F.when(F.col("obs_avg").isNotNull(), F.col("obs_avg"))
        .when(
            prev_v.isNotNull() & next_v.isNotNull(),
            prev_v + (next_v - prev_v) * frac,
        )
    )
    return j.select(
        "key",
        F.timestamp_seconds("bucket_e").alias("bucket_ts"),
        "obs_avg",
        filled.alias("filled_avg"),
        F.col("obs_avg").isNull().alias("is_gap"),
        (F.col("obs_avg").isNull() & filled.isNull()).alias("is_edge"),
    )


def ewma_last(
    df,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    alpha: float = 0.3,
):
    """Final exponentially-weighted moving average per key (recursive
    ewma_t = α·v_t + (1-α)·ewma_{t-1}, seeded with the first value) —
    the smoothing a monitoring pipeline keeps per entity.

    ``applyInPandas`` per key: one shuffle on the key, numpy recursion
    inside the Arrow batch (state is O(1), the recursion is the
    definition — no window function expresses it). At 100 TB the key
    grain bounds each group's memory to its own rows; wide keys would
    move to the streaming EWMA (``streaming.stateful.drift_monitor``)
    which carries O(1) state per key across micro-batches.

    Null handling: rows with a null value or a null timestamp are
    EXCLUDED before the fold (both checks push to the scan). A null
    value is a missed observation, not a zero — folding it in would
    NaN-poison every later EWMA for the key (pandas widens None to
    NaN); a null timestamp has no position in the series. ``n`` counts
    the observations actually folded; a key with none disappears. True
    IEEE NaN VALUES (not nulls) propagate by contract, same as
    ``functions.vectors.cosine``.

    Returns (key_col, n, ewma) with ewma 4-dp rounded.
    """
    import pandas as pd

    from pyspark.sql import functions as F

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col])
        vals = pdf[value_col].to_numpy()
        e = vals[0]
        for v in vals[1:]:
            e = alpha * v + (1 - alpha) * e
        return pd.DataFrame(
            {key_col: [pdf[key_col].iloc[0]], "n": [len(vals)], "ewma": [round(e, 4)]}
        )

    return (
        df.select(key_col, ts_col, value_col)
        .filter(F.col(value_col).isNotNull() & F.col(ts_col).isNotNull())
        .groupBy(key_col)
        .applyInPandas(fit, f"{key_col} long, n long, ewma double")
    )
