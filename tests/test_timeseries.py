"""resample_locf unit tests with crafted gaps."""

from __future__ import annotations

from real_time_predictive_maintenance_data_pipeline_spark.operators.timeseries import (
    resample_locf,
)


def test_gap_fill_locf(spark):
    # key A: observations in buckets 0, 2 (bucket 1 is a gap)
    rows = [
        ("A", 0, 10.0),
        ("A", 30, 20.0),      # same bucket 0 → avg 15.0
        ("A", 125, 99.0),     # bucket 2 (step=60)
        ("B", 60, 7.0),       # single bucket
    ]
    df = spark.createDataFrame(rows, "k STRING, t LONG, v DOUBLE").selectExpr(
        "k", "timestamp_seconds(t) AS ts", "v"
    )
    out = resample_locf(df, key_col="k", ts_col="ts", value_col="v", step_seconds=60)
    got = {
        (r.key, r.bucket_ts.strftime("%M")): (r.obs_avg, r.filled_avg, r.is_gap)
        for r in out.collect()
    }
    assert got[("A", "00")] == (15.0, 15.0, False)
    assert got[("A", "01")] == (None, 15.0, True)   # gap carried forward
    assert got[("A", "02")] == (99.0, 99.0, False)
    assert got[("B", "01")] == (7.0, 7.0, False)
    assert len(got) == 4  # grid spans min..max per key, nothing more


def test_gap_fill_leading_gap_stays_null(spark):
    """No observation before the first bucket → filled stays null only
    if the first bucket itself is observed; grid starts at first obs, so
    filled_avg is never null by construction."""
    rows = [("A", 0, 1.0), ("A", 180, 4.0)]
    df = spark.createDataFrame(rows, "k STRING, t LONG, v DOUBLE").selectExpr(
        "k", "timestamp_seconds(t) AS ts", "v"
    )
    out = resample_locf(df, key_col="k", ts_col="ts", value_col="v", step_seconds=60)
    rows_out = sorted(out.collect(), key=lambda r: r.bucket_ts)
    assert [r.is_gap for r in rows_out] == [False, True, True, False]
    assert all(r.filled_avg is not None for r in rows_out)
