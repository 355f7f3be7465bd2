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


import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from real_time_predictive_maintenance_data_pipeline_spark.operators.timeseries import (
    resample_interpolate,
)


def _reference_resample(rows, step):
    """Pure-Python reference: bucket means, per-key lo..hi grid, then
    (locf_fill, interp_fill) per bucket. rows = [(k, t_sec, v)]."""
    from collections import defaultdict

    per_bucket = defaultdict(list)
    for k, t, v in rows:
        per_bucket[(k, (t // step) * step)].append(v)
    means = {kb: sum(vs) / len(vs) for kb, vs in per_bucket.items()}
    out = {}
    for k in {kb[0] for kb in means}:
        bs = sorted(b for kk, b in means if kk == k)
        observed = [(b, means[(k, b)]) for b in bs]
        for b in range(bs[0], bs[-1] + 1, step):
            obs = means.get((k, b))
            prevs = [(be, v) for be, v in observed if be <= b]
            nexts = [(be, v) for be, v in observed if be >= b]
            locf = obs if obs is not None else (prevs[-1][1] if prevs else None)
            if obs is not None:
                interp = obs
            elif prevs and nexts:
                (pe, pv), (ne, nv) = prevs[-1], nexts[0]
                interp = pv + (nv - pv) * (b - pe) / (ne - pe)
            else:
                interp = None
            out[(k, b)] = (obs, locf, interp)
    return out


@settings(max_examples=5, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from("AB"),
            st.integers(0, 120),
            st.integers(-50, 50).map(float),
        ),
        min_size=1,
        max_size=15,
    )
)
def test_resample_property_matches_reference(spark, rows):
    """Both resamplers == the sequential reference over arbitrary
    sparse series: bucket means, grid coverage, LOCF carry, linear
    interpolation, and edge buckets (no bracketing pair) left null."""
    step = 10
    ref = _reference_resample(rows, step)
    df = spark.createDataFrame(rows, "k STRING, t LONG, v DOUBLE").selectExpr(
        "k", "timestamp_seconds(t) AS ts", "v"
    )
    locf = {
        (r.key, int(r.bucket_ts.timestamp())): (r.obs_avg, r.filled_avg, r.is_gap)
        for r in resample_locf(
            df, key_col="k", ts_col="ts", value_col="v", step_seconds=step
        ).collect()
    }
    interp = {
        (r.key, int(r.bucket_ts.timestamp())): (r.filled_avg, r.is_edge)
        for r in resample_interpolate(
            df, key_col="k", ts_col="ts", value_col="v", step_seconds=step
        ).collect()
    }
    assert set(locf) == set(ref) and set(interp) == set(ref)
    for kb, (obs, want_locf, want_interp) in ref.items():
        got_obs, got_locf, got_gap = locf[kb]
        assert got_obs == pytest.approx(obs) if obs is not None else got_obs is None
        assert got_gap == (obs is None)
        if want_locf is None:
            assert got_locf is None
        else:
            assert got_locf == pytest.approx(want_locf)
        got_interp, got_edge = interp[kb]
        if want_interp is None:
            assert got_interp is None and got_edge
        else:
            assert got_interp == pytest.approx(want_interp) and not got_edge
