"""As-of join edge-case tests (operators/asof.py): the union+LOCF
formulation must behave like a per-row backward search.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_time_predictive_maintenance_data_pipeline_spark.operators.asof import (
    asof_join,
)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [("A", 10), ("A", 20), ("A", 5), ("B", 15), ("C", 50)],
        "k STRING, lts LONG",
    )
    right = spark.createDataFrame(
        [("A", 10, 1.0), ("A", 18, 2.0), ("B", 99, 9.0)],
        "k STRING, rts LONG, px DOUBLE",
    )
    return left, right


def _collect(out):
    return {
        (r.k, r.lts): (r.rts, r.px)
        for r in out.collect()
    }


def test_asof_backward_semantics(spark, frames):
    left, right = frames
    out = asof_join(left, right, on="k", left_ts="lts", right_ts="rts",
                    payload_cols=["rts", "px"])
    got = _collect(out)
    assert got[("A", 10)] == (10, 1.0)   # inclusive: rts == lts matches
    assert got[("A", 20)] == (18, 2.0)   # latest earlier row
    assert got[("A", 5)] == (None, None)  # nothing before → null payload
    assert got[("B", 15)] == (None, None)  # right exists but only later
    assert got[("C", 50)] == (None, None)  # key absent on right
    assert len(got) == 5  # every left row exactly once (left-outer)


def test_asof_duplicate_left_timestamps(spark):
    left = spark.createDataFrame(
        [("A", 10), ("A", 10)], "k STRING, lts LONG"
    )
    right = spark.createDataFrame(
        [("A", 9, 7.0)], "k STRING, rts LONG, px DOUBLE"
    )
    out = asof_join(left, right, on="k", left_ts="lts", right_ts="rts",
                    payload_cols=["px"])
    rows = out.collect()
    assert len(rows) == 2 and all(r.px == 7.0 for r in rows)


def test_asof_empty_right(spark):
    left = spark.createDataFrame([("A", 1)], "k STRING, lts LONG")
    right = spark.createDataFrame([], "k STRING, rts LONG, px DOUBLE")
    out = asof_join(left, right, on="k", left_ts="lts", right_ts="rts",
                    payload_cols=["px"])
    rows = out.collect()
    assert len(rows) == 1 and rows[0].px is None


def _brute_asof(left_rows, right_rows, direction, tolerance=None):
    """Reference merge_asof on (k, ts) tuples; right rows are
    (k, ts, px). Returns {(k, lts): px or None}."""
    out = {}
    for k, lts in left_rows:
        cands = []
        for rk, rts, px in right_rows:
            if rk != k:
                continue
            if direction == "backward" and rts <= lts:
                cands.append((lts - rts, 0, rts, px))
            elif direction == "forward" and rts >= lts:
                cands.append((rts - lts, 0, rts, px))
            elif direction == "nearest":
                d = abs(rts - lts)
                # backward wins ties
                cands.append((d, 0 if rts <= lts else 1, rts, px))
        best = min(cands) if cands else None
        if best is None or (tolerance is not None and best[0] > tolerance):
            out[(k, lts)] = None
        else:
            out[(k, lts)] = best[3]
    return out


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_asof_directions_match_bruteforce(spark, direction):
    left_rows = [("A", t) for t in (5, 10, 14, 20, 33)] + [
        ("B", 7),
        ("B", 100),
    ]
    right_rows = [
        ("A", 4, 1.0),
        ("A", 10, 2.0),
        ("A", 18, 3.0),
        ("A", 30, 4.0),
        ("B", 50, 9.0),
    ]
    left = spark.createDataFrame(left_rows, "k STRING, lts LONG")
    right = spark.createDataFrame(right_rows, "k STRING, rts LONG, px DOUBLE")
    out = asof_join(
        left, right, on="k", left_ts="lts", right_ts="rts",
        payload_cols=["px"], direction=direction,
    )
    got = {(r.k, r.lts): r.px for r in out.collect()}
    assert got == _brute_asof(left_rows, right_rows, direction)


def test_asof_tolerance_nulls_far_matches(spark):
    left_rows = [("A", 10), ("A", 100)]
    right_rows = [("A", 8, 1.0), ("A", 50, 2.0)]
    left = spark.createDataFrame(left_rows, "k STRING, lts LONG")
    right = spark.createDataFrame(right_rows, "k STRING, rts LONG, px DOUBLE")
    out = asof_join(
        left, right, on="k", left_ts="lts", right_ts="rts",
        payload_cols=["px"], direction="backward", tolerance_us=10,
    )
    got = {(r.k, r.lts): r.px for r in out.collect()}
    assert got == {("A", 10): 1.0, ("A", 100): None}


def test_asof_nearest_tie_prefers_backward(spark):
    left = spark.createDataFrame([("A", 10)], "k STRING, lts LONG")
    right = spark.createDataFrame(
        [("A", 8, 1.0), ("A", 12, 2.0)], "k STRING, rts LONG, px DOUBLE"
    )
    out = asof_join(
        left, right, on="k", left_ts="lts", right_ts="rts",
        payload_cols=["px"], direction="nearest",
    )
    assert out.collect()[0].px == 1.0


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_asof_null_timestamps_never_match(spark, direction):
    """No timestamp, no match — in every direction. A null-ts RIGHT row
    used to sort to the partition head (nulls first) and be carried
    onto every left row with no real earlier match; a null-ts LEFT row
    under 'forward' grabbed the first real right payload. Both must be
    null-payload instead, and left-outer cardinality must hold."""
    left = spark.createDataFrame(
        [("A", 5), ("A", 20), ("A", None)], "k STRING, lts LONG"
    )
    right = spark.createDataFrame(
        [("A", None, 666.0), ("A", 10, 1.0)], "k STRING, rts LONG, px DOUBLE"
    )
    out = asof_join(
        left, right, on="k", left_ts="lts", right_ts="rts",
        payload_cols=["rts", "px"], direction=direction,
    )
    got = _collect(out)
    assert len(got) == 3
    assert got[("A", None)] == (None, None)  # null left ts: no match
    for (_, lts), (rts, px) in got.items():
        assert px != 666.0, f"null-ts right row matched at lts={lts}"
    if direction == "backward":
        assert got[("A", 5)] == (None, None)
        assert got[("A", 20)] == (10, 1.0)
    elif direction == "forward":
        assert got[("A", 5)] == (10, 1.0)
        assert got[("A", 20)] == (None, None)
    else:
        assert got[("A", 5)] == (10, 1.0)
        assert got[("A", 20)] == (10, 1.0)


from hypothesis import given, settings
from hypothesis import strategies as st

_ts = st.one_of(st.none(), st.integers(0, 30))


@settings(max_examples=6, deadline=None)
@given(
    lefts=st.lists(
        st.tuples(st.sampled_from("AB"), _ts), min_size=1, max_size=12, unique=True
    ),
    rights=st.lists(
        st.tuples(st.sampled_from("AB"), _ts, st.integers(0, 99)),
        min_size=0,
        max_size=12,
        unique_by=lambda r: (r[0], r[1]),
    ),
    direction=st.sampled_from(["backward", "forward", "nearest"]),
)
def test_asof_property_matches_reference(spark, lefts, rights, direction):
    """asof_join == the sequential reference over arbitrary small
    frames: dense timestamp collisions, keys missing on either side,
    and null timestamps on both sides (null ts never matches; null-ts
    right rows are invisible)."""
    ref = _brute_asof(
        [l for l in lefts if l[1] is not None],
        [(k, t, float(p)) for k, t, p in rights if t is not None],
        direction,
    )
    for k, lts in lefts:
        if lts is None:
            ref[(k, None)] = None
    left = spark.createDataFrame(lefts, "k STRING, lts LONG")
    right = spark.createDataFrame(
        [(k, t, float(p)) for k, t, p in rights], "k STRING, rts LONG, px DOUBLE"
    )
    out = asof_join(
        left, right, on="k", left_ts="lts", right_ts="rts",
        payload_cols=["px"], direction=direction,
    )
    got = {(r.k, r.lts): r.px for r in out.collect()}
    assert got == ref
