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
