"""merge_upsert semantics (the CDC-apply primitive)."""

from __future__ import annotations

from real_time_predictive_maintenance_data_pipeline_spark.operators.merge import (
    merge_upsert,
)


def test_merge_upsert_whole_row_source_wins(spark):
    """MERGE contract: matched keys take the ENTIRE source row —
    including columns the source legitimately updates TO null (a
    per-column COALESCE would silently keep the stale target value)."""
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k bigint, name string, v double",
    )
    source = spark.createDataFrame(
        [(2, None, 99.0), (4, "d", 40.0)],
        "k bigint, name string, v double",
    )
    out = {r.k: (r.name, r.v) for r in merge_upsert(target, source, ["k"]).collect()}
    assert out == {
        1: ("a", 10.0),   # untouched target row persists
        2: (None, 99.0),  # matched: source wins, null update honored
        3: ("c", 30.0),
        4: ("d", 40.0),   # unmatched source row inserts
    }


def test_merge_upsert_rejects_column_drift(spark):
    import pytest

    target = spark.createDataFrame([(1, "a")], "k bigint, name string")
    source = spark.createDataFrame([(1,)], "k bigint")
    with pytest.raises(ValueError, match="identical column sets"):
        merge_upsert(target, source, ["k"])
