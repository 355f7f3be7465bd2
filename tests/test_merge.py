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


def test_scd2_apply_versions(spark):
    """SCD2: current row closes at the update ts, new version opens,
    already-closed history rows pass through untouched, unmatched keys
    keep their open row."""
    import datetime as dt

    from real_time_predictive_maintenance_data_pipeline_spark.operators.merge import (
        scd2_apply,
    )

    d = dt.date
    hist = spark.createDataFrame(
        [
            (1, "a1", d(2024, 1, 1), d(2024, 3, 1)),  # closed old version
            (1, "a2", d(2024, 3, 1), None),           # current
            (2, "b1", d(2024, 1, 1), None),           # current, untouched
        ],
        "k bigint, attr string, valid_from date, valid_to date",
    )
    upd = spark.createDataFrame(
        [(1, "a3", d(2024, 6, 1))], "k bigint, attr string, valid_from date"
    )
    out = sorted(
        (r.k, r.attr, str(r.valid_from), str(r.valid_to) if r.valid_to else None)
        for r in scd2_apply(hist, upd, ["k"]).collect()
    )
    assert out == [
        (1, "a1", "2024-01-01", "2024-03-01"),
        (1, "a2", "2024-03-01", "2024-06-01"),  # closed by the update
        (1, "a3", "2024-06-01", None),          # new current version
        (2, "b1", "2024-01-01", None),
    ]


def test_merge_upsert_fails_on_duplicate_source_keys(spark):
    """Delta-MERGE semantics: multiple source rows per key fail the
    batch (a silent full-outer fan-out would duplicate target rows)."""
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    target = spark.createDataFrame([(1, 10.0)], "k bigint, v double")
    source = spark.createDataFrame(
        [(1, 11.0), (1, 12.0)], "k bigint, v double"
    )
    with pytest.raises(SparkRuntimeException, match="multiple rows"):
        merge_upsert(target, source, ["k"]).collect()


def test_scd2_apply_fails_on_duplicate_update_keys(spark):
    import datetime as dt

    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from real_time_predictive_maintenance_data_pipeline_spark.operators.merge import (
        scd2_apply,
    )

    d = dt.date
    hist = spark.createDataFrame(
        [(1, "a", d(2024, 1, 1), None)],
        "k bigint, attr string, valid_from date, valid_to date",
    )
    upd = spark.createDataFrame(
        [(1, "b", d(2024, 6, 1)), (1, "c", d(2024, 7, 1))],
        "k bigint, attr string, valid_from date",
    )
    with pytest.raises(SparkRuntimeException, match="multiple rows"):
        scd2_apply(hist, upd, ["k"]).collect()


def test_scd2_apply_broadcast_flag(spark):
    """broadcast=True forces the hint; default lets AQE/size estimate
    decide (an unconditional hint would OOM on a large update batch)."""
    import datetime as dt

    from real_time_predictive_maintenance_data_pipeline_spark.operators.merge import (
        scd2_apply,
    )

    d = dt.date
    hist = spark.createDataFrame(
        [(1, "a", d(2024, 1, 1), None)],
        "k bigint, attr string, valid_from date, valid_to date",
    )
    upd = spark.createDataFrame(
        [(1, "b", d(2024, 6, 1))], "k bigint, attr string, valid_from date"
    )
    forced = scd2_apply(hist, upd, ["k"], broadcast=True)
    assert "ResolvedHint" in forced._jdf.queryExecution().analyzed().toString() or \
        "Broadcast" in forced._jdf.queryExecution().executedPlan().toString()
    assert forced.count() == 2
