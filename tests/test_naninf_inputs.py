"""NaN/±Inf measures — the boundary-validation contract.

Fifth degenerate-input audit (zero rows, one row, nulls, constants,
and now NON-FINITE DOUBLES). Unlike the other four, the contract here
is NOT "every query survives raw poison": under default ANSI mode a
NaN reaching the exact-integer-cents cast is a CAST_OVERFLOW job kill
in ~50 catalog queries, and MLlib rejects non-finite vectors outright.
Guarding 300 queries against a property of the DATA would bury every
plan in redundant predicates; the engine's answer — same as its
streaming PERMISSIVE-parse quarantine for malformed JSON — is to
validate ONCE at the lake boundary with
``operators/quarantine.finite_split`` and let everything downstream
assume finite measures.

Pinned here:

1. ``finite_split`` semantics: exact complement split; NULLs pass as
   clean (missing is the null contract's business, poison is this
   one's); array columns flag any non-finite element.
2. The poison is real: a representative cents-cast query DIES with
   CAST_OVERFLOW on the raw poisoned fixture (if this ever starts
   passing, ANSI semantics changed and the policy should be revisited).
3. The recipe works END-TO-END: after one ``finite_split`` per table
   at the boundary, EVERY catalog query completes on the poisoned
   fixture (or raises the crisp fitguard error).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_time_predictive_maintenance_data_pipeline_spark.operators.quarantine import (
    finite_split,
    measure_columns,
)
from real_time_predictive_maintenance_data_pipeline_spark.plans import all_queries
from real_time_predictive_maintenance_data_pipeline_spark.sources.tables import (
    TABLES,
    load_table,
)

from .audit_walk import ESTIMATOR_CRISP_OK, walk_catalog
from .conftest import SF_SMOKE
from .poison import poison_tables


@pytest.fixture(scope="module")
def poisoned_sf_dir(tmp_path_factory):
    """Every double column (and every float-array column) gets NaN,
    +Inf, -Inf sprinkled on every 10th row (shared recipe in
    tests/poison.py — also used by the observe-totality contract)."""
    d = tmp_path_factory.mktemp("sf_naninf")
    poison_tables(SF_SMOKE, str(d))
    return str(d)


@pytest.fixture(scope="module")
def cleaned_sf_dir(spark, poisoned_sf_dir, tmp_path_factory):
    """The documented recipe: one finite_split per table at the
    boundary, clean side written back as the lake. The measure surface
    comes from ``operators/quarantine.measure_columns`` — the SAME
    derivation the catalog's boundary entries use — so this audit and
    the driver-checked ``lake_finite_quarantine`` watch one surface."""
    d = tmp_path_factory.mktemp("sf_naninf_clean")
    for name in TABLES:
        df = load_table(spark, poisoned_sf_dir, name)
        scalars, arrays = measure_columns(df)
        clean, _bad = finite_split(df, scalars, arrays)
        clean.write.mode("overwrite").parquet(str(d / f"{name}.parquet"))
    return str(d)


def test_lake_boundary_covers_every_measure_table(spark):
    """The catalog's whole-lake boundary entry must watch EXACTLY the
    fixture tables that carry measure columns — a new double/float
    column appearing in a table outside ``LAKE_MEASURE_TABLES`` (or a
    listed table losing its measures) reds this before the oracle SQL
    silently drifts from the Spark side."""
    from real_time_predictive_maintenance_data_pipeline_spark.plans.governance import (
        LAKE_MEASURE_TABLES,
    )

    with_measures = set()
    for name in TABLES:
        scalars, arrays = measure_columns(load_table(spark, SF_SMOKE, name))
        if scalars or arrays:
            with_measures.add(name)
    assert with_measures == set(LAKE_MEASURE_TABLES), (
        "fixture measure surface drifted — update LAKE_MEASURE_TABLES "
        "AND the lake_finite_quarantine oracle SQL in lockstep "
        f"(live: {sorted(with_measures)})"
    )


def test_lake_finite_quarantine_counts_poison(spark, poisoned_sf_dir):
    """On the poisoned fixture the boundary entry must actually flag
    rows: every listed table reports n_quarantined > 0 (each has >= 10
    rows, so the every-10th-row poison hits it) and the disposition
    partitions the table (n_clean + n_quarantined == n_rows)."""
    q = all_queries()["lake_finite_quarantine"]
    rows = {r.table_name: r for r in q.spark(spark, poisoned_sf_dir).collect()}
    from real_time_predictive_maintenance_data_pipeline_spark.plans.governance import (
        LAKE_MEASURE_TABLES,
    )

    assert set(rows) == set(LAKE_MEASURE_TABLES)
    for name, r in rows.items():
        assert r.n_quarantined > 0, f"{name}: poison not flagged"
        assert r.n_clean + r.n_quarantined == r.n_rows, name


def test_finite_split_is_exact_complement(spark):
    rows = [
        (1, 1.0, [0.1, 0.2]),
        (2, float("nan"), [0.1, 0.2]),
        (3, float("inf"), None),
        (4, None, [0.1, None]),
        (5, 5.0, [float("-inf"), 0.2]),
        (6, 6.0, None),
    ]
    df = spark.createDataFrame(rows, "id bigint, v double, e array<double>")
    clean, bad = finite_split(df, ("v",), ("e",))
    assert sorted(r.id for r in clean.collect()) == [1, 4, 6]
    assert sorted(r.id for r in bad.collect()) == [2, 3, 5]


def test_finite_split_bounds_reject_implausible_magnitudes(spark):
    """A FINITE 1e300 poisons the exact-cents cast(bigint) exactly like
    Inf — CAST_OVERFLOW is about range, not finiteness — so a boundary
    validator that knows the sensor's range must reject outside it."""
    rows = [(1, 42.0), (2, 1e300), (3, -1e300), (4, None), (5, 99.9)]
    df = spark.createDataFrame(rows, "id bigint, v double")
    clean, bad = finite_split(df, ("v",), bounds={"v": (-1e6, 1e6)})
    assert sorted(r.id for r in clean.collect()) == [1, 4, 5]
    assert sorted(r.id for r in bad.collect()) == [2, 3]


def test_raw_poison_still_kills_a_cents_cast(spark, poisoned_sf_dir):
    """Documents WHY the boundary split exists: ANSI cast of a NaN sum
    is a job kill, not a NaN result. If this xfail-shaped pin ever
    passes, ANSI semantics changed under us."""
    q = all_queries()["rel_weighted_avg_price"]
    with pytest.raises(Exception, match="CAST_OVERFLOW|ArithmeticException"):
        q.spark(spark, poisoned_sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()


@pytest.mark.slow
def test_every_query_survives_after_boundary_split(spark, cleaned_sf_dir):
    crisp, bad = walk_catalog(spark, cleaned_sf_dir)
    assert not bad, f"boundary split did not make the catalog safe: {bad}"
    assert crisp <= ESTIMATOR_CRISP_OK, f"unexpected crisp failures: {crisp}"
