"""Whole-catalog EXTREME-TIMESTAMP robustness — the corrupt-clock shape.

Eighth of the degenerate-input family. Corrupt timestamps are routine
crawl/sensor output (unset epoch fields, two-digit-year parses landing
in 1900, 9999-12-31 sentinel values) and — unlike most dirty data —
they are POISON, not noise, for two measured reasons (r12 probe):

1. **Runaway generators**: a single year-1900 or year-9999 row widens
   the min-max span every gap-bounded generator explodes over —
   ``ts_interpolate_linear``'s hourly ``sequence`` became a ~70M-row
   job that never finished (>150 s at sf0.001 vs ~2 s clean, i.e.
   unbounded at any real scale).
2. **Arrow nanosecond ceiling**: pandas converts timestamp[us] to ns,
   whose max is 2262-04-11 — any later timestamp kills EVERY
   ``pandas_udf``/``applyInPandas`` path fed the column with
   ArrowInvalid (``ts_ewma_last``, pinned below).

Per-query range guards would be the wrong architecture (same argument
as NaN/±Inf): the engine's answer is the temporal half of the lake
boundary — ``finite_split(..., ts_bounds=...)`` once per table
(catalog entry ``lake_temporal_quarantine``), after which every
downstream query may assume plausible clocks. Pinned here:

1. ``ts_bounds`` semantics: exact complement split on [lo, hi); NULL
   timestamps pass (missing is the null contract's business).
2. The poison is real: ``ts_ewma_last`` DIES with ArrowInvalid on the
   raw poisoned fixture (if this starts passing, Arrow grew past ns —
   revisit the policy). The runaway-generator half is pinned by proxy:
   the plausibility window bounds every generator's span by
   construction, and re-running the probe is minutes of wall time.
3. The recipe works END-TO-END: after one ts-bounds split per temporal
   table at the boundary, EVERY catalog query completes.
"""

from __future__ import annotations

import datetime
import os
import shutil

import pytest

from real_time_predictive_maintenance_data_pipeline_spark.operators.quarantine import (
    finite_split,
    temporal_columns,
)
from real_time_predictive_maintenance_data_pipeline_spark.plans import all_queries
from real_time_predictive_maintenance_data_pipeline_spark.plans.governance import (
    LAKE_TEMPORAL_TABLES,
    PLAUSIBLE_TS_WINDOW,
)
from real_time_predictive_maintenance_data_pipeline_spark.sources.tables import (
    TABLES,
    load_table,
)

from .audit_walk import ESTIMATOR_CRISP_OK, walk_catalog
from .conftest import SF_SMOKE

# all outside PLAUSIBLE_TS_WINDOW; 2263 is also past Arrow's ns ceiling
EXTREME_TS = (
    datetime.datetime(1900, 1, 1),
    datetime.datetime(9999, 12, 31, 23, 59, 59),
    datetime.datetime(2263, 1, 1),
)

#: ns-representable poison (r12 ADVICE): Arrow timestamp[ns] only spans
#: 1677-09-21..2262-04-11, so writing year-9999 back through an
#: ns-typed fixture column would raise ArrowInvalid at FIXTURE-BUILD
#: time (the audit would error instead of test). These stay outside any
#: plausible window while fitting ns. Live fixtures are timestamp[us]
#: today; this guards the next fixture regeneration (events.ts WAS
#: timestamp[ns] before the 2026-08-14 driver regen — FIXTURES.md).
EXTREME_TS_NS = (
    datetime.datetime(1900, 1, 1),
    datetime.datetime(2262, 4, 1),
    datetime.datetime(2260, 1, 1),
)


@pytest.fixture(scope="module")
def extreme_ts_sf_dir(tmp_path_factory):
    """Fixture copy with every 50th row of every timestamp column set
    to a rotating extreme value; non-temporal tables byte-identical."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("sf_extreme_ts")
    for f in os.listdir(SF_SMOKE):
        if not f.endswith(".parquet"):
            continue
        src = os.path.join(SF_SMOKE, f)
        t = pq.read_table(src)
        ts_fields = [
            fld.name for fld in t.schema if pa.types.is_timestamp(fld.type)
        ]
        if not ts_fields or not t.num_rows:
            shutil.copyfile(src, str(d / f))
            continue
        cols = []
        for idx, fld in enumerate(t.schema):
            col = t.column(idx)
            if fld.name in ts_fields:
                poison = (
                    EXTREME_TS_NS if fld.type.unit == "ns" else EXTREME_TS
                )
                vals = col.to_pylist()
                for j in range(0, t.num_rows, 50):
                    vals[j] = poison[(j // 50) % len(poison)]
                col = pa.array(vals, type=fld.type)
            cols.append(col)
        pq.write_table(pa.table(cols, schema=t.schema), str(d / f))
    return str(d)


@pytest.fixture(scope="module")
def ts_cleaned_sf_dir(spark, extreme_ts_sf_dir, tmp_path_factory):
    """The documented recipe: one ts-bounds finite_split per temporal
    table at the boundary, clean side written back as the lake."""
    lo, hi = PLAUSIBLE_TS_WINDOW
    d = tmp_path_factory.mktemp("sf_extreme_ts_clean")
    for name in TABLES:
        df = load_table(spark, extreme_ts_sf_dir, name)
        tcols = temporal_columns(df)
        clean, _bad = finite_split(
            df, (), ts_bounds={c: (lo, hi) for c in tcols}
        )
        clean.write.mode("overwrite").parquet(str(d / f"{name}.parquet"))
    return str(d)


def test_lake_temporal_covers_every_timestamp_table(spark):
    with_ts = {
        name
        for name in TABLES
        if temporal_columns(load_table(spark, SF_SMOKE, name))
    }
    assert with_ts == set(LAKE_TEMPORAL_TABLES), (
        "fixture temporal surface drifted — update LAKE_TEMPORAL_TABLES "
        "AND the lake_temporal_quarantine oracle SQL in lockstep "
        f"(live: {sorted(with_ts)})"
    )


def test_ts_bounds_split_is_exact_complement(spark):
    rows = [
        (1, datetime.datetime(2024, 5, 1)),
        (2, datetime.datetime(1900, 1, 1)),
        (3, None),
        (4, datetime.datetime(9999, 12, 31)),
        (5, datetime.datetime(1970, 1, 1)),  # lo is inclusive
        (6, datetime.datetime(2099, 12, 31, 23, 59, 59)),  # hi exclusive
        (7, datetime.datetime(2100, 1, 1)),
    ]
    df = spark.createDataFrame(rows, "id bigint, ts timestamp_ntz")
    lo, hi = PLAUSIBLE_TS_WINDOW
    clean, bad = finite_split(df, (), ts_bounds={"ts": (lo, hi)})
    assert sorted(r.id for r in clean.collect()) == [1, 3, 5, 6]
    assert sorted(r.id for r in bad.collect()) == [2, 4, 7]


def test_lake_temporal_quarantine_counts_poison(spark, extreme_ts_sf_dir):
    q = all_queries()["lake_temporal_quarantine"]
    rows = {
        r.table_name: r for r in q.spark(spark, extreme_ts_sf_dir).collect()
    }
    assert set(rows) == set(LAKE_TEMPORAL_TABLES)
    for name, r in rows.items():
        assert r.n_quarantined > 0, f"{name}: poison not flagged"
        assert r.n_clean + r.n_quarantined == r.n_rows, name


def test_raw_poison_still_kills_a_pandas_path(spark, extreme_ts_sf_dir):
    """Documents WHY the temporal boundary exists: a post-2262
    timestamp overflows Arrow's ns range inside every pandas exchange.
    If this pin ever passes, Arrow's ceiling moved — revisit."""
    q = all_queries()["ts_ewma_last"]
    with pytest.raises(Exception, match="ArrowInvalid|out of bounds"):
        q.spark(spark, extreme_ts_sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()


@pytest.mark.slow
def test_every_query_survives_after_ts_boundary_split(spark, ts_cleaned_sf_dir):
    crisp, bad = walk_catalog(spark, ts_cleaned_sf_dir)
    assert not bad, f"temporal boundary did not make the catalog safe: {bad}"
    assert crisp <= ESTIMATOR_CRISP_OK, f"unexpected crisp failures: {crisp}"
