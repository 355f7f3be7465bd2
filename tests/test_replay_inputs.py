"""Whole-catalog DELIVERY-REPLAY robustness — the duplicated-row shape.

Tenth of the degenerate-input family. At-least-once delivery — the
engine's own streaming guarantee (QoS-1 MQTT redelivery, Kafka
consumer restarts) and the reference's upstream semantics
(Kinesis/Firehose both deliver at-least-once) — duplicates WHOLE ROWS
on redelivery or batch replay. Unlike the other nine poisons this one
never crashes a scan: it is schema-legal, value-legal data whose
damage is mostly SILENT (every SUM/AVG/count drifts high) — plus one
crisp failure class the r13 probe measured: keyed writes
(``rel_merge_upsert``/``rel_scd2_history``) reject a source batch
carrying multiple rows per key BY CONTRACT, with the engine's own
USER_RAISED_EXCEPTION naming the operator.

The engine's answer mirrors its streaming path: the stream collapses
redelivered rows with ``dropDuplicatesWithinWatermark``
(streaming/pipeline.py); the batch lake gets one exact
``dropDuplicates()`` per table at ingestion (audited by the catalog
entry ``lake_replay_audit``). Because the fixture tables are naturally
duplicate-free (pinned below via the audit entry's n_replayed == 0 on
clean inputs), the boundary dedup recovers the EXACT original multiset
— so recovery is asserted byte-for-byte, not just "completes": a
cross-family sample of oracled queries must return identical rows on
the deduped replayed lake and the clean lake.

Pinned here:

1. The audit entry counts replay exactly (canary) and reports zero on
   the clean fixtures (the duplicate-free property recovery relies on).
2. The poison is real: keyed MERGE dies crisply (kill-pin), and a
   flagship aggregate silently DRIFTS on the raw replayed lake
   (the worse failure mode).
3. The recipe works END-TO-END: after one dropDuplicates per table,
   EVERY catalog query completes (@slow walk) and the sample queries
   match the clean run byte-for-byte.
"""

from __future__ import annotations

import os

import pytest

from real_time_predictive_maintenance_data_pipeline_spark.plans import all_queries
from real_time_predictive_maintenance_data_pipeline_spark.plans.governance import (
    LAKE_TABLES_ALL,
)
from real_time_predictive_maintenance_data_pipeline_spark.sources.tables import (
    TABLES,
    load_table,
)

from .audit_walk import ESTIMATOR_CRISP_OK, walk_catalog
from .conftest import SF_SMOKE

#: Byte-identical recovery sample — one oracled query per input family
#: (lineitem aggregate, events funnel, documents scoring, embeddings
#: stats, multi-table join).
RECOVERY_SAMPLE = (
    "q1_pricing_summary",
    "events_funnel_steps",
    "doc_bm25_search",
    "emb_dim_stats",
    "q5_local_supplier",
)


@pytest.fixture(scope="module")
def replayed_sf_dir(tmp_path_factory):
    """Fixture copy where every 5th row of every table is delivered
    TWICE (appended verbatim) — the at-least-once replay shape."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("sf_replay")
    for f in os.listdir(SF_SMOKE):
        if not f.endswith(".parquet"):
            continue
        t = pq.read_table(os.path.join(SF_SMOKE, f))
        if t.num_rows:
            dup = t.take(list(range(0, t.num_rows, 5)))
            t = pa.concat_tables([t, dup])
        pq.write_table(t, str(d / f))
    return str(d)


@pytest.fixture(scope="module")
def replay_cleaned_sf_dir(spark, replayed_sf_dir, tmp_path_factory):
    """The documented recipe: one exact dropDuplicates per table at the
    boundary, clean side written back as the lake."""
    d = tmp_path_factory.mktemp("sf_replay_clean")
    for name in TABLES:
        df = load_table(spark, replayed_sf_dir, name)
        df.dropDuplicates().write.mode("overwrite").parquet(
            str(d / f"{name}.parquet")
        )
    return str(d)


def test_replay_surface_matches_table_registry():
    """LAKE_TABLES_ALL is hardcoded in lockstep with the oracle SQL —
    it must track the live table registry exactly."""
    assert set(LAKE_TABLES_ALL) == set(TABLES)


def test_lake_replay_audit_clean_fixtures_are_duplicate_free(spark):
    """n_replayed == 0 everywhere on the clean fixtures — the property
    that makes boundary dedup an EXACT recovery, not a lossy one."""
    rows = all_queries()["lake_replay_audit"].spark(spark, SF_SMOKE).collect()
    assert {r.table_name for r in rows} == set(LAKE_TABLES_ALL)
    for r in rows:
        assert r.n_replayed == 0, f"{r.table_name}: natural dupes appeared"
        assert r.n_rows == r.n_distinct


def test_lake_replay_audit_counts_poison_exactly(spark, replayed_sf_dir):
    rows = {
        r.table_name: r
        for r in all_queries()["lake_replay_audit"]
        .spark(spark, replayed_sf_dir)
        .collect()
    }
    for name in LAKE_TABLES_ALL:
        r = rows[name]
        n_orig = r.n_distinct  # == original rows (fixtures dupe-free)
        expected = (n_orig + 4) // 5  # every 5th row duplicated
        assert r.n_replayed == expected, (name, r.n_replayed, expected)
        assert r.n_rows == n_orig + expected


def test_raw_replay_kills_keyed_merge_crisply(spark, replayed_sf_dir):
    """Kill-pin: MERGE semantics are ambiguous when the source batch
    carries the same key twice — the engine raises its own
    multiple-rows-per-key error instead of nondeterministically
    picking a winner."""
    q = all_queries()["rel_merge_upsert"]
    with pytest.raises(Exception, match="multiple rows for a key"):
        q.spark(spark, replayed_sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()


def test_raw_replay_silently_drifts_an_aggregate(spark, replayed_sf_dir):
    """The WORSE failure mode: nothing crashes, the numbers are just
    wrong — a flagship aggregate must differ between the raw replayed
    lake and the clean lake (documents why the boundary exists)."""
    q = all_queries()["q1_pricing_summary"]
    clean = sorted(map(tuple, q.spark(spark, SF_SMOKE).collect()))
    replayed = sorted(map(tuple, q.spark(spark, replayed_sf_dir).collect()))
    assert clean != replayed


def test_boundary_dedup_recovers_byte_identical_results(
    spark, replay_cleaned_sf_dir
):
    """After one dropDuplicates per table the sample queries must match
    the clean-fixture run EXACTLY (same rows, same values) — possible
    because the fixtures are naturally duplicate-free, so the dedup
    recovers the original multiset."""
    for name in RECOVERY_SAMPLE:
        q = all_queries()[name]
        clean = sorted(map(tuple, q.spark(spark, SF_SMOKE).collect()))
        recovered = sorted(
            map(tuple, q.spark(spark, replay_cleaned_sf_dir).collect())
        )
        assert clean == recovered, f"{name} diverged after replay dedup"


@pytest.mark.slow
def test_every_query_survives_after_replay_dedup(spark, replay_cleaned_sf_dir):
    crisp, bad = walk_catalog(spark, replay_cleaned_sf_dir)
    assert not bad, f"replay dedup did not make the catalog safe: {bad}"
    assert crisp <= ESTIMATOR_CRISP_OK, f"unexpected crisp failures: {crisp}"


# (No clean-fixture epsilon test here: tests/test_oracle_parity.py::
# test_oracle_match[lake_replay_audit_approx] already runs the entry on
# the clean fixtures and hash-compares every approx_ok gate against the
# oracle's literal TRUE — a strictly stronger check. The replayed-
# fixture walk below is the one this file adds.)


def test_lake_replay_audit_approx_detects_heavy_replay(spark, replayed_sf_dir):
    """On the poisoned lake (every 5th row duplicated) the monitor's
    n_rows/n_distinct gap is visible through the approx path: the
    estimate tracks distinct rows, not delivered rows, so a 20 %
    replay inflation cannot hide inside the 5 % gate."""
    rows = (
        all_queries()["lake_replay_audit_approx"]
        .spark(spark, replayed_sf_dir)
        .collect()
    )
    for r in rows:
        assert r.approx_ok, f"{r.table_name}: estimate left the gate"
        assert r.n_rows > r.n_distinct  # the replay inflation is visible
