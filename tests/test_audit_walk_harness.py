"""Pins for the shared audit-walk harness (tests/audit_walk.py).

The harness runs catalog queries CONCURRENTLY, so its correctness
hinges on the session-global detector: a query that mutates session
state (temp views, saved tables, SQL UDFs, conf flips, observations)
racing another query would make the whole @slow suite flaky in ways
that look like engine bugs. These pins make detector drift loud.
"""

from __future__ import annotations

from real_time_predictive_maintenance_data_pipeline_spark.plans import all_queries

from .audit_walk import (
    ESTIMATOR_CRISP_OK,
    SESSION_GLOBAL_MARKERS,
    _CRISP_RE,
    _tainted_function_names,
    session_global_queries,
)

# Queries KNOWN to mutate session-global state (each verified by code
# read): SQL-over-temp-view plans, managed bucketed tables, SQL UDF /
# UDTF registration, session-conf flips, Observation listeners. The
# detector must find at least these; it may find more (conservative
# over-taint through shared helpers is fine — a serial false positive
# costs milliseconds, a concurrent false negative costs a flaky suite).
KNOWN_GLOBAL = frozenset(
    {
        "rel_sql_api",
        "rel_sql_udf",
        "rel_python_udtf",
        "rel_parameterized_sql",
        "rel_observe_metrics",
        "src_bucketed_join",
        "src_bucketed_groupby",
    }
)

# Queries KNOWN pure (plain DataFrame compositions over load_table) —
# if one of these lands in the serial set the detector regressed into
# over-tainting the whole catalog and the pool speedup silently dies.
KNOWN_PURE = frozenset(
    {
        "q1_pricing_summary",
        "dedup_exact",
        "sim_topk_bruteforce",
        "doc_bm25_search",
        "lake_finite_quarantine",
    }
)


def test_detector_finds_known_global_queries():
    serial = session_global_queries()
    missing = KNOWN_GLOBAL - serial
    assert not missing, (
        f"session-global queries escaped the detector: {sorted(missing)} "
        "— running these in the thread pool makes the @slow suite flaky"
    )


def test_detector_does_not_swallow_the_catalog():
    serial = session_global_queries()
    overlap = KNOWN_PURE & serial
    assert not overlap, (
        f"pure queries detected as session-global: {sorted(overlap)} — "
        "the taint fixed-point over-expanded (check short helper names "
        "matching unrelated call sites)"
    )
    assert len(serial) < 40, (
        f"serial set grew to {len(serial)} — the pool speedup is gone; "
        "tighten the markers or the transitive closure"
    )


def test_taint_closure_reaches_package_helpers():
    """register_views (sources/tables.py) reaches
    createOrReplaceTempView — the one-level indirection the closure
    exists for. If it stops being tainted, queries registering views
    through it would silently run concurrently."""
    assert "register_views" in _tainted_function_names()


def test_crisp_regex_matches_the_declared_contract_messages():
    """The crisp classifier must match exactly the messages ml/fitguard
    and the PQ empty-codebook guard actually raise (source-pinned
    substrings), and must NOT match a generic ValueError."""
    assert _CRISP_RE.search("upstream filter or source produced zero rows")
    assert _CRISP_RE.search("got 1 row(s) — this estimator needs at least 2")
    assert _CRISP_RE.search("pq_encode: empty codebooks — PQ training saw zero vectors")
    assert not _CRISP_RE.search("could not broadcast input array")


def test_markers_cover_the_known_mutation_apis():
    """Belt-and-braces: the marker tuple itself is part of the contract
    (someone trimming it should trip a test, not just a comment)."""
    for m in (
        "createOrReplaceTempView",
        "saveAsTable",
        "udf.register",
        "spark.conf.set",
        ".observe(",
    ):
        assert m in SESSION_GLOBAL_MARKERS


def test_estimator_crisp_set_matches_registry():
    """Every name in ESTIMATOR_CRISP_OK must be a registered query —
    a renamed estimator query would otherwise keep a stale allowance."""
    names = set(all_queries())
    stale = ESTIMATOR_CRISP_OK - names
    assert not stale, f"stale names in ESTIMATOR_CRISP_OK: {sorted(stale)}"
