"""Observe-metric TOTALITY contract, catalog-wide.

The r11 NaN/Inf audit found a Spark footgun worse than a crash: an
ANSI error raised inside an ``F.observe`` metric expression is
swallowed by the QueryExecutionListener — the observed job "succeeds",
the observation is never fulfilled, and ``observation.get`` blocks the
DRIVER FOREVER. A partial metric is therefore a silent production
hang, and no exception-shaped audit can see it.

Two layers pin the contract:

1. ``test_observe_queries_are_pinned`` finds every registered query
   whose SOURCE uses the Observation API (mechanical — a new observe
   query cannot register without tripping this) and asserts the set
   matches the names covered by layer 2. Adding an observe query
   means adding it here, which drafts it into the hang check.
2. ``test_observe_metrics_total_on_poison`` runs each pinned query on
   a NaN/±Inf-poisoned fixture in a SUBPROCESS with a hard timeout —
   the only reliable way to detect a driver hang without hanging the
   suite. Timeout ⇒ a metric expression is partial ⇒ red test naming
   the query.
"""

from __future__ import annotations

import inspect
import os
import signal
import subprocess
import sys

import pytest

from real_time_predictive_maintenance_data_pipeline_spark.plans import all_queries

from .conftest import SF_SMOKE
from .poison import poison_tables

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Every catalog query that retrieves driver-side Observation metrics.
# If test_observe_queries_are_pinned fails, a new observe query was
# registered: add its name here so the poison-hang check covers it,
# and make sure its metric expressions are TOTAL (guard ANSI-raising
# casts/divisions INSIDE the metric — a wrapping CASE added later
# fires too late for builtin aggregates, see rel_corr_covar).
OBSERVE_QUERIES = ("rel_observe_metrics",)


def _uses_observation_api(fn) -> bool:
    try:
        src = inspect.getsource(fn)
    except (OSError, TypeError):  # builtins / C-level — not ours
        return False
    return "Observation(" in src or ".observe(" in src


def test_observation_api_files_are_pinned():
    """Backstop for the source-inspection detector below: a query that
    reaches the Observation API through a HELPER function would escape
    ``inspect.getsource(q.spark)``, so pin which package files touch
    the API at all. New file ⇒ extend OBSERVE_QUERIES coverage."""
    pkg = os.path.join(
        REPO, "real_time_predictive_maintenance_data_pipeline_spark"
    )
    hits = set()
    for dirpath, _dirs, files in os.walk(pkg):
        for f in files:
            if not f.endswith(".py"):
                continue
            path = os.path.join(dirpath, f)
            with open(path, encoding="utf-8") as fh:
                src = fh.read()
            if "Observation(" in src or ".observe(" in src:
                hits.add(os.path.relpath(path, pkg))
    assert hits == {"plans/relational.py"}, (
        "Observation API usage moved/spread — make sure every observe "
        f"query is in OBSERVE_QUERIES ({sorted(hits)})"
    )


def test_observe_queries_are_pinned():
    found = sorted(
        name
        for name, q in all_queries().items()
        if _uses_observation_api(q.spark)
    )
    assert found == sorted(OBSERVE_QUERIES), (
        "registered queries using the Observation API changed — update "
        "OBSERVE_QUERIES in this file so the driver-hang check covers "
        f"them (found: {found})"
    )


_RUNNER = """
import sys
repo, name, sf_dir = sys.argv[1], sys.argv[2], sys.argv[3]
sys.path.insert(0, repo)
from real_time_predictive_maintenance_data_pipeline_spark.session import get_spark
from real_time_predictive_maintenance_data_pipeline_spark.plans import all_queries
spark = get_spark()
df = all_queries()[name].spark(spark, sf_dir)
print("ROWS", df.count(), flush=True)
spark.stop()
"""


@pytest.fixture(scope="module")
def poisoned_sf_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("sf_observe_naninf"))
    poison_tables(SF_SMOKE, d)
    return d


@pytest.mark.slow
@pytest.mark.parametrize("name", OBSERVE_QUERIES)
def test_observe_metrics_total_on_poison(name, poisoned_sf_dir):
    """A partial observe metric hangs the driver (not crashes it), so
    run the query in its own process group and kill on timeout."""
    proc = subprocess.Popen(
        [sys.executable, "-c", _RUNNER, REPO, name, poisoned_sf_dir],
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
        cwd=REPO,
        start_new_session=True,  # kill the JVM with the python driver
    )
    try:
        out, err = proc.communicate(timeout=300)
    except subprocess.TimeoutExpired:
        os.killpg(proc.pid, signal.SIGKILL)
        proc.wait()
        pytest.fail(
            f"{name} hung on the NaN/Inf fixture — an observe metric "
            "expression is PARTIAL (ANSI error swallowed by the "
            "listener; observation.get blocks forever). Guard the "
            "metric expression itself."
        )
    assert proc.returncode == 0, (
        f"{name} crashed on the NaN/Inf fixture (rc={proc.returncode}) — "
        "observe metrics must be total:\n" + "\n".join(err.splitlines()[-15:])
    )
    assert "ROWS" in out
