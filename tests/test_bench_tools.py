"""Smoke the r13 measurement tools as real subprocesses.

The SCALING.md r13 tables are produced by these tools and the judge /
future rounds re-run them; an import rot, argparse drift, or a
pipeline-API rename would otherwise surface only mid-measurement.
Tiny parameters keep each run to session-startup + a few seconds of
work — these pin MECHANICS (exit code + a parseable table row), never
throughput numbers, which are environment-dependent by nature.

r16 suite diet: the six smokes are independent subprocesses (each its
own Spark JVM at SPARK_GRAFT_CPUS=4), so a module fixture launches
them ALL concurrently and each test asserts its own result — wall
drops from the ~3 min sum of six JVM boots to roughly the max of one
(~40 s). The stream smokes also run at --secs 15 (was 6): the
steady-state reporter needs batchId ≥ 3 with rows, and on a busy host
a short window occasionally closes first ("no steady batches" — flaked
once in the r16 clean baseline run even sequentially).
"""

from __future__ import annotations

import os
import re
import subprocess
import sys
import tempfile
from types import SimpleNamespace

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_TIMEOUT = 420

_SPECS = {
    "stream": ("bench_stream.py", "--rates", "2000", "--secs", "15",
               "--partitions", "2"),
    "lake": ("bench_stream.py", "--rates", "2000", "--secs", "15",
             "--partitions", "2", "--lake"),
    "buffered": ("bench_stream.py", "--rates", "2000", "--secs", "15",
                 "--partitions", "2", "--buffered"),
    "noop": ("bench_stream.py", "--rates", "2000", "--secs", "15",
             "--partitions", "2", "--noop"),
    "mqtt": ("bench_mqtt.py", "--n", "500", "--partitions", "1"),
    "skew": ("bench_skew.py", "--rows", "200000", "--keys", "5000"),
}


@pytest.fixture(scope="module")
def tool_runs():
    work = tempfile.mkdtemp(prefix="rtpmdp_benchtools_")
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    running = {}
    for key, (tool, *args) in _SPECS.items():
        out = open(os.path.join(work, f"{key}.out"), "w+")
        err = open(os.path.join(work, f"{key}.err"), "w+")
        proc = subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tools", tool), *args],
            stdout=out,
            stderr=err,
            text=True,
            cwd=REPO,
            env=env,
        )
        running[key] = SimpleNamespace(proc=proc, out=out, err=err)
    results = {}
    try:
        for key, r in running.items():
            rc = r.proc.wait(timeout=_TIMEOUT)
            r.out.seek(0)
            r.err.seek(0)
            results[key] = SimpleNamespace(
                returncode=rc, stdout=r.out.read(), stderr=r.err.read()
            )
            r.out.close()
            r.err.close()
    finally:
        for r in running.values():
            if r.proc.poll() is None:
                r.proc.kill()
    return results


def _table_rows(stdout: str) -> list[str]:
    # stage-progress carriage returns can glue themselves to table rows
    return [
        ln for ln in stdout.replace("\r", "\n").splitlines()
        if re.match(r"^\| [0-9]", ln)
    ]


@pytest.mark.slow
def test_bench_stream_smoke(tool_runs):
    p = tool_runs["stream"]
    assert p.returncode == 0, p.stderr[-2000:]
    rows = _table_rows(p.stdout)
    assert len(rows) == 1 and "2,000" in rows[0], p.stdout[-1000:]


@pytest.mark.slow
def test_bench_stream_lake_smoke(tool_runs):
    p = tool_runs["lake"]
    assert p.returncode == 0, p.stderr[-2000:]
    rows = _table_rows(p.stdout)
    assert len(rows) == 1, p.stdout[-1000:]
    assert "—" in rows[0]  # lake mode has no event-lag probe


@pytest.mark.slow
def test_bench_stream_buffered_smoke(tool_runs):
    p = tool_runs["buffered"]
    assert p.returncode == 0, p.stderr[-2000:]
    rows = _table_rows(p.stdout)
    assert len(rows) == 1, p.stdout[-1000:]
    assert "deliveries" in rows[0]  # buffered mode reports the promotion count


@pytest.mark.slow
def test_bench_stream_noop_smoke(tool_runs):
    p = tool_runs["noop"]
    assert p.returncode == 0, p.stderr[-2000:]
    rows = _table_rows(p.stdout)
    assert len(rows) == 1, p.stdout[-1000:]
    assert "—" in rows[0]  # noop mode has no event-lag probe


@pytest.mark.slow
def test_bench_mqtt_smoke(tool_runs):
    p = tool_runs["mqtt"]
    assert p.returncode == 0, p.stderr[-2000:]
    rows = _table_rows(p.stdout)
    # the one data row must report full delivery of all 500 messages
    assert len(rows) == 1 and rows[0].rstrip(" |").endswith("500"), p.stdout[-1000:]


@pytest.mark.slow
def test_bench_skew_smoke(tool_runs):
    p = tool_runs["skew"]
    assert p.returncode == 0, p.stderr[-2000:]
    # four variant rows, each with a wall-time cell
    body = p.stdout.replace("\r", "\n")
    rows = [ln for ln in body.splitlines() if ln.startswith("| ") and "× vs naive" in ln]
    assert len(rows) == 4, p.stdout[-1000:]
