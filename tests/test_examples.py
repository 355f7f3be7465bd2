"""End-to-end smoke of the runnable examples, as real subprocesses.

Each example is the composition surface a user actually runs; catalog
queries feed operators plain fixture scans, so plan shapes that only
arise from composed upstream stages (window filters, normalized text)
are exercised ONLY here. This caught a real crash in round 8: the
curation funnel died inside label propagation (Catalyst Union
constraint rewrite) while all 314 catalog queries passed.

Subprocess + explicit returncode: piping an example through `tail`
masks its exit status, which is exactly how the crash hid.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script: str, *args: str, timeout: int = 420) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", script), *args],
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd=REPO,
    )


@pytest.mark.slow
def test_curate_corpus_example_end_to_end(tmp_path):
    """The full curation funnel at sf0.001 — normalize, blocklist,
    exact dedup (window + self-equal filter), near-dup components,
    quality, decontaminate, pack. The funnel's yield report must reach
    the final 'written' stage."""
    p = _run("curate_corpus.py", "/root/testdata/sf0.001", str(tmp_path / "out"))
    assert p.returncode == 0, p.stderr[-2000:]
    assert "written" in p.stdout and "output:" in p.stdout


@pytest.mark.slow
def test_run_pipeline_example_end_to_end():
    """The reference-parity pipeline (simulate → relay → lake →
    train → score → alert) for a few seconds of stream time."""
    p = _run("run_pipeline.py", "6", timeout=420)
    assert p.returncode == 0, p.stderr[-2000:]
    assert "lake:" in p.stdout


@pytest.mark.slow
def test_run_pipeline_example_buffered_mode():
    """The same pipeline with phase 3 on the at-least-once
    BufferingHints landing path (r14 --buffered flag): the shutdown
    drain must report deliveries and land records."""
    p = _run("run_pipeline.py", "6", "--buffered", timeout=420)
    assert p.returncode == 0, p.stderr[-2000:]
    assert "buffered sink:" in p.stdout and "deliveries" in p.stdout
    assert "lake:" in p.stdout


@pytest.mark.slow
def test_business_review_example_end_to_end():
    """The analytics composition surface (growth, mix, concentration,
    RFM, ABC) at sf0.001 — r9-verified by hand only; CI-covered since
    r11 (r10 VERDICT item 6)."""
    p = _run("business_review.py", "/root/testdata/sf0.001")
    assert p.returncode == 0, p.stderr[-2000:]
    assert "== Growth: YoY revenue ==" in p.stdout


@pytest.mark.slow
def test_validate_lake_example_end_to_end(tmp_path):
    """The three-leg lake boundary (non-finite / temporal / dim) as the
    user runs it: poison the fixture, validate, assert the disposition
    report catches it and the clean lake is written."""
    from .poison import poison_tables

    dirty = str(tmp_path / "dirty")
    poison_tables("/root/testdata/sf0.001", dirty)
    p = _run("validate_lake.py", dirty, str(tmp_path / "out"))
    assert p.returncode == 0, p.stderr[-2000:]
    assert "validated lake written:" in p.stdout
    total = [
        line for line in p.stdout.splitlines()
        if line.startswith("quarantined total:")
    ][0]
    assert int(total.split(":")[1]) > 0, p.stdout


@pytest.mark.slow
def test_mqtt_pipeline_example_end_to_end():
    """The full wire pipeline with mutual TLS: mint dev certs, train,
    publish over MQTT 3.1.1 QoS-1, bridge to spool, score, alert."""
    p = _run("mqtt_pipeline.py", "120", "--tls", timeout=420)
    assert p.returncode == 0, p.stderr[-2000:]
    assert "alerts from" in p.stdout
