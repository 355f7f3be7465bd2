"""Lifecycle tests for ``plans.telemetry._publish`` — the landed-output
publication primitive behind the hash-green telemetry oracles (r15;
r14 verdict "What's wrong" #2).

Contract pinned here:

1. durability — the stable path serves real bytes after the source
   (scratch) dir is deleted, so an oracle-only process started after
   this interpreter exits still reads (the old symlink-into-scratch
   dangled);
2. reader retention — the generation a reader resolved BEFORE a swap
   survives THROUGH the swap (one full publish cycle), so a concurrent
   cross-process reader mid-scan never loses files (the old
   swap-then-rmtree yanked them);
3. boundedness — two publishes later the oldest generation is gone
   (≤2 generations per name ever exist);
4. the two-process shape itself: a subprocess resolves the stable
   link, the parent swaps a new generation in, and the subprocess then
   streams the files it resolved — successfully.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

import pytest

from real_time_predictive_maintenance_data_pipeline_spark.plans import telemetry as T


@pytest.fixture()
def landed_root(tmp_path, monkeypatch):
    root = str(tmp_path / "landed")
    monkeypatch.setattr(T, "_LANDED_ROOT", root)
    return root


def _make_src(tmp_path, tag: str, n: int = 3) -> str:
    d = tmp_path / f"src_{tag}"
    d.mkdir()
    for i in range(n):
        (d / f"part-{i}.txt").write_text(f"{tag}:{i}\n")
    return str(d)


def test_publish_survives_source_deletion(tmp_path, landed_root):
    src = _make_src(tmp_path, "a")
    stable = T._publish(src, "t")
    shutil.rmtree(src)  # scratch sweep at interpreter exit
    assert sorted(os.listdir(stable)) == [f"part-{i}.txt" for i in range(3)]
    assert open(os.path.join(stable, "part-0.txt")).read() == "a:0\n"


def test_previous_generation_survives_one_swap_then_expires(tmp_path, landed_root):
    T._publish(_make_src(tmp_path, "g1"), "t")
    gen1 = os.path.realpath(os.path.join(landed_root, "t"))

    T._publish(_make_src(tmp_path, "g2"), "t")
    # a reader that resolved the link pre-swap keeps its files
    assert open(os.path.join(gen1, "part-0.txt")).read() == "g1:0\n"
    gen2 = os.path.realpath(os.path.join(landed_root, "t"))
    assert open(os.path.join(gen2, "part-0.txt")).read() == "g2:0\n"

    T._publish(_make_src(tmp_path, "g3"), "t")
    # one full cycle later gen1 is swept, gen2 retained: ≤2 generations
    assert not os.path.exists(gen1)
    assert os.path.exists(gen2)
    gens = [e for e in os.listdir(landed_root) if e.startswith(".t.gen.")]
    assert len(gens) == 2


def test_names_do_not_cross_sweep(tmp_path, landed_root):
    T._publish(_make_src(tmp_path, "x1"), "x")
    x_gen = os.path.realpath(os.path.join(landed_root, "x"))
    for tag in ("y1", "y2", "y3"):
        T._publish(_make_src(tmp_path, tag), "y")
    # y's generation churn never touches x's live generation
    assert open(os.path.join(x_gen, "part-0.txt")).read() == "x1:0\n"


_READER = """
import json, os, sys, time
stable = sys.argv[1]
resolved = os.path.realpath(stable)        # reader enters the old dir
print(json.dumps({"resolved": resolved}), flush=True)  # parent may swap now
sys.stdin.readline()                       # wait until the swap happened
data = {}
for f in sorted(os.listdir(resolved)):     # stream the OLD dir post-swap
    with open(os.path.join(resolved, f)) as fh:
        data[f] = fh.read()
print(json.dumps(data), flush=True)
"""


def test_two_process_reader_survives_swap(tmp_path, landed_root):
    """The r14 finding as a literal two-process scenario: a reader in
    another process resolves the stable link, the publisher swaps a new
    generation in, and the reader then streams the dir it resolved —
    every file must still be there."""
    import json

    stable = T._publish(_make_src(tmp_path, "old"), "t")
    proc = subprocess.Popen(
        [sys.executable, "-c", _READER, stable],
        stdin=subprocess.PIPE,
        stdout=subprocess.PIPE,
        text=True,
    )
    try:
        resolved = json.loads(proc.stdout.readline())["resolved"]
        T._publish(_make_src(tmp_path, "new"), "t")  # swap under the reader
        proc.stdin.write("go\n")
        proc.stdin.flush()
        data = json.loads(proc.stdout.readline())
        assert proc.wait(timeout=30) == 0
    finally:
        proc.kill()
    assert data == {f"part-{i}.txt": f"old:{i}\n" for i in range(3)}
    assert os.path.exists(resolved)
    # and the stable path now serves the new generation
    assert open(os.path.join(stable, "part-0.txt")).read() == "new:0\n"
