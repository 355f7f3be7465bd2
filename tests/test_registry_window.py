"""The driver-window rotation arithmetic must stay sane (tools/check_window.py).

A broken rotation silently wastes an entire driver round — every new
query would miss its CORRECTNESS row. No SparkSession needed.
"""

from tools.check_window import main as check_window_main


def test_driver_window_arithmetic():
    assert check_window_main() == 0


def test_boundary_digest_diff_flags_same_snapshot_edits(tmp_path):
    """The r9 blind spot, structurally closed (r10 VERDICT item 3): a
    plan edit committed in the SAME snapshot as its regenerated
    PLAN_DIGESTS.json is invisible to the working-tree-vs-boundary
    diff — but the previous boundary still holds the pre-edit digest,
    so the boundary-vs-boundary diff must report the name as a
    mandatory recheck. Also pins the broadened boundary grep (both
    "verdict" and "end-of-round snapshot" message formats) and the
    fresh-evidence filter (a name already driver-checked in the round
    the newest boundary closed is NOT re-flagged)."""
    import json
    import subprocess

    from tools.plan_next_window import plan_changed_between_boundaries

    repo = str(tmp_path)

    def git(*args):
        subprocess.run(
            ["git", *args], cwd=repo, check=True, capture_output=True,
            env={"GIT_AUTHOR_NAME": "t", "GIT_AUTHOR_EMAIL": "t@t",
                 "GIT_COMMITTER_NAME": "t", "GIT_COMMITTER_EMAIL": "t@t",
                 "PATH": "/usr/bin:/bin:/usr/local/bin", "HOME": repo},
        )

    def commit(msg, digests, correctness=None):
        (tmp_path / "PLAN_DIGESTS.json").write_text(json.dumps(digests))
        if correctness:
            name, rnd = correctness
            (tmp_path / f"CORRECTNESS_r{rnd:02d}.json").write_text(
                json.dumps({name: {"err": None, "hash_match": True}})
            )
        git("add", "-A")
        git("commit", "-m", msg, "--allow-empty")

    git("init", "-q")
    # boundary 1 (snapshot format): pre-edit digests + fixture record
    commit(
        "round 9: end-of-round snapshot (98 turns)",
        {"q_edited": "digest_old", "q_untouched": "same", "q_fresh": "old",
         "__fixtures__": {"events": "schema_a"}},
    )
    # boundary 2 (verdict format): q_edited changed in the same snapshot
    # its digest file was regenerated in; q_fresh changed too but got a
    # round-10 driver row, so it has fresh evidence already; the fixture
    # fingerprint also drifted (testdata regeneration)
    commit(
        "round 10: verdict/advice/correctness/bench",
        {"q_edited": "digest_new", "q_untouched": "same",
         "q_fresh": "new", "q_added": "brand_new",
         "__fixtures__": {"events": "schema_b"}},
        correctness=("q_fresh", 10),
    )

    names, note = plan_changed_between_boundaries(repo)
    assert "q_edited" in names  # the same-snapshot edit is flagged
    assert "q_added" in names  # digests new at the boundary are flagged
    assert "q_untouched" not in names
    assert "q_fresh" not in names  # round-10 driver row = fresh evidence
    # the reserved key is metadata, never a "changed query"...
    assert "__fixtures__" not in names
    # ...but its drift is attributed in the note so a mass digest shift
    # reads as testdata regeneration, not 49 code changes
    assert "fixture schema drift" in note and "events" in note
