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


def test_tool_change_demotion_keeps_names_edited_in_span(tmp_path):
    """The r12 ADVICE gap: when the digest tool's normalizer set changes
    between boundaries, ALL boundary digest diffs used to be demoted to
    a re-baseline note — a plan genuinely edited in that span that was
    not hand-front-loaded would silently drop out of the recheck
    window. Now a demoted name whose registering plans/ file changed in
    the same commit span stays packed; registry.py edits do NOT count
    (it lists every catalog name and is rewritten by every rotation)."""
    import json
    import os
    import subprocess

    from tools.plan_next_window import plan_changed_between_boundaries

    repo = str(tmp_path)
    pkg = "real_time_predictive_maintenance_data_pipeline_spark"
    os.makedirs(tmp_path / pkg / "plans")

    def git(*args):
        subprocess.run(
            ["git", *args], cwd=repo, check=True, capture_output=True,
            env={"GIT_AUTHOR_NAME": "t", "GIT_AUTHOR_EMAIL": "t@t",
                 "GIT_COMMITTER_NAME": "t", "GIT_COMMITTER_EMAIL": "t@t",
                 "PATH": "/usr/bin:/bin:/usr/local/bin", "HOME": repo},
        )

    def commit(msg, digests, plans_src, registry_src):
        (tmp_path / "PLAN_DIGESTS.json").write_text(json.dumps(digests))
        (tmp_path / pkg / "plans" / "x.py").write_text(plans_src)
        (tmp_path / pkg / "plans" / "registry.py").write_text(registry_src)
        git("add", "-A")
        git("commit", "-m", msg, "--allow-empty")

    git("init", "-q")
    commit(
        "round 11: verdict/advice/correctness/bench",
        {"q_edited": "old", "q_rebase": "old",
         "__digest_tool__": "normalizers_v1"},
        'register("q_edited")\n',
        '"q_edited", "q_rebase"\n',
    )
    # tool changed AND x.py edited (still mentions q_edited); registry
    # rewritten as every rotation does (mentions both names)
    commit(
        "round 12: verdict/advice/correctness/bench",
        {"q_edited": "new", "q_rebase": "new",
         "__digest_tool__": "normalizers_v2"},
        'register("q_edited")  # edited this span\n',
        '"q_rebase", "q_edited"\n',
    )

    names, note = plan_changed_between_boundaries(repo)
    assert names == ["q_edited"], names  # kept: plans file edited in span
    assert "q_rebase" in note and "RE-BASELINE" in note  # demoted, listed
