"""Propose the next round's driver window under the round-8+
steady-state policy (recorded in plans/registry.py): once every catalog
query has a driver row, the 50-slot window becomes a ROTATING RECHECK —
(a) queries whose Spark plan or oracle text changed this round go first
(plan changes are detected MECHANICALLY: regenerate PLAN_DIGESTS.json
with ``python tools/plan_digest.py``, and this tool diffs it against
the copy committed at the last round boundary — oracle-text changes
remain a human judgment over the diff), then (b) the
least-recently-driver-checked names in age order (ties by
registration order) fill the remaining slots, so the whole catalog
re-earns driver evidence roughly every ceil(catalog/50) rounds.

The tool reads every committed CORRECTNESS_r*.json, computes each
query's most recent driver round, and prints:

- any never-checked names (these MUST lead the window);
- the least-recently-checked 50-slice as a ready-to-paste Python tuple
  for ``_RECHECK_FIRST`` (annotated with each name's last round);
- the per-round age histogram, so drift is visible at a glance.

Usage: python tools/plan_next_window.py [window_size]
Purely advisory — it writes nothing; paste the output into
plans/registry.py, bump ``_ROTATED_FOR_ROUND``, then run
``python tools/check_window.py`` to validate the arithmetic.
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from real_time_predictive_maintenance_data_pipeline_spark.plans import all_queries


def _row_failed(row: dict) -> bool:
    """True when a CORRECTNESS row records a driver FAILURE (as opposed
    to hash-green or rows-only-by-contract). no_oracle rows pass the
    weaker rows-only check, so only a real error or an explicit False
    match flag counts."""
    if row.get("err") not in (None, "no_oracle"):
        return True
    return any(
        row.get(k) is False for k in ("hash_match", "rows_match", "schema_match")
    )


def last_checked_rounds(repo: str) -> tuple[dict[str, int], set[str]]:
    """(query name -> most recent driver round with a CORRECTNESS row,
    names whose MOST RECENT row failed). A failure does not count as
    'recently checked' for rotation purposes — the steady-state policy
    requires failed names to lead _RECHECK_FIRST, so they are returned
    separately and printed as a mandatory section."""
    last: dict[str, int] = {}
    outcome: dict[str, bool] = {}
    for path in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        rnd = int(re.search(r"_r(\d+)", os.path.basename(path)).group(1))
        with open(path) as f:
            for name, row in json.load(f).items():
                if rnd >= last.get(name, 0):
                    last[name] = rnd
                    outcome[name] = _row_failed(row)
    failed = {n for n, bad in outcome.items() if bad}
    return last, failed


def _boundary_shas(repo: str, limit: int = 2) -> list[str]:
    """SHAs of the most recent round-boundary commits, newest first.

    Both boundary message formats count (the r10 ADVICE grep fix): the
    driver's "round N: verdict/advice/correctness/bench" AND its
    "round N: end-of-round snapshot (...)" — a round that stalled before
    the verdict commit still has a usable snapshot boundary."""
    # --grep matches commit BODIES too (r11 ADVICE): a non-boundary
    # commit quoting a "round N: verdict..." line in its body would be
    # misidentified. Over-fetch, then keep only lines whose SUBJECT
    # (already in the %s output) re-matches the boundary pattern.
    out = subprocess.run(
        ["git", "log", "--format=%H %s", "--grep",
         "^round [0-9]*: \\(verdict\\|end-of-round\\)"],
        cwd=repo, capture_output=True, text=True, check=True,
    ).stdout.splitlines()
    pat = re.compile(r"^round \d+: (verdict|end-of-round)")
    shas = []
    for line in out:
        parts = line.split(maxsplit=1)
        if len(parts) == 2 and pat.match(parts[1]):
            shas.append(parts[0])
    return shas[:limit]


def _boundary_round(repo: str, sha: str) -> int:
    """Round number from a boundary commit's subject line."""
    subject = subprocess.run(
        ["git", "log", "--format=%s", "-1", sha],
        cwd=repo, capture_output=True, text=True, check=True,
    ).stdout.strip()
    m = re.match(r"round (\d+):", subject)
    return int(m.group(1)) if m else -1


def _digests_at(repo: str, sha: str) -> dict | None:
    """PLAN_DIGESTS.json as committed at ``sha``, or None if absent."""
    proc = subprocess.run(
        ["git", "show", f"{sha}:PLAN_DIGESTS.json"],
        cwd=repo, capture_output=True, text=True,
    )
    if proc.returncode != 0:
        return None
    return json.loads(proc.stdout)


def _digest_diff(base: dict, cur: dict) -> list[str]:
    # reserved keys (``__fixtures__`` et al.) are metadata, not queries
    base = {k: v for k, v in base.items() if not k.startswith("__")}
    cur = {k: v for k, v in cur.items() if not k.startswith("__")}
    changed = sorted(n for n in cur if n in base and base[n] != cur[n])
    new = sorted(set(cur) - set(base))
    return changed + new


def _tool_changed(base: dict, cur: dict) -> bool:
    """True when the two PLAN_DIGESTS.json copies were produced by
    different normalizer sets (``__digest_tool__`` differs, or one
    predates the record) — digest diffs across a tool change are
    re-baselines, not plan edits, for every name the new normalizer
    touches (r11: 47 lambda-using plans shifted with zero code
    changes when the lambda-ordinal strip was added)."""
    return (base.get("__digest_tool__") or "") != (cur.get("__digest_tool__") or "")


def _fixture_drift(base: dict, cur: dict) -> list[str]:
    """Fixture tables whose recorded schema fingerprint differs between
    two PLAN_DIGESTS.json copies — the r11 attribution signal: a mass
    digest shift accompanied by fixture drift is environmental (the
    driver regenerated /root/testdata with different physical types),
    not 49 independent code changes. Empty when either copy predates
    the ``__fixtures__`` record."""
    old_fx = base.get("__fixtures__") or {}
    new_fx = cur.get("__fixtures__") or {}
    if not old_fx or not new_fx:
        return []
    return sorted(
        t for t in set(old_fx) | set(new_fx) if old_fx.get(t) != new_fx.get(t)
    )


def _edited_in_span(repo: str, sha_new: str, sha_old: str, names: list[str]) -> list[str]:
    """Subset of ``names`` whose registering plans/ file changed between
    the two boundary commits (r12 ADVICE): when a digest-tool change
    demotes ALL boundary-vs-boundary diffs to a re-baseline note, a
    plan genuinely edited in that span that was NOT hand-front-loaded
    per policy would silently drop out of the recheck window. A name is
    'edited in span' when some plans/-package file that changed between
    the boundaries contains its string literal at the new boundary —
    a deliberately coarse over-approximation (false positives just get
    re-checked; false negatives are what we're closing)."""
    pkg = "real_time_predictive_maintenance_data_pipeline_spark"
    try:
        changed_files = subprocess.run(
            ["git", "diff", "--name-only", sha_old, sha_new, "--", f"{pkg}/plans"],
            cwd=repo, capture_output=True, text=True, check=True,
        ).stdout.split()
    except subprocess.CalledProcessError:
        return []
    # registry.py is window BOOKKEEPING — it lists every catalog name
    # and is edited every round by rotation, so matching literals in it
    # would keep ALL demoted names packed (measured: the r12 tuple
    # rewrite alone re-flagged both r12 re-baseline names).
    changed_files = [f for f in changed_files if not f.endswith("/registry.py")]
    kept: set[str] = set()
    for f in changed_files:
        try:
            blob = subprocess.run(
                ["git", "show", f"{sha_new}:{f}"],
                cwd=repo, capture_output=True, text=True, check=True,
            ).stdout
        except subprocess.CalledProcessError:
            continue  # file deleted at the new boundary
        for n in names:
            if f'"{n}"' in blob or f"'{n}'" in blob:
                kept.add(n)
    return sorted(kept)


def plan_changed_between_boundaries(repo: str) -> tuple[list[str], str]:
    """Names whose committed digest differs between the LAST TWO round
    boundaries. This is the structural fix for the r9 blind spot: when
    PLAN_DIGESTS.json is first committed (or regenerated) in the same
    snapshot as the operator edits it records, the working-tree diff
    against that snapshot shows nothing — but the previous boundary
    still holds the pre-edit digests, so boundary-vs-boundary diffing
    flags the names (rel_heavy_hitters / ts_ewma_last escaped exactly
    this way in r9)."""
    try:
        shas = _boundary_shas(repo, limit=2)
    except subprocess.CalledProcessError:
        return [], "git log failed — not a git checkout?"
    if len(shas) < 2:
        return [], "fewer than two round-boundary commits"
    cur = _digests_at(repo, shas[0])
    base = _digests_at(repo, shas[1])
    if cur is None or base is None:
        return [], "PLAN_DIGESTS.json absent at one of the last two boundaries"
    # A name already driver-checked in the round the newest boundary
    # closed has fresh evidence for exactly these changes — only names
    # whose last driver row predates that round still need the recheck.
    rnd = _boundary_round(repo, shas[0])
    last, _failed = last_checked_rounds(repo)
    stale = [n for n in _digest_diff(base, cur) if last.get(n, -1) < rnd]
    notes = []
    drift = _fixture_drift(base, cur)
    if drift:
        notes.append(
            "NOTE: fixture schema drift between the two boundaries "
            f"({', '.join(drift)}) — the changed digests are likely "
            "environmental (testdata regeneration), not code; recheck "
            "still applies but read the diff with that cause in mind"
        )
    if stale and _tool_changed(base, cur):
        # The r12 trap the r11 verdict warned about: the digest tool's
        # normalizer set changed between the two boundaries, so the
        # newer boundary's file is a mass RE-BASELINE for every plan
        # the new normalizer touches — NOT evidence those plans were
        # edited. Real edits in that span were (per policy) already
        # hand-front-loaded into that round's window and are filtered
        # out above by the fresh-evidence check — but policy can be
        # forgotten (r12 ADVICE), so names whose registering plans/
        # file ALSO changed in the same commit span stay packed; only
        # the remainder is demoted to an informational listing.
        edited = _edited_in_span(repo, shas[0], shas[1], stale)
        demoted = [n for n in stale if n not in edited]
        if edited:
            notes.append(
                "NOTE: digest tool changed between boundaries, but "
                f"these {len(edited)} names' plans/ files were edited "
                "in the same span — kept as mandatory rechecks: "
                + ", ".join(edited)
            )
        if demoted:
            notes.append(
                "NOTE: the digest tool's normalizer set changed between "
                f"the last two boundaries — the {len(demoted)} "
                "boundary-vs-boundary digest diffs below are a tool "
                "RE-BASELINE, not plan edits, and are NOT packed as "
                "mandatory rechecks (hand-check that round's commits if "
                "in doubt):\n    " + ", ".join(demoted)
            )
        stale = edited
    return stale, "\n".join(notes)


def plan_changed_since_boundary(repo: str) -> tuple[list[str], str]:
    """Names whose digest in the working-tree PLAN_DIGESTS.json differs
    from the copy committed at the last round boundary. Returns
    (names, note); the note is non-empty when the comparison could not
    run (missing file, first round with digests, stale working copy)
    and explains why.

    Regenerate the working-tree file FIRST (python tools/plan_digest.py)
    — this tool only diffs, it never builds Spark plans itself."""
    cur_path = os.path.join(repo, "PLAN_DIGESTS.json")
    if not os.path.exists(cur_path):
        return [], "PLAN_DIGESTS.json missing — run python tools/plan_digest.py"
    try:
        shas = _boundary_shas(repo, limit=1)
    except subprocess.CalledProcessError:
        return [], "git log failed — not a git checkout?"
    if not shas:
        return [], "no round-boundary commit found"
    base = _digests_at(repo, shas[0])
    if base is None:
        return [], "no PLAN_DIGESTS.json at the last round boundary yet"
    with open(cur_path) as f:
        cur = json.load(f)
    changed_and_new = _digest_diff(base, cur)
    # staleness guard: digests regenerated before the latest source edit
    # would silently miss changes
    src_root = os.path.join(
        repo, "real_time_predictive_maintenance_data_pipeline_spark"
    )
    newest_src = max(
        (
            os.path.getmtime(os.path.join(d, f))
            for d, _, fs in os.walk(src_root)
            for f in fs
            if f.endswith(".py")
        ),
        default=0.0,
    )
    notes = []
    drift = _fixture_drift(base, cur)
    if drift:
        notes.append(
            "NOTE: fixture schema drift since the last boundary "
            f"({', '.join(drift)}) — changed digests are likely "
            "environmental (testdata regeneration), not code"
        )
    if _tool_changed(base, cur):
        notes.append(
            "NOTE: the digest tool's normalizer set changed since the "
            "last boundary — changed digests are partly a tool "
            "re-baseline, not code; hand-check the round's commits for "
            "the REAL plan changes before packing the window"
        )
    if newest_src > os.path.getmtime(cur_path):
        notes.append(
            "WARNING: package source is newer than PLAN_DIGESTS.json — "
            "regenerate with python tools/plan_digest.py before trusting this"
        )
    return changed_and_new, "\n".join(notes)


def main() -> int:
    window = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    qs = all_queries()
    last, failed = last_checked_rounds(repo)
    # registration order is the tiebreak; all_queries() applies the
    # rotation lists, so recover raw registration order from the
    # registry module's insertion order instead
    from real_time_predictive_maintenance_data_pipeline_spark.plans.registry import (
        _REGISTRY,
    )

    reg_order = {n: i for i, n in enumerate(_REGISTRY)}

    never = [n for n in qs if n not in last]
    # a name whose latest driver row FAILED is a mandatory recheck — it
    # must not be excluded as "recently checked"
    must = [n for n in qs if n in failed]
    aged = sorted(
        (n for n in qs if n in last and n not in failed),
        key=lambda n: (last[n], reg_order[n]),
    )

    hist = Counter(last[n] for n in qs if n in last)
    print(f"catalog: {len(qs)} queries; driver-checked: {len(last) - len(set(last) - set(qs))}")
    print("age histogram (last-checked round -> queries):")
    for rnd in sorted(hist):
        print(f"  r{rnd:02d}: {hist[rnd]}")

    if never:
        print(f"\nNEVER CHECKED ({len(never)}) — these must lead the window:")
        for n in never:
            print(f'    "{n}",')

    if must:
        print(
            f"\nFAILED IN LATEST ROUND ({len(must)}) — mandatory rechecks,"
            " place these at the very front:"
        )
        for n in must:
            print(f'    "{n}",  # FAILED r{last[n]:02d}')

    plan_changed, note = plan_changed_since_boundary(repo)
    if note:
        print(f"\n{note}")
    boundary_changed, bnote = plan_changed_between_boundaries(repo)
    if bnote:
        if bnote.startswith("NOTE:"):
            print(f"\n{bnote}")
        else:
            print(f"\nboundary-vs-boundary digest diff skipped: {bnote}")
    # boundary-vs-boundary names are mandatory too (r9 blind spot:
    # digests committed in the same snapshot as the edits they record
    # are invisible to the working-tree diff above)
    plan_changed = sorted(set(plan_changed) | set(boundary_changed))
    # already-mandatory names (failures) need no second listing
    plan_changed = [n for n in plan_changed if n in set(qs) and n not in failed]
    if plan_changed:
        print(
            f"\nPLAN CHANGED SINCE LAST ROUND BOUNDARY ({len(plan_changed)})"
            " — mandatory rechecks (r8+ policy), place after failures:"
        )
        for n in plan_changed:
            print(f'    "{n}",  # plan changed')

    aged = [n for n in aged if n not in set(plan_changed)]
    take = aged[: max(0, window - len(never) - len(must) - len(plan_changed))]
    print(
        f"\nproposed _RECHECK_FIRST slice ({len(take)} names, oldest first;"
        " prepend the mandatory sections above; oracle-TEXT changes"
        " are still a manual prepend):"
    )
    print("(")
    print("    # DRIVER-SCALE RE-RUN, NOT A REGRESSION: least-recently-")
    print("    # checked rotation per the r8+ steady-state policy.")
    for n in take:
        print(f'    "{n}",  # last r{last[n]:02d}')
    print(")")
    return 0


if __name__ == "__main__":
    sys.exit(main())
