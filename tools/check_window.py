"""Assert the driver-window rotation arithmetic in plans/registry.py.

The round driver checks only the FIRST 50 queries of ``all_queries()``
order. This check fails loudly if the rotation lists drift:

- the window (_RECHECK_FIRST + _WINDOW_PRIORITY) must hold exactly 50
  names (or fewer only when fewer than 50 queries remain unverified);
- no name may appear in two lists;
- every listed name must exist in the catalog;
- no _DRIVER_VERIFIED name may sit inside the window unless it is also
  in _RECHECK_FIRST (a deliberate re-check);
- every query name present in a committed CORRECTNESS_r*.json must be
  rotated into _DRIVER_VERIFIED (or sit in _RECHECK_FIRST) — this is
  the "forgot to rotate" guard: the driver writes that file every
  round, so a stale registry fails here immediately;
- report how many catalog queries still lack any driver row.

Run: ``python tools/check_window.py`` (exit 0 = window is sane).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WINDOW = 50


def main() -> int:
    from real_time_predictive_maintenance_data_pipeline_spark.plans.registry import (
        _DRIVER_VERIFIED,
        _RECHECK_FIRST,
        _ROTATED_FOR_ROUND,
        _WINDOW_PRIORITY,
        all_queries,
    )

    qs = all_queries()
    names = set(qs)
    errors: list[str] = []

    for label, lst in (
        ("_RECHECK_FIRST", _RECHECK_FIRST),
        ("_WINDOW_PRIORITY", _WINDOW_PRIORITY),
        ("_DRIVER_VERIFIED", _DRIVER_VERIFIED),
    ):
        unknown = [n for n in lst if n not in names]
        if unknown:
            errors.append(f"{label} references unknown queries: {unknown}")
        if len(set(lst)) != len(lst):
            dupes = sorted({n for n in lst if lst.count(n) > 1})
            errors.append(f"{label} has duplicates: {dupes}")

    recheck, prio, verified = (
        set(_RECHECK_FIRST),
        set(_WINDOW_PRIORITY),
        set(_DRIVER_VERIFIED),
    )
    if recheck & prio:
        errors.append(f"_RECHECK_FIRST overlaps _WINDOW_PRIORITY: {sorted(recheck & prio)}")
    stale = (prio & verified) - recheck
    if stale:
        errors.append(
            "verified names inside _WINDOW_PRIORITY without a recheck "
            f"(wasted window slots): {sorted(stale)}"
        )

    import glob
    import json
    import re as _re

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # 1) Every CORRECTNESS file from a round BEFORE the declared rotation
    #    epoch must be fully rotated (the current round's file — written
    #    by the driver after this layout was committed — is pending by
    #    definition and excluded).
    driver_checked: set[str] = set()
    for path in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        rnd = int(_re.search(r"_r(\d+)", os.path.basename(path)).group(1))
        if rnd >= _ROTATED_FOR_ROUND:
            continue
        with open(path) as f:
            driver_checked.update(json.load(f))
    unrotated = sorted((driver_checked & names) - verified - recheck)
    if unrotated:
        errors.append(
            "queries with pre-epoch driver rows not rotated into "
            f"_DRIVER_VERIFIED (and not in _RECHECK_FIRST): {unrotated}"
        )
    # 2) Forcing function for the NEXT round: the driver's progress log
    #    carries the live round counter; a fresh round with a stale
    #    rotation epoch means last round's results exist but were not
    #    rotated — fail until they are.
    progress = os.path.join(repo, "PROGRESS.jsonl")
    if os.path.exists(progress):
        with open(progress) as f:
            lines = [ln for ln in f if ln.strip()]
        if lines:
            current_round = json.loads(lines[-1]).get("round")
            if isinstance(current_round, int) and current_round > _ROTATED_FOR_ROUND:
                errors.append(
                    f"driver is on round {current_round} but the window was "
                    f"rotated for round {_ROTATED_FOR_ROUND}: append "
                    f"CORRECTNESS_r{current_round - 1:02d}'s green names to "
                    "_DRIVER_VERIFIED, move fails to _RECHECK_FIRST, repack "
                    "_WINDOW_PRIORITY, and bump _ROTATED_FOR_ROUND"
                )

    unverified = [n for n in qs if n not in verified]
    window_size = len(_RECHECK_FIRST) + len(_WINDOW_PRIORITY)
    want = min(WINDOW, len(unverified))
    if window_size != want:
        errors.append(
            f"window holds {window_size} names but should hold {want} "
            f"({len(unverified)} unverified remain; window={WINDOW})"
        )

    # Names the driver will actually check this round = first 50 in order.
    ordered = list(qs)
    checked = ordered[:WINDOW]
    first_time = [n for n in checked if n not in verified]
    left_out = [n for n in unverified if n not in checked]
    oracled_left_out = [n for n in left_out if qs[n].oracle is not None]
    if oracled_left_out and window_size < want + len(oracled_left_out):
        pass  # only reachable when >50 unverified; report below instead
    print(f"catalog: {len(qs)} queries; driver window: {len(checked)}")
    print(f"first-time checks this round: {len(first_time)}")
    print(f"unverified after this round: {len(left_out)} -> {sorted(left_out)}")
    if oracled_left_out and len(unverified) > WINDOW:
        print(
            "note: oracled queries left out (prefer packing these before "
            f"rows-only ones next round): {sorted(oracled_left_out)}"
        )

    if errors:
        for e in errors:
            print(f"ERROR: {e}", file=sys.stderr)
        return 1
    print("window OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
