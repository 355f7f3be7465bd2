"""Per-process scratch root for queries that materialize files.

Some catalog queries demonstrate sink/source behavior (CSV/JSON/ORC
round-trips, bucketed tables, compaction, dynamic partition overwrite,
schema evolution, model artifacts) and therefore must write real files
when their plan callable is invoked — an eager side effect the pure
DataFrame queries don't have (those queries carry the ``eager-io``
registry tag). They draw their paths from a single per-process root
that is removed at interpreter exit, so repeated catalog builds, bench
loops, and test sessions no longer leak a tempdir per invocation.
Long-lived sessions can reclaim space between queries with
``clear_scratch()``.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_ROOT: str | None = None


def _root() -> str:
    global _ROOT
    if _ROOT is None:
        _ROOT = tempfile.mkdtemp(prefix="rtpmdp_scratch_")
        atexit.register(shutil.rmtree, _ROOT, ignore_errors=True)
    return _ROOT


def scratch_dir(prefix: str = "q_") -> str:
    """Fresh private directory under the session scratch root."""
    return tempfile.mkdtemp(prefix=prefix, dir=_root())


def clear_scratch() -> None:
    """Remove everything written so far (next scratch_dir() restarts)."""
    global _ROOT
    if _ROOT is not None:
        shutil.rmtree(_ROOT, ignore_errors=True)
        _ROOT = None
