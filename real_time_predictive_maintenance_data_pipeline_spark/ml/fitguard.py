"""Crisp empty-input errors for estimator fits.

MLlib estimators fail on zero-row input deep inside Scala with
messages that name nothing the caller wrote ("requirement failed:
Nothing has been added to this summarizer", "empty collection",
"No ratings available from MapPartitionsRDD[...]"). At 100 TB that
shape is routine — an upstream filter or partition-pruned scan drains
the frame — and the operator should say so in one line.

``fit_nonempty`` wraps ``estimator.fit`` and translates the failure to
a ``ValueError`` naming the operator, paying the emptiness check ONLY
on the failure path (no extra job when training data exists — the
happy path is byte-identical to a bare ``fit``). Found by the round-11
empty-fixture audit: every catalog query either runs clean on zero-row
tables or raises this error, pinned by
``tests/test_empty_inputs.py``.

``min_rows`` extends the same contract to the NEXT boundary up: a
frame with fewer rows than the estimator can train on (KMeans dies
with a bare ArrayIndexOutOfBoundsException when rows < k; PCA's
covariance needs >= 2 rows). The diagnosis is still failure-path-only
and bounded — ``df.limit(min_rows).count()`` stops scanning at
``min_rows`` rows, never counting the full frame. Found by the
round-11 ONE-row audit (``tests/test_one_row_inputs.py``).
"""

from __future__ import annotations


def fit_nonempty(estimator, df, what: str, min_rows: int = 1):
    """``estimator.fit(df)`` with a clear error when ``df`` has fewer
    than ``min_rows`` rows (default: empty)."""
    try:
        return estimator.fit(df)
    except Exception as exc:
        found = df.limit(min_rows).count()
        if found == 0:
            raise ValueError(
                f"{what}: cannot fit on an empty input frame — an "
                "upstream filter or source produced zero rows"
            ) from exc
        if found < min_rows:
            # The row count is a DIAGNOSIS, not a proven cause: any
            # failure on a small frame lands here (the r11 ADVICE
            # note — a dimension mismatch on a 1-row frame would be
            # relabeled). The original exception stays chained via
            # ``from exc``, and the message says which it is.
            raise ValueError(
                f"{what}: fit failed and the input has only {found} "
                f"row(s) — this estimator needs at least {min_rows} "
                "training rows (e.g. one per cluster/component), so an "
                "upstream filter leaving too few is the likely cause; "
                f"the original error is chained below ({exc!r:.120})"
            ) from exc
        raise
