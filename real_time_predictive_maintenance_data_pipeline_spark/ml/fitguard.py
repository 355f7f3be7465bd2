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
"""

from __future__ import annotations


def fit_nonempty(estimator, df, what: str):
    """``estimator.fit(df)`` with a clear error when ``df`` is empty."""
    try:
        return estimator.fit(df)
    except Exception as exc:
        if df.isEmpty():
            raise ValueError(
                f"{what}: cannot fit on an empty input frame — an "
                "upstream filter or source produced zero rows"
            ) from exc
        raise
