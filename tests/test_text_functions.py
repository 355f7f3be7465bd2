"""Unit gates for functions/text.py column expressions.

``has_min_tokens`` is the r16 filter-pushdown rewrite: the doc_* /
dedup filters rely on it being EXACTLY ``size(tokens(text)) >= n``.
That equivalence silently breaks if ``tokens()`` ever switches from the
single-space split to a regex/whitespace split (ADVICE r16) — this test
makes such a change fail loudly instead.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_predictive_maintenance_data_pipeline_spark.functions.text import (
    has_min_tokens,
    tokens,
)

# every shape that distinguishes the split-size and char-count forms:
# NULL, empty, whitespace-only (leading/trailing/multi-space produce
# EMPTY tokens that size() counts), tabs/newlines (NOT delimiters for a
# single-space split), and ordinary words
_CASES = [
    None,
    "",
    " ",
    "  ",
    "a",
    "a ",
    " a",
    "a b",
    "a  b",
    " a b ",
    "a b c",
    "a\tb",
    "a\nb",
    "\t",
    "word",
    "two words  three   spaces",
]


def test_has_min_tokens_equals_size_of_tokens(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_CASES)], "id long, text string"
    )
    for n in (1, 2, 3, 5, 10):
        want = {
            r.id
            for r in df.filter(F.size(tokens("text")) >= n).collect()
        }
        got = {
            r.id for r in df.filter(has_min_tokens("text", n)).collect()
        }
        assert got == want, (n, sorted(got), sorted(want))
