"""Text-analysis column expressions (tokenize, quality, lang-ID,
fingerprint). All pure built-in/higher-order expressions — JVM-side,
whole-stage-codegen friendly, zero Python UDFs in the hot path.

These power the `doc_*` catalog queries and are designed to stream over
100 TB of documents: every expression is per-row (embarrassingly
parallel), so cost scales linearly with no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Tiny deterministic stopword list used by quality scoring and lang-ID.
STOPWORDS = ("the", "a", "of", "and", "to")

FINGERPRINT_MOD = 1_000_000_007
FINGERPRINT_BASE = 131


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization (reference docs are space-separated soup)."""
    return F.split(text, " ")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def distinct_tokens(text: Column | str) -> Column:
    return F.array_distinct(tokens(text))


def has_min_tokens(text: Column | str, n: int) -> Column:
    """Cheap equivalent of ``size(tokens(text)) >= n`` for filters.

    A single-space split always yields (#spaces + 1) tokens — empty
    tokens included — so the predicate is a character count, not a
    split. Why it matters (r16): a ``size(split(...)) >= n`` filter is
    pushed below the ``spread`` repartition, where it evaluates the
    whole split (an interpreted higher-order tree) on the under-split
    scan partitions — serialized on 1-2 cores — and the split is then
    recomputed after the exchange. This form keeps the pre-exchange
    filter to string scans. NULL text yields NULL → dropped, exactly
    like size()'s -1/NULL under either sizeOfNull setting."""
    if n <= 1:
        return F.col(text).isNotNull() if isinstance(text, str) else text.isNotNull()
    if n == 2:
        return F.instr(text, " ") >= 1
    return F.length(text) - F.length(F.replace(text, F.lit(" "))) >= n - 1


def avg_token_len(text: Column | str) -> Column:
    """Mean token length, 4-decimal rounded."""
    words = tokens(text)
    total = F.aggregate(
        F.transform(words, lambda w: F.length(w)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return F.round(total.cast("double") / F.size(words), 4)


def stopword_count(text: Column | str, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    words = tokens(text)
    return F.size(F.filter(words, lambda w: w.isin(*stopwords)))


def quality_score(text: Column | str) -> Column:
    """Deterministic composite quality score in [0, 1]:
    0.5 * min(1, tokens/50) + 0.5 * distinct-token ratio.

    (A stand-in for Gopher-style quality heuristics — length and
    repetitiveness — expressible identically in ANSI SQL.)"""
    words = tokens(text)
    n = F.size(words).cast("double")
    len_part = F.least(F.lit(1.0), n / F.lit(50.0))
    distinct_ratio = F.size(F.array_distinct(words)).cast("double") / n
    return F.round(0.5 * len_part + 0.5 * distinct_ratio, 4)


def langid_guess(text: Column | str) -> Column:
    """Stopword-vote language heuristic: 'en' when any English stopword
    appears, else 'und' (undetermined). Deterministic, SQL-parity."""
    return F.when(stopword_count(text) >= 1, F.lit("en")).otherwise(F.lit("und"))


def word_code(w: Column) -> Column:
    """Per-word integer code for fingerprinting: first-char code * 31 + len.
    Engine-portable (ascii+length exist in Spark and ANSI-ish SQL alike)."""
    return (F.ascii(w) * 31 + F.length(w)).cast("long")


def fingerprint(text: Column | str) -> Column:
    """Order-sensitive polynomial rolling hash over the token stream:
    ``fp = fold(0, (acc, w) -> (acc*131 + code(w)) mod 1e9+7)``.

    Document fingerprinting for cheap exact/near-exact duplicate keys —
    unlike a bag-of-words hash this is sensitive to word order."""
    codes = F.transform(tokens(text), word_code)
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * FINGERPRINT_BASE + x) % FINGERPRINT_MOD,
    )


def word_bigrams(text: Column | str) -> Column:
    """Distinct word-bigram array ('w1 w2' strings) — the shared gram
    construction of benchmark decontamination (doc_decontaminate and
    the curation funnel must build IDENTICAL grams or their
    containment decisions desynchronize). NULL for < 2 words — without
    the guard, ``sequence(1, size-1)`` on a 1-token doc generates the
    DESCENDING [1, 0] and ``element_at(words, 0)`` is a hard error
    (index 0 always throws, ANSI or not); callers that pre-filter
    ``size(tokens(text)) >= 2`` see identical values either way."""
    words = tokens(text)
    return F.when(
        F.size(words) >= 2,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(words) - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at(words, i), F.element_at(words, i + 1)
                ),
            )
        ),
    )
