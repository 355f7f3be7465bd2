"""Vector math over `array<float>` embedding columns as pure built-in
higher-order expressions (F.zip_with / F.aggregate / F.transform).

JVM-side and codegen-friendly: no Python UDF, no MLlib Vector
conversion, no serialization. Accumulation is sequential over the array
in both Spark and the DuckDB oracle, so 4-decimal rounds hash-match.

At 100 TB scale brute-force cosine is O(n·q·d) but embarrassingly
parallel (no shuffle until the top-k); the LSH path in
``operators.similarity`` trades recall for candidate pruning.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column | str) -> Column:
    return F.col(vec).cast("array<double>") if isinstance(vec, str) else vec.cast(
        "array<double>"
    )


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def sq_l2(a: Column, b: Column) -> Column:
    """Squared euclidean distance of two double arrays — the IVF
    coarse-assignment metric. Same sequential-fold shape as ``dot`` so
    it stays inside whole-stage codegen (no UDF, no MLlib Vector)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two double arrays.

    Raw IEEE expression: a zero-norm operand divides by zero, which
    under Spark 4's default ANSI mode raises DIVIDE_BY_ZERO. Callers
    over untrusted data must exclude degenerate vectors first — the
    ``operators.similarity`` family filters null/zero-norm rows before
    any division (see brute_force_topk)."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
