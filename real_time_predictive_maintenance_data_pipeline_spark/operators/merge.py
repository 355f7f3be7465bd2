"""Batch MERGE / upsert — the CDC-apply primitive, as a pure
DataFrame composition (no table format required).

``MERGE INTO target USING source ON key`` with
WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT semantics equals a full
outer join on the key with source-wins coalescing — exactly the plan
Delta/Iceberg MERGE compiles to before their file-rewrite step. This
engine targets plain parquet, so the operator produces the merged
RESULT; a caller owns the write.

Scale: both sides shuffle on the merge key (sort-merge join). A real
CDC batch is orders of magnitude smaller than the target, so Spark's
size estimate broadcasts it — turning the merge into a map-side pass
over the target. Skewed keys fall to AQE skew-join handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    key_cols: list[str],
) -> DataFrame:
    """Full-outer merge: matched keys take the source row, unmatched
    target rows persist, unmatched source rows insert. Column sets must
    match. Returns the merged relation with target's column order.
    """
    cols = target.columns
    if set(source.columns) != set(cols):
        raise ValueError("merge_upsert requires identical column sets")
    t = target.alias("t")
    # explicit row-exists marker: per-column COALESCE would silently
    # keep the target value wherever the source legitimately updates a
    # column TO null — whole-row source-wins is the MERGE contract
    s = source.withColumn("__src", F.lit(1)).alias("s")
    cond = [F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}")) for k in key_cols]
    joined = t.join(s, cond, "full_outer")
    matched = F.col("s.__src").isNotNull()
    return joined.select(
        *[
            F.when(matched, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
            for c in cols
        ]
    )
