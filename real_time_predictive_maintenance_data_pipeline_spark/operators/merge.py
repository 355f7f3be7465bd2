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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _assert_unique_keys(df: DataFrame, key_cols: list[str], op: str) -> DataFrame:
    """Attach a lazy uniqueness guard: the returned frame carries a
    ``__src`` marker column whose evaluation raises if ``df`` has more
    than one row for any key — matching Delta MERGE, which fails the
    batch on multiple source matches rather than silently fanning out
    every matched target row once per source row.

    Distributed-safe: a count window over the (small, CDC-sized) side,
    partitioned on the same key the join shuffles on, so no extra
    exchange; no driver action is spent on the check — it fires inside
    the merge job itself."""
    cnt = F.count(F.lit(1)).over(Window.partitionBy(*key_cols))
    guard = F.assert_true(
        cnt <= 1, F.lit(f"{op}: source/update batch has multiple rows for a key")
    )
    # assert_true yields NULL when it passes; fold it into the marker so
    # Catalyst cannot prune the check away.
    return df.withColumn("__src", F.when(guard.isNull(), F.lit(1)))


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    key_cols: list[str],
) -> DataFrame:
    """Full-outer merge: matched keys take the source row, unmatched
    target rows persist, unmatched source rows insert. Column sets must
    match. Returns the merged relation with target's column order.

    Precondition (enforced at execution time, Delta-MERGE style): the
    source has at most one row per key — duplicate source keys fail the
    batch instead of duplicating matched target rows.
    """
    cols = target.columns
    if set(source.columns) != set(cols):
        raise ValueError("merge_upsert requires identical column sets")
    t = target.alias("t")
    # explicit row-exists marker: per-column COALESCE would silently
    # keep the target value wherever the source legitimately updates a
    # column TO null — whole-row source-wins is the MERGE contract.
    # The marker doubles as the key-uniqueness guard.
    s = _assert_unique_keys(source, key_cols, "merge_upsert").alias("s")
    cond = [F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}")) for k in key_cols]
    joined = t.join(s, cond, "full_outer")
    matched = F.col("s.__src").isNotNull()
    return joined.select(
        *[
            F.when(matched, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
            for c in cols
        ]
    )


def scd2_apply(
    history: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    ts_col: str = "valid_from",
    end_col: str = "valid_to",
    broadcast: bool = False,
) -> DataFrame:
    """Slowly-Changing-Dimension Type 2 apply: historize an update
    batch against a versioned dimension.

    ``history`` carries (keys, attrs, valid_from, valid_to) with
    ``valid_to IS NULL`` marking current rows. ``updates`` carries
    (keys, attrs, valid_from) — the new version's effective timestamp.
    Result: current rows of updated keys are CLOSED (valid_to := the
    update's valid_from), update rows append as the new open version,
    and all other history passes through untouched.

    Precondition (enforced at execution time, Delta-MERGE style): the
    update batch has at most one row per key — duplicate update keys
    fail the batch instead of duplicating matched history rows.

    Scale: one shuffle of each side on the key; closed-row rewrite
    touches only matched current rows. A CDC-sized update batch gets
    broadcast by Spark's size estimate / AQE on its own; pass
    ``broadcast=True`` only to force the hint when the estimate is
    known-wrong — an unconditional hint would OOM executors on a large
    batch instead of degrading to a shuffle join. This is the plan a
    lakehouse SCD2 MERGE compiles to, minus the file rewrite.
    """
    cols = history.columns
    if set(updates.columns) | {end_col} != set(cols):
        raise ValueError("updates must carry history's columns minus end_col")
    upd_keyed = _assert_unique_keys(updates, key_cols, "scd2_apply").select(
        *[F.col(k).alias(f"__uk_{k}") for k in key_cols],
        F.col(ts_col).alias("__new_from"),
        F.col("__src"),
    )
    cond = [history[k].eqNullSafe(F.col(f"__uk_{k}")) for k in key_cols]
    is_current = history[end_col].isNull()
    joined = history.join(
        F.broadcast(upd_keyed) if broadcast else upd_keyed, cond, "left"
    )
    # match on the guard marker (not __new_from): referencing __src keeps
    # the uniqueness assert un-prunable, and it is non-null on exactly
    # the joined update rows.
    matched_current = is_current & F.col("__src").isNotNull()
    closed = joined.select(
        *[
            F.when(matched_current, F.col("__new_from")).otherwise(history[c]).alias(c)
            if c == end_col
            else history[c].alias(c)
            for c in cols
        ]
    )
    opened = updates.withColumn(end_col, F.lit(None).cast(history.schema[end_col].dataType)).select(*cols)
    return closed.unionByName(opened)
