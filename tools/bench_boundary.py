"""Measure the lake boundary's scan cost — the number behind the
"one scan per table at 100 TB" claim (r12 verdict item 7).

For each requested SF dir this times, per table:

- ``combined``: ONE ``finite_split`` quarantine pass with all three
  legs (non-finite + temporal + dimension) — what
  ``examples/validate_lake.py`` and a real ingestion step run;
- each individual leg, so the marginal cost of adding a leg is visible.

Each timing is a full count() of both split sides (clean + bad) — an
upper bound on the real cost, since an ingestion write consumes each
row once. Best-of-3 per cell, page cache warmed by a throwaway pass.
Prints a markdown table (rows/s = table rows / combined wall) ready to
paste into SCALING.md.

Usage: python tools/bench_boundary.py [sf_dir ...]
       (default: /root/testdata/sf0.01 /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from real_time_predictive_maintenance_data_pipeline_spark.operators.quarantine import (
    finite_split,
    measure_columns,
    temporal_columns,
)
from real_time_predictive_maintenance_data_pipeline_spark.plans.governance import (
    EMBEDDING_DIM,
    PLAUSIBLE_TS_WINDOW,
)
from real_time_predictive_maintenance_data_pipeline_spark.session import get_spark
from real_time_predictive_maintenance_data_pipeline_spark.sources.tables import (
    TABLES,
    load_table,
)


def _legs(df, name):
    scalars, arrays = measure_columns(df)
    tcols = temporal_columns(df)
    lo, hi = PLAUSIBLE_TS_WINDOW
    ts = {c: (lo, hi) for c in tcols}
    dims = {"embedding": EMBEDDING_DIM} if name == "embeddings" else {}
    return {
        "nonfinite": dict(cols=scalars, array_cols=arrays),
        "temporal": dict(cols=(), ts_bounds=ts),
        "dim": dict(cols=(), array_dims=dims),
        "combined": dict(
            cols=scalars, array_cols=arrays, ts_bounds=ts, array_dims=dims
        ),
    }


def _time_split(df, kwargs) -> float:
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        clean, bad = finite_split(df, **kwargs)
        clean.count()
        bad.count()
        best = min(best, time.perf_counter() - t0)
    return best


def _time_replay(df) -> float:
    """The replay-dedup leg (lake_replay_audit): unlike the predicate
    legs this is a full-row distinct() — one real shuffle per table,
    the same shuffle the boundary dedup WRITE performs."""
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        df.distinct().count()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    spark = get_spark("bench-boundary")
    spark.sparkContext.setLogLevel("ERROR")
    for sf_dir in sf_dirs:
        print(f"\n### boundary scan cost at {sf_dir}\n")
        print("| table | rows | nonfinite s | temporal s | dim s | combined s | replay-distinct s | rows/s (combined) |")
        print("|---|---|---|---|---|---|---|---|")
        for name in TABLES:
            df = load_table(spark, sf_dir, name)
            n = df.count()  # also warms the page cache
            legs = _legs(df, name)
            cells = {k: _time_split(df, kw) for k, kw in legs.items()}
            replay = _time_replay(df)
            rps = n / cells["combined"] if cells["combined"] else float("inf")
            print(
                f"| {name} | {n} | {cells['nonfinite']:.3f} | "
                f"{cells['temporal']:.3f} | {cells['dim']:.3f} | "
                f"{cells['combined']:.3f} | {replay:.3f} | {rps:,.0f} |"
            )
    spark.stop()


if __name__ == "__main__":
    main()
