"""Measure skew-join mitigation — the number behind ``salted_join``
(operators/skew.py) and the session's AQE skew-split default (r13).

Scenario: a probe table where ONE key owns ``--hot-frac`` of all rows
(default 50 %) joined to a build table too big to broadcast (the
broadcast threshold is forced to -1 — with a broadcastable dim, skew
is a non-problem and none of this machinery is needed). Variants:

- ``plain, AQE off``     — the naive shuffle join: one task gets half
  the probe rows; the straggler IS the query.
- ``plain, AQE skew``    — session default (`spark_confs`): AQE splits
  the oversized partition at runtime (sort-merge only). NOTE: at this
  tool's local scale the hot partition (~64 MB) sits UNDER AQE's
  default skew threshold (256 MB AND 5× median), so the default-config
  variant measures AQE correctly declining to act — the realistic
  cluster case is the next variant.
- ``plain, AQE skew tuned`` — skew threshold lowered (16 MB advisory /
  threshold) so the split actually fires on the local hot partition —
  the proxy for a cluster partition genuinely over the default 256 MB.
- ``salted, AQE off``    — explicit rewrite: probe salted into
  ``--salts`` shuffle keys, build exploded ``--salts``×.

Each variant computes the same groupBy(key) aggregate over the joined
rows; wall time is best-of-2. Local[32] shows skew as straggler tasks
on one host; on a 1000-executor cluster the same plan shape idles 999
executors, so the RATIO between variants is the transferable number,
not the absolute seconds.

Usage: python tools/bench_skew.py [--rows 8000000] [--keys 100000]
         [--hot-frac 0.5] [--salts 16]
Prints a markdown table ready to paste into SCALING.md.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault(
    "SPARK_SUBMIT_OPTS", "-Dspark.ui.showConsoleProgress=false"
)

from real_time_predictive_maintenance_data_pipeline_spark.session import get_spark


def build_frames(spark, rows: int, keys: int, hot_frac: float):
    from pyspark.sql import functions as F

    probe = spark.range(rows, numPartitions=32).select(
        F.when(F.rand(7) < hot_frac, F.lit(0))
        .otherwise(F.pmod(F.col("id"), F.lit(keys)))
        .cast("long")
        .alias("k"),
        (F.rand(11) * 100.0).alias("v"),
    )
    build = spark.range(keys).select(
        F.col("id").alias("k"),
        F.concat(F.lit("grp_"), (F.col("id") % 40).cast("string")).alias("grp"),
    )
    return probe, build


def timed(df) -> float:
    t0 = time.monotonic()
    df.groupBy("grp").agg(
        {"v": "sum", "*": "count"}
    ).collect()
    return time.monotonic() - t0


def run_variant(
    spark, probe, build, salted: bool, aqe_skew: bool, salts: int,
    tuned: bool = False,
) -> float:
    from real_time_predictive_maintenance_data_pipeline_spark.operators.skew import (
        salted_join,
    )

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(aqe_skew).lower())
    # Tuned = make the local ~64 MB hot partition cross the skew bar the
    # way a >256 MB partition does on a real cluster.
    thresh = "16MB" if tuned else "256MB"
    advisory = "16MB" if tuned else "64MB"
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", thresh
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", advisory)
    # Keep AQE itself on in every variant (session default); only the
    # skew-split rule toggles, so the comparison isolates it.
    j = (
        salted_join(probe, build, on="k", n_salts=salts)
        if salted
        else probe.join(build, "k")
    )
    best = min(timed(j) for _ in range(2))
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=8_000_000)
    ap.add_argument("--keys", type=int, default=100_000)
    ap.add_argument("--hot-frac", type=float, default=0.5)
    ap.add_argument("--salts", type=int, default=16)
    args = ap.parse_args()

    spark = get_spark("bench-skew")
    spark.sparkContext.setLogLevel("ERROR")
    # Force the shuffle join: a broadcastable build side makes skew moot.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    probe, build = build_frames(spark, args.rows, args.keys, args.hot_frac)
    probe.persist().count()
    build.persist().count()

    rows = [
        ("plain, AQE skew OFF", False, False, False),
        ("plain, AQE skew ON (default 256MB threshold: declines)", False, True, False),
        ("plain, AQE skew ON (16MB threshold: fires)", False, True, True),
        (f"salted_join n_salts={args.salts}, AQE skew OFF", True, False, False),
    ]
    print(
        f"probe={args.rows:,} rows ({args.hot_frac:.0%} on one key), "
        f"build={args.keys:,} keys, broadcast disabled, best of 2\n"
    )
    print("| variant | wall s |")
    print("|---|---|")
    base = None
    for label, salted, aqe, tuned in rows:
        t = run_variant(spark, probe, build, salted, aqe, args.salts, tuned)
        if base is None:
            base = t
        print(f"| {label} | {t:.2f} ({base / t:.2f}× vs naive) |")
    spark.stop()


if __name__ == "__main__":
    main()
