"""Per-query plan-build vs execution split for the bench headline set.

The r14 SCALING note measured the split inline; this commits the
instrument so optimization rounds can re-run it. Methodology matches
bench.py (sf0.001 plan warm, page-cache pre-read, noop sink,
clearCache between 'caches' queries), but times TWO phases per query:

- build: ``q.spark(spark, sf_dir)`` — Python plan construction plus
  the eager Catalyst analysis each DataFrame op runs driver-side
  (single-core, scales with calib py_sec);
- exec: the noop write of the pre-built frame (cluster-side).

Usage: python tools/profile_headline.py [repeat] [name ...]
Prints a markdown table, best-of-``repeat`` (default 3) per phase.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from real_time_predictive_maintenance_data_pipeline_spark.plans import all_queries
from real_time_predictive_maintenance_data_pipeline_spark.session import get_spark


def main() -> int:
    args = sys.argv[1:]
    repeat = int(args[0]) if args and args[0].isdigit() else 3
    names = args[1:] if args and args[0].isdigit() else args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("rtpmdp-profile-headline")
    spark.sparkContext.setLogLevel("ERROR")

    queries = {n: q for n, q in all_queries().items() if q.bench}
    if names:
        queries = {n: queries[n] for n in names}

    # warm: executor/codegen spin-up + per-plan JIT at the smallest SF
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if os.path.isdir(warm_dir):
        for name in sorted(queries):
            try:
                queries[name].spark(spark, warm_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception:
                pass
    if any(n.startswith("telemetry_") for n in queries):
        from real_time_predictive_maintenance_data_pipeline_spark.plans.telemetry import (
            _model,
        )

        _model(spark)
    for root, _, files in os.walk(sf_dir):
        for f in files:
            with open(os.path.join(root, f), "rb") as fh:
                while fh.read(8 << 20):
                    pass
    spark.catalog.clearCache()

    build: dict[str, float] = {}
    run: dict[str, float] = {}
    for _ in range(repeat):
        for name in sorted(queries):
            q = queries[name]
            t0 = time.perf_counter()
            df = q.spark(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            build[name] = min(build.get(name, 9e9), t1 - t0)
            run[name] = min(run.get(name, 9e9), t2 - t1)
            if "caches" in q.tags:
                spark.catalog.clearCache()

    print("| query | build s | exec s | total s |")
    print("|---|---|---|---|")
    for name in sorted(queries, key=lambda n: -(build[n] + run[n])):
        print(
            f"| {name} | {build[name]:.3f} | {run[name]:.3f} "
            f"| {build[name] + run[name]:.3f} |"
        )
    print(
        f"| TOTAL | {sum(build.values()):.3f} | {sum(run.values()):.3f} "
        f"| {sum(build.values()) + sum(run.values()):.3f} |"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
