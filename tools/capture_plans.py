"""Capture ``explain("formatted")`` for headline (or named) queries.

Writes one file per query to the given output directory — the plan
evidence the optimization rounds commit under ``plans/r{N}/``.

Usage:
    python tools/capture_plans.py OUTDIR SUFFIX [name ...]

No names -> every bench-tagged query. SUFFIX is appended to the file
stem (e.g. ``before``/``after`` -> ``q1_pricing_summary_before.txt``).
Explain is driver-side only: nothing executes, but queries whose
BUILDERS run eager work (fits, first()) do pay that work.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from real_time_predictive_maintenance_data_pipeline_spark.plans import all_queries
from real_time_predictive_maintenance_data_pipeline_spark.session import get_spark


def main() -> int:
    outdir, suffix, *names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("rtpmdp-capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    picked = names or sorted(n for n, q in queries.items() if q.bench)
    for name in picked:
        df = queries[name].spark(spark, sf_dir)
        # Both forms use private PySpark internals (ADVICE r16); try the
        # queryExecution-native one first and fall back, so a pyspark
        # upgrade that drops either keeps this dev tool alive.
        try:
            jvm = df._sc._jvm
            mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
            plan = df._jdf.queryExecution().explainString(mode)
        except Exception:
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
