"""Pre-verify the current driver window at sf0.01 — the DRIVER'S scale
factor, not the fast sf0.001 loop — before the driver runs.

The local mirror sweep (tests/test_oracle_parity.py) runs at sf0.001;
float-parity artifacts can be scale-dependent (a rounded aggregate only
lands on -0.0 / an exact .xxxx5 boundary for some data volume), and one
miss costs a round. This tool replays the exact window the driver will
check (first 50 names in catalog order) with the same comparison the
mirror uses, at sf0.01.

Usage: python tools/preverify_window.py [sf_dir] [n_window]
Exit 0 = all window queries pass (oracled: full value compare;
rows-only: runs with a stable schema). Prints one line per query.
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from real_time_predictive_maintenance_data_pipeline_spark.plans import all_queries
from real_time_predictive_maintenance_data_pipeline_spark.session import get_spark
from tests.oracle_harness import compare, duck_connection


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_window = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    queries = all_queries()
    window = list(queries)[:n_window]
    spark = get_spark("rtpmdp-preverify")
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connection(sf_dir)

    failed = []
    for name in window:
        q = queries[name]
        try:
            if q.oracle:
                compare(q.spark(spark, sf_dir), con, q.oracle)
                status = "hash-green"
            else:
                df = q.spark(spark, sf_dir)
                assert df.columns
                assert df.count() >= 0
                status = "rows-only ok"
        except Exception as e:  # noqa: BLE001 — report and continue
            status = f"FAIL: {e}"
            failed.append(name)
            traceback.print_exc()
        finally:
            if "caches" in q.tags:
                spark.catalog.clearCache()
        print(f"{name}: {status}", flush=True)

    print(f"\nwindow={len(window)} failed={len(failed)} {failed}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
