"""Generate PLANS.md: the physical plan of every bench headline query.

Evidence artifact for plan review — shows pushed filters, pruned read
schemas, broadcast vs shuffle joins, partial aggregation, and
whole-stage codegen spans at sf0.1. Regenerate after plan changes:

    python tools/gen_plans_doc.py
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from real_time_predictive_maintenance_data_pipeline_spark.plans import all_queries
from real_time_predictive_maintenance_data_pipeline_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")

HEADER = """# PLANS — physical plans of the bench headline queries (auto-generated; do not edit)

`.explain("formatted")` at {sf_dir}. What to look for:

- **PushedFilters / ReadSchema** on parquet scans: predicates reach the
  scan; projected columns only (column pruning).
- **BroadcastHashJoin** for dim joins (region/nation/queries/bench-gram
  sets); **SortMergeJoin/ShuffledHashJoin** only where both sides are
  large.
- **HashAggregate pairs** (partial → final) around each Exchange:
  map-side combine before every shuffle.
- **WholeStageCodegen** spans covering the expression-heavy stages.
- **Exchange count**: each one is a shuffle — the plans here carry the
  minimum the semantics allow (see README "Scale design").

Regenerate with `python tools/gen_plans_doc.py`.
"""


def main() -> None:
    spark = get_spark("rtpmdp-plans")
    spark.sparkContext.setLogLevel("ERROR")
    queries = {n: q for n, q in all_queries().items() if q.bench}
    parts = [HEADER.format(sf_dir=SF_DIR)]
    for name in sorted(queries):
        q = queries[name]
        df = q.spark(spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue().rstrip()
        doc = (q.doc or "").strip().split("\n\n")[0]
        parts.append(f"\n## {name}\n\n{doc}\n\n```\n{plan}\n```\n")
    with open(OUT, "w") as f:
        f.write("".join(parts))
    print(f"wrote {OUT}: {len(queries)} plans")


if __name__ == "__main__":
    main()
