"""Generate QUERIES.md — the operator/query inventory — from the live
registry, so the doc can never drift from the code. Run:

    python tools/gen_catalog_doc.py
"""

from __future__ import annotations

import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from real_time_predictive_maintenance_data_pipeline_spark.plans import all_queries


def main() -> None:
    qs = all_queries()
    by_tag: dict[str, list] = defaultdict(list)
    for q in qs.values():
        primary = q.tags[0] if q.tags else "misc"
        by_tag[primary].append(q)

    lines = [
        "# QUERIES — engine catalog (auto-generated; do not edit)",
        "",
        f"{len(qs)} queries; "
        f"{sum(1 for q in qs.values() if q.oracle)} DuckDB-oracle-checked, "
        f"{sum(1 for q in qs.values() if not q.oracle)} rows-only "
        "(non-SQL-expressible: LSH/KMeans/ML/iterative — accuracy pinned in tests/), "
        f"{sum(1 for q in qs.values() if q.bench)} in the bench headline set.",
        "",
        "Regenerate with `python tools/gen_catalog_doc.py`.",
        "",
    ]
    for tag in sorted(by_tag):
        lines.append(f"## {tag}")
        lines.append("")
        lines.append("| query | oracle | bench | doc |")
        lines.append("|---|---|---|---|")
        for q in sorted(by_tag[tag], key=lambda q: q.name):
            doc = " ".join((q.doc or "").split())
            if len(doc) > 140:
                doc = doc[:137] + "..."
            lines.append(
                f"| `{q.name}` | {'✓' if q.oracle else 'rows-only'} "
                f"| {'✓' if q.bench else ''} | {doc} |"
            )
        lines.append("")

    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "QUERIES.md")
    with open(out, "w") as fh:
        fh.write("\n".join(lines))
    print(f"wrote {out}: {len(qs)} queries")


if __name__ == "__main__":
    main()
