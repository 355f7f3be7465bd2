"""Run the three-leg lake boundary validation end-to-end, locally:

    python examples/validate_lake.py [sf_dir] [out_dir]

The ingestion step a 100 TB deployment runs ONCE per table so the
other ~300 catalog queries never carry defensive guards (the same
philosophy as the streaming path's PERMISSIVE-parse quarantine):

  1. non-finite measures   NaN/±Inf in any scalar-double or
                           float-array column (ANSI CAST_OVERFLOW
                           kills ~50 queries otherwise)
  2. temporal plausibility timestamps outside [1970, 2100) (a 1900/
                           9999 row melts gap-bounded sequence
                           generators; >2262 overflows Arrow ns in
                           every pandas path)
  3. vector dimension      embeddings whose length != the model's dim
                           (MLlib/PQ die; dot products go silently
                           wrong)

For each fixture table the script derives the validation surface from
the SCHEMA (``measure_columns`` / ``temporal_columns``), applies ONE
``finite_split``, writes the clean side under ``out_dir/lake/`` and
the rejects under ``out_dir/quarantine/`` (with a ``_reason`` tag per
leg), and prints the per-table disposition report — the same numbers
the catalog's ``lake_*_quarantine`` entries compute.

To see it actually catch something, poison the input first:
``python -m tests.poison /root/testdata/sf0.001 /tmp/dirty`` then run
against ``/tmp/dirty``.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from real_time_predictive_maintenance_data_pipeline_spark.operators.quarantine import (
    measure_columns,
    nonfinite_pred,
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


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else tempfile.mkdtemp(prefix="validated_lake_")
    )
    spark = get_spark("validate-lake")
    spark.sparkContext.setLogLevel("ERROR")
    lo, hi = PLAUSIBLE_TS_WINDOW

    print(f"validating {sf_dir} -> {out_dir}")
    print(f"{'table':<12} {'rows':>8} {'clean':>8} {'nonfinite':>10} "
          f"{'temporal':>9} {'dim':>6}")
    total_bad = 0
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        scalars, arrays = measure_columns(df)
        tcols = temporal_columns(df)
        dims = {"embedding": EMBEDDING_DIM} if name == "embeddings" else {}
        legs = {
            "nonfinite": nonfinite_pred(scalars, arrays),
            "temporal": nonfinite_pred((), ts_bounds={c: (lo, hi) for c in tcols}),
            "dim": nonfinite_pred((), array_dims=dims),
        }
        reason = (
            F.when(legs["nonfinite"], F.lit("nonfinite"))
            .when(legs["temporal"], F.lit("temporal"))
            .when(legs["dim"], F.lit("dim"))
        )
        # ONE pass over the source (r12 ADVICE): persist the tagged
        # frame so the clean/quarantine writes share a single scan,
        # then derive every report number from the WRITTEN outputs —
        # parquet counts are footer reads, so nothing rescans the
        # (possibly remote) source.
        tagged = df.withColumn("_reason", reason).persist()
        lake_path = os.path.join(out_dir, "lake", f"{name}.parquet")
        quar_path = os.path.join(out_dir, "quarantine", f"{name}.parquet")
        tagged.filter(F.col("_reason").isNull()).drop("_reason").write.mode(
            "overwrite"
        ).parquet(lake_path)
        # quarantined rows keep their reason tag for triage
        tagged.filter(F.col("_reason").isNotNull()).write.mode(
            "overwrite"
        ).parquet(quar_path)
        tagged.unpersist()
        counts = {
            r["_reason"]: r["count"]
            for r in spark.read.parquet(quar_path).groupBy("_reason").count().collect()
        }
        n_bad = sum(counts.values())
        n = spark.read.parquet(lake_path).count() + n_bad
        total_bad += n_bad
        print(
            f"{name:<12} {n:>8} {n - n_bad:>8} "
            f"{counts.get('nonfinite', 0):>10} "
            f"{counts.get('temporal', 0):>9} {counts.get('dim', 0):>6}"
        )
    print(f"quarantined total: {total_bad}")
    print(f"validated lake written: {os.path.join(out_dir, 'lake')}")
    spark.stop()


if __name__ == "__main__":
    main()
