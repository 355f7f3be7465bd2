"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``real_time_predictive_maintenance_data_pipeline_spark``
package; this module only adapts the registry to the driver's API.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from real_time_predictive_maintenance_data_pipeline_spark.plans import all_queries
from real_time_predictive_maintenance_data_pipeline_spark.session import apply_confs


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    apply_confs(spark)
    q = all_queries()["q1_pricing_summary"]
    return q.spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(q):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            apply_confs(spark)
            return q.spark(spark, sf_dir)

        run.__name__ = q.name
        return run

    return {name: wrap(q) for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query; omitted for non-SQL ops
    (LSH, ML scoring, engine-generated telemetry) → rows-only check."""
    return {name: q.oracle for name, q in all_queries().items() if q.oracle}
