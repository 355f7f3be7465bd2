"""Adaptive input spreading for compute-heavy per-row operators.

A small parquet file lands in 1-2 scan partitions (row groups don't
split), which serializes every downstream higher-order expression onto
one core. ``spread`` repartitions ONLY when the scan yields fewer
partitions than the cluster has slots — the shuffle then moves raw rows
once and every downstream stage inherits the spread. At real scale the
scan already yields >= slots partitions and spread is a no-op, so no
shuffle is ever added to a 100 TB plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    cores = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < cores:
        return df.repartition(cores)
    return df
