"""Batch table catalog over the driver-generated parquet fixtures.

Tables (see FIXTURES.md §B): region nation customer supplier part orders
lineitem events documents embeddings — one parquet file per table under
``{sf_dir}/{name}.parquet``.

Scale notes: at 100 TB these would be partitioned/bucketed datasets, not
single files; the loaders keep the path layout abstract so a cluster
deployment only swaps the path template. Predicate pushdown and column
pruning flow from the callers' ``select``/``filter`` — loaders never
materialize or cache.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Dimension tables small enough to broadcast at ANY realistic scale
#: (region=5 rows, nation=25 rows — fixed-cardinality in TPC-H-style data).
ALWAYS_BROADCAST = frozenset({"region", "nation"})


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet scan; schema comes from parquet footer metadata.

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark reads only as
    a nano-count long (`spark.sql.legacy.parquet.nanosAsLong`); we
    normalize it to a micro-precision TimestampType here — the same
    truncation DuckDB applies — so every downstream query sees a real
    timestamp column.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        # integer DIV keeps full precision (nanos exceed double's 2^53)
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for ``spark.sql`` use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
