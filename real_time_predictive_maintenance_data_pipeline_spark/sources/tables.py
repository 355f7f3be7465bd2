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


#: In-process memo of INFERRED PARQUET SCHEMAS (metadata only — never
#: rows, never results). ``spark.read.parquet`` without a schema runs
#: footer inference + file-index construction on every call — measured
#: ~165 ms per load vs ~30 ms with an explicit schema, and one bench
#: pass issues ~37 loads (lineitem alone is loaded by ~10 headline
#: queries), so re-inference was ~5 s of pure driver-side plan-build
#: per pass. A real deployment gets this for free from the catalog
#: (metastore / Iceberg manifests — the table schema is metadata, not
#: data); this memo is the path-based twin. Keyed by (path, mtime_ns,
#: size, nanosAsLong-conf): a regenerated fixture re-infers, and
#: sessions whose legacy-nanos conf differs never share an entry (that
#: conf changes what TIMESTAMP(NANOS) infers to). Dies with the
#: process — nothing is persisted across runs.
_SCHEMA_MEMO: dict[tuple, object] = {}

_NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet scan; schema comes from parquet footer metadata
    (inferred once per file version per process — see _SCHEMA_MEMO).

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark reads only as
    a nano-count long (`spark.sql.legacy.parquet.nanosAsLong`); we
    normalize it to a micro-precision TimestampType here — the same
    truncation DuckDB applies — so every downstream query sees a real
    timestamp column.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    path = table_path(sf_dir, name)
    try:
        st = os.stat(path)
        key = (path, st.st_mtime_ns, st.st_size, spark.conf.get(_NANOS_CONF, "false"))
        if os.path.isdir(path):
            # Directory-layout table (r17 hardening, ADVICE r16): an
            # in-place part-file rewrite need not touch the directory's
            # own mtime/size, so fold every child's (name, mtime, size)
            # into the key — a stale schema can then never be served
            # for a re-written part file. Fixtures are single files
            # today; this keeps the memo correct if that ever changes.
            key = key + tuple(
                sorted(
                    (e.name, e.stat().st_mtime_ns, e.stat().st_size)
                    for e in os.scandir(path)
                )
            )
    except OSError:
        key = None  # let spark.read surface the missing-path error
    schema = _SCHEMA_MEMO.get(key) if key is not None else None
    if schema is None:
        df = spark.read.parquet(path)
        if key is not None:
            _SCHEMA_MEMO[key] = df.schema
    else:
        df = spark.read.schema(schema).parquet(path)
    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        # integer DIV keeps full precision (nanos exceed double's 2^53)
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for ``spark.sql`` use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
