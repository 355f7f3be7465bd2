"""SparkSession factory with scale-oriented defaults.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32 threads),
but every knob here is chosen for the 100 TB / 1000-executor target:

- AQE on (runtime shuffle-partition coalescing, skew-join splitting,
  dynamic broadcast-join demotion/promotion).
- ``spark.sql.shuffle.partitions`` sized for the local harness; on a real
  cluster AQE's coalescing makes the initial number a ceiling, not a tune.
- Arrow on for every pandas interchange (Pandas UDFs, ``mapInPandas``).
- Session timezone pinned UTC — the reference's historical table is
  tz-aware UTC (generate_historical_data.py:38-40) and its stream carries
  Unix seconds (IoTSimulator.java:182); UTC keeps both unambiguous.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def spark_confs() -> dict[str, str]:
    """Engine configuration, applied to the builder or an existing session."""
    return {
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.shuffle.partitions": os.environ.get(
            "SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"
        ),
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        # Parquet scans: vectorized reader + pushdown are defaults; keep
        # files per partition large enough that sf0.1 doesn't over-split.
        "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
        "spark.sql.parquet.filterPushdown": "true",
        # events.parquet carries TIMESTAMP(NANOS) which Spark's reader
        # rejects; read as long (nanos) and convert in the loader.
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        # Let custom Python data sources (sources/pysource.py) receive
        # pushed filters; off by default in Spark 4.1.
        "spark.sql.python.filterPushdown.enabled": "true",
    }


def streaming_state_confs() -> dict[str, str]:
    """Opt-in state-store configuration for LARGE streaming state.

    The default HDFS-backed state store keeps every key in executor
    heap — fine for the parity pipeline (one machine ≈ one key), fatal
    for 100 TB-scale keyed state (billions of dedup keys / sessions).
    RocksDB spills state to local disk with incremental checkpointing;
    changelog checkpointing ships only per-batch deltas. Apply via
    ``spark.conf.set`` before starting the stateful query (runtime
    settable), or merge into the builder."""
    return {
        "spark.sql.streaming.stateStore.providerClass": (
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
        ),
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": "true",
        # Single-threaded BLAS in Python workers (r15): Spark TASKS are
        # the parallelism unit — numpy inside a pandas UDF otherwise
        # spawns an all-core OpenBLAS/OMP pool PER concurrent worker
        # (measured: the 16-way parallel PQ subspace fit inflated 6 s of
        # math to ~300 s of thread-thrash on local[32]). Same rule any
        # multi-core executor needs in production.
        "spark.executorEnv.OMP_NUM_THREADS": "1",
        "spark.executorEnv.OPENBLAS_NUM_THREADS": "1",
        "spark.executorEnv.MKL_NUM_THREADS": "1",
    }


def get_spark(app_name: str = "rtpmdp-engine", cpus: str | None = None) -> SparkSession:
    """Build (or fetch) the tuned local session.

    The driver may hand us its own session; query functions never call this —
    only tests and ``bench.py`` do.
    """
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS", "32")
    # Local-mode twin of the executorEnv BLAS caps in spark_confs():
    # python workers fork from the in-process JVM, which inherits THIS
    # process's env — executorEnv alone doesn't reach an already-running
    # local executor. Must be set before any worker imports numpy.
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in spark_confs().items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def apply_confs(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine confs to a session we didn't build
    (e.g. the driver's). Static confs (driver memory) are skipped."""
    for k, v in spark_confs().items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on a running session — keep going
    _ship_package(spark)
    return spark


def _ship_package(spark: SparkSession) -> None:
    """Make this package importable on executor Python workers.

    Pandas-UDF closures reference module functions, which cloudpickle
    serializes *by reference* — workers must import the module. A driver
    that put the repo on its own ``sys.path`` (not ``PYTHONPATH``) runs
    fine until the first UDF task, then workers raise
    ``ModuleNotFoundError``. Shipping a zip via ``addPyFile`` fixes this
    everywhere: local mode, a real cluster, or a driver running from any
    cwd. Idempotent per JVM (re-adding the same path is a no-op warn).
    """
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    pkg_name = os.path.basename(pkg_dir)
    zip_path = os.path.join(
        spark.sparkContext._temp_dir
        if hasattr(spark.sparkContext, "_temp_dir")
        else "/tmp",
        f"{pkg_name}.zip",
    )
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w") as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for fn in files:
                    if fn.endswith(".py"):
                        full = os.path.join(root, fn)
                        rel = os.path.join(
                            pkg_name, os.path.relpath(full, pkg_dir)
                        )
                        zf.write(full, rel)
    try:
        spark.sparkContext.addPyFile(zip_path)
    except Exception:
        pass  # already added in this JVM
