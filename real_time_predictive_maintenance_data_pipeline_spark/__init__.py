"""PySpark-native analytics engine with the query & data-processing
capabilities of akshatsriivastava/Real-Time-Predictive-Maintenance-Data-Pipeline.

Brand-new implementation on DataFrame / SQL / Catalyst / Structured
Streaming / MLlib — NOT a port of the reference's MQTT/Kinesis/Firehose
dataflow. See SURVEY.md for the full blueprint; reference citations in
docstrings point at /root/reference (read-only) for parity semantics only.

Layout
------
- ``session``    : tuned SparkSession factory (AQE, shuffle partitions, UTC)
- ``sources``    : batch parquet catalog + seeded telemetry generators
- ``functions``  : column-expression libraries (text, vectors, telemetry)
- ``operators``  : composed operators Spark lacks natively (as-of join,
                   dedup family, similarity search, top-k, multimodal)
- ``plans``      : the query catalog — every query registered with its
                   DuckDB oracle SQL for the driver correctness harness
- ``streaming``  : Structured Streaming parity pipelines (simulator,
                   ingest/quarantine, scoring)
- ``ml``         : MLlib RandomForest anomaly model (train/eval/score)
"""

__version__ = "0.1.0"
