"""Measure the MQTT wire path — publish and subscribe legs over real
MQTT 3.1.1 QoS-1 frames on live TCP (r13).

The reference's transport design rate is 1 msg/s (a hard-coded sleep in
the publish loop, IoTSimulator.java:52,165) consumed by a
single-threaded per-message callback (realtime_inference.py:92-120).
This tool puts a measured number on the engine's replacement plumbing:

- publish leg: a batch DataFrame of wire JSON payloads published via
  ``publish_partitions`` (one blocking QoS-1 connection PER PARTITION,
  every message PUBACK-awaited before the next — the strict
  at-least-once shape, so per-connection throughput is one
  socket round trip per message and scales with partitions);
- end-to-end: broker forwards on the §4.7 wildcard filter
  ``factory/+/telemetry`` to a ``SubscriberBridge`` whose spool write +
  PUBACK gate each delivery; drain time = publish start → last payload
  durably in the spool.

Caveat, stated in SCALING.md too: the broker is the in-process
``MiniBroker`` (test/demo grade, one thread per session); the number is
a FLOOR demonstrating the engine's client plumbing — frame codec,
PUBACK round trips, spool fsync path — is 3-4 orders of magnitude above
the reference's design rate, not a production broker benchmark. Kafka
remains the production subscribe path (SURVEY §7.3).

Usage: python tools/bench_mqtt.py [--n 20000] [--partitions 1,8]
Prints a markdown table ready to paste into SCALING.md.
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_SUBMIT_OPTS", "-Dspark.ui.showConsoleProgress=false")

from real_time_predictive_maintenance_data_pipeline_spark.session import get_spark
from real_time_predictive_maintenance_data_pipeline_spark.sources.mqtt_wire import (
    MiniBroker,
    SubscriberBridge,
    publish_partitions,
)


def payload_df(spark, n: int, partitions: int, machines: int = 50):
    from pyspark.sql import functions as F

    from real_time_predictive_maintenance_data_pipeline_spark.functions.telemetry import (
        to_payload_json,
    )

    base = spark.range(n, numPartitions=partitions)
    mid = F.format_string("NC_Machine_%03d", (F.col("id") % machines).cast("int"))
    df = base.select(
        to_payload_json(
            mid,
            (F.col("id") % 20 + 65.0).cast("double"),
            (F.col("id") % 4 + 1.2).cast("double"),
            F.lit(1_700_000_000) + F.col("id"),
        ).alias("value"),
        F.format_string(
            "factory/NC_Machine_%03d/telemetry", (F.col("id") % machines).cast("int")
        ).alias("topic"),
    )
    return df


def run_once(spark, n: int, partitions: int) -> dict:
    df = payload_df(spark, n, partitions)
    df.persist().count()  # pre-materialize: time the wire, not the plan

    # Leg 1 — publish-only (no subscriber): the broker PUBACKs
    # immediately, so this isolates the CLIENT plumbing (frame codec +
    # one PUBACK round trip per message, one connection per partition).
    broker = MiniBroker()
    t0 = time.monotonic()
    publish_partitions(
        df, broker.host, broker.port, "factory/telemetry", topic_col="topic"
    )
    t_pub_only = time.monotonic() - t0
    broker.close()

    # Leg 2 — end-to-end through ONE wildcard subscriber: QoS-1 gates
    # every forward on the subscriber's spool write + PUBACK, so all
    # publisher connections funnel through one socket — the expected
    # single-consumer ceiling (the production fan-out path is Kafka
    # with partitioned consumption, SURVEY §7.3).
    broker = MiniBroker()
    with tempfile.TemporaryDirectory() as spool:
        bridge = SubscriberBridge(
            broker.host, broker.port, "factory/+/telemetry", spool,
            client_id=f"bench-sub-{partitions}",
        )
        t0 = time.monotonic()
        publish_partitions(
            df, broker.host, broker.port, "factory/telemetry", topic_col="topic"
        )
        deadline = time.monotonic() + 120
        while bridge.received < n and time.monotonic() < deadline:
            time.sleep(0.02)
        t_e2e = time.monotonic() - t0
        received = bridge.received
        bridge.close()
    broker.close()
    df.unpersist()
    return {
        "partitions": partitions,
        "n": n,
        "pub_only_s": t_pub_only,
        "pub_only_rate": n / t_pub_only,
        "e2e_s": t_e2e,
        "e2e_rate": received / t_e2e,
        "received": received,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20000)
    ap.add_argument("--partitions", default="1,8")
    args = ap.parse_args()

    spark = get_spark("bench-mqtt")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"n={args.n} QoS-1 messages, wildcard filter factory/+/telemetry\n")
    print("| publisher connections | publish-only msgs/s | "
          "e2e (1 subscriber, spooled) msgs/s | received |")
    print("|---|---|---|---|")
    for p in (int(x) for x in args.partitions.split(",")):
        r = run_once(spark, args.n, p)
        print(
            f"| {r['partitions']} | {r['pub_only_rate']:,.0f} | "
            f"{r['e2e_rate']:,.0f} | {r['received']:,} |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
