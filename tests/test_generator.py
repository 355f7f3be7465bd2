"""Parity tests for the seeded telemetry generators (SURVEY §5.2 #2–3).

The reference draws unseeded, so assertions are distributional
(means / fractions / bounds within CI), never exact values — except
where the reference is exact by construction: the historical table has
EXACTLY 5 % anomaly labels (generate_historical_data.py:48-51, sampling
without replacement) and a 1-minute time grid (:38-40).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from real_time_predictive_maintenance_data_pipeline_spark.sources.generator import (
    ANOMALY_PROBABILITY,
    MACHINE_ID,
    TEMP_MAX,
    TEMP_MIN,
    VIB_MAX,
    VIB_MIN,
    historical_telemetry,
    stream_telemetry_batch,
)


class TestStreamBatch:
    def test_schema_and_ranges(self, spark):
        df = stream_telemetry_batch(spark, n=5000)
        assert [f.name for f in df.schema.fields] == [
            "machineId",
            "temperature",
            "vibration",
            "timestamp",
        ]
        row = df.agg(
            F.min("temperature").alias("tmin"),
            F.max("temperature").alias("tmax"),
            F.min("vibration").alias("vmin"),
            F.max("vibration").alias("vmax"),
            F.countDistinct("machineId").alias("nm"),
            F.min("machineId").alias("mid"),
        ).first()
        # Normal range U(65,70); anomalies add +15 → hard bounds [65, 85]
        assert TEMP_MIN <= row.tmin and row.tmax <= TEMP_MAX + 15.0
        assert VIB_MIN <= row.vmin and row.vmax <= VIB_MAX + 2.0
        assert row.nm == 1 and row.mid == MACHINE_ID  # IoTSimulator.java:34

    def test_anomaly_fraction_within_ci(self, spark):
        """Bernoulli(0.10) injection (IoTSimulator.java:49,154): observed
        fraction within 4σ binomial CI."""
        n = 20000
        df = stream_telemetry_batch(spark, n=n)
        n_anom = df.filter(F.col("temperature") > TEMP_MAX).count()
        p = ANOMALY_PROBABILITY
        sigma = math.sqrt(p * (1 - p) / n)
        assert abs(n_anom / n - p) < 4 * sigma

    def test_timestamps_one_per_second(self, spark):
        df = stream_telemetry_batch(spark, n=100, start_epoch_s=1_000)
        row = df.agg(
            F.min("timestamp").alias("lo"),
            F.max("timestamp").alias("hi"),
            F.countDistinct("timestamp").alias("n"),
        ).first()
        assert (row.lo, row.hi, row.n) == (1_000, 1_099, 100)


class TestHistorical:
    def test_exact_label_fraction(self, spark):
        """EXACTLY 5 % = 500 of 10 000 rows (generate_historical_data.py:48-51)."""
        df = historical_telemetry(spark)
        counts = dict(df.groupBy("is_anomaly").count().collect())
        assert counts == {0: 9500, 1: 500}

    def test_golden_shape(self, spark):
        """Golden-fixture contract (SURVEY §5.2 #3): 10 000 rows, 5 cols,
        vibration ≥ 0 (clip, :64)."""
        df = historical_telemetry(spark)
        assert df.columns == [
            "timestamp",
            "machineId",
            "temperature",
            "vibration",
            "is_anomaly",
        ]
        row = df.agg(
            F.count(F.lit(1)).alias("n"), F.min("vibration").alias("vmin")
        ).first()
        assert row.n == 10_000 and row.vmin >= 0.0

    def test_one_minute_grid_ending_at_anchor(self, spark):
        """1-min grid ending 'now' (anchor) — generate_historical_data.py:38-40."""
        df = historical_telemetry(spark, n=100)
        ts = df.select(F.unix_timestamp("timestamp").alias("s"))
        row = ts.agg(
            F.max("s").alias("hi"),
            F.min("s").alias("lo"),
            F.count(F.lit(1)).alias("n"),
        ).first()
        assert row.hi - row.lo == 99 * 60 and row.n == 100

    def test_class_distributions(self, spark):
        """Normals N(68,3)/N(1.8,0.3); anomalies U(80,100)/U(3,5)
        (generate_historical_data.py:54-61) — means within 5σ/range."""
        stats = {
            r.is_anomaly: r
            for r in historical_telemetry(spark)
            .groupBy("is_anomaly")
            .agg(
                F.avg("temperature").alias("t"),
                F.avg("vibration").alias("v"),
                F.min("temperature").alias("tmin"),
                F.max("temperature").alias("tmax"),
            )
            .collect()
        }
        assert abs(stats[0].t - 68.0) < 5 * 3.0 / math.sqrt(9500)
        assert abs(stats[0].v - 1.8) < 5 * 0.3 / math.sqrt(9500)
        assert 80.0 <= stats[1].tmin and stats[1].tmax <= 100.0
        assert abs(stats[1].t - 90.0) < 5.0  # U(80,100) mean
