"""ML quality gate (SURVEY §5.2 #4): MLlib RF on the seeded historical
table must reach held-out precision = recall = 1.00, matching the
reference's reported sklearn result (README.md:106-108). The classes
are separable by construction (normal temp ≤ ~77 °C at 3σ vs anomaly
≥ 80 °C), so the gate is robust to tree-RNG drift (SURVEY §7.4 #5).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_time_predictive_maintenance_data_pipeline_spark.ml.anomaly import (
    score,
    train,
    train_and_eval,
)
from real_time_predictive_maintenance_data_pipeline_spark.sources.generator import (
    historical_telemetry,
    stream_telemetry_batch,
)


@pytest.fixture(scope="module")
def hist(spark):
    return historical_telemetry(spark).cache()


def test_heldout_precision_recall_one(spark, hist):
    _, res = train_and_eval(hist)
    assert res.n_test > 1000
    assert res.precision == 1.0 and res.recall == 1.0  # README.md:107


def test_score_schema_and_alert_parity(spark, hist):
    """O26 output contract: input cols + int prediction ∈ {0,1}; scoring
    the live-stream distribution flags exactly the +15 °C anomalies
    (stream anomalies ≥ 80 °C sit inside the training anomaly range)."""
    model = train(hist)
    batch = stream_telemetry_batch(spark, n=2000)
    scored = score(model, batch)
    assert scored.columns == [*batch.columns, "prediction"]
    assert dict(scored.dtypes)["prediction"] == "int"
    # stream anomalies (temp > 80 °C after +15 delta) must all alert
    confusion = scored.groupBy(
        (F.col("temperature") > 80.0).alias("is_spike"), "prediction"
    ).count()
    rows = {(r.is_spike, r.prediction): r["count"] for r in confusion.collect()}
    assert rows.get((True, 0), 0) == 0  # no missed spikes
    assert rows.get((False, 1), 0) == 0  # no false alerts on U(65,70)


def test_model_save_load_roundtrip(spark, hist, tmp_path):
    """O22 parity: persist + reload (joblib dump/load →
    PipelineModel.save/load, realtime_inference.py:58-65)."""
    from pyspark.ml import PipelineModel

    model = train(hist)
    path = str(tmp_path / "rf_model")
    model.write().overwrite().save(path)
    reloaded = PipelineModel.load(path)
    batch = stream_telemetry_batch(spark, n=500)
    a = score(model, batch).agg(F.sum("prediction").alias("s")).first().s
    b = score(reloaded, batch).agg(F.sum("prediction").alias("s")).first().s
    assert a == b
