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


def test_artifact_roundtrip_and_batch_udf_scoring(spark, hist, tmp_path):
    """O22/O26 artifact contract: save/load roundtrip (joblib when
    installed, else pickle) + predict_batch_udf scoring agrees with the
    MLlib RF on the separable region (both must realize the same
    decision function there — the reference reports 1.00/1.00)."""
    from real_time_predictive_maintenance_data_pipeline_spark.ml.anomaly import score, train
    from real_time_predictive_maintenance_data_pipeline_spark.ml.artifact import (
        load_artifact,
        save_artifact,
        score_with_artifact,
        train_reference_artifact,
    )

    art = train_reference_artifact(hist)
    path = str(tmp_path / "rf_artifact.bin")
    save_artifact(art, path)
    import numpy as np

    loaded = load_artifact(path)
    X = np.array([[68.0, 1.8], [90.0, 4.0], [70.0, 1.5], [85.0, 3.5]])
    assert loaded.predict(X).tolist() == art.predict(X).tolist() == [0, 1, 0, 1]

    # separable region only: normal ≤ 3σ bounds, anomalies ≥ generator
    # spike floors — inside it EVERY competent model agrees, outside it
    # model-specific boundaries legitimately differ (SURVEY §7.4 #5).
    from real_time_predictive_maintenance_data_pipeline_spark.sources.generator import (
        stream_telemetry_batch,
    )

    s = stream_telemetry_batch(spark, n=5_000)
    sep = s.filter(
        ((F.col("temperature") <= 77.0) & (F.col("vibration") <= 2.7))
        | ((F.col("temperature") >= 80.0) | (F.col("vibration") >= 3.0))
    )
    mllib = score(train(hist), sep).select("timestamp", "prediction")
    artifact = score_with_artifact(sep, path).select(
        "timestamp", F.col("prediction").alias("prediction_art")
    )
    joined = mllib.join(artifact, "timestamp")
    n = joined.count()
    n_disagree = joined.filter(F.col("prediction") != F.col("prediction_art")).count()
    assert n > 3000  # the separable region covers most of the batch
    assert n_disagree == 0


def test_quality_classifier_accuracy_floor(spark):
    """ml_quality_classifier gate: the distilled student must reproduce
    the teacher heuristic's keep decision on held-out docs (the stat
    features make the teacher signal linearly recoverable)."""
    from real_time_predictive_maintenance_data_pipeline_spark.plans import all_queries

    rows = (
        all_queries()["ml_quality_classifier"]
        .spark(spark, "/root/testdata/sf0.01")
        .collect()
    )
    n_test = sum(r.n for r in rows)
    n_correct = sum(r.n for r in rows if r.label == r.prediction)
    assert n_test > 0
    assert n_correct / n_test >= 0.9, (n_correct, n_test)


def test_als_recommendations_contract(spark):
    """ml_als_recommend gate: exactly 3 recs per selected user, rank
    follows descending score, and every recommended part exists in the
    part table."""
    from real_time_predictive_maintenance_data_pipeline_spark.plans import all_queries

    sf = "/root/testdata/sf0.01"
    rows = all_queries()["ml_als_recommend"].spark(spark, sf).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user, []).append(r)
    assert len(by_user) == 20
    parts = {
        p.p_partkey
        for p in spark.read.parquet(f"{sf}/part.parquet")
        .select("p_partkey")
        .collect()
    }
    for user, rs in by_user.items():
        rs.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in rs] == [1, 2, 3]
        scores = [r.score for r in rs]
        assert scores == sorted(scores, reverse=True)
        for r in rs:
            assert r.part in parts


def test_survival_aft_fit_and_censoring(spark):
    """ml_survival_aft gates: the AFT fit must produce positive
    median time-to-failure predictions; censored machines (no error
    observed) are included in training rather than dropped; observed
    failure times are non-negative."""
    from real_time_predictive_maintenance_data_pipeline_spark.plans import all_queries

    rows = (
        all_queries()["ml_survival_aft"]
        .spark(spark, "/root/testdata/sf0.01")
        .collect()
    )
    assert len(rows) == 15
    for r in rows:
        assert r.median_ttf_h > 0
        assert r.observed_h >= 0
        assert r.failed in (0, 1)
    # censoring must actually flow through: the corpus contains both
    # failed and censored machines and BOTH classes survive into the
    # output (a silent drop of censored rows would pass every per-row
    # assertion above)
    classes = {r.failed for r in rows}
    assert classes == {0, 1}, classes


def test_survival_aft_point_in_time_no_leakage(spark, tmp_path):
    """Features must be invariant to events OUTSIDE each machine's
    observation window (after the failure / past the 24 h horizon).
    Append a burst of far-future extreme-value events to every machine
    and assert the AFT output is bit-identical — if any feature read
    future data (the pre-round-4 leak: rate/avg over full history),
    the trained coefficients and predictions would shift."""
    from pyspark.sql import functions as F

    from real_time_predictive_maintenance_data_pipeline_spark.plans import all_queries

    sf = "/root/testdata/sf0.001"
    q = all_queries()["ml_survival_aft"].spark

    ev = spark.read.parquet(f"{sf}/events.parquet")
    future = (
        ev.groupBy("user_id")
        .agg(F.max("ts").alias("mx"), F.max("event_id").alias("mid"))
        .select(
            (F.col("mid") + 10_000_000).alias("event_id"),
            # 10 days past everything: beyond any 24 h horizon and any
            # observed failure time
            F.timestamp_seconds(
                F.unix_timestamp("mx") + 10 * 86400
            ).alias("ts"),
            "user_id",
            F.lit("click").alias("event_type"),
            F.lit(999999.0).alias("value"),
            F.lit(None).cast("string").alias("props"),
        )
    )
    ev.unionByName(future).coalesce(1).write.parquet(
        str(tmp_path / "events.parquet")
    )

    base = sorted(tuple(r) for r in q(spark, sf).collect())
    poisoned = sorted(tuple(r) for r in q(spark, str(tmp_path)).collect())
    assert base == poisoned
