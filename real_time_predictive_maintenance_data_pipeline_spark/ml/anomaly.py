"""MLlib anomaly model — the engine's Phase-4/5 parity (O22, O25, O26,
O28; README.md:91-112 describes the reference's sklearn notebook flow).

Reference contract: features = (temperature, vibration), target =
is_anomaly, RandomForest, held-out precision = recall = 1.00 (classes
separable by construction: normal temp ≤ ~77 °C at 3σ vs anomaly ≥ 80).

Engine differences (by design, SURVEY §7.4 #5): distributed MLlib
instead of single-process sklearn; quality gate is on held-out metrics,
not per-row prediction equality. Scoring is vectorized
``model.transform`` over micro-batches — not the reference's per-message
callback (realtime_inference.py:92-139) — the single biggest
architectural win at scale.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import RandomForestClassifier
from pyspark.ml.feature import VectorAssembler
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_COLS = ("temperature", "vibration")  # realtime_inference.py:68-78
LABEL_COL = "is_anomaly"


def build_pipeline(seed: int = 42) -> Pipeline:
    """VectorAssembler → RandomForestClassifier (O25 + O28)."""
    assembler = VectorAssembler(inputCols=list(FEATURE_COLS), outputCol="features")
    rf = RandomForestClassifier(
        featuresCol="features",
        labelCol=LABEL_COL,
        numTrees=50,
        maxDepth=8,
        seed=seed,
    )
    return Pipeline(stages=[assembler, rf])


@dataclass
class EvalResult:
    precision: float
    recall: float
    n_test: int


def _strip_summary(model: PipelineModel) -> PipelineModel:
    """Return a copy without the RF training summary.

    The summary pins the fitting SparkSession (and its non-serializable
    ObservationManager) into the model object; task serialization of
    any later scoring query — batch or streaming — then fails with
    'Task not serializable' whenever observation state is live.
    ``copy()`` rebuilds the JVM model without the summary."""
    return model.copy()


def train(df: DataFrame, seed: int = 42) -> PipelineModel:
    """Fit on the full frame (caller handles splitting)."""
    return _strip_summary(build_pipeline(seed).fit(df))


def train_and_eval(df: DataFrame, seed: int = 42) -> tuple[PipelineModel, EvalResult]:
    """80/20 split → fit → held-out precision/recall for label 1
    (README.md:106-108 quality gate)."""
    train_df, test_df = df.randomSplit([0.8, 0.2], seed=seed)
    model = _strip_summary(build_pipeline(seed).fit(train_df))
    scored = model.transform(test_df)
    agg = scored.agg(
        F.sum(((F.col("prediction") == 1) & (F.col(LABEL_COL) == 1)).cast("int")).alias("tp"),
        F.sum(((F.col("prediction") == 1) & (F.col(LABEL_COL) == 0)).cast("int")).alias("fp"),
        F.sum(((F.col("prediction") == 0) & (F.col(LABEL_COL) == 1)).cast("int")).alias("fn"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    precision = agg.tp / (agg.tp + agg.fp) if (agg.tp + agg.fp) else 1.0
    recall = agg.tp / (agg.tp + agg.fn) if (agg.tp + agg.fn) else 1.0
    return model, EvalResult(precision=precision, recall=recall, n_test=agg.n)


def score(model: PipelineModel, df: DataFrame) -> DataFrame:
    """Vectorized batch scoring (O26 parity, minus the per-row loop).

    Emits the input columns + integer ``prediction`` ∈ {0,1}
    (realtime_inference.py:119-126 casts to int)."""
    scored = model.transform(df)
    return scored.select(
        *df.columns, F.col("prediction").cast("int").alias("prediction")
    )
