"""Model-ARTIFACT scoring path — parity with the reference's
joblib-RF inference contract (realtime_inference.py:58-65 loads
``predictive_maintenance_rf_model.joblib``; :117-123 calls
``model.predict(X)[0]`` per message).

The engine's native path trains/scores MLlib (``ml.anomaly``), but a
user holding the reference's actual sklearn artifact must be able to
score it WITHOUT retraining. This module provides that bridge:

- ``load_artifact``/``save_artifact``: joblib when installed, stdlib
  pickle otherwise (joblib's default persistence is pickle-compatible
  for the plain-object case).
- ``score_with_artifact``: Spark-side scoring through
  ``pyspark.ml.functions.predict_batch_udf`` — Arrow-batched numpy
  in, one ``model.predict(X)`` call per batch, never per row. This is
  the O26 "sklearn parity" mapping named by SURVEY §2.1.
- ``train_reference_artifact``: when sklearn is importable, fits the
  reference's RandomForestClassifier on the (driver-collected, 10 k
  row — the reference's own training size, README.md:94-96) historical
  table; otherwise returns ``ThresholdAnomalyModel``, a deterministic
  stand-in with the same ``predict(X) -> {0,1}`` surface. The classes
  are linearly separable by construction (SURVEY §5.2 #4), so on the
  separable region the stand-in, a real sklearn RF, and the MLlib RF
  all agree — tests pin that agreement.

Scale note: ``predict_batch_udf`` ships the artifact to every executor
once (lazy init per worker) and scores Arrow batches — the right shape
for 100 TB scoring. Only TRAINING of the sklearn artifact is
driver-local (inherent: sklearn is single-process; the distributed
trainer is MLlib in ``ml.anomaly``).
"""

from __future__ import annotations

import os
import pickle
from typing import Any

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType

from .anomaly import FEATURE_COLS, LABEL_COL

try:  # environment-gated: joblib is optional (brief: no pip installs)
    import joblib as _joblib
except ImportError:  # pragma: no cover - depends on container
    _joblib = None

try:
    from sklearn.ensemble import RandomForestClassifier as _SkRF
except ImportError:  # pragma: no cover - depends on container
    _SkRF = None


class ThresholdAnomalyModel:
    """Deterministic stand-in for the reference's trained RF artifact.

    Same inference surface as the sklearn estimator
    (``predict(X: ndarray[n, 2]) -> ndarray[n]``). Decision thresholds
    sit at the midpoints of the generator's separable classes
    (normal temp ≤ 77 = μ68+3σ vs anomaly ≥ 80,
    normal vib ≤ 2.7 = μ1.8+3σ vs anomaly ≥ 3 —
    generate_historical_data.py:54-61), where the reference reports
    precision = recall = 1.00 (README.md:106-108), i.e. any competent
    model realizes this same decision function on that region.
    """

    temp_threshold = 78.5
    vib_threshold = 2.85

    def predict(self, X: np.ndarray) -> np.ndarray:
        X = np.asarray(X, dtype=np.float64)
        return (
            (X[:, 0] > self.temp_threshold) | (X[:, 1] > self.vib_threshold)
        ).astype(np.int64)


def save_artifact(model: Any, path: str) -> None:
    """Persist with joblib when available (the reference's format —
    realtime_inference.py:58-65), else stdlib pickle.

    Write-then-rename: executors lazy-load the artifact concurrently
    with the write, so the file must appear atomically — a partial
    in-place write would corrupt-load flakily."""
    tmp = f"{path}.tmp.{os.getpid()}"
    if _joblib is not None:
        _joblib.dump(model, tmp)
    else:
        with open(tmp, "wb") as fh:
            pickle.dump(model, fh)
    os.replace(tmp, path)


def load_artifact(path: str) -> Any:
    if _joblib is not None:
        return _joblib.load(path)
    with open(path, "rb") as fh:
        return pickle.load(fh)


def artifact_dir() -> str:
    """Directory for pinned trained artifacts (``pinned``): env
    ``RTPMDP_ARTIFACT_DIR`` when set, else ``.artifacts/`` at the repo
    root (next to the package — gitignored; at cluster scale this would
    be a shared object-store prefix)."""
    d = os.environ.get("RTPMDP_ARTIFACT_DIR") or os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".artifacts",
    )
    os.makedirs(d, exist_ok=True)
    return d


#: Version of each pinned-artifact TRAINER — bump when the training
#: algorithm changes so old pins stop being served (the key carries the
#: version via ``trainer_key``). The convention is enforced
#: MECHANICALLY: tests/test_artifact_versions.py digests each trainer's
#: source and fails on any edit until the digest there is refreshed —
#: forcing the editor past this dict, where the bump decision is made.
TRAINER_VERSIONS: dict[str, int] = {
    "ivf_train_centroids": 3,
    "pq_train_codebooks": 3,
    "opq_rotation": 1,
}


def trainer_key(prefix: str, trainer: str, fp: str) -> str:
    """Build a ``pinned`` cache key that mechanically carries the
    trainer's version: ``{prefix}_t{version}_{fp}``. Callers never
    hand-write the ``_tN`` component (the r15 OPQ key omitted it —
    ADVICE r15), so a trainer-algorithm change invalidates every
    derived pin the moment ``TRAINER_VERSIONS`` is bumped."""
    return f"{prefix}_t{TRAINER_VERSIONS[trainer]}_{fp}"


#: Per-process memo of LOADED pinned artifacts keyed by file stat —
#: see ``pinned``. Metadata-invalidated, never persisted, read-only
#: contract on the stored objects.
_PINNED_LOAD_MEMO: dict[tuple, Any] = {}


def pinned(key: str, train) -> Any:
    """Train-once → persist → load: the default query-path contract for
    every TRAINED structure (IVF centroids, PQ codebooks, the RF
    artifact). The r14 layout audit proved in-query training is the
    layout-nondeterminism vector for ANN structures — the fix is to
    treat trained structures like any other model artifact: train them
    once, pin the bytes, and have the query plan LOAD, never refit.

    ``key`` must be layout-insensitive (use ``dataset_fingerprint`` on
    the training frame plus the hyperparameters), so re-layouts of the
    same logical corpus share one artifact — and it must carry a
    TRAINER VERSION component: build it with ``trainer_key`` so the
    version rides in mechanically from ``TRAINER_VERSIONS`` instead of
    being hand-written (a stale pin silently masks a new trainer
    otherwise). Concurrency-safe: the write is atomic
    (``save_artifact`` write-then-rename), so racing trainers converge
    on one winner and readers never see a partial file.

    Degenerate results are REFUSED, not cached (r15 verdict task 3):
    a ``train()`` that returns ``None`` or an empty container raises
    the crisp estimator error here, BEFORE persisting — a corrupt pin
    (e.g. the ``..._n0hNone.bin`` empty-corpus case) would otherwise
    serve junk to every later query of the same fingerprint, long
    after the empty-input bug is fixed.

    Loads are memoized per process keyed by (path, mtime_ns, size)
    (r17, same metadata-stat pattern as the parquet schema memo): the
    ANN queries re-enter ``pinned`` on every invocation and re-paid the
    file read + deserialize each time. Honest local measurement: these
    pins are ~10 KB and joblib loads them in ~0.05-0.09 ms, so the
    local saving is noise — the point is structural (a real deployment
    keeps pins on an object store, where each skipped load is a GET +
    deserialize per query). A rewritten pin (new mtime/size) re-loads;
    nothing persists across processes.
    Pinned artifacts are READ-ONLY by contract — callers build their
    numpy/broadcast structures from the returned lists and must not
    mutate them (the memo hands every caller the same object)."""
    path = os.path.join(artifact_dir(), f"{key}.bin")
    if os.path.exists(path):
        st = os.stat(path)
        mkey = (path, st.st_mtime_ns, st.st_size)
        obj = _PINNED_LOAD_MEMO.get(mkey)
        if obj is None:
            obj = load_artifact(path)
            _PINNED_LOAD_MEMO[mkey] = obj
        return obj
    obj = train()
    try:
        empty = len(obj) == 0  # type: ignore[arg-type]
    except TypeError:
        empty = False
    if obj is None or empty:
        raise ValueError(
            f"pinned({key!r}) needs at least a non-empty trained "
            f"artifact, got {obj!r} — refusing to persist a degenerate "
            "pin (an upstream filter or source produced no training rows)"
        )
    save_artifact(obj, path)
    st = os.stat(path)
    _PINNED_LOAD_MEMO[(path, st.st_mtime_ns, st.st_size)] = obj
    return obj


def dataset_fingerprint(df: DataFrame, *cols: str) -> str:
    """Layout-insensitive content fingerprint for ``pinned`` cache
    keys: (row count, sum over rows of ``pmod(xxhash64(cols), 1e9+7)``)
    is invariant under row permutation and file re-splits but moves
    with any content change, so an artifact keyed by it is shared
    across physical layouts of one logical dataset and retrained
    exactly when the data changes. One column-pruned aggregate scan
    (map-side partial sums); the bounded per-row term keeps the BIGINT
    sum overflow-free (ANSI mode) to ~9e12 rows — beyond that,
    fingerprint a deterministic sample instead."""
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.pmod(F.xxhash64(*cols), F.lit(1_000_000_007))).alias("h"),
    ).first()
    return f"n{row['n']}h{row['h']}"


def train_reference_artifact(historical: DataFrame, seed: int = 42) -> Any:
    """sklearn-RF artifact from the historical table when sklearn is
    installed (n_estimators=100 = sklearn's default, the reference
    notebook's described config README.md:102-104); deterministic
    threshold stand-in otherwise."""
    if _SkRF is None:
        return ThresholdAnomalyModel()
    pdf = historical.select(*FEATURE_COLS, LABEL_COL).toPandas()
    rf = _SkRF(n_estimators=100, random_state=seed)
    rf.fit(pdf[list(FEATURE_COLS)].to_numpy(), pdf[LABEL_COL].to_numpy())
    return rf


def artifact_predict_udf(model_path: str, batch_size: int = 4096):
    """``predict_batch_udf`` over a persisted artifact: each executor
    loads the artifact once (lazy, per python worker) and scores
    Arrow-fed numpy batches — the vectorized replacement for the
    reference's per-message ``model.predict(X)[0]`` loop
    (realtime_inference.py:117-123)."""
    from pyspark.ml.functions import predict_batch_udf

    def make_predict_fn():
        model = load_artifact(model_path)

        def predict(temperature: np.ndarray, vibration: np.ndarray) -> np.ndarray:
            X = np.stack([temperature, vibration], axis=1)
            return model.predict(X)

        return predict

    return predict_batch_udf(
        make_predict_fn, return_type=IntegerType(), batch_size=batch_size
    )


def score_with_artifact(df: DataFrame, model_path: str) -> DataFrame:
    """Input columns + integer ``prediction`` ∈ {0,1} — same output
    contract as the MLlib path (``ml.anomaly.score``)."""
    udf = artifact_predict_udf(model_path)
    return df.withColumn(
        "prediction", udf(F.col(FEATURE_COLS[0]), F.col(FEATURE_COLS[1]))
    )
