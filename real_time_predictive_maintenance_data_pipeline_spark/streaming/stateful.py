"""Custom stateful streaming operator: per-machine alarm state machine.

The reference scores each record independently and prints one line per
record (realtime_inference.py:117-139) — it cannot express "alert only
after N consecutive anomalies" because it keeps no state. This operator
is the engine's stateful extension (SURVEY §2.3 state row): an
``applyInPandasWithState`` state machine that tracks consecutive
anomaly runs per machine and emits a row only on state *transitions*
(NORMAL→ALARM after ``threshold`` consecutive anomalies, ALARM→NORMAL
on the first clean record).

Scale design:
- State is keyed by machineId — the same key the reference shards on
  (phase2-iot-kinesis.yaml:66) — so state lives where the data already
  hashes; adding machines scales horizontally with zero rebalancing
  logic of our own.
- Per-key state is O(1) (run length + flag), not a window buffer, so
  state-store size is #machines × ~48 bytes regardless of rate.
- Arrow-batched: each micro-batch group arrives as pandas DataFrames;
  the transition scan is a vectorized-ish tight loop over one machine's
  batch, not per-record Python callbacks across the stream.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Iterator

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

#: Emitted only on transitions.
TRANSITION_SCHEMA = StructType(
    [
        StructField("machineId", StringType()),
        StructField("timestamp", LongType()),
        StructField("state", StringType()),  # 'ALARM' | 'NORMAL'
        StructField("run_length", IntegerType()),
    ]
)

#: (consecutive anomaly run, currently in alarm)
STATE_SCHEMA = StructType(
    [
        StructField("run", IntegerType()),
        StructField("in_alarm", IntegerType()),
    ]
)


def _make_fn(threshold: int):
    def fn(key: tuple, pdfs: Iterator["pd.DataFrame"], state: Any) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        (machine_id,) = key
        run, in_alarm = state.get if state.exists else (0, 0)
        out_ts, out_state, out_run = [], [], []
        for pdf in pdfs:
            pdf = pdf.sort_values("timestamp")
            for ts, pred in zip(pdf["timestamp"], pdf["prediction"]):
                if pred == 1:
                    run += 1
                    if not in_alarm and run >= threshold:
                        in_alarm = 1
                        out_ts.append(int(ts))
                        out_state.append("ALARM")
                        out_run.append(run)
                else:
                    if in_alarm:
                        out_ts.append(int(ts))
                        out_state.append("NORMAL")
                        out_run.append(run)
                    run = 0
                    in_alarm = 0
        state.update((run, in_alarm))
        yield pd.DataFrame(
            {
                "machineId": [machine_id] * len(out_ts),
                "timestamp": out_ts,
                "state": out_state,
                "run_length": out_run,
            }
        )

    return fn


def alarm_transitions(scored: DataFrame, threshold: int = 3) -> DataFrame:
    """Streaming state machine over a scored stream.

    ``scored`` must carry (machineId, timestamp, prediction∈{0,1}) —
    the output of ``scored_alert_stream`` or any upstream scorer.
    Emits (machineId, timestamp, state, run_length) transition rows.
    """
    return scored.groupBy("machineId").applyInPandasWithState(
        _make_fn(threshold),
        outputStructType=TRANSITION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


# ---------------------------------------------------------------------------
# EWMA drift monitor (second arbitrary-state operator)
# ---------------------------------------------------------------------------

#: Drift rows: reading that deviated from the tracked EWMA.
DRIFT_SCHEMA = StructType(
    [
        StructField("machineId", StringType()),
        StructField("timestamp", LongType()),
        StructField("temperature", StringType()),  # '%.2f' parity formatting
        StructField("ewma", StringType()),
        StructField("n_seen", IntegerType()),
    ]
)

#: (ewma, observation count); ewma is null until the first reading.
DRIFT_STATE_SCHEMA = StructType(
    [
        StructField("ewma", DoubleType()),
        StructField("n", IntegerType()),
    ]
)


def _make_drift_fn(alpha: float, delta: float, warmup: int):
    def fn(key: tuple, pdfs: Iterator["pd.DataFrame"], state: Any) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        (machine_id,) = key
        ewma, n = state.get if state.exists else (None, 0)
        out_ts, out_temp, out_ewma, out_n = [], [], [], []
        for pdf in pdfs:
            pdf = pdf.sort_values("timestamp")
            for ts, temp in zip(pdf["timestamp"], pdf["temperature"]):
                temp = float(temp)
                if n >= warmup and abs(temp - ewma) > delta:
                    out_ts.append(int(ts))
                    out_temp.append(f"{temp:.2f}")
                    out_ewma.append(f"{ewma:.2f}")
                    out_n.append(n)
                ewma = temp if ewma is None else alpha * temp + (1 - alpha) * ewma
                n += 1
        state.update((float(ewma), int(n)))
        yield pd.DataFrame(
            {
                "machineId": [machine_id] * len(out_ts),
                "timestamp": out_ts,
                "temperature": out_temp,
                "ewma": out_ewma,
                "n_seen": out_n,
            }
        )

    return fn


def drift_monitor(
    parsed: DataFrame, alpha: float = 0.2, delta: float = 5.0, warmup: int = 3
) -> DataFrame:
    """Per-machine EWMA drift detector (arbitrary-state streaming op).

    Tracks an exponentially weighted moving average of temperature per
    machineId in the state store; after ``warmup`` observations, any
    reading deviating from the prior EWMA by more than ``delta`` emits
    a drift row (the model-free complement of the reference's trained
    anomaly scorer, realtime_inference.py:117-126 — same keying, same
    '%.2f' formatting as its alert lines).

    Implemented on ``applyInPandasWithState``. Spark 4 ships
    ``transformWithStateInPandas`` as the successor API (named state
    variables, TTL, timers), but its Python state-server protocol
    requires google.protobuf, which this runtime does not provide —
    the semantics here are identical for a single ValueState.

    Scale: state per key is (ewma, count) — O(1), same keying as the
    reference's machineId sharding (phase2-iot-kinesis.yaml:66); the
    RocksDB state-store confs in session.py apply unchanged."""
    return parsed.groupBy("machineId").applyInPandasWithState(
        _make_drift_fn(alpha, delta, warmup),
        outputStructType=DRIFT_SCHEMA,
        stateStructType=DRIFT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def running_totals_tws(scored: DataFrame) -> DataFrame:
    """Per-machine running totals via ``transformWithStateInPandas`` —
    the Spark 4 arbitrary-state API (successor to
    ``applyInPandasWithState``): typed per-key ValueState managed by a
    ``StatefulProcessor``, RocksDB-backed, with the same
    machineId-keyed horizontal scaling as the alarm machine.

    Emits one row per (machine, micro-batch): cumulative record count
    and cumulative anomaly count — the monitoring counter the reference
    prints per record (realtime_inference.py:128-139) lifted into
    managed state.

    Runtime requirement: the transformWithState state-server protocol
    imports ``google.protobuf`` on the Python side; environments
    without protobuf (this container) must use ``alarm_transitions`` /
    ``drift_monitor`` (applyInPandasWithState) instead — the test for
    this operator skips when protobuf is absent.
    """
    import pandas as pd

    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    out_schema = StructType(
        [
            StructField("machineId", StringType()),
            StructField("n_total", LongType()),
            StructField("n_anomalies", LongType()),
        ]
    )

    class TotalsProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState(
                "totals",
                StructType(
                    [
                        StructField("n", LongType()),
                        StructField("n_anom", LongType()),
                    ]
                ),
            )

        def handleInputRows(self, key, rows, timerValues):
            n, n_anom = 0, 0
            for pdf in rows:
                n += len(pdf)
                n_anom += int((pdf["prediction"] == 1).sum())
            if self._totals.exists():
                prev = self._totals.get()
                n += int(prev[0])
                n_anom += int(prev[1])
            self._totals.update((n, n_anom))
            yield pd.DataFrame(
                {"machineId": [key[0]], "n_total": [n], "n_anomalies": [n_anom]}
            )

        def close(self) -> None:
            pass

    return (
        scored.groupBy("machineId")
        .transformWithStateInPandas(
            TotalsProcessor(),
            outputStructType=out_schema,
            outputMode="Update",
            timeMode="None",
        )
    )


# ---------------------------------------------------------------------------
# Silence monitor (event-time timeout — the "machine went dark" alert)
# ---------------------------------------------------------------------------

#: One row per machine whose feed went silent past the threshold.
SILENCE_SCHEMA = StructType(
    [
        StructField("machineId", StringType()),
        StructField("last_seen", LongType()),  # unix seconds
        StructField("state", StringType()),  # 'SILENT'
    ]
)

#: Last event-time seen per machine (unix seconds).
SILENCE_STATE_SCHEMA = StructType([StructField("last_seen", LongType())])


def _make_silence_fn(silence_seconds: int):
    def fn(
        key: tuple, pdfs: Iterator["pd.DataFrame"], state: Any
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        (machine_id,) = key
        if state.hasTimedOut:
            (last_seen,) = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "machineId": [machine_id],
                    "last_seen": [int(last_seen)],
                    "state": ["SILENT"],
                }
            )
            return
        last = int(state.get[0]) if state.exists else None
        for pdf in pdfs:
            if len(pdf):
                m = int(pdf["timestamp"].max())
                last = m if last is None else max(last, m)
        if last is not None:
            state.update((last,))
            # fire when the event-time watermark passes the machine's
            # last heartbeat + the silence threshold
            state.setTimeoutTimestamp((last + silence_seconds) * 1000)
        yield pd.DataFrame(
            {"machineId": [], "last_seen": [], "state": []}
        ).astype({"machineId": "object", "last_seen": "int64", "state": "object"})

    return fn


def silence_monitor(
    parsed: DataFrame,
    silence_seconds: int = 30,
    watermark_delay: str = "5 seconds",
) -> DataFrame:
    """Dead-feed detection: a machine that stops reporting for
    ``silence_seconds`` of EVENT TIME gets one SILENT alert row — the
    most basic predictive-maintenance signal there is (a sensor that
    went dark), and one the reference's stateless per-record scorer
    (realtime_inference.py:92-139) structurally cannot express because
    absence of data never invokes a per-message callback.

    Mechanism: per-machine state holds the last heartbeat; an
    EventTimeTimeout is re-armed at ``last_seen + silence_seconds`` on
    every record. When the stream's watermark passes the deadline with
    no new data for the key, Spark runs the timeout branch — including
    in the no-data micro-batch it schedules after a watermark advance,
    so silence is detected without waiting for the dead machine to
    (never) speak again.

    Scale: O(1) state per machine plus one registered timeout; same
    machineId keying/sharding story as the alarm machine. The
    watermark delay bounds state only for the TIMELINESS of detection
    — state itself is removed as each alert fires."""
    from pyspark.sql import functions as F

    with_evt = parsed.withColumn(
        "event_time", F.timestamp_seconds(F.col("timestamp"))
    ).withWatermark("event_time", watermark_delay)
    return with_evt.groupBy("machineId").applyInPandasWithState(
        _make_silence_fn(silence_seconds),
        outputStructType=SILENCE_SCHEMA,
        stateStructType=SILENCE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="EventTimeTimeout",
    )
