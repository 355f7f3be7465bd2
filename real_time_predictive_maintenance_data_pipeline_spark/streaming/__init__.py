"""Structured Streaming surface: simulator source (O1–O7), parse +
quarantine (O24/O15), lake sink (O11–O15), scoring stream (O23–O27),
and the improvement-mode stateful ops (dedup, event-time windows)."""

from .buffered_sink import (  # noqa: F401
    BUFFER_MAX_BYTES,
    BUFFER_MAX_SECS,
    SizeOrTimeBuffer,
    buffered_lake_sink,
)
from .pipeline import (  # noqa: F401
    TELEMETRY_BOUNDS,
    alert_foreach_batch_sink,
    dedup_stream,
    enrich_stream,
    lake_sink,
    machine_dim,
    maintenance_correlation_stream,
    parse_telemetry,
    quarantine_sink,
    quarantine_split,
    scored_alert_stream,
    session_stream,
    windowed_stats_stream,
)
from .simulator import payload_stream, telemetry_stream  # noqa: F401
from .stateful import alarm_transitions, silence_monitor  # noqa: F401
