"""Offline-sensor detector: event-time TIMERS over keyed state.

The reference fleet has no liveness monitoring at all — a dead MQTT
sensor simply stops appearing in the collectors
(`pipline2/extract/mqtt_to_kafka_bridge.py` forwards whatever arrives;
nothing notices silence). Detecting SILENCE is the one streaming
pattern a windowed aggregate cannot express: there is no row to
aggregate when the interesting thing is the absence of rows.

Two implementations of the same state machine:

- :func:`offline_alerts` — ``applyInPandasWithState`` with
  ``GroupStateTimeout.EventTimeTimeout``: each sensor keeps one scalar
  (last event time seen) and a timeout timestamp at ``last_seen +
  timeout``; when the watermark passes it, Spark re-invokes the
  function with ``state.hasTimedOut`` and the alert row is emitted
  exactly once. Fully testable in this environment.
- :func:`offline_alerts_tws` — the same machine on Spark 4's
  ``transformWithStateInPandas`` (:class:`OfflineSensorProcessor`),
  using first-class ``registerTimer`` / ``handleExpiredTimer``. The
  TWS runtime speaks protobuf between the JVM and the Python state
  server; this container has no ``google.protobuf``, so the operator
  is environment-gated exactly like the Kafka connector — the
  boundary-failure pytest proves the plan construction is real
  (tests/test_offline_monitor.py::test_tws_variant_reaches_proto_boundary).

State per key: one scalar + one timer — O(|sensors|), independent of
event volume. A sensor that resumes after an alert starts a fresh
lifecycle (state cleared on alert), so recover→re-silence produces a
second alert — the desired pager semantics.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OFFLINE_TIMEOUT_MS = 15 * 60 * 1000  # silent this long => offline

ALERT_SCHEMA = "sensor_id long, last_seen_ms long, offline_at_ms long"
_STATE_SCHEMA = "last_ms long"


def _make_offline_fn(timeout_ms: int):
    def fn(key, pdfs: Iterator, state: GroupState):
        import pandas as pd

        if state.hasTimedOut:
            (last_ms,) = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "sensor_id": [int(key[0])],
                    "last_seen_ms": [int(last_ms)],
                    "offline_at_ms": [int(last_ms) + timeout_ms],
                }
            )
            return
        batch_max = None
        for pdf in pdfs:
            if len(pdf):
                mx = int(pdf["ts"].max().value // 1_000_000)
                batch_max = mx if batch_max is None else max(batch_max, mx)
        if batch_max is None:
            return
        last = batch_max
        if state.exists:
            last = max(int(state.get[0]), batch_max)
        state.update((last,))
        state.setTimeoutTimestamp(last + timeout_ms)

    return fn


def offline_alerts(
    events: DataFrame,
    timeout_ms: int = OFFLINE_TIMEOUT_MS,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Offline alerts for a streaming events DataFrame (append mode).

    One shuffle (groupBy sensor into the keyed-state operator); alerts
    carry the sensor, its last event time, and the event-time instant
    the silence was proven at (``last_seen + timeout``).
    """
    alerts = (
        events.select("user_id", "ts")
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_offline_fn(timeout_ms),
            outputStructType=ALERT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
    return alerts.select(
        "sensor_id",
        F.timestamp_millis(F.col("last_seen_ms")).alias("last_seen"),
        F.timestamp_millis(F.col("offline_at_ms")).alias("offline_at"),
    )


# --- Spark 4 transformWithState variant (environment-gated) ----------

try:  # the TWS API itself imports without protobuf; the RUNTIME needs it
    from pyspark.sql.streaming.stateful_processor import (
        ExpiredTimerInfo,
        StatefulProcessor,
        StatefulProcessorHandle,
        TimerValues,
    )

    HAVE_TWS_API = True
except ImportError:  # pragma: no cover - pyspark < 4
    StatefulProcessor = object  # type: ignore[assignment,misc]
    HAVE_TWS_API = False


class OfflineSensorProcessor(StatefulProcessor):
    """The same liveness machine on first-class TWS timers.

    ``handleInputRows`` folds the batch max into ``last_seen`` and
    moves the sensor's single event-time timer (delete-then-register).
    ``handleExpiredTimer`` emits the alert and clears state.
    """

    def __init__(self, timeout_ms: int = OFFLINE_TIMEOUT_MS) -> None:
        self.timeout_ms = timeout_ms

    def init(self, handle: "StatefulProcessorHandle") -> None:
        self.handle = handle
        self.last_seen = handle.getValueState("last_seen", _STATE_SCHEMA)

    def handleInputRows(self, key, rows, timer_values: "TimerValues"):
        batch_max = None
        for pdf in rows:
            if len(pdf):
                mx = int(pdf["ts"].max().value // 1_000_000)
                batch_max = mx if batch_max is None else max(batch_max, mx)
        if batch_max is None:
            return iter([])
        prev = self.last_seen.get()
        last = batch_max if prev is None else max(int(prev[0]), batch_max)
        self.last_seen.update((last,))
        for t in list(self.handle.listTimers()):
            self.handle.deleteTimer(t)
        self.handle.registerTimer(last + self.timeout_ms)
        return iter([])

    def handleExpiredTimer(
        self,
        key,
        timer_values: "TimerValues",
        expired_timer_info: "ExpiredTimerInfo",
    ):
        import pandas as pd

        prev = self.last_seen.get()
        last_ms = int(prev[0]) if prev is not None else None
        self.last_seen.clear()
        yield pd.DataFrame(
            {
                "sensor_id": [int(key[0])],
                "last_seen_ms": [last_ms],
                "offline_at_ms": [expired_timer_info.getExpiryTimeInMs()],
            }
        )

    def close(self) -> None:
        pass


def offline_alerts_tws(
    events: DataFrame,
    timeout_ms: int = OFFLINE_TIMEOUT_MS,
    watermark: str = "10 minutes",
) -> DataFrame:
    """``transformWithStateInPandas`` form — requires ``google.protobuf``
    at runtime (absent here; see module docstring) and the RocksDB
    state-store provider."""
    alerts = (
        events.select("user_id", "ts")
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=OfflineSensorProcessor(timeout_ms),
            outputStructType=ALERT_SCHEMA,
            outputMode="append",
            timeMode="eventTime",
        )
    )
    return alerts.select(
        "sensor_id",
        F.timestamp_millis(F.col("last_seen_ms")).alias("last_seen"),
        F.timestamp_millis(F.col("offline_at_ms")).alias("offline_at"),
    )
