"""Streaming observability — SURVEY.md §2.1 S9 for streams.

The reference alerts Telegram from an Airflow `on_failure_callback`
(``dags/ETL_covid19_pandas.py:97-110``). The engine-side analog for
batch is `plans.quality.guarded(on_failure=…)`; for Structured
Streaming it's a `StreamingQueryListener`: progress and termination
events fire on the driver and fan out to pluggable callbacks (a real
deployment posts to Telegram/Slack/PagerDuty; tests capture events
in memory). No engine code does HTTP."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class AlertingListener(StreamingQueryListener):
    """Invokes `on_event(kind, payload)` for query lifecycle events.
    `kind` ∈ {started, progress, terminated}; terminated events with
    a non-None exception are the reference's failure-alert case."""

    on_event: Callable[[str, object], None]
    seen: list[tuple[str, object]] = field(default_factory=list)

    def _emit(self, kind: str, payload: object) -> None:
        self.seen.append((kind, payload))
        self.on_event(kind, payload)

    def onQueryStarted(self, event) -> None:
        self._emit("started", event)

    def onQueryProgress(self, event) -> None:
        self._emit("progress", event)

    def onQueryIdle(self, event) -> None:  # Spark ≥ 3.5
        pass

    def onQueryTerminated(self, event) -> None:
        self._emit("terminated", event)


def attach_alerts(
    spark: SparkSession, on_event: Callable[[str, object], None]
) -> AlertingListener:
    listener = AlertingListener(on_event=on_event)
    spark.streams.addListener(listener)
    return listener


def detach_alerts(spark: SparkSession, listener: AlertingListener) -> None:
    spark.streams.removeListener(listener)
