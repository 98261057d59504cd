"""Streaming observability: per-micro-batch sync counters via
``DataFrame.observe`` — the Spark-native analog of the reference's
progress logging in its sync loop (internal/cannal/incremental.go logs
applied-event counts; internal/syncdb tracks per-source positions).

``observe`` computes the aggregates INSIDE the running plan (no second
pass over the batch, no extra action): Spark evaluates them alongside
the real work and attaches the row to each micro-batch's
QueryProgressEvent under ``observedMetrics[name]``. `MetricsTap`
collects those events off the listener bus, giving tests and operators
a lag/volume feed without touching the data path.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener

OBSERVATION_NAME = "cdc_sync"


def observe_changes(changes: DataFrame, name: str = OBSERVATION_NAME) -> DataFrame:
    """Attach sync counters to a changelog stream: total events, per-op
    breakdown, max position, and event-time lag floor (min ts). All
    plain aggregates — evaluated inside whole-stage codegen with the
    batch itself."""
    return changes.observe(
        name,
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("op") == "insert", 1).otherwise(0)).alias("n_inserts"),
        F.sum(F.when(F.col("op") == "update", 1).otherwise(0)).alias("n_updates"),
        F.sum(F.when(F.col("op") == "delete", 1).otherwise(0)).alias("n_deletes"),
        F.max("pos").alias("max_pos"),
        F.min("ts").alias("min_event_ts"),
    )


class MetricsTap(StreamingQueryListener):
    """Collects observed-metric rows from query progress events.

    Thread-safe (the listener bus calls from its own thread); keeps the
    latest row per observation name plus a bounded history for tests.
    Register with ``spark.streams.addListener(tap)`` and remove with
    ``removeListener`` — one tap serves every query on the session.
    """

    def __init__(self, history_limit: int = 100) -> None:
        self._lock = threading.Lock()
        self._latest: dict[str, dict] = {}
        self._history: list[dict] = []
        self._limit = history_limit

    # StreamingQueryListener interface -------------------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        om = event.progress.observedMetrics or {}
        with self._lock:
            for name, row in om.items():
                rec = {"name": name, "batchId": event.progress.batchId, **row.asDict()}
                self._latest[name] = rec
                self._history.append(rec)
                if len(self._history) > self._limit:
                    self._history = self._history[-self._limit :]

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    # accessors ------------------------------------------------------
    def latest(self, name: str = OBSERVATION_NAME) -> dict | None:
        with self._lock:
            return self._latest.get(name)

    def history(self, name: str = OBSERVATION_NAME) -> list[dict]:
        with self._lock:
            return [r for r in self._history if r["name"] == name]

    def totals(self, name: str = OBSERVATION_NAME) -> dict:
        """Sum the counter columns across all observed batches — the
        whole-run sync report the reference prints at completion."""
        hist = self.history(name)
        keys = ("n_events", "n_inserts", "n_updates", "n_deletes")
        return {k: sum(r.get(k) or 0 for r in hist) for k in keys}


def install_tap(spark: SparkSession, history_limit: int = 100) -> MetricsTap:
    tap = MetricsTap(history_limit)
    spark.streams.addListener(tap)
    return tap
