"""Stateful operators on the ``transformWithStateInPandas`` API (the
successor to ``applyInPandasWithState`` used in stateful.py — kept side
by side: v1 for Spark <4 compatibility, v2 as the forward path).

Why migrate: the old API's only expiry mechanism is
``GroupStateTimeout.ProcessingTimeTimeout``, which forces the query into
paced no-data batches forever — ``processAllAvailable()`` never returns
and ``availableNow`` never terminates, so tests must poll the sink
(tests/test_stateful.py). transformWithState registers **explicit
per-key timers** instead: expiry fires via ``handleExpiredTimer`` during
normal batch processing, the query stays idle-able, and drain triggers
terminate normally.

Requires the RocksDB state store provider
(``spark.sql.streaming.stateStore.providerClass`` =
``...state.RocksDBStateStoreProvider``) — transformWithState does not
run on the default HDFS-backed provider.

DEPENDENCY GATE: the API's state-server protocol is protobuf-based —
the ``protobuf`` Python package must be importable on driver and
workers (`pyspark/sql/streaming/proto/StateMessage_pb2.py` imports
``google.protobuf.descriptor``; without it the driver worker crashes
with STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE). This container
ships no protobuf, so tests/test_stateful_v2.py skip here and
stateful.py (applyInPandasWithState) stays the default engine path;
in a protobuf-equipped deployment v2 is a drop-in replacement.

Semantics mirror stateful.py exactly:
- :class:`WatermarkTrackerProcessor` — running (max_pos, n_events) per
  source (A21, `internal/cannal/incremental.go:195-208`).
- :class:`TxnAssemblerProcessor` — per-transaction buffering, one
  summary row on commit (OnRow/OnXID,
  `internal/cannal/handler.go:55-75`); a processing-time timer evicts
  abandoned transactions as ``complete=false``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

from .stateful import (
    COMMIT_OP,
    TXN_OUTPUT,
    TXN_TIMEOUT_MS,
    WATERMARK_OUTPUT,
)

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def require_rocksdb(spark) -> None:
    """transformWithState needs the RocksDB state store; set it before
    the query starts (runtime-settable, read at query start)."""
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)


class WatermarkTrackerProcessor(StatefulProcessor):
    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState(
            "wm", "max_pos string, n_events bigint"
        )

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        max_pos, n = self._state.get() if self._state.exists() else (None, 0)
        for pdf in rows:
            if len(pdf) == 0:
                continue
            batch_max = pdf["pos"].max()
            max_pos = batch_max if max_pos is None else max(max_pos, batch_max)
            n += len(pdf)
        self._state.update((max_pos, n))
        yield pd.DataFrame(
            [{"data_source": key[0], "max_pos": max_pos, "n_events": n}]
        )

    def close(self) -> None:
        pass


def watermark_tracker_v2(changes: DataFrame) -> DataFrame:
    """stateful.watermark_tracker on the new API (no timers needed)."""
    return changes.groupBy("data_source").transformWithStateInPandas(
        statefulProcessor=WatermarkTrackerProcessor(),
        outputStructType=WATERMARK_OUTPUT,
        outputMode="Update",
        timeMode="None",
    )


class TxnAssemblerProcessor(StatefulProcessor):
    def __init__(self, timeout_ms: int = TXN_TIMEOUT_MS):
        self._timeout_ms = timeout_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._state = handle.getValueState(
            "txn", "n_events bigint, first_pos string, last_pos string"
        )

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        n, first_pos, last_pos = (
            self._state.get() if self._state.exists() else (0, None, None)
        )
        committed = False
        for pdf in rows:
            if len(pdf) == 0:
                continue
            data_rows = pdf[pdf["op"] != COMMIT_OP]
            n += len(data_rows)
            if len(data_rows):
                lo, hi = data_rows["pos"].min(), data_rows["pos"].max()
                first_pos = lo if first_pos is None else min(first_pos, lo)
                last_pos = hi if last_pos is None else max(last_pos, hi)
            committed = committed or bool((pdf["op"] == COMMIT_OP).any())

        if committed:
            self._state.clear()
            for t in self._handle.listTimers():
                self._handle.deleteTimer(t)
            yield pd.DataFrame(
                [{"txn_id": key[0], "n_events": n, "first_pos": first_pos,
                  "last_pos": last_pos, "complete": True}]
            )
        else:
            self._state.update((n, first_pos, last_pos))
            # explicit per-key timer — the new-API replacement for
            # GroupStateTimeout.ProcessingTimeTimeout
            self._handle.registerTimer(
                timerValues.getCurrentProcessingTimeInMs() + self._timeout_ms
            )

    def handleExpiredTimer(
        self, key, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        if not self._state.exists():
            return
        n, first_pos, last_pos = self._state.get()
        self._state.clear()
        yield pd.DataFrame(
            [{"txn_id": key[0], "n_events": n, "first_pos": first_pos,
              "last_pos": last_pos, "complete": False}]
        )

    def close(self) -> None:
        pass


def txn_assembler_v2(changes: DataFrame, timeout_ms: int = TXN_TIMEOUT_MS) -> DataFrame:
    return changes.groupBy("txn_id").transformWithStateInPandas(
        statefulProcessor=TxnAssemblerProcessor(timeout_ms),
        outputStructType=TXN_OUTPUT,
        outputMode="Update",
        timeMode="ProcessingTime",
    )
