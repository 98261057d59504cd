"""Custom stateful streaming operators (``applyInPandasWithState``).

The reference keeps two pieces of mutable state in its binlog loop: the
advancing GTID watermark (mutex-guarded ``SetGTID`` per event,
`internal/cannal/incremental.go:195-208`) and, in the intended design,
per-transaction event buffers flushed on commit
(`internal/cannal/handler.go:55-75`). Spark's stateful-processing API
expresses both as keyed state over a stream — checkpointed, restart-safe,
and scaled by key hashing rather than a single mutex:

- :func:`watermark_tracker` — running per-source position high-water
  mark + event count. State is O(1) per source; output is the updated
  watermark per micro-batch (the thing A14/A15 checkpoint rows record).
- :func:`txn_assembler` — groups events by transaction and emits one
  row per *completed* transaction (commit marker seen), holding open
  transactions in state with a processing-time timeout so an abandoned
  txn cannot leak state forever — the buffering semantics of OnRow/OnXID.

Both are Arrow-batched: pandas DataFrames per key-group, state crosses
the boundary once per group per batch, not per row.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

WATERMARK_OUTPUT = T.StructType(
    [
        T.StructField("data_source", T.StringType()),
        T.StructField("max_pos", T.StringType()),
        T.StructField("n_events", T.LongType()),
    ]
)

_WATERMARK_STATE = T.StructType(
    [
        T.StructField("max_pos", T.StringType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def _track_watermark(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    max_pos, n = state.get if state.exists else (None, 0)
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        batch_max = pdf["pos"].max()
        max_pos = batch_max if max_pos is None else max(max_pos, batch_max)
        n += len(pdf)
    state.update((max_pos, n))
    yield pd.DataFrame([{"data_source": key[0], "max_pos": max_pos, "n_events": n}])


def watermark_tracker(changes: DataFrame) -> DataFrame:
    """Running high-water mark per source over a change-event stream.

    ``pos`` strings are zero-padded (lexicographic == numeric order,
    see sources/changelog.py), so ``max`` is the watermark. Emits the
    cumulative (max_pos, n_events) per source each micro-batch — the
    stream-native form of the reference's watermark mutex."""
    return changes.groupBy("data_source").applyInPandasWithState(
        _track_watermark,
        WATERMARK_OUTPUT,
        _WATERMARK_STATE,
        "update",
        GroupStateTimeout.NoTimeout,
    )


TXN_OUTPUT = T.StructType(
    [
        T.StructField("txn_id", T.StringType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("first_pos", T.StringType()),
        T.StructField("last_pos", T.StringType()),
        T.StructField("complete", T.BooleanType()),
    ]
)

_TXN_STATE = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("first_pos", T.StringType()),
        T.StructField("last_pos", T.StringType()),
    ]
)

COMMIT_OP = "commit"  # XID-event analog: marks the transaction complete
TXN_TIMEOUT_MS = 60_000  # default; override via txn_assembler(timeout_ms=...)


def txn_assembler(changes: DataFrame, timeout_ms: int = TXN_TIMEOUT_MS) -> DataFrame:
    """Transaction assembly (OnRow buffering + OnXID flush): buffer
    events per txn_id in keyed state; emit one summary row when the
    commit marker arrives; time out abandoned transactions (emitted
    with ``complete=false``) so state stays bounded. At 100 TB state
    size is O(open transactions), partitioned by txn hash — no single
    mutex, no unbounded buffer.

    Note: with ProcessingTimeTimeout the query runs paced no-data
    batches to evaluate timeouts, so it is never idle —
    ``processAllAvailable()`` will not return and ``availableNow``
    does not terminate; pace with ``trigger(processingTime=...)`` and
    poll the sink (see tests/test_stateful.py)."""

    # Closure (not a module function): cloudpickle ships it by value, so
    # timeout_ms travels to the Python workers with it.
    def assemble(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            n, first_pos, last_pos = state.get
            state.remove()
            yield pd.DataFrame(
                [{"txn_id": key[0], "n_events": n, "first_pos": first_pos,
                  "last_pos": last_pos, "complete": False}]
            )
            return

        n, first_pos, last_pos = state.get if state.exists else (0, None, None)
        committed = False
        for pdf in pdfs:
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
            state.remove()
            yield pd.DataFrame(
                [{"txn_id": key[0], "n_events": n, "first_pos": first_pos,
                  "last_pos": last_pos, "complete": True}]
            )
        else:
            state.update((n, first_pos, last_pos))
            state.setTimeoutDuration(timeout_ms)

    return changes.groupBy("txn_id").applyInPandasWithState(
        assemble,
        TXN_OUTPUT,
        _TXN_STATE,
        "update",
        GroupStateTimeout.ProcessingTimeTimeout,
    )
