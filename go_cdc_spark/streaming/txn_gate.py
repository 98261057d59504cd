"""Read-committed transaction gate: withhold row events until their
transaction's commit arrives.

The reference buffers row events in the canal handler and flushes on
the XID event (OnRow accumulates, OnXID commits — the MySQL binlog
guarantees a txn's row events precede its XID event). The streaming
materializer alone applies row events as they arrive, which exposes
dirty reads of uncommitted transactions mid-batch-boundary. This gate
restores the reference's read-committed semantics in micro-batch form:

- row events WITH a txn_id are released to the downstream consumer
  only in the batch where their commit event shows up (same batch or
  any later one);
- rows of transactions whose commit hasn't arrived persist in a
  pending store (atomic tmp+rename rewrite, same crash discipline as
  the materializer state);
- txn-less events (autocommit) and non-data events pass through
  unchanged.

Ordering assumption (MySQL binlog property): a transaction's row
events precede its commit event in stream order, so a commit releases
exactly (pending ∪ current batch) rows and no commit-id memory is
needed — state is O(rows of open transactions), nothing grows with
stream history. Rollback handling mirrors the reference's silent drop:
an explicit ``rollback`` event discards the txn's pending rows.

Scale shape: the release split is a broadcast semi/anti join of the
(batch-sized, distinct) commit-id set against pending ∪ batch — the
pending store is never shuffled wider than its own size, and it stays
small because open transactions are short-lived by construction.

Reference parity: internal/cannal/incremental.go OnRow/OnXID,
fullamount rollback path. Cited for semantics, not implementation.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import storeio
from ..sources.changelog import CHANGE_EVENT_SCHEMA, DATA_OPS
from ..sources.meta import CheckpointStore

Downstream = Callable[[DataFrame, int], None]


def _pos_predecessor(pos: str) -> str | None:
    """The position immediately before ``pos`` in the canonical
    zero-padded format ("[source:]digits"). None for non-numeric
    positions (GTID-set strings) — then the watermark simply does not
    advance, which is safe (restart re-reads, the max-pos merge
    absorbs duplicates)."""
    prefix, sep, body = pos.rpartition(":")
    if not body.isdigit():
        return None
    return f"{prefix}{sep}{str(int(body) - 1).zfill(len(body))}"


class ReadCommittedGate:
    def __init__(
        self,
        spark: SparkSession,
        pending_path: str,
        downstream: Downstream,
        txn_col: str = "txn_id",
        meta: CheckpointStore | None = None,
        data_source_id: str = "ds1",
        table: str | None = None,
    ) -> None:
        """When the downstream is a watermark-advancing materializer,
        pass the CheckpointStore HERE and build the materializer with
        ``meta=None``: the gate caps the watermark below every withheld
        row (a batch's max pos can exceed a buffered open-txn row's pos
        — advancing to it would make a restart's pos_threshold filter
        silently drop the row when its commit finally releases it)."""
        self.spark = spark
        self.pending_path = pending_path
        self.downstream = downstream
        self.txn_col = txn_col
        self.meta = meta
        self.data_source_id = data_source_id
        self.table = table

    # -- pending state ---------------------------------------------------

    def pending(self) -> DataFrame:
        storeio.recover(self.pending_path)
        if os.path.exists(self.pending_path):
            return self.spark.read.parquet(self.pending_path)
        return self.spark.createDataFrame([], CHANGE_EVENT_SCHEMA)

    def _rewrite_pending(self, df: DataFrame) -> None:
        storeio.swap_in(df, self.pending_path)

    # -- batch protocol --------------------------------------------------

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        txn = F.col(self.txn_col)
        is_data = F.col("op").isin(list(DATA_OPS))

        passthrough = batch.filter(~is_data | txn.isNull())
        txn_rows = batch.filter(is_data & txn.isNotNull())
        commits = (
            batch.filter(F.col("op") == "commit")
            .select(txn.alias("__ctxn"))
            .distinct()
        )
        rollbacks = (
            batch.filter(F.col("op") == "rollback")
            .select(txn.alias("__ctxn"))
            .distinct()
        )

        # Dedupe against redelivery: a crash after _rewrite_pending but
        # before the streaming checkpoint commits redelivers a batch
        # whose open-txn rows are ALREADY in the pending store — the
        # naive union would persist them twice (and release both
        # copies later). (table, pos) identifies an event: pos is the
        # per-table total order the downstream max-pos merge relies on.
        candidates = (
            self.pending()
            .unionByName(txn_rows)
            .dropDuplicates(["table", "pos"])
        )
        # discard rolled-back transactions before the release split
        candidates = candidates.join(
            F.broadcast(rollbacks),
            candidates[self.txn_col] == F.col("__ctxn"),
            "left_anti",
        )
        # The dedup + anti-join plan above is read by FOUR consumers
        # (released agg, downstream apply, still_open rewrite, and the
        # watermark's pending re-read) — persist once so the pending
        # store scan + dedup shuffle runs a single time per micro-batch
        # instead of being re-evaluated by each consumer.
        candidates = candidates.persist()
        released = candidates.join(
            F.broadcast(commits),
            candidates[self.txn_col] == F.col("__ctxn"),
            "left_semi",
        )
        still_open = candidates.join(
            F.broadcast(commits),
            candidates[self.txn_col] == F.col("__ctxn"),
            "left_anti",
        )

        out = passthrough.unionByName(released)
        # Released rows can carry positions ABOVE everything in this
        # batch (a commit-only batch releasing rows buffered earlier) —
        # the watermark must cover them once applied, or it freezes at
        # the pre-buffering position forever. Computed HERE, before
        # _rewrite_pending swaps the store file the `released` plan
        # still reads from lazily.
        released_top = released.agg(F.max("pos").alias("p")).first().p
        # release BEFORE persisting the new pending set: if the
        # downstream fails, the pending store still holds the open rows
        # and redelivery of the batch re-releases idempotently (the
        # materializer's max-pos merge absorbs duplicates).
        try:
            self.downstream(out, batch_id)
            self._rewrite_pending(still_open)
            self._advance_watermark(batch, released_top)
        finally:
            candidates.unpersist()

    def _advance_watermark(self, batch: DataFrame, released_top: str | None) -> None:
        """A21 watermark, withheld-row-aware: advance to the max applied
        position (batch ∪ released-from-pending), capped strictly BELOW
        the oldest still-buffered row — otherwise a restart's
        pos_threshold would drop that row when its commit releases it
        in a later batch."""
        if self.meta is None:
            return
        batch_top = batch.agg(F.max("pos").alias("p")).first().p
        tops = [t for t in (batch_top, released_top) if t is not None]
        if not tops:
            return
        top = max(tops)
        open_min = self.pending().agg(F.min("pos").alias("p")).first().p
        if open_min is not None and open_min <= top:
            capped = _pos_predecessor(open_min)
            if capped is None:
                return  # non-numeric positions: hold the watermark
            top = min(top, capped)
        self.meta.upsert(
            self.data_source_id, top, sc=None, tb=self.table,
            sync_type="incremental",
        )

    def start(
        self, changes_stream: DataFrame, checkpoint_dir: str, query_name: str = "txn_gate"
    ):
        return (
            changes_stream.writeStream.queryName(query_name)
            .option("checkpointLocation", checkpoint_dir)
            .foreachBatch(self.process_batch)
            .trigger(availableNow=True)
            .start()
        )
