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
import shutil
import uuid as uuidlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.changelog import CHANGE_EVENT_SCHEMA, DATA_OPS

Downstream = Callable[[DataFrame, int], None]


class ReadCommittedGate:
    def __init__(
        self,
        spark: SparkSession,
        pending_path: str,
        downstream: Downstream,
        txn_col: str = "txn_id",
    ) -> None:
        self.spark = spark
        self.pending_path = pending_path
        self.downstream = downstream
        self.txn_col = txn_col

    # -- pending state ---------------------------------------------------

    def pending(self) -> DataFrame:
        if os.path.exists(self.pending_path):
            return self.spark.read.parquet(self.pending_path)
        return self.spark.createDataFrame([], CHANGE_EVENT_SCHEMA)

    def _rewrite_pending(self, df: DataFrame) -> None:
        tmp = f"{self.pending_path}.tmp-{uuidlib.uuid4().hex[:8]}"
        df.write.mode("overwrite").parquet(tmp)
        if os.path.exists(self.pending_path):
            old = f"{self.pending_path}.old-{uuidlib.uuid4().hex[:8]}"
            os.rename(self.pending_path, old)
            os.rename(tmp, self.pending_path)
            shutil.rmtree(old, ignore_errors=True)
        else:
            os.rename(tmp, self.pending_path)

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

        candidates = self.pending().unionByName(txn_rows)
        # discard rolled-back transactions before the release split
        candidates = candidates.join(
            F.broadcast(rollbacks),
            candidates[self.txn_col] == F.col("__ctxn"),
            "left_anti",
        )
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
        # release BEFORE persisting the new pending set: if the
        # downstream fails, the pending store still holds the open rows
        # and redelivery of the batch re-releases idempotently (the
        # materializer's max-pos merge absorbs duplicates).
        self.downstream(out, batch_id)
        self._rewrite_pending(still_open)

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
