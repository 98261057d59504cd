"""Checkpoint metadata store (`_cdc_meta`).

Mirrors the reference's two gorm tables (`internal/model/tablemeta.go:14-35`:
``go_cdc_meta`` per-source and ``go_cdc_table_meta`` per-(source, schema,
table) rows, upserted find-then-save at :56-112) as one tiny parquet
table with nullable (sc, tb) — NULLs mark source-level rows.

Structured Streaming's ``checkpointLocation`` covers stream offsets; this
store covers what Spark doesn't: the per-table snapshot position that
drives the handoff rule. It is metadata, not data — a few rows per table
— so read-modify-overwrite is the right write path at any scale; writes
go through a temp dir + atomic rename to survive a crash mid-write.
"""

from __future__ import annotations

import os
import threading
from collections import defaultdict

from pyspark.sql import Row, SparkSession
from pyspark.sql import types as T

from .. import storeio

META_SCHEMA = T.StructType(
    [
        T.StructField("data_source_id", T.StringType(), False),
        T.StructField("sc", T.StringType(), True),
        T.StructField("tb", T.StringType(), True),
        T.StructField("last_pos", T.StringType(), True),  # JSON GTID set / pos string
        T.StructField("sync_type", T.StringType(), True),  # full | incremental
    ]
)


_META_COLS = ("data_source_id", "sc", "tb", "last_pos", "sync_type")

# One lock per store PATH, process-wide: in continuous mode every
# stream's foreachBatch thread upserts the same store, and upsert is a
# read-modify-write ending in promote_tmp's two renames — interleaved,
# one thread's promote can race another's (rename onto a just-swapped
# path) or silently drop a sibling table's watermark advance (lost
# update on the read-modify-write). All writers are in-process driver
# threads now (the pyarrow rewrite), so an in-process lock suffices.
_STORE_LOCKS: dict[str, threading.Lock] = defaultdict(threading.Lock)
_STORE_LOCKS_GUARD = threading.Lock()


def _store_lock(path: str) -> threading.Lock:
    with _STORE_LOCKS_GUARD:
        return _STORE_LOCKS[os.path.abspath(path)]


class CheckpointStore:
    """Upsert/lookup of sync positions, keyed (data_source_id, sc, tb).

    Reads and writes run DRIVER-SIDE via pyarrow: the store is
    catalog-rate (a few rows per table), and routing each find/save
    through a Spark job cost ~2.5s per op — with two meta ops per
    micro-batch that dominated the incremental drain (measured 5s per
    upsert at 32 cores; VERDICT r9 #2). The on-disk layout stays a
    plain parquet DIRECTORY (part file + _SUCCESS) readable by Spark
    and by pre-existing deployments, and the crash-safe tmp-rename
    swap is the same ``storeio`` protocol the Spark path uses."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def _read_rows(self) -> list[Row]:
        import pyarrow.parquet as pq

        storeio.recover(self.path)
        if not os.path.exists(self.path):
            return []
        # ParquetDataset ignores underscore-prefixed files (_SUCCESS,
        # _applied_batch.json), so Spark-written dirs read unchanged
        recs = pq.read_table(self.path).to_pylist()
        return [Row(**{c: rec.get(c) for c in _META_COLS}) for rec in recs]

    def all(self) -> dict[tuple[str, str | None, str | None], Row]:
        return {(r.data_source_id, r.sc, r.tb): r for r in self._read_rows()}

    def get_pos(self, data_source_id: str, sc: str | None = None, tb: str | None = None) -> str | None:
        row = self.all().get((data_source_id, sc, tb))
        return row.last_pos if row else None

    def upsert(
        self,
        data_source_id: str,
        last_pos: str,
        sc: str | None = None,
        tb: str | None = None,
        sync_type: str = "full",
    ) -> None:
        """Find-by-key then insert-or-update (SaveOrUpdateTableMeta /
        SavaOrUpdateCDCMeta analog, `internal/model/tablemeta.go:56-112`)."""
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        with _store_lock(self.path):
            rows = self.all()
            rows[(data_source_id, sc, tb)] = Row(
                data_source_id=data_source_id, sc=sc, tb=tb, last_pos=last_pos, sync_type=sync_type
            )
            table = pa.table(
                {c: [getattr(r, c) for r in rows.values()] for c in _META_COLS},
                schema=pa.schema([(c, pa.string()) for c in _META_COLS]),
            )
            tmp = f"{self.path}.tmp-{uuid.uuid4().hex[:8]}"
            os.makedirs(tmp)
            pq.write_table(table, os.path.join(tmp, "part-00000.parquet"))
            open(os.path.join(tmp, "_SUCCESS"), "w").close()
            storeio.promote_tmp(tmp, self.path)
