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


class CheckpointStore:
    """Upsert/lookup of sync positions, keyed (data_source_id, sc, tb)."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def _read_rows(self) -> list[Row]:
        storeio.recover(self.path)
        if not os.path.exists(self.path):
            return []
        return self.spark.read.schema(META_SCHEMA).parquet(self.path).collect()

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
        rows = self.all()
        rows[(data_source_id, sc, tb)] = Row(
            data_source_id=data_source_id, sc=sc, tb=tb, last_pos=last_pos, sync_type=sync_type
        )
        df = self.spark.createDataFrame(list(rows.values()), META_SCHEMA)
        storeio.swap_in(df.coalesce(1), self.path)
