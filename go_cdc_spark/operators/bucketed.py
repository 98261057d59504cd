"""Bucketed-base-table MERGE: co-located anti-join for the 100 TB write
path.

``apply_changes`` (operators/cdc.py) anti-joins the base table on the
collapsed change keys. When the change set outgrows broadcast, a plain
parquet base pays a full shuffle of the 100 TB side per merge batch —
the dominant cost at scale. The fix is physical, not logical: store the
base table **bucketed by the primary key** (``bucketBy(n, pk)`` +
``sortBy`` via ``saveAsTable``). A bucketed scan reports its hash
partitioning to the planner, so the sort-merge anti-join needs NO
Exchange on the base side — only the (small) change side shuffles, into
the base's bucket layout. Cost per merge batch drops from
O(|base| shuffle) to O(|base| scan + |changes| shuffle), and the scan
prunes to buckets containing changed keys when the key predicate allows.

Write-back keeps the table bucketed: the merged result is written as a
NEW bucketed table version (fresh path), then swapped in under the
stable table name — the bucketed analog of the dynamic-partition-
overwrite swap in operators/merge.py, without ever overwriting a path
that is being read.
"""

from __future__ import annotations

import uuid as uuidlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .cdc import apply_changes

DEFAULT_BUCKETS = 8


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    path: str,
    num_buckets: int = DEFAULT_BUCKETS,
    mode: str = "overwrite",
) -> None:
    """Create/replace a parquet table bucketed+sorted by ``keys`` at an
    explicit path (external table: the swap in :func:`merge_into_bucketed`
    manages data directories itself)."""
    (
        df.write.format("parquet")
        .mode(mode)
        .option("path", path)
        .bucketBy(num_buckets, *keys)
        .sortBy(*keys)
        .saveAsTable(table)
    )


def merge_into_bucketed(
    spark: SparkSession,
    table: str,
    changes: DataFrame,
    keys: list[str],
    pos_threshold: str | None = None,
    num_buckets: int = DEFAULT_BUCKETS,
) -> str:
    """MERGE a typed change batch into a bucketed base table and swap in
    the merged result as the new table version. Returns the new data
    path. The read plan of the merge has no base-side Exchange (pinned
    by tests/test_bucketed_merge.py)."""
    base = spark.table(table)
    aligned = changes.select(
        *[F.col(f.name).cast(f.dataType) for f in base.schema.fields],
        "pos",
        "op",
    )
    merged = apply_changes(base, aligned, keys, pos_threshold=pos_threshold)

    old_path = (
        spark.sql(f"DESCRIBE FORMATTED {table}")
        .filter(F.col("col_name") == "Location")
        .first()["data_type"]
    )
    new_path = f"{old_path.rstrip('/')}-v{uuidlib.uuid4().hex[:8]}"
    tmp_table = f"{table}__swap_{uuidlib.uuid4().hex[:8]}"
    write_bucketed(merged, tmp_table, keys, new_path, num_buckets)
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(f"ALTER TABLE {tmp_table} RENAME TO {table}")
    return new_path
