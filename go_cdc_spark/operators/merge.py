"""Partition-scoped MERGE: the 100 TB write path.

``apply_changes`` (operators/cdc.py) produces the merged *logical*
result; at test scale we overwrite the whole table. On a 100 TB base
table that is absurd — the correct physical strategy is: find the
partitions the change batch touches (metadata-sized), recompute ONLY
those partitions' rows, and swap them atomically via Spark's dynamic
partition overwrite (`spark.sql.sources.partitionOverwriteMode=dynamic`:
an overwrite write replaces exactly the partitions present in the
written DataFrame, leaving every other partition's files untouched).

Cost model: reading + rewriting is proportional to |touched partitions|,
not |table|. Choose the partition column so change locality is high
(ingest date, tenant, key-bucket) — a change batch touching every
partition degrades to a full rewrite, which no engine avoids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .cdc import apply_changes

# Characters Spark's file committer percent-escapes in partition directory
# names (ExternalCatalogUtils.needsEscaping): control chars + hive-special.
_ESCAPED_CHARS = set('"#%\'*/:=?\\\x7f{[]^') | {chr(c) for c in range(0x20)}


def _escape_partition_value(value_str: str) -> str:
    return "".join(
        f"%{ord(c):02X}" if c in _ESCAPED_CHARS else c for c in value_str
    )


def _delete_partition_dirs(
    spark: SparkSession, base_path: str, partition_col: str, value_strs: list
) -> None:
    """Remove ``{partition_col}={value}`` directories via the Hadoop
    FileSystem API (works on local/HDFS/S3A alike, unlike shutil)."""
    jvm = spark._jvm
    root = jvm.org.apache.hadoop.fs.Path(base_path)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    for s in value_strs:
        part_dir = jvm.org.apache.hadoop.fs.Path(
            root, f"{partition_col}={_escape_partition_value(s)}"
        )
        fs.delete(part_dir, True)


def merge_into_partitioned(
    spark: SparkSession,
    base_path: str,
    changes: DataFrame,
    keys: list[str],
    partition_col: str,
    pos_threshold: str | None = None,
) -> list:
    """MERGE a typed change batch into a hive-partitioned parquet table,
    rewriting only the touched partitions. Returns the partition values
    that were rewritten.

    ``changes`` carries the table's columns (incl. ``partition_col``)
    plus ``pos``/``op``. Keys must not migrate across partitions (the
    usual contract: partition column is immutable or part of the key —
    enforced here by requiring partition_col ∈ keys ∪ immutables is the
    caller's schema design; a migrated key would need a delete+insert
    pair, which the envelope already expresses).
    """
    # Metadata-sized driver list: which partitions does this batch touch?
    # The string form rides along because it is exactly what the file
    # committer uses for directory naming (cast-to-string + hive escape)
    # — needed below to delete partitions the merge empties out.
    pairs = (
        changes.select(
            F.col(partition_col).alias("v"),
            F.col(partition_col).cast("string").alias("s"),
        )
        .distinct()
        .collect()
    )
    touched = [r["v"] for r in pairs]
    str_of = {r["v"]: r["s"] for r in pairs}
    if None in touched:
        # NULL never matches isin() — the base rows would silently be
        # missed and the write would target __HIVE_DEFAULT_PARTITION__.
        raise ValueError(
            f"change batch has NULL {partition_col!r}; partition keys must be non-null"
        )
    if not touched:
        return []

    base = spark.read.parquet(base_path).filter(
        F.col(partition_col).isin(touched)
    )
    # Align change images to the base schema: an inferred change batch
    # (e.g. python ints → LongType) must not drift the table's parquet
    # types — the overwrite would otherwise write mixed-type partitions.
    aligned = changes.select(
        *[F.col(f.name).cast(f.dataType) for f in base.schema.fields],
        "pos",
        "op",
    )
    merged = apply_changes(
        base, aligned, keys, pos_threshold=pos_threshold
    ).persist()
    try:
        # Dynamic overwrite replaces ONLY partitions present in the
        # written DataFrame. A partition whose every row was deleted is
        # absent from `merged`, so its old files would survive and the
        # deleted rows resurface — diff it out and remove it explicitly.
        present = {
            r[0] for r in merged.select(partition_col).distinct().collect()
        }
        emptied = [str_of[v] for v in touched if v not in present]

        prev = spark.conf.get(
            "spark.sql.sources.partitionOverwriteMode", "static"
        )
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                merged.write.mode("overwrite")
                .partitionBy(partition_col)
                .parquet(base_path)
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        if emptied:
            _delete_partition_dirs(spark, base_path, partition_col, emptied)
    finally:
        merged.unpersist()
    return touched


def purge_keys(
    spark: SparkSession,
    base_path: str,
    keys_df: DataFrame,
    key_col: str,
    partition_col: str,
) -> dict:
    """Right-to-be-forgotten sweep: delete every row whose ``key_col``
    appears in ``keys_df``, rewriting ONLY the partitions that contain
    such rows. Returns audit counts ({'partitions_rewritten', 'rows_purged'})
    — the compliance evidence a deletion request needs.

    Scale shape: the purge-key set is small by nature (one user, one
    tenant, a court order's list) — it broadcasts; locating touched
    partitions is one aggregation over the semi-join, metadata-sized
    output; the rewrite cost is proportional to |touched partitions|,
    exactly like MERGE. Partitions emptied entirely are removed (same
    resurrection hazard dynamic overwrite has for MERGE).
    """
    keys = keys_df.select(key_col).distinct()
    base = spark.read.parquet(base_path)
    hit = base.join(F.broadcast(keys), key_col, "left_semi")
    pairs = (
        hit.groupBy(
            F.col(partition_col).alias("v"),
            F.col(partition_col).cast("string").alias("s"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    if not pairs:
        return {"partitions_rewritten": 0, "rows_purged": 0}
    touched = [r["v"] for r in pairs]
    str_of = {r["v"]: r["s"] for r in pairs}
    rows_purged = sum(r["n"] for r in pairs)

    kept = (
        base.filter(F.col(partition_col).isin(touched))
        .join(F.broadcast(keys), key_col, "left_anti")
        .persist()
    )
    try:
        present = {r[0] for r in kept.select(partition_col).distinct().collect()}
        emptied = [str_of[v] for v in touched if v not in present]
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            kept.write.mode("overwrite").partitionBy(partition_col).parquet(base_path)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        if emptied:
            _delete_partition_dirs(spark, base_path, partition_col, emptied)
    finally:
        kept.unpersist()
    return {"partitions_rewritten": len(touched), "rows_purged": rows_purged}
