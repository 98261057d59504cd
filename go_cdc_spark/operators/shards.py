"""Training-shard writer: deterministic, size-bounded output layout.

The last stage of a data pipeline is writing shards a trainer can
stream: a fixed shard count (hash of a stable key → same row, same
shard, every run), rows ordered within each shard, and files capped so
no reader ever pulls a multi-GB object. All three are Spark-native:

- ``repartition(n, key)`` — hash-partitioning on the stable key is the
  deterministic shard assignment (vs round-robin ``repartition(n)``,
  which depends on input split order and breaks re-run reproducibility).
- ``sortWithinPartitions`` — per-shard order without a global sort
  (a total ORDER BY would range-exchange the full corpus again).
- ``maxRecordsPerFile`` — the writer splits files at the cap with no
  extra shuffle or job.

At 100 TB the shard count is the write-parallelism knob; one shard =
one task = one-or-more files. Skewed shard keys are the caller's to
salt (see operators/skew.py) — hash sharding on a unique document id
is uniform by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_training_shards(
    df: DataFrame,
    path: str,
    shard_key: str,
    n_shards: int,
    order_by: list[str] | None = None,
    max_records_per_file: int | None = None,
    fmt: str = "parquet",
) -> None:
    """Write ``df`` as ``n_shards`` hash shards keyed on ``shard_key``,
    each internally sorted by ``order_by`` (default: the shard key),
    files capped at ``max_records_per_file`` rows."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    out = df.repartition(n_shards, F.col(shard_key)).sortWithinPartitions(
        *(order_by or [shard_key])
    )
    writer = out.write.mode("overwrite").format(fmt)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.save(path)


def shard_manifest(spark, path: str, shard_key: str) -> DataFrame:
    """Per-file manifest of a shard directory: file, row count, key
    range — the index a streaming trainer (or a resumed job) reads
    instead of listing and footer-probing every object."""
    return (
        spark.read.parquet(path)
        .select(F.col(shard_key), F.input_file_name().alias("file"))
        .groupBy("file")
        .agg(
            F.count("*").alias("n_rows"),
            F.min(shard_key).alias("key_min"),
            F.max(shard_key).alias("key_max"),
        )
    )
