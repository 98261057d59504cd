"""Partition-scoped MERGE: only touched partitions are rewritten —
untouched partitions keep their exact files (verified by inode/mtime),
and the merged state is correct."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from go_cdc_spark.operators.merge import merge_into_partitioned


def _files(path: str, part: str) -> dict[str, float]:
    d = os.path.join(path, part)
    return {
        f: os.path.getmtime(os.path.join(d, f))
        for f in os.listdir(d)
        if f.endswith(".parquet")
    }


def test_merge_rewrites_only_touched_partitions(spark, tmp_path):
    base_path = str(tmp_path / "nation")
    nation = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    nation.write.partitionBy("n_regionkey").parquet(base_path)

    untouched_before = _files(base_path, "n_regionkey=3")

    changes = spark.createDataFrame(
        [
            # update one nation in region 0
            (0, "RENAMED-ALGERIA", 0, "insert", "000000000101"),
            # brand-new nation in region 1
            (99, "NEWLAND", 1, "insert", "000000000102"),
            # stale change below the threshold: must be ignored
            (5, "STALE", 0, "insert", "000000000050"),
        ],
        ["n_nationkey", "n_name", "n_regionkey", "op", "pos"],
    )
    touched = merge_into_partitioned(
        spark,
        base_path,
        changes,
        keys=["n_nationkey"],
        partition_col="n_regionkey",
        pos_threshold="000000000100",
    )
    assert sorted(touched) == [0, 1]

    # untouched partition: identical files, same mtimes
    assert _files(base_path, "n_regionkey=3") == untouched_before

    out = spark.read.parquet(base_path)
    got = {r.n_nationkey: r.n_name for r in out.collect()}
    want = {r.n_nationkey: r.n_name for r in nation.collect()}
    want[0] = "RENAMED-ALGERIA"
    want[99] = "NEWLAND"  # stale change to key 5 ignored
    assert got == want
    # row count: original + the one insert
    assert out.count() == nation.count() + 1


def test_merge_delete_shrinks_partition(spark, tmp_path):
    base_path = str(tmp_path / "nation")
    nation = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    nation.write.partitionBy("n_regionkey").parquet(base_path)

    victim = nation.filter(F.col("n_regionkey") == 2).first()
    changes = spark.createDataFrame(
        [(victim.n_nationkey, victim.n_name, 2, "delete", "000000000999")],
        ["n_nationkey", "n_name", "n_regionkey", "op", "pos"],
    )
    merge_into_partitioned(
        spark, base_path, changes, keys=["n_nationkey"], partition_col="n_regionkey"
    )
    out = spark.read.parquet(base_path)
    assert out.count() == nation.count() - 1
    assert out.filter(F.col("n_nationkey") == victim.n_nationkey).count() == 0


def test_merge_delete_empties_partition(spark, tmp_path):
    """Deleting EVERY row of a partition must remove the partition
    itself — dynamic overwrite alone leaves the old files (the partition
    is absent from the written DataFrame) and the rows would resurface."""
    base_path = str(tmp_path / "nation")
    nation = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    nation.write.partitionBy("n_regionkey").parquet(base_path)

    victims = nation.filter(F.col("n_regionkey") == 2).collect()
    assert victims  # sanity: the partition starts non-empty
    changes = spark.createDataFrame(
        [(v.n_nationkey, v.n_name, 2, "delete", "000000000999") for v in victims],
        ["n_nationkey", "n_name", "n_regionkey", "op", "pos"],
    )
    merge_into_partitioned(
        spark, base_path, changes, keys=["n_nationkey"], partition_col="n_regionkey"
    )
    assert not os.path.isdir(os.path.join(base_path, "n_regionkey=2"))
    out = spark.read.parquet(base_path)
    assert out.filter(F.col("n_regionkey") == 2).count() == 0
    assert out.count() == nation.count() - len(victims)


def test_merge_rejects_null_partition_key(spark, tmp_path):
    import pytest

    base_path = str(tmp_path / "nation")
    spark.read.parquet("/root/testdata/sf0.001/nation.parquet").write.partitionBy(
        "n_regionkey"
    ).parquet(base_path)
    changes = spark.createDataFrame(
        [(1, "X", None, "insert", "000000000001")],
        "n_nationkey long, n_name string, n_regionkey int, op string, pos string",
    )
    with pytest.raises(ValueError, match="NULL"):
        merge_into_partitioned(
            spark, base_path, changes, keys=["n_nationkey"], partition_col="n_regionkey"
        )
