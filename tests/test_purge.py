"""purge_keys (right-to-be-forgotten): partition-scoped deletion with
audit counts — untouched partitions' files must not be rewritten,
emptied partitions must not resurrect."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from go_cdc_spark.operators.merge import purge_keys


def _files(path):
    out = {}
    for root, _, names in os.walk(path):
        for n in names:
            if n.endswith(".parquet"):
                p = os.path.join(root, n)
                out[p] = os.path.getmtime(p)
    return out


def _base(spark, path):
    df = spark.createDataFrame(
        [(u, d, f"u{u}-d{d}") for d in (1, 2, 3) for u in range(d * 10, d * 10 + 5)],
        "user_id long, day int, payload string",
    )
    df.write.mode("overwrite").partitionBy("day").parquet(path)


def test_purge_rewrites_only_touched_partitions(spark, tmp_path):
    path = str(tmp_path / "events")
    _base(spark, path)
    before = _files(path)
    keys = spark.createDataFrame([(10,), (12,)], "user_id long")  # day=1 only
    audit = purge_keys(spark, path, keys, "user_id", "day")
    assert audit == {"partitions_rewritten": 1, "rows_purged": 2}
    left = spark.read.parquet(path)
    assert left.filter(F.col("user_id").isin(10, 12)).count() == 0
    assert left.count() == 13
    after = _files(path)
    untouched_before = {p: t for p, t in before.items() if "day=1" not in p}
    untouched_after = {p: t for p, t in after.items() if "day=1" not in p}
    assert untouched_before == untouched_after  # same files, same mtimes


def test_purge_removes_emptied_partition(spark, tmp_path):
    path = str(tmp_path / "events")
    _base(spark, path)
    keys = spark.createDataFrame([(u,) for u in range(10, 15)], "user_id long")
    audit = purge_keys(spark, path, keys, "user_id", "day")
    assert audit == {"partitions_rewritten": 1, "rows_purged": 5}
    left = spark.read.parquet(path)
    assert left.filter(F.col("day") == 1).count() == 0
    assert not os.path.exists(os.path.join(path, "day=1"))
    assert left.count() == 10


def test_purge_no_hits_is_noop(spark, tmp_path):
    path = str(tmp_path / "events")
    _base(spark, path)
    before = _files(path)
    keys = spark.createDataFrame([(999,)], "user_id long")
    audit = purge_keys(spark, path, keys, "user_id", "day")
    assert audit == {"partitions_rewritten": 0, "rows_purged": 0}
    assert _files(path) == before
