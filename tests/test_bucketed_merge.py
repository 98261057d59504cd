"""Bucketed-base MERGE: the anti-join must NOT shuffle the base side
(the whole point of bucketing the 100 TB table by PK), the merged result
must equal the plain-parquet merge, and the table must stay bucketed
across merge cycles."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from go_cdc_spark.operators.bucketed import merge_into_bucketed, write_bucketed
from go_cdc_spark.operators.cdc import apply_changes

SF = "/root/testdata/sf0.001"


@pytest.fixture
def no_broadcast(spark):
    """Force SMJ so the bucketing claim is actually exercised (a
    broadcast join would hide the base-side exchange question)."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def _changes(spark):
    return spark.createDataFrame(
        [
            (3, "CANADA-v2", 1, "insert", "000000000101"),
            (99, "NEWLAND", 1, "insert", "000000000102"),
            (5, None, None, "delete", "000000000103"),
        ],
        # key dtypes MUST match the base table exactly: a cast on the
        # join key disables bucketed-scan use ("Bucketed: false (disabled
        # by query planner)") and the base side shuffles again
        "n_nationkey int, n_name string, n_regionkey int, op string, pos string",
    )


def _formatted(df) -> str:
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def _n_exchanges(df) -> int:
    return df._jdf.queryExecution().executedPlan().toString().count(
        "Exchange hashpartitioning"
    )


def test_bucketed_antijoin_has_no_base_exchange(spark, tmp_path, no_broadcast):
    nation = spark.read.parquet(f"{SF}/nation.parquet")
    write_bucketed(nation, "nation_b", ["n_nationkey"], str(tmp_path / "nb"))
    try:
        base = spark.table("nation_b")
        changes = _changes(spark)

        merged_bucketed = apply_changes(base, changes, ["n_nationkey"])
        merged_plain = apply_changes(nation, changes, ["n_nationkey"])

        plan = _formatted(merged_bucketed)
        assert "Bucketed: true" in plan, plan
        # same logical plan, one fewer shuffle: the base side reads
        # pre-partitioned buckets instead of exchanging 100 TB
        assert _n_exchanges(merged_bucketed) == _n_exchanges(merged_plain) - 1

        # identical result (order-insensitive)
        got = {(r.n_nationkey, r.n_name) for r in merged_bucketed.collect()}
        want = {(r.n_nationkey, r.n_name) for r in merged_plain.collect()}
        assert got == want
    finally:
        spark.sql("DROP TABLE IF EXISTS nation_b")


def test_merge_into_bucketed_swaps_and_stays_bucketed(spark, tmp_path, no_broadcast):
    nation = spark.read.parquet(f"{SF}/nation.parquet")
    write_bucketed(nation, "nation_m", ["n_nationkey"], str(tmp_path / "nm"))
    try:
        merge_into_bucketed(spark, "nation_m", _changes(spark), ["n_nationkey"])

        out = spark.table("nation_m")
        state = {r.n_nationkey: r.n_name for r in out.collect()}
        expect = {r.n_nationkey: r.n_name for r in nation.collect()}
        expect[3] = "CANADA-v2"
        expect[99] = "NEWLAND"
        del expect[5]
        assert state == expect

        # still bucketed: a second merge's anti-join again needs no
        # base-side exchange
        desc = spark.sql("DESCRIBE FORMATTED nation_m").collect()
        props = {r.col_name: r.data_type for r in desc}
        assert props.get("Num Buckets") == "8"
        second = apply_changes(
            spark.table("nation_m"),
            _changes(spark).withColumn("pos", F.concat(F.lit("1"), "pos")),
            ["n_nationkey"],
        )
        plan = _formatted(second)
        assert "Bucketed: true" in plan
    finally:
        spark.sql("DROP TABLE IF EXISTS nation_m")
