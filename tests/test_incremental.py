"""Incremental-stream operators: event demux + DDL classification (A19),
GTID watermark accumulation (A21), update before/after pairing (A22)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from go_cdc_spark.functions.gtid import GtidSet
from go_cdc_spark.streaming.incremental import (
    KIND_DDL,
    KIND_GTID,
    KIND_QUERY,
    KIND_ROW,
    accumulate_gtid,
    classify_events,
    gtid_watermark,
    pair_update_images,
)

RAW_SCHEMA = T.StructType(
    [
        T.StructField("pos", T.StringType()),
        T.StructField("uuid", T.StringType()),
        T.StructField("gno", T.LongType()),
        T.StructField("query", T.StringType()),
        T.StructField("op", T.StringType()),
    ]
)

U1 = "3e11fa47-71ca-11e1-9e33-c80aa9429562"


def test_classify_events(spark):
    rows = [
        ("001", U1, 5, None, None),
        ("002", None, None, "  create table t (a int)", None),
        ("003", None, None, "TRUNCATE t", None),
        ("004", None, None, "BEGIN", None),
        ("005", None, None, "insert into t values (1)", None),
        ("006", None, None, None, "insert"),
        ("007", None, None, None, "delete"),
    ]
    df = classify_events(spark.createDataFrame(rows, RAW_SCHEMA))
    kinds = {r.pos: r.event_kind for r in df.collect()}
    assert kinds == {
        "001": KIND_GTID,
        "002": KIND_DDL,  # lowercase + leading spaces still classified
        "003": KIND_DDL,
        "004": KIND_QUERY,  # BEGIN is not DDL
        "005": KIND_QUERY,  # DML text arriving as a query event is not DDL
        "006": KIND_ROW,
        "007": KIND_ROW,
    }


def test_ddl_word_boundary(spark):
    # 'CREATED...' must not classify as DDL (\b guard beyond the reference's
    # plain prefix match, which would misfire here)
    rows = [("001", None, None, "CREATEDUMMY x", None)]
    df = classify_events(spark.createDataFrame(rows, RAW_SCHEMA))
    assert df.first().event_kind == KIND_QUERY


def test_gtid_watermark_and_accumulate(spark):
    u2 = "aaaaaaaa-bbbb-cccc-dddd-eeeeeeeeeeee"
    rows = [
        ("p1", U1, 5, None, None),
        ("p2", U1, 6, None, None),
        ("p3", U1, 9, None, None),
        ("p4", u2, 1, None, None),
        ("p5", None, None, None, "insert"),  # non-GTID rows ignored
    ]
    df = spark.createDataFrame(rows, RAW_SCHEMA)
    wm = {r.uuid: (r.min_gno, r.max_gno) for r in gtid_watermark(df).collect()}
    assert wm == {U1: (5, 9), u2: (1, 1)}

    start = GtidSet.parse(f"{U1}:1-3")
    out = accumulate_gtid(gtid_watermark(df).collect(), start)
    assert out.covers(U1, 2) and out.covers(U1, 7) and out.covers(u2, 1)
    assert not out.covers(U1, 4)  # gap 4 was never seen: two ranges, not one
    assert not out.covers(u2, 2)


PAIR_SCHEMA = T.StructType(
    [
        T.StructField("txn_id", T.StringType()),
        T.StructField("pos", T.StringType()),
        T.StructField("op", T.StringType()),
        T.StructField("data", T.MapType(T.StringType(), T.StringType())),
    ]
)


def test_pair_update_images(spark):
    rows = [
        ("t1", "001", "insert", {"id": "1", "v": "a"}),
        # update arrives as (before, after) consecutive rows, handler.go:100-108
        ("t1", "002", "update", {"id": "1", "v": "a"}),
        ("t1", "003", "update", {"id": "1", "v": "b"}),
        ("t2", "004", "update", {"id": "2", "v": "x"}),
        ("t2", "005", "update", {"id": "2", "v": "y"}),
        ("t2", "006", "update", {"id": "2", "v": "y"}),
        ("t2", "007", "update", {"id": "2", "v": "z"}),
        ("t3", "008", "delete", {"id": "3", "v": "q"}),
    ]
    df = spark.createDataFrame(rows, PAIR_SCHEMA)
    out = {r.pos: r for r in pair_update_images(df).collect()}
    assert len(out) == 5  # 1 insert + 3 folded updates + 1 delete

    upd1 = out["003"]
    assert upd1.op == "update" and upd1.before["v"] == "a" and upd1.data["v"] == "b"
    # two updates in one txn pair independently, in position order
    assert out["005"].before["v"] == "x" and out["005"].data["v"] == "y"
    assert out["007"].before["v"] == "y" and out["007"].data["v"] == "z"
    # insert: after-image only; delete: before-image only (event.go:7-8)
    assert out["001"].before is None and out["001"].data["v"] == "a"
    assert out["008"].data is None and out["008"].before["v"] == "q"
