"""Debezium envelope adapter: public Kafka-Connect change messages map
onto the engine's change-event schema and drive the same downstream
MERGE semantics."""

from __future__ import annotations

import datetime
import json

from pyspark.sql import functions as F

from go_cdc_spark.operators.cdc import apply_changes
from go_cdc_spark.sources.changelog import CHANGE_EVENT_SCHEMA
from go_cdc_spark.sources.debezium import (
    debezium_schema_changes,
    debezium_to_change_events,
)


def _msg(op, after=None, before=None, gtid=None, pos=10, txn=None, **src):
    payload = {
        "before": before,
        "after": after,
        "op": op,
        "ts_ms": 1700000000000,
        "source": {
            "name": "dbz1",
            "db": "shop",
            "table": "users",
            "gtid": gtid,
            "file": "binlog.000007",
            "pos": pos,
            "row": 0,
            **src,
        },
        "transaction": {"id": txn} if txn else None,
    }
    return json.dumps(payload)


def test_data_change_mapping(spark):
    rows = [
        (_msg("c", after={"id": 1, "name": "ann"}),),
        (_msg("r", after={"id": 2, "name": "bob"}),),  # snapshot read
        (
            _msg(
                "u",
                after={"id": 1, "name": "ann2"},
                before={"id": 1, "name": "ann"},
                gtid="uuid-a:5",
                txn="txn-9",
            ),
        ),
        (_msg("d", before={"id": 2, "name": "bob"}, pos=30),),
        (_msg("t"),),  # truncate: no row images, dropped here
        # converter envelope with schemas enabled: {"schema":…, "payload":…}
        (
            json.dumps(
                {
                    "schema": {"type": "struct"},
                    "payload": json.loads(_msg("c", after={"id": 3, "name": "cyn"}, pos=40)),
                }
            ),
        ),
        ("not json at all",),
    ]
    df = spark.createDataFrame(rows, "value string")
    out = debezium_to_change_events(df)
    assert [(f.name, f.dataType) for f in out.schema.fields] == [
        (f.name, f.dataType) for f in CHANGE_EVENT_SCHEMA.fields
    ]
    got = {(r.op, r.data["id"] if r.data else None): r for r in out.collect()}
    assert len(got) == 5  # t + unparseable dropped

    ins = got[("insert", "1")]
    assert ins.data == {"id": "1", "name": "ann"}
    assert ins.schema == "shop" and ins.table == "users"
    assert ins.data_source == "dbz1"
    assert ins.pos == "binlog.000007:000000000010:00000000"
    assert ins.ts == datetime.datetime(2023, 11, 14, 22, 13, 20)

    assert ("insert", "2") in got  # r → insert
    upd = got[("update", "1")]
    assert upd.before == {"id": "1", "name": "ann"}
    assert upd.pos == "uuid-a:5" and upd.txn_id == "txn-9"

    dele = got[("delete", "2")]
    assert dele.data == {"id": "2", "name": "bob"}  # delete image from before

    assert ("insert", "3") in got  # unwrapped converter envelope


def test_debezium_feeds_the_materializer(spark):
    """End-to-end: Debezium messages → envelope → typed images →
    latest-wins MERGE produces the expected table state."""
    msgs = [
        (_msg("c", after={"id": 1, "name": "ann"}, pos=10),),
        (_msg("u", after={"id": 1, "name": "ann2"}, before={"id": 1, "name": "ann"}, pos=20),),
        (_msg("c", after={"id": 2, "name": "bob"}, pos=30),),
        (_msg("d", before={"id": 2, "name": "bob"}, pos=40),),
    ]
    events = debezium_to_change_events(spark.createDataFrame(msgs, "value string"))
    snap = spark.createDataFrame([], "id bigint, name string")
    typed = events.select(
        F.col("data").getItem("id").cast("bigint").alias("id"),
        F.col("data").getItem("name").alias("name"),
        "pos",
        "op",
    )
    final = apply_changes(snap, typed, keys=["id"])
    assert [(r.id, r.name) for r in final.orderBy("id").collect()] == [(1, "ann2")]


def test_schema_change_mapping(spark):
    msg = json.dumps(
        {
            "databaseName": "shop",
            "ddl": "ALTER TABLE users ADD COLUMN age INT",
            "ts_ms": 1700000000000,
            "source": {
                "name": "dbz1",
                "db": "shop",
                "table": "users",
                "gtid": None,
                "file": "binlog.000007",
                "pos": 99,
                "row": 0,
            },
        }
    )
    out = debezium_schema_changes(spark.createDataFrame([(msg,)], "value string"))
    r = out.collect()[0]
    assert r.op == "ddl"
    assert r.data == {"query": "ALTER TABLE users ADD COLUMN age INT"}
    assert r.schema == "shop" and r.table == "users"
    assert r.pos.startswith("binlog.000007:")
