"""DDL-driven schema evolution (A19's consumer-side half): MySQL ALTER
statements arriving in the changelog evolve the materialized table —
added columns backfill NULL on pre-DDL rows, dropped columns vanish,
and the evolved schema survives a materializer restart (the persisted
state, not the original snapshot, is the schema authority)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from go_cdc_spark.functions.ddl import (
    UnsupportedDdl,
    evolve_schema,
    mysql_to_spark_type,
    parse_alter,
)
from go_cdc_spark.sources.changelog import format_pos
from go_cdc_spark.streaming.pipeline import StreamingMaterializer, read_changelog_stream

# ---------------------------------------------------------------------------
# parser units
# ---------------------------------------------------------------------------


def test_parse_add_column_variants():
    t, actions = parse_alter(
        "ALTER TABLE bank.accounts ADD COLUMN `note` varchar(40), ADD flag tinyint(1)"
    )
    assert t == "accounts"
    assert actions[0][:2] == ("add", "note")
    assert isinstance(actions[0][2], T.StringType)
    assert actions[1][:2] == ("add", "flag")
    assert isinstance(actions[1][2], T.BooleanType)


def test_parse_drop_column_and_ignores_index_clauses():
    t, actions = parse_alter(
        "alter table accounts drop column note, ADD INDEX idx_name (name), DROP PRIMARY KEY"
    )
    assert t == "accounts"
    assert actions == [("drop", "note")]


def test_parse_non_alter_returns_none():
    assert parse_alter("CREATE TABLE t (id INT)") is None
    assert parse_alter("TRUNCATE TABLE t") is None


def test_parse_unsupported_clause_raises():
    with pytest.raises(UnsupportedDdl):
        parse_alter("ALTER TABLE t MODIFY COLUMN a bigint")


@pytest.mark.parametrize(
    ("decl", "expected"),
    [
        ("bigint", T.LongType()),
        ("int(11)", T.LongType()),
        ("tinyint(1)", T.BooleanType()),
        ("decimal(12, 4)", T.DecimalType(12, 4)),
        ("datetime", T.TimestampNTZType()),
        ("varbinary(64)", T.BinaryType()),
        ("text", T.StringType()),
    ],
)
def test_type_mapping(decl, expected):
    assert mysql_to_spark_type(decl) == expected


def test_evolve_schema_idempotent_and_table_filtered():
    base = T.StructType([T.StructField("id", T.LongType())])
    q = "ALTER TABLE accounts ADD COLUMN note varchar(10)"
    s1 = evolve_schema(base, q, table="accounts")
    assert [f.name for f in s1.fields] == ["id", "note"]
    assert evolve_schema(s1, q, table="accounts") is s1  # re-delivery no-op
    assert evolve_schema(base, q, table="other_table") is base  # cross-table


# ---------------------------------------------------------------------------
# end-to-end through the materializer
# ---------------------------------------------------------------------------

ACCOUNTS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
    ]
)


def _ev(op, pos, *, id_=None, data=None, query=None, minute=0):
    e = {
        "data_source": "ds1",
        "schema": "bank",
        "table": "accounts",
        "op": op,
        "ts": f"2024-01-01T00:{minute:02d}:00.000000",
        "pos": format_pos(pos),
        "txn_id": f"uuid1:{pos}",
    }
    if op == "ddl":
        e["data"] = {"query": query}
    elif op == "delete":
        e["before"] = {"id": str(id_)}
    else:
        e["data"] = dict({"id": str(id_)}, **(data or {}))
    return e


def _write_segment(dirpath, name, events):
    dirpath.mkdir(parents=True, exist_ok=True)
    with open(dirpath / name, "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")


def _mat(spark, tmp_path, **kw):
    snap = spark.createDataFrame(
        [Row(id=1, name="alice"), Row(id=2, name="bob")], ACCOUNTS_SCHEMA
    )
    return StreamingMaterializer(
        spark,
        snap,
        keys=["id"],
        state_path=str(tmp_path / "state"),
        pos_threshold=format_pos(100),
        table="accounts",
        **kw,
    )


def _run(mat, spark, seg, ckpt):
    q = mat.start(read_changelog_stream(spark, str(seg)), str(ckpt))
    q.awaitTermination(120)


def test_add_column_mid_stream(spark, tmp_path):
    seg = tmp_path / "seg"
    _write_segment(seg, "s1.json", [
        _ev("insert", 110, id_=3, data={"name": "carol"}, minute=1),
        _ev("ddl", 120, query="ALTER TABLE accounts ADD COLUMN note varchar(40)", minute=2),
        _ev("insert", 130, id_=4, data={"name": "dave", "note": "vip"}, minute=3),
        _ev("update", 140, id_=1, data={"name": "alice2", "note": "gold"}, minute=4),
    ])
    mat = _mat(spark, tmp_path)
    _run(mat, spark, seg, tmp_path / "ckpt")

    out = {r.id: r for r in mat.read_table().collect()}
    assert set(out) == {1, 2, 3, 4}
    assert out[4].note == "vip" and out[1].note == "gold"
    # pre-DDL rows backfill NULL
    assert out[2].note is None and out[3].note is None


def test_drop_column_mid_stream(spark, tmp_path):
    seg = tmp_path / "seg"
    _write_segment(seg, "s1.json", [
        _ev("ddl", 110, query="ALTER TABLE accounts DROP COLUMN name", minute=1),
        _ev("insert", 120, id_=3, minute=2),
    ])
    mat = _mat(spark, tmp_path)
    _run(mat, spark, seg, tmp_path / "ckpt")
    df = mat.read_table()
    assert df.columns == ["id"]
    assert {r.id for r in df.collect()} == {1, 2, 3}


def test_drop_merge_key_refused(spark, tmp_path):
    seg = tmp_path / "seg"
    _write_segment(seg, "s1.json", [
        _ev("ddl", 110, query="ALTER TABLE accounts DROP COLUMN id", minute=1),
    ])
    mat = _mat(spark, tmp_path)
    q = mat.start(read_changelog_stream(spark, str(seg)), str(tmp_path / "ckpt"))
    with pytest.raises(Exception, match="merge key"):
        q.awaitTermination(120)
        q.stop()


def test_evolution_survives_restart(spark, tmp_path):
    seg = tmp_path / "seg"
    _write_segment(seg, "s1.json", [
        _ev("ddl", 110, query="ALTER TABLE accounts ADD COLUMN note varchar(40)", minute=1),
        _ev("insert", 120, id_=3, data={"name": "carol", "note": "n3"}, minute=2),
    ])
    mat = _mat(spark, tmp_path)
    _run(mat, spark, seg, tmp_path / "ckpt")
    assert "note" in mat.read_table().columns

    # new materializer instance from the ORIGINAL (pre-DDL) snapshot:
    # must adopt the evolved persisted schema, not regress it
    mat2 = _mat(spark, tmp_path)
    assert "note" in [f.name for f in mat2.schema.fields]
    _write_segment(seg, "s2.json", [
        _ev("update", 130, id_=3, data={"name": "carol", "note": "n3b"}, minute=3),
    ])
    _run(mat2, spark, seg, tmp_path / "ckpt")
    out = {r.id: r for r in mat2.read_table().collect()}
    assert out[3].note == "n3b"


def test_parse_rename_and_change_column():
    t, actions = parse_alter("ALTER TABLE accounts RENAME COLUMN name TO full_name")
    assert t == "accounts" and actions == [("rename", "name", "full_name", None)]
    t, actions = parse_alter("ALTER TABLE accounts CHANGE COLUMN name nm VARCHAR(80)")
    assert actions[0][:3] == ("rename", "name", "nm")
    assert isinstance(actions[0][3], T.StringType)
    # table-level rename stays refused
    with pytest.raises(UnsupportedDdl):
        parse_alter("ALTER TABLE accounts RENAME TO accounts2")


def test_evolve_schema_rename_is_idempotent_and_retypes():
    sch = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("name", T.StringType())]
    )
    once = evolve_schema(sch, "ALTER TABLE t RENAME COLUMN name TO nm")
    assert [f.name for f in once.fields] == ["id", "nm"]
    # redelivered statement: old column gone → no-op
    again = evolve_schema(once, "ALTER TABLE t RENAME COLUMN name TO nm")
    assert again is once
    # CHANGE a a BIGINT retypes in place (name-only diffing would drop it)
    retyped = evolve_schema(once, "ALTER TABLE t CHANGE nm nm BIGINT")
    assert isinstance(retyped["nm"].dataType, T.LongType)


def test_rename_column_mid_stream_carries_data(spark, tmp_path):
    """RENAME COLUMN must carry existing state data under the new name;
    events on BOTH sides of the DDL inside one batch resolve (old name
    before, new name after)."""
    seg = tmp_path / "seg"
    _write_segment(seg, "s1.json", [
        _ev("insert", 110, id_=3, data={"name": "carol"}, minute=1),
        _ev("ddl", 120, query="ALTER TABLE accounts RENAME COLUMN name TO full_name",
            minute=2),
        _ev("insert", 130, id_=4, data={"full_name": "dave"}, minute=3),
    ])
    mat = _mat(spark, tmp_path)
    _run(mat, spark, seg, tmp_path / "ckpt")

    out = {r.id: r for r in mat.read_table().collect()}
    assert set(out) == {1, 2, 3, 4}
    # snapshot rows carried under the new name — not NULLed
    assert out[1].full_name == "alice" and out[2].full_name == "bob"
    assert out[3].full_name == "carol"  # same-batch pre-DDL event
    assert out[4].full_name == "dave"   # post-DDL event
    assert "name" not in mat.read_table().columns


def test_rename_merge_key_refused(spark, tmp_path):
    seg = tmp_path / "seg"
    _write_segment(seg, "s1.json", [
        _ev("ddl", 110, query="ALTER TABLE accounts RENAME COLUMN id TO account_id",
            minute=1),
    ])
    mat = _mat(spark, tmp_path)
    import py4j.protocol

    with pytest.raises(Exception) as exc:
        _run(mat, spark, seg, tmp_path / "ckpt")
    assert "renames merge key" in str(exc.value)


def test_parse_bare_table_rename_refused():
    """MySQL allows `ALTER TABLE t RENAME new_name` (TO/AS optional) —
    it must raise like the TO/AS forms, not fall through silently (the
    materializer would keep the old table identity)."""
    with pytest.raises(UnsupportedDdl):
        parse_alter("ALTER TABLE accounts RENAME accounts2")
    with pytest.raises(UnsupportedDdl):
        parse_alter("ALTER TABLE accounts RENAME `accounts2`")
    with pytest.raises(UnsupportedDdl):
        parse_alter("ALTER TABLE accounts RENAME AS accounts2")
    # index/key renames still pass through as non-schema clauses
    t, actions = parse_alter("ALTER TABLE accounts RENAME INDEX i1 TO i2")
    assert t == "accounts" and actions == []
    t, actions = parse_alter("ALTER TABLE accounts RENAME KEY k1 TO k2")
    assert t == "accounts" and actions == []


def test_chained_renames_one_batch_carry_state_data(spark, tmp_path):
    """Two renames of the same column landing in ONE micro-batch
    (name→full_name→fn): stored state still holds `name`, so the state
    projection must follow the pending-rename map transitively or the
    snapshot rows' data NULLs out."""
    seg = tmp_path / "seg"
    _write_segment(seg, "s1.json", [
        _ev("ddl", 110, query="ALTER TABLE accounts RENAME COLUMN name TO full_name",
            minute=1),
        _ev("ddl", 120, query="ALTER TABLE accounts RENAME COLUMN full_name TO fn",
            minute=2),
        _ev("insert", 130, id_=3, data={"fn": "carol"}, minute=3),
    ])
    mat = _mat(spark, tmp_path)
    _run(mat, spark, seg, tmp_path / "ckpt")

    out = {r.id: r for r in mat.read_table().collect()}
    assert set(out) == {1, 2, 3}
    # snapshot rows carried through BOTH hops — not NULLed
    assert out[1].fn == "alice" and out[2].fn == "bob"
    assert out[3].fn == "carol"
    assert set(mat.read_table().columns) == {"id", "fn"}


def test_parse_add_column_default_literals():
    t, actions = parse_alter(
        "ALTER TABLE accounts ADD COLUMN note varchar(40) DEFAULT 'n/a', "
        "ADD score int DEFAULT 5, ADD ratio double DEFAULT 2.5, "
        "ADD ok tinyint(1) DEFAULT TRUE, ADD extra text DEFAULT NULL, "
        "ADD plain text"
    )
    assert t == "accounts"
    by_name = {a[1]: a for a in actions}
    assert by_name["note"][3] == "n/a"
    assert by_name["score"][3] == 5
    assert by_name["ratio"][3] == 2.5
    assert by_name["ok"][3] is True
    assert by_name["extra"][3] is None  # explicit NULL = no default
    assert by_name["plain"][3] is None
    # quoted-quote escape
    _, a2 = parse_alter("ALTER TABLE t ADD c varchar(9) DEFAULT 'it''s'")
    assert a2[0][3] == "it's"


def test_parse_time_derived_default_refused():
    with pytest.raises(UnsupportedDdl, match="time-derived"):
        parse_alter("ALTER TABLE t ADD c datetime DEFAULT CURRENT_TIMESTAMP")
    with pytest.raises(UnsupportedDdl, match="time-derived"):
        parse_alter("ALTER TABLE t ADD c datetime DEFAULT NOW()")


def test_add_column_default_backfills_and_decodes(spark, tmp_path):
    """ADD COLUMN ... DEFAULT: existing rows backfill the literal (the
    MySQL instant-DDL surface), post-DDL images missing the column read
    it too, and explicit values (including those equal to the default)
    win. Defaults survive restart via the persisted sidecar."""
    seg = tmp_path / "seg"
    _write_segment(seg, "s1.json", [
        _ev("ddl", 110,
            query="ALTER TABLE accounts ADD COLUMN tier varchar(8) DEFAULT 'basic'",
            minute=1),
        _ev("insert", 120, id_=3, data={"name": "carol", "tier": "gold"}, minute=2),
        _ev("insert", 130, id_=4, data={"name": "dave"}, minute=3),  # image lacks tier
    ])
    mat = _mat(spark, tmp_path)
    _run(mat, spark, seg, tmp_path / "ckpt")

    out = {r.id: r for r in mat.read_table().collect()}
    assert out[1].tier == "basic" and out[2].tier == "basic"  # backfilled
    assert out[3].tier == "gold"    # explicit value wins
    assert out[4].tier == "basic"   # post-DDL image without the column

    # restart from the ORIGINAL snapshot: evolved schema + defaults hold
    mat2 = _mat(spark, tmp_path)
    _write_segment(seg, "s2.json", [
        _ev("insert", 140, id_=5, data={"name": "eve"}, minute=4),
    ])
    _run(mat2, spark, seg, tmp_path / "ckpt")
    out2 = {r.id: r for r in mat2.read_table().collect()}
    assert out2[5].tier == "basic"
