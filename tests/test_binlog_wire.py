"""MySQL binlog WIRE-FORMAT decoder tests (VERDICT r12 #1).

The reference's capture identity is demuxing replication-protocol
events (`internal/cannal/incremental.go:180-231`) and pairing update
before/after row images (`handler.go:100-108`). These tests synthesize
genuine binlog v4 BYTES with an independent encoder
(tests/binlog_fixture.py, written from the same public layout) and
prove the decoder (go_cdc_spark/sources/binlog.py) turns them into the
engine's envelope — including the end-to-end golden-sequence
convergence through the EXISTING streaming drain.
"""

from __future__ import annotations

import pytest

from go_cdc_spark.sources.binlog import (
    MYSQL_TYPE_BLOB,
    MYSQL_TYPE_DATE,
    MYSQL_TYPE_DATETIME2,
    MYSQL_TYPE_DOUBLE,
    MYSQL_TYPE_FLOAT,
    MYSQL_TYPE_INT24,
    MYSQL_TYPE_LONG,
    MYSQL_TYPE_LONGLONG,
    MYSQL_TYPE_NEWDECIMAL,
    MYSQL_TYPE_SHORT,
    MYSQL_TYPE_STRING,
    MYSQL_TYPE_TIME2,
    MYSQL_TYPE_TIMESTAMP2,
    MYSQL_TYPE_TINY,
    MYSQL_TYPE_VARCHAR,
    MYSQL_TYPE_YEAR,
    BinlogEnvelopeDecoder,
    BinlogFormatError,
    BinlogReader,
    binlog_to_changelog,
)

from .binlog_fixture import BinlogWriter, Col

SID = "3e11fa47-71ca-11e1-9e33-c80aa9429562"

ACCOUNT_COLS = [
    Col("id", MYSQL_TYPE_LONGLONG),
    Col("name", MYSQL_TYPE_VARCHAR, 64),
    Col("balance", MYSQL_TYPE_NEWDECIMAL, (12, 2)),
]


def _writer(**kw):
    return BinlogWriter(**kw)


# --------------------------------------------------------------------------
# value round-trips
# --------------------------------------------------------------------------


def test_all_column_types_round_trip():
    cols = [
        Col("c_tiny", MYSQL_TYPE_TINY),
        Col("c_utiny", MYSQL_TYPE_TINY, signed=False),
        Col("c_short", MYSQL_TYPE_SHORT),
        Col("c_int24", MYSQL_TYPE_INT24),
        Col("c_long", MYSQL_TYPE_LONG),
        Col("c_ulong", MYSQL_TYPE_LONG, signed=False),
        Col("c_bigint", MYSQL_TYPE_LONGLONG),
        Col("c_float", MYSQL_TYPE_FLOAT),
        Col("c_double", MYSQL_TYPE_DOUBLE),
        Col("c_dec", MYSQL_TYPE_NEWDECIMAL, (20, 6)),
        Col("c_varchar", MYSQL_TYPE_VARCHAR, 300),
        Col("c_char", MYSQL_TYPE_STRING, 10),
        Col("c_blob", MYSQL_TYPE_BLOB, 2),
        Col("c_date", MYSQL_TYPE_DATE),
        Col("c_year", MYSQL_TYPE_YEAR),
        Col("c_dt", MYSQL_TYPE_DATETIME2, 6),
        Col("c_dt0", MYSQL_TYPE_DATETIME2, 0),
        Col("c_ts", MYSQL_TYPE_TIMESTAMP2, 3),
        Col("c_time", MYSQL_TYPE_TIME2, 0),
        Col("c_null", MYSQL_TYPE_VARCHAR, 10),
    ]
    row = {
        "c_tiny": -128,
        "c_utiny": 255,
        "c_short": -32768,
        "c_int24": -8388608,
        "c_long": -2147483648,
        "c_ulong": 4294967295,
        "c_bigint": -9223372036854775808,
        "c_float": 1.5,
        "c_double": -2.718281828459045,
        "c_dec": "-12345678901234.567890",
        "c_varchar": "héllo wörld " * 30,  # > 255 bytes → 2-byte length
        "c_char": "chr",
        "c_blob": b"\x00\x01\xfe\xff raw bytes",
        "c_date": "2024-02-29",
        "c_year": 2031,
        "c_dt": "2024-06-15 13:45:59.123456",
        "c_dt0": "1999-12-31 23:59:59",
        "c_ts": "2021-03-04 05:06:07.890000",
        "c_time": "13:14:15",
        "c_null": None,
    }
    w = _writer()
    w.table_map(7, "db1", "types", cols)
    w.write_rows(7, [row])
    rd = BinlogReader()
    events = list(rd.read_bytes(w.bytes()))
    rows = [p for _, p in events if p[0] == "rows"]
    assert len(rows) == 1
    img = rows[0][1].rows[0]
    assert img == row


def test_decimal_edge_cases_round_trip():
    w = _writer()
    cols = [
        Col("a", MYSQL_TYPE_NEWDECIMAL, (38, 0)),
        Col("b", MYSQL_TYPE_NEWDECIMAL, (9, 9)),
        Col("c", MYSQL_TYPE_NEWDECIMAL, (10, 5)),
    ]
    w.table_map(1, "d", "t", cols)
    rows = [
        {"a": "99999999999999999999999999999999999999", "b": "0.000000001", "c": "0.00000"},
        {"a": "-1", "b": "-0.999999999", "c": "-0.00001"},
        {"a": "0", "b": "0.123456789", "c": "12345.67890"},
    ]
    w.write_rows(1, rows)
    rd = BinlogReader()
    got = [p[1].rows for _, p in rd.read_bytes(w.bytes()) if p[0] == "rows"][0]
    # values render scale-padded (MySQL's own DECIMAL string form)
    assert got == rows


def test_unsigned_bigint_and_null_bitmap_partial_rows():
    w = _writer()
    cols = [
        Col("k", MYSQL_TYPE_LONGLONG, signed=False),
        Col("v", MYSQL_TYPE_VARCHAR, 20),
    ]
    w.table_map(2, "d", "u", cols)
    w.write_rows(2, [{"k": 18446744073709551615, "v": None}, {"k": 1, "v": "x"}])
    rd = BinlogReader()
    got = [p[1].rows for _, p in rd.read_bytes(w.bytes()) if p[0] == "rows"][0]
    assert got == [{"k": 18446744073709551615, "v": None}, {"k": 1, "v": "x"}]


# --------------------------------------------------------------------------
# demux semantics (the reference's event switch)
# --------------------------------------------------------------------------


def _full_txn_writer():
    w = _writer()
    w.table_map(5, "bank", "accounts", ACCOUNT_COLS, pk=[0])
    w.gtid(SID, 7)
    w.query("bank", "BEGIN")
    w.write_rows(5, [{"id": 4, "name": "dave", "balance": "40.00"}])
    w.update_rows(5, [(
        {"id": 1, "name": "alice", "balance": "10.00"},
        {"id": 1, "name": "alice2", "balance": "11.00"},
    )])
    w.delete_rows(5, [{"id": 2, "name": "bob", "balance": "20.00"}])
    w.xid(99)
    return w


def test_envelope_demux_update_pairing_and_commit():
    """One txn: GTID → BEGIN → insert / paired update / delete → XID.
    The update's before/after images land in ONE envelope event
    (`handler.go:100-108`); XID emits op='commit'; BEGIN emits nothing;
    txn_id is uuid:gno on every event."""
    dec = BinlogEnvelopeDecoder("src1")
    evs = list(dec.decode_bytes(_full_txn_writer().bytes()))
    assert [e["op"] for e in evs] == ["insert", "update", "delete", "commit"]
    ins, upd, dele, com = evs
    assert ins["data"] == {"id": "4", "name": "dave", "balance": "40.00"}
    assert ins["before"] is None
    assert upd["before"] == {"id": "1", "name": "alice", "balance": "10.00"}
    assert upd["data"] == {"id": "1", "name": "alice2", "balance": "11.00"}
    assert dele["before"] == {"id": "2", "name": "bob", "balance": "20.00"}
    assert dele["data"] is None
    assert all(e["txn_id"] == f"{SID}:7" for e in evs)
    assert all(e["data_source"] == "src1" for e in evs)
    assert [e["schema"] for e in evs[:3]] == ["bank"] * 3
    assert [e["table"] for e in evs[:3]] == ["accounts"] * 3
    # pos = zero-padded log_pos: strictly increasing
    poss = [e["pos"] for e in evs]
    assert poss == sorted(poss) and len(set(poss)) == len(poss)


def test_ddl_classification_matches_reference_prefixes():
    """QueryEvent demux parity with `incremental.go:213-217`: only
    CREATE/ALTER/DROP/RENAME/TRUNCATE forward as DDL; BEGIN and raw
    DML statements (statement-format noise) emit nothing."""
    w = _writer()
    w.gtid(SID, 1)
    w.query("bank", "BEGIN")
    w.query("bank", "ALTER TABLE accounts ADD COLUMN tier INT")
    w.query("bank", "create index ix on accounts(name)")
    w.query("bank", "INSERT INTO accounts VALUES (1)")  # statement DML: skip
    w.query("bank", "TRUNCATE TABLE accounts")
    w.query("bank", "GRANT ALL ON *.* TO x")  # not in the demux set
    dec = BinlogEnvelopeDecoder("src1")
    evs = list(dec.decode_bytes(w.bytes()))
    assert [e["op"] for e in evs] == ["ddl", "ddl", "ddl"]
    assert evs[0]["data"]["query"] == "ALTER TABLE accounts ADD COLUMN tier INT"
    assert evs[0]["table"] == "accounts"
    assert evs[2]["data"]["query"].startswith("TRUNCATE")


def test_multi_row_statement_and_multi_txn_gtid_tracking():
    w = _writer()
    w.table_map(5, "bank", "accounts", ACCOUNT_COLS)
    w.gtid(SID, 1)
    w.write_rows(5, [
        {"id": 1, "name": "a", "balance": "1.00"},
        {"id": 2, "name": "b", "balance": "2.00"},
    ])
    w.xid(1)
    w.gtid(SID, 2)
    w.update_rows(5, [
        ({"id": 1, "name": "a", "balance": "1.00"},
         {"id": 1, "name": "a2", "balance": "1.50"}),
        ({"id": 2, "name": "b", "balance": "2.00"},
         {"id": 2, "name": "b2", "balance": "2.50"}),
    ])
    w.xid(2)
    dec = BinlogEnvelopeDecoder("src1")
    evs = list(dec.decode_bytes(w.bytes()))
    assert [e["op"] for e in evs] == [
        "insert", "insert", "commit", "update", "update", "commit"
    ]
    assert [e["txn_id"] for e in evs] == [f"{SID}:1"] * 3 + [f"{SID}:2"] * 3
    # multi-row statements share their event's pos (one binlog event)
    assert evs[0]["pos"] == evs[1]["pos"]
    assert evs[3]["pos"] == evs[4]["pos"]


# --------------------------------------------------------------------------
# integrity: checksums, truncation, unknown tables, missing names
# --------------------------------------------------------------------------


def test_crc32_corruption_fails_loudly():
    w = _full_txn_writer()
    data = bytearray(w.bytes())
    data[-30] ^= 0x01  # flip a bit inside the last event's body
    rd = BinlogReader()
    with pytest.raises(BinlogFormatError, match="CRC32 mismatch"):
        list(rd.read_bytes(bytes(data)))


def test_truncated_file_and_bad_magic_fail_loudly():
    w = _full_txn_writer()
    data = w.bytes()
    rd = BinlogReader()
    with pytest.raises(BinlogFormatError, match="truncated"):
        list(rd.read_bytes(data[: len(data) - 7]))
    with pytest.raises(BinlogFormatError, match="magic"):
        list(BinlogReader().read_bytes(b"PK\x03\x04" + data[4:]))


def test_rows_without_table_map_fails_loudly():
    w = _writer()
    w.table_map(5, "bank", "accounts", ACCOUNT_COLS)
    w.write_rows(5, [{"id": 1, "name": "a", "balance": "1.00"}])
    data = w.bytes()
    # drop the TABLE_MAP event: replay from the FDE straight to rows
    rd0 = BinlogReader()
    events = []
    import go_cdc_spark.sources.binlog as B

    # find byte ranges: magic(4) + FDE + TABLE_MAP + WRITE_ROWS
    off = 4
    sizes = []
    while off < len(data):
        size = int.from_bytes(data[off + 9 : off + 13], "little")
        sizes.append((off, size))
        off += size
    fde_end = sizes[0][0] + sizes[0][1]
    tm_end = sizes[1][0] + sizes[1][1]
    broken = data[:fde_end] + data[tm_end:]
    with pytest.raises(BinlogFormatError, match="unknown table_id"):
        list(BinlogReader().read_bytes(broken))


def test_column_name_fallback_registry_for_5x_binlogs():
    """A 5.x binlog (no COLUMN_NAME optional metadata) decodes through
    the caller-provided registry; without one it fails loudly instead
    of inventing positional names."""
    w = _writer()
    w.table_map(5, "bank", "accounts", ACCOUNT_COLS, with_names=False)
    w.gtid(SID, 3)
    w.write_rows(5, [{"id": 9, "name": "zoe", "balance": "9.00"}])
    data = w.bytes()
    with pytest.raises(BinlogFormatError, match="no column names"):
        list(BinlogEnvelopeDecoder("s").decode_bytes(data))
    dec = BinlogEnvelopeDecoder(
        "s", column_names={("bank", "accounts"): ["id", "name", "balance"]}
    )
    evs = list(dec.decode_bytes(data))
    assert evs[0]["data"] == {"id": "9", "name": "zoe", "balance": "9.00"}


def test_v1_rows_events_and_checksum_free_files_decode():
    """Pre-5.6 shape: no CRC32 trailer, v1 rows events (no extra-data
    block)."""
    from go_cdc_spark.sources.binlog import (
        DELETE_ROWS_EVENT_V1,
        UPDATE_ROWS_EVENT_V1,
        WRITE_ROWS_EVENT_V1,
    )

    w = BinlogWriter(checksum=False)
    w.table_map(5, "bank", "accounts", ACCOUNT_COLS)
    cols = w.tables[5]
    # v1 bodies: table_id(6)+flags(2), NO extra-data length
    import go_cdc_spark.sources.binlog as B

    n = len(cols)
    body = bytearray()
    body += (5).to_bytes(6, "little") + (1).to_bytes(2, "little")
    body += bytes([n]) + b"\xff" * ((n + 7) // 8)
    body += w._image(cols, {"id": 3, "name": "v1", "balance": "3.00"})
    w._emit(WRITE_ROWS_EVENT_V1, bytes(body))
    rd = BinlogReader()
    rows = [p[1] for _, p in rd.read_bytes(w.bytes()) if p[0] == "rows"]
    assert rows[0].rows == [{"id": 3, "name": "v1", "balance": "3.00"}]


# --------------------------------------------------------------------------
# end-to-end: binary path through the EXISTING drain (golden convergence)
# --------------------------------------------------------------------------


def test_binlog_golden_sequence_through_existing_drain(spark, tmp_path):
    """The VERDICT r12 #1 'done' bar: .binlog fixture bytes → envelope
    events → the existing streaming MERGE converges to the same state
    the golden JSON path produces — update pairing from genuine
    before/after row images included."""
    from decimal import Decimal

    from pyspark.sql import Row
    from pyspark.sql import types as T

    from go_cdc_spark.streaming.pipeline import StreamingMaterializer

    w = _writer()
    w.table_map(5, "bank", "accounts", ACCOUNT_COLS, pk=[0])
    # txn 1: insert dave, update alice (paired images), delete bob
    w.gtid(SID, 1)
    w.write_rows(5, [{"id": 4, "name": "dave", "balance": "40.00"}])
    w.update_rows(5, [(
        {"id": 1, "name": "alice", "balance": "10.00"},
        {"id": 1, "name": "alice2", "balance": "11.00"},
    )])
    w.delete_rows(5, [{"id": 2, "name": "bob", "balance": "20.00"}])
    w.xid(1)
    # txn 2: re-insert bob_back, second update of dave
    w.gtid(SID, 2)
    w.write_rows(5, [{"id": 2, "name": "bob_back", "balance": "22.00"}])
    w.update_rows(5, [(
        {"id": 4, "name": "dave", "balance": "40.00"},
        {"id": 4, "name": "dave2", "balance": "41.00"},
    )])
    w.xid(2)
    binlog = tmp_path / "binlog.000001"
    w.write(binlog)

    changelog = tmp_path / "changelog"
    changelog.mkdir()
    n = binlog_to_changelog(str(binlog), str(changelog), "src1")
    assert n == 7  # 3 + commit + 2 + commit

    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("balance", T.DecimalType(12, 2)),
    ])
    snap = spark.createDataFrame(
        [Row(id=1, name="alice", balance=Decimal("10.00")),
         Row(id=2, name="bob", balance=Decimal("20.00")),
         Row(id=3, name="carol", balance=Decimal("30.00"))],
        schema,
    )
    mat = StreamingMaterializer(
        spark, snap, ["id"], str(tmp_path / "state"), pos_threshold=None
    )
    from go_cdc_spark.streaming.pipeline import read_changelog_stream

    q = mat.start(
        read_changelog_stream(spark, str(changelog), 10),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination()
    got = {r.id: (r.name, str(r.balance)) for r in mat.read_table().collect()}
    assert got == {
        1: ("alice2", "11.00"),
        2: ("bob_back", "22.00"),
        3: ("carol", "30.00"),
        4: ("dave2", "41.00"),
    }
    # re-decoding the same file is a convergent no-op (same pos, new segment)
    binlog_to_changelog(str(binlog), str(changelog), "src1")
    q = mat.start(
        read_changelog_stream(spark, str(changelog), 10),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination()
    got2 = {r.id: (r.name, str(r.balance)) for r in mat.read_table().collect()}
    assert got2 == got


def test_binlog_ddl_evolves_schema_through_drain(spark, tmp_path):
    """A19 through the binary path: a QueryEvent ALTER rides the
    changelog and the drain evolves the materialized schema before
    applying the rows that carry the new column."""
    from pyspark.sql import Row
    from pyspark.sql import types as T

    from go_cdc_spark.streaming.pipeline import (
        StreamingMaterializer,
        read_changelog_stream,
    )

    cols3 = [
        Col("id", MYSQL_TYPE_LONGLONG),
        Col("name", MYSQL_TYPE_VARCHAR, 64),
    ]
    cols4 = cols3 + [Col("tier", MYSQL_TYPE_LONG)]
    w = _writer()
    w.gtid(SID, 1)
    w.query("bank", "ALTER TABLE accounts ADD COLUMN tier INT")
    w.xid(1)
    w.gtid(SID, 2)
    w.table_map(6, "bank", "accounts", cols4)
    w.write_rows(6, [{"id": 5, "name": "erin", "tier": 3}])
    w.xid(2)
    binlog = tmp_path / "binlog.000002"
    w.write(binlog)
    changelog = tmp_path / "changelog"
    changelog.mkdir()
    binlog_to_changelog(str(binlog), str(changelog), "src1")

    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
    ])
    snap = spark.createDataFrame([Row(id=1, name="alice")], schema)
    mat = StreamingMaterializer(
        spark, snap, ["id"], str(tmp_path / "state"), table="accounts"
    )
    q = mat.start(
        read_changelog_stream(spark, str(changelog), 10), str(tmp_path / "ckpt")
    )
    q.awaitTermination()
    got = {r.id: (r.name, r.tier) for r in mat.read_table().collect()}
    assert got == {1: ("alice", None), 5: ("erin", 3)}


def test_binlog_blob_base64_round_trip_through_drain(spark, tmp_path):
    """Binary columns survive the stringly envelope: the decoder
    base64s BLOB bytes and the materializer's unbase64 restores them."""
    from pyspark.sql import Row
    from pyspark.sql import types as T

    from go_cdc_spark.streaming.pipeline import (
        StreamingMaterializer,
        read_changelog_stream,
    )

    cols = [Col("id", MYSQL_TYPE_LONGLONG), Col("payload", MYSQL_TYPE_BLOB, 2)]
    w = _writer()
    w.table_map(9, "bank", "blobs", cols)
    w.gtid(SID, 1)
    raw = bytes(range(256))
    w.write_rows(9, [{"id": 1, "payload": raw}])
    w.xid(1)
    binlog = tmp_path / "binlog.000003"
    w.write(binlog)
    changelog = tmp_path / "changelog"
    changelog.mkdir()
    binlog_to_changelog(str(binlog), str(changelog), "src1")

    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ])
    snap = spark.createDataFrame([], schema)
    mat = StreamingMaterializer(spark, snap, ["id"], str(tmp_path / "state"))
    q = mat.start(
        read_changelog_stream(spark, str(changelog), 10), str(tmp_path / "ckpt")
    )
    q.awaitTermination()
    got = mat.read_table().collect()
    assert len(got) == 1 and bytes(got[0].payload) == raw


def test_binlog_txn_commit_releases_read_committed_gate(spark, tmp_path):
    """A22 through the binary path: XID events gate row visibility —
    rows of an uncommitted trailing transaction stay withheld."""
    from pyspark.sql import Row
    from pyspark.sql import types as T

    from go_cdc_spark.sources.changelog import CHANGE_EVENT_SCHEMA
    from go_cdc_spark.streaming.txn_gate import ReadCommittedGate
    from go_cdc_spark.streaming.pipeline import StreamingMaterializer

    w = _writer()
    w.table_map(5, "bank", "accounts", ACCOUNT_COLS)
    w.gtid(SID, 1)
    w.write_rows(5, [{"id": 10, "name": "committed", "balance": "1.00"}])
    w.xid(1)
    w.gtid(SID, 2)
    w.write_rows(5, [{"id": 11, "name": "in_flight", "balance": "2.00"}])
    # no XID for txn 2: crashed mid-transaction
    binlog = tmp_path / "binlog.000004"
    w.write(binlog)

    dec = BinlogEnvelopeDecoder("src1")
    evs = dec.decode_file(str(binlog))
    batch = spark.createDataFrame(evs, CHANGE_EVENT_SCHEMA)

    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("balance", T.StringType()),
    ])
    mat = StreamingMaterializer(
        spark, spark.createDataFrame([], schema), ["id"],
        str(tmp_path / "state"),
    )
    gate = ReadCommittedGate(
        spark,
        pending_path=str(tmp_path / "pending"),
        downstream=mat.process_batch,
    )
    gate.process_batch(batch, 0)
    ids = {r.id for r in mat.read_table().collect()}
    assert ids == {10}, "uncommitted txn 2 row must be withheld"


# --------------------------------------------------------------------------
# Engine integration: binlog_dir config + GTID-resumed file ingestion
# --------------------------------------------------------------------------


def _binlog_engine_config(tmp_path, sf="/root/testdata/sf0.001"):
    cfg = f"""
[engine]
meta_path      = "{tmp_path}/meta"
state_dir      = "{tmp_path}/state"
checkpoint_dir = "{tmp_path}/ckpt"

[[source]]
id         = 1
name       = "dev"
type       = "parquet"
path       = "{sf}"
changelog  = "{tmp_path}/changelog"
binlog_dir = "{tmp_path}/binlogs"
[source.primary_keys]
region = ["r_regionkey"]
[source.rules.global]
include_tables = ["region"]
"""
    p = tmp_path / "config.toml"
    p.write_text(cfg)
    (tmp_path / "changelog").mkdir()
    (tmp_path / "binlogs").mkdir()
    return str(p)


REGION_COLS = [
    Col("r_regionkey", MYSQL_TYPE_LONGLONG),
    Col("r_name", MYSQL_TYPE_VARCHAR, 64),
]


def test_engine_ingests_binlog_files_with_gtid_resume(spark, tmp_path):
    """binlog_dir config end-to-end: raw binlog bytes → decoder →
    changelog → drain → materialized table; completed files are never
    re-read, and an OVERLAPPING archive file (same transactions dumped
    again + one new txn) emits only the new transaction — the
    StartSyncGTID resume semantic over files."""
    from go_cdc_spark.app import Engine
    from go_cdc_spark.config import load_config
    from go_cdc_spark.functions.gtid import GtidSet

    cfgp = _binlog_engine_config(tmp_path)

    w = _writer()
    w.table_map(9, "main", "region", REGION_COLS, pk=[0])
    w.gtid(SID, 1)
    w.write_rows(9, [{"r_regionkey": 90, "r_name": "ATLANTIS"}])
    w.xid(1)
    w.gtid(SID, 2)
    w.update_rows(9, [(
        {"r_regionkey": 0, "r_name": "AFRICA"},
        {"r_regionkey": 0, "r_name": "AFRICA-v2"},
    )])
    w.xid(2)
    w.write(tmp_path / "binlogs" / "binlog.000001")

    engine = Engine(load_config(cfgp), spark=spark)
    engine.init_sources()
    engine.full_sync()
    ingested = engine.binlog_sync()
    assert ingested[(1, "binlog.000001")] == 4  # insert + paired update + 2 commits
    got = {r.r_regionkey: r.r_name
           for r in engine.read_table(1, "main", "region").collect()}
    assert got[90] == "ATLANTIS" and got[0] == "AFRICA-v2"

    # completed file: never re-read, nothing re-emitted
    assert engine.binlog_sync() == {}

    # overlapping archive: txns 1-2 AGAIN (skipped by the GTID
    # watermark) plus a NEW txn 3
    w2 = _writer()
    w2.table_map(9, "main", "region", REGION_COLS, pk=[0])
    w2.gtid(SID, 1)
    w2.write_rows(9, [{"r_regionkey": 90, "r_name": "ATLANTIS"}])
    w2.xid(1)
    w2.gtid(SID, 2)
    w2.update_rows(9, [(
        {"r_regionkey": 0, "r_name": "AFRICA"},
        {"r_regionkey": 0, "r_name": "AFRICA-v2"},
    )])
    w2.xid(2)
    w2.gtid(SID, 3)
    w2.write_rows(9, [{"r_regionkey": 91, "r_name": "LEMURIA"}])
    w2.xid(3)
    w2.write(tmp_path / "binlogs" / "binlog.000002")

    ingested = engine.binlog_sync()
    assert ingested[(1, "binlog.000002")] == 2  # ONLY txn 3: insert + commit
    got = {r.r_regionkey: r.r_name
           for r in engine.read_table(1, "main", "region").collect()}
    assert got[91] == "LEMURIA" and got[90] == "ATLANTIS"

    # the watermark is the A17 GTID set covering exactly 1-3
    wm = GtidSet.from_json(engine.meta.get_pos("dev#binlog"))
    assert wm.covers(SID, 1) and wm.covers(SID, 3) and not wm.covers(SID, 4)

    # a fresh engine over the same meta resumes: nothing to ingest
    engine2 = Engine(load_config(cfgp), spark=spark)
    engine2.init_sources()
    assert engine2.ingest_binlogs() == {}


def test_binlog_dir_config_validation(tmp_path):
    from go_cdc_spark.config import load_config

    p = tmp_path / "bad.toml"
    p.write_text(f"""
[engine]
meta_path = "{tmp_path}/m"
state_dir = "{tmp_path}/s"
checkpoint_dir = "{tmp_path}/c"
[[source]]
id = 1
name = "x"
type = "parquet"
path = "{tmp_path}"
binlog_dir = "{tmp_path}/bl"
""")
    with pytest.raises(ValueError, match="binlog_dir needs a changelog"):
        load_config(str(p))
    p2 = tmp_path / "bad2.toml"
    p2.write_text(f"""
[engine]
meta_path = "{tmp_path}/m"
state_dir = "{tmp_path}/s"
checkpoint_dir = "{tmp_path}/c"
[[source]]
id = 1
name = "x"
type = "parquet"
path = "{tmp_path}"
changelog = "{tmp_path}/cl"
binlog_dir = "{tmp_path}/bl"
[source.binlog_tables]
noschema = ["a"]
""")
    with pytest.raises(ValueError, match="schema.table"):
        load_config(str(p2))
