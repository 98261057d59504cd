"""Debezium envelope adapter: Kafka-Connect change events → the
engine's unified change-event schema.

Debezium is the de-facto open-source CDC wire format; a user replacing
the reference replicator (which speaks the MySQL binlog directly,
`internal/cannal/incremental.go`) often already has Debezium topics.
This adapter maps the PUBLIC Debezium envelope (the ``payload`` of a
data-change message: ``before`` / ``after`` / ``source{db,table,gtid,
file,pos,row}`` / ``op`` / ``ts_ms`` / ``transaction{id}``) onto
``CHANGE_EVENT_SCHEMA`` so the same downstream surface — filter rules,
GTID watermarks, txn gate, StreamingMaterializer MERGE — runs
unchanged off a Debezium topic.

Everything is declarative ``from_json`` + column expressions (one
parse per row, no UDFs); on a stream the adapter applies identically
to ``readStream`` micro-batches.

Mapping decisions:

- ``op``: c (create) and r (snapshot read) → insert; u → update;
  d → delete. Truncate/message events (t/m) carry no row images and
  are dropped here — truncation arrives through the schema-change
  topic as DDL, which `debezium_schema_changes` maps to the engine's
  ``op='ddl'`` events.
- ``pos``: GTID when present, else ``file:pos:row`` with the numeric
  parts zero-padded so lexicographic order == binlog order (the
  envelope's per-source total order contract; binlog file names are
  already zero-padded by MySQL).
- ``ts``: Debezium ``ts_ms`` epoch millis → TIMESTAMP_NTZ pinned to
  UTC via ``convert_timezone`` (deterministic regardless of session
  timezone — the envelope contract, see tables.py).
- Payloads wrapped by the JSON converter with schemas enabled
  (``{"schema": ..., "payload": ...}``) are unwrapped transparently;
  Kafka tombstones (null value) and non-JSON rows parse to NULL op
  and are filtered.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .changelog import OP_DELETE, OP_INSERT, OP_UPDATE

# Debezium data-change payload, fields we consume (extra fields are
# ignored by from_json). before/after arrive as MAP<STRING,STRING> —
# Spark's JSON reader renders scalars as their canonical string forms,
# which is exactly the envelope's stringly transport contract.
DEBEZIUM_PAYLOAD_SCHEMA = (
    "before MAP<STRING,STRING>, after MAP<STRING,STRING>, op STRING, ts_ms BIGINT, "
    "source STRUCT<name STRING, db STRING, `table` STRING, gtid STRING, "
    "file STRING, pos BIGINT, row INT, snapshot STRING>, "
    "transaction STRUCT<id STRING, total_order BIGINT>"
)

DEBEZIUM_SCHEMA_CHANGE_SCHEMA = (
    "databaseName STRING, ddl STRING, ts_ms BIGINT, "
    "source STRUCT<name STRING, db STRING, `table` STRING, gtid STRING, "
    "file STRING, pos BIGINT, row INT>"
)

# Transaction-metadata topic message (provide.transaction.metadata=true):
# status BEGIN/END, the transaction id the data events reference in
# their `transaction.id`, and per-collection event counts.
DEBEZIUM_TXN_SCHEMA = (
    "status STRING, id STRING, event_count BIGINT, ts_ms BIGINT, "
    "data_collections ARRAY<STRUCT<data_collection STRING, event_count BIGINT>>"
)


def _payload(payload_col: str) -> F.Column:
    """Unwrap the converter envelope if present: with schemas enabled
    the value is {"schema":…, "payload":…}; without, the payload IS
    the value. get_json_object returns NULL when the key is absent."""
    j = F.col(payload_col)
    return F.coalesce(F.get_json_object(j, "$.payload"), j)


def _pos_col() -> F.Column:
    # Fallback (no GTID) pos must stay lexicographically == binlog order:
    #  * row is padded to 8 digits — a 4-digit pad broke ordering for
    #    transactions touching >=10k rows (row=10000 sorted before row=2)
    #  * file is coalesced to a fixed sentinel — concat_ws silently DROPS
    #    null segments, so a NULL file (non-MySQL connectors without GTID)
    #    would otherwise yield "pos:row" strings that interleave wrongly
    #    with "file:pos:row" ones
    return F.coalesce(
        F.col("e.source.gtid"),
        F.concat_ws(
            ":",
            F.coalesce(F.col("e.source.file"), F.lit("~nofile")),
            F.lpad(F.col("e.source.pos").cast("string"), 12, "0"),
            F.lpad(F.coalesce(F.col("e.source.row"), F.lit(0)).cast("string"), 8, "0"),
        ),
    )


def _ts_col() -> F.Column:
    # epoch millis → NTZ pinned to UTC: deterministic under any session tz
    return F.expr("convert_timezone('UTC', timestamp_millis(e.ts_ms))")


def debezium_to_change_events(
    df: DataFrame, payload_col: str = "value", default_source: str = "debezium"
) -> DataFrame:
    """Map a DataFrame of Debezium data-change message values (JSON
    strings, e.g. the ``value`` of a Kafka topic) to the engine's
    change-event envelope. Works identically on static and streaming
    DataFrames."""
    parsed = df.select(
        F.from_json(_payload(payload_col), DEBEZIUM_PAYLOAD_SCHEMA).alias("e")
    )
    op = (
        F.when(F.col("e.op").isin("c", "r"), F.lit(OP_INSERT))
        .when(F.col("e.op") == "u", F.lit(OP_UPDATE))
        .when(F.col("e.op") == "d", F.lit(OP_DELETE))
    )
    return (
        parsed.select(
            F.coalesce(F.col("e.source.name"), F.lit(default_source)).alias(
                "data_source"
            ),
            F.col("e.source.db").alias("schema"),
            F.col("e.source.table").alias("table"),
            op.alias("op"),
            # delete events carry the image in `before`; the envelope's
            # `data` is the authoritative image for the op
            F.when(F.col("e.op") == "d", F.col("e.before"))
            .otherwise(F.col("e.after"))
            .alias("data"),
            F.col("e.before").alias("before"),
            _ts_col().alias("ts"),
            _pos_col().alias("pos"),
            F.coalesce(F.col("e.transaction.id"), F.col("e.source.gtid")).alias(
                "txn_id"
            ),
        )
        # tombstones, truncate/message ops, unparseable rows
        .filter(F.col("op").isNotNull())
    )


def debezium_txn_boundaries(
    df: DataFrame, payload_col: str = "value", default_source: str = "debezium"
) -> DataFrame:
    """Map Debezium transaction-metadata topic messages to the engine's
    transaction-scoped control events: ``status='END'`` → ``op='commit'``
    with the txn id the data events carry in ``transaction.id`` — the
    public equivalent of the MySQL XID event the reference's
    read-committed flush keys on (internal/cannal/incremental.go
    OnRow/OnXID). BEGIN events carry no release semantics and are
    dropped; Debezium never emits rolled-back transactions (the binlog
    only holds committed ones), so no rollback mapping exists — the
    engine's native ``op='rollback'`` remains reachable from the native
    changelog format only.

    Schema/table/pos are NULL on purpose: a commit is transaction-
    scoped, not table-scoped, and the txn gate's watermark advance
    ignores NULL positions (``max(pos)`` skips them)."""
    parsed = df.select(
        F.from_json(_payload(payload_col), DEBEZIUM_TXN_SCHEMA).alias("e")
    )
    return parsed.filter(
        (F.upper(F.col("e.status")) == "END") & F.col("e.id").isNotNull()
    ).select(
        F.lit(default_source).alias("data_source"),
        F.lit(None).cast("string").alias("schema"),
        F.lit(None).cast("string").alias("table"),
        F.lit("commit").alias("op"),
        F.lit(None).cast("map<string,string>").alias("data"),
        F.lit(None).cast("map<string,string>").alias("before"),
        F.expr("convert_timezone('UTC', timestamp_millis(e.ts_ms))").alias("ts"),
        F.lit(None).cast("string").alias("pos"),
        F.col("e.id").alias("txn_id"),
    )


def debezium_schema_changes(
    df: DataFrame, payload_col: str = "value", default_source: str = "debezium"
) -> DataFrame:
    """Map Debezium schema-change topic messages (``databaseName`` +
    ``ddl``) to the engine's ``op='ddl'`` events (data = {"query": …}),
    the form `StreamingMaterializer._apply_ddl` consumes."""
    parsed = df.select(
        F.from_json(_payload(payload_col), DEBEZIUM_SCHEMA_CHANGE_SCHEMA).alias("e")
    )
    return parsed.filter(F.col("e.ddl").isNotNull()).select(
        F.coalesce(F.col("e.source.name"), F.lit(default_source)).alias("data_source"),
        F.coalesce(F.col("e.databaseName"), F.col("e.source.db")).alias("schema"),
        F.col("e.source.table").alias("table"),
        F.lit("ddl").alias("op"),
        F.create_map(F.lit("query"), F.col("e.ddl")).alias("data"),
        F.lit(None).cast("map<string,string>").alias("before"),
        _ts_col().alias("ts"),
        _pos_col().alias("pos"),
        F.lit(None).cast("string").alias("txn_id"),
    )
