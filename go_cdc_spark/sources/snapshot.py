"""Snapshot (full-amount) capture: discovery, chunked reads, per-table
pipeline, bounded fan-out.

Re-expresses the reference's full-sync service
(`internal/cannal/fullamount_service.go`) Spark-first:

- **Discovery** (A1-A4): ``list_schemas`` / ``list_tables`` /
  ``get_table_ddl`` / ``get_table_primary_keys`` behind the
  :class:`SnapshotSource` protocol (`internal/syncdb/data_source.go:13-34`).
  Tables without a primary key are rejected, matching
  `internal/syncdb/mysql_data_source.go:121-123`.
- **Chunked scan** (A5): the reference pages serially with keyset
  pagination (`internal/syncdb/mysql_data_source.go:127-202`); Spark
  reads the same ranges *in parallel* — numeric single PKs via
  ``partitionColumn/lowerBound/upperBound/numPartitions``, composite
  PKs via :func:`chunk_predicates` tuple-comparison WHERE clauses (one
  JDBC partition each). The reference's composite ORDER BY came from Go
  map iteration (nondeterministic, `mysql_data_source.go:135`); we use
  discovered ordinal order.
- **Consistent snapshot** (A7): the reference holds one REPEATABLE READ
  tx per table and records ``@@GLOBAL.gtid_executed`` inside it
  (`mysql_data_source.go:220-235`). Parallel JDBC partitions are
  separate connections, so true MVCC snapshot needs
  ``num_partitions=1`` (correctness mode); parallel mode is documented
  as eventually reconciled by the CDC stream — the position recorded
  *before* the read makes replay idempotent under the
  ``pos > tableGTID`` handoff rule.
- **Pipeline** (A11) and **fan-out** (A10): per table — position, DDL
  control event, typed read, envelope conversion, checkpoint upsert;
  tables run through a bounded thread pool (the reference's
  semaphore(10) errgroup, `fullamount_service.go:106-134`) — each
  thread submits an independent Spark job, the scheduler interleaves
  stages across cores.
"""

from __future__ import annotations

import itertools
import threading
from collections.abc import Callable, Iterator, Sequence
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import Protocol

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rules import FilterRules
from .changelog import (
    CHANGE_EVENT_SCHEMA,
    OP_CREATE_TABLE,
    OP_END,
    OP_INSERT,
    OP_ROLLBACK,
)
from .meta import CheckpointStore

DEFAULT_CONCURRENCY = 10  # reference: SnapshotReader{concurrency: 10}


class NoPrimaryKeyError(ValueError):
    """Table has no primary key — not syncable (reference behavior:
    `internal/syncdb/mysql_data_source.go:121-123`)."""


class SnapshotSource(Protocol):
    """Discovery + read surface of one upstream source
    (`internal/syncdb/data_source.go:13-34`)."""

    def list_schemas(self) -> list[str]: ...

    def list_tables(self, schemas: Sequence[str]) -> dict[str, list[str]]: ...

    def get_table_ddl(self, schema: str, table: str) -> str: ...

    def get_table_primary_keys(self, schema: str, table: str) -> list[str]: ...

    def current_position(self) -> str: ...

    def read_table(self, schema: str, table: str) -> DataFrame: ...


# --------------------------------------------------------------------------
# Composite-key chunk predicates (A5 for JDBC parallel reads)
# --------------------------------------------------------------------------


def _eq_pred(col: str, v) -> str:
    """Null-safe two-valued equality: NULL data never makes the
    predicate UNKNOWN (which ``NOT`` would silently drop), and a NULL
    boundary value compares as IS NULL, not ``= NULL``."""
    if v is None:
        return f"{col} IS NULL"
    return f"({col} IS NOT NULL AND {col} = {_sql_lit(v)})"


def _gt_pred(col: str, v) -> str:
    """Null-safe two-valued ``>`` under the NULL-sorts-first total
    order (MySQL ASC index order): NULL > anything is FALSE; anything
    non-NULL > NULL is TRUE."""
    if v is None:
        return f"{col} IS NOT NULL"
    return f"({col} IS NOT NULL AND {col} > {_sql_lit(v)})"


def tuple_gt(pk_cols: Sequence[str], values: Sequence) -> str:
    """Row-constructor ``(pk1,..,pkn) > (v1,..,vn)`` expanded to portable
    SQL (MySQL supports the row form; the expansion works everywhere and
    lets the source's optimizer use the PK index the same way). Every
    leaf comparison is null-safe two-valued (see _gt_pred), so the
    expression itself is never UNKNOWN and ``NOT tuple_gt`` (tuple_le)
    keeps rows with NULLs in key-prefix columns — a unique index used
    as the chunking key may contain them even though a true PK cannot."""
    clauses = []
    for i in range(len(pk_cols)):
        eqs = [_eq_pred(pk_cols[j], values[j]) for j in range(i)]
        eqs.append(_gt_pred(pk_cols[i], values[i]))
        clauses.append("(" + " AND ".join(eqs) + ")")
    return "(" + " OR ".join(clauses) + ")"


def tuple_le(pk_cols: Sequence[str], values: Sequence) -> str:
    return f"NOT {tuple_gt(pk_cols, values)}"


def boundary_sort_key(t: Sequence) -> tuple:
    """Sort key for sampled boundary tuples under the same
    NULL-sorts-first total order the predicates use (plain ``sorted``
    raises on None vs non-None)."""
    return tuple((v is not None, v) for v in t)


def _sql_lit(v) -> str:
    import datetime

    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, (datetime.datetime, datetime.date)):
        # DATE/DATETIME primary keys: ISO text compares correctly in SQL
        return "'" + v.isoformat(sep=" ") + "'" if isinstance(
            v, datetime.datetime
        ) else "'" + v.isoformat() + "'"
    return str(v)


def chunk_predicates(
    pk_cols: Sequence[str], boundaries: Sequence[Sequence]
) -> list[str]:
    """Split PK space into len(boundaries)+1 ranges from sorted boundary
    tuples (sampled from the source, e.g. every Nth PK): the parallel
    form of the reference's serial cursor loop — chunk k is
    ``(pks) > bound[k-1] AND (pks) <= bound[k]``, first/last unbounded.
    Each predicate becomes one JDBC partition, so the source serves N
    index-range scans concurrently instead of one cursor walk."""
    if not pk_cols:
        raise NoPrimaryKeyError("chunking requires at least one PK column")
    if not boundaries:
        return ["1 = 1"]
    preds = [tuple_le(pk_cols, boundaries[0])]
    for lo, hi in zip(boundaries, boundaries[1:]):
        preds.append(f"{tuple_gt(pk_cols, lo)} AND {tuple_le(pk_cols, hi)}")
    preds.append(tuple_gt(pk_cols, boundaries[-1]))
    return preds


# --------------------------------------------------------------------------
# Sources
# --------------------------------------------------------------------------


@dataclass
class ParquetSnapshotSource:
    """Parquet-dir-backed source (tests + lakehouse re-sync): one
    directory = one schema, one ``<table>.parquet`` = one table. PKs
    come from a config map — parquet has no PK metadata, mirroring that
    the reference *discovers* PKs out-of-band via information_schema."""

    spark: SparkSession
    root: str
    schema_name: str = "main"
    primary_keys: dict[str, list[str]] = field(default_factory=dict)
    # itertools.count is GIL-atomic: snapshot_all's thread pool calls
    # current_position concurrently, and a plain `+= 1` can hand two
    # tables the same position (breaking the per-table handoff threshold).
    _pos_counter: Iterator[int] = field(default_factory=lambda: itertools.count(1))

    def list_schemas(self) -> list[str]:
        return [self.schema_name]

    def list_tables(self, schemas: Sequence[str]) -> dict[str, list[str]]:
        import os

        if self.schema_name not in schemas:
            return {}
        tables = sorted(
            f.removesuffix(".parquet")
            for f in os.listdir(self.root)
            if f.endswith(".parquet")
        )
        return {self.schema_name: tables}

    def get_table_ddl(self, schema: str, table: str) -> str:
        """DDL string from the parquet footer schema (the reference ships
        SHOW CREATE TABLE output verbatim; we ship Spark DDL)."""
        return (
            f"CREATE TABLE {schema}.{table} ("
            + self.read_table(schema, table).schema.toDDL()
            + ")"
        )

    def get_table_primary_keys(self, schema: str, table: str) -> list[str]:
        pks = self.primary_keys.get(table, [])
        if not pks:
            raise NoPrimaryKeyError(
                f"{schema}.{table} has no primary key; not syncable"
            )
        return pks

    def current_position(self) -> str:
        """Monotonic fake position (the parquet dir is immutable; a real
        source reports its log position, A16)."""
        return f"{next(self._pos_counter):012d}"

    def read_table(self, schema: str, table: str) -> DataFrame:
        # TIMESTAMP(NANOS) parquet (e.g. the events fixture) is illegal to
        # Spark's reader; surface it as raw nanos — the envelope transports
        # stringly values, typed materialization re-interprets downstream.
        self.spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return self.spark.read.parquet(f"{self.root}/{table}.parquet")


class MySqlDialect:
    """MySQL catalog SQL — the reference's discovery queries
    (`internal/syncdb/mysql_data_source.go:24-125`,
    `internal/syncdb/data_source.go:57-75`), verbatim. These exact
    strings cannot execute in this container (no MySQL socket); the
    dialect seam exists so everything AROUND them — collect, system-
    schema filtering, grouping, ordinal ordering, no-PK rejection, the
    snapshot pipeline — executes for real in pytest with
    :class:`DerbyDialect` driving the SAME code path."""

    system_schemas: tuple[str, ...] = (
        "information_schema",
        "performance_schema",
        "mysql",
        "sys",
    )

    def schemas_sql(self) -> str:
        # A1: internal/syncdb/mysql_data_source.go:24-48
        return "SELECT schema_name FROM information_schema.schemata"

    def tables_sql(self, schemas: Sequence[str]) -> str:
        # A2: internal/syncdb/mysql_data_source.go:50-84
        in_list = ", ".join(_sql_lit(s) for s in schemas)
        return (
            "SELECT table_schema, table_name FROM information_schema.tables "
            f"WHERE table_type = 'BASE TABLE' AND table_schema IN ({in_list})"
        )

    def ddl_sql(self, schema: str, table: str) -> str:
        # A3: internal/syncdb/mysql_data_source.go:86-96
        return f"SHOW CREATE TABLE {schema}.{table}"

    def ddl_from_rows(self, rows: list, schema: str, table: str) -> str:
        return rows[0][1]

    def pk_sql(self, schema: str, table: str) -> str:
        # A4: internal/syncdb/mysql_data_source.go:98-125 — ordinal order
        # (fixes the reference's Go-map iteration nondeterminism, :135)
        return (
            "SELECT column_name FROM information_schema.columns "
            f"WHERE table_schema = {_sql_lit(schema)} AND table_name = {_sql_lit(table)} "
            "AND column_key = 'PRI' ORDER BY ordinal_position"
        )

    def pk_from_rows(self, rows: list) -> list[str]:
        return [r[0] for r in rows]

    def position_sql(self) -> str | None:
        # A16: internal/syncdb/data_source.go:57-75 (Executed_Gtid_Set)
        return "SHOW MASTER STATUS"

    def position_from_row(self, row) -> str:
        return row["Executed_Gtid_Set"] if row else ""


class DerbyDialect:
    """Derby's SYS catalog behind the same seam — the implementation
    that lets JdbcSnapshotSource's SQL discovery path (A1-A4 + A16
    orchestration) execute against a REAL database in pytest
    (tests/test_jdbc_source.py). PK key order comes from the backing
    index conglomerate's descriptor — ``CAST(descriptor AS VARCHAR)``
    renders e.g. ``UNIQUE BTREE (2, 1)``, whose position list IS the
    key-ordinal order (PRIMARY KEY (K2, K1) on columns #1, #2 yields
    ``(2, 1)``)."""

    system_schemas: tuple[str, ...] = (
        "SYS", "SYSIBM", "SYSCAT", "SYSFUN", "SYSPROC", "SYSSTAT",
        "SYSCS_DIAG", "SYSCS_UTIL", "SQLJ", "NULLID",
    )

    def schemas_sql(self) -> str:
        return "SELECT schemaname FROM sys.sysschemas"

    def tables_sql(self, schemas: Sequence[str]) -> str:
        in_list = ", ".join(_sql_lit(s) for s in schemas)
        return (
            "SELECT s.schemaname, t.tablename FROM sys.systables t "
            "JOIN sys.sysschemas s ON t.schemaid = s.schemaid "
            f"WHERE t.tabletype = 'T' AND s.schemaname IN ({in_list})"
        )

    def ddl_sql(self, schema: str, table: str) -> str:
        return (
            "SELECT c.columnname, c.columnnumber, "
            "CAST(c.columndatatype AS VARCHAR(200)) AS coltype "
            "FROM sys.syscolumns c JOIN sys.systables t "
            "ON c.referenceid = t.tableid "
            "JOIN sys.sysschemas s ON t.schemaid = s.schemaid "
            f"WHERE s.schemaname = {_sql_lit(schema)} "
            f"AND t.tablename = {_sql_lit(table)}"
        )

    def ddl_from_rows(self, rows: list, schema: str, table: str) -> str:
        cols = [f"{r[0]} {r[2]}" for r in sorted(rows, key=lambda r: r[1])]
        return f"CREATE TABLE {schema}.{table} (" + ", ".join(cols) + ")"

    def pk_sql(self, schema: str, table: str) -> str:
        return (
            "SELECT c.columnname, c.columnnumber, "
            "CAST(cg.descriptor AS VARCHAR(200)) AS idx "
            "FROM sys.sysconstraints cons "
            "JOIN sys.syskeys k ON cons.constraintid = k.constraintid "
            "JOIN sys.sysconglomerates cg ON k.conglomerateid = cg.conglomerateid "
            "JOIN sys.systables t ON cons.tableid = t.tableid "
            "JOIN sys.sysschemas s ON t.schemaid = s.schemaid "
            "JOIN sys.syscolumns c ON c.referenceid = t.tableid "
            f"WHERE cons.type = 'P' AND s.schemaname = {_sql_lit(schema)} "
            f"AND t.tablename = {_sql_lit(table)}"
        )

    def pk_from_rows(self, rows: list) -> list[str]:
        if not rows:
            return []
        by_number = {r[1]: r[0] for r in rows}
        inside = rows[0][2][rows[0][2].index("(") + 1 : rows[0][2].rindex(")")]
        positions = [int(p.strip()) for p in inside.split(",")]
        return [by_number[p] for p in positions if p in by_number]

    def position_sql(self) -> str | None:
        return None  # no replication log — handoff admits every event

    def position_from_row(self, row) -> str:
        return ""


@dataclass
class JdbcSnapshotSource:
    """JDBC-backed source. Discovery via dialect catalog SQL
    (:class:`MySqlDialect` — reference parity — by default,
    :class:`DerbyDialect` under test); reads via partitioned
    ``spark.read.jdbc``. The full discovery + read + envelope path is
    proven against embedded Derby in tests/test_jdbc_source.py; the
    only thing that never executes in this container is the MySQL
    dialect's literal query strings and the replication socket."""

    spark: SparkSession
    url: str
    properties: dict[str, str]
    num_partitions: int = 8
    dialect: MySqlDialect | DerbyDialect = field(default_factory=MySqlDialect)

    # kept as a source-level override on top of the dialect's list
    # ADDITIVE extra exclusions, unioned with the dialect's hardcoded
    # system-schema list (pre-r9 this tuple WAS the whole exclusion
    # list — a caller could replace it to un-exclude a schema literally
    # named e.g. 'sys'; since the dialect seam it can only ADD. To
    # un-exclude a dialect default, subclass the dialect and narrow its
    # system_schemas instead.)
    system_schemas: tuple[str, ...] = ()

    def _query(self, q: str) -> DataFrame:
        return self.spark.read.jdbc(self.url, f"({q}) AS t", properties=self.properties)

    def _skip_schemas(self) -> set[str]:
        return {
            s.lower()
            for s in (*self.system_schemas, *self.dialect.system_schemas)
        }

    def list_schemas(self) -> list[str]:
        rows = self._query(self.dialect.schemas_sql()).collect()
        skip = self._skip_schemas()
        return [r[0] for r in rows if r[0].lower() not in skip]

    def list_tables(self, schemas: Sequence[str]) -> dict[str, list[str]]:
        rows = self._query(self.dialect.tables_sql(schemas)).collect()
        out: dict[str, list[str]] = {}
        for sc, tb in rows:
            out.setdefault(sc, []).append(tb)
        return out

    def get_table_ddl(self, schema: str, table: str) -> str:
        rows = self._query(self.dialect.ddl_sql(schema, table)).collect()
        return self.dialect.ddl_from_rows(rows, schema, table)

    def get_table_primary_keys(self, schema: str, table: str) -> list[str]:
        rows = self._query(self.dialect.pk_sql(schema, table)).collect()
        cols = self.dialect.pk_from_rows(rows)
        if not cols:
            raise NoPrimaryKeyError(f"{schema}.{table} has no primary key; not syncable")
        return cols

    def current_position(self) -> str:
        sql = self.dialect.position_sql()
        if sql is None:
            return ""
        row = self._query(sql).first()
        return self.dialect.position_from_row(row)

    def read_table(self, schema: str, table: str) -> DataFrame:
        pks = self.get_table_primary_keys(schema, table)
        fq = f"{schema}.{table}"
        if self.num_partitions <= 1:
            # correctness mode: one connection ≈ one consistent read (A7)
            return self.spark.read.jdbc(self.url, fq, properties=self.properties)
        # positional access: engines disagree on alias case folding
        # (MySQL preserves `lo`, Derby upper-cases to `LO`)
        bounds = self._query(
            f"SELECT MIN({pks[0]}) AS lo, MAX({pks[0]}) AS hi FROM {fq}"
        ).first()
        if bounds and isinstance(bounds[0], int):
            return self.spark.read.jdbc(
                self.url,
                fq,
                column=pks[0],
                lowerBound=bounds[0],
                upperBound=bounds[1] + 1,
                numPartitions=self.num_partitions,
                properties=self.properties,
            )
        # composite / non-numeric PK: sample boundaries, tuple predicates.
        # The ORDER BY ends up inside a derived table once Spark wraps the
        # query (MySQL is free to ignore it there), and parallel JDBC reads
        # return partitions in arbitrary order — so NEVER trust arrival
        # order: collect once (bounded at 100k rows), then sort + dedupe
        # the boundary tuples in Python. Unsorted/duplicate boundaries
        # would make chunk_predicates overlap and duplicate snapshot rows.
        sample = self._query(
            f"SELECT {', '.join(pks)} FROM {fq} ORDER BY {', '.join(pks)}"
        ).limit(100_000)
        rows = sorted({tuple(r) for r in sample.collect()}, key=boundary_sort_key)
        step = max(len(rows) // self.num_partitions, 1)
        preds = chunk_predicates(pks, rows[step::step])
        return self.spark.read.jdbc(self.url, fq, predicates=preds, properties=self.properties)


@dataclass
class JdbcMetadataSource(JdbcSnapshotSource):
    """JDBC source whose DISCOVERY goes through standard
    ``java.sql.DatabaseMetaData`` (getSchemas / getTables /
    getPrimaryKeys / getColumns) instead of MySQL's information_schema
    — portable across engines, proven end-to-end against embedded
    Derby in tests/test_jdbc_source.py. Discovery is catalog-rate and
    driver-side (a few metadata calls per table); the DATA path stays
    the inherited partitioned ``spark.read.jdbc`` (numeric-bound or
    composite-key chunk predicates).

    The reference binds discovery to MySQL (information_schema /
    SHOW CREATE TABLE, `internal/syncdb/mysql_data_source.go:24-125`);
    the metadata form is what lets the same snapshot pipeline point at
    any JDBC engine. ``current_position`` returns "" — a generic JDBC
    source has no replication log position (A16 is MySQL-specific); the
    snapshot-to-stream handoff then admits every change event, which is
    correct (and merely redundant) for a latest-wins merge."""

    extra_system_schemas: tuple[str, ...] = (
        # Derby's catalog schemas (uppercase); harmless for other engines
        "SYS", "SYSIBM", "SYSCAT", "SYSFUN", "SYSPROC", "SYSSTAT",
        "SYSCS_DIAG", "SYSCS_UTIL", "SQLJ", "NULLID",
    )

    def _with_meta(self, fn):
        jvm = self.spark.sparkContext._jvm
        if self.properties.get("driver"):
            jvm.java.lang.Class.forName(self.properties["driver"])
        props = jvm.java.util.Properties()
        for k, v in self.properties.items():
            props.setProperty(k, v)
        conn = jvm.java.sql.DriverManager.getConnection(self.url, props)
        try:
            return fn(conn.getMetaData())
        finally:
            conn.close()

    def list_schemas(self) -> list[str]:
        def go(md):
            rs, out = md.getSchemas(), []
            while rs.next():
                out.append(rs.getString("TABLE_SCHEM"))
            return out

        skip = self._skip_schemas() | {
            s.lower() for s in self.extra_system_schemas
        }
        return [s for s in self._with_meta(go) if s.lower() not in skip]

    def list_tables(self, schemas: Sequence[str]) -> dict[str, list[str]]:
        gateway = self.spark.sparkContext._gateway
        types_arr = gateway.new_array(gateway.jvm.java.lang.String, 1)
        types_arr[0] = "TABLE"

        def go(md):
            out: dict[str, list[str]] = {}
            for sc in schemas:
                rs = md.getTables(None, sc, "%", types_arr)
                while rs.next():
                    out.setdefault(sc, []).append(rs.getString("TABLE_NAME"))
            return out

        return self._with_meta(go)

    def get_table_primary_keys(self, schema: str, table: str) -> list[str]:
        def go(md):
            rs, out = md.getPrimaryKeys(None, schema, table), []
            while rs.next():
                out.append((rs.getInt("KEY_SEQ"), rs.getString("COLUMN_NAME")))
            return out

        cols = self._with_meta(go)
        if not cols:
            raise NoPrimaryKeyError(f"{schema}.{table} has no primary key; not syncable")
        # KEY_SEQ is the column's position WITHIN the key — the ordinal
        # order the reference fixes its Go-map nondeterminism to (A4)
        return [name for _, name in sorted(cols)]

    def get_table_ddl(self, schema: str, table: str) -> str:
        def go(md):
            rs, out = md.getColumns(None, schema, table, "%"), []
            while rs.next():
                typ = rs.getString("TYPE_NAME")
                size = rs.getInt("COLUMN_SIZE")
                digits = rs.getInt("DECIMAL_DIGITS")
                if typ.upper() in ("VARCHAR", "CHAR"):
                    typ = f"{typ}({size})"
                elif typ.upper() in ("DECIMAL", "NUMERIC"):
                    typ = f"{typ}({size},{digits})"
                null = "" if rs.getString("IS_NULLABLE") == "YES" else " NOT NULL"
                out.append(
                    (rs.getInt("ORDINAL_POSITION"),
                     f"{rs.getString('COLUMN_NAME')} {typ}{null}")
                )
            return [c for _, c in sorted(out)]

        cols = self._with_meta(go)
        return f"CREATE TABLE {schema}.{table} (" + ", ".join(cols) + ")"

    def current_position(self) -> str:
        return ""


# --------------------------------------------------------------------------
# Envelope conversion + per-table pipeline + fan-out
# --------------------------------------------------------------------------


def snapshot_events(
    df: DataFrame,
    data_source: str,
    schema: str,
    table: str,
    ddl: str,
    pos: str,
) -> DataFrame:
    """Wrap one table snapshot in the change-event envelope: a
    ``create_table`` control row (DDL in ``data['ddl']``), every row as
    ``insert`` (stringly map image, like the transport layer of the
    reference), and an ``end`` row carrying the snapshot position the
    incremental handoff resumes from (`fullamount_event.go:24-83`)."""
    from pyspark.sql import types as T

    spark = df.sparkSession
    kv = []
    for f in df.schema.fields:
        # binary columns base64-encode (a raw string cast is lossy for
        # arbitrary bytes); everything else stringifies like the
        # reference's []byte→string coercion (mysql_data_source.go:183-188)
        val = (
            F.base64(F.col(f.name))
            if isinstance(f.dataType, T.BinaryType)
            else F.col(f.name).cast("string")
        )
        kv += [F.lit(f.name), val]
    inserts = df.select(
        F.lit(data_source).alias("data_source"),
        F.lit(schema).alias("schema"),
        F.lit(table).alias("table"),
        F.lit(OP_INSERT).alias("op"),
        F.create_map(*kv).alias("data"),
        F.lit(None).cast(CHANGE_EVENT_SCHEMA["before"].dataType).alias("before"),
        F.lit(None).cast("timestamp_ntz").alias("ts"),
        F.lit(pos).alias("pos"),
        F.lit(None).cast("string").alias("txn_id"),
    )

    def control(op: str, data: dict[str, str] | None) -> DataFrame:
        row = {
            "data_source": data_source,
            "schema": schema,
            "table": table,
            "op": op,
            "data": data,
            "before": None,
            "ts": None,
            "pos": pos,
            "txn_id": None,
        }
        return spark.createDataFrame([row], CHANGE_EVENT_SCHEMA)

    return control(OP_CREATE_TABLE, {"ddl": ddl}).union(inserts).union(
        control(OP_END, None)
    )


@dataclass
class TableSnapshot:
    schema: str
    table: str
    pos: str
    events: DataFrame | None
    error: str | None = None
    n_rows: int | None = None  # A6 progress metric (count deferred to caller)

    def count_rows(self) -> int | None:
        """Row-count scan (A6, `fullamount_service.go:193-201`) — in the
        reference it bounds the chunk loop; here it is purely a progress
        metric, so it runs on demand, not in the pipeline hot path."""
        if self.n_rows is None and self.events is not None and self.error is None:
            self.n_rows = self.events.filter(F.col("op") == OP_INSERT).count()
        return self.n_rows


def snapshot_table(
    source: SnapshotSource,
    data_source: str,
    schema: str,
    table: str,
    checkpoint: CheckpointStore | None = None,
) -> TableSnapshot:
    """One-table pipeline (A11, `fullamount_service.go:136-191`):
    position → DDL → PK check → read → envelope → checkpoint upsert.
    Errors become a rollback-marked result, not an exception — the
    reference dispatches a Rollback event (`fullamount_service.go:122-127`)."""
    pos = source.current_position()
    try:
        ddl = source.get_table_ddl(schema, table)
        source.get_table_primary_keys(schema, table)  # no-PK rejection
        events = snapshot_events(
            source.read_table(schema, table), data_source, schema, table, ddl, pos
        )
    except Exception as exc:  # noqa: BLE001 — boundary: per-table rollback
        spark = getattr(source, "spark", None)
        rollback = None
        if spark is not None:
            rollback = spark.createDataFrame(
                [
                    {
                        "data_source": data_source,
                        "schema": schema,
                        "table": table,
                        "op": OP_ROLLBACK,
                        "data": {"err": str(exc)},
                        "before": None,
                        "ts": None,
                        "pos": pos,
                        "txn_id": None,
                    }
                ],
                CHANGE_EVENT_SCHEMA,
            )
        return TableSnapshot(schema, table, pos, rollback, error=str(exc))
    if checkpoint is not None:
        checkpoint.upsert(data_source, pos, sc=schema, tb=table, sync_type="full")
    return TableSnapshot(schema, table, pos, events)


def snapshot_all(
    source: SnapshotSource,
    data_source: str,
    rules: FilterRules | None = None,
    checkpoint: CheckpointStore | None = None,
    concurrency: int = DEFAULT_CONCURRENCY,
    sink: Callable[[TableSnapshot], None] | None = None,
) -> list[TableSnapshot]:
    """Discover → filter (A8/A9) → bounded parallel per-table snapshots
    (A10). Threads submit independent Spark jobs (the scheduler
    interleaves their stages — Spark's analog of the reference's
    errgroup+semaphore); checkpoint upserts are serialized with a lock
    because the meta store is read-modify-write."""
    schemas = source.list_schemas()
    if rules is not None:
        schemas = [s for s in schemas if rules.allow(s, "")]
    tables = source.list_tables(schemas)
    work = [
        (sc, tb)
        for sc, tbs in tables.items()
        for tb in tbs
        if rules is None or rules.allow(sc, tb)
    ]
    lock = threading.Lock()

    class LockedStore:
        def __init__(self, inner: CheckpointStore):
            self.inner = inner

        def upsert(self, *a, **kw):
            with lock:
                self.inner.upsert(*a, **kw)

    store = LockedStore(checkpoint) if checkpoint is not None else None
    results: list[TableSnapshot] = []
    with ThreadPoolExecutor(max_workers=concurrency) as pool:
        futures = [
            pool.submit(snapshot_table, source, data_source, sc, tb, store)
            for sc, tb in work
        ]
        for fut in futures:
            snap = fut.result()
            if sink is not None:
                sink(snap)
            results.append(snap)
    return results
