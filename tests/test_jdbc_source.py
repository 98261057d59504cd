"""JdbcSnapshotSource discovery logic, driven through a stubbed
``_query`` (no database in the container): system-schema exclusion,
PK ordinal ordering, no-PK rejection — the decision logic around the
JDBC glue, which itself stays one line per call."""

from __future__ import annotations

import pytest

from go_cdc_spark.sources.snapshot import (
    JdbcSnapshotSource,
    NoPrimaryKeyError,
    chunk_predicates,
)


def _source(spark, answers: dict[str, list[tuple]]):
    src = JdbcSnapshotSource(spark, "jdbc:stub://", {})

    def fake_query(q: str):
        for key, rows in answers.items():
            if key in q:
                return spark.createDataFrame(rows, answers[key + "__cols"])
        raise AssertionError(f"unexpected query: {q}")

    src._query = fake_query  # type: ignore[method-assign]
    return src


def test_list_schemas_excludes_system(spark):
    src = _source(
        spark,
        {
            "schemata": [("app",), ("mysql",), ("sales",), ("sys",)],
            "schemata__cols": ["schema_name"],
        },
    )
    assert src.list_schemas() == ["app", "sales"]


def test_list_tables_groups_by_schema(spark):
    src = _source(
        spark,
        {
            "information_schema.tables": [
                ("app", "users"),
                ("app", "orders"),
                ("sales", "fact"),
            ],
            "information_schema.tables__cols": ["table_schema", "table_name"],
        },
    )
    out = src.list_tables(["app", "sales"])
    assert out == {"app": ["users", "orders"], "sales": ["fact"]}


def test_primary_keys_ordinal_order_and_rejection(spark):
    src = _source(
        spark,
        {
            "information_schema.columns": [("l_orderkey",), ("l_linenumber",)],
            "information_schema.columns__cols": ["column_name"],
        },
    )
    # ordinal order preserved (fixes the reference's Go-map nondeterminism)
    assert src.get_table_primary_keys("app", "lineitem") == [
        "l_orderkey",
        "l_linenumber",
    ]

    empty = _source(
        spark,
        {
            "information_schema.columns": [],
            "information_schema.columns__cols": "column_name string",
        },
    )
    with pytest.raises(NoPrimaryKeyError):
        empty.get_table_primary_keys("app", "nopk")


# -- read_table: all three modes against a DuckDB-backed JDBC stand-in ------
#
# No database ships in the container, so the JDBC surface is emulated at
# the exact boundary Spark owns: a fake `spark.read.jdbc` that executes
# the same SQL (including partition predicates, and Spark's documented
# column/stride partitioning rules) against DuckDB over the fixture
# tables. Everything above that line — mode selection, bounds probing,
# boundary sampling, predicate generation — is the repo's real code.

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"


class _DuckJdbcReader:
    """`spark.read.jdbc` stand-in: executes against DuckDB views and
    replays Spark's JDBCRelation partitioning semantics (stride ranges
    with unbounded first/last partitions; one query per predicate)."""

    def __init__(self, spark, con, pk_rows):
        self._spark = spark
        self._con = con
        self._pk_rows = pk_rows
        self.calls = []

    @property
    def read(self):
        return self

    def jdbc(self, url, table, properties=None, predicates=None, column=None,
             lowerBound=None, upperBound=None, numPartitions=None):
        self.calls.append(
            {"table": table, "predicates": predicates, "column": column,
             "lowerBound": lowerBound, "upperBound": upperBound,
             "numPartitions": numPartitions}
        )
        if table.startswith("("):  # derived-table query from _query()
            sql = table[1 : table.rfind(")")]
            if "column_key = 'PRI'" in sql:
                return self._spark.createDataFrame(
                    self._pk_rows, "column_name string"
                )
            return self._df(self._con.execute(sql).fetch_df())
        base = f"SELECT * FROM {table.split('.', 1)[1]}"
        if predicates is not None:
            parts = [
                self._con.execute(f"{base} WHERE {p}").fetch_df()
                for p in predicates
            ]
            return self._df(pd.concat(parts, ignore_index=True))
        if column is not None:
            # JDBCRelation.columnPartition: stride ranges, ends unbounded
            stride = (upperBound - lowerBound) // numPartitions or 1
            preds, lo = [], lowerBound
            for i in range(numPartitions):
                hi = lo + stride
                if i == 0:
                    preds.append(f"{column} < {hi} OR {column} IS NULL")
                elif i == numPartitions - 1:
                    preds.append(f"{column} >= {lo}")
                else:
                    preds.append(f"{column} >= {lo} AND {column} < {hi}")
                lo = hi
            parts = [
                self._con.execute(f"{base} WHERE {p}").fetch_df()
                for p in preds
            ]
            return self._df(pd.concat(parts, ignore_index=True))
        return self._df(self._con.execute(base).fetch_df())

    def _df(self, pdf):
        return self._spark.createDataFrame(pdf)


def _jdbc_source(spark, table, pks, num_partitions):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW {table} AS SELECT * FROM read_parquet('{SF}/{table}.parquet')"
    )
    src = JdbcSnapshotSource(
        spark, "jdbc:stub://", {}, num_partitions=num_partitions
    )
    fake = _DuckJdbcReader(spark, con, [(c,) for c in pks])
    src.spark = fake  # read path only; createDataFrame goes to real spark
    return src, fake, con


def _multiset(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def _oracle_multiset(con, table, cols):
    return sorted(
        tuple(r) for r in con.execute(
            f"SELECT {', '.join(cols)} FROM {table}"
        ).fetchall()
    )


def test_read_table_single_partition_mode(spark):
    src, fake, con = _jdbc_source(spark, "region", ["r_regionkey"], 1)
    out = src.read_table("main", "region")
    assert _multiset(out, ["r_regionkey"]) == _oracle_multiset(con, "region", ["r_regionkey"])
    read_calls = [c for c in fake.calls if not c["table"].startswith("(")]
    assert read_calls == [
        {"table": "main.region", "predicates": None, "column": None,
         "lowerBound": None, "upperBound": None, "numPartitions": None}
    ]


def test_read_table_numeric_bounds_mode(spark):
    """Numeric single PK: stride partitioning must cover every row
    exactly once (Spark's unbounded first/last partitions + our
    max+1 upperBound make the edges safe)."""
    src, fake, con = _jdbc_source(spark, "customer", ["c_custkey"], 4)
    out = src.read_table("main", "customer")
    assert _multiset(out, ["c_custkey"]) == _oracle_multiset(con, "customer", ["c_custkey"])
    call = [c for c in fake.calls if c["column"] is not None][0]
    lo, hi = con.execute("SELECT MIN(c_custkey), MAX(c_custkey) FROM customer").fetchone()
    assert call["column"] == "c_custkey"
    assert call["lowerBound"] == lo
    assert call["upperBound"] == hi + 1  # exclusive upper: max row included
    assert call["numPartitions"] == 4


def test_read_table_numeric_mode_with_composite_pk(spark):
    """A composite PK whose FIRST column is numeric still uses stride
    partitioning on that column (partitioning needn't be unique, only
    covering) — and covers every row exactly once."""
    src, fake, con = _jdbc_source(
        spark, "lineitem", ["l_orderkey", "l_linenumber"], 4
    )
    out = src.read_table("main", "lineitem")
    cols = ["l_orderkey", "l_linenumber"]
    assert _multiset(out, cols) == _oracle_multiset(con, "lineitem", cols)
    call = [c for c in fake.calls if c["column"] is not None][0]
    assert call["column"] == "l_orderkey"


def test_read_table_composite_tuple_mode(spark):
    """Non-numeric leading PK: sampled-boundary tuple predicates must
    partition the table exactly — no row lost, no row duplicated — even
    though the sample query's arrival order is untrusted (read_table
    sorts + dedupes the boundaries itself)."""
    src, fake, con = _jdbc_source(
        spark, "events", ["event_type", "event_id"], 4
    )
    out = src.read_table("main", "events")
    cols = ["event_type", "event_id"]
    assert _multiset(out, cols) == _oracle_multiset(con, "events", cols)
    call = [c for c in fake.calls if c["predicates"] is not None][0]
    assert len(call["predicates"]) >= 2  # genuinely chunked


# -- non-trivial key types: DECIMAL / TIMESTAMP / NULL key prefixes ---------
#
# A true PK can't hold NULL, but the chunking key is whatever unique
# index discovery hands back — on MySQL that can be a UNIQUE index with
# nullable prefix columns. The tuple predicates are null-safe
# two-valued expressions under the NULL-sorts-first total order, so
# NOT(tuple_gt) keeps NULL-prefix rows and every row lands in exactly
# one chunk.


def _custom_source(spark, con, table, pks, num_partitions):
    src = JdbcSnapshotSource(
        spark, "jdbc:stub://", {}, num_partitions=num_partitions
    )
    fake = _DuckJdbcReader(spark, con, [(c,) for c in pks])
    src.spark = fake
    return src, fake


def test_read_table_tuple_mode_decimal_timestamp_pk(spark):
    """Composite (DECIMAL, TIMESTAMP) key: boundary literals render as
    quoted/decimal SQL text that the second engine (DuckDB) evaluates
    exactly; chunked union == full read, no row lost or doubled."""
    con = duckdb.connect()
    con.execute(
        """CREATE TABLE fees AS
           SELECT CAST(100 + (i * 7) % 83 + 0.25 * (i % 4) AS DECIMAL(10, 2)) AS fee,
                  TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (i % 97) HOUR AS ts,
                  i AS payload
           FROM range(500) t(i)"""
    )
    src, fake = _custom_source(spark, con, "fees", ["fee", "ts"], 4)
    chunked = src.read_table("main", "fees")
    cols = ["fee", "ts", "payload"]
    src1, _ = _custom_source(spark, con, "fees", ["fee", "ts"], 1)
    full = src1.read_table("main", "fees")
    assert _multiset(chunked, cols) == _multiset(full, cols)
    call = [c for c in fake.calls if c["predicates"] is not None][0]
    assert len(call["predicates"]) >= 2
    # disjointness on the engine itself: per-chunk counts sum to total
    counts = [
        con.execute(f"SELECT COUNT(*) FROM fees WHERE {p}").fetchone()[0]
        for p in call["predicates"]
    ]
    assert sum(counts) == 500 and min(counts) > 0


def test_read_table_tuple_mode_null_key_prefix(spark):
    """NULLs in the LEADING chunk-key column (legal for a UNIQUE-index
    key): every NULL-prefix row must appear in exactly one chunk — the
    naive `NOT (ts > x)` form silently drops them all (UNKNOWN under
    three-valued logic), which is the bug class this pins."""
    con = duckdb.connect()
    con.execute(
        """CREATE TABLE sess AS
           SELECT CASE WHEN i % 3 = 0 THEN NULL
                       ELSE TIMESTAMP '2024-01-01' + INTERVAL (i % 50) HOUR
                  END AS started,
                  i AS sess_id
           FROM range(300) t(i)"""
    )
    src, fake = _custom_source(spark, con, "sess", ["started", "sess_id"], 4)
    chunked = src.read_table("main", "sess")
    cols = ["started", "sess_id"]
    src1, _ = _custom_source(spark, con, "sess", ["started", "sess_id"], 1)
    full = src1.read_table("main", "sess")

    def nullsafe(df):
        return sorted(
            (tuple((v is not None, v) for v in r) for r in df.select(*cols).collect()),
        )

    assert nullsafe(chunked) == nullsafe(full)
    call = [c for c in fake.calls if c["predicates"] is not None][0]
    # with 100 NULL-prefix rows out of 300 and 4 chunks, at least one
    # sampled boundary tuple necessarily has a NULL prefix — the
    # IS NULL / IS NOT NULL forms must appear in the rendered SQL
    assert any("IS NOT NULL" in p for p in call["predicates"])
    counts = [
        con.execute(f"SELECT COUNT(*) FROM sess WHERE {p}").fetchone()[0]
        for p in call["predicates"]
    ]
    assert sum(counts) == 300, (counts, call["predicates"])


def test_chunk_predicates_null_boundary_partition_property(spark):
    """Decision-table property on the second engine: for a key space
    containing NULLs in both columns' values AND a boundary tuple with
    a NULL component, chunk_predicates assigns every row to exactly
    one chunk (evaluated by DuckDB, not by our own code)."""
    con = duckdb.connect()
    con.execute(
        """CREATE TABLE kv AS SELECT * FROM (VALUES
           (NULL, 1), (NULL, 2), (NULL, NULL),
           ('a', NULL), ('a', 1), ('a', 2),
           ('b', NULL), ('b', 7), ('c', 1)) t(x, y)"""
    )
    boundaries = [(None, 1), ("a", None), ("a", 1), ("b", 7)]
    preds = chunk_predicates(["x", "y"], boundaries)
    matched = [
        con.execute(f"SELECT COUNT(*) FROM kv WHERE {p}").fetchone()[0]
        for p in preds
    ]
    assert sum(matched) == 9, (matched, preds)
    # pairwise disjoint: each row matches exactly one predicate
    for i, p in enumerate(preds):
        for q in preds[i + 1:]:
            both = con.execute(
                f"SELECT COUNT(*) FROM kv WHERE ({p}) AND ({q})"
            ).fetchone()[0]
            assert both == 0, (p, q)


# ---------------------------------------------------------------------------
# REAL spark.read.jdbc round trips — embedded Derby (the JDBC driver
# Spark itself ships for its Hive metastore, org.apache.derby jars on
# the driver classpath), so the actual Spark JDBC scan path executes
# in-sandbox: schema resolution, partitioned reads, and the
# chunk_predicates partition SQL running inside a real database —
# closing the "chunk SQL is only DuckDB-cross-checked" gap.
# ---------------------------------------------------------------------------

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _derby(spark, tmp_path):
    url = f"jdbc:derby:{tmp_path}/derbydb;create=true"
    jvm = spark.sparkContext._jvm
    jvm.java.lang.Class.forName(DERBY_DRIVER)
    conn = jvm.java.sql.DriverManager.getConnection(url)
    return url, conn


def test_spark_read_jdbc_plain_and_numeric_partitions(spark, tmp_path):
    url, conn = _derby(spark, tmp_path)
    st = conn.createStatement()
    st.executeUpdate(
        "CREATE TABLE APP.ITEMS (K1 INT NOT NULL PRIMARY KEY, VAL DOUBLE)"
    )
    ps = conn.prepareStatement("INSERT INTO APP.ITEMS VALUES (?, ?)")
    want = {(i, float(i) * 1.5) for i in range(1, 101)}
    for k, v in sorted(want):
        ps.setInt(1, k)
        ps.setDouble(2, v)
        ps.executeUpdate()
    props = {"driver": DERBY_DRIVER}

    plain = spark.read.jdbc(url, "APP.ITEMS", properties=props)
    assert {(r.K1, r.VAL) for r in plain.collect()} == want

    part = spark.read.jdbc(
        url, "APP.ITEMS", column="K1", lowerBound=1, upperBound=101,
        numPartitions=4, properties=props,
    )
    assert part.rdd.getNumPartitions() == 4
    assert {(r.K1, r.VAL) for r in part.collect()} == want
    conn.close()


def test_jdbc_snapshot_source_numeric_pk_round_trip(spark, tmp_path):
    """JdbcSnapshotSource.read_table's numeric-PK branch against a real
    database (discovery stays MySQL-flavored, so PK lookup is injected;
    the read path — bounds query via _query's derived-table wrap +
    partitioned spark.read.jdbc — runs for real)."""
    from go_cdc_spark.sources.snapshot import JdbcSnapshotSource

    url, conn = _derby(spark, tmp_path)
    st = conn.createStatement()
    st.executeUpdate(
        "CREATE TABLE APP.NUMS (K1 INT NOT NULL PRIMARY KEY, VAL VARCHAR(10))"
    )
    ps = conn.prepareStatement("INSERT INTO APP.NUMS VALUES (?, ?)")
    want = {(i, f"v{i}") for i in range(1, 61)}
    for k, v in sorted(want):
        ps.setInt(1, k)
        ps.setString(2, v)
        ps.executeUpdate()
    src = JdbcSnapshotSource(
        spark, url, {"driver": DERBY_DRIVER}, num_partitions=4
    )
    src.get_table_primary_keys = lambda schema, table: ["K1"]
    df = src.read_table("APP", "NUMS")
    assert df.rdd.getNumPartitions() == 4
    assert {(r.K1, r.VAL) for r in df.collect()} == want
    conn.close()


def test_jdbc_snapshot_source_composite_pk_chunks_round_trip(spark, tmp_path):
    """The composite/non-numeric branch end-to-end: boundary sampling,
    chunk_predicates tuple SQL, and the predicates= partitioned
    spark.read.jdbc — all executing inside Derby, with NULLs in the
    second key column (unique-index chunking key, not a true PK) to
    exercise the null-safe two-valued leaves in a real engine."""
    from go_cdc_spark.sources.snapshot import JdbcSnapshotSource

    url, conn = _derby(spark, tmp_path)
    st = conn.createStatement()
    st.executeUpdate(
        "CREATE TABLE APP.SITEMS (K1 VARCHAR(5) NOT NULL, K2 INT, VAL DOUBLE)"
    )
    ps = conn.prepareStatement("INSERT INTO APP.SITEMS VALUES (?, ?, ?)")
    jvm = spark.sparkContext._jvm
    want = set()
    i = 0
    for k1 in ["a", "b", "c", "d", "e", "f"]:
        for k2 in [None, 1, 2, 3, 4, 5, 6, 7]:
            i += 1
            ps.setString(1, k1)
            if k2 is None:
                ps.setNull(2, jvm.java.sql.Types.INTEGER)
            else:
                ps.setInt(2, k2)
            ps.setDouble(3, float(i))
            ps.executeUpdate()
            want.add((k1, k2, float(i)))
    src = JdbcSnapshotSource(
        spark, url, {"driver": DERBY_DRIVER}, num_partitions=4
    )
    src.get_table_primary_keys = lambda schema, table: ["K1", "K2"]
    df = src.read_table("APP", "SITEMS")
    got = [(r.K1, r.K2, r.VAL) for r in df.collect()]
    assert len(got) == len(want), "chunks must not overlap or drop rows"
    assert set(got) == want
    assert df.rdd.getNumPartitions() > 1  # genuinely chunked
    conn.close()


def test_full_snapshot_pipeline_against_derby(spark, tmp_path):
    """The WHOLE reference loop — discover schemas → tables → DDL → PKs
    → chunked read → envelope (+ no-PK rejection as a rollback event) —
    against a real SQL database, via standard DatabaseMetaData
    discovery (JdbcMetadataSource). Closes A1-A7's 'discovery only
    tested against the parquet stand-in' gap."""
    from go_cdc_spark.sources.snapshot import (
        JdbcMetadataSource,
        snapshot_all,
    )

    url, conn = _derby(spark, tmp_path)
    st = conn.createStatement()
    # composite PK declared (K2, K1) to prove KEY_SEQ ordering is honored
    st.executeUpdate(
        "CREATE TABLE APP.ACCOUNTS (K1 INT NOT NULL, K2 VARCHAR(5) NOT NULL,"
        " BAL DOUBLE, PRIMARY KEY (K2, K1))"
    )
    st.executeUpdate("CREATE TABLE APP.NOTES (BODY VARCHAR(20))")  # no PK
    ps = conn.prepareStatement("INSERT INTO APP.ACCOUNTS VALUES (?, ?, ?)")
    want = set()
    for k1 in range(1, 31):
        k2 = f"s{k1 % 3}"
        ps.setInt(1, k1)
        ps.setString(2, k2)
        ps.setDouble(3, float(k1) * 2.5)
        ps.executeUpdate()
        want.add((str(k1), k2, str(float(k1) * 2.5)))
    st.executeUpdate("INSERT INTO APP.NOTES VALUES ('unkeyed')")

    src = JdbcMetadataSource(spark, url, {"driver": DERBY_DRIVER}, num_partitions=3)
    schemas = src.list_schemas()
    assert "APP" in schemas and not any(s.startswith("SYS") for s in schemas)
    tables = src.list_tables(["APP"])
    assert sorted(tables["APP"]) == ["ACCOUNTS", "NOTES"]
    assert src.get_table_primary_keys("APP", "ACCOUNTS") == ["K2", "K1"]
    ddl = src.get_table_ddl("APP", "ACCOUNTS")
    assert "K1 INTEGER NOT NULL" in ddl and "VARCHAR(5)" in ddl and "BAL DOUBLE" in ddl

    snaps = {s.table: s for s in snapshot_all(src, "derby1")}
    acc = snaps["ACCOUNTS"]
    assert acc.error is None
    rows = acc.events.collect()
    ops = [r.op for r in rows]
    assert ops[0] == "create_table" and ops[-1] == "end"
    images = {
        (r.data["K1"], r.data["K2"], r.data["BAL"])
        for r in rows
        if r.op == "insert"
    }
    assert images == want
    # the no-PK table is rejected into a rollback event, not an exception
    notes = snaps["NOTES"]
    assert notes.error and "no primary key" in notes.error
    assert [r.op for r in notes.events.collect()] == ["rollback"]
    conn.close()


def test_sql_dialect_discovery_against_derby(spark, tmp_path):
    """A1-A4 through JdbcSnapshotSource's SQL catalog path — the same
    _query -> collect -> extract orchestration the MySQL dialect uses,
    executing for real against Derby's SYS catalog (DerbyDialect).
    This is the r9 dialect seam: the only untested remainder of the
    JDBC source is the literal MySQL query strings + the replication
    socket."""
    from go_cdc_spark.sources.snapshot import (
        DerbyDialect,
        JdbcSnapshotSource,
        NoPrimaryKeyError,
    )

    url, conn = _derby(spark, tmp_path)
    st = conn.createStatement()
    # PK declared (K2, K1) against column order (K1, K2): the dialect
    # must return KEY order from the index descriptor, not table order
    st.executeUpdate(
        "CREATE TABLE APP.DIAL (K1 INT NOT NULL, K2 VARCHAR(5) NOT NULL,"
        " V DECIMAL(10,2), PRIMARY KEY (K2, K1))"
    )
    st.executeUpdate("CREATE TABLE APP.DNOPK (BODY VARCHAR(20))")

    src = JdbcSnapshotSource(
        spark, url, {"driver": DERBY_DRIVER}, dialect=DerbyDialect()
    )
    assert src.list_schemas() == ["APP"]  # every SYS* schema filtered
    assert src.list_tables(["APP"]) == {"APP": ["DIAL", "DNOPK"]}
    assert src.get_table_primary_keys("APP", "DIAL") == ["K2", "K1"]
    ddl = src.get_table_ddl("APP", "DIAL")
    assert ddl.startswith("CREATE TABLE APP.DIAL (")
    assert "K1 INTEGER NOT NULL" in ddl
    assert "V DECIMAL(10,2)" in ddl.replace(", 2)", ",2)")
    with pytest.raises(NoPrimaryKeyError):
        src.get_table_primary_keys("APP", "DNOPK")
    assert src.current_position() == ""  # no replication log in Derby
    conn.close()


def test_sql_dialect_full_pipeline_against_derby(spark, tmp_path):
    """snapshot_all over the SQL-dialect source: discovery, chunked
    read, and envelope all flow through the dialect seam."""
    from go_cdc_spark.sources.snapshot import (
        DerbyDialect,
        JdbcSnapshotSource,
        snapshot_all,
    )

    url, conn = _derby(spark, tmp_path)
    st = conn.createStatement()
    st.executeUpdate(
        "CREATE TABLE APP.DITEMS (K1 INT NOT NULL PRIMARY KEY, V VARCHAR(8))"
    )
    ps = conn.prepareStatement("INSERT INTO APP.DITEMS VALUES (?, ?)")
    want = set()
    for i in range(1, 41):
        ps.setInt(1, i)
        ps.setString(2, f"v{i}")
        ps.executeUpdate()
        want.add((str(i), f"v{i}"))

    src = JdbcSnapshotSource(
        spark, url, {"driver": DERBY_DRIVER}, num_partitions=3,
        dialect=DerbyDialect(),
    )
    snaps = {s.table: s for s in snapshot_all(src, "derby-sql")}
    rows = snaps["DITEMS"].events.collect()
    assert rows[0].op == "create_table" and rows[-1].op == "end"
    assert {(r.data["K1"], r.data["V"]) for r in rows if r.op == "insert"} == want
    conn.close()
