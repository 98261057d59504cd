"""JdbcSnapshotSource discovery logic, driven through a stubbed
``_query`` (no database in the container): system-schema exclusion,
PK ordinal ordering, no-PK rejection — the decision logic around the
JDBC glue, which itself stays one line per call."""

from __future__ import annotations

import pytest

from go_cdc_spark.sources.snapshot import JdbcSnapshotSource, NoPrimaryKeyError


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
