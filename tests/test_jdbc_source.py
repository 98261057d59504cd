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
