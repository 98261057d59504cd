"""Filter-rule semantics tests — parity cases derived from the reference
decision tree (`pkg/config/db.go:101-165`): per-schema override, exclude-
over-include, trailing-underscore prefix wildcard (underscore stripped),
schema allowlist exact-match, empty config allows all. The compiled
Column expression must agree with the python evaluation on every case."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from go_cdc_spark.functions.rules import FilterRules

CFG = {
    "global": {
        "include_schemas": "app,billing",
        "include_tables": "users,orders_",
        "exclude_tables": "orders_tmp_,audit",
    },
    "schemas": {
        "legacy": {"include_tables": "keep_"},
    },
}

CASES = [
    # (schema, table, expected)
    ("app", "users", True),
    ("app", "orders_2024", True),       # include prefix 'orders_' → 'orders'*
    ("app", "orders", True),            # prefix match after trimming '_'
    ("app", "orders_tmp_x", False),     # exclude-over-include
    ("app", "audit", False),            # exact exclude
    ("app", "other", False),            # include list is an allowlist
    ("billing", "users", True),
    ("hr", "users", False),             # schema not in include_schemas
    ("legacy", "keep_this", True),      # per-schema override
    ("legacy", "keepX", True),          # prefix 'keep_' trims to 'keep'
    ("legacy", "users", False),         # global include does NOT apply here
    ("legacy", "audit", False),         # per-schema allowlist rejects it
    ("legacy", "keep_", True),          # pattern string itself matches
]


@pytest.mark.parametrize("schema,table,expected", CASES)
def test_allow_python(schema, table, expected):
    rules = FilterRules.parse(CFG)
    assert rules.allow(schema, table) is expected


def test_empty_config_allows_all():
    rules = FilterRules.parse({})
    assert rules.allow("anything", "at_all")
    assert rules.allow("x")


def test_schema_only_filtering():
    rules = FilterRules.parse(CFG)
    assert rules.allow_schemas(["app", "billing", "hr", "legacy"]) == [
        "app",
        "billing",
        "legacy",  # per-schema pattern exists → allowed at schema level
    ]


def test_allow_tables_catalog_pruning():
    rules = FilterRules.parse(CFG)
    catalog = {
        "app": ["users", "orders_2024", "audit", "other"],
        "hr": ["users"],
        "legacy": ["keep_this", "users"],
    }
    assert rules.allow_tables(catalog) == {
        "app": ["users", "orders_2024"],
        "legacy": ["keep_this"],
    }


def test_compiled_column_matches_python(spark):
    rules = FilterRules.parse(CFG)
    df = spark.createDataFrame(
        [(s, t) for s, t, _ in CASES], ["schema", "table"]
    )
    got = {
        (r["schema"], r["table"]): r["allowed"]
        for r in df.select(
            "schema",
            "table",
            rules.to_column(F.col("schema"), F.col("table")).alias("allowed"),
        ).collect()
    }
    for schema, table, expected in CASES:
        assert got[(schema, table)] is expected, (schema, table)


def test_compiled_column_empty_config(spark):
    rules = FilterRules.parse({})
    df = spark.createDataFrame([("a", "b")], ["schema", "table"])
    assert df.filter(rules.to_column(F.col("schema"), F.col("table"))).count() == 1
