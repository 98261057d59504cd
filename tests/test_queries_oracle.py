"""Every registered query with an oracle must hash-match DuckDB locally
(the same check the driver runs at sf0.01; we run sf0.001 by default,
set SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 for the full check).
Oracle-less queries get the weaker rows-&-schema-stability check.
"""

from __future__ import annotations

import pytest

from go_cdc_spark.plans.queries import ORACLE, QUERIES

from .oracle_harness import compare, describe_duckdb


def _names():
    return sorted(QUERIES)


# DuckDB result types whose pandas representation hash-matches the
# Spark type they mirror under the driver's canonicalizer. Notably
# ABSENT: HUGEINT (INT128 → pandas float64 while Spark BIGINT stays
# int64 — the round-2 red rows) and every nested type (unhashable —
# the round-1 red rows). DuckDB promotes SUM(int) and window sums to
# HUGEINT, so any aggregate an oracle exposes must be CAST to BIGINT.
_SAFE_ORACLE_TYPES = ("BIGINT", "INTEGER", "SMALLINT", "TINYINT",
                      "DOUBLE", "FLOAT", "VARCHAR", "DATE",
                      "TIMESTAMP", "BOOLEAN", "DECIMAL(")


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_result_dtypes_are_hash_safe(name, sf_dir):
    """DESCRIBE every registered oracle and reject result columns whose
    DuckDB type diverges from Spark's under pandas hashing (HUGEINT,
    nested types). This lint catches the round-2 INT128 escape class
    without running the query."""
    bad = [
        (col, typ)
        for col, typ in describe_duckdb(ORACLE[name], sf_dir)
        if not typ.upper().startswith(_SAFE_ORACLE_TYPES)
    ]
    assert not bad, (
        f"{name}: oracle result columns with hash-unsafe DuckDB types "
        f"{bad} — CAST them (HUGEINT → BIGINT) in the oracle SQL"
    )


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    if name in ORACLE:
        compare(name, df, ORACLE[name], sf_dir)
    else:
        rows = df.collect()
        assert rows is not None
        assert len(df.columns) > 0


@pytest.mark.parametrize("name", _names())
def test_query_output_is_scalar_only(name, spark, sf_dir):
    """The external harness canonicalizes every result with a pandas
    sort_values over all columns; array/map/struct cells are unhashable
    there and crash the whole correctness row (this killed agg_quantiles
    in round 1). Final projections must be scalar-typed, period."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    df = QUERIES[name](spark, sf_dir)
    bad = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not bad, f"{name} projects complex-typed columns {bad}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()).issubset(set(e.queries()))
