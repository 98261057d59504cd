"""The local harness must reproduce both historical driver-fail/
local-pass escapes (r1: unhashable array cells; r2: DuckDB HUGEINT →
pandas float64 vs Spark int64). If these stop failing, the local
contract is weaker than the driver again."""

from __future__ import annotations

import pytest

from .oracle_harness import compare


def test_harness_catches_hugeint_oracle(spark, sf_dir):
    """An uncast SUM(int) oracle yields HUGEINT; the driver hashes it
    as float64 against Spark's int64 — must fail locally too (this is
    the exact round-2 pack_sequences/dq_audit failure mode)."""
    sdf = spark.sql("SELECT CAST(3 AS BIGINT) AS s")
    with pytest.raises(AssertionError, match="value mismatch"):
        compare(
            "hugeint_repro",
            sdf,
            "SELECT SUM(x) AS s FROM (VALUES (1), (2)) t(x)",
            sf_dir,
        )
    # and the cast form must pass
    compare(
        "hugeint_cast_ok",
        sdf,
        "SELECT CAST(SUM(x) AS BIGINT) AS s FROM (VALUES (1), (2)) t(x)",
        sf_dir,
    )


def test_harness_catches_array_cells(spark, sf_dir):
    """Array-typed result cells are unhashable under the driver's
    pandas canonicalizer (the round-1 agg_quantiles failure mode)."""
    sdf = spark.sql("SELECT array(1, 2) AS a")
    with pytest.raises(AssertionError, match="not hashable"):
        compare("array_repro", sdf, "SELECT [1, 2] AS a", sf_dir)
