"""SQL entry point: register the table set as temp views so users can
query the engine with plain ``spark.sql`` — the surface a user coming
from any SQL warehouse expects. The DataFrame operators and the SQL
path share Catalyst, so plans (pushdown, broadcast, partial agg) are
identical either way; tests/test_sql.py pins result equality against
the operator surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .tables import TABLE_NAMES, load


def register_views(spark: SparkSession, sf_dir: str, suffix: str = "") -> list[str]:
    """Create (or replace) one temp view per fixture table; returns the
    view names. ``suffix`` lets two scale factors coexist in a session."""
    names = []
    for t in TABLE_NAMES:
        name = f"{t}{suffix}"
        load(spark, sf_dir, t).createOrReplaceTempView(name)
        names.append(name)
    return names


def run_sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """One-shot: ensure views exist, run the statement."""
    register_views(spark, sf_dir)
    return spark.sql(query)
