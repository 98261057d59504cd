"""Registry wiring `queries()` names → (PySpark callable, oracle SQL).

Every operator from SURVEY.md §2 registers here via the ``@query``
decorator. The driver harness runs each callable at sf=0.01 and
compares against the oracle SQL in DuckDB (row-count + schema +
order-insensitive value-hash), so:

- **column names must match** — alias every computed column the same
  on both sides;
- **float aggregates must be order-independent** — sums of DOUBLE
  columns are computed as ``SUM(CAST(x AS DECIMAL(38,6)))`` then cast
  back to DOUBLE, which is exact (decimal accumulation) and therefore
  bit-identical regardless of accumulation order / parallelism;
- oracle-less entries (genuinely non-SQL-expressible ops) get a
  weaker rows-only check from the driver.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query; ``oracle`` is DuckDB-ANSI SQL or None."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = " ".join(oracle.split())
        return fn

    return deco
