"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registered query through Spark AND its oracle SQL through
DuckDB on the same parquet, then compares: row count, column-name set,
and order-insensitive canonicalized values — **through pandas on both
sides, exactly like the driver** (Spark ``toPandas()`` vs DuckDB
``fetch_df()``), so result *dtype* divergence is visible, not just
value divergence.

Two historical driver-fail/local-pass escapes drove this design:

- round 1: complex-typed cells (arrays) are unhashable under the
  driver's ``pd.util.hash_pandas_object`` — we pre-check hashability
  on both frames and fail loudly;
- round 2: DuckDB HUGEINT (INT128, e.g. from ``SUM(int)`` or window
  sums) converts to pandas **float64**, while Spark's BIGINT stays
  int64 — identical values, different hash. The old ``fetchall()``
  path collapsed both to Python int and hid it. The pandas path keeps
  the float64/int64 distinction, so an uncast HUGEINT oracle fails
  here first.

Intentional leniencies (semantic, not dtype, equivalences both engines
agree on at the value level): DATE unifies with midnight TIMESTAMP
(DuckDB's fetch_df converts DATE to datetime64 while Spark keeps
``datetime.date`` objects), and every NA form (None/NaN/NaT) maps to
one token.
"""

from __future__ import annotations

import datetime
import decimal
import math

import duckdb
import numpy as np
import pandas as pd

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_connect(sf_dir: str):
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def run_duckdb_df(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb_connect(sf_dir)
    try:
        return con.execute(sql).fetch_df()
    finally:
        con.close()


def describe_duckdb(sql: str, sf_dir: str) -> list[tuple[str, str]]:
    """(column, duckdb_type) of an oracle's result, without running it."""
    con = duckdb_connect(sf_dir)
    try:
        rows = con.execute(f"DESCRIBE {sql}").fetchall()
    finally:
        con.close()
    return [(r[0], r[1]) for r in rows]


def _canon_cell(v):
    if v is None:
        return None
    if isinstance(v, (list, tuple, dict, set, np.ndarray)):
        # Unhashable under the driver's canonicalizer; the hashability
        # pre-check in compare() already failed — this branch only
        # serves the diff message.
        return ("complex", str(v))
    if isinstance(v, float) and math.isnan(v):
        return None
    if v is pd.NaT:
        return None
    if isinstance(v, (bool, np.bool_)):
        return ("b", bool(v))
    if isinstance(v, (int, np.integer)):
        return ("i", int(v))
    if isinstance(v, (float, np.floating)):
        return ("f", repr(float(v)))
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, pd.Timestamp):
        return ("t", v.to_pydatetime().replace(tzinfo=None).isoformat())
    if isinstance(v, datetime.datetime):
        return ("t", v.replace(tzinfo=None).isoformat())
    if isinstance(v, datetime.date):
        # Unify with midnight timestamps: DuckDB's fetch_df turns DATE
        # into datetime64, Spark keeps date objects.
        return ("t", datetime.datetime(v.year, v.month, v.day).isoformat())
    if isinstance(v, bytes):
        return ("bytes", v.hex())
    return ("s", str(v))


def _check_hashable(name: str, side: str, pdf: pd.DataFrame) -> None:
    try:
        pd.util.hash_pandas_object(pdf, index=False)
    except TypeError as e:
        raise AssertionError(
            f"{name}: {side} result is not hashable by the driver's pandas "
            f"canonicalizer (complex-typed cells?): {e}"
        ) from e


def _sorted_rows(pdf: pd.DataFrame):
    cols = sorted(pdf.columns)
    canon = [
        tuple(_canon_cell(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    ]
    return sorted(canon, key=lambda t: tuple(str(x) for x in t))


def compare(name: str, spark_df, sql: str, sf_dir: str) -> None:
    s_pdf = spark_df.toPandas()
    d_pdf = run_duckdb_df(sql, sf_dir)
    assert sorted(s_pdf.columns) == sorted(d_pdf.columns), (
        f"{name}: column mismatch spark={sorted(s_pdf.columns)} "
        f"duck={sorted(d_pdf.columns)}"
    )
    assert len(s_pdf) == len(d_pdf), (
        f"{name}: row count spark={len(s_pdf)} duck={len(d_pdf)}"
    )
    _check_hashable(name, "spark", s_pdf)
    _check_hashable(name, "duckdb", d_pdf)
    s_canon = _sorted_rows(s_pdf)
    d_canon = _sorted_rows(d_pdf)
    if s_canon != d_canon:
        diffs = [
            (i, a, b)
            for i, (a, b) in enumerate(zip(s_canon, d_canon))
            if a != b
        ][:5]
        raise AssertionError(
            f"{name}: value mismatch (spark, duck), first diffs: {diffs}"
        )
