"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registered query through Spark AND its oracle SQL through
DuckDB on the same parquet, then compares: row count, column-name set,
and order-insensitive canonicalized values. Stricter than lenient —
floats compare bit-exact (our decimal-accumulation policy guarantees
it), so any drift the driver's value-hash would catch fails here first.
"""

from __future__ import annotations

import datetime
import decimal
import math

import duckdb

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


def run_duckdb(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


def _canon(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", repr(v))
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, datetime.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, datetime.date):
        return ("d", v.isoformat())
    if isinstance(v, (list, tuple)):
        return ("arr", tuple(_canon(x) for x in v))
    return str(v)


def _sorted_rows(cols: list[str], rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = [tuple(_canon(r[i]) for i in order) for r in rows]
    return sorted(canon, key=lambda t: tuple(str(x) for x in t))


def compare(name: str, spark_df, sql: str, sf_dir: str) -> None:
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    d_cols, d_rows = run_duckdb(sql, sf_dir)
    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} duck={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count spark={len(s_rows)} duck={len(d_rows)}"
    )
    s_canon = _sorted_rows(s_cols, s_rows)
    d_canon = _sorted_rows(d_cols, d_rows)
    if s_canon != d_canon:
        diffs = [
            (i, a, b)
            for i, (a, b) in enumerate(zip(s_canon, d_canon))
            if a != b
        ][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")
