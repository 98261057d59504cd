"""Spec tests for the round-9 surface additions, on constructed data
(the oracle hash-check proves engine parity; these prove the SPEC)."""

from __future__ import annotations

import pytest

from go_cdc_spark.operators.curation import ngram_novelty
from go_cdc_spark.operators.relational import (
    agg_mode,
    join_interval_overlap,
    win_distribution,
)


def _write(spark, tmp_path, table: str, rows, schema: str) -> str:
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        str(tmp_path / f"{table}.parquet")
    )
    return str(tmp_path)


def test_win_distribution_exact_positions(spark, tmp_path):
    """4 orders in one priority class: percent_rank = (rank-1)/3,
    cume_dist = rank/4, ntile(4) = one order per quartile."""
    rows = [(k, 1, "O", float(k * 100), None, "1-URGENT") for k in (1, 2, 3, 4)]
    d = _write(
        spark, tmp_path, "orders", rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    got = {
        r["o_orderkey"]: (r["pr"], r["cd"], r["quartile"])
        for r in win_distribution(spark, d).collect()
    }
    assert got[1] == (0.0, 0.25, 1)
    assert got[2] == (pytest.approx(1 / 3), 0.5, 2)
    assert got[3] == (pytest.approx(2 / 3), 0.75, 3)
    assert got[4] == (1.0, 1.0, 4)


def test_agg_mode_tie_breaks_to_smaller_value(spark, tmp_path):
    """Quantities 5 and 7 both appear twice -> the mode is 5 (count
    DESC, value ASC), never engine-dependent."""
    rows = [
        (1, 1, 1, 1, 5.0, 0.0, 0.0, 0.0, "A", "F", None),
        (2, 1, 1, 1, 5.0, 0.0, 0.0, 0.0, "A", "F", None),
        (3, 1, 1, 1, 7.0, 0.0, 0.0, 0.0, "A", "F", None),
        (4, 1, 1, 1, 7.0, 0.0, 0.0, 0.0, "A", "F", None),
        (5, 1, 1, 1, 9.0, 0.0, 0.0, 0.0, "A", "F", None),
    ]
    d = _write(
        spark, tmp_path, "lineitem", rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    )
    rows = agg_mode(spark, d).collect()
    assert len(rows) == 1
    assert (rows[0]["mode_qty"], rows[0]["mode_count"]) == (5, 2)


def test_interval_overlap_inclusive_bounds_and_disjoint(spark, tmp_path):
    """Orders of one customer with windows [d1,d3], [d3,d5], [d7,d8]:
    the first two TOUCH at d3 (overlap_days 0, still a pair); the third
    is disjoint (no pair). A second customer's window never pairs with
    the first customer's."""
    from datetime import datetime

    def ts(day):
        return datetime(2024, 1, day)

    li = [
        # order 1: ships d1..d3 / order 2: d3..d5 / order 3: d7..d8
        (1, 1, 1, 1, 1.0, 0.0, 0.0, 0.0, "N", "O", ts(1)),
        (1, 2, 1, 2, 1.0, 0.0, 0.0, 0.0, "N", "O", ts(3)),
        (2, 1, 1, 1, 1.0, 0.0, 0.0, 0.0, "N", "O", ts(3)),
        (2, 2, 1, 2, 1.0, 0.0, 0.0, 0.0, "N", "O", ts(5)),
        (3, 1, 1, 1, 1.0, 0.0, 0.0, 0.0, "N", "O", ts(7)),
        (3, 2, 1, 2, 1.0, 0.0, 0.0, 0.0, "N", "O", ts(8)),
        # customer 2's order overlapping order 1's window — must NOT pair
        (4, 1, 1, 1, 1.0, 0.0, 0.0, 0.0, "N", "O", ts(2)),
    ]
    _write(
        spark, tmp_path, "lineitem", li,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    )
    orders = [
        (1, 10, "O", 1.0, None, "1-URGENT"),
        (2, 10, "O", 1.0, None, "1-URGENT"),
        (3, 10, "O", 1.0, None, "1-URGENT"),
        (4, 20, "O", 1.0, None, "1-URGENT"),
    ]
    d = _write(
        spark, tmp_path, "orders", orders,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    got = {
        (r["order_a"], r["order_b"]): r["overlap_days"]
        for r in join_interval_overlap(spark, d).collect()
    }
    assert got == {(1, 2): 0}  # touching counts, length 0; 3 disjoint; 4 other cust


def test_ngram_novelty_extremes(spark, tmp_path):
    """A holdout doc copying training text verbatim scores 0; one with
    entirely unseen words scores 1."""
    docs = [
        (0, "the quick brown fox jumps over the lazy dog tonight"),  # train
        (8, "the quick brown fox jumps over the lazy dog tonight"),  # copy
        (9, "zebra yak xylophone walrus vulture unicorn tapir snake"),  # new
    ]
    d = _write(spark, tmp_path, "documents", docs, "doc_id long, text string")
    got = {r["doc_id"]: r["novelty"] for r in ngram_novelty(spark, d).collect()}
    assert got[8] == 0.0
    assert got[9] == 1.0
    assert set(got) == {8, 9}  # train docs don't appear in the output
