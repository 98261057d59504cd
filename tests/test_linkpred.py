"""Link-prediction spec tests beyond the oracle hash-check: exact
Jaccard scores on a constructed co-purchase graph."""

from __future__ import annotations

from go_cdc_spark.operators.graph import graph_link_prediction


def _write_lineitem(spark, tmp_path, orders: list[tuple[int, list[int]]]) -> str:
    rows = [(ok, pk) for ok, parts in orders for pk in parts]
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    return str(tmp_path)


def test_four_cycle_predicts_the_diagonals(spark, tmp_path):
    """C4 graph 1-2-3-4-1: the two diagonals (1,3) and (2,4) are the
    only predictions, each with 2 common neighbors and Jaccard 1.0."""
    orders = []
    ok = 0
    for edge in [(1, 2), (2, 3), (3, 4), (1, 4)]:
        for _ in range(2):  # support >= 2 keeps the edge
            ok += 1
            orders.append((ok, list(edge)))
    # support-1 co-occurrence (1,5): must NOT create an edge, so part 5
    # never reaches the candidate stage
    ok += 1
    orders.append((ok, [1, 5]))
    out = graph_link_prediction(spark, _write_lineitem(spark, tmp_path, orders))
    rows = sorted((r["pa"], r["pb"], r["cn"], r["jaccard"]) for r in out.collect())
    assert rows == [(1, 3, 2, 1.0), (2, 4, 2, 1.0)]


def test_adjacent_pairs_are_never_predicted(spark, tmp_path):
    """Triangle 1-2-3: every pair is already an edge -> no predictions."""
    orders = []
    ok = 0
    for edge in [(1, 2), (2, 3), (1, 3)]:
        for _ in range(2):
            ok += 1
            orders.append((ok, list(edge)))
    out = graph_link_prediction(spark, _write_lineitem(spark, tmp_path, orders))
    assert out.count() == 0


def test_jaccard_denominator_is_union_size(spark, tmp_path):
    """Star-plus-tail: hub 1 joined to 2,3,4; extra edge 2-5. Leaves 3
    and 4 (deg 1 each) share the hub -> jaccard 1/1; the tailed node 2
    (deg 2) dilutes its pairs to 1/2 — the denominator is the UNION
    size, not the min degree."""
    orders = []
    ok = 0
    for edge in [(1, 2), (1, 3), (1, 4), (2, 5)]:
        for _ in range(2):
            ok += 1
            orders.append((ok, list(edge)))
    out = graph_link_prediction(spark, _write_lineitem(spark, tmp_path, orders))
    got = {(r["pa"], r["pb"]): (r["cn"], r["jaccard"]) for r in out.collect()}
    assert got[(3, 4)] == (1, 1.0)  # deg3=deg4=1, union size 1
    assert got[(2, 3)] == (1, 0.5)  # deg2=2 (hub + 5), union size 2
    assert got[(2, 4)] == (1, 0.5)
    # ranking: perfect-jaccard pair first under (jaccard DESC, pa, pb)
    first = out.collect()[0]
    assert (first["pa"], first["pb"]) == (3, 4)
