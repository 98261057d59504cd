"""Wedge-family hub valve (VERDICT r8 "What's wrong" #1): DEGREE
orientation in triangle_count and the per-center degree cap in
graph_link_prediction — proven result-identical where the valve doesn't
bind, and proven to actually remove hub wedges where it does."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from go_cdc_spark.operators import graph as G
from go_cdc_spark.operators.graph import (
    _copurchase_edges,
    _degree_oriented,
    _graph_degrees,
    graph_link_prediction,
    triangle_count,
)

SF = "/root/testdata/sf0.001"


def _write_lineitem(spark, tmp_path, orders: list[tuple[int, list[int]]]) -> str:
    rows = [(ok, pk) for ok, parts in orders for pk in parts]
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    return str(tmp_path)


def _edges_with_support(edges: list[tuple[int, int]]) -> list[tuple[int, list[int]]]:
    """Each listed edge repeated in 2 distinct orders -> survives the
    support >= 2 filter as one stable co-purchase edge."""
    orders, ok = [], 0
    for edge in edges:
        for _ in range(2):
            ok += 1
            orders.append((ok, list(edge)))
    return orders


def _id_oriented_triangles(spark, sf_dir) -> int:
    """Round-8's id-oriented enumeration, kept as the SPEC: path
    a<b<c over canonical edges (a,b),(b,c), closed by (a,c)."""
    co = _copurchase_edges(spark, sf_dir)
    e1, e2, e3 = co.alias("e1"), co.alias("e2"), co.alias("e3")
    return (
        e1.join(e2, F.col("e2.pa") == F.col("e1.pb"))
        .join(
            e3,
            (F.col("e3.pa") == F.col("e1.pa"))
            & (F.col("e3.pb") == F.col("e2.pb")),
        )
        .count()
    )


def test_degree_orientation_matches_id_orientation_on_fixture(spark):
    """Triangle count is orientation-invariant: the degree-oriented
    operator must equal the id-oriented spec on the real fixture."""
    row = triangle_count(spark, SF).collect()[0]
    assert row["n_triangles"] == _id_oriented_triangles(spark, SF)


def test_triangle_count_on_constructed_graph(spark, tmp_path):
    """K4 (4 triangles) plus a disjoint 5-spoke star (0 triangles):
    exact counts, and the star hub contributes edges but no closures."""
    k4 = [(a, b) for a in (1, 2, 3, 4) for b in (1, 2, 3, 4) if a < b]
    star = [(10, s) for s in (11, 12, 13, 14, 15)]
    d = _write_lineitem(spark, tmp_path, _edges_with_support(k4 + star))
    row = triangle_count(spark, d).collect()[0]
    assert (row["n_edges"], row["n_triangles"]) == (11, 4)


def test_degree_orientation_bounds_hub_outdegree(spark, tmp_path):
    """On a star, the hub's out-degree under degree orientation is 0 —
    every edge points AT the hub (the O(|E|^1.5) mechanism: the hub
    never enumerates its neighbor pairs)."""
    star = [(1, s) for s in range(2, 12)]  # hub 1, degree 10
    d = _write_lineitem(spark, tmp_path, _edges_with_support(star))
    co = _copurchase_edges(spark, d)
    o = _degree_oriented(co, _graph_degrees(co))
    out_of_hub = o.filter(F.col("src") == 1).count()
    assert out_of_hub == 0
    assert o.count() == 10  # every edge still present, just re-pointed


def test_linkpred_cap_does_not_bind_on_fixture(spark, monkeypatch):
    """Fixture max degree is far under _LP_MAX_CENTER_DEG, so the
    capped result must be IDENTICAL to the uncapped one."""
    capped = sorted(
        (r["pa"], r["pb"], r["cn"], r["jaccard"])
        for r in graph_link_prediction(spark, SF).collect()
    )
    monkeypatch.setattr(G, "_LP_MAX_CENTER_DEG", 10**9)
    uncapped = sorted(
        (r["pa"], r["pb"], r["cn"], r["jaccard"])
        for r in graph_link_prediction(spark, SF).collect()
    )
    assert capped == uncapped
    assert len(capped) > 0  # the comparison is not vacuous


def test_linkpred_hub_center_is_excluded_above_cap(spark, tmp_path, monkeypatch):
    """With the cap lowered to 5, a degree-6 hub stops mediating
    common-neighbor evidence: pairs whose ONLY common neighbor is the
    hub disappear, pairs with a low-degree common neighbor keep cn
    from that center only."""
    monkeypatch.setattr(G, "_LP_MAX_CENTER_DEG", 5)
    hub = [(1, s) for s in (2, 3, 4, 5, 6, 7)]  # hub deg 6 > cap 5
    side = [(2, 100), (3, 100)]  # center 100 (deg 2) connects 2 and 3
    d = _write_lineitem(spark, tmp_path, _edges_with_support(hub + side))
    got = {
        (r["pa"], r["pb"]): r["cn"]
        for r in graph_link_prediction(spark, d).collect()
    }
    assert got.get((2, 3)) == 1  # via center 100 only — hub wedge dropped
    assert (4, 5) not in got  # hub was its only common neighbor


def test_linkpred_endpoint_degrees_stay_exact_under_cap(spark, tmp_path, monkeypatch):
    """The cap prunes wedge CENTERS, not jaccard denominators: an
    endpoint that is itself over-cap keeps its full degree in the
    union-size denominator."""
    monkeypatch.setattr(G, "_LP_MAX_CENTER_DEG", 5)
    hub = [(1, s) for s in (2, 3, 4, 5, 6, 7)]  # hub deg 6 + 2 below = 8
    # centers 100, 101 (deg 2 each) both connect hub 1 and part 2
    side = [(1, 100), (2, 100), (1, 101), (2, 101)]
    d = _write_lineitem(spark, tmp_path, _edges_with_support(hub + side))
    got = {
        (r["pa"], r["pb"]): (r["cn"], r["jaccard"])
        for r in graph_link_prediction(spark, d).collect()
    }
    # pair (100, 101): common neighbors are hub 1 (deg 8 > cap,
    # dropped as a center) and part 2 (deg 3 <= cap, kept) -> cn 1;
    # deg(100) = deg(101) = 2 stay EXACT, union = 2 + 2 - 1 = 3.
    cn, jac = got[(100, 101)]
    assert cn == 1
    assert jac == pytest.approx(1.0 / 3.0)


def test_ann_frontier_ivf_clears_recall_bar(spark):
    """The r9 'done' criterion for the ANN frontier: at least one
    bounded-volume route reaches recall@5 >= 0.8 on the fixture, and
    the brute-force anchor is exact."""
    from go_cdc_spark.operators.similarity import ann_recall_frontier

    rows = {r["route"]: r for r in ann_recall_frontier(spark, SF).collect()}
    brute = rows["brute_force"]
    assert brute["recall"] == 1.0 and brute["hits"] == brute["expected"]
    ivf2 = rows["ivf_nprobe2"]
    assert ivf2["recall"] >= 0.8
    assert 0 < ivf2["candidates"] < brute["candidates"]  # bounded volume
    # candidate ordering along the volume axis: single probe <= 2 probes
    assert rows["ivf"]["candidates"] <= ivf2["candidates"]


# ---------------------------------------------------------------------------
# Round-10 valves (VERDICT r9 #1): the giant-basket cap shared with the
# whole co-purchase edge build, and the hot-customer cap on the
# interval-overlap self-join.
# ---------------------------------------------------------------------------


def test_copurchase_basket_cap_does_not_bind_on_fixture(spark, monkeypatch):
    """TPC-H fixture baskets hold <= 7 distinct parts, far under
    MAX_BASKET, so the capped edge list must be IDENTICAL to the
    uncapped one."""
    capped = sorted(
        (r["pa"], r["pb"]) for r in _copurchase_edges(spark, SF).collect()
    )
    monkeypatch.setattr(G, "MAX_BASKET", 10**9)
    uncapped = sorted(
        (r["pa"], r["pb"]) for r in _copurchase_edges(spark, SF).collect()
    )
    assert capped == uncapped
    assert len(capped) > 0


def test_copurchase_basket_cap_drops_giant_basket(spark, tmp_path, monkeypatch):
    """With the cap lowered to 4, one 6-part mega-basket contributes NO
    pairs — only the small repeated baskets build edges."""
    monkeypatch.setattr(G, "MAX_BASKET", 4)
    orders = _edges_with_support([(1, 2), (3, 4)])  # 4 small baskets
    orders.append((99, [10, 11, 12, 13, 14, 15]))  # 6 parts > cap 4
    orders.append((98, [10, 11, 12, 13, 14, 15]))  # support-2 twin
    d = _write_lineitem(spark, tmp_path, orders)
    got = sorted((r["pa"], r["pb"]) for r in _copurchase_edges(spark, d).collect())
    assert got == [(1, 2), (3, 4)]  # mega-basket pairs never materialize


def test_copurchase_pairs_cap_does_not_bind_on_fixture(spark, monkeypatch):
    """Same equivalence for the behavioral copurchase_pairs query (its
    own module-level constant)."""
    from go_cdc_spark.operators import behavior as B
    from go_cdc_spark.operators.behavior import copurchase_pairs

    capped = [tuple(r) for r in copurchase_pairs(spark, SF).collect()]
    monkeypatch.setattr(B, "MAX_BASKET", 10**9)
    uncapped = [tuple(r) for r in copurchase_pairs(spark, SF).collect()]
    assert capped == uncapped
    assert len(capped) > 0


def test_interval_overlap_cap_does_not_bind_on_fixture(spark, monkeypatch):
    """Fixture max orders-per-customer is ~31 < _OVERLAP_MAX_ORDERS, so
    capped == uncapped on the real data."""
    from go_cdc_spark.operators import relational as R
    from go_cdc_spark.operators.relational import join_interval_overlap

    capped = sorted(tuple(r) for r in join_interval_overlap(spark, SF).collect())
    monkeypatch.setattr(R, "_OVERLAP_MAX_ORDERS", 10**9)
    uncapped = sorted(tuple(r) for r in join_interval_overlap(spark, SF).collect())
    assert capped == uncapped
    assert len(capped) > 0


def test_interval_overlap_hot_customer_is_excluded(spark, tmp_path, monkeypatch):
    """With the cap lowered to 3, a 5-order customer leaves the
    universe entirely while a 2-order customer keeps its overlap pair."""
    from go_cdc_spark.operators import relational as R
    from go_cdc_spark.operators.relational import join_interval_overlap

    monkeypatch.setattr(R, "_OVERLAP_MAX_ORDERS", 3)
    li, od = [], []
    for ok in range(1, 6):  # customer 7: 5 overlapping one-day orders
        li.append((ok, "1995-01-01"))
        od.append((ok, 7))
    for ok in (10, 11):  # customer 8: 2 overlapping orders
        li.append((ok, "1995-06-01"))
        od.append((ok, 8))
    spark.createDataFrame(
        [(ok, s) for ok, s in li], "l_orderkey long, l_shipdate string"
    ).selectExpr("l_orderkey", "CAST(l_shipdate AS DATE) AS l_shipdate").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "lineitem.parquet"))
    spark.createDataFrame(
        od, "o_orderkey long, o_custkey long"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    rows = join_interval_overlap(spark, str(tmp_path)).collect()
    got = sorted((r["custkey"], r["order_a"], r["order_b"]) for r in rows)
    assert got == [(8, 10, 11)]  # hot customer 7 contributes nothing


def test_ann_frontier_tuned_pq_clears_half_recall(spark):
    """The r9 #3 'done' criterion: the tuned PQ arm (16x128 codebook,
    2 Lloyd rounds, 18x compression) reaches recall@5 >= 0.5 on the
    fixture while the default 4x8 arm charts the high-compression end."""
    from go_cdc_spark.operators.similarity import ann_recall_frontier

    rows = {r["route"]: r for r in ann_recall_frontier(spark, SF).collect()}
    tuned = rows["pq_tuned"]
    assert tuned["recall"] >= 0.5
    assert tuned["candidates"] == rows["brute_force"]["candidates"]  # ADC scans all
    assert rows["pq_adc"]["recall"] < tuned["recall"]  # the tuning is measurable
