"""connected_components unit semantics: chains collapse transitively
(the a~b, b~c case pair-dropping gets wrong), components are labeled by
min id, convergence happens within the diameter bound."""

from __future__ import annotations

from go_cdc_spark.operators.dedup import connected_components


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    out = connected_components(df, "src", "dst")
    return {r.node: r.cluster_id for r in out.collect()}


def test_chain_collapses_to_one_cluster(spark):
    # 1-2, 2-3, 3-4: transitive closure must label all with 1
    assert _cc(spark, [(1, 2), (2, 3), (3, 4)]) == {1: 1, 2: 1, 3: 1, 4: 1}


def test_disjoint_components_keep_separate_labels(spark):
    got = _cc(spark, [(5, 9), (9, 7), (20, 30), (40, 40)])
    assert got == {5: 5, 9: 5, 7: 5, 20: 20, 30: 20, 40: 40}


def test_long_chain_converges(spark):
    n = 24
    edges = [(i, i + 1) for i in range(1, n)]
    got = _cc(spark, edges)
    assert set(got.values()) == {1}
    assert len(got) == n


def test_distributed_path_matches_driver_path(spark, monkeypatch):
    """Force the distributed label-propagation branch (threshold 0) and
    pin that it produces exactly the driver union-find's labeling."""
    import go_cdc_spark.operators.dedup as d

    edges = [(1, 2), (2, 3), (3, 4), (10, 11), (30, 30), (5, 4)]
    expect = _cc(spark, edges)  # driver union-find (small graph)
    monkeypatch.setattr(d, "DRIVER_CC_MAX_EDGES", 0)
    got = _cc(spark, edges)
    assert got == expect == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 30: 30}


def test_distributed_path_converges_logarithmically_on_long_chain(
    spark, monkeypatch
):
    """A 300-node path graph has diameter 299 — plain min-label
    propagation needs ~299 rounds and would blow the max_iter=50 cap
    (previously returning WRONG labels silently). Pointer doubling
    converges in O(log n): require the whole chain labeled 1 within 12
    rounds."""
    import go_cdc_spark.operators.dedup as d

    monkeypatch.setattr(d, "DRIVER_CC_MAX_EDGES", 0)
    n = 300
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(1, n)], "src long, dst long"
    )
    out = connected_components(df, "src", "dst", max_iter=12)
    got = {r.node: r.cluster_id for r in out.collect()}
    assert set(got.values()) == {1}
    assert len(got) == n


def test_distributed_path_raises_when_unconverged(spark, monkeypatch):
    """max_iter too small must raise, never return partial labels."""
    import pytest

    import go_cdc_spark.operators.dedup as d

    monkeypatch.setattr(d, "DRIVER_CC_MAX_EDGES", 0)
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 300)], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, "src", "dst", max_iter=2)
