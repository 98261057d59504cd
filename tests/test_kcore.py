"""k-core onion-layer decomposition: calibration + spec tests.

The oracle check (tests/test_queries_oracle.py) proves Spark ≡ DuckDB
on the unrolled recurrence; these tests prove the recurrence itself —
that _KCORE_ROUNDS rounds reach the peeling fixpoint on the fixtures
(so layer 0 IS the 2-core) and that the layer semantics match a plain
Python reference peeler.
"""

from __future__ import annotations

import collections

import duckdb
import pytest

from go_cdc_spark.operators.graph import (
    _KCORE_K,
    _KCORE_ROUNDS,
    graph_kcore_layers,
)

_EDGE_SQL = """
WITH co AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb,
         COUNT(DISTINCT a.l_orderkey) AS support
  FROM lineitem a
  JOIN lineitem b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
)
SELECT pa, pb FROM co WHERE support >= 2
"""


def _edges(sf: str) -> list[tuple[int, int]]:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '/root/testdata/sf{sf}/lineitem.parquet'"
    )
    return con.execute(_EDGE_SQL).fetchall()


def _peel_layers(edges) -> tuple[dict[int, int], int]:
    """Reference peeler: returns (node → layer, rounds to fixpoint)."""
    adj = collections.defaultdict(set)
    for x, y in edges:
        adj[x].add(y)
        adj[y].add(x)
    alive = set(adj)
    layer = {}
    rounds = 0
    while True:
        doomed = {
            n for n in alive if sum(1 for m in adj[n] if m in alive) < _KCORE_K
        }
        if not doomed:
            break
        rounds += 1
        for n in doomed:
            layer[n] = rounds
        alive -= doomed
    for n in alive:
        layer[n] = 0
    return layer, rounds


@pytest.mark.parametrize("sf", ["0.001", "0.01", "0.1"])
def test_round_budget_reaches_fixpoint(sf):
    """_KCORE_ROUNDS must cover the true peeling depth at every fixture
    SF — otherwise layer 0 would be a truncation, not the 2-core."""
    _, rounds = _peel_layers(_edges(sf))
    assert rounds <= _KCORE_ROUNDS, (
        f"sf{sf} needs {rounds} peel rounds; raise _KCORE_ROUNDS "
        f"(and the unrolled oracle) above {_KCORE_ROUNDS}"
    )


def test_layers_match_reference_peeler(spark, sf_dir):
    sf = sf_dir.rsplit("sf", 1)[1]
    expected, _ = _peel_layers(_edges(sf))
    got = {
        r["part"]: r["layer"] for r in graph_kcore_layers(spark, sf_dir).collect()
    }
    assert got == expected


def test_core_is_closed_under_degree(spark, sf_dir):
    """Every layer-0 node has ≥ k neighbors that are ALSO layer 0 —
    the defining property of the k-core."""
    sf = sf_dir.rsplit("sf", 1)[1]
    edges = _edges(sf)
    layers, _ = _peel_layers(edges)
    got = {
        r["part"]: r["layer"] for r in graph_kcore_layers(spark, sf_dir).collect()
    }
    adj = collections.defaultdict(set)
    for x, y in edges:
        adj[x].add(y)
        adj[y].add(x)
    core = {n for n, l_ in got.items() if l_ == 0}
    assert core  # non-degenerate fixture
    for n in core:
        assert len(adj[n] & core) >= _KCORE_K
    assert layers == got


def test_distributed_path_matches_driver_path(spark, sf_dir, monkeypatch):
    """Force the distributed bounded-round peel (threshold 0) and pin
    it equal to the driver peel — both must compute the identical
    round-capped recurrence."""
    import go_cdc_spark.operators.graph as g

    driver = {
        r["part"]: r["layer"] for r in graph_kcore_layers(spark, sf_dir).collect()
    }
    monkeypatch.setattr(g, "DRIVER_KCORE_MAX_EDGES", -1)
    dist = {
        r["part"]: r["layer"] for r in graph_kcore_layers(spark, sf_dir).collect()
    }
    assert dist == driver
