"""Synchronous label propagation: spec test against a plain-Python
reference of the same deterministic recurrence (the oracle proves
Spark ≡ DuckDB; this proves the recurrence is the one we claim)."""

from __future__ import annotations

import collections

from go_cdc_spark.operators.graph import _LPA_ROUNDS, graph_label_prop

from .test_kcore import _edges


def _lpa_reference(edges) -> dict[int, int]:
    adj = collections.defaultdict(list)
    for x, y in edges:
        adj[x].append(y)
        adj[y].append(x)
    label = {n: n for n in adj}
    for _ in range(_LPA_ROUNDS):
        nxt = {}
        for n, neigh in adj.items():
            votes = collections.Counter(label[m] for m in neigh)
            # max count, ties to the smaller label
            nxt[n] = min(
                (lab for lab, c in votes.items() if c == max(votes.values())),
            )
        label = nxt
    return label


def test_lpa_matches_reference(spark, sf_dir):
    sf = sf_dir.rsplit("sf", 1)[1]
    expected = _lpa_reference(_edges(sf))
    got = {
        r["part"]: r["community"]
        for r in graph_label_prop(spark, sf_dir).collect()
    }
    assert got == expected


def test_lpa_finds_more_communities_than_components(spark, sf_dir):
    """Bounded LPA must be a strictly finer signal than 'everything in
    one blob': at least as many communities as connected components,
    and more than one on the fixture."""
    sf = sf_dir.rsplit("sf", 1)[1]
    rows = graph_label_prop(spark, sf_dir).collect()
    communities = {r["community"] for r in rows}
    assert len(communities) > 1
