"""Property tests for the round-8 operators: random structures against
plain-Python references (the fixtures prove specific shapes; these
prove the recurrences hold off the fixture distribution)."""

from __future__ import annotations

import collections
import random

import numpy as np
import pytest

from go_cdc_spark.operators.graph import (
    _KCORE_K,
    _KCORE_ROUNDS,
    _LPA_ROUNDS,
)
from go_cdc_spark.operators.multimodal import _bytes_ahash16, ahash64


# ---------------------------------------------------------------------------
# aHash invariances (pure Python — no Spark round trip needed)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_ahash_brightness_shift_invariant(seed):
    """Adding a constant to every pixel shifts each cell mean and the
    global mean equally, so the hash is exactly unchanged — the
    re-exposure robustness aHash is chosen for."""
    rng = np.random.RandomState(seed)
    img = (rng.rand(17, 23, 3) * 180).astype(np.uint8)  # non-divisible dims
    shifted = (img.astype(int) + 40).clip(0, 255).astype(np.uint8)
    assert (shifted <= 255).all() and (img <= 215).all()
    assert ahash64(img) == ahash64(shifted)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_ahash_scale_invariant_on_block_constant_images(seed):
    """An image that is constant within each 8x8 block hashes the same
    at any integer upscale (block means are exact)."""
    rng = np.random.RandomState(seed)
    cells = (rng.rand(8, 8) * 255).astype(np.uint8)
    small = np.kron(cells, np.ones((2, 2), dtype=np.uint8))
    big = np.kron(cells, np.ones((6, 6), dtype=np.uint8))
    assert ahash64(small) == ahash64(big)


def test_bytes_ahash_bit_semantics():
    """Every bit of the byte-level hash matches the definition
    byte_i * n > sum(bytes), MSB-first over the first 16 bytes."""
    rng = random.Random(9)
    for _ in range(50):
        payload = bytes(rng.randrange(256) for _ in range(16))
        h = _bytes_ahash16(payload)
        total = sum(payload)
        for i, b in enumerate(payload):
            expect = 1 if b * 16 > total else 0
            assert (h >> (15 - i)) & 1 == expect


# ---------------------------------------------------------------------------
# k-core / LPA recurrences on random graphs (one Spark run over a
# union of random edge sets — kept to a single job for test economy)
# ---------------------------------------------------------------------------


def _random_edges(rng, n_nodes, n_edges):
    seen = set()
    while len(seen) < n_edges:
        a, b = rng.randrange(n_nodes), rng.randrange(n_nodes)
        if a == b:
            continue
        seen.add((min(a, b), max(a, b)))
    return sorted(seen)


def _peel_ref(edges, k, rounds):
    adj = collections.defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    alive = set(adj)
    layer = {}
    for r in range(1, rounds + 1):
        doomed = {n for n in alive if sum(1 for m in adj[n] if m in alive) < k}
        if not doomed:
            break
        for n in doomed:
            layer[n] = r
        alive -= doomed
    for n in alive:
        layer[n] = 0
    return layer


def test_driver_peel_matches_reference_on_random_graphs():
    """The shipped round-capped driver peeler (the path every fixture
    takes) equals an independent reference on 20 random graphs,
    including sparse ones that peel to nothing and dense ones that
    never peel."""
    from go_cdc_spark.operators.graph import _driver_peel_layers

    rng = random.Random(42)
    for trial in range(20):
        n = rng.randrange(5, 40)
        m = rng.randrange(1, min(n * (n - 1) // 2, 80) + 1)
        edges = _random_edges(rng, n, m)
        got = dict(_driver_peel_layers(edges))
        assert got == _peel_ref(edges, _KCORE_K, _KCORE_ROUNDS), (trial, edges)


def _lpa_ref(edges, rounds):
    adj = collections.defaultdict(list)
    for a, b in edges:
        adj[a].append(b)
        adj[b].append(a)
    label = {n: n for n in adj}
    for _ in range(rounds):
        nxt = {}
        for n, neigh in adj.items():
            votes = collections.Counter(label[x] for x in neigh)
            top = max(votes.values())
            nxt[n] = min(l_ for l_, c in votes.items() if c == top)
        label = nxt
    return label


def test_distributed_lpa_matches_reference_on_random_graph(spark, tmp_path):
    """The distributed LPA rounds (join + vote count + top-1 window)
    equal the synchronous reference on a random graph fed through a
    scratch lineitem table shaped to produce exactly those co-purchase
    edges (each edge = one shared order with two lines, twice for
    support ≥ 2)."""
    from go_cdc_spark.operators.graph import graph_label_prop

    rng = random.Random(7)
    edges = _random_edges(rng, 25, 40)
    rows = []
    order = 0
    for a, b in edges:
        for _ in range(2):  # two distinct orders → support 2
            rows.append((order, a))
            rows.append((order, b))
            order += 1
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    df.write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    got = {
        r["part"]: r["community"]
        for r in graph_label_prop(spark, str(tmp_path)).collect()
    }
    assert got == _lpa_ref(edges, _LPA_ROUNDS)
