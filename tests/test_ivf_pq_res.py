"""Residual IVF-PQ spec test: on a corpus WITH cluster structure the
residual encoding must beat plain-vector PQ — the fixture corpus is
i.i.d. random (nothing for the coarse quantizer to remove), so the
registered recall row shows residual LOSING there; this test proves
that is a property of the data, not a bug in the method."""

from __future__ import annotations

import numpy as np

from go_cdc_spark.operators.similarity import (
    DIM,
    N_CENTROIDS,
    N_QUERIES,
    _ivf_pq_res_topk,
    _ivf_pq_topk,
    sim_topk,
)


def _clustered_corpus(spark, tmp_path, n_per_cluster=25, noise=0.05):
    """vec 0..7 = cluster anchors (they are BOTH the coarse centroids
    and the query set, by the module's vec_id conventions); candidates
    are anchor + small noise, so residuals are tiny and PQ-encodable."""
    rng = np.random.RandomState(42)
    anchors = rng.randn(N_CENTROIDS, DIM)
    anchors /= np.linalg.norm(anchors, axis=1, keepdims=True)
    rows = [(i, [float(x) for x in anchors[i]], i) for i in range(N_CENTROIDS)]
    vid = N_QUERIES
    for c in range(N_CENTROIDS):
        for _ in range(n_per_cluster):
            v = anchors[c] + rng.randn(DIM) * noise
            rows.append((vid, [float(x) for x in v], c))
            vid += 1
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    return str(tmp_path)


def _pairs(df):
    return {(r["query_id"], r["cand_id"]) for r in df.collect()}


def test_residual_beats_plain_on_clustered_data(spark, tmp_path):
    sf = _clustered_corpus(spark, tmp_path)
    exact = _pairs(sim_topk(spark, sf))
    plain = _pairs(_ivf_pq_topk(spark, sf))
    res = _pairs(_ivf_pq_res_topk(spark, sf))
    r_plain = len(plain & exact) / len(exact)
    r_res = len(res & exact) / len(exact)
    # residuals within a tight cluster are small and PQ-encodable;
    # plain PQ must spend its 8 codewords covering 8 cluster locations.
    # Absolute recall stays modest by construction — top-5 among 25
    # near-tied cluster members is decided by noise the 8-codeword
    # codebook quantizes coarsely — the claim is the 2x+ separation
    # (measured 0.275 vs 0.125), not a high floor.
    assert r_res >= r_plain * 2, (r_res, r_plain)
    assert r_res >= 0.2, r_res


def test_residual_reconstruction_composes_exactly(spark, tmp_path):
    """Every scored candidate lives in its coarse cell, ranks are
    1..k dense per query, and scores are valid cosines."""
    sf = _clustered_corpus(spark, tmp_path, n_per_cluster=10)
    rows = _ivf_pq_res_topk(spark, sf).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == set(range(N_QUERIES))
    for q, rs in by_q.items():
        ranks = sorted(r["rank"] for r in rs)
        assert ranks == list(range(1, len(rs) + 1))
        assert all(-1.0 - 1e-9 <= r["cosine"] <= 1.0 + 1e-9 for r in rs)


def test_zero_residual_candidates_are_survivable(spark, tmp_path):
    """A candidate EXACTLY equal to its coarse centroid has a zero
    residual — no cosine exists for its slices (0/0). The assignment
    guard must map that to the deterministic code_id tie-break instead
    of an ANSI division error (found by the 10x scale sweep, whose
    key-shifted copies duplicate the centroid vectors)."""
    rng = np.random.RandomState(1)
    anchors = rng.randn(N_CENTROIDS, DIM)
    anchors /= np.linalg.norm(anchors, axis=1, keepdims=True)
    rows = [(i, [float(x) for x in anchors[i]], i) for i in range(N_CENTROIDS)]
    # candidates: exact float32 copies of every centroid + noised fill
    vid = N_QUERIES
    for c in range(N_CENTROIDS):
        copy = anchors[c].astype(np.float32)
        rows.append((vid, [float(x) for x in copy], c))
        vid += 1
    for c in range(N_CENTROIDS):
        for _ in range(12):
            v = anchors[c] + rng.randn(DIM) * 0.05
            rows.append((vid, [float(x) for x in v], c))
            vid += 1
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    out = _ivf_pq_res_topk(spark, str(tmp_path)).collect()  # must not raise
    assert {r["query_id"] for r in out} == set(range(N_QUERIES))
