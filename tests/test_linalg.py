"""Linear-algebra operator spec tests: the in-engine Gram/covariance
and power-iteration results against an independent numpy reference
(tolerance-based — numpy accumulates in a different order; the engine
result itself is deterministic, the oracle hash-check proves that)."""

from __future__ import annotations

import numpy as np
import pytest

from go_cdc_spark.operators.linalg import (
    _DIM,
    _POWER_ROUNDS,
    embed_covariance,
    embed_pca_power,
)

TOL = 1e-9  # quantization 1e-12 x ~500 terms / n  plus float roundoff


def _write_embeddings(spark, tmp_path, mat: np.ndarray) -> str:
    rows = [
        (i, [float(x) for x in mat[i]], 0) for i in range(mat.shape[0])
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    return str(tmp_path)


def _rand(n: int, seed: int = 7) -> np.ndarray:
    rng = np.random.RandomState(seed)
    # float32 round-trip: what the parquet column actually stores
    return rng.randn(n, _DIM).astype(np.float32).astype(np.float64)


def test_covariance_matches_numpy(spark, tmp_path):
    mat = _rand(40)
    sf = _write_embeddings(spark, tmp_path, mat.astype(np.float32))
    rows = embed_covariance(spark, sf).collect()
    assert len(rows) == _DIM * (_DIM + 1) // 2
    gram_np = (mat.T @ mat) / mat.shape[0]
    cov_np = gram_np - np.outer(mat.mean(axis=0), mat.mean(axis=0))
    for r in rows:
        i, j = r["i"] - 1, r["j"] - 1
        assert r["n"] == 40
        assert r["gram"] == pytest.approx(gram_np[i, j], abs=TOL)
        assert r["cov"] == pytest.approx(cov_np[i, j], abs=TOL)
    # diagonal of a covariance matrix is a variance: non-negative
    assert all(r["cov"] >= -TOL for r in rows if r["i"] == r["j"])


def _reference_power(cov: np.ndarray, rounds: int) -> tuple[np.ndarray, float]:
    """The operator's exact recurrence (ones start, L2 normalize per
    round, Rayleigh quotient at the end) in plain numpy."""
    x = np.ones(cov.shape[0])
    for _ in range(rounds):
        y = cov @ x
        x = y / np.sqrt((y * y).sum())
    return x, float(x @ cov @ x)


def test_power_iteration_matches_reference_recurrence(spark, tmp_path):
    mat = _rand(40, seed=11)
    sf = _write_embeddings(spark, tmp_path, mat.astype(np.float32))
    rows = embed_pca_power(spark, sf).orderBy("i").collect()
    got = np.array([r["component"] for r in rows])
    lam = rows[0]["eigenvalue"]
    gram_np = (mat.T @ mat) / mat.shape[0]
    cov_np = gram_np - np.outer(mat.mean(axis=0), mat.mean(axis=0))
    ref, ref_lam = _reference_power(cov_np, _POWER_ROUNDS)
    assert np.abs(got - ref).max() < 1e-6
    assert lam == pytest.approx(ref_lam, abs=1e-6)
    assert (got**2).sum() == pytest.approx(1.0, abs=1e-9)


def test_power_iteration_finds_a_planted_direction(spark, tmp_path):
    """Data stretched 20x along one axis: three rounds are plenty to
    lock onto the planted principal direction."""
    rng = np.random.RandomState(3)
    axis = rng.randn(_DIM)
    axis /= np.linalg.norm(axis)
    coef = rng.randn(200, 1) * 20.0
    noise = rng.randn(200, _DIM) * 0.1
    mat = (coef * axis + noise).astype(np.float32).astype(np.float64)
    sf = _write_embeddings(spark, tmp_path, mat.astype(np.float32))
    rows = embed_pca_power(spark, sf).orderBy("i").collect()
    got = np.array([r["component"] for r in rows])
    assert abs(float(got @ axis)) > 0.99
    # eigenvalue ~ planted variance (20^2 x coef variance), >> noise
    assert rows[0]["eigenvalue"] > 100.0


def test_whiten_standardizes_each_dimension(spark, tmp_path):
    from go_cdc_spark.operators.linalg import embed_whiten

    mat = _rand(50, seed=5)
    sf = _write_embeddings(spark, tmp_path, mat.astype(np.float32))
    rows = embed_whiten(spark, sf).collect()
    got = np.zeros_like(mat)
    for r in rows:
        got[r["vec_id"], r["i"] - 1] = r["white"]
    ref = (mat - mat.mean(axis=0)) / mat.std(axis=0)
    assert np.abs(got - ref).max() < 1e-6
    # each whitened dim: mean ~0, population std ~1
    assert np.abs(got.mean(axis=0)).max() < 1e-9
    assert np.abs(got.std(axis=0) - 1.0).max() < 1e-9


def test_whiten_constant_dimension_maps_to_zero(spark, tmp_path):
    from go_cdc_spark.operators.linalg import embed_whiten

    mat = _rand(10, seed=9)
    mat[:, 3] = 2.5  # constant dim: sigma = 0
    sf = _write_embeddings(spark, tmp_path, mat.astype(np.float32))
    rows = embed_whiten(spark, sf).collect()
    vals = {r["white"] for r in rows if r["i"] == 4}
    assert vals == {0.0}
