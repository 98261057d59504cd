"""kmeans_centroids vs an independent numpy Lloyd implementation — the
oracle proves Spark≡DuckDB; this proves both compute the algorithm the
docstring claims (seeded init, cosine argmax assignment, quantized
elementwise-mean update)."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

from go_cdc_spark.operators.similarity import (
    DIM,
    KMEANS_ITERS,
    N_CENTROIDS,
    kmeans_centroids,
)


def _numpy_lloyd(sf_dir: str):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
    t = t.sort_values("vec_id").reset_index(drop=True)
    vecs = np.stack([np.asarray(e, dtype=np.float64) for e in t["embedding"]])
    ids = t["vec_id"].to_numpy()
    cent = vecs[ids < N_CENTROIDS]
    for _ in range(KMEANS_ITERS):
        # cosine argmax, ties to the lowest centroid id (argmax is
        # first-max, centroids are already in id order)
        num = vecs @ cent.T
        cos = num / (np.linalg.norm(vecs, axis=1, keepdims=True) * np.linalg.norm(cent, axis=1))
        assign = cos.argmax(axis=1)
        new = np.zeros_like(cent)
        n_members = np.zeros(len(cent), dtype=np.int64)
        for c in range(len(cent)):
            members = vecs[assign == c]
            n_members[c] = len(members)
            q = np.floor(members * 1_000_000.0).astype(np.int64)
            new[c] = q.sum(axis=0).astype(np.float64) / 1_000_000.0 / float(len(members))
        cent = new
    return cent, n_members


def test_kmeans_matches_numpy(spark, sf_dir):
    cent, n_members = _numpy_lloyd(sf_dir)
    rows = kmeans_centroids(spark, sf_dir).collect()
    assert len(rows) == N_CENTROIDS * DIM
    for r in rows:
        got = r["value"]
        want = cent[r["centroid_id"], r["dim"] - 1]
        assert got == want or abs(got - want) < 1e-12, (
            r["centroid_id"],
            r["dim"],
            got,
            want,
        )
        assert r["n_members"] == n_members[r["centroid_id"]]
