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


def test_semdedup_matches_numpy_reference(spark, sf_dir):
    """dedup_semdedup vs an independent numpy implementation of the
    whole pipeline (Lloyd → final assignment → within-cluster pair
    scan → keep-farther-from-centroid rule). The oracle proves
    Spark ≡ DuckDB; this proves both implement SemDeDup's semantics."""
    from go_cdc_spark.operators.similarity import SEM_TAU, dedup_semdedup

    cent, _ = _numpy_lloyd(sf_dir)
    t = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
    t = t.sort_values("vec_id").reset_index(drop=True)
    vecs = np.stack([np.asarray(e, dtype=np.float64) for e in t["embedding"]])
    ids = t["vec_id"].to_numpy()
    cos = (vecs @ cent.T) / (
        np.linalg.norm(vecs, axis=1, keepdims=True) * np.linalg.norm(cent, axis=1)
    )
    assign = cos.argmax(axis=1)
    cent_cos = cos[np.arange(len(ids)), assign]
    removed = set()
    for c in set(assign):
        m = np.where(assign == c)[0]
        sub = vecs[m]
        pc = (sub @ sub.T) / (
            np.linalg.norm(sub, axis=1, keepdims=True) * np.linalg.norm(sub, axis=1)
        )
        for i_pos, i in enumerate(m):
            for j_pos, j in enumerate(m):
                if i == j or pc[i_pos, j_pos] < SEM_TAU:
                    continue
                # partner j dominates i → i removed
                if cent_cos[j] < cent_cos[i] or (
                    cent_cos[j] == cent_cos[i] and ids[j] < ids[i]
                ):
                    removed.add(int(ids[i]))
    got = {r["vec_id"]: r["keep"] for r in dedup_semdedup(spark, sf_dir).collect()}
    assert len(got) == len(ids)
    want = {int(v): (int(v) not in removed) for v in ids}
    # float tolerance: cosine expressions differ between numpy (BLAS
    # reductions) and the engines' left-fold — compare the DECISION,
    # allowing disagreement only for pairs within 1e-9 of the τ or
    # domination boundary (none exist in the fixture; assert exact)
    assert got == want


def test_corpus_version_per_file_granularity(tmp_path):
    """The trained-codebook memo key must see a rewrite that preserves
    TOTAL size (bytes moving between part files) and must never treat
    an unreadable corpus as a stable version."""
    import os

    from go_cdc_spark.operators.similarity import _corpus_version

    d = tmp_path / "sf"
    p = d / "embeddings.parquet"
    p.mkdir(parents=True)
    (p / "part-0").write_bytes(b"aaaa")
    (p / "part-1").write_bytes(b"bb")
    for f, t in (("part-0", 111), ("part-1", 222)):
        os.utime(p / f, (t, t))
    v1 = _corpus_version(str(d))
    # shuffle bytes between files, total size unchanged, same mtimes:
    # the old aggregate (max mtime, total size) key was blind to this
    (p / "part-0").write_bytes(b"aa")
    (p / "part-1").write_bytes(b"bbbb")
    for f, t in (("part-0", 111), ("part-1", 222)):
        os.utime(p / f, (t, t))
    v2 = _corpus_version(str(d))
    assert v1 != v2
    # a stat failure yields a sentinel that matches nothing — not a
    # shared "empty" version colliding across broken corpora
    missing = _corpus_version(str(tmp_path / "nope"))
    assert missing != _corpus_version(str(tmp_path / "nope"))


def test_trained_memo_evicts_superseded_corpus_versions(spark, tmp_path):
    """One live memo entry per corpus path: regenerating the corpus in
    a long-lived driver must replace, not accumulate."""
    import os

    from pyspark.sql import Row

    from go_cdc_spark.operators import similarity as S

    d = tmp_path / "sf"
    p = d / "embeddings.parquet"
    p.mkdir(parents=True)
    (p / "part-0").write_bytes(b"v1")
    os.utime(p / "part-0", (111, 111))
    emb = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(i), 1.0]) for i in range(12)]
    )
    before = {k for k in S._TRAINED_MEMO if k[0] == str(d)}
    assert not before
    S._trained_updates(spark, emb, str(d))
    assert len([k for k in S._TRAINED_MEMO if k[0] == str(d)]) == 1
    # corpus regenerated in place → retrain AND evict the old version
    (p / "part-0").write_bytes(b"v2x")
    os.utime(p / "part-0", (222, 222))
    S._trained_updates(spark, emb, str(d))
    assert len([k for k in S._TRAINED_MEMO if k[0] == str(d)]) == 1
