"""Random-projection sketch: spec tests beyond the oracle hash-check."""

from __future__ import annotations

from go_cdc_spark.operators.similarity import (
    _RP_MAX_DIMS,
    _RP_REDUCE_DIMS,
    _RP_SIGNS,
    DIM,
    embed_rp_reduce,
)


def test_sign_matrix_shape_and_values():
    assert len(_RP_SIGNS) == _RP_MAX_DIMS
    assert all(len(row) == DIM for row in _RP_SIGNS)
    assert all(v in (1.0, -1.0) for row in _RP_SIGNS for v in row)
    # rows must be distinct — a duplicated projection row wastes a dim
    assert len({tuple(r) for r in _RP_SIGNS}) == _RP_MAX_DIMS


def test_sketch_is_exact_linear_map(spark, tmp_path):
    """The sketch of a known vector equals the hand-computed ±1 dot
    products, and identical vectors sketch identically (RP preserves
    exact duplicates)."""
    vec = [float(i % 5 - 2) for i in range(DIM)]
    df = spark.createDataFrame(
        [(0, vec, 1), (1, vec, 2), (2, [0.0] * DIM, 3)],
        "vec_id long, embedding array<float>, label int",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    rows = embed_rp_reduce(spark, str(tmp_path)).collect()
    got = {}
    for r in rows:
        got.setdefault(r["vec_id"], {})[r["dim"]] = r["value"]
    expect = [
        sum(s * v for s, v in zip(_RP_SIGNS[j], vec))
        for j in range(_RP_REDUCE_DIMS)
    ]
    assert [got[0][j] for j in range(_RP_REDUCE_DIMS)] == expect
    assert got[0] == got[1]  # duplicate in, duplicate out
    assert all(v == 0.0 for v in got[2].values())  # zero maps to zero
