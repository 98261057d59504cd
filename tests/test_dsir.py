"""Semantic unit tests for DSIR-style importance resampling on a
crafted corpus (the synthetic fixture's vocabulary is near-uniform, so
the oracle check alone cannot show the classifier actually separates
target-like from junk documents)."""

from __future__ import annotations

import hashlib

from go_cdc_spark.operators.sampling import (
    _DSIR_BUCKETS,
    _DSIR_REF_MOD,
    sample_importance_dsir,
)

TARGET_VOCAB = "alpha beta gamma delta"
JUNK_VOCAB = "zork quux blorb flurp"


def _bucket(tok: str) -> int:
    return int(hashlib.md5(f"dsir{tok}".encode()).hexdigest()[:4], 16) % _DSIR_BUCKETS


def test_vocab_buckets_disjoint():
    """Precondition for the ordering assertions below: the two test
    vocabularies must not collide in the hashed feature space."""
    a = {_bucket(t) for t in TARGET_VOCAB.split()}
    b = {_bucket(t) for t in JUNK_VOCAB.split()}
    assert not (a & b), "pick different test words (hash collision)"


def _write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(
        [(i, t, "en", "src1", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_dsir_ranks_target_like_above_junk(spark, tmp_path):
    assert _DSIR_REF_MOD == 7
    d = _write_docs(
        spark,
        tmp_path,
        [
            (0, TARGET_VOCAB),  # target slice (doc_id % 7 == 0)
            (7, TARGET_VOCAB),  # target slice
            (1, TARGET_VOCAB),  # raw, target-like
            (2, TARGET_VOCAB),  # raw, target-like
            (3, "alpha beta zork quux"),  # raw, mixed
            (4, JUNK_VOCAB),  # raw, junk
            (5, JUNK_VOCAB),  # raw, junk
        ],
    )
    rows = sample_importance_dsir(spark, d).collect()
    by_id = {r["doc_id"]: r for r in rows}

    # the target slice itself is never in the resampled output
    assert set(by_id) == {1, 2, 3, 4, 5}

    # classifier separation: pure target-vocab docs score above the
    # mixed doc, which scores above pure junk docs
    assert by_id[1]["score"] == by_id[2]["score"] > by_id[3]["score"]
    assert by_id[3]["score"] > by_id[4]["score"] == by_id[5]["score"]

    # sign semantics: target-vocab tokens never appear in the raw-only
    # junk docs, so their delta is strictly positive (t_b>0, r_b only
    # from target-like raw docs) while junk tokens (t_b=0) are strictly
    # negative
    assert by_id[1]["score"] > 0
    assert by_id[4]["score"] < 0

    # output ordering is (score desc, doc_id): target-like docs first
    assert [r["doc_id"] for r in rows] == [1, 2, 3, 4, 5]

    # per-token normalization: equal-composition docs of different
    # lengths agree on score_per_token
    assert by_id[1]["score_per_token"] == by_id[1]["score"] / by_id[1]["n_tokens"]
