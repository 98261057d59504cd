"""dedup_substring_rewrite: the cross-document span-excision semantics
proven on a constructed corpus (independent of the DuckDB oracle, which
checks engine-equivalence — this checks the SPEC)."""

from __future__ import annotations

from pyspark.sql import Row

from go_cdc_spark.operators.dedup import dedup_substring_rewrite


def _corpus(spark, tmp_path, texts):
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t, lang="en", source="src1")
         for i, t in texts.items()]
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_noncanonical_span_excised_canonical_kept(spark, tmp_path):
    sf = _corpus(spark, tmp_path, {
        1: "a b c d e f",        # canonical holder of both shared spans
        2: "x a b c d e y",      # shares "a b c d e" at offset 1
        3: "a b c d e f",        # exact copy: rewrites to empty
        4: "p q r s t u v",      # no shared span: untouched, not output
    })
    out = {r.doc_id: (r.n_words, r.n_removed, r.clean_text)
           for r in dedup_substring_rewrite(spark, sf).collect()}
    # doc 1 is every span's canonical occurrence: unchanged, absent
    assert 1 not in out and 4 not in out
    # doc 2 loses exactly the 5-word shared span, order preserved
    assert out[2] == (7, 5, "x y")
    # doc 3 is one big duplicated span of doc 1: the exact-dup limit
    assert out[3] == (6, 6, "")


def test_overlapping_spans_union(spark, tmp_path):
    """Two duplicated grams overlapping in one doc drop the UNION of
    their positions — no double-count, no interval-merge bookkeeping."""
    sf = _corpus(spark, tmp_path, {
        1: "a b c d e f g",      # canonical: grams abcde, bcdefg's pieces
        2: "z a b c d e f w",    # shares "a b c d e" AND "b c d e f"
    })
    out = {r.doc_id: (r.n_words, r.n_removed, r.clean_text)
           for r in dedup_substring_rewrite(spark, sf).collect()}
    # positions 1..6 covered by the two overlapping spans → 6 words out
    assert out[2] == (8, 6, "z w")
    assert 1 not in out


def test_short_documents_never_generate_spans(spark, tmp_path):
    sf = _corpus(spark, tmp_path, {
        1: "a b c",              # < K words: no grams even if repeated
        2: "a b c",
    })
    assert dedup_substring_rewrite(spark, sf).count() == 0
