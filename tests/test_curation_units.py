"""Semantic unit tests for the chunk-dedup / PII / C4-filter operators
on crafted fixtures (the synthetic corpus contains no PII and few exact
chunk repeats, so the oracle check alone under-exercises these)."""

from __future__ import annotations

import pytest

from go_cdc_spark.operators.curation import (
    CHUNK_WORDS,
    c4_quality_filter,
    dedup_paragraphs,
    pii_redact,
)


def _write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(
        [(i, t, "en", "src1", len(t)) for i, t in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_chunk_dedup_drops_cross_doc_repeats(spark, tmp_path):
    chunk = " ".join(f"w{i}" for i in range(CHUNK_WORDS))
    unique = " ".join(f"u{i}" for i in range(CHUNK_WORDS))
    d = _write_docs(
        spark,
        tmp_path,
        [
            chunk + " " + unique,  # doc 0: owns first occurrence of `chunk`
            chunk + " " + chunk,  # doc 1: both chunks are repeats of doc 0's
        ],
    )
    out = {r["doc_id"]: r for r in dedup_paragraphs(spark, d).collect()}
    assert out[0]["text_deduped"] == chunk + " " + unique
    assert out[0]["n_kept"] == 2 and out[0]["n_total"] == 2
    # doc 1 loses everything: both its chunks first occurred in doc 0
    assert out[1]["text_deduped"] == ""
    assert out[1]["n_kept"] == 0 and out[1]["n_total"] == 2


def test_chunk_dedup_keeps_first_occurrence_within_doc(spark, tmp_path):
    chunk = " ".join(f"x{i}" for i in range(CHUNK_WORDS))
    d = _write_docs(spark, tmp_path, [chunk + " " + chunk])
    row = dedup_paragraphs(spark, d).collect()[0]
    assert row["text_deduped"] == chunk
    assert row["n_kept"] == 1 and row["n_total"] == 2


def test_pii_redact_patterns(spark, tmp_path):
    d = _write_docs(
        spark,
        tmp_path,
        [
            "contact bob.smith+x@mail.example.com or 10.0.255.1 ref 1234567890",
            "clean text with no identifiers at all",
            "short digits 12345 stay but 123456 goes",
        ],
    )
    out = {r["doc_id"]: r for r in pii_redact(spark, d).collect()}
    assert out[0]["text_redacted"] == "contact <EMAIL> or <IP> ref <NUM>"
    assert out[0]["n_redactions"] == 3
    assert out[1]["text_redacted"].startswith("clean text")
    assert out[1]["n_redactions"] == 0
    assert out[2]["text_redacted"] == "short digits 12345 stay but <NUM> goes"
    assert out[2]["n_redactions"] == 1


@pytest.mark.parametrize(
    "text, keep, why",
    [
        (" ".join(["the", "a", "of", "the"] + ["word"] * 56), 1, "long enough, has stopwords"),
        ("the a of tiny", 0, "too short"),
        (" ".join(["the"] + ["word"] * 50 + ["x" * 25]), 0, "over-long token"),
        (" ".join(["word"] * 60), 0, "no stopwords"),
    ],
)
def test_c4_filter_rules(spark, tmp_path, text, keep, why):
    d = _write_docs(spark, tmp_path, [text])
    row = c4_quality_filter(spark, d).collect()[0]
    assert row["keep"] == keep, why


def test_chunk_documents_empty_doc_yields_no_chunks(spark, tmp_path):
    """An empty document must produce ZERO chunks: Spark's
    sequence(0, -1) would otherwise descend ([0, -1]) and emit two
    nonsense chunks (chunk_no -1, chunk_start -400) that the DuckDB
    oracle (generate_series → empty) never produces."""
    from go_cdc_spark.operators.curation import chunk_documents

    d = _write_docs(spark, tmp_path, ["", "abc"])
    rows = chunk_documents(spark, d).collect()
    assert [(r.doc_id, r.chunk_no, r.chunk_text) for r in rows] == [(1, 0, "abc")]


def test_lang_id_trigram_on_real_sentences(spark, tmp_path):
    """Discrimination check on genuine multilingual sentences: the
    trigram model must label each correctly — including French, which
    the retired marker-word heuristic could not represent at all (it
    had no fr marker list). The fixture corpus can't test this: its
    `lang` labels are uncorrelated with the synthetic text."""
    from go_cdc_spark.operators.text import lang_id

    sentences = [
        ("the children were reading the interesting story together", "en"),
        ("der schnelle braune fuchs springt über den faulen hund und die kinder lachen", "de"),
        ("la organización de los pueblos que hablan una lengua común es una cuestión importante", "es"),
        ("les chanteurs étaient heureux de la chanson et des couleurs du printemps", "fr"),
    ]
    df = spark.createDataFrame(
        [(i, t, truth, "src1", len(t)) for i, (t, truth) in enumerate(sentences)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {r.lang: r.pred_lang for r in lang_id(spark, str(tmp_path)).collect()}
    assert got == {"en": "en", "de": "de", "es": "es", "fr": "fr"}
