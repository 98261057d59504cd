"""Zipf/Heaps corpus-statistics spec tests on a constructed corpus
with hand-computable frequencies and vocabulary growth."""

from __future__ import annotations

from go_cdc_spark.operators.text import corpus_heaps, corpus_zipf


def _write_docs(spark, tmp_path, texts: list[str]) -> str:
    rows = [
        (i, t, "en", "spec", len(t)) for i, t in enumerate(texts)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_zipf_ranks_products_and_cumshare(spark, tmp_path):
    # token counts: a=4, b=2, c=1 -> total 7
    sf = _write_docs(spark, tmp_path, ["a a b", "a b c", "a"])
    rows = corpus_zipf(spark, sf).collect()
    got = [(r["rank"], r["token"], r["freq"], r["freq_x_rank"]) for r in rows]
    assert got == [(1, "a", 4, 4), (2, "b", 2, 4), (3, "c", 1, 3)]
    shares = [r["cum_share"] for r in rows]
    assert shares == [4 / 7, 6 / 7, 1.0]


def test_zipf_tie_break_is_alphabetical(spark, tmp_path):
    sf = _write_docs(spark, tmp_path, ["z q z q"])
    rows = corpus_zipf(spark, sf).collect()
    assert [(r["rank"], r["token"]) for r in rows] == [(1, "q"), (2, "z")]


def test_heaps_prefix_counts(spark, tmp_path):
    # doc 0..16: doc i introduces token t{i} and repeats 'x'
    texts = [f"x t{i}" for i in range(20)]
    sf = _write_docs(spark, tmp_path, texts)
    rows = {r["n_cap"]: r for r in corpus_heaps(spark, sf).collect()}
    # first checkpoint: 16 docs, 32 tokens, vocab = x + t0..t15 = 17
    r16 = rows[16]
    assert (r16["n_docs"], r16["tokens_total"], r16["vocab"]) == (16, 32, 17)
    assert r16["ttr"] == 17 / 32
    # checkpoints beyond the corpus all measure the full 20 docs
    for cap in (64, 256, 1024, 4096):
        r = rows[cap]
        assert (r["n_docs"], r["tokens_total"], r["vocab"]) == (20, 40, 21)


def test_heaps_growth_is_monotone_on_fixture(spark, sf_dir):
    rows = corpus_heaps(spark, sf_dir).orderBy("n_cap").collect()
    vocabs = [r["vocab"] for r in rows]
    assert vocabs == sorted(vocabs)
    assert all(r["vocab"] <= r["tokens_total"] for r in rows)
