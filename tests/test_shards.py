"""Shard writer: deterministic assignment, bounded file sizes, lossless
round-trip, and a usable manifest."""

from __future__ import annotations

from pyspark.sql import functions as F

from go_cdc_spark.operators.shards import shard_manifest, write_training_shards

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_roundtrip_and_file_cap(spark, tmp_path):
    docs = _docs(spark)
    out = str(tmp_path / "shards")
    write_training_shards(
        docs, out, shard_key="doc_id", n_shards=4, max_records_per_file=50
    )
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    assert sorted(back.columns) == sorted(docs.columns)
    per_file = (
        back.select(F.input_file_name().alias("f"))
        .groupBy("f")
        .count()
        .collect()
    )
    assert len(per_file) >= 4
    assert all(r["count"] <= 50 for r in per_file)


def test_assignment_is_deterministic_across_runs(spark, tmp_path):
    """Hash sharding on the key must map every row to the same shard in
    two independent writes — round-robin repartition would not."""
    docs = _docs(spark)

    def groups(path):
        back = spark.read.parquet(path).select(
            "doc_id", F.regexp_extract(F.input_file_name(), r"(part-\d+)", 1).alias("p")
        )
        rows = back.collect()
        out = {}
        for r in rows:
            out.setdefault(r.p, set()).add(r.doc_id)
        return {frozenset(v) for v in out.values()}

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_training_shards(docs, a, shard_key="doc_id", n_shards=4)
    write_training_shards(docs, b, shard_key="doc_id", n_shards=4)
    assert groups(a) == groups(b)


def test_manifest_covers_all_files(spark, tmp_path):
    docs = _docs(spark)
    out = str(tmp_path / "shards")
    write_training_shards(
        docs, out, shard_key="doc_id", n_shards=2, max_records_per_file=100
    )
    man = shard_manifest(spark, out, "doc_id").collect()
    assert sum(r.n_rows for r in man) == docs.count()
    assert all(r.key_min <= r.key_max for r in man)
