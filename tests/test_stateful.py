"""Custom stateful operators: watermark tracking accumulates across
micro-batches; transaction assembly flushes on commit markers."""

from __future__ import annotations

import json

from go_cdc_spark.sources.changelog import CHANGE_EVENT_SCHEMA
from go_cdc_spark.streaming.pipeline import read_changelog_stream
from go_cdc_spark.streaming.stateful import txn_assembler, watermark_tracker


def _event(pos: int, source="ds1", op="insert", txn=None):
    return {
        "data_source": source,
        "schema": "main",
        "table": "t",
        "op": op,
        "data": {"id": str(pos)},
        "before": None,
        "ts": None,
        "pos": str(pos).zfill(12),
        "txn_id": txn,
    }


def _write(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_watermark_tracker_accumulates_across_batches(spark, tmp_path):
    src = tmp_path / "changelog"
    src.mkdir()
    _write(src / "seg0.json", [_event(3), _event(7), _event(1, source="ds2")])
    stream = read_changelog_stream(spark, str(src))
    out = watermark_tracker(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("wm")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    # second micro-batch advances ds1, leaves ds2 untouched
    _write(src / "seg1.json", [_event(12), _event(9)])
    q.processAllAvailable()
    q.stop()
    final: dict[str, tuple[str, int]] = {}
    for r in spark.sql("SELECT * FROM wm").collect():
        if r.data_source not in final or r.n_events > final[r.data_source][1]:
            final[r.data_source] = (r.max_pos, r.n_events)
    assert final["ds1"] == ("12".zfill(12), 4)  # state carried batch→batch
    assert final["ds2"] == ("1".zfill(12), 1)


def test_txn_assembler_flushes_on_commit(spark, tmp_path):
    src = tmp_path / "changelog"
    src.mkdir()
    _write(
        src / "seg0.json",
        [
            _event(1, txn="t1"),
            _event(2, txn="t1"),
            _event(3, txn="t2"),  # t2 never commits in this run
            _event(4, op="commit", txn="t1"),
        ],
    )
    stream = read_changelog_stream(spark, str(src), max_files_per_trigger=1)
    out = txn_assembler(stream, timeout_ms=3_000)
    # ProcessingTimeTimeout keeps the query running paced no-data batches
    # to evaluate timeouts — processAllAvailable never returns and
    # availableNow never terminates. Poll the sink instead.
    q = (
        out.writeStream.format("memory")
        .queryName("txns")
        .outputMode("update")
        .trigger(processingTime="500 milliseconds")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    import time

    deadline = time.time() + 120
    rows: dict = {}
    while time.time() < deadline:
        rows = {r.txn_id: r for r in spark.sql("SELECT * FROM txns").collect()}
        if "t1" in rows and "t2" in rows:
            break
        time.sleep(1)
    q.stop()
    # commit marker flushed t1 with both its data events
    assert rows["t1"].complete and rows["t1"].n_events == 2
    assert rows["t1"].first_pos == "1".zfill(12) and rows["t1"].last_pos == "2".zfill(12)
    # t2 never committed: evicted by the processing-time timeout, incomplete
    assert not rows["t2"].complete and rows["t2"].n_events == 1


def test_near_dup_stream_drops_perturbed_doc_in_later_batch(spark, tmp_path):
    """Cross-batch near-dup via state-store band index: the same doc
    lightly perturbed arriving in a LATER micro-batch must be flagged;
    within-batch near-dups are flagged greedily (lower id wins); the
    distinct doc survives everywhere."""
    import os
    import time

    from go_cdc_spark.streaming.ingest import read_docs_stream
    from go_cdc_spark.streaming.stateful import near_dup_stream_flags

    base = " ".join(f"w{i}" for i in range(30))
    perturbed = base.replace("w15", "zz")          # 3 of 28 shingles change
    within = base.replace("w3", "qq")              # near-dup inside batch 1
    distinct = " ".join(f"d{i}" for i in range(30))

    seg = tmp_path / "docs"
    seg.mkdir()
    t0 = time.time() - 100

    def _doc(i, text):
        return {"doc_id": i, "text": text, "lang": "en", "source": "s"}

    for name, docs, mt in [
        ("b1.json", [_doc(1, base), _doc(2, distinct), _doc(4, within)], t0),
        ("b2.json", [_doc(7, perturbed)], t0 + 10),
    ]:
        p = seg / name
        with open(p, "w") as f:
            for d in docs:
                f.write(json.dumps(d) + "\n")
        os.utime(p, (mt, mt))

    stream = read_docs_stream(spark, str(seg), max_files_per_trigger=1)
    flags = near_dup_stream_flags(stream)
    q = (
        flags.writeStream.format("memory")
        .queryName("neardup_sink")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    verdict = {
        r.doc_id: r.dup
        for r in spark.sql(
            "SELECT doc_id, MAX(CAST(is_dup AS INT)) = 1 AS dup "
            "FROM neardup_sink GROUP BY doc_id"
        ).collect()
    }
    assert verdict == {1: False, 2: False, 4: True, 7: True}, verdict


def test_near_dup_state_survives_restart(spark, tmp_path):
    """The band index lives in CHECKPOINTED state: stop the query after
    batch 1, start a fresh query over the same checkpoint, deliver the
    perturbed doc — it must still be flagged (state recovered, not
    rebuilt from a side-store)."""
    import os
    import time

    from go_cdc_spark.streaming.ingest import read_docs_stream
    from go_cdc_spark.streaming.stateful import near_dup_stream_flags

    base = " ".join(f"w{i}" for i in range(30))
    perturbed = base.replace("w15", "zz")
    seg = tmp_path / "docs"
    seg.mkdir()
    t0 = time.time() - 100

    def _write(name, docs, mt):
        p = seg / name
        with open(p, "w") as f:
            for d in docs:
                f.write(json.dumps(d) + "\n")
        os.utime(p, (mt, mt))

    _write("b1.json", [{"doc_id": 1, "text": base, "lang": "en", "source": "s"}], t0)

    out_dir = str(tmp_path / "flags")

    def _run():
        # memory sink can't recover from a checkpoint; foreachBatch can
        stream = read_docs_stream(spark, str(seg), max_files_per_trigger=1)
        q = (
            near_dup_stream_flags(stream)
            .writeStream.option("checkpointLocation", str(tmp_path / "ckpt"))
            .foreachBatch(
                lambda df, bid: df.write.mode("append").parquet(out_dir)
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    _run()  # batch 1 accepted into state; query terminates
    _write("b2.json", [{"doc_id": 9, "text": perturbed, "lang": "en", "source": "s"}], t0 + 10)
    _run()  # FRESH query, same checkpoint: state recovered

    flags = spark.read.parquet(out_dir)
    flagged = {r.doc_id for r in flags.filter("is_dup").select("doc_id").distinct().collect()}
    assert flagged == {9}, flagged
