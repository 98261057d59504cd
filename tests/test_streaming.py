"""Streaming tests (SURVEY.md §5.4): changelog replay → foreachBatch
MERGE, restart-from-checkpoint without double-apply (A18 recovery),
stateful dedup, watermark late-data behavior, session windows."""

from __future__ import annotations

import json
import time

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from go_cdc_spark.sources.changelog import format_pos
from go_cdc_spark.sources.meta import CheckpointStore
from go_cdc_spark.streaming.pipeline import (
    StreamingMaterializer,
    read_changelog_stream,
    stream_dedup,
    stream_session_counts,
    stream_tumbling_counts,
)

ACCOUNTS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("balance", T.DoubleType()),
    ]
)


def _ev(op, id_, pos, name=None, balance=None, minute=0):
    e = {
        "data_source": "ds1",
        "schema": "bank",
        "table": "accounts",
        "op": op,
        "ts": f"2024-01-01T00:{minute:02d}:00.000000",
        "pos": format_pos(pos),
        "txn_id": f"uuid1:{pos}",
    }
    if op in ("insert", "update"):
        e["data"] = {"id": str(id_), "name": name, "balance": str(balance)}
    else:
        e["before"] = {"id": str(id_)}
    return e


def _write_segment(dirpath, name, events):
    dirpath.mkdir(parents=True, exist_ok=True)
    p = dirpath / name
    with open(p, "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")


def _snapshot(spark, rows):
    return spark.createDataFrame(
        [Row(id=i, name=n, balance=b) for i, n, b in rows], ACCOUNTS_SCHEMA
    )


def _run_available(mat, spark, seg_dir, ckpt):
    stream = read_changelog_stream(spark, str(seg_dir), max_files_per_trigger=1)
    q = mat.start(stream, str(ckpt))
    q.awaitTermination(120)
    return q


def test_materialize_stream_end_to_end(spark, tmp_path):
    seg = tmp_path / "segments"
    _write_segment(seg, "seg1.json", [
        _ev("update", 1, 110, name="alice2", balance="11.0", minute=1),
        _ev("insert", 4, 120, name="dave", balance="40.0", minute=2),
    ])
    _write_segment(seg, "seg2.json", [
        _ev("update", 1, 90, name="stale", balance="9.0", minute=3),   # ≤ threshold
        _ev("delete", 2, 130, minute=4),
        _ev("update", 4, 125, name="dave1", balance="40.5", minute=5),
    ])
    snap = _snapshot(spark, [(1, "alice", 10.0), (2, "bob", 20.0)])
    meta = CheckpointStore(spark, str(tmp_path / "meta"))
    mat = StreamingMaterializer(
        spark, snap, keys=["id"], state_path=str(tmp_path / "state"),
        pos_threshold=format_pos(100), meta=meta, table="accounts",
    )
    _run_available(mat, spark, seg, tmp_path / "ckpt")
    state = {r.id: (r.name, r.balance) for r in mat.read_table().collect()}
    assert state == {1: ("alice2", 11.0), 4: ("dave1", 40.5)}
    # A21: watermark advanced to max applied pos
    assert meta.get_pos("ds1", None, "accounts") == format_pos(130)


def test_restart_from_checkpoint_no_double_apply(spark, tmp_path):
    """A18 recovery: stop, add segments, restart with the same checkpoint
    — earlier segments must not re-apply (state already contains them)."""
    seg = tmp_path / "segments"
    _write_segment(seg, "seg1.json", [
        _ev("insert", 10, 110, name="x", balance="1.0", minute=1),
    ])
    snap = _snapshot(spark, [])
    mat = StreamingMaterializer(
        spark, snap, keys=["id"], state_path=str(tmp_path / "state"),
        pos_threshold=format_pos(100),
    )
    _run_available(mat, spark, seg, tmp_path / "ckpt")
    assert {r.id for r in mat.read_table().collect()} == {10}

    # late pre-delete image must NOT resurrect a deleted row
    _write_segment(seg, "seg2.json", [
        _ev("delete", 10, 140, minute=2),
        _ev("update", 10, 120, name="late", balance="2.0", minute=3),
    ])
    _run_available(mat, spark, seg, tmp_path / "ckpt")
    assert mat.read_table().count() == 0

    # restart again with nothing new: still empty, no errors
    _run_available(mat, spark, seg, tmp_path / "ckpt")
    assert mat.read_table().count() == 0


def test_stream_dedup_drops_redelivery(spark, tmp_path):
    seg = tmp_path / "segments"
    dup = _ev("insert", 1, 200, name="a", balance="1.0", minute=1)
    _write_segment(seg, "seg1.json", [dup, dup, _ev("update", 1, 201, name="b", balance="2.0", minute=2)])
    stream = read_changelog_stream(spark, str(seg), max_files_per_trigger=1)
    deduped = stream_dedup(stream, watermark_delay="10 minutes")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_sink")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT pos, COUNT(*) AS n FROM dedup_sink GROUP BY pos").collect()
    assert {r.pos: r.n for r in got} == {format_pos(200): 1, format_pos(201): 1}


def test_stream_tumbling_window_counts(spark, tmp_path):
    seg = tmp_path / "segments"
    _write_segment(seg, "seg1.json", [
        _ev("insert", i, 300 + i, name="x", balance="1.0", minute=m)
        for i, m in enumerate([1, 2, 3, 59])
    ])
    stream = read_changelog_stream(spark, str(seg))
    agg = stream_tumbling_counts(stream, window_size="30 minutes", watermark_delay="5 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("tumbling_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # availableNow + watermark: the final window may be withheld until a
    # later trigger advances the watermark; assert on the closed window.
    rows = spark.sql("SELECT * FROM tumbling_sink").collect()
    closed = {(str(r.wstart), r.n_events) for r in rows}
    assert ("2024-01-01 00:00:00", 3) in closed


def test_stream_session_window(spark, tmp_path):
    seg = tmp_path / "segments"
    events = [
        _ev("insert", 1, 400, name="x", balance="1.0", minute=1),
        _ev("insert", 2, 401, name="x", balance="1.0", minute=5),
        _ev("insert", 3, 402, name="x", balance="1.0", minute=50),  # new session (>30m gap)
    ]
    for e in events:
        e["data"]["user"] = "7"
    _write_segment(seg, "seg1.json", events)
    stream = read_changelog_stream(spark, str(seg)).select(
        F.col("data").getItem("user").cast("long").alias("user_id"), F.col("ts")
    )
    agg = stream_session_counts(stream, gap="30 minutes", watermark_delay="0 seconds")
    q = (
        agg.writeStream.format("memory")
        .queryName("session_sink")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM session_sink ORDER BY session_start").collect()
    assert [(r.user_id, r.n_events) for r in rows] == [(7, 2), (7, 1)]


def test_stream_stream_commit_join(spark, tmp_path):
    """Row events join their txn's commit event within the interval
    bound (stream-stream inner join with watermarks on both sides):
    committed txn rows emit enriched, uncommitted ones never do."""
    from go_cdc_spark.streaming.pipeline import stream_commit_join

    rows_dir = tmp_path / "rows"
    commits_dir = tmp_path / "commits"

    def ev(op, pos, txn, minute):
        return {
            "data_source": "ds1",
            "schema": "bank",
            "table": "accounts",
            "op": op,
            "data": {"id": str(pos)} if op != "commit" else None,
            "before": None,
            "ts": f"2024-01-01T00:{minute:02d}:00.000000",
            "pos": format_pos(pos),
            "txn_id": txn,
        }

    _write_segment(rows_dir, "seg0.json", [
        ev("insert", 1, "t1", 0),
        ev("insert", 2, "t1", 1),
        ev("insert", 3, "t2", 1),   # t2 never commits
        ev("insert", 4, "t3", 0),   # t3 commits OUTSIDE the interval
    ])
    _write_segment(commits_dir, "seg0.json", [
        ev("commit", 10, "t1", 5),
        ev("commit", 11, "t3", 59),  # 59 min later > 10-minute bound
    ])

    rows = read_changelog_stream(spark, str(rows_dir))
    commits = read_changelog_stream(spark, str(commits_dir))
    joined = stream_commit_join(rows, commits, interval="10 minutes")
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r.txn_id, r.row_pos) for r in spark.sql("SELECT * FROM ssj").collect()}
    assert got == {("t1", format_pos(1)), ("t1", format_pos(2))}


def test_stream_stream_commit_join_left_outer_emits_uncommitted(spark, tmp_path):
    """left_outer mode: rows whose commit never arrives are EMITTED with
    NULL commit columns once the watermark passes their join window —
    the uncommitted-transaction detector. Watermark is advanced by a
    second batch (restart against the same checkpoint, the established
    file-replay pattern)."""
    from go_cdc_spark.streaming.pipeline import stream_commit_join

    rows_dir = tmp_path / "rows"
    commits_dir = tmp_path / "commits"

    def ev(op, pos, txn, minute, hour=0):
        return {
            "data_source": "ds1",
            "schema": "bank",
            "table": "accounts",
            "op": op,
            "data": {"id": str(pos)} if op != "commit" else None,
            "before": None,
            "ts": f"2024-01-01T{hour:02d}:{minute:02d}:00.000000",
            "pos": format_pos(pos),
            "txn_id": txn,
        }

    _write_segment(rows_dir, "seg0.json", [
        ev("insert", 1, "t1", 0),
        ev("insert", 3, "t2", 1),   # t2 never commits
    ])
    _write_segment(commits_dir, "seg0.json", [
        ev("commit", 10, "t1", 5),
    ])

    out_dir = tmp_path / "out"

    def drain():
        rows = read_changelog_stream(spark, str(rows_dir))
        commits = read_changelog_stream(spark, str(commits_dir))
        joined = stream_commit_join(
            rows, commits, interval="10 minutes", how="left_outer"
        )
        q = (
            joined.writeStream.format("parquet")
            .option("path", str(out_dir))
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    # watermark-advancing heartbeats in BOTH inputs (global watermark is
    # the MIN across sources): 2h ahead >> 30m delay + 10m interval
    _write_segment(rows_dir, "seg1.json", [ev("insert", 90, "t9", 0, hour=2)])
    _write_segment(commits_dir, "seg1.json", [ev("commit", 91, "t9", 1, hour=2)])
    drain()

    got = {
        (r.txn_id, r.row_pos, r.commit_pos)
        for r in spark.read.parquet(str(out_dir)).collect()
    }
    assert ("t1", format_pos(1), format_pos(10)) in got  # committed: enriched
    assert ("t2", format_pos(3), None) in got  # uncommitted: surfaced w/ NULLs
