"""Full-pipeline integration: snapshot capture → checkpointed position
→ streaming changelog replay → handoff rule (`pos > tableGTID`) →
foreachBatch MERGE — the end-to-end story of the reference
(`docs/全量抓取逻辑.md:44-52`: gap-free, overlap-free, no downstream
idempotency needed), across every layer of this engine at once.

The overlap case is explicit: the changelog replays events at and below
the snapshot position (already reflected in the snapshot) alongside
genuinely-new ones; only the latter may apply.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from go_cdc_spark.operators.cdc import materialize_changelog
from go_cdc_spark.sources.changelog import changelog_df
from go_cdc_spark.sources.meta import CheckpointStore
from go_cdc_spark.sources.snapshot import ParquetSnapshotSource, snapshot_table
from go_cdc_spark.streaming.pipeline import StreamingMaterializer, read_changelog_stream

SF = "/root/testdata/sf0.001"


def _event(pos, op, data, before=None):
    return {
        "data_source": "ds1",
        "schema": "main",
        "table": "region",
        "op": op,
        "data": data,
        "before": before,
        "ts": None,
        "pos": str(pos).zfill(12),
        "txn_id": None,
    }


def test_snapshot_then_batch_handoff(spark, tmp_path):
    """Snapshot region at pos=1; replay a changelog straddling the
    snapshot position; final state must equal snapshot ⊕ only-newer."""
    src = ParquetSnapshotSource(spark, SF, primary_keys={"region": ["r_regionkey"]})
    store = CheckpointStore(spark, str(tmp_path / "meta"))
    snap = snapshot_table(src, "ds1", "main", "region", checkpoint=store)
    table_pos = store.get_pos("ds1", sc="main", tb="region")
    assert table_pos == snap.pos

    base = spark.read.parquet(f"{SF}/region.parquet")
    events = [
        # at/below snapshot pos → already in snapshot, MUST be discarded
        _event(0, "insert", {"r_regionkey": "0", "r_name": "STALE-A"}),
        _event(int(table_pos), "update", {"r_regionkey": "1", "r_name": "STALE-B"}),
        # above snapshot pos → must apply, latest-wins per key
        _event(int(table_pos) + 1, "update", {"r_regionkey": "2", "r_name": "ASIA-v2"}),
        _event(int(table_pos) + 2, "update", {"r_regionkey": "2", "r_name": "ASIA-v3"}),
        _event(int(table_pos) + 3, "insert", {"r_regionkey": "99", "r_name": "ATLANTIS"}),
        _event(int(table_pos) + 4, "delete", None, {"r_regionkey": "0", "r_name": "AFRICA"}),
    ]
    changes = changelog_df(spark, events)
    final = materialize_changelog(changes, base, keys=["r_regionkey"], pos_threshold=table_pos)
    state = {r.r_regionkey: r.r_name for r in final.collect()}

    expect = {r.r_regionkey: r.r_name for r in base.collect()}
    expect[2] = "ASIA-v3"  # latest of the two updates
    expect[99] = "ATLANTIS"  # new insert
    del expect[0]  # deleted; and the stale pre-snapshot events left no trace
    assert state == expect


def test_snapshot_then_stream_handoff(spark, tmp_path):
    """Same semantics through the streaming path: changelog segments →
    readStream → handoff filter → foreachBatch MERGE materializer."""
    src = ParquetSnapshotSource(spark, SF, primary_keys={"region": ["r_regionkey"]})
    store = CheckpointStore(spark, str(tmp_path / "meta"))
    snap = snapshot_table(src, "ds1", "main", "region", checkpoint=store)
    assert snap.count_rows() == spark.read.parquet(f"{SF}/region.parquet").count()
    table_pos = store.get_pos("ds1", sc="main", tb="region")

    base = spark.read.parquet(f"{SF}/region.parquet")
    seg_dir = tmp_path / "changelog"
    seg_dir.mkdir()
    p = int(table_pos)
    segments = [
        [_event(0, "insert", {"r_regionkey": "0", "r_name": "STALE-A"}),
         _event(p + 1, "update", {"r_regionkey": "2", "r_name": "ASIA-v2"})],
        [_event(p + 2, "insert", {"r_regionkey": "99", "r_name": "ATLANTIS"}),
         _event(p + 3, "delete", None, {"r_regionkey": "0", "r_name": "AFRICA"})],
    ]
    for i, seg in enumerate(segments):
        with open(seg_dir / f"seg{i}.json", "w") as f:
            for e in seg:
                f.write(json.dumps(e) + "\n")

    mat = StreamingMaterializer(
        spark,
        snapshot=base,
        keys=["r_regionkey"],
        state_path=str(tmp_path / "state"),
        pos_threshold=table_pos,
    )
    stream = read_changelog_stream(spark, str(seg_dir), max_files_per_trigger=1)
    q = mat.start(stream, str(tmp_path / "ckpt"))
    q.processAllAvailable()
    q.stop()

    state = {r.r_regionkey: r.r_name for r in mat.read_table().collect()}
    expect = {r.r_regionkey: r.r_name for r in base.collect()}
    expect[2] = "ASIA-v2"
    expect[99] = "ATLANTIS"
    del expect[0]
    assert state == expect


def test_torn_parallel_snapshot_reconciled_by_replay(spark, tmp_path):
    """A7's parallel mode, reconciled: chunked JDBC reads each open
    their own connection, so two chunks can observe DIFFERENT
    transaction states — a "torn" snapshot. The DBLog-style repair this
    engine relies on: record the low-watermark position BEFORE the read,
    then replay the changelog from it with latest-wins MERGE. Any row a
    chunk observed post-event is simply overwritten with the same value
    (idempotent); any row observed pre-event is corrected; events below
    the watermark never regress anything.

    This pins the semantics that make `JdbcSnapshotSource(num_partitions
    > 1)` safe to run against a live table.
    """
    base = spark.read.parquet(f"{SF}/region.parquet")  # state at lo=100

    lo = 100
    events = [
        # below the low watermark: already in every chunk, must not apply
        _event(90, "update", {"r_regionkey": "1", "r_name": "PRE-SNAPSHOT"}),
        # concurrent with the chunked read (lo < pos <= hi)
        _event(110, "update", {"r_regionkey": "2", "r_name": "ASIA-v2"}),
        _event(120, "insert", {"r_regionkey": "77", "r_name": "LEMURIA"}),
        _event(130, "delete", None, {"r_regionkey": "0", "r_name": "AFRICA"}),
    ]

    # torn snapshot: chunk A (keys 0-2) read at pos=100 (saw none of the
    # events); chunk B (keys 3+) read at pos=130 (saw all of them — but
    # its key range only contains untouched rows 3,4 plus... nothing:
    # the concurrent writes hit chunk A's range and a new key). To make
    # the tear REAL, chunk B also observed the new row 77 and chunk A
    # still holds the deleted row 0 and stale rows 1,2.
    chunk_a = base.filter(F.col("r_regionkey") <= 2)  # as of pos 100
    chunk_b = base.filter(F.col("r_regionkey") > 2).unionByName(
        spark.createDataFrame(
            [(77, "LEMURIA")],
            schema=base.schema,
        )
    )  # as of pos 130
    torn = chunk_a.unionByName(chunk_b)

    changes = changelog_df(spark, events)
    final = materialize_changelog(
        changes, torn, keys=["r_regionkey"], pos_threshold=str(lo).zfill(12)
    )
    state = {r.r_regionkey: r.r_name for r in final.collect()}

    # ground truth: state at hi=130 with all events applied
    expect = {r.r_regionkey: r.r_name for r in base.collect()}
    expect[2] = "ASIA-v2"
    expect[77] = "LEMURIA"
    del expect[0]
    assert state == expect  # and key 1 kept its base name (pos 90 discarded)
