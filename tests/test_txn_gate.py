"""Read-committed gate: row events apply only once their transaction
commits; rollbacks discard; autocommit passes through (the reference's
OnRow/OnXID buffering semantics in micro-batch form)."""

from __future__ import annotations

import datetime

from go_cdc_spark.sources.changelog import changelog_df, format_pos
from go_cdc_spark.streaming.pipeline import StreamingMaterializer
from go_cdc_spark.streaming.txn_gate import ReadCommittedGate


def _ev(op, pos, txn=None, key=None, val=None):
    return {
        "data_source": "ds1",
        "schema": "bank",
        "table": "accounts",
        "op": op,
        "data": {"id": str(key), "v": str(val)} if key is not None else None,
        "before": None,
        "ts": datetime.datetime(2024, 1, 1),
        "pos": format_pos(pos),
        "txn_id": txn,
    }


def _setup(spark, tmp_path):
    snapshot = spark.createDataFrame([], "id long, v string")
    mat = StreamingMaterializer(
        spark, snapshot, keys=["id"], state_path=str(tmp_path / "state")
    )
    gate = ReadCommittedGate(
        spark, str(tmp_path / "pending"), downstream=mat.process_batch
    )
    return mat, gate


def _table(mat):
    return {(r.id, r.v) for r in mat.read_table().collect()}


def test_uncommitted_rows_withheld_until_commit(spark, tmp_path):
    mat, gate = _setup(spark, tmp_path)
    # batch 1: t1 commits in-batch, t2 stays open, one autocommit row
    gate.process_batch(
        changelog_df(
            spark,
            [
                _ev("insert", 1, txn="t1", key=1, val="a"),
                _ev("insert", 2, txn="t1", key=2, val="b"),
                _ev("commit", 3, txn="t1"),
                _ev("insert", 4, txn="t2", key=3, val="c"),
                _ev("insert", 5, txn=None, key=4, val="d"),
            ],
        ),
        0,
    )
    assert _table(mat) == {(1, "a"), (2, "b"), (4, "d")}
    assert {r.txn_id for r in gate.pending().collect()} == {"t2"}

    # batch 2: t2's commit arrives alone → its buffered rows apply
    gate.process_batch(changelog_df(spark, [_ev("commit", 6, txn="t2")]), 1)
    assert _table(mat) == {(1, "a"), (2, "b"), (3, "c"), (4, "d")}
    assert gate.pending().count() == 0


def test_rollback_discards_buffered_rows(spark, tmp_path):
    mat, gate = _setup(spark, tmp_path)
    gate.process_batch(
        changelog_df(
            spark,
            [
                _ev("insert", 1, txn="t9", key=1, val="x"),
                _ev("insert", 2, txn="t9", key=2, val="y"),
            ],
        ),
        0,
    )
    assert _table(mat) == set()
    gate.process_batch(changelog_df(spark, [_ev("rollback", 3, txn="t9")]), 1)
    assert _table(mat) == set()
    assert gate.pending().count() == 0
    # a later commit for the rolled-back txn releases nothing
    gate.process_batch(changelog_df(spark, [_ev("commit", 4, txn="t9")]), 2)
    assert _table(mat) == set()


def test_cross_batch_interleaving_preserves_updates(spark, tmp_path):
    mat, gate = _setup(spark, tmp_path)
    # t1 updates key 1 twice; commit lands two batches later while an
    # autocommit write to another key interleaves
    gate.process_batch(
        changelog_df(spark, [_ev("insert", 1, txn="t1", key=1, val="v1")]), 0
    )
    gate.process_batch(
        changelog_df(
            spark,
            [
                _ev("update", 2, txn="t1", key=1, val="v2"),
                _ev("insert", 3, txn=None, key=9, val="z"),
            ],
        ),
        1,
    )
    assert _table(mat) == {(9, "z")}
    gate.process_batch(changelog_df(spark, [_ev("commit", 4, txn="t1")]), 2)
    # latest image of key 1 wins (max pos), not the first buffered one
    assert _table(mat) == {(1, "v2"), (9, "z")}


def test_watermark_capped_below_withheld_rows(spark, tmp_path):
    """The A21 watermark must not advance past a buffered open-txn row:
    otherwise a restart's pos_threshold filter drops the row when its
    commit finally releases it (silent data loss). The gate owns the
    watermark (materializer built with meta=None) and caps it at the
    predecessor of the oldest pending position."""
    from go_cdc_spark.sources.meta import CheckpointStore

    meta = CheckpointStore(spark, str(tmp_path / "meta"))
    snapshot = spark.createDataFrame([], "id long, v string")
    mat = StreamingMaterializer(
        spark, snapshot, keys=["id"], state_path=str(tmp_path / "state")
    )
    gate = ReadCommittedGate(
        spark,
        str(tmp_path / "pending"),
        downstream=mat.process_batch,
        meta=meta,
        data_source_id="ds1",
        table="accounts",
    )
    # open txn row at pos 4, autocommit at pos 5 → watermark must be 3
    gate.process_batch(
        changelog_df(
            spark,
            [
                _ev("insert", 4, txn="t2", key=3, val="c"),
                _ev("insert", 5, txn=None, key=4, val="d"),
            ],
        ),
        0,
    )
    wm = meta.get_pos("ds1", tb="accounts")
    assert wm == format_pos(3), wm

    # restart: a new materializer resumes from the recorded watermark
    mat2 = StreamingMaterializer(
        spark,
        snapshot,
        keys=["id"],
        state_path=str(tmp_path / "state"),
        pos_threshold=wm,
    )
    gate2 = ReadCommittedGate(
        spark,
        str(tmp_path / "pending"),
        downstream=mat2.process_batch,
        meta=meta,
        data_source_id="ds1",
        table="accounts",
    )
    gate2.process_batch(changelog_df(spark, [_ev("commit", 6, txn="t2")]), 1)
    got = {(r.id, r.v) for r in mat2.read_table().collect()}
    assert (3, "c") in got, got  # the released row survived the restart
    # nothing pending → watermark now free to reach the commit's pos
    assert meta.get_pos("ds1", tb="accounts") == format_pos(6)


def test_pending_store_crash_recovery(spark, tmp_path):
    """Crash between the two renames of the pending swap leaves only a
    .old-* dir; the next pending() read must promote it back instead of
    treating the store as empty (which would drop open-txn rows)."""
    import os

    mat, gate = _setup(spark, tmp_path)
    gate.process_batch(
        changelog_df(spark, [_ev("insert", 1, txn="t7", key=1, val="x")]), 0
    )
    p = gate.pending_path
    assert os.path.exists(p)
    # simulate the torn swap: store demoted to .old, no new store yet
    os.rename(p, p + ".old-deadbeef")
    assert {r.txn_id for r in gate.pending().collect()} == {"t7"}
    # recovered store is functional: the commit releases the row
    gate.process_batch(changelog_df(spark, [_ev("commit", 2, txn="t7")]), 1)
    assert _table(mat) == {(1, "x")}


def test_gate_release_after_rename_decodes_old_name(spark, tmp_path):
    """A row withheld by the gate BEFORE a column rename must decode its
    old-name image when released AFTER the rename (the persisted alias
    map; clearing rename state at batch end would NULL the value)."""
    snapshot = spark.createDataFrame([], "id long, name string")
    mat = StreamingMaterializer(
        spark, snapshot, keys=["id"], state_path=str(tmp_path / "state"),
        table="accounts",
    )
    gate = ReadCommittedGate(
        spark, str(tmp_path / "pending"), downstream=mat.process_batch
    )
    def dev(pos, query):
        e = _ev("ddl", pos)
        e["data"] = {"query": query}
        return e

    row = _ev("insert", 1, txn="t1", key=1, val=None)
    row["data"] = {"id": "1", "name": "carol"}
    gate.process_batch(changelog_df(spark, [row]), 0)  # withheld
    gate.process_batch(
        changelog_df(
            spark,
            [dev(2, "ALTER TABLE accounts RENAME COLUMN name TO full_name")],
        ),
        1,
    )
    assert mat.read_table().columns == ["id", "full_name"]
    gate.process_batch(changelog_df(spark, [_ev("commit", 3, txn="t1")]), 2)
    out = {r.id: r.full_name for r in mat.read_table().collect()}
    assert out == {1: "carol"}  # old-name image decoded under new name


def test_change_retype_of_merge_key_allowed(spark, tmp_path):
    """CHANGE id id BIGINT is a retype, not a rename — it must NOT be
    refused as a merge-key rename, and the stream keeps running."""
    mat, gate = _setup(spark, tmp_path)
    e = _ev("ddl", 1)
    e["data"] = {"query": "ALTER TABLE accounts CHANGE id id BIGINT"}
    gate.process_batch(changelog_df(spark, [e]), 0)  # must not raise
    gate.process_batch(
        changelog_df(spark, [_ev("insert", 2, txn=None, key=5, val="ok")]), 1
    )
    assert _table(mat) == {(5, "ok")}


def test_redelivered_batch_does_not_duplicate_pending(spark, tmp_path):
    """Crash between the pending-store rewrite and the streaming
    checkpoint commit redelivers the batch: its open-txn rows are
    already in pending, and the union must not persist (then later
    release) them twice."""
    mat, gate = _setup(spark, tmp_path)
    batch = [
        _ev("insert", 1, txn="t2", key=3, val="c"),
        _ev("insert", 2, txn=None, key=4, val="d"),
    ]
    gate.process_batch(changelog_df(spark, batch), 0)
    assert gate.pending().count() == 1
    # redelivery of the SAME batch (same batch_id) after a crash
    gate.process_batch(changelog_df(spark, batch), 0)
    assert gate.pending().count() == 1, "redelivered open-txn row duplicated"
    gate.process_batch(changelog_df(spark, [_ev("commit", 3, txn="t2")]), 1)
    assert _table(mat) == {(3, "c"), (4, "d")}
    assert gate.pending().count() == 0
