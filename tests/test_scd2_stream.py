"""Streaming SCD2 maintenance: versions open/close by binlog position,
tombstones close without opening, and `current()` is provably the same
state the current-state materializer produces from the same segments."""

from __future__ import annotations

from go_cdc_spark.sources.changelog import format_pos
from go_cdc_spark.streaming.pipeline import StreamingMaterializer
from go_cdc_spark.streaming.scd2 import VF_COL, VT_COL, Scd2Materializer

from .test_streaming import _ev, _run_available, _snapshot, _write_segment

SNAP = [(1, "alice", 10.0), (2, "bob", 20.0), (3, "carol", 30.0)]
THRESHOLD = format_pos(100)


def _segments(tmp_path):
    seg = tmp_path / "segments"
    _write_segment(seg, "seg1.json", [
        _ev("update", 1, 110, name="alice2", balance="11.0", minute=1),
        _ev("insert", 4, 120, name="dave", balance="40.0", minute=2),
    ])
    _write_segment(seg, "seg2.json", [
        _ev("delete", 2, 130, minute=3),
        _ev("update", 4, 140, name="dave2", balance="41.0", minute=4),
    ])
    return seg


def test_scd2_intervals_and_current(spark, tmp_path):
    seg = _segments(tmp_path)
    mat = Scd2Materializer(
        spark, _snapshot(spark, SNAP), ["id"],
        str(tmp_path / "scd2_state"), pos_threshold=THRESHOLD,
    )
    _run_available(mat, spark, seg, tmp_path / "ckpt")

    hist = {(r["id"], r[VF_COL]): r for r in mat.history().collect()}
    # alice: snapshot version closed at pos 110, new version open
    assert hist[(1, THRESHOLD)][VT_COL] == format_pos(110)
    assert hist[(1, format_pos(110))][VT_COL] is None
    assert hist[(1, format_pos(110))]["name"] == "alice2"
    # bob: closed by the delete at 130, and NO open version exists
    assert hist[(2, THRESHOLD)][VT_COL] == format_pos(130)
    assert not [k for k in hist if k[0] == 2 and hist[k][VT_COL] is None]
    # carol: untouched snapshot version stays open
    assert hist[(3, THRESHOLD)][VT_COL] is None
    # dave: two versions, first closed by the second
    assert hist[(4, format_pos(120))][VT_COL] == format_pos(140)
    assert hist[(4, format_pos(140))][VT_COL] is None

    # as-of position 125: alice2, carol, dave v1 — bob still live
    live = {(r["id"], r["name"]) for r in mat.asof(format_pos(125)).collect()}
    assert live == {(1, "alice2"), (2, "bob"), (3, "carol"), (4, "dave")}


def test_scd2_current_equals_flat_materializer(spark, tmp_path):
    seg = _segments(tmp_path)
    scd2 = Scd2Materializer(
        spark, _snapshot(spark, SNAP), ["id"],
        str(tmp_path / "scd2_state"), pos_threshold=THRESHOLD,
    )
    _run_available(scd2, spark, seg, tmp_path / "ckpt_scd2")
    flat = StreamingMaterializer(
        spark, _snapshot(spark, SNAP), ["id"],
        str(tmp_path / "flat_state"), pos_threshold=THRESHOLD,
    )
    _run_available(flat, spark, seg, tmp_path / "ckpt_flat")
    a = {tuple(r) for r in scd2.current().select("id", "name", "balance").collect()}
    b = {tuple(r) for r in flat.read_table().select("id", "name", "balance").collect()}
    assert a == b and a  # same current state, non-empty


def test_scd2_replay_of_committed_batch_is_noop(spark, tmp_path):
    """Crash between state swap and checkpoint commit replays the batch;
    without the batch stamp a replayed event re-derives intervals that
    already exist as closed rows, duplicating history."""
    from go_cdc_spark.sources.changelog import changelog_df

    mat = Scd2Materializer(
        spark, _snapshot(spark, SNAP), ["id"],
        str(tmp_path / "scd2_state"), pos_threshold=THRESHOLD,
    )

    def b(events):
        rows = []
        for e in events:
            e = dict(e)
            e["ts"] = None
            rows.append(e)
        return changelog_df(spark, rows)

    b0 = b([_ev("update", 1, 110, name="alice2", balance="11.0")])
    b1 = b([_ev("update", 1, 120, name="alice3", balance="12.0"),
            _ev("delete", 2, 130)])
    mat.process_batch(b0, 0)
    mat.process_batch(b1, 1)
    clean = sorted(map(tuple, mat.history().collect()))
    n_clean = len(clean)
    mat.process_batch(b1, 1)  # replay
    mat.process_batch(b0, 0)  # stale replay
    assert sorted(map(tuple, mat.history().collect())) == clean
    # next real batch still applies
    mat.process_batch(b([_ev("insert", 5, 140, name="erin", balance="1.0")]), 2)
    assert len(mat.history().collect()) == n_clean + 1


def test_scd2_skip_path_catches_meta_up(spark, tmp_path):
    """Crash between the state swap (stamp written) and the meta advance
    leaves meta one batch behind the state. The replayed batch is
    skipped by the stamp guard, but meta must STILL catch up — or a
    later run deriving pos_threshold from meta re-admits those events
    and duplicates interval history."""
    from go_cdc_spark.sources.changelog import changelog_df, format_pos
    from go_cdc_spark.sources.meta import CheckpointStore

    def b(events):
        rows = []
        for e in events:
            e = dict(e)
            e["ts"] = None
            rows.append(e)
        return changelog_df(spark, rows)

    b0 = b([_ev("update", 1, 110, name="alice2", balance="11.0")])
    # crash run: state swap lands (stamp batch 0), meta never advances
    mat = Scd2Materializer(
        spark, _snapshot(spark, SNAP), ["id"],
        str(tmp_path / "scd2_state"), pos_threshold=THRESHOLD, meta=None,
    )
    mat.process_batch(b0, 0)
    # restart with meta attached: the replay is a state no-op but must
    # advance meta to the batch max pos
    meta = CheckpointStore(spark, str(tmp_path / "meta"))
    mat2 = Scd2Materializer(
        spark, _snapshot(spark, SNAP), ["id"],
        str(tmp_path / "scd2_state"), pos_threshold=THRESHOLD,
        meta=meta, data_source_id="ds1", table="t",
    )
    before = sorted(map(tuple, mat2.history().collect()))
    mat2.process_batch(b0, 0)  # replay → skip path
    assert sorted(map(tuple, mat2.history().collect())) == before
    assert meta.get_pos("ds1", sc=None, tb="t") == format_pos(110)
    # a later batch advances it further; a stale replay cannot regress it
    mat2.process_batch(
        b([_ev("insert", 5, 140, name="erin", balance="1.0")]), 1
    )
    assert meta.get_pos("ds1", sc=None, tb="t") == format_pos(140)
    mat2.process_batch(b0, 0)  # stale replay
    assert meta.get_pos("ds1", sc=None, tb="t") == format_pos(140)


def test_scd2_fresh_checkpoint_ignores_stale_stamp(spark, tmp_path):
    """Pointing existing stamped state at a NEW checkpoint (batch ids
    restart at 0) must not silently skip the new run's early batches:
    the stamp records the run identity and is ignored on mismatch."""
    from go_cdc_spark.sources.changelog import changelog_df

    def b(events):
        rows = []
        for e in events:
            e = dict(e)
            e["ts"] = None
            rows.append(e)
        return changelog_df(spark, rows)

    mat = Scd2Materializer(
        spark, _snapshot(spark, SNAP), ["id"],
        str(tmp_path / "scd2_state"), pos_threshold=THRESHOLD,
    )
    mat._run_id = str(tmp_path / "ckpt_A")
    mat.process_batch(b([_ev("update", 1, 110, name="alice2", balance="11.0")]), 0)
    n_after_a = len(mat.history().collect())
    # same state, fresh checkpoint lineage: batch id 0 again, NEW events
    mat2 = Scd2Materializer(
        spark, _snapshot(spark, SNAP), ["id"],
        str(tmp_path / "scd2_state"), pos_threshold=THRESHOLD,
    )
    mat2._run_id = str(tmp_path / "ckpt_B")
    mat2.process_batch(b([_ev("insert", 7, 150, name="gina", balance="2.0")]), 0)
    assert len(mat2.history().collect()) == n_after_a + 1, (
        "fresh-checkpoint batch 0 must fold, not be skipped by the old stamp"
    )
    # and within the new lineage the stamp works again
    before = sorted(map(tuple, mat2.history().collect()))
    mat2.process_batch(b([_ev("insert", 7, 150, name="gina", balance="2.0")]), 0)
    assert sorted(map(tuple, mat2.history().collect())) == before


def test_scd2_cross_batch_redelivery_at_same_pos_is_noop(spark, tmp_path):
    """ADVICE r12 (medium): query-based capture's `overlap` window
    re-emits already-seen rows AT THEIR ORIGINAL pos on every poll, in
    a LATER batch — past the batch-stamp guard. Without the (key, pos)
    state guard each re-emit ties with the open interval's pseudo-event
    and appends a degenerate zero-length closed interval per poll."""
    from go_cdc_spark.sources.changelog import changelog_df

    def b(events):
        rows = []
        for e in events:
            e = dict(e)
            e["ts"] = None
            rows.append(e)
        return changelog_df(spark, rows)

    mat = Scd2Materializer(
        spark, _snapshot(spark, SNAP), ["id"],
        str(tmp_path / "scd2_state"), pos_threshold=THRESHOLD,
    )
    ev110 = _ev("update", 1, 110, name="alice2", balance="11.0")
    ev120 = _ev("update", 1, 120, name="alice3", balance="12.0")
    mat.process_batch(b([ev110]), 0)
    clean = sorted(map(tuple, mat.history().collect()))
    # poll 2 re-emits the overlap window (same event, same pos) in a NEW batch
    mat.process_batch(b([ev110]), 1)
    assert sorted(map(tuple, mat.history().collect())) == clean, (
        "re-emitted (key,pos) against the OPEN interval must not append "
        "a zero-length closed version"
    )
    # no zero-length intervals anywhere
    assert not [
        r for r in mat.history().collect() if r[VF_COL] == r[VT_COL]
    ]
    # a genuinely new event in the same batch as a re-emit still applies
    mat.process_batch(b([ev110, ev120]), 2)
    hist = {(r["id"], r[VF_COL]): r for r in mat.history().collect()}
    assert hist[(1, format_pos(110))][VT_COL] == format_pos(120)
    assert hist[(1, format_pos(120))][VT_COL] is None
    clean2 = sorted(map(tuple, mat.history().collect()))
    # re-emit against a CLOSED interval must not duplicate the closed row
    mat.process_batch(b([ev110]), 3)
    assert sorted(map(tuple, mat.history().collect())) == clean2
    assert not [
        r for r in mat.history().collect() if r[VF_COL] == r[VT_COL]
    ]
