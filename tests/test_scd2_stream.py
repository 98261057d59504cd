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
