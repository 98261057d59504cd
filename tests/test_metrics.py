"""Observed sync metrics: observe() counters ride the micro-batch plan
and surface through the listener tap (the reference's sync-progress
logging, Spark-native)."""

from __future__ import annotations

import json
import time

from go_cdc_spark.streaming.metrics import install_tap, observe_changes
from go_cdc_spark.streaming.pipeline import read_changelog_stream

from .test_streaming import _ev, _write_segment


def test_observe_counters_match_stream(spark, tmp_path):
    seg = tmp_path / "segments"
    _write_segment(
        seg,
        "seg1.json",
        [
            _ev("insert", 1, 100, name="a", balance="1.0", minute=1),
            _ev("insert", 2, 110, name="b", balance="2.0", minute=2),
            _ev("update", 1, 120, name="a2", balance="1.5", minute=3),
        ],
    )
    _write_segment(
        seg,
        "seg2.json",
        [
            _ev("delete", 2, 130, minute=4),
            _ev("insert", 3, 140, name="c", balance="3.0", minute=5),
        ],
    )
    tap = install_tap(spark)
    try:
        stream = observe_changes(read_changelog_stream(spark, str(seg)))
        q = (
            stream.writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # listener bus is async: progress events can trail termination
        deadline = time.time() + 30
        while time.time() < deadline and tap.totals()["n_events"] < 5:
            time.sleep(0.2)
        totals = tap.totals()
        assert totals == {
            "n_events": 5,
            "n_inserts": 3,
            "n_updates": 1,
            "n_deletes": 1,
        }
        latest = tap.latest()
        assert latest is not None and latest["max_pos"] is not None
    finally:
        spark.streams.removeListener(tap)
