"""transformWithStateInPandas operators: same semantics as
test_stateful.py, WITHOUT the sink-polling workaround — explicit timers
let the query drain and terminate normally (processAllAvailable
returns), which is the point of the migration."""

from __future__ import annotations

import json

import pytest

# ENV CONTRACT: transformWithStateInPandas speaks a protobuf-based
# state-server protocol; `google.protobuf` is absent in this container
# and cannot be installed (no pip) or vendored (compiled descriptors).
# The suite runs wherever the dependency exists; in this sandbox each
# round records exactly this skip so the gap stays visible. The
# default applyInPandasWithState path (test_stateful.py) is fully
# exercised here regardless.
#
# Round-stamped (r02, r03, r04, r05, r06, r07, r08-2026-08-15): the container image cannot
# change — no pip/apt, no network, and google.protobuf's runtime needs
# generated C-descriptor modules that cannot be hand-vendored. This is
# the documented permanent answer unless the driver image grows the
# dependency. The same stateful semantics execute for real through the
# applyInPandasWithState twin in test_stateful.py every round.
import importlib.util

# find_spec("google.protobuf") raises if the parent namespace package
# is absent entirely, so probe the parent first
_have_protobuf = (
    importlib.util.find_spec("google") is not None
    and importlib.util.find_spec("google.protobuf") is not None
)

if not _have_protobuf:
    pytest.skip(
        "ENV CONTRACT unmet: google.protobuf missing and uninstallable in "
        "this sandbox — transformWithStateInPandas suite runs only where "
        "the state-server protocol dependency exists (stateful_v2.py gate)",
        allow_module_level=True,
    )

from go_cdc_spark.streaming.pipeline import read_changelog_stream
from go_cdc_spark.streaming.stateful_v2 import (
    ROCKSDB_PROVIDER,
    require_rocksdb,
    txn_assembler_v2,
    watermark_tracker_v2,
)


@pytest.fixture
def rocksdb(spark):
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    require_rocksdb(spark)
    yield
    if prev is None:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    else:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


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


def test_watermark_tracker_v2_accumulates(spark, tmp_path, rocksdb):
    src = tmp_path / "changelog"
    src.mkdir()
    _write(src / "seg0.json", [_event(3), _event(7), _event(1, source="ds2")])
    stream = read_changelog_stream(spark, str(src))
    out = watermark_tracker_v2(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("wm2")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    _write(src / "seg1.json", [_event(12), _event(9)])
    q.processAllAvailable()
    q.stop()
    final: dict[str, tuple[str, int]] = {}
    for r in spark.sql("SELECT * FROM wm2").collect():
        if r.data_source not in final or r.n_events > final[r.data_source][1]:
            final[r.data_source] = (r.max_pos, r.n_events)
    assert final["ds1"] == ("12".zfill(12), 4)
    assert final["ds2"] == ("1".zfill(12), 1)


def test_txn_assembler_v2_flush_and_timeout(spark, tmp_path, rocksdb):
    """Commit flushes t1 immediately; the uncommitted t2 is evicted by
    an explicit timer in a LATER batch — both observed through plain
    processAllAvailable(), no sink polling."""
    import time

    src = tmp_path / "changelog"
    src.mkdir()
    _write(
        src / "seg0.json",
        [
            _event(1, txn="t1"),
            _event(2, txn="t1"),
            _event(3, txn="t2"),  # never commits
            _event(4, op="commit", txn="t1"),
        ],
    )
    stream = read_changelog_stream(spark, str(src), max_files_per_trigger=1)
    out = txn_assembler_v2(stream, timeout_ms=2_000)
    q = (
        out.writeStream.format("memory")
        .queryName("txns2")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()  # returns: no paced no-data batches
    rows = {r.txn_id: r for r in spark.sql("SELECT * FROM txns2").collect()}
    assert rows["t1"].complete and rows["t1"].n_events == 2
    assert rows["t1"].first_pos == "1".zfill(12)
    assert rows["t1"].last_pos == "2".zfill(12)
    assert "t2" not in rows  # still buffered, timer pending

    # timers fire during normal processing of a later batch
    time.sleep(2.5)
    _write(src / "seg1.json", [_event(9, txn="t3"), _event(10, op="commit", txn="t3")])
    q.processAllAvailable()
    q.stop()
    rows = {r.txn_id: r for r in spark.sql("SELECT * FROM txns2").collect()}
    assert not rows["t2"].complete and rows["t2"].n_events == 1
    assert rows["t3"].complete
