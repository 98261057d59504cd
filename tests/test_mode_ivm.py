"""incremental_mode (the 9th IVM algebra): maintained (group, value)
counts + top-1 read must equal the recompute from the merged table,
batch and streaming."""

from __future__ import annotations

import random

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from go_cdc_spark.operators.cdc import (
    apply_changes,
    incremental_mode,
    mode_read,
)
from go_cdc_spark.streaming.ivm import IncrementalMode

from .test_ivm import _ev, _write_segments


def _snap(spark, rows):
    return spark.createDataFrame(
        [Row(id=i, grp=g, val=v) for i, g, v in rows],
        "id long, grp string, val string",
    )


def _changes(spark, evs):
    return spark.createDataFrame(
        [
            Row(id=i, grp=g, val=v, pos=f"{p:012d}", op=op)
            for op, p, i, g, v in evs
        ],
        "id long, grp string, val string, pos string, op string",
    )


def _run(spark, snap_rows, evs):
    snap = _snap(spark, snap_rows)
    ch = _changes(spark, evs)
    got = incremental_mode(
        snap, ch, keys=["id"], group_cols=["grp"], val_col="val"
    )
    merged = apply_changes(snap, ch, keys=["id"])
    want = (
        merged.filter(F.col("val").isNotNull())
        .groupBy("grp", "val")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    g = sorted(map(tuple, got.collect()))
    w = sorted(map(tuple, want.collect()))
    assert g == w, f"\ngot  {g}\nwant {w}"
    gm = sorted(map(tuple, mode_read(got, ["grp"], "val").collect()))
    wm = sorted(map(tuple, mode_read(want, ["grp"], "val").collect()))
    assert gm == wm
    return gm


def test_moves_deletes_and_tie_break(spark):
    rows = [(1, "a", "x"), (2, "a", "x"), (3, "a", "y"), (4, "b", "z")]
    modes = _run(spark, rows, [
        ("update", 101, 2, "a", "y"),   # x:1 y:2 -> mode y
        ("delete", 102, 3, "a", None),  # x:1 y:1 -> tie, smaller value x wins
        ("insert", 103, 5, "b", "z"),
    ])
    assert modes == [("a", "x", 1), ("b", "z", 2)]


def test_random_interleavings_match_recompute(spark):
    rng = random.Random(7)
    vals = ["u", "v", "w", "x"]
    rows = [(i, f"g{i % 3}", rng.choice(vals)) for i in range(1, 25)]
    live = {i for i, _, _ in rows}
    evs, pos = [], 100
    for _ in range(50):
        pos += 1
        i = rng.randint(1, 35)
        g = f"g{rng.randint(0, 3)}"
        if i in live and rng.random() < 0.3:
            live.discard(i)
            evs.append(("delete", pos, i, g, None))
        else:
            live.add(i)
            op = "update" if i in live else "insert"
            evs.append((op, pos, i, g, rng.choice(vals)))
    _run(spark, rows, evs)


# ---------------------------------------------------------------------------
# Streaming twin
# ---------------------------------------------------------------------------


def _run_mode(spark, tmp_path, segments):
    from go_cdc_spark.streaming.pipeline import read_changelog_stream

    seg = tmp_path / "ms"
    _write_segments(seg, segments)
    m = IncrementalMode(
        spark, ["grp"], "val", str(tmp_path / "m_state"),
        types={"grp": T.StringType(), "val": T.StringType()},
    )
    m.start(
        read_changelog_stream(spark, str(seg)), str(tmp_path / "ckpt_m")
    ).awaitTermination(120)
    return m


def test_stream_mode_folds_and_reads(spark, tmp_path):
    m = _run_mode(spark, tmp_path, [
        [_ev("insert", 1, 1, "a", "x"),
         _ev("insert", 2, 2, "a", "x"),
         _ev("insert", 3, 3, "a", "y")],
        [_ev("update", 11, 2, "a", "y", before=("a", "x")),  # x:1 y:2
         _ev("insert", 12, 4, "b", "z")],
    ])
    got = {r.grp: (r.mode_value, r.mode_count, r.has_negative)
           for r in m.read_table().collect()}
    assert got == {"a": ("y", 2, False), "b": ("z", 1, False)}


def test_stream_mode_delete_before_insert_parks_negative(spark, tmp_path):
    from go_cdc_spark.sources.changelog import changelog_df

    m = IncrementalMode(
        spark, ["grp"], "val", str(tmp_path / "m_state"),
        types={"grp": T.StringType(), "val": T.StringType()},
    )

    def b(events):
        rows = []
        for e in events:
            e = dict(e)
            e["ts"] = None
            rows.append(e)
        return changelog_df(spark, rows)

    m.process_batch(b([_ev("insert", 1, 1, "a", "x"),
                       _ev("delete", 2, 2, before=("a", "y"))]), 0)
    row = m.read_table().collect()[0]
    assert (row.mode_value, row.mode_count) == ("x", 1)
    assert row.has_negative  # the parked y:-1 is flagged, not shown
    m.process_batch(b([_ev("insert", 3, 2, "a", "y")]), 1)
    row = m.read_table().collect()[0]
    assert (row.mode_value, row.mode_count) == ("x", 1)
    assert not row.has_negative  # y net zero, compacted away
