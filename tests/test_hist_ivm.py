"""incremental_histogram: the maintained fixed-bin histogram (and its
quantile read) must equal the recompute from the merged table — pure
signed deltas, the fully-foldable IVM case."""

from __future__ import annotations

import random

from pyspark.sql import Row

from go_cdc_spark.operators.cdc import (
    _bin_expr,
    apply_changes,
    histogram_percentiles,
    incremental_histogram,
)

LO, HI, BINS = 0.0, 100.0, 10


def _snap(spark, rows):
    return spark.createDataFrame(
        [Row(id=i, grp=g, val=(None if v is None else float(v))) for i, g, v in rows]
    )


def _changes(spark, evs):
    return spark.createDataFrame(
        [
            Row(id=i, grp=g, val=(None if v is None else float(v)),
                pos=f"{p:012d}", op=op)
            for op, p, i, g, v in evs
        ]
    )


def _run(spark, snap_rows, evs):
    from pyspark.sql import functions as F

    snap = _snap(spark, snap_rows)
    ch = _changes(spark, evs)
    got = incremental_histogram(
        snap, ch, keys=["id"], group_cols=["grp"], val_col="val",
        lo=LO, hi=HI, nbins=BINS,
    )
    merged = apply_changes(snap, ch, keys=["id"])
    want = (
        merged.filter(F.col("val").isNotNull())
        .groupBy("grp", _bin_expr("val", LO, HI, BINS).alias("bin"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    g = sorted(map(tuple, got.collect()))
    w = sorted(map(tuple, want.collect()))
    assert g == w, f"\ngot  {g}\nwant {w}"
    # the quantile read agrees too
    gq = sorted(map(tuple, histogram_percentiles(got, ["grp"]).collect()))
    wq = sorted(map(tuple, histogram_percentiles(want, ["grp"]).collect()))
    assert gq == wq
    return g


def test_signed_deltas_handle_moves_and_deletes(spark):
    rows = [(1, "a", 5), (2, "a", 15), (3, "a", 95), (4, "b", 50)]
    _run(spark, rows, [
        ("update", 101, 2, "a", 85),        # bin move within group
        ("update", 102, 3, "b", 95),        # group migration
        ("delete", 103, 1, "a", None),
        ("insert", 104, 5, "a", 200),       # clamps to the top bin
        ("insert", 105, 6, "a", -7),        # clamps to bin 0
    ])


def test_null_values_are_invisible(spark):
    rows = [(1, "a", 5), (2, "a", None)]
    out = _run(spark, rows, [("update", 101, 1, "a", None),
                             ("insert", 102, 3, "a", 42)])
    assert out == [("a", 4, 1)]  # only the non-null insert remains


def test_random_interleavings_match_recompute(spark):
    rng = random.Random(11)
    rows = [(i, f"g{i % 3}", rng.randint(0, 100)) for i in range(1, 30)]
    live = {i for i, _, _ in rows}
    evs, pos = [], 100
    for _ in range(40):
        pos += 1
        i = rng.randint(1, 40)
        g = f"g{rng.randint(0, 3)}"
        if i in live and rng.random() < 0.35:
            live.discard(i)
            evs.append(("delete", pos, i, g, None))
        elif i in live:
            evs.append(("update", pos, i, g, rng.randint(-20, 120)))
        else:
            live.add(i)
            evs.append(("insert", pos, i, g, rng.randint(-20, 120)))
    _run(spark, rows, evs)


# ---------------------------------------------------------------------------
# Streaming twin
# ---------------------------------------------------------------------------

from pyspark.sql import types as T  # noqa: E402

from go_cdc_spark.streaming.ivm import IncrementalHistogram  # noqa: E402

from .test_ivm import _ev, _write_segments  # noqa: E402


def _run_hist(spark, tmp_path, segments):
    from go_cdc_spark.streaming.pipeline import read_changelog_stream

    seg = tmp_path / "hs"
    _write_segments(seg, segments)
    h = IncrementalHistogram(
        spark, ["grp"], "val", LO, HI, BINS, str(tmp_path / "h_state"),
        types={"grp": T.StringType(), "val": T.DoubleType()},
    )
    h.start(
        read_changelog_stream(spark, str(seg)), str(tmp_path / "ckpt_h")
    ).awaitTermination(120)
    return h


def test_stream_histogram_folds_and_reads_percentiles(spark, tmp_path):
    h = _run_hist(spark, tmp_path, [
        [_ev("insert", 1, i, "a", float(v))
         for i, v in enumerate([5, 15, 25, 35, 45, 55, 65, 75, 85, 95], 1)],
        [_ev("delete", 11, 10, before=("a", 95.0)),   # retract the top
         _ev("update", 12, 1, "a", 99.0, before=("a", 5.0))],
    ])
    hist = {(r.grp, r.bin): r.n for r in h.histogram().collect()}
    # after: values 15..85 (bins 1..8) + 99 (bin 9)
    assert hist == {("a", b): 1 for b in range(1, 10)}
    row = h.read_table().collect()[0]
    assert (row.grp, row.n_vals, row.p50_bin, row.p90_bin, row.p99_bin) == (
        "a", 9, 5, 9, 9,
    )


def test_stream_histogram_replay_is_noop(spark, tmp_path):
    from go_cdc_spark.sources.changelog import changelog_df

    h = IncrementalHistogram(
        spark, ["grp"], "val", LO, HI, BINS, str(tmp_path / "h_state"),
        types={"grp": T.StringType(), "val": T.DoubleType()},
    )

    def b(events):
        rows = []
        for e in events:
            e = dict(e)
            e["ts"] = None
            rows.append(e)
        return changelog_df(spark, rows)

    b0 = b([_ev("insert", 1, 1, "a", 10.0), _ev("insert", 2, 2, "a", 90.0)])
    b1 = b([_ev("delete", 3, 1, before=("a", 10.0))])
    h.process_batch(b0, 0)
    h.process_batch(b1, 1)
    clean = sorted(map(tuple, h.histogram().collect()))
    h.process_batch(b1, 1)  # replay
    h.process_batch(b0, 0)  # stale replay
    assert sorted(map(tuple, h.histogram().collect())) == clean == [("a", 9, 1)]


def test_stream_histogram_delete_before_insert_commutes(spark, tmp_path):
    from go_cdc_spark.sources.changelog import changelog_df

    h = IncrementalHistogram(
        spark, ["grp"], "val", LO, HI, BINS, str(tmp_path / "h_state"),
        types={"grp": T.StringType(), "val": T.DoubleType()},
    )

    def b(events):
        rows = []
        for e in events:
            e = dict(e)
            e["ts"] = None
            rows.append(e)
        return changelog_df(spark, rows)

    # the delete's batch arrives BEFORE the insert's: the cell parks
    # negative (hidden from reads) until the insert lands
    h.process_batch(b([_ev("delete", 2, 1, before=("a", 50.0))]), 0)
    assert h.histogram().count() == 0
    h.process_batch(b([_ev("insert", 1, 1, "a", 50.0)]), 1)
    assert sorted(map(tuple, h.histogram().collect())) == []  # net zero, compacted
    h.process_batch(b([_ev("insert", 3, 2, "a", 50.0)]), 2)
    assert sorted(map(tuple, h.histogram().collect())) == [("a", 5, 1)]


def test_stream_histogram_staleness_flag(spark, tmp_path):
    """A retraction arriving BEFORE its insert parks a negative cell;
    while it is parked the group's visible totals overstate the merged
    count — read_table must say so (has_negative), the histogram twin
    of top-k's dirty column."""
    from go_cdc_spark.sources.changelog import changelog_df

    h = IncrementalHistogram(
        spark, ["grp"], "val", LO, HI, BINS, str(tmp_path / "h_state"),
        types={"grp": T.StringType(), "val": T.DoubleType()},
    )

    def b(events):
        rows = []
        for e in events:
            e = dict(e)
            e["ts"] = None
            rows.append(e)
        return changelog_df(spark, rows)

    # delete of id 2 arrives a batch before its insert (cross-segment
    # reordering): bin(35) parks at n=-1 while bin(15) reads n=1
    h.process_batch(
        b([_ev("insert", 1, 1, "a", 15.0), _ev("delete", 2, 2, before=("a", 35.0))]),
        0,
    )
    row = h.read_table().collect()[0]
    assert row.has_negative and row.n_vals == 1
    # the late insert lands: the negative annihilates, flag clears
    h.process_batch(b([_ev("insert", 3, 2, "a", 35.0)]), 1)
    row = h.read_table().collect()[0]
    assert not row.has_negative and row.n_vals == 1
