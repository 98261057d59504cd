"""incremental_stats: maintained per-group power sums (n, n_vals, Σv,
Σv²) must equal the recompute from the merged table BIT-FOR-BIT — the
decimal accumulation is what makes signed retraction exact — and the
streaming twin must fold the same algebra across micro-batches with the
replay guard."""

from __future__ import annotations

import random

from pyspark.sql import Row
from pyspark.sql import functions as F

from go_cdc_spark.operators.cdc import apply_changes, incremental_stats


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


def _recompute_sums(merged):
    v = F.col("val")
    return merged.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count("val").cast("long").alias("n_vals"),
        F.sum(v.cast("decimal(18,6)")).cast("decimal(38,6)").alias("sum_val"),
        F.sum((v * v).cast("decimal(28,6)")).cast("decimal(38,6)").alias("sum_sq"),
    )


def _run(spark, snap_rows, evs, base_mv=False):
    snap = _snap(spark, snap_rows)
    ch = _changes(spark, evs)
    base = _recompute_sums(snap) if base_mv else None
    got = incremental_stats(
        snap, ch, keys=["id"], group_cols=["grp"], val_col="val", base_stats=base
    )
    want = _recompute_sums(apply_changes(snap, ch, keys=["id"]))
    g = sorted(map(tuple, got.collect()))
    w = sorted(map(tuple, want.collect()))
    assert g == w, f"\ngot  {g}\nwant {w}"
    return g


def test_moves_deletes_and_group_migration(spark):
    rows = [(1, "a", 5), (2, "a", 15), (3, "a", 95), (4, "b", 50)]
    _run(spark, rows, [
        ("update", 101, 2, "a", 85),    # value change within group
        ("update", 102, 3, "b", 95),    # group migration
        ("delete", 103, 1, "a", None),
        ("insert", 104, 5, "a", 200.25),
    ])


def test_null_values_count_rows_not_sums(spark):
    rows = [(1, "a", 5), (2, "a", None)]
    out = _run(spark, rows, [("update", 101, 1, "a", None),
                             ("insert", 102, 3, "a", 42)])
    # 3 rows live, exactly one non-null value (42)
    assert [(r[0], r[1], r[2], float(r[3]), float(r[4])) for r in out] == [
        ("a", 3, 1, 42.0, 1764.0)
    ]


def test_whole_group_retraction_vanishes(spark):
    rows = [(1, "a", 5), (2, "b", 7)]
    out = _run(spark, rows, [("delete", 101, 1, "a", 5)])
    assert [r[0] for r in out] == ["b"]


def test_stored_mv_path_matches_recompute(spark):
    rng = random.Random(7)
    rows = [(i, f"g{i % 3}", rng.uniform(-50, 150)) for i in range(1, 30)]
    evs = [("update", 100 + k, rng.randint(1, 35), f"g{rng.randint(0, 3)}",
            rng.uniform(-50, 150)) for k in range(15)]
    assert _run(spark, rows, evs, base_mv=True) == _run(spark, rows, evs)


def test_random_interleavings_match_recompute(spark):
    rng = random.Random(13)
    rows = [(i, f"g{i % 3}", rng.uniform(0, 100)) for i in range(1, 30)]
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
            evs.append(("update", pos, i, g, rng.uniform(-20, 120)))
        else:
            live.add(i)
            evs.append(("insert", pos, i, g, rng.uniform(-20, 120)))
    _run(spark, rows, evs)


# ---------------------------------------------------------------------------
# Streaming twin
# ---------------------------------------------------------------------------

from pyspark.sql import types as T  # noqa: E402

from go_cdc_spark.streaming.ivm import IncrementalStats  # noqa: E402

from .test_ivm import _ev, _write_segments  # noqa: E402


def _run_stats(spark, tmp_path, segments):
    from go_cdc_spark.streaming.pipeline import read_changelog_stream

    seg = tmp_path / "ss"
    _write_segments(seg, segments)
    st = IncrementalStats(
        spark, ["grp"], "val", str(tmp_path / "st_state"),
        types={"grp": T.StringType(), "val": T.DoubleType()},
    )
    st.start(
        read_changelog_stream(spark, str(seg)), str(tmp_path / "ckpt_st")
    ).awaitTermination(120)
    return st


def _b(spark, events):
    from go_cdc_spark.sources.changelog import changelog_df

    rows = []
    for e in events:
        e = dict(e)
        e["ts"] = None
        rows.append(e)
    return changelog_df(spark, rows)


def test_stream_stats_folds_across_batches(spark, tmp_path):
    st = _run_stats(spark, tmp_path, [
        [_ev("insert", 1, 1, "a", 10.0), _ev("insert", 2, 2, "a", 20.0)],
        [_ev("insert", 3, 3, "a", 30.0),
         _ev("update", 4, 1, "a", 40.0, before=("a", 10.0)),
         _ev("delete", 5, 2, before=("a", 20.0))],
    ])
    row = st.read_table().collect()[0]
    # surviving values: 30, 40 → mean 35, sample var ((30-35)²+(40-35)²)/1 = 50
    assert (row.grp, row.n_rows, row.n_vals) == ("a", 2, 2)
    assert row.mean_val == 35.0 and row.var_val == 50.0
    assert row.stddev_val == 50.0 ** 0.5


def test_stream_stats_retraction_is_exact(spark, tmp_path):
    """The decimal-accumulation claim, measured: fold values in and
    back out and the sums return to the EXACT starting point (a float
    accumulator would leave residue)."""
    vals = [0.1, 0.2, 0.3]  # classic binary-float residue makers
    st = _run_stats(spark, tmp_path, [
        [_ev("insert", 1, 1, "a", 7.7)],
        [_ev("insert", 10 + i, 10 + i, "a", v) for i, v in enumerate(vals)],
        [_ev("delete", 20 + i, 10 + i, before=("a", v))
         for i, v in enumerate(vals)],
    ])
    row = st.read_table().collect()[0]
    assert (row.grp, row.n_vals, row.mean_val) == ("a", 1, 7.7)


def test_stream_stats_delete_before_insert_commutes(spark, tmp_path):
    st = IncrementalStats(
        spark, ["grp"], "val", str(tmp_path / "s"),
        types={"grp": T.StringType(), "val": T.DoubleType()},
    )
    # retraction arrives a batch before its insert: parks negative,
    # hidden from reads, annihilates when the insert lands
    st.process_batch(_b(spark, [_ev("delete", 2, 2, before=("b", 9.0))]), 0)
    assert st.read_table().filter("grp = 'b'").count() == 0
    st.process_batch(_b(spark, [_ev("insert", 1, 2, "b", 9.0),
                                _ev("insert", 3, 3, "b", 11.0)]), 1)
    row = st.read_table().collect()[0]
    assert (row.grp, row.n_vals, row.mean_val) == ("b", 1, 11.0)


def test_stream_stats_replay_is_noop(spark, tmp_path):
    st = IncrementalStats(
        spark, ["grp"], "val", str(tmp_path / "s"),
        types={"grp": T.StringType(), "val": T.DoubleType()},
    )
    b0 = _b(spark, [_ev("insert", 1, 1, "a", 10.0)])
    b1 = _b(spark, [_ev("insert", 2, 2, "a", 30.0)])
    st.process_batch(b0, 0)
    st.process_batch(b1, 1)
    clean = sorted(map(tuple, st.read_table().collect()))
    st.process_batch(b1, 1)  # replay
    st.process_batch(b0, 0)  # stale replay
    assert sorted(map(tuple, st.read_table().collect())) == clean
