"""IncrementalGrid (streaming/ivm.py) parity vs the batch dense grid
(VERDICT r10 #5): the maintained (event_type, hour) cells, densified at
read, must equal operators/timeseries._dense_grid over the surviving
event set — over RANDOM interleavings of inserts/updates/retractions
split across micro-batches (signed-delta algebra is order-commutative),
with the replay guard and cross-batch negative parking exercised."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from go_cdc_spark.operators.timeseries import _dense_grid, densify_grid
from go_cdc_spark.sources.changelog import changelog_df
from go_cdc_spark.streaming.ivm import IncrementalGrid

# (event_id, event_type, ts, value) — 2 types, gappy hours, a NULL value
UNIVERSE = [
    (1, "click", "2024-03-01 00:10:00", 1.5),
    (2, "click", "2024-03-01 00:40:00", 2.25),
    (3, "click", "2024-03-01 02:05:00", 4.0),   # hour-1 gap for click
    (4, "click", "2024-03-01 05:59:59", 8.125),
    (5, "click", "2024-03-01 05:00:01", None),  # NULL value, counted cell
    (6, "view", "2024-03-01 01:00:00", 10.0),
    (7, "view", "2024-03-01 01:30:00", 0.5),
    (8, "view", "2024-03-01 03:00:00", 7.75),
    (9, "view", "2024-03-01 06:00:00", 3.0),
    (10, "view", "2024-03-01 06:45:00", None),
    (11, "click", "2024-03-01 07:30:00", 6.5),
    (12, "view", "2024-03-01 00:05:00", 9.0),
]
DELETED = {3, 9, 11, 12}  # 11/12 retract EDGE hours -> grid bounds shrink
# id -> (new_ts, new_value): 7 migrates cells, 4 changes value in place
UPDATED = {7: ("2024-03-01 04:15:00", 11.5), 4: ("2024-03-01 05:59:59", 1.0)}


def _events():
    """insert for every row; update/delete events after —
    (kind_order, envelope) so shuffles stay semantically valid per key
    via pos (latest-wins is NOT used by the fold; order-commutation is
    the property under test, so every op is folded)."""
    evs = []
    for eid, et, ts, val in UNIVERSE:
        data = {"event_id": str(eid), "event_type": et, "ts": ts,
                "value": None if val is None else repr(val)}
        evs.append({"op": "insert", "data": data, "before": None, "eid": eid})
        if eid in UPDATED:
            new_ts, new_val = UPDATED[eid]
            after = dict(data, ts=new_ts, value=repr(new_val))
            evs.append({"op": "update", "data": after, "before": data, "eid": eid})
            data = after
        if eid in DELETED:
            evs.append({"op": "delete", "data": None, "before": data, "eid": eid})
    return evs


def _envelope(e, pos):
    return {
        "data_source": "t", "schema": "main", "table": "events",
        "op": e["op"], "data": e["data"], "before": e["before"],
        "ts": None, "pos": str(pos).zfill(12), "txn_id": None,
    }


def _survivors(spark, tmp_path):
    rows = []
    for eid, et, ts, val in UNIVERSE:
        if eid in DELETED:
            continue
        if eid in UPDATED:
            ts, val = UPDATED[eid]
        rows.append((eid, ts, eid, et, val, "{}"))
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    out = str(tmp_path / "sf" / "events.parquet")
    df.write.mode("overwrite").parquet(out)
    return str(tmp_path / "sf")


def _rows(df):
    return sorted(
        (r.event_type, str(r.hour), r.n_events,
         None if r.hour_value is None else round(r.hour_value, 9))
        for r in df.collect()
    )


@pytest.mark.parametrize("seed", [7, 23, 101])
def test_grid_ivm_matches_batch_recompute_under_interleaving(spark, tmp_path, seed):
    evs = _events()
    rng = random.Random(seed)
    rng.shuffle(evs)  # deletes can land BEFORE their inserts across batches
    grid = IncrementalGrid(spark, str(tmp_path / f"state{seed}"))
    n_batches = 4
    for b in range(n_batches):
        chunk = [e for i, e in enumerate(evs) if i % n_batches == b]
        grid.process_batch(
            changelog_df(spark, [_envelope(e, i) for i, e in enumerate(chunk)]), b
        )
    want = _rows(_dense_grid(spark, _survivors(spark, tmp_path)))
    got = _rows(grid.read_table())
    assert got == want

    # replay of an already-folded batch id is a no-op (storeio stamp)
    last = [e for i, e in enumerate(evs) if i % n_batches == n_batches - 1]
    grid._run_id = grid._run_id  # same run identity
    grid.process_batch(
        changelog_df(spark, [_envelope(e, i) for i, e in enumerate(last)]),
        n_batches - 1,
    )
    assert _rows(grid.read_table()) == want


def test_grid_ivm_batch_fold_twin_matches_streaming(spark, tmp_path):
    """The batch fold (operators/timeseries.incremental_grid) and the
    streaming fold agree cell-for-cell on the same change set — one
    algebra, two drivers."""
    from go_cdc_spark.operators.timeseries import incremental_grid

    evs = _events()
    grid = IncrementalGrid(spark, str(tmp_path / "state"))
    grid.process_batch(
        changelog_df(spark, [_envelope(e, i) for i, e in enumerate(evs)]), 0
    )

    ev_rows = [
        (eid, ts, et, val) for eid, et, ts, val in UNIVERSE
    ]
    typed = spark.createDataFrame(
        ev_rows, "event_id long, ts string, event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    snapshot = typed.limit(0)  # all change-stream driven
    changes = []
    pos = 0
    for eid, et, ts, val in UNIVERSE:
        pos += 1
        changes.append((eid, ts, et, val, "insert", str(pos).zfill(12)))
        if eid in UPDATED:
            new_ts, new_val = UPDATED[eid]
            pos += 1
            changes.append((eid, new_ts, et, new_val, "update", str(pos).zfill(12)))
            ts, val = new_ts, new_val
        if eid in DELETED:
            pos += 1
            changes.append((eid, ts, et, val, "delete", str(pos).zfill(12)))
    cdf = spark.createDataFrame(
        changes,
        "event_id long, ts string, event_type string, value double, op string, pos string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    state = incremental_grid(snapshot, cdf, keys=["event_id"])
    assert _rows(densify_grid(state)) == _rows(grid.read_table())
