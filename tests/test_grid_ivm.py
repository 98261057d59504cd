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


def test_engine_maintained_grid_feeds_forecast_core(spark, tmp_path):
    """VERDICT r11 #4 — the engine read path: a config-declared grid
    view (grid_tables) folds the changelog via sync_grids, read_grid
    serves the DENSE grid, and a downstream consumer (the
    ts_forecast_hourly core) produces EQUAL output on the maintained
    grid vs a batch recompute over the surviving events — over a
    random insert/update/delete interleaving split across segments."""
    import json
    import random

    from go_cdc_spark.app import Engine
    from go_cdc_spark.config import load_config
    from go_cdc_spark.operators.timeseries import _dense_grid, forecast_core

    # 2 types × 4 days hourly, enough span for the 24h forecast holdout
    rng = random.Random(42)
    universe = []
    eid = 0
    for et in ("click", "view"):
        for h in range(96):
            eid += 1
            ts = f"2024-03-{1 + h // 24:02d} {h % 24:02d}:15:00"
            universe.append((eid, et, ts, float(rng.randint(0, 40))))
    deleted = set(rng.sample([u[0] for u in universe], 15))
    updated = {
        u[0]: (u[2], float(rng.randint(0, 40)))
        for u in rng.sample(universe, 20)
        if u[0] not in deleted
    }

    evs = []
    for eid, et, ts, val in universe:
        data = {"event_id": str(eid), "event_type": et, "ts": ts,
                "value": repr(val)}
        evs.append({"op": "insert", "data": data, "before": None})
        if eid in updated:
            new_ts, new_val = updated[eid]
            after = dict(data, ts=new_ts, value=repr(new_val))
            evs.append({"op": "update", "data": after, "before": data})
            data = after
        if eid in deleted:
            evs.append({"op": "delete", "data": None, "before": data})
    rng.shuffle(evs)

    seg_dir = tmp_path / "changelog"
    seg_dir.mkdir()
    cfg = f"""
[engine]
meta_path      = "{tmp_path}/meta"
state_dir      = "{tmp_path}/state"
checkpoint_dir = "{tmp_path}/ckpt"

[[source]]
id        = 1
name      = "dev"
type      = "parquet"
path      = "/root/testdata/sf0.001"
changelog = "{seg_dir}"
[source.grid_tables."main.events"]
type_col  = "event_type"
ts_col    = "ts"
value_col = "value"
[source.rules.global]
include_tables = ["region"]
"""
    cfg_path = tmp_path / "config.toml"
    cfg_path.write_text(cfg)
    for b in range(3):
        with open(seg_dir / f"seg{b}.json", "w") as f:
            for i, e in enumerate(evs):
                if i % 3 != b:
                    continue
                f.write(json.dumps(_envelope(e, i)) + "\n")

    engine = Engine(load_config(str(cfg_path)), spark=spark)
    engine.init_sources()
    engine.sync_grids()
    maintained = engine.read_grid(1, "main", "events")

    # recompute from the SURVIVING event set (batch ground truth)
    rows = []
    for eid, et, ts, val in universe:
        if eid in deleted:
            continue
        if eid in updated:
            ts, val = updated[eid]
        rows.append((eid, ts, eid, et, val, "{}"))
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    out = str(tmp_path / "sf" / "events.parquet")
    df.write.mode("overwrite").parquet(out)
    recomputed = _dense_grid(spark, str(tmp_path / "sf"))

    # grid parity first (cell-level), then the downstream consumer
    assert _rows(maintained) == _rows(recomputed)

    def fc_rows(dense):
        return sorted(
            (r.event_type, str(r.hour), r.actual, round(r.forecast, 9))
            for r in forecast_core(
                dense.select("event_type", "hour", "n_events")
            ).collect()
        )

    got = fc_rows(maintained)
    want = fc_rows(recomputed)
    assert got and got == want  # 2 types × 24 holdout hours

    # the WHOLE downstream family reads the maintained grid: every
    # df-level core produces EQUAL output on maintained vs recomputed
    from go_cdc_spark.operators.timeseries import (
        anomaly_seasonal_core,
        autocorr_core,
        changepoint_core,
        crosscorr_core,
        decompose_core,
        gapfill_core,
        interp_core,
    )

    def norm(df):
        return sorted(
            tuple(
                round(v, 9) if isinstance(v, float) else str(v)
                for v in row
            )
            for row in df.collect()
        )

    three = lambda d: d.select("event_type", "hour", "n_events")
    for core, proj in [
        (crosscorr_core, three),
        (autocorr_core, three),
        (changepoint_core, three),
        (anomaly_seasonal_core, three),
        (decompose_core, three),
        (gapfill_core, lambda d: d),
        (interp_core, lambda d: d),
    ]:
        got_c = norm(core(proj(maintained)))
        want_c = norm(core(proj(recomputed)))
        assert got_c == want_c, core.__name__

    # replaying the drain is a no-op (checkpoint + batch stamp)
    engine.sync_grids()
    assert fc_rows(engine.read_grid(1, "main", "events")) == want

    # unknown view fails loudly
    with pytest.raises(KeyError, match="grid view"):
        engine.read_grid(1, "main", "nope")
