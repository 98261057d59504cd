"""Resample/gap-fill spec tests beyond the oracle hash-check: exact
fill semantics on a constructed gap pattern (interior, leading, and
trailing gaps; multi-event hours)."""

from __future__ import annotations

import datetime as dt

from go_cdc_spark.operators.timeseries import (
    resample_gapfill,
    resample_interp_linear,
)


def _h(hour: int, minute: int = 15) -> dt.datetime:
    return dt.datetime(2024, 1, 1, hour, minute)


def _write_events(spark, tmp_path) -> str:
    # type 'a': hour 0 holds TWO events (4.0 + 6.0), hours 1-2 are an
    # interior gap, hour 3 closes with 7.0.
    # type 'b': leading gap at hour 0, observations at hours 1-2,
    # trailing gap at hour 3 (span is global, so b inherits a's bounds).
    rows = [
        (1, _h(0, 10), 100, "a", 4.0, "{}"),
        (2, _h(0, 50), 101, "a", 6.0, "{}"),
        (3, _h(3), 102, "a", 7.0, "{}"),
        (4, _h(1), 103, "b", 2.0, "{}"),
        (5, _h(2), 104, "b", 5.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def _by_key(rows, col):
    return {(r["event_type"], r["hour"].hour): r[col] for r in rows}


def test_gapfill_staircase(spark, tmp_path):
    rows = resample_gapfill(spark, _write_events(spark, tmp_path)).collect()
    assert len(rows) == 8  # 2 types x 4-hour global span, gaps explicit
    n = _by_key(rows, "n_events")
    assert n == {
        ("a", 0): 2, ("a", 1): 0, ("a", 2): 0, ("a", 3): 1,
        ("b", 0): 0, ("b", 1): 1, ("b", 2): 1, ("b", 3): 0,
    }
    hv = _by_key(rows, "hour_value")
    assert hv[("a", 0)] == 10.0  # multi-event hour sums, not picks
    assert hv[("a", 1)] is None  # gap cells stay NULL in the raw column
    filled = _by_key(rows, "filled_value")
    assert [filled[("a", h)] for h in range(4)] == [10.0, 10.0, 10.0, 7.0]
    # leading gap has no anchor; trailing gap carries the last value
    assert [filled[("b", h)] for h in range(4)] == [None, 2.0, 5.0, 5.0]


def test_interp_linear_interior_only(spark, tmp_path):
    rows = resample_interp_linear(spark, _write_events(spark, tmp_path)).collect()
    v = _by_key(rows, "interp_value")
    # 10.0 -> 7.0 across a 3-hour gap: exact thirds land on 9 and 8
    assert [v[("a", h)] for h in range(4)] == [10.0, 9.0, 8.0, 7.0]
    # boundary gaps stay NULL (nothing to anchor the line to)
    assert [v[("b", h)] for h in range(4)] == [None, 2.0, 5.0, None]


def test_grid_is_calendar_dense(spark, tmp_path):
    """Every (type, hour) cell of the global span appears exactly once."""
    out = resample_gapfill(spark, _write_events(spark, tmp_path))
    cells = [(r["event_type"], r["hour"]) for r in out.collect()]
    assert len(cells) == len(set(cells))
    hours = sorted({h for _, h in cells})
    deltas = {
        (b - a).total_seconds() for a, b in zip(hours, hours[1:])
    }
    assert deltas == {3600.0}


def test_decompose_identity_and_edges(spark):
    """Classical decomposition spec on the real fixture: where the
    centered window is complete, value == trend + seasonal + resid (up
    to float rounding); where it isn't (the first/last 12 hours per
    type), all three components are NULL together."""
    from go_cdc_spark.operators.timeseries import ts_decompose_hourly

    rows = ts_decompose_hourly(spark, "/root/testdata/sf0.001").collect()
    assert rows, "empty decomposition"
    full = [r for r in rows if r["trend"] is not None]
    assert full, "no complete windows on the fixture"
    for r in full[:500]:
        assert r["seasonal"] is not None and r["resid"] is not None
        recon = r["trend"] + r["seasonal"] + r["resid"]
        assert abs(recon - r["n_events"]) < 1e-9, r
    for r in rows:
        if r["trend"] is None:
            assert r["seasonal"] is None and r["resid"] is None


def test_forecast_recovers_exact_linear_series(spark, tmp_path):
    """On a pure integer-linear hourly series y = 2 + 3x the OLS trend
    fit is exact (rational arithmetic of exact integers), residual
    deviations are all zero, so the holdout forecast equals the actual
    EXACTLY — double-for-double, not approximately."""
    from go_cdc_spark.operators.timeseries import ts_forecast_hourly

    rows = []
    eid = 0
    for x in range(72):  # 48 train + 24 holdout hours
        y = 2 + 3 * x
        for _ in range(y):
            eid += 1
            rows.append(
                (eid, dt.datetime(2024, 1, 1) + dt.timedelta(hours=x, minutes=7),
                 eid, "a", 1.0, "{}")
            )
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = ts_forecast_hourly(spark, str(tmp_path)).collect()
    assert len(out) == 24  # one type x 24 holdout hours
    for r in out:
        assert r["forecast"] == float(r["actual"]), (r["hour"], r["forecast"], r["actual"])


def test_forecast_holdout_shape_and_sanity_on_fixture(spark):
    """Fixture holdout: 5 types x 24 hours, all forecasts finite, and
    the seasonal-trend forecast beats the naive train-mean baseline on
    aggregate absolute error (the 'is it a forecast at all' bar)."""
    import math

    from go_cdc_spark.operators.timeseries import ts_forecast_hourly

    out = ts_forecast_hourly(spark, "/root/testdata/sf0.001").collect()
    assert len(out) == 5 * 24
    assert all(r["forecast"] is not None and math.isfinite(r["forecast"]) for r in out)
    # naive baseline: global mean of actuals per type (computed from the
    # SAME holdout rows is even charitable to the baseline)
    by_type = {}
    for r in out:
        by_type.setdefault(r["event_type"], []).append(r)
    mae_fc, mae_naive = 0.0, 0.0
    for rows_t in by_type.values():
        mean_actual = sum(r["actual"] for r in rows_t) / len(rows_t)
        for r in rows_t:
            mae_fc += abs(r["forecast"] - r["actual"])
            mae_naive += abs(mean_actual - r["actual"])
    assert mae_fc <= mae_naive * 1.25  # at worst mildly worse than the oracle-mean


def _write_count_series(spark, tmp_path, counts):
    """events parquet whose hourly count series (single type 'a') is
    exactly `counts` (count c at hour x = c one-value events)."""
    rows, eid = [], 0
    for x, c in enumerate(counts):
        for _ in range(c):
            eid += 1
            rows.append(
                (eid, dt.datetime(2024, 3, 1) + dt.timedelta(hours=x, minutes=9),
                 eid, "a", 1.0, "{}")
            )
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_autocorr_detects_period_24(spark, tmp_path):
    """A pure period-24 square wave over 96 hours: acf(24) = 1 exactly
    (the series equals its own lag-24 shift), acf(12) = -1 (the
    anti-phase lag), acf(1) high-positive is NOT asserted (square wave
    edges)."""
    from go_cdc_spark.operators.timeseries import ts_autocorr_hourly

    counts = [(8 if (x % 24) < 12 else 2) for x in range(96)]
    out = ts_autocorr_hourly(spark, _write_count_series(spark, tmp_path, counts))
    acf = {r["lag"]: r["acf"] for r in out.collect()}
    assert acf[24] == 1.0
    assert acf[12] == -1.0


def test_autocorr_constant_series_is_null(spark, tmp_path):
    from go_cdc_spark.operators.timeseries import ts_autocorr_hourly

    out = ts_autocorr_hourly(spark, _write_count_series(spark, tmp_path, [5] * 30))
    assert all(r["acf"] is None for r in out.collect())


def test_changepoint_locates_level_shift(spark, tmp_path):
    """Level 2 for 30 hours then level 10 for 30 hours: the CUSUM
    magnitude peaks at the last pre-shift hour (hour 29), where the
    running deviation from the global mean (6) bottoms out at
    30*(2-6) = -120 -> peak_cusum 120, scaled by n=60 -> 7200."""
    from go_cdc_spark.operators.timeseries import ts_changepoint_hourly

    counts = [2] * 30 + [10] * 30
    out = ts_changepoint_hourly(
        spark, _write_count_series(spark, tmp_path, counts)
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["cp_hour"].hour == 5 and r["cp_hour"].day == 2  # hour index 29
    assert r["peak_scaled"] == 7200
    assert r["peak_cusum"] == 120.0


def test_seasonal_anomaly_flags_burst_in_its_slot_only(spark, tmp_path):
    """48 hours (two full days) of a clean period-24 profile — count 5
    at every hour-of-day — except ONE burst cell (hour 30 = 6am day 2,
    count 50). Every hour-of-day slot except 6am has zero variance →
    zscore NULL, is_anomaly 0; the 6am slot has two observations (5 and
    50), and with n=2 each point sits exactly 1/sqrt(2) std from the
    mean, so the burst is NOT |z|>2 either — but its z is the positive
    one. An 8-day series then puts n=8 per slot — enough for the burst
    to clear 2 sigma (the sample-std ceiling is |z| <= (n-1)/sqrt(n),
    so n=4 maxes at 1.5: a short history CANNOT 2-sigma-flag its own
    outlier, which is a property, not a bug) — and the flag fires
    exactly once, on the burst cell."""
    from go_cdc_spark.operators.timeseries import ts_anomaly_seasonal

    counts = [5] * 48
    counts[30] = 50  # 6am on day 2
    out = ts_anomaly_seasonal(spark, _write_count_series(spark, tmp_path, counts))
    rows = out.collect()
    assert len(rows) == 48
    by_hour = {i: r for i, r in enumerate(rows)}  # ordered by hour
    # zero-variance slots are guarded to NULL, never NaN/inf/flag
    for i, r in by_hour.items():
        if i % 24 != 6:
            assert r["zscore"] is None and r["is_anomaly"] == 0, (i, r)
    # n=2 slot: symmetric z = ±1/sqrt(2), below the 2-sigma flag
    assert abs(by_hour[6]["zscore"] + 0.7071067811865476) < 1e-12
    assert abs(by_hour[30]["zscore"] - 0.7071067811865476) < 1e-12
    assert by_hour[30]["is_anomaly"] == 0

    counts = [5] * 192  # 8 days
    counts[30] = 50
    rows = ts_anomaly_seasonal(
        spark, _write_count_series(spark, tmp_path, counts)
    ).collect()
    flagged = [r for r in rows if r["is_anomaly"] == 1]
    assert len(flagged) == 1
    assert flagged[0]["hour"].day == 2 and flagged[0]["hour"].hour == 6
    assert flagged[0]["n_events"] == 50 and flagged[0]["zscore"] > 2.0
    # the other seven 6am cells share the slot but sit below the mean,
    # unflagged (one outlier inflates the slot std, pulling peers in)
    six_am = [r for r in rows if r["hour"].hour == 6 and r["is_anomaly"] == 0]
    assert len(six_am) == 7 and all(r["zscore"] < 0 for r in six_am)
