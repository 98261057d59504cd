"""Time-series resampling over the event stream: dense hourly grids
with gap-filling (forward-fill and linear interpolation).

A CDC-replicated events table is irregular by nature — hours with no
events simply have no rows — while every downstream consumer of a
time series (anomaly scoring, forecasting, dashboard sparklines)
wants a DENSE, regular grid. These operators materialize that grid:

- ``resample_gapfill`` — hourly (event_type, hour) cells over the full
  observed span, zero-count gaps made explicit, and the last observed
  hourly value carried forward (the "staircase" fill used for
  state-like series).
- ``resample_interp_linear`` — the same grid with interior gaps
  linearly interpolated between the surrounding observations (the fill
  used for rate-like series); leading/trailing gaps stay NULL because
  there is nothing to anchor them to.

Scale shape (100 TB): the raw event scan is touched exactly once, by
one hash aggregation with map-side partials — everything after that
operates on the GRID, whose size is |event types| × |hours in span|
(bounded by calendar time, not data volume; a 3-year span is ~26k
hours per type). The grid build is a 1-row bounds aggregate exploded
through ``sequence()`` cross-joined with the distinct type list, the
grid⋈agg join broadcasts the aggregated side (row count ≤ grid cells
by construction), and the fill windows partition per event type over
calendar-bounded partitions. No window ever runs over raw events.

Cross-engine exactness: hourly values are decimal-accumulated sums
(order-independent) cast to double via the established VARCHAR-hop
pattern (operators/relational.py `dsum`); the interpolation formula is
the same IEEE double expression tree on both engines over identical
inputs, so results hash-match bit-exactly.

Parity note: derived analytic surface (SURVEY.md §2.B); the reference
(go-cdc) replicates the events table but has no analytic surface on it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..plans.registry import query
from ..tables import load
from .relational import DEC

def _w_back():
    """Forward-fill window: everything up to and including this hour.

    Built lazily — WindowSpec construction needs a live SparkContext,
    so it cannot run at module import.
    """
    return (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )


def _w_fwd():
    """Interpolation's look-ahead window: this hour onward."""
    return (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )


def _hour_secs(dense: DataFrame):
    """Epoch-seconds expression factory for a dense grid's ``hour``
    column, dispatching on the dtype the two grid producers emit:
    the batch grid's TIMESTAMP (instant — the long cast is
    tz-independent) and the maintained grid's TIMESTAMP_NTZ (wall
    clock — ntz forbids the long cast, and a session-zone cast would
    shift across DST; the calendar form unix_date·86400 + hour·3600
    is exact and tz-free for the hour-aligned grid)."""
    if dict(dense.dtypes).get("hour") == "timestamp_ntz":
        return lambda c: (
            F.unix_date(F.to_date(F.col(c))).cast("long") * 86400
            + F.hour(F.col(c)).cast("long") * 3600
        )
    return lambda c: F.col(c).cast("long")


def _dense_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, hour, n_events, hour_value) over the dense hourly grid.

    ``n_events`` is 0 for gap cells; ``hour_value`` is NULL there (the
    exact-decimal sum of ``value`` elsewhere). Shared by both resample
    queries.
    """
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        "value",
    )
    # ONE pass over the raw events; everything downstream is grid-sized.
    agg = ev.groupBy("event_type", "hour").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast(DEC)).cast("double").alias("hour_value"),
    )
    bounds = ev.agg(F.min("hour").alias("lo"), F.max("hour").alias("hi"))
    hours = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hour")
    )
    grid = ev.select("event_type").distinct().crossJoin(hours)
    # agg's row count ≤ grid cells (types × span hours) by construction
    # — INDEPENDENT of raw event volume, but NOT unconditionally small:
    # the bound is the grid itself, and a multi-year span × many event
    # types can push types×hours past the 8 GB broadcast / driver cap.
    # The hint is right for any grid that fits an executor (hourly
    # granularity: 100 types × 10 years ≈ 8.8M cells ≈ sub-GB); a
    # deployment beyond that should drop the hint — both join sides are
    # grid-sized, so AQE plans a plain shuffled join on (type, hour)
    # with no skew risk. Estimating span at build time would need an
    # action on the bounds row, which the bench honesty contract bans.
    return grid.join(F.broadcast(agg), ["event_type", "hour"], "left").select(
        "event_type",
        "hour",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        "hour_value",
    )


_GRID_SQL = f"""
ev AS (
  SELECT event_type, date_trunc('hour', ts) AS hour, value FROM events
),
agg AS (
  SELECT event_type, hour, COUNT(*) AS n_events,
         CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS hour_value
  FROM ev GROUP BY event_type, hour
),
b AS (SELECT MIN(hour) AS lo, MAX(hour) AS hi FROM ev),
hours AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM b
),
grid AS (
  SELECT t.event_type, h.hour
  FROM (SELECT DISTINCT event_type FROM ev) t CROSS JOIN hours h
),
dense AS (
  SELECT g.event_type, g.hour,
         COALESCE(a.n_events, 0) AS n_events,
         a.hour_value
  FROM grid g
  LEFT JOIN agg a ON g.event_type = a.event_type AND g.hour = a.hour
)
"""

_GAPFILL_ORACLE = f"""
WITH {_GRID_SQL}
SELECT event_type, hour, n_events, hour_value,
       last_value(hour_value IGNORE NULLS) OVER (
         PARTITION BY event_type ORDER BY hour
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
FROM dense
ORDER BY event_type, hour
"""


def gapfill_core(dense: DataFrame) -> DataFrame:
    """Staircase fill over ANY dense grid (batch or Engine.read_grid —
    maintained-grid parity pinned in tests/test_grid_ivm.py)."""
    return dense.select(
        "event_type",
        "hour",
        "n_events",
        "hour_value",
        F.last("hour_value", ignorenulls=True).over(_w_back()).alias("filled_value"),
    ).orderBy("event_type", "hour")


@query("resample_gapfill", oracle=_GAPFILL_ORACLE)
def resample_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly resample with explicit zero-count gaps and
    forward-filled values (staircase fill).
    """
    return gapfill_core(_dense_grid(spark, sf_dir))


# Linear interpolation: observed cells keep their value; interior gaps
# take prev + (next - prev) * elapsed/gap with hour distances as exact
# small-integer doubles (identical IEEE expression tree both engines).
_INTERP_ORACLE = f"""
WITH {_GRID_SQL},
anchored AS (
  SELECT event_type, hour, n_events, hour_value,
         last_value(hour_value IGNORE NULLS) OVER (
           PARTITION BY event_type ORDER BY hour
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
         last_value(CASE WHEN hour_value IS NOT NULL THEN hour END IGNORE NULLS)
           OVER (PARTITION BY event_type ORDER BY hour
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_h,
         first_value(hour_value IGNORE NULLS) OVER (
           PARTITION BY event_type ORDER BY hour
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
         first_value(CASE WHEN hour_value IS NOT NULL THEN hour END IGNORE NULLS)
           OVER (PARTITION BY event_type ORDER BY hour
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_h
  FROM dense
)
SELECT event_type, hour, n_events, hour_value,
       CASE
         WHEN hour_value IS NOT NULL THEN hour_value
         WHEN prev_v IS NOT NULL AND next_v IS NOT NULL THEN
           prev_v + (next_v - prev_v)
                  * (CAST(date_diff('hour', prev_h, hour) AS DOUBLE)
                     / CAST(date_diff('hour', prev_h, next_h) AS DOUBLE))
         ELSE NULL
       END AS interp_value
FROM anchored
ORDER BY event_type, hour
"""


def interp_core(dense: DataFrame) -> DataFrame:
    """Interior linear interpolation over ANY dense grid (hour-dtype
    tolerant via :func:`_hour_secs`; maintained-grid parity pinned in
    tests/test_grid_ivm.py)."""
    secs = _hour_secs(dense)
    obs_hour = F.when(F.col("hour_value").isNotNull(), F.col("hour"))
    anchored = dense.select(
        "event_type",
        "hour",
        "n_events",
        "hour_value",
        F.last("hour_value", ignorenulls=True).over(_w_back()).alias("prev_v"),
        F.last(obs_hour, ignorenulls=True).over(_w_back()).alias("prev_h"),
        F.first("hour_value", ignorenulls=True).over(_w_fwd()).alias("next_v"),
        F.first(obs_hour, ignorenulls=True).over(_w_fwd()).alias("next_h"),
    )
    # Hour distances: exact small integers in double; the divide/multiply/
    # add tree is written in the same shape as the oracle so both engines
    # execute the identical IEEE operation sequence.
    elapsed = (secs("hour") - secs("prev_h")).cast("double") / F.lit(3600.0)
    gap = (secs("next_h") - secs("prev_h")).cast("double") / F.lit(3600.0)
    interp = F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * (elapsed / gap)
    return anchored.select(
        "event_type",
        "hour",
        "n_events",
        "hour_value",
        F.when(F.col("hour_value").isNotNull(), F.col("hour_value"))
        .when(F.col("prev_v").isNotNull() & F.col("next_v").isNotNull(), interp)
        .alias("interp_value"),
    ).orderBy("event_type", "hour")


@query("resample_interp_linear", oracle=_INTERP_ORACLE)
def resample_interp_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly resample with interior gaps linearly interpolated
    between the surrounding observations; boundary gaps stay NULL.
    """
    return interp_core(_dense_grid(spark, sf_dir))


# ---------------------------------------------------------------------------
# Classical additive decomposition: value = trend + seasonal + residual
# over the dense hourly count series — the third consumer of the grid.
# ---------------------------------------------------------------------------

_MA_HALF = 12  # centered 25-hour moving average (diurnal-ish smoothing)
_MA_N = 2 * _MA_HALF + 1

_DECOMP_ORACLE = f"""
WITH {_GRID_SQL},
t AS (
  SELECT event_type, hour, n_events,
         SUM(n_events) OVER w25 AS t_sum,
         COUNT(*) OVER w25 AS t_cnt
  FROM dense
  WINDOW w25 AS (PARTITION BY event_type ORDER BY hour
                 ROWS BETWEEN {_MA_HALF} PRECEDING AND {_MA_HALF} FOLLOWING)
),
d AS (
  SELECT event_type, hour, n_events,
         CASE WHEN t_cnt = {_MA_N} THEN n_events * {_MA_N} - t_sum END AS dts,
         CASE WHEN t_cnt = {_MA_N} THEN t_sum END AS t_sum_full
  FROM t
),
s AS (
  SELECT event_type, hour(hour) AS hod,
         SUM(dts) AS s_sum, COUNT(dts) AS s_cnt
  FROM d GROUP BY 1, 2
)
SELECT d.event_type, d.hour, CAST(d.n_events AS BIGINT) AS n_events,
       CAST(d.t_sum_full AS DOUBLE) / {float(_MA_N)} AS trend,
       CASE WHEN d.dts IS NOT NULL THEN
         CAST(s.s_sum AS DOUBLE) / ({float(_MA_N)} * CAST(s.s_cnt AS DOUBLE))
       END AS seasonal,
       CASE WHEN d.dts IS NOT NULL THEN
         CAST(d.dts AS DOUBLE) / {float(_MA_N)}
         - CAST(s.s_sum AS DOUBLE) / ({float(_MA_N)} * CAST(s.s_cnt AS DOUBLE))
       END AS resid
FROM d JOIN s ON s.event_type = d.event_type AND s.hod = hour(d.hour)
"""


@query("ts_decompose_hourly", oracle=_DECOMP_ORACLE)
def ts_decompose_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive decomposition of the hourly event-count
    series: value = trend + seasonal + residual, per event type —
    trend from a centered {_MA_N}-hour moving average (NULL where the
    window is incomplete, the honest edge), seasonal as the
    hour-of-day mean of the detrended series, residual the remainder.

    Cross-engine exactness: the whole core is INTEGER-EXACT until the
    final divisions — the detrended series is kept scaled by {_MA_N}
    (``n·{_MA_N} − window_sum``, exact BIGINTs), the seasonal bucket
    folds those exact integers, and only the output converts: two
    correctly-rounded divisions and one subtraction, the identical
    IEEE sequence on both engines. Averaging DOUBLES per bucket
    instead would be summation-order-dependent and hash-unstable.

    Scale shape: one raw-event aggregation (the shared dense grid),
    then windows over calendar-bounded per-type partitions and one
    (type, hour-of-day)-keyed aggregate — nothing after the grid
    scales with data volume. The decomposition is the standard
    pre-stage for anomaly scoring on seasonal series (score the
    RESIDUAL, not the raw count — anomaly_zscore's docstring trade)."""
    return decompose_core(
        _dense_grid(spark, sf_dir).select("event_type", "hour", "n_events")
    )


def decompose_core(dense: DataFrame) -> DataFrame:
    """Additive decomposition over ANY dense grid (batch or
    Engine.read_grid — maintained-grid parity in tests/test_grid_ivm);
    numeric policy documented on :func:`ts_decompose_hourly`."""
    w25 = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(-_MA_HALF, _MA_HALF)
    )
    t = dense.select(
        "event_type",
        "hour",
        "n_events",
        F.sum("n_events").over(w25).alias("t_sum"),
        F.count(F.lit(1)).over(w25).alias("t_cnt"),
    )
    full = F.col("t_cnt") == _MA_N
    d = t.select(
        "event_type",
        "hour",
        "n_events",
        F.when(full, F.col("n_events") * _MA_N - F.col("t_sum")).alias("dts"),
        F.when(full, F.col("t_sum")).alias("t_sum_full"),
    )
    # seasonal buckets derive FROM d — alias both sides so the lineage
    # self-join resolves unambiguously
    s = (
        d.groupBy(
            F.col("event_type").alias("s_type"), F.hour("hour").alias("hod")
        )
        .agg(F.sum("dts").alias("s_sum"), F.count("dts").alias("s_cnt"))
    )
    seasonal = F.col("s_sum").cast("double") / (
        F.lit(float(_MA_N)) * F.col("s_cnt").cast("double")
    )
    return d.join(
        s,
        (F.col("event_type") == F.col("s_type")) & (F.hour("hour") == F.col("hod")),
    ).select(
        "event_type",
        "hour",
        F.col("n_events").cast("long").alias("n_events"),
        (F.col("t_sum_full").cast("double") / F.lit(float(_MA_N))).alias("trend"),
        F.when(F.col("dts").isNotNull(), seasonal).alias("seasonal"),
        F.when(
            F.col("dts").isNotNull(),
            F.col("dts").cast("double") / F.lit(float(_MA_N)) - seasonal,
        ).alias("resid"),
    )


# ---------------------------------------------------------------------------
# Forecasting over the dense hourly grid: trend + hour-of-day seasonal
# projection with the grid's last day held out — the fourth consumer of
# the grid, and the natural next step after decomposition (VERDICT r9
# prescription #5).
# ---------------------------------------------------------------------------

_FC_H = 24  # holdout/forecast horizon: the grid's last day

_FC_DEC = "DECIMAL(38,0)"

_FORECAST_ORACLE = f"""
WITH {_GRID_SQL},
b2 AS (SELECT MIN(hour) AS lo, MAX(hour) AS hi FROM dense),
g AS (
  SELECT event_type, dense.hour, n_events,
         CAST(date_diff('hour', b2.lo, dense.hour) AS BIGINT) AS x,
         CAST(date_diff('hour', b2.lo, b2.hi) AS BIGINT) AS xmax
  FROM dense CROSS JOIN b2
),
tr AS (
  SELECT event_type, hour, n_events, x, xmax,
         2 * x - (xmax - {_FC_H}) AS u
  FROM g WHERE x <= xmax - {_FC_H}
),
fit AS (
  SELECT event_type,
         CAST(COUNT(*) AS {_FC_DEC}) AS fn,
         CAST(SUM(n_events) AS {_FC_DEC}) AS sy,
         CAST(SUM(u * n_events) AS {_FC_DEC}) AS suy,
         CAST(SUM(u * u) AS {_FC_DEC}) AS suu
  FROM tr GROUP BY event_type
),
dev AS (
  SELECT tr.event_type, hour(tr.hour) AS hod,
         SUM(f.fn * f.suu * CAST(tr.n_events AS {_FC_DEC})
             - f.suu * f.sy
             - f.fn * f.suy * CAST(tr.u AS {_FC_DEC})) AS dsum,
         CAST(COUNT(*) AS {_FC_DEC}) AS dcnt
  FROM tr JOIN fit f USING (event_type)
  GROUP BY 1, 2
)
SELECT g.event_type, g.hour, CAST(g.n_events AS BIGINT) AS actual,
       CAST(f.suu * f.sy
            + f.fn * f.suy * CAST(2 * g.x - (g.xmax - {_FC_H}) AS {_FC_DEC})
            AS DOUBLE)
         / CAST(f.fn * f.suu AS DOUBLE)
       + CAST(d.dsum AS DOUBLE)
         / CAST(d.dcnt * f.fn * f.suu AS DOUBLE) AS forecast
FROM g
JOIN fit f USING (event_type)
JOIN dev d ON d.event_type = g.event_type AND d.hod = hour(g.hour)
WHERE g.x > g.xmax - {_FC_H}
ORDER BY event_type, hour
"""


def forecast_core(dense: DataFrame) -> DataFrame:
    """The forecast fit/seasonal/holdout pipeline over ANY dense grid
    ``(event_type, hour, n_events)`` — the df-level core shared by the
    registered :func:`ts_forecast_hourly` (recomputed grid) and the
    engine's MAINTAINED-grid read path (``Engine.read_grid`` →
    ``IncrementalGrid`` state → this core), proven output-equal over
    random change interleavings in tests/test_grid_ivm.py. Numeric
    policy and scale shape documented on :func:`ts_forecast_hourly`.
    Hour-dtype tolerant via :func:`_hour_secs` (batch grid TIMESTAMP /
    maintained grid TIMESTAMP_NTZ)."""
    secs = _hour_secs(dense)
    b2 = dense.agg(F.min("hour").alias("lo"), F.max("hour").alias("hi"))
    hours_of = lambda a, b: (  # noqa: E731 — local expression alias
        (secs(a) - secs(b)) / F.lit(3600)
    ).cast("long")
    g = dense.crossJoin(F.broadcast(b2)).select(
        "event_type",
        "hour",
        "n_events",
        hours_of("hour", "lo").alias("x"),
        hours_of("hi", "lo").alias("xmax"),
    )
    dec = _FC_DEC.lower()
    tr = g.filter(F.col("x") <= F.col("xmax") - _FC_H).withColumn(
        "u", F.lit(2) * F.col("x") - (F.col("xmax") - F.lit(_FC_H))
    )
    fit = tr.groupBy("event_type").agg(
        F.count(F.lit(1)).cast(dec).alias("fn"),
        F.sum("n_events").cast(dec).alias("sy"),
        F.sum(F.col("u") * F.col("n_events")).cast(dec).alias("suy"),
        F.sum(F.col("u") * F.col("u")).cast(dec).alias("suu"),
    )
    dev = (
        tr.join(F.broadcast(fit), "event_type")
        .groupBy("event_type", F.hour("hour").alias("hod"))
        .agg(
            F.sum(
                F.col("fn") * F.col("suu") * F.col("n_events").cast(dec)
                - F.col("suu") * F.col("sy")
                - F.col("fn") * F.col("suy") * F.col("u").cast(dec)
            ).alias("dsum"),
            F.count(F.lit(1)).cast(dec).alias("dcnt"),
        )
        .select(
            F.col("event_type").alias("d_type"), "hod", "dsum", "dcnt"
        )
    )
    ho = g.filter(F.col("x") > F.col("xmax") - _FC_H)
    level = (
        F.col("suu") * F.col("sy")
        + F.col("fn")
        * F.col("suy")
        * (F.lit(2) * F.col("x") - (F.col("xmax") - F.lit(_FC_H))).cast(dec)
    ).cast("double") / (F.col("fn") * F.col("suu")).cast("double")
    seasonal = F.col("dsum").cast("double") / (
        F.col("dcnt") * F.col("fn") * F.col("suu")
    ).cast("double")
    return (
        ho.join(F.broadcast(fit), "event_type")
        .join(
            F.broadcast(dev),
            (F.col("event_type") == F.col("d_type"))
            & (F.hour("hour") == F.col("hod")),
        )
        .select(
            "event_type",
            "hour",
            F.col("n_events").cast("long").alias("actual"),
            (level + seasonal).alias("forecast"),
        )
        .orderBy("event_type", "hour")
    )


@query("ts_forecast_hourly", oracle=_FORECAST_ORACLE)
def ts_forecast_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly event-count forecast for the grid's last {_FC_H} hours
    (held out), per event type: OLS linear trend fitted on the train
    span plus an hour-of-day seasonal index from the trend residuals —
    seasonal-naive-with-trend, the closed-form sibling of Holt-Winters
    additive (whose per-step recursion has no bounded-depth
    SQL/DataFrame form; the closed form IS the fixpoint for constant
    smoothing of a linear+seasonal series). Output carries the held-out
    ``actual`` next to ``forecast``, so the holdout error is one
    subtraction away for any consumer.

    Cross-engine exactness (the ts_decompose_hourly discipline, taken
    through a regression fit): with u = 2x − (T−1) (integer, Σu = 0 by
    construction), slope and intercept stay RATIONAL — numerators and
    denominators are exact DECIMAL(38,0) sums of integers, residual
    deviations are kept scaled by n·Σu² (exact), the seasonal bucket
    folds those exact integers, and only the output converts: two
    correctly-rounded double divisions and one addition, the identical
    IEEE sequence on both engines. 38-digit headroom: the largest
    scaled term is n²·Σu²·y ≈ (4/3)n⁵·y — a 10-year hourly span at
    y=10⁶ events/hour is ~10³¹ < 10³⁸.

    Scale shape: one raw-event aggregation (the shared dense grid);
    the fit is one (type)-keyed aggregate, the seasonal index one
    (type, hour-of-day)-keyed aggregate — both map-side-combined over
    calendar-bounded input — and the forecast join broadcasts the
    |types|-row fit and |types|×24-row seasonal tables. Nothing after
    the grid scales with data volume."""
    return forecast_core(
        _dense_grid(spark, sf_dir).select("event_type", "hour", "n_events")
    )


# ---------------------------------------------------------------------------
# Autocorrelation function over the hourly grid: the seasonality
# DETECTOR that justifies the decomposition/forecast family's
# hour-of-day period choice — ACF at the diurnal lags, per event type.
# ---------------------------------------------------------------------------

_ACF_LAGS = (1, 2, 3, 6, 12, 24)

_ACF_ORACLE = f"""
WITH {_GRID_SQL},
led AS (
  SELECT event_type, n_events,
         {", ".join(f"LEAD(n_events, {k}) OVER (PARTITION BY event_type ORDER BY hour) AS b{k}" for k in _ACF_LAGS)}
  FROM dense
),
pairs AS (
  {" UNION ALL ".join(f"SELECT event_type, CAST({k} AS INT) AS lag, n_events AS a, b{k} AS b FROM led WHERE b{k} IS NOT NULL" for k in _ACF_LAGS)}
),
acfagg AS (
  SELECT event_type, lag,
         CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(SUM(a) AS BIGINT) AS sa, CAST(SUM(b) AS BIGINT) AS sb,
         CAST(SUM(a * b) AS BIGINT) AS sab,
         CAST(SUM(a * a) AS BIGINT) AS saa, CAST(SUM(b * b) AS BIGINT) AS sbb
  FROM pairs GROUP BY event_type, lag
)
SELECT event_type, lag, n_pairs,
       CASE WHEN (n_pairs * saa - sa * sa) > 0 AND (n_pairs * sbb - sb * sb) > 0
            THEN CAST(n_pairs * sab - sa * sb AS DOUBLE)
                 / sqrt(CAST(n_pairs * saa - sa * sa AS DOUBLE)
                        * CAST(n_pairs * sbb - sb * sb AS DOUBLE))
       END AS acf
FROM acfagg
ORDER BY event_type, lag
"""


@query("ts_autocorr_hourly", oracle=_ACF_ORACLE)
def ts_autocorr_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson autocorrelation of the hourly count series at the
    diurnal lags {_ACF_LAGS}, per event type — the seasonality
    detector that justifies the decomposition/forecast family's
    hour-of-day period (a strong lag-24 peak = daily cycle).

    Cross-engine exactness: all six sufficient statistics are exact
    BIGINT sums over integer pairs; the correlation converts once —
    one double division by one sqrt of a product of exact-integer
    doubles. IEEE-754 requires sqrt correctly rounded (unlike ln/log,
    which drift a ulp between libms — the verify-notes rule), so the
    expression tree is deterministic on both engines. Constant series
    (zero variance) yield NULL on both.

    Scale shape: one raw-event aggregation (the shared grid), ONE
    window sort per type computing all {len(_ACF_LAGS)} leads, a
    map-side stack, and one (type, lag)-keyed aggregate with partials
    — nothing after the grid scales with data volume."""
    return autocorr_core(
        _dense_grid(spark, sf_dir).select("event_type", "hour", "n_events")
    )


def autocorr_core(dense: DataFrame) -> DataFrame:
    """ACF over ANY dense grid (batch or Engine.read_grid); numeric
    policy on :func:`ts_autocorr_hourly`."""
    w = Window.partitionBy("event_type").orderBy("hour")
    led = dense.select(
        "event_type",
        "n_events",
        *[F.lead("n_events", k).over(w).alias(f"b{k}") for k in _ACF_LAGS],
    )
    stack_expr = "stack({n}, {args}) AS (lag, b)".format(
        n=len(_ACF_LAGS),
        args=", ".join(f"CAST({k} AS INT), b{k}" for k in _ACF_LAGS),
    )
    pairs = led.selectExpr("event_type", "n_events AS a", stack_expr).filter(
        F.col("b").isNotNull()
    )
    agg = pairs.groupBy("event_type", "lag").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("a").cast("long").alias("sa"),
        F.sum("b").cast("long").alias("sb"),
        F.sum(F.col("a") * F.col("b")).cast("long").alias("sab"),
        F.sum(F.col("a") * F.col("a")).cast("long").alias("saa"),
        F.sum(F.col("b") * F.col("b")).cast("long").alias("sbb"),
    )
    va = F.col("n_pairs") * F.col("saa") - F.col("sa") * F.col("sa")
    vb = F.col("n_pairs") * F.col("sbb") - F.col("sb") * F.col("sb")
    num = F.col("n_pairs") * F.col("sab") - F.col("sa") * F.col("sb")
    acf = F.when(
        (va > 0) & (vb > 0),
        num.cast("double") / F.sqrt(va.cast("double") * vb.cast("double")),
    )
    return agg.select(
        "event_type", "lag", "n_pairs", acf.alias("acf")
    ).orderBy("event_type", "lag")


# ---------------------------------------------------------------------------
# Changepoint detection: CUSUM peak over the hourly grid — where each
# type's level shifted, as the max |cumulative deviation from mean|.
# ---------------------------------------------------------------------------

_CUSUM_ORACLE = f"""
WITH {_GRID_SQL},
tot AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(n_events) AS BIGINT) AS sy
  FROM dense GROUP BY event_type
),
cum AS (
  SELECT d.event_type, d.hour,
         SUM(CAST(d.n_events AS BIGINT) * t.n - t.sy)
             OVER (PARTITION BY d.event_type ORDER BY d.hour
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s,
         t.n, t.sy
  FROM dense d JOIN tot t USING (event_type)
),
peak AS (
  SELECT event_type, hour, s, n, sy,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY abs(s) DESC, hour) AS rn
  FROM cum
)
SELECT event_type, hour AS cp_hour, CAST(abs(s) AS BIGINT) AS peak_scaled,
       CAST(abs(s) AS DOUBLE) / CAST(n AS DOUBLE) AS peak_cusum
FROM peak WHERE rn = 1
ORDER BY event_type
"""


@query("ts_changepoint_hourly", oracle=_CUSUM_ORACLE)
def ts_changepoint_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint per event type over the hourly count grid:
    the hour where the running cumulative deviation from the series
    mean peaks in magnitude — the classical level-shift locator (Page
    1954; the peak of S_x = Σ_{{i<=x}} (y_i − ȳ) marks where the mean
    changed, and its height is the shift evidence).

    Cross-engine exactness: deviations are kept scaled by n
    (``y_i·n − Σy`` — exact BIGINTs, the ts_decompose discipline), the
    running sum is an exact integer window fold, and the argmax order
    (|S| DESC, hour) is total, so the selected row is deterministic;
    ``peak_cusum`` unscales with ONE double division at the end.

    Scale shape: one raw-event aggregation (the shared grid), a
    |types|-row total, one cumulative window per calendar-bounded type
    partition, and a WindowGroupLimit-prunable top-1 — nothing after
    the grid scales with data volume."""
    return changepoint_core(
        _dense_grid(spark, sf_dir).select("event_type", "hour", "n_events")
    )


def changepoint_core(dense: DataFrame) -> DataFrame:
    """CUSUM peak locator over ANY dense grid (batch or
    Engine.read_grid); numeric policy on :func:`ts_changepoint_hourly`."""
    tot = dense.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("n_events").cast("long").alias("sy"),
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = dense.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "hour",
        F.sum(F.col("n_events").cast("long") * F.col("n") - F.col("sy"))
        .over(wcum)
        .alias("s"),
        "n",
    )
    wpk = Window.partitionBy("event_type").orderBy(
        F.desc(F.abs(F.col("s"))), F.asc("hour")
    )
    return (
        cum.withColumn("rn", F.row_number().over(wpk))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("hour").alias("cp_hour"),
            F.abs(F.col("s")).cast("long").alias("peak_scaled"),
            (F.abs(F.col("s")).cast("double") / F.col("n").cast("double")).alias(
                "peak_cusum"
            ),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Incrementally-maintained grid (VERDICT r10 #5): the batch fold twin of
# streaming/ivm.py::IncrementalGrid — the whole time-series family's
# 100 TB shape is to read a MAINTAINED (event_type, hour) grid instead
# of rescanning raw events; this registers that maintenance as an
# oracle-checked query.
# ---------------------------------------------------------------------------


def incremental_grid(
    snapshot: DataFrame,
    changes: DataFrame,
    keys: list[str],
    pos_threshold: str | None = None,
    type_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Signed-delta maintenance of the SPARSE hourly grid from typed
    change rows (op/pos + the event columns), the fully-foldable IVM
    algebra: the cell key (type, date_trunc hour) derives from the row,
    so retraction is exact — no dirty-repair. Returns
    (type, hour, n_events, n_vals, sum_val) cells with the identity
    cells compacted away; densify with :func:`densify_grid`.

    Per-batch cost O(changes + touched cells); the base event volume is
    touched once for its own grid aggregate and by one key semi-join
    (changed keys), never rescanned per batch."""
    from .cdc import cdc_collapse

    if pos_threshold is not None:
        changes = changes.filter(F.col("pos") > F.lit(pos_threshold))
    latest = cdc_collapse(changes, keys, keep_deletes=True)
    changed_keys = latest.select(*keys)

    def cells(df: DataFrame, sign: int) -> DataFrame:
        return df.select(
            type_col,
            F.date_trunc("hour", F.col(ts_col)).alias("hour"),
            F.col(value_col).cast(DEC).alias("__v"),
            F.lit(sign).alias("__sign"),
        )

    removed = cells(snapshot.join(changed_keys, on=keys, how="left_semi"), -1)
    added = cells(latest.filter(F.col("op") != "delete"), 1)
    base = cells(snapshot, 1)

    return (
        base.unionByName(removed)
        .unionByName(added)
        .groupBy(type_col, "hour")
        .agg(
            F.sum("__sign").cast("long").alias("n_events"),
            F.sum(
                F.when(F.col("__v").isNotNull(), F.col("__sign")).otherwise(0)
            ).cast("long").alias("n_vals"),
            F.sum(F.col("__sign") * F.col("__v")).cast(DEC).alias("sum_val"),
        )
        .filter(
            ~(
                (F.col("n_events") == 0)
                & (F.col("n_vals") == 0)
                & (F.coalesce(F.col("sum_val"), F.lit(0)) == 0)
            )
        )
    )


def densify_grid(state: DataFrame, type_col: str = "event_type") -> DataFrame:
    """Sparse maintained cells → the dense grid surface of
    :func:`_dense_grid` (zero-count gaps, NULL hour_value there);
    bounds and the type universe come from visible (n_events > 0)
    cells, so a fully retracted edge hour shrinks the grid exactly
    like a batch recompute."""
    vis = state.filter(F.col("n_events") > 0)
    bounds = vis.agg(F.min("hour").alias("lo"), F.max("hour").alias("hi"))
    hours = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hour")
    )
    grid = vis.select(type_col).distinct().crossJoin(hours)
    agg = vis.select(
        type_col,
        "hour",
        "n_events",
        F.when(F.col("n_vals") > 0, F.col("sum_val").cast("double")).alias(
            "hour_value"
        ),
    )
    return grid.join(F.broadcast(agg), [type_col, "hour"], "left").select(
        type_col,
        "hour",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        "hour_value",
    )


# base = events the snapshot carried; late inserts arrive for every
# id%10==0 event; retractions delete the base rows with id%7==3 — the
# final universe the oracle recomputes over is the closed form below.
_GRID_IVM_ORACLE = """
WITH ev AS (
  SELECT event_type, date_trunc('hour', ts) AS hour, value FROM events
  WHERE (event_id % 10 = 0) OR (event_id % 7 <> 3)
),
agg AS (
  SELECT event_type, hour, COUNT(*) AS n_events,
         CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS hour_value
  FROM ev GROUP BY event_type, hour
),
b AS (SELECT MIN(hour) AS lo, MAX(hour) AS hi FROM ev),
hours AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM b
),
grid AS (
  SELECT t.event_type, h.hour
  FROM (SELECT DISTINCT event_type FROM ev) t CROSS JOIN hours h
)
SELECT g.event_type, g.hour,
       CAST(COALESCE(a.n_events, 0) AS BIGINT) AS n_events,
       a.hour_value
FROM grid g
LEFT JOIN agg a ON g.event_type = a.event_type AND g.hour = a.hour
ORDER BY g.event_type, g.hour
"""


@query("cdc_incremental_grid", oracle=_GRID_IVM_ORACLE)
def cdc_incremental_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The maintained hourly grid (:func:`incremental_grid`) proven
    equal to a full recompute: the snapshot carries 90% of events
    (id%10≠0), the change stream late-inserts the other 10% AND
    retracts every base row with id%7==3 (both fold directions fire),
    and the read densifies the surviving cells. The oracle recomputes
    the dense grid over the closed-form final universe. Streaming twin:
    streaming/ivm.py::IncrementalGrid (same fold algebra per
    micro-batch, parity-tested over random interleavings incl.
    retractions in tests/test_grid_ivm.py)."""
    ev = load(spark, sf_dir, "events").select(
        "event_id", "event_type", "ts", "value"
    )
    snapshot = ev.filter(F.col("event_id") % 10 != 0)
    inserts = ev.filter(F.col("event_id") % 10 == 0).select(
        "*", F.lit("insert").alias("op"), F.lit("000000000002").alias("pos")
    )
    deletes = ev.filter(
        (F.col("event_id") % 10 != 0) & (F.col("event_id") % 7 == 3)
    ).select("*", F.lit("delete").alias("op"), F.lit("000000000002").alias("pos"))
    state = incremental_grid(
        snapshot,
        inserts.unionByName(deletes),
        keys=["event_id"],
        pos_threshold="000000000001",
        # densify reads the sparse state three times (type universe,
        # calendar bounds, join side) — pin the fold once, lazily (the
        # bench honesty contract: no eager work at build time)
    ).localCheckpoint(eager=False)
    return densify_grid(state).orderBy("event_type", "hour")


_SEASONAL_ANOMALY_ORACLE = """
WITH ev AS (
  SELECT event_type, date_trunc('hour', ts) AS hour, value FROM events
),
agg AS (
  SELECT event_type, hour, COUNT(*) AS n_events
  FROM ev GROUP BY event_type, hour
),
b AS (SELECT MIN(hour) AS lo, MAX(hour) AS hi FROM ev),
hours AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM b
),
grid AS (
  SELECT t.event_type, h.hour
  FROM (SELECT DISTINCT event_type FROM ev) t CROSS JOIN hours h
),
dense AS (
  SELECT g.event_type, g.hour, CAST(COALESCE(a.n_events, 0) AS BIGINT) AS n_events
  FROM grid g LEFT JOIN agg a ON g.event_type = a.event_type AND g.hour = a.hour
),
seas AS (
  SELECT event_type, hour, n_events,
         CAST(EXTRACT(HOUR FROM hour) AS INT) AS hod
  FROM dense
),
stats AS (
  SELECT event_type, hour, n_events, hod,
         CAST(n_events AS DOUBLE) AS x,
         CAST(CAST(SUM(n_events) OVER (PARTITION BY event_type, hod)
                   AS VARCHAR) AS DOUBLE) AS s,
         CAST(CAST(SUM(CAST(n_events AS DECIMAL(19,0)) * CAST(n_events AS DECIMAL(19,0)))
                   OVER (PARTITION BY event_type, hod) AS VARCHAR) AS DOUBLE) AS s2,
         COUNT(*) OVER (PARTITION BY event_type, hod) AS n
  FROM seas
)
SELECT event_type, hour, n_events, hod,
       CASE WHEN n > 1 AND (s2 - (s / n) * s) > 0.0
            THEN (x - s / n) / sqrt((s2 - (s / n) * s) / (n - 1)) END AS zscore,
       CASE WHEN n > 1 AND (s2 - (s / n) * s) > 0.0
                 AND abs((x - s / n) / sqrt((s2 - (s / n) * s) / (n - 1))) > 2.0
            THEN 1 ELSE 0 END AS is_anomaly
FROM stats
ORDER BY event_type, hour
"""


@query("ts_anomaly_seasonal", oracle=_SEASONAL_ANOMALY_ORACLE)
def ts_anomaly_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal anomaly detection over the dense hourly grid — the
    detection consumer of the maintained-grid family (resample →
    decompose → forecast → ACF → changepoint → ANOMALY): per
    (event_type, hour-of-day), flag grid cells whose event count sits
    more than 2 sample standard deviations from that seasonal slot's
    mean. A burst at 3am flags even when it would be normal at noon —
    the reason the profile is per-slot, not per-type.

    Float parity (the anomaly_zscore discipline, behavior.py): counts
    are exact BIGINTs; the squared sum runs DECIMAL(19,0)×DECIMAL(19,0)
    (exact integer arithmetic both engines — at 100 TB cell counts the
    square exceeds BIGINT, hence decimal); both window sums reach
    double THROUGH A STRING (correctly-rounded parsing everywhere,
    where DuckDB's direct HUGEINT→double path double-rounds past 2^53);
    the z-score is then the same IEEE expression tree over identical
    scalars, and sqrt is correctly rounded in both engines. All-equal
    slots (e.g. all-zero gap rows) are guarded to NULL on both sides —
    double 0/0 is engine-defined, so it never reaches the output.

    Scale shape: one raw-event aggregation builds the grid; the
    seasonal window partitions by (type, hour-of-day) over
    calendar-bounded cells — O(grid), never O(events)."""
    return anomaly_seasonal_core(
        _dense_grid(spark, sf_dir).select("event_type", "hour", "n_events")
    )


def anomaly_seasonal_core(dense: DataFrame) -> DataFrame:
    """Per-(type, hour-of-day) z-score anomalies over ANY dense grid
    (batch or Engine.read_grid); numeric policy on
    :func:`ts_anomaly_seasonal`."""
    seas = dense.withColumn("hod", F.hour("hour").cast("int"))
    w = Window.partitionBy("event_type", "hod")
    nd = F.col("n_events").cast("decimal(19,0)")
    stats = seas.select(
        "event_type",
        "hour",
        "n_events",
        "hod",
        F.col("n_events").cast("double").alias("x"),
        F.sum("n_events").over(w).cast("string").cast("double").alias("s"),
        F.sum(nd * nd).over(w).cast("string").cast("double").alias("s2"),
        F.count("*").over(w).alias("n"),
    )
    mean = F.col("s") / F.col("n")
    var_num = F.col("s2") - mean * F.col("s")
    z = (F.col("x") - mean) / F.sqrt(var_num / (F.col("n") - 1))
    guard = (F.col("n") > 1) & (var_num > 0.0)
    return stats.select(
        "event_type",
        "hour",
        "n_events",
        "hod",
        F.when(guard, z).alias("zscore"),
        F.when(guard & (F.abs(z) > 2.0), F.lit(1)).otherwise(F.lit(0)).alias("is_anomaly"),
    ).orderBy("event_type", "hour")


# ---------------------------------------------------------------------------
# Cross-correlation between event-type series: which types LEAD which
# (e.g. "view" spikes precede "purchase" spikes by k hours) — the
# cross-series sibling of ts_autocorr_hourly, and another consumer of
# the shared dense grid / the engine's MAINTAINED grid (read_grid).
# ---------------------------------------------------------------------------

_CCF_LAGS = (0, 1, 2, 6, 24)

_CCF_ORACLE = f"""
WITH {_GRID_SQL},
led AS (
  SELECT event_type, hour, n_events,
         {", ".join(f"LEAD(n_events, {k}) OVER (PARTITION BY event_type ORDER BY hour) AS b{k}" for k in _CCF_LAGS)}
  FROM dense
),
pairs AS (
  {" UNION ALL ".join(
      f"SELECT a.event_type AS type_a, l.event_type AS type_b, CAST({k} AS INT) AS lag, "
      f"a.n_events AS x, l.b{k} AS y "
      "FROM dense a JOIN led l ON a.hour = l.hour AND a.event_type <> l.event_type "
      f"WHERE l.b{k} IS NOT NULL"
      for k in _CCF_LAGS)}
),
ccfagg AS (
  SELECT type_a, type_b, lag,
         CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx, CAST(SUM(y * y) AS BIGINT) AS syy
  FROM pairs GROUP BY type_a, type_b, lag
)
SELECT type_a, type_b, lag, n_pairs,
       CASE WHEN (n_pairs * sxx - sx * sx) > 0 AND (n_pairs * syy - sy * sy) > 0
            THEN CAST(n_pairs * sxy - sx * sy AS DOUBLE)
                 / sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE)
                        * CAST(n_pairs * syy - sy * sy AS DOUBLE))
       END AS ccf
FROM ccfagg
ORDER BY type_a, type_b, lag
"""


def crosscorr_core(dense: DataFrame) -> DataFrame:
    """Pearson cross-correlation corr(a[h], b[h+k]) for every ORDERED
    pair of distinct event types at lags {_CCF_LAGS}, over any dense
    grid (event_type, hour, n_events) — batch-grid and maintained-grid
    (Engine.read_grid) consumers share this core; parity pinned in
    tests/test_grid_ivm.py.

    Ordered pairs (both (a,b) and (b,a)) because CCF is direction-
    sensitive: corr(view[h], purchase[h+2]) high = views LEAD
    purchases by 2 hours; the transpose reads the opposite lead.

    Exactness: the ts_autocorr_hourly discipline — six exact BIGINT
    sufficient statistics, one double division by one correctly-rounded
    sqrt at the output edge; zero-variance windows yield NULL on both
    engines.

    Scale shape: ONE window sort per type computes every lag's lead
    column; the type-pair expansion joins grid-sized relations on hour
    (|hours| × |types|² rows — calendar- and catalog-bounded, never
    data-bounded); one (pair, lag)-keyed aggregate with map-side
    partials finishes."""
    # pin the grid once (lazy): it feeds both the x side and the led
    # side — without the pin the whole grid build (raw-event aggregate
    # included) runs twice (measured: 6 event scans)
    dense = dense.localCheckpoint(eager=False)
    w = Window.partitionBy("event_type").orderBy("hour")
    led = dense.select(
        F.col("event_type").alias("type_b"),
        "hour",
        *[F.lead("n_events", k).over(w).alias(f"b{k}") for k in _CCF_LAGS],
    )
    stack_expr = "stack({n}, {args}) AS (lag, y)".format(
        n=len(_CCF_LAGS),
        args=", ".join(f"CAST({k} AS INT), b{k}" for k in _CCF_LAGS),
    )
    pairs = (
        dense.select(
            F.col("event_type").alias("type_a"),
            "hour",
            F.col("n_events").alias("x"),
        )
        .join(led, "hour")
        .filter(F.col("type_a") != F.col("type_b"))
        .selectExpr("type_a", "type_b", "x", stack_expr)
        .filter(F.col("y").isNotNull())
    )
    agg = pairs.groupBy("type_a", "type_b", "lag").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    vx = F.col("n_pairs") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n_pairs") * F.col("syy") - F.col("sy") * F.col("sy")
    num = F.col("n_pairs") * F.col("sxy") - F.col("sx") * F.col("sy")
    ccf = F.when(
        (vx > 0) & (vy > 0),
        num.cast("double") / F.sqrt(vx.cast("double") * vy.cast("double")),
    )
    return agg.select(
        "type_a", "type_b", "lag", "n_pairs", ccf.alias("ccf")
    ).orderBy("type_a", "type_b", "lag")


@query("ts_crosscorr_hourly", oracle=_CCF_ORACLE)
def ts_crosscorr_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead/lag structure BETWEEN event types (see crosscorr_core) over
    the recomputed dense grid; the engine serves the same core off the
    maintained grid (Engine.read_grid)."""
    return crosscorr_core(
        _dense_grid(spark, sf_dir).select("event_type", "hour", "n_events")
    )
