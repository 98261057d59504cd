"""Family-wide IVM integration: ONE changelog stream drives every
maintenance consumer side by side — flat materializer, SUM/COUNT,
MIN/MAX (with repair), COUNT(DISTINCT), top-k (with repair), histogram
quantiles, moment statistics, and SCD2 — and every maintained read
view must agree with the aggregate recomputed from the materializer's
table. The family's correctness story in one place: eight different
delta algebras, one event history, zero disagreement."""

from __future__ import annotations

import random

from pyspark.sql import functions as F
from pyspark.sql import types as T

from go_cdc_spark.operators.cdc import _bin_expr, histogram_percentiles
from go_cdc_spark.streaming.ivm import (
    IncrementalAggregate,
    IncrementalDistinct,
    IncrementalHistogram,
    IncrementalMinMax,
    IncrementalStats,
    IncrementalTopK,
)
from go_cdc_spark.streaming.pipeline import (
    StreamingMaterializer,
    read_changelog_stream,
)
from go_cdc_spark.streaming.scd2 import Scd2Materializer

from .test_ivm import SCHEMA, _ev, _write_segments

LO, HI, BINS = 0.0, 100.0, 10
K = 2


def _random_segments(n_segments=4, per=14, seed=23):
    rng = random.Random(seed)
    live: dict[int, tuple[str, float]] = {}
    pos = 0
    segments = []
    for _ in range(n_segments):
        seg = []
        for _ in range(per):
            pos += 1
            i = rng.randint(1, 30)
            g = f"g{rng.randint(0, 3)}"
            v = float(rng.randint(-10, 110))
            if i in live and rng.random() < 0.35:
                og, ov = live.pop(i)
                seg.append(_ev("delete", pos, i, before=(og, ov)))
            elif i in live:
                og, ov = live[i]
                live[i] = (g, v)
                seg.append(_ev("update", pos, i, g, v, before=(og, ov)))
            else:
                live[i] = (g, v)
                seg.append(_ev("insert", pos, i, g, v))
        segments.append(seg)
    return segments


def test_every_ivm_consumer_agrees_with_the_materialized_table(spark, tmp_path):
    segments = _random_segments()
    seg = tmp_path / "seg"
    _write_segments(seg, segments)
    types = {"grp": T.StringType(), "val": T.DoubleType(), "id": T.LongType()}
    empty = spark.createDataFrame([], SCHEMA)

    consumers = {
        "mat": StreamingMaterializer(
            spark, empty, keys=["id"], state_path=str(tmp_path / "mat")
        ),
        "scd2": Scd2Materializer(
            spark, empty, keys=["id"], state_path=str(tmp_path / "scd2")
        ),
        "agg": IncrementalAggregate(
            spark, ["grp"], "val", str(tmp_path / "agg"), types=types
        ),
        "minmax": IncrementalMinMax(
            spark, ["grp"], "val", str(tmp_path / "mm"), types=types
        ),
        "distinct": IncrementalDistinct(
            spark, ["grp"], "val", str(tmp_path / "dst"), types=types
        ),
        "topk": IncrementalTopK(
            spark, ["grp"], ["id"], "val", K, str(tmp_path / "tk"), types=types
        ),
        "hist": IncrementalHistogram(
            spark, ["grp"], "val", LO, HI, BINS, str(tmp_path / "hs"), types=types
        ),
        "stats": IncrementalStats(
            spark, ["grp"], "val", str(tmp_path / "st"), types=types
        ),
    }
    for name, c in consumers.items():
        c.start(
            read_changelog_stream(spark, str(seg)), str(tmp_path / f"ck_{name}")
        ).awaitTermination(180)

    truth = consumers["mat"].read_table().localCheckpoint(eager=True)

    # SUM/COUNT
    want = {
        r.grp: (r.n, round(r.s, 6))
        for r in truth.groupBy("grp").agg(
            F.count("*").alias("n"),
            F.sum(F.col("val").cast("decimal(38,6)")).cast("double").alias("s"),
        ).collect()
    }
    got = {
        r.grp: (r.n_rows, round(r.sum_val, 6))
        for r in consumers["agg"].read_table().collect()
    }
    assert got == want

    # MIN/MAX after scoped repair
    consumers["minmax"].repair(truth)
    want = {
        r.grp: (r.mn, r.mx)
        for r in truth.groupBy("grp").agg(
            F.min("val").alias("mn"), F.max("val").alias("mx")
        ).collect()
    }
    got = {
        r.grp: (r.min_val, r.max_val)
        for r in consumers["minmax"].read_table().collect()
    }
    assert got == want

    # COUNT(DISTINCT)
    want = {
        r.grp: (r.nd, r.n)
        for r in truth.groupBy("grp").agg(
            F.count_distinct("val").alias("nd"), F.count("*").alias("n")
        ).collect()
    }
    got = {
        r.grp: (r.n_distinct, r.n_rows)
        for r in consumers["distinct"].read_table().collect()
    }
    assert got == want

    # top-k after scoped repair
    consumers["topk"].repair(truth)
    from pyspark.sql.window import Window

    w = Window.partitionBy("grp").orderBy(F.desc_nulls_last("val"), F.asc("id"))
    want = sorted(
        (r.grp, r.id, r.val, r.rank)
        for r in truth.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= K)
        .collect()
    )
    got = sorted(
        (r.grp, r.id, r.val, r.rank)
        for r in consumers["topk"].read_table().collect()
    )
    assert got == want
    assert not any(r.dirty for r in consumers["topk"].read_table().collect())

    # histogram quantiles
    want_hist = truth.filter(F.col("val").isNotNull()).groupBy(
        "grp", _bin_expr("val", LO, HI, BINS).alias("bin")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    want = sorted(map(tuple, histogram_percentiles(want_hist, ["grp"]).collect()))
    hist_rows = consumers["hist"].read_table().collect()
    got = sorted(tuple(r)[:-1] for r in hist_rows)  # last col = has_negative
    assert got == want
    # every retraction found its insert by end of stream: no staleness
    assert not any(r.has_negative for r in hist_rows)

    # moment statistics from maintained power sums
    want = {
        r.grp: (r.n, r.nv, r.mean, r.sd)
        for r in truth.groupBy("grp").agg(
            F.count(F.lit(1)).alias("n"),
            F.count("val").alias("nv"),
            F.avg("val").alias("mean"),
            F.stddev_samp("val").alias("sd"),
        ).collect()
    }
    for r in consumers["stats"].read_table().collect():
        wn, wnv, wmean, wsd = want[r.grp]
        assert (r.n_rows, r.n_vals) == (wn, wnv)
        assert abs(r.mean_val - wmean) < 1e-9
        if wsd is None:
            assert r.stddev_val is None
        else:
            assert abs(r.stddev_val - wsd) < 1e-9
    assert len(want) == consumers["stats"].read_table().count()

    # SCD2 current state == flat materializer state
    a = sorted(map(tuple, consumers["scd2"].current().select("id", "grp", "val").collect()))
    b = sorted(map(tuple, truth.select("id", "grp", "val").collect()))
    assert a == b and a
