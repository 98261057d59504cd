"""Skew utilities: salted join and two-phase agg must equal their
unsalted forms exactly, on a deliberately skewed key distribution."""

from __future__ import annotations

from pyspark.sql import functions as F

from go_cdc_spark.operators.skew import salted_join, two_phase_agg


def _skewed(spark):
    # 90% of rows share key 1 (the hot key), remainder spread over 2..20
    rows = [(1, i * 1.5) for i in range(900)] + [
        (2 + i % 19, float(i)) for i in range(100)
    ]
    return spark.createDataFrame(rows, ["k", "v"])


def _dim(spark):
    return spark.createDataFrame([(k, f"name{k}") for k in range(1, 25)], ["k", "name"])


def test_salted_join_equals_plain_join(spark):
    facts, dim = _skewed(spark), _dim(spark)
    plain = facts.join(dim, ["k"]).groupBy("k", "name").count()
    salted = salted_join(facts, dim, ["k"], n_salts=8).groupBy("k", "name").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_join_keeps_unmatched(spark):
    facts = _skewed(spark).withColumn("k", F.col("k") + 100)  # no dim match
    out = salted_join(facts, _dim(spark), ["k"], n_salts=4, how="left")
    assert out.count() == facts.count()
    assert out.filter(F.col("name").isNotNull()).count() == 0


def test_two_phase_agg_equals_plain(spark):
    df = _skewed(spark)
    plain = df.groupBy("k").agg(
        F.sum("v").alias("s"),
        F.count("v").alias("c"),
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
    )
    twop = two_phase_agg(
        df,
        ["k"],
        {"s": ("v", "sum"), "c": ("v", "count"), "lo": ("v", "min"), "hi": ("v", "max")},
        n_salts=8,
    )
    a = {r.k: (r.s, r.c, r.lo, r.hi) for r in plain.collect()}
    b = {r.k: (r.s, r.c, r.lo, r.hi) for r in twop.collect()}
    assert a.keys() == b.keys()
    for k in a:
        assert a[k][1:] == b[k][1:]
        assert abs(a[k][0] - b[k][0]) < 1e-9  # float sum, different add order
