"""A/B probe for the exact-percentile domain-shuffle shapes (r14).

Variants over the quantiles_exact body (lineitem, group=l_returnflag,
value=l_extendedprice, pcts 0.5/0.9/0.99):

  v0  built-in percentile aggregate (pre-r14 form, fan_out)
  v1  byval + 2 windows (running + total)           [current helper]
  v2  v1 without fan_out
  v3  byval + 1 window; group totals from a separate tiny count scan,
      broadcast-joined (kills the whole-partition total window)
  v4  v3 without fan_out

Interleaved min-of-3. Usage: python tools/pctl_ab.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from go_cdc_spark.session import get_spark
from go_cdc_spark.tables import fan_out, load

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PCTS = [0.5, 0.9, 0.99]
NAMES = ["p50", "p90", "p99"]


def v0(spark):
    li = fan_out(load(spark, SF_DIR, "lineitem"))
    q = F.expr("percentile(l_extendedprice, array(0.5, 0.9, 0.99))")
    return (
        li.groupBy("l_returnflag")
        .agg(q.alias("q"))
        .select(
            "l_returnflag",
            F.element_at("q", 1).alias("p50"),
            F.element_at("q", 2).alias("p90"),
            F.element_at("q", 3).alias("p99"),
        )
        .orderBy("l_returnflag")
    )


def _two_window(li):
    from go_cdc_spark.operators._percentile import domain_percentiles

    return domain_percentiles(
        li, ["l_returnflag"], "l_extendedprice", PCTS, NAMES
    ).orderBy("l_returnflag")


def v1(spark):
    return _two_window(fan_out(load(spark, SF_DIR, "lineitem")))


def v2(spark):
    return _two_window(load(spark, SF_DIR, "lineitem"))


def _one_window(li):
    g, vname = "l_returnflag", "l_extendedprice"
    cnts = li.groupBy(g).agg(F.count(F.lit(1)).alias("_n"))
    byval = li.groupBy(g, F.col(vname).alias("_v")).agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    w_ord = (
        Window.partitionBy(g)
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = byval.select(
        g, "_v", "_cnt", F.sum("_cnt").over(w_ord).alias("_cw")
    ).join(F.broadcast(cnts), g)
    n, cw, cnt, v = F.col("_n"), F.col("_cw"), F.col("_cnt"), F.col("_v")
    aggs = [F.max("_n").alias("_n")]
    for i, p in enumerate(PCTS):
        pos = F.lit(float(p)) * (n - 1).cast("double")
        lower, higher = F.floor(pos), F.ceil(pos)
        aggs.append(
            F.max(F.when((cw > lower) & ((cw - cnt) <= lower), v)).alias(f"_lo{i}")
        )
        aggs.append(
            F.max(F.when((cw > higher) & ((cw - cnt) <= higher), v)).alias(f"_hi{i}")
        )
    out = c.groupBy(g).agg(*aggs)
    cols = [g]
    n_out = F.col("_n")
    for i, (p, name) in enumerate(zip(PCTS, NAMES)):
        pos = F.lit(float(p)) * (n_out - 1).cast("double")
        lower, higher = F.floor(pos), F.ceil(pos)
        lo, hi = F.col(f"_lo{i}"), F.col(f"_hi{i}")
        interp = (higher.cast("double") - pos) * lo + (pos - lower.cast("double")) * hi
        cols.append(
            F.when(higher == lower, lo).when(hi == lo, lo).otherwise(interp).alias(name)
        )
    return out.select(*cols).orderBy(g)


def v3(spark):
    return _one_window(fan_out(load(spark, SF_DIR, "lineitem")))


def v4(spark):
    return _one_window(load(spark, SF_DIR, "lineitem"))


def main() -> None:
    spark = get_spark("pctl-ab")
    variants = {"v0": v0, "v1": v1, "v2": v2, "v3": v3, "v4": v4}
    # warmup + result parity check vs v0
    ref = None
    for name, fn in variants.items():
        rows = sorted(map(tuple, fn(spark).collect()))
        if ref is None:
            ref = rows
        else:
            assert rows == ref, f"{name} result differs from v0!"
    best = {k: float("inf") for k in variants}
    for _ in range(3):
        for name, fn in variants.items():
            df = fn(spark)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best[name] = min(best[name], time.perf_counter() - t0)
    for k, v in best.items():
        print(f"{k}: {v:.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
