"""Giant-basket valve probe (r14 / VERDICT r13 item 6).

Question: the r13 basket-first pair enumeration valves output with
``size(collect_set(items)) <= MAX_BASKET`` — but a pathological order
with a huge distinct-part basket still builds its FULL item array in
the aggregation buffer before the filter drops it. Is that buffer the
binding cost, and does a pre-count guard (count-distinct first, then
semi-join the survivors into the collect) beat it?

Synthesizes lineitem ∪ one mega-order with K distinct parts (default
200k — ~3000x the fixture's max basket of 7 and far beyond the 64-item
valve), then interleaved-min-of-3 times three shapes:

  A  current: collect_set -> size() filter -> explode pairs
  B  guarded: count_distinct pre-aggregate -> anti-join the giant
     orders out -> collect_set on survivors only
  C  current shape on the UNSKEWED base (the no-giant reference)

Run on an idle machine: python tools/basket_valve_probe.py [K]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from go_cdc_spark.operators.behavior import pairs_from_sorted
from go_cdc_spark.operators.graph import MAX_BASKET
from go_cdc_spark.session import get_spark
from go_cdc_spark.tables import load

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
MEGA_ORDER = 99_999_999


def edges_current(li):
    baskets = (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("items"))
        .filter(F.size("items") <= MAX_BASKET)
    )
    pairs = baskets.select(F.explode(pairs_from_sorted(F.col("items"))).alias("e"))
    return (
        pairs.select(F.col("e.pa").alias("pa"), F.col("e.pb").alias("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("support"))
    )


def edges_guarded(li):
    ok = (
        li.groupBy("l_orderkey")
        .agg(F.count_distinct("l_partkey").alias("m"))
        .filter(F.col("m") <= MAX_BASKET)
        .select("l_orderkey")
    )
    survivors = li.join(ok, "l_orderkey", "left_semi")
    baskets = survivors.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("items")
    )
    pairs = baskets.select(F.explode(pairs_from_sorted(F.col("items"))).alias("e"))
    return (
        pairs.select(F.col("e.pa").alias("pa"), F.col("e.pb").alias("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("support"))
    )


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    spark = get_spark("basket-valve-probe")
    base = load(spark, SF_DIR, "lineitem").select("l_orderkey", "l_partkey")
    mega = spark.range(k).select(
        F.lit(MEGA_ORDER).cast("long").alias("l_orderkey"),
        (F.col("id") + 10_000_000).alias("l_partkey"),
    )
    skewed = base.unionByName(mega).localCheckpoint()  # eager: probe input, untimed
    variants = {
        "A_current_skewed": lambda: edges_current(skewed),
        "B_guarded_skewed": lambda: edges_guarded(skewed),
        "C_current_base": lambda: edges_current(base),
    }
    # parity: A and B must agree on the skewed input
    a = sorted(map(tuple, edges_current(skewed).collect()))
    b = sorted(map(tuple, edges_guarded(skewed).collect()))
    assert a == b, "guarded variant changed the edge multiset!"
    best = {n: float("inf") for n in variants}
    for _ in range(3):
        for n, fn in variants.items():
            df = fn()
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best[n] = min(best[n], time.perf_counter() - t0)
    for n, v in best.items():
        print(f"{n}: {v:.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
