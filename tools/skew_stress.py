#!/usr/bin/env python
"""Skew-stress probe: the uniform 10x sweep (scale_probe/scale_sweep)
grows data with DISJOINT key unions, which never stresses the skew
path. This probe synthesizes a deliberately skewed 10x variant — one
hot key carrying ~10% of total mass — for the shuffle-heavy
representatives, and reports uniform-vs-skewed timings plus whether
AQE's skew-join / partial aggregation absorbed the hot key.

Skew injected (hot copy = copy 0 of the 10x union, so total volume
matches .scratch/sfx10 exactly):

- events:    copy 0's user_id := one hot user  → sessionize_events'
             session window and the heatmap aggs see a 10%-mass key
- lineitem:  copy 0's l_orderkey := one hot order (kept in orders) →
             q18's groupBy(l_orderkey) and the orders join see it
- documents: copy 0's text := one hot document body → every minhash
             band of those docs lands in ONE LSH bucket

Usage: python tools/skew_stress.py [name ...]
       (default: sessionize_events dedup_minhash_lsh q18_large_volume)

Read exponents/ratios, not decimals; run on an idle machine.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from go_cdc_spark.plans.queries import QUERIES
from go_cdc_spark.session import get_spark
from go_cdc_spark.tables import TABLE_NAMES

BASE = "/root/testdata/sf0.1"
SCRATCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch"
)
UNIFORM10 = os.path.join(SCRATCH, "sfx10")
SKEW10 = os.path.join(SCRATCH, "sfx10_skew")

K = 10
HOT_USER = 424242
HOT_ORDER = 4242
FACT_OFFSETS = {
    "orders": {"o_orderkey": 10_000_000},
    "lineitem": {"l_orderkey": 10_000_000},
    "events": {"event_id": 10_000_000},
    "documents": {"doc_id": 1_000_000},
    "embeddings": {"vec_id": 1_000_000},
}
DEFAULT = ["sessionize_events", "dedup_minhash_lsh", "q18_large_volume"]


def _skew_copy(t, c):
    """Copy 0 of each fact gets its group key collapsed to one hot
    value (10% of total mass on one shuffle key)."""
    if t == "events":
        return c.withColumn("user_id", F.lit(HOT_USER).cast("long"))
    if t == "lineitem":
        return c.withColumn("l_orderkey", F.lit(HOT_ORDER).cast("long"))
    if t == "documents":
        hot_text = c.orderBy("doc_id").limit(1).select("text")
        return c.crossJoin(F.broadcast(hot_text.withColumnRenamed("text", "__hot"))).select(
            "doc_id", F.col("__hot").alias("text"), "lang", "source", "n_chars"
        )
    if t == "embeddings":
        hot_vec = c.orderBy("vec_id").limit(1).select(
            F.col("embedding").alias("__hot")
        )
        others = [x for x in c.columns if x not in ("vec_id", "embedding")]
        return c.crossJoin(F.broadcast(hot_vec)).select(
            "vec_id", F.col("__hot").alias("embedding"), *others
        )
    return c


def synthesize_skewed(spark) -> str:
    if os.path.exists(os.path.join(SKEW10, "_DONE")):
        return SKEW10
    os.makedirs(SKEW10, exist_ok=True)
    for t in TABLE_NAMES:
        src = spark.read.parquet(f"{BASE}/{t}.parquet")
        if t in FACT_OFFSETS:
            copies = []
            for i in range(K):
                c = src
                for col, step in FACT_OFFSETS[t].items():
                    if step:
                        c = c.withColumn(col, F.col(col) + F.lit(i * step))
                if i == 0:
                    c = _skew_copy(t, c)
                copies.append(c)
            df = copies[0]
            for c in copies[1:]:
                df = df.unionByName(c)
        else:
            df = src
        df.write.mode("overwrite").parquet(f"{SKEW10}/{t}.parquet")
    open(os.path.join(SKEW10, "_DONE"), "w").close()
    return SKEW10


def synthesize_uniform(spark) -> str:
    """Reuse scale_probe's uniform 10x corpus (same synthesis rules)."""
    from scale_probe import synthesize

    return synthesize(spark, K)


# --- hub-degree variant (the wedge-family axis) ----------------------------
# The key-collapse skew above stresses AGGREGATION keys; the graph wedge
# family's failure axis is different: one VERTEX of huge degree in the
# support-filtered co-purchase graph. Planted as the judge prescribed:
# one part in ~10% of all orders (copy 0's line 1 := HOT_PART), so the
# hub ends up adjacent to a large share of the surviving part universe
# and Σ deg(v)² blows up under any orientation that lets the hub
# enumerate its neighbor pairs.

HOT_PART = 1
HUB10 = os.path.join(SCRATCH, "sfx10_hub")
HUB10_CTRL = os.path.join(SCRATCH, "sfx10_hub_ctrl")
HUB_QUERIES = ["triangle_count", "graph_link_prediction"]


def _synthesize_orderkey_copies(
    spark, dest: str, plant_hub: bool, collapse_order: bool = False
) -> str:
    """10 copies with OFFSET ORDER KEYS but SHARED part keys (unlike
    scale_probe's fully-disjoint unions) — sharing partkeys inflates
    every pair's support ~10x, which densifies the co-purchase graph to
    ~1.2M edges. The control and hub corpora use the SAME synthesis so
    their ratio isolates the ONE planted hub (copy 0's line 1 :=
    HOT_PART, i.e. one part in ~10% of all orders), not the support
    inflation."""
    if os.path.exists(os.path.join(dest, "_DONE")):
        return dest
    os.makedirs(dest, exist_ok=True)
    for t in TABLE_NAMES:
        src = spark.read.parquet(f"{BASE}/{t}.parquet")
        if t in FACT_OFFSETS:
            copies = []
            for i in range(K):
                c = src
                for col, step in FACT_OFFSETS[t].items():
                    if step:
                        c = c.withColumn(col, F.col(col) + F.lit(i * step))
                if plant_hub and i == 0 and t == "lineitem":
                    c = c.withColumn(
                        "l_partkey",
                        F.when(
                            F.col("l_linenumber") == 1, F.lit(HOT_PART).cast("long")
                        ).otherwise(F.col("l_partkey")),
                    )
                if collapse_order and i == 0 and t == "lineitem":
                    # giant basket: copy 0's whole lineitem becomes ONE
                    # order whose distinct-part basket is ~the entire
                    # part universe (HOT_ORDER stays in copy 0's orders)
                    c = c.withColumn("l_orderkey", F.lit(HOT_ORDER).cast("long"))
                copies.append(c)
            df = copies[0]
            for c in copies[1:]:
                df = df.unionByName(c)
        else:
            df = src
        df.write.mode("overwrite").parquet(f"{dest}/{t}.parquet")
    open(os.path.join(dest, "_DONE"), "w").close()
    return dest


def synthesize_hub(spark) -> str:
    return _synthesize_orderkey_copies(spark, HUB10, plant_hub=True)


def synthesize_hub_control(spark) -> str:
    return _synthesize_orderkey_copies(spark, HUB10_CTRL, plant_hub=False)


def _id_oriented_triangle_seconds(spark, sf_dir) -> float:
    """Round-8's id-oriented wedge enumeration, timed as the CONTRAST
    arm: what the hub costs without degree orientation."""
    from go_cdc_spark.operators.graph import _copurchase_edges

    def build():
        co = _copurchase_edges(spark, sf_dir)
        e1, e2, e3 = co.alias("e1"), co.alias("e2"), co.alias("e3")
        return (
            e1.join(e2, F.col("e2.pa") == F.col("e1.pb"))
            .join(
                e3,
                (F.col("e3.pa") == F.col("e1.pa"))
                & (F.col("e3.pb") == F.col("e2.pb")),
            )
            .agg(F.count(F.lit(1)).alias("n_triangles"))
        )

    build().write.format("noop").mode("overwrite").save()  # warm
    t0 = time.perf_counter()
    build().write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def hub_main() -> None:
    """control-10x vs hub-10x for the wedge family (identical synthesis
    up to the one planted hub part), plus the id-orientation contrast
    arm on the hub corpus."""
    spark = get_spark("skew-stress-hub")
    ctrl = synthesize_hub_control(spark)
    hub = synthesize_hub(spark)
    report = {}
    for name in HUB_QUERIES:
        t_c = timed(spark, name, ctrl)
        t_h = timed(spark, name, hub)
        report[name] = {
            "control10_s": t_c,
            "hub10_s": t_h,
            "hub_ratio": round(t_h / max(t_c, 1e-3), 2),
        }
        print(
            f"{name:28s} control={t_c:6.2f}s hub={t_h:6.2f}s "
            f"ratio={report[name]['hub_ratio']:.2f}",
            flush=True,
        )
    report["triangle_id_oriented_contrast"] = {
        "hub10_s": _id_oriented_triangle_seconds(spark, hub),
        "control10_s": _id_oriented_triangle_seconds(spark, ctrl),
        "note": "round-8 id orientation on the same corpora",
    }
    print(json.dumps(report, indent=2))


def timed(spark, name, sf_dir) -> float:
    QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
    out = []
    for _ in range(2):
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        out.append(time.perf_counter() - t0)
    return round(min(out), 3)


def skew_plan_evidence(spark, name, sf_dir) -> dict:
    """Did AQE engage on the hot key? Inspect the executed plan string
    for skew-join annotations and partial aggregation."""
    df = QUERIES[name](spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        "aqe_skew_join": "isSkew=true" in plan or "skewed=true" in plan,
        # partial HashAggregate OR a rank-limit pushdown: Spark's
        # WindowGroupLimit (3.5+) prunes top-k-per-key BELOW the
        # exchange, which is map-side combine for window collapses —
        # missing it misreported cdc_collapse as skew-unsafe (round 5)
        "partial_agg_before_exchange": "partial_" in plan.lower()
        or "HashAggregate(keys" in plan
        or "WindowGroupLimit" in plan,
    }


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    spark = get_spark("skew-stress")
    uniform = synthesize_uniform(spark)
    skewed = synthesize_skewed(spark)
    report = {}
    for name in names:
        t_u = timed(spark, name, uniform)
        t_s = timed(spark, name, skewed)
        report[name] = {
            "uniform10_s": t_u,
            "skew10_s": t_s,
            "skew_ratio": round(t_s / max(t_u, 1e-3), 2),
            **skew_plan_evidence(spark, name, skewed),
        }
        print(f"{name:28s} uniform={t_u:6.2f}s skew={t_s:6.2f}s "
              f"ratio={report[name]['skew_ratio']:.2f}", flush=True)
    print(json.dumps(report, indent=2))


# --- round-10 axes: hot custkey + giant basket (VERDICT r9 #1) -------------
# (a) hot-custkey: one customer holds ~10% of all orders -> the
#     join_interval_overlap per-customer self-join sees one key with
#     d²/2 candidate pairs unless _OVERLAP_MAX_ORDERS valves it.
# (b) giant basket: the existing SKEW10 corpus already plants it —
#     copy 0's l_orderkey := HOT_ORDER collapses ~10% of lineitem into
#     ONE order whose distinct-part basket is the whole part universe;
#     the co-purchase self-joins explode m²/2 pairs unless MAX_BASKET
#     valves it. Both probes time the VALVED operator and an UNCAPPED
#     contrast arm on the same corpus, so the report shows what the
#     valve saves, not just that the valved form is flat.

HOT_CUST = 777
HOTCUST10 = os.path.join(SCRATCH, "sfx10_hotcust")


def synthesize_hotcust(spark) -> str:
    """10x corpus, copy 0's orders.o_custkey := HOT_CUST (one customer
    holding 10% of all orders; lineitem untouched so every order keeps
    its lines through the offset keys). The matched CONTROL is
    synthesize_hub_control — the IDENTICAL synthesis (offset order
    keys, SHARED custkeys, so every customer is ~10x densified in both
    corpora) minus the one planted key; scale_probe's uniform corpus
    would be a mismatched control because its disjoint key unions keep
    per-customer order counts at 1x."""
    if os.path.exists(os.path.join(HOTCUST10, "_DONE")):
        return HOTCUST10
    os.makedirs(HOTCUST10, exist_ok=True)
    for t in TABLE_NAMES:
        src = spark.read.parquet(f"{BASE}/{t}.parquet")
        if t in FACT_OFFSETS:
            copies = []
            for i in range(K):
                c = src
                for col, step in FACT_OFFSETS[t].items():
                    if step:
                        c = c.withColumn(col, F.col(col) + F.lit(i * step))
                if i == 0 and t == "orders":
                    c = c.withColumn("o_custkey", F.lit(HOT_CUST).cast("long"))
                copies.append(c)
            df = copies[0]
            for c in copies[1:]:
                df = df.unionByName(c)
        else:
            df = src
        df.write.mode("overwrite").parquet(f"{HOTCUST10}/{t}.parquet")
    open(os.path.join(HOTCUST10, "_DONE"), "w").close()
    return HOTCUST10


def _timed_uncapped(spark, build, warm=True) -> float:
    if warm:
        build().write.format("noop").mode("overwrite").save()
    t0 = time.perf_counter()
    build().write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def hotcust_main() -> None:
    """control-10x (same synthesis, no plant) vs hotcust-10x for
    join_interval_overlap, plus the uncapped contrast arm on the
    hotcust corpus (what the valve saves). The contrast arm is NOT
    warmed and bounded only by the caller's patience — it is quadratic
    by construction (the 10%-mass customer is ~1.1e10 candidate pairs
    in one task)."""
    from go_cdc_spark.operators import relational as R

    spark = get_spark("skew-stress-hotcust")
    ctrl = synthesize_hub_control(spark)
    hot = synthesize_hotcust(spark)
    name = "join_interval_overlap"
    t_u = timed(spark, name, ctrl)
    t_h = timed(spark, name, hot)
    report = {
        name: {
            "control10_s": t_u,
            "hotcust10_s": t_h,
            "hotcust_ratio": round(t_h / max(t_u, 1e-3), 2),
        }
    }
    print(f"{name}: control={t_u:.2f}s hotcust={t_h:.2f}s "
          f"ratio={report[name]['hotcust_ratio']:.2f}", flush=True)
    if "--contrast" in sys.argv:
        saved = R._OVERLAP_MAX_ORDERS
        R._OVERLAP_MAX_ORDERS = 10**9
        try:
            t_unc = _timed_uncapped(
                spark, lambda: QUERIES[name](spark, hot), warm=False
            )
        finally:
            R._OVERLAP_MAX_ORDERS = saved
        report[name]["hotcust_uncapped_s"] = t_unc
        print(f"{name} UNCAPPED on hotcust: {t_unc:.2f}s", flush=True)
    print(json.dumps(report, indent=2))


BASKET10 = os.path.join(SCRATCH, "sfx10_basket")


def basket_main() -> None:
    """control-10x vs giant-basket-10x (IDENTICAL synthesis — offset
    order keys, shared part keys — except copy 0's lineitem collapsed
    into ONE order holding ~the whole part universe) for the
    co-purchase self-join family, plus uncapped contrast arms."""
    from go_cdc_spark.operators import behavior as Bv
    from go_cdc_spark.operators import graph as G

    spark = get_spark("skew-stress-basket")
    ctrl = synthesize_hub_control(spark)
    skewed = _synthesize_orderkey_copies(
        spark, BASKET10, plant_hub=False, collapse_order=True
    )
    report = {}
    for name in ("triangle_count", "copurchase_pairs"):
        t_u = timed(spark, name, ctrl)
        t_s = timed(spark, name, skewed)
        report[name] = {
            "control10_s": t_u,
            "giantbasket10_s": t_s,
            "giantbasket_ratio": round(t_s / max(t_u, 1e-3), 2),
        }
        print(f"{name:20s} control={t_u:6.2f}s giant-basket={t_s:6.2f}s "
              f"ratio={report[name]['giantbasket_ratio']:.2f}", flush=True)
    if "--contrast" in sys.argv:
        saved_g, saved_b = G.MAX_BASKET, Bv.MAX_BASKET
        G.MAX_BASKET = Bv.MAX_BASKET = 10**9
        try:
            for name in ("triangle_count", "copurchase_pairs"):
                t_unc = _timed_uncapped(
                    spark, lambda n=name: QUERIES[n](spark, skewed), warm=False
                )
                report[name]["giantbasket_uncapped_s"] = t_unc
                print(f"{name} UNCAPPED on giant-basket: {t_unc:.2f}s", flush=True)
        finally:
            G.MAX_BASKET, Bv.MAX_BASKET = saved_g, saved_b
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    if "--hub" in sys.argv:
        hub_main()
    elif "--hotcust" in sys.argv:
        hotcust_main()
    elif "--basket" in sys.argv:
        basket_main()
    else:
        main()
