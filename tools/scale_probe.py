#!/usr/bin/env python
"""Scale probe: synthesize larger corpora by key-shifted unions of
sf0.1 and measure how the headline plans scale.

At 100 TB what matters is the growth EXPONENT of each plan, not its
sf0.1 constant: a broadcast-and-partial-agg plan should scale ~linearly
in input size; anything super-linear means a shuffle or build side is
growing with the fact table. This probe stacks sf0.1 k times (keys
offset per copy so join cardinalities scale like real data growth:
every copy is a disjoint key space) into .scratch/sfx{k}/, runs the
headline queries at each k, and reports sec and the fitted exponent
log(t_k/t_1)/log(k).

Usage: python tools/scale_probe.py [k ...]   (default: 3 10)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from go_cdc_spark.session import get_spark
from go_cdc_spark.plans.queries import QUERIES
from go_cdc_spark.tables import TABLE_NAMES

BASE = "/root/testdata/sf0.1"
SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch")

# per-table key columns to offset per copy (disjoint key spaces per
# copy). TPC-H scales part/supplier/customer WITH the fact tables (only
# nation/region are fixed), so those dims replicate too, with fact FKs
# offset to match — otherwise stacking lineitem k× multiplies the rows
# per (partkey, suppkey) pair and a graph query's exponent measures
# densification, not growth (the r03 triangle_count +0.69 artifact).
FACT_OFFSETS = {
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 10_000_000},
    "lineitem": {
        "l_orderkey": 10_000_000,
        "l_partkey": 10_000_000,
        "l_suppkey": 10_000_000,
    },
    "part": {"p_partkey": 10_000_000},
    "supplier": {"s_suppkey": 10_000_000},
    "customer": {"c_custkey": 10_000_000},
    "events": {"event_id": 10_000_000},
    "documents": {"doc_id": 1_000_000},
    "embeddings": {"vec_id": 1_000_000},
}
_GEN = "v2"  # bump to invalidate previously-synthesized corpora
PROBE = [
    "q1_pricing_summary",
    "q18_large_volume",
    "q21_waiting_supplier",
    "join_sortmerge",
    "dedup_minhash_lsh",
    "sim_lsh_ann",
    "decontaminate_ngrams",
    "cdc_apply_changes",
]


def synthesize(spark, k: int) -> str:
    out = os.path.join(SCRATCH, f"sfx{k}")
    if os.path.exists(os.path.join(out, f"_DONE_{_GEN}")):
        return out
    os.makedirs(out, exist_ok=True)
    for t in TABLE_NAMES:
        src = spark.read.parquet(f"{BASE}/{t}.parquet")
        if t in FACT_OFFSETS:
            copies = []
            for i in range(k):
                c = src
                for col, step in FACT_OFFSETS[t].items():
                    if step:
                        c = c.withColumn(col, F.col(col) + F.lit(i * step))
                copies.append(c)
            df = copies[0]
            for c in copies[1:]:
                df = df.unionByName(c)
        else:
            df = src
        df.write.mode("overwrite").parquet(f"{out}/{t}.parquet")
    open(os.path.join(out, f"_DONE_{_GEN}"), "w").close()
    return out


def run(spark, sf_dir: str, names) -> dict:
    times = {}
    for name in names:
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        times[name] = round(
            min(
                (lambda t0: (QUERIES[name](spark, sf_dir)
                             .write.format("noop").mode("overwrite").save(),
                             time.perf_counter() - t0)[1])(time.perf_counter())
                for _ in range(2)
            ),
            3,
        )
    return times


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [3, 10]
    spark = get_spark("scale-probe")
    base_times = run(spark, BASE, PROBE)
    report = {"k1": base_times}
    for k in ks:
        d = synthesize(spark, k)
        tk = run(spark, d, PROBE)
        import math
        report[f"k{k}"] = tk
        report[f"exponent_k{k}"] = {
            n: round(math.log(max(tk[n], 1e-3) / max(base_times[n], 1e-3)) / math.log(k), 2)
            for n in PROBE
        }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
