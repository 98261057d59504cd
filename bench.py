#!/usr/bin/env python
"""Headline-query benchmark (driver-run per round → BENCH_r{N}.json).

Runs a representative slice of the operator surface — scan/filter, agg,
every join family, window, top-k, CDC collapse, dedup (exact + MinHash
LSH), similarity top-k, text stats — at ``$SPARK_GRAFT_SF_DIR`` (default
sf0.1, ~600k lineitem) on ``local[$SPARK_GRAFT_CPUS]``, and prints ONE
JSON line::

    {"metric": "headline_queries_total", "value": <sum sec>,
     "unit": "sec", "queries": {name: sec, ...}, "sf": 0.1}

Each query executes fully through the noop sink (whole plan runs,
nothing collected to the driver — the fair way to time a distributed
plan). One untimed warmup of the first query absorbs JVM/codegen
startup so numbers reflect steady state, which is what the 100 TB
comparison cares about.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from go_cdc_spark.plans.queries import QUERIES  # noqa: E402
from go_cdc_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q8_market_share",
    "q10_returned_items",
    "q13_customer_distribution",
    "q18_large_volume",
    "q21_waiting_supplier",
    "scan_project_filter",
    "join_broadcast",
    "join_sortmerge",
    "join_asof",
    "agg_rollup",
    "win_rank",
    "topk_orders",
    "window_tumbling",
    "cdc_latest",
    "cdc_apply_changes",
    "dedup_exact",
    "dedup_minhash_lsh",
    "sim_topk",
    "text_stats",
    "decontaminate_ngrams",
    "quality_repetition",
    "dedup_paragraphs",
    "dedup_embedding_cosine",
    "cdc_scd2",
    "kmeans_centroids",
    "q2_min_cost_supplier",
    "stats_moments",
    "tf_idf_top_terms",
    "sessionize_events",
]


def run_one(spark, name: str, sf_dir: str) -> float:
    df = QUERIES[name](spark, sf_dir)
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


REGRESSION_FACTOR = 1.3  # round-over-round per-query budget
NOISE_FLOOR_SEC = 0.25  # sub-250ms timings are scheduler noise, not plans
MIN_DELTA_SEC = 0.25  # and so are sub-250ms absolute swings at any ratio


def load_prev_bench(repo_dir: str) -> dict | None:
    """Latest BENCH_r{N}.json from earlier rounds (the driver writes one
    per round) — the round-over-round comparison base."""
    benches = sorted(
        f
        for f in os.listdir(repo_dir)
        if f.startswith("BENCH_r") and f.endswith(".json")
    )
    if not benches:
        return None
    with open(os.path.join(repo_dir, benches[-1])) as f:
        prior = json.load(f)
    return prior.get("parsed") or prior


def vs_prev(times: dict[str, float], prev: dict | None) -> dict:
    """Per-query ratio vs the prior round; names any query slower than
    REGRESSION_FACTOR× (above the noise floor) so a regression is loud
    in the bench line itself, not buried in a diff."""
    if not prev or "queries" not in prev:
        return {"prev_found": False, "regressions": []}
    ratios = {}
    regressions = []
    for name, t in times.items():
        p = prev["queries"].get(name)
        if p is None or p <= 0:
            continue
        ratio = round(t / p, 2)
        ratios[name] = ratio
        if (
            ratio > REGRESSION_FACTOR
            and t > NOISE_FLOOR_SEC
            and (t - p) > MIN_DELTA_SEC
        ):
            regressions.append(name)
    return {
        "prev_found": True,
        "prev_total": prev.get("value"),
        "ratios": ratios,
        "regressions": regressions,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    spark = get_spark("go_cdc_spark-bench")

    run_one(spark, HEADLINE[0], sf_dir)  # warmup: JVM + codegen + parquet footer

    # min of 3 runs per query: single cold runs of sub-second plans swing
    # 3× on JIT/GC noise, and a heavy-codegen plan (e.g. the 128-dim
    # cosine fold) can stay slow for TWO consecutive runs while C2
    # compiles in the background; the min is the steady-state number the
    # 100 TB comparison cares about.
    times: dict[str, float] = {}
    for name in HEADLINE:
        times[name] = round(min(run_one(spark, name, sf_dir) for _ in range(3)), 3)

    comparison = vs_prev(times, load_prev_bench(os.path.dirname(os.path.abspath(__file__))))
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(times.values()), 3),
                "unit": "sec",
                "queries": times,
                "sf": sf,
                "vs_prev": comparison,
            }
        )
    )
    spark.stop()
    if comparison["regressions"]:
        # fail loudly: a >1.3× per-query regression is a build defect
        print(
            f"REGRESSION vs previous round: {comparison['regressions']}",
            file=sys.stderr,
        )
        sys.exit(1)


if __name__ == "__main__":
    main()
