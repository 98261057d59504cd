#!/usr/bin/env python
"""One-off FULL registered-surface timing sweep (VERDICT r10 #6).

bench.py's headline set times ~half the registry; the other half had no
timing history at sf0.1, so a regression there would meet an empty
`vs_prev` pool. This sweeps EVERY registered query once (untimed warmup
+ min-of-2) and writes BENCH_r{N}_full.json — a name load_prior_benches
ingests into the cross-round median pool (it matches the BENCH_r prefix)
but _current_round's strict regex ignores, so it seeds history without
advancing the round counter. Headline set unchanged.

Only valid on an IDLE machine (see SCALE.md sweep discipline).

Usage: python tools/full_bench_sweep.py [out_name]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from go_cdc_spark.plans.queries import QUERIES  # noqa: E402
from go_cdc_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    out_name = sys.argv[1] if len(sys.argv) > 1 else "BENCH_r11_full.json"
    sf = float(os.path.basename(SF_DIR.rstrip("/")).removeprefix("sf") or "0.1")
    spark = get_spark("full-bench-sweep")
    times: dict[str, float] = {}
    names = sorted(QUERIES)
    for i, name in enumerate(names):
        try:
            QUERIES[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()  # untimed warmup (codegen/JIT/footers)
            best = float("inf")
            for _ in range(2):
                df = QUERIES[name](spark, SF_DIR)
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            times[name] = round(best, 3)
            print(f"[{i + 1}/{len(names)}] {name}: {best:.2f}s", file=sys.stderr)
        except Exception as exc:  # noqa: BLE001 — sweep must finish
            print(f"[{i + 1}/{len(names)}] {name}: ERROR {exc}", file=sys.stderr)
            times[name] = -1.0
    ok = {k: v for k, v in times.items() if v > 0}
    report = {
        "metric": "full_surface_sweep",
        "value": round(sum(ok.values()), 2),
        "unit": "sec",
        "sf": sf,
        "queries": ok,
        "errors": sorted(k for k, v in times.items() if v < 0),
        "note": "idle-host min-of-2 over the whole registry; seeds the "
        "vs_prev median pool for queries outside the headline set",
    }
    with open(os.path.join(REPO, out_name), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: report[k] for k in ("metric", "value", "sf")}))
    spark.stop()


if __name__ == "__main__":
    main()
