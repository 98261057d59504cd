#!/usr/bin/env python
"""Full-surface scale sweep: every registered query at sf0.1 vs the
synthesized 10x corpus (see scale_probe.py), one warm + one timed run
each, reporting the growth exponent log(t10/t1)/log(10) sorted worst
first.

Coarser than scale_probe.py (min-of-2) — this is the OUTLIER FINDER:
anything with exponent >~0.5 at 10x gets a close look; the probe then
re-measures the suspects properly.

Usage: python tools/scale_sweep.py [name ...]   (default: all queries)
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from go_cdc_spark.session import get_spark
from go_cdc_spark.plans.queries import QUERIES

BASE = "/root/testdata/sf0.1"
SFX10 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch", "sfx10"
)


def timed(spark, name: str, sf_dir: str) -> float:
    t0 = time.perf_counter()
    QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    names = sys.argv[1:] or sorted(QUERIES)
    spark = get_spark("scale-sweep")
    from scale_probe import synthesize  # same generator (key-offset v2)

    synthesize(spark, 10)
    rows = []
    for name in names:
        try:
            timed(spark, name, BASE)  # warm (plan + page cache)
            t1 = min(timed(spark, name, BASE), timed(spark, name, BASE))
            timed(spark, name, SFX10)  # warm
            t10 = min(timed(spark, name, SFX10), timed(spark, name, SFX10))
            exp = round(math.log(max(t10, 1e-3) / max(t1, 1e-3)) / math.log(10), 2)
            rows.append({"query": name, "t1": round(t1, 2), "t10": round(t10, 2), "exp": exp})
            print(f"{name:32s} t1={t1:6.2f} t10={t10:6.2f} exp={exp:+.2f}", flush=True)
        except Exception as ex:  # noqa: BLE001 — sweep must survive one bad query
            print(f"{name:32s} ERROR {str(ex)[:120]}", flush=True)
            rows.append({"query": name, "error": str(ex)[:200]})
    rows.sort(key=lambda r: r.get("exp", 99), reverse=True)
    print(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
