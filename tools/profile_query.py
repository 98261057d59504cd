"""Per-query profiler: min-of-3 noop-sink time + job/stage/task counts.

Usage::

    python tools/profile_query.py q1_pricing_summary stats_robust ...
    python tools/profile_query.py --all-over 1.0   # profile every headline query, report >1s

Times exactly like bench.py (build untimed, noop sink timed, min of 3
after one warmup) and additionally counts the Spark jobs, stages and
tasks the timed run submits via the status tracker — the local proxy
for "how many passes / shuffles does this plan pay" (guide §1, §2).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from go_cdc_spark.plans.queries import QUERIES  # noqa: E402
from go_cdc_spark.session import get_spark  # noqa: E402


def profile_one(spark, name: str, sf_dir: str, runs: int = 3) -> dict:
    sc = spark.sparkContext
    # warmup (also builds codegen)
    df = QUERIES[name](spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    best = float("inf")
    counts = None
    for i in range(runs):
        df = QUERIES[name](spark, sf_dir)
        group = f"profile-{name}-{i}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        sc.setJobGroup(None, None)
        st = sc.statusTracker()
        job_ids = st.getJobIdsForGroup(group)
        n_stages = 0
        n_tasks = 0
        stage_ids = set()
        for jid in job_ids:
            ji = st.getJobInfo(jid)
            if ji is None:
                continue
            for sid in ji.stageIds:
                stage_ids.add(sid)
        for sid in stage_ids:
            si = st.getStageInfo(sid)
            if si is not None:
                n_stages += 1
                n_tasks += si.numTasks
        if dt < best:
            best = dt
            counts = {
                "jobs": len(job_ids),
                "stages": n_stages,
                "tasks": n_tasks,
            }
    return {"name": name, "sec": round(best, 3), **(counts or {})}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    spark = get_spark("go_cdc_spark-profile")
    out = []
    for name in args:
        r = profile_one(spark, name, sf_dir)
        print(json.dumps(r), flush=True)
        out.append(r)
    spark.stop()


if __name__ == "__main__":
    main()
