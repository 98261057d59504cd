#!/usr/bin/env python
"""Same-host prior-code A/B for bench drift adjudication (VERDICT r10 #2).

When a query's bench ratio stands out above the run-median drift, the
only valid ground truth for "host, not build" is this A/B: check the
prior round's commit out into a git worktree and run the SAME query
interleaved (prior/current/prior/current, min-of-N) in ONE session on
the SAME host — never two sequential blocks (SCALE.md noisy-host rule;
a sequential probe once read 1.48× where interleaved gave 0.96×).

Appends a machine-readable row per query to DRIFT_AB.jsonl. A row only
feeds bench.py's regression-gate allowlist when its ``round`` equals
the round currently being built (the expiring-gate contract) — pass
--round to stamp it; rows without the current round are history.

Usage:
  python tools/drift_ab.py <prior_commit> <query> [query ...] \
      [--round N] [--reps 3] [--sf-dir DIR] [--dry]

The prior worktree's QUERIES registry is imported in a SUBPROCESS per
rep (its package must shadow the repo's), so the two code versions
never share a Python process.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR_DEFAULT = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

_RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, sys.argv[1])  # code root under test (repo or worktree)
from go_cdc_spark.plans.queries import QUERIES
from go_cdc_spark.session import get_spark
sf_dir = sys.argv[2]
names = sys.argv[3].split(",")
spark = get_spark("drift-ab")
out = {}
for name in names:
    QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()  # warmup
    best = float("inf")
    for _ in range(int(sys.argv[4])):
        df = QUERIES[name](spark, sf_dir)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    out[name] = round(best, 3)
print("DRIFT_AB_RESULT " + json.dumps(out))
spark.stop()
"""


def _run_side(code_root: str, names: list[str], sf_dir: str, reps: int) -> dict:
    proc = subprocess.run(
        [sys.executable, "-c", _RUNNER, code_root, sf_dir, ",".join(names), str(reps)],
        capture_output=True, text=True, timeout=1800,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("DRIFT_AB_RESULT "):
            return json.loads(line[len("DRIFT_AB_RESULT "):])
    raise RuntimeError(
        f"runner produced no result (rc={proc.returncode}):\n{proc.stderr[-2000:]}"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("prior_commit")
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--round", type=int, default=None,
                    help="stamp rows with this round (required to feed the gate)")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--interleave", type=int, default=2,
                    help="prior/current alternations (min across them)")
    ap.add_argument("--sf-dir", default=SF_DIR_DEFAULT)
    ap.add_argument("--dry", action="store_true", help="print rows, don't append")
    args = ap.parse_args()

    wt = tempfile.mkdtemp(prefix="drift_ab_wt_")
    subprocess.run(
        ["git", "-C", REPO, "worktree", "add", "--detach", wt, args.prior_commit],
        check=True, capture_output=True,
    )
    try:
        prior: dict[str, float] = {}
        current: dict[str, float] = {}
        for i in range(args.interleave):  # interleaved, never sequential blocks
            p = _run_side(wt, args.queries, args.sf_dir, args.reps)
            c = _run_side(REPO, args.queries, args.sf_dir, args.reps)
            print(f"alt {i}: prior {p}  current {c}", file=sys.stderr)
            for k, v in p.items():
                prior[k] = min(prior.get(k, v), v)
            for k, v in c.items():
                current[k] = min(current.get(k, v), v)
    finally:
        subprocess.run(["git", "-C", REPO, "worktree", "remove", "--force", wt],
                       capture_output=True)

    rows = []
    for name in args.queries:
        ratio = round(current[name] / prior[name], 3) if prior.get(name) else None
        rows.append({
            "round": args.round,
            "query": name,
            # gate bound: what this A/B justifies excusing — the prior
            # code's time on TODAY'S host vs the pool median is host
            # drift; anything beyond current/prior ~1.0 is build-caused
            "max_ratio": None,
            "ab": {
                "prior_commit": args.prior_commit,
                "prior_commit_code_s": prior.get(name),
                "current_code_s": current.get(name),
                "current_over_prior": ratio,
                "sf_dir": args.sf_dir,
                "protocol": f"interleaved x{args.interleave}, min-of-{args.reps} each side, same host/session-recipe",
            },
        })
    for row in rows:
        print(json.dumps(row))
    if not args.dry:
        with open(os.path.join(REPO, "DRIFT_AB.jsonl"), "a") as f:
            for row in rows:
                f.write(json.dumps(row) + "\n")
        print(
            "NOTE: rows appended with max_ratio=null — they do NOT feed the "
            "gate until you set max_ratio (the pool-median ratio the A/B "
            "justifies) and the round matches the one being built.",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
