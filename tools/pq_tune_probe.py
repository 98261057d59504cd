#!/usr/bin/env python
"""(m, k, rounds) sweep for the PQ ADC route — the tuned-arm search
behind the frontier's low-recall PQ points (VERDICT r9 #3): m controls
quantization granularity (per-subspace dim = DIM/m), k the codebook
size, rounds the Lloyd refinement depth. Prints recall@TOP_K vs exact
brute force plus the code bytes per vector (m*ceil(log2 k)/8) and the
compression ratio vs raw float32 storage.

Usage: python tools/pq_tune_probe.py [--nq N] [m,k,rounds ...]
       (default --nq 64 over a ladder of combos)
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from go_cdc_spark.operators.similarity import DIM, _pq_adc_topk  # noqa: E402
from go_cdc_spark.session import get_spark  # noqa: E402
from pq_recall_curve import SFS, exact_pairs  # noqa: E402

DEFAULT = [(4, 8, 1), (4, 32, 2), (8, 16, 1), (8, 32, 1), (8, 32, 2), (8, 64, 2), (16, 16, 2)]


def main() -> None:
    args = sys.argv[1:]
    nq = 64
    if args and args[0] == "--nq":
        nq = int(args[1])
        args = args[2:]
    combos = [tuple(int(x) for x in a.split(",")) for a in args] or DEFAULT
    spark = get_spark("pq-tune")
    raw_bytes = DIM * 4  # float32 storage baseline
    print(f"{'sf':>8} {'m':>3} {'k':>4} {'r':>2} {'code_B':>7} {'compress':>9} {'recall@5':>9}  hits/expected (nq={nq})")
    for sf in SFS:
        exact = exact_pairs(spark, sf, nq)
        for m, k, r in combos:
            code_bytes = m * math.ceil(math.log2(k)) / 8
            ann = {
                (row.query_id, row.cand_id)
                for row in _pq_adc_topk(
                    spark, sf, k=k, n_queries=nq, m=m, rounds=r
                ).collect()
            }
            hits = len(exact & ann)
            print(
                f"{os.path.basename(sf):>8} {m:>3} {k:>4} {r:>2} {code_bytes:>7.1f}"
                f" {raw_bytes / code_bytes:>8.0f}x {hits / len(exact):>9.3f}  {hits}/{len(exact)}",
                flush=True,
            )


if __name__ == "__main__":
    main()
