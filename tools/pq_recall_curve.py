#!/usr/bin/env python
"""PQ recall-vs-codebook curve: recall@TOP_K of the PQ ADC search
against exact brute-force ground truth, swept over the per-subspace
codebook size k — the knob the ANN table's "production uses 256" claim
rests on. The registered `ann_recall_at_k` query pins the oracle's
8-query set (40 pairs — recall granularity 0.025, too coarse for a
curve); this sweep widens the query set so each point averages over
enough pairs to rank the knob settings, and prints the codebook byte
size (m × k × subdim × 8 bytes) so the recall/bytes trade is recorded
as data.

Usage: python tools/pq_recall_curve.py [--nq N] [k ...]  (default
--nq 64, k = 8 32 64 128)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from go_cdc_spark.operators.similarity import (  # noqa: E402
    _PQ_M,
    _PQ_SUBDIM,
    TOP_K,
    _ivf_pq_res_topk,
    _ivf_pq_topk,
    _pq_adc_topk,
    cosine_from,
    dot_col,
    norm_col,
)
from go_cdc_spark.session import get_spark  # noqa: E402
from go_cdc_spark.tables import load  # noqa: E402

SFS = ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def exact_pairs(spark, sf_dir: str, n_queries: int) -> set[tuple[int, int]]:
    """Brute-force cosine top-{TOP_K} with the same query/candidate
    split as the ADC search (queries = vec_id < n_queries)."""
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", norm_col("embedding").alias("nrm")
    )
    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_norm"),
    )
    c = emb.filter(F.col("vec_id") >= n_queries).select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").alias("c_emb"),
        F.col("nrm").alias("c_norm"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    top = (
        F.broadcast(q)
        .crossJoin(c)
        .select(
            "query_id",
            "cand_id",
            cosine_from(dot_col("q_emb", "c_emb"), "q_norm", "c_norm").alias(
                "cosine"
            ),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
    )
    return {(r.query_id, r.cand_id) for r in top.collect()}


def main() -> None:
    args = sys.argv[1:]
    nq = 64
    if args and args[0] == "--nq":
        nq = int(args[1])
        args = args[2:]
    ks = [int(a) for a in args] or [8, 32, 64, 128]
    spark = get_spark("pq-recall-curve")
    print(
        f"{'sf':>8} {'k':>4} {'codebook_bytes':>14} {'route':>7} {'recall@5':>9}  hits/expected"
        f"  (nq={nq})"
    )
    for sf in SFS:
        exact = exact_pairs(spark, sf, nq)
        for k in ks:
            nbytes = _PQ_M * k * _PQ_SUBDIM * 8
            for route, fn in (
                ("pq_adc", _pq_adc_topk),
                ("ivf_pq", _ivf_pq_topk),
                ("ivf_pq_res", _ivf_pq_res_topk),
            ):
                ann = {
                    (r.query_id, r.cand_id)
                    for r in fn(spark, sf, k=k, n_queries=nq).collect()
                }
                hits = len(exact & ann)
                print(
                    f"{os.path.basename(sf):>8} {k:>4} {nbytes:>14}"
                    f" {route:>7} {hits / len(exact):>9.3f}  {hits}/{len(exact)}"
                )


if __name__ == "__main__":
    main()
