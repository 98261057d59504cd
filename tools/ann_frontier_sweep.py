#!/usr/bin/env python
"""ANN recall-vs-candidate-volume sweep (VERDICT r8 prescription #5):
measure every route's recall@TOP_K AND the number of exactly-scored
candidate pairs it generates, across the tunable knobs — the frontier
that says what a recall point COSTS. Feeds the tuned-arm choice for
the registered `ann_recall_frontier` query and the COVERAGE.md table.

Usage: python tools/ann_frontier_sweep.py [sf_dir ...]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from go_cdc_spark.operators import similarity as S
from go_cdc_spark.session import get_spark

SF_DIRS = sys.argv[1:] or ["/root/testdata/sf0.01"]


def _pairs(df):
    return df.select("query_id", "cand_id")


def measure(spark, sf_dir: str) -> list[dict]:
    exact = _pairs(S.sim_topk(spark, sf_dir)).persist()
    expected = exact.count()
    assign = S._coarse_assign(spark, sf_dir).localCheckpoint(eager=False)

    rows = []

    def arm(name, ann_df, candidates):
        hits = exact.join(_pairs(ann_df), ["query_id", "cand_id"], "left_semi").count()
        rows.append(
            {
                "route": name,
                "candidates": candidates,
                "recall": round(hits / expected, 3),
                "hits": hits,
                "expected": expected,
            }
        )
        print(f"{name:24s} cand={candidates:>8} recall={hits / expected:.3f}", flush=True)

    # brute force reference
    nq = S.N_QUERIES
    ncand = (
        S.load(spark, sf_dir, "embeddings").filter(F.col("vec_id") >= nq).count()
    )
    arm("brute_force", S.sim_topk(spark, sf_dir), ncand * nq)

    # LSH arms (fixed knobs — bucket bits are module literals)
    emb = S.load(spark, sf_dir, "embeddings")
    b = emb.select("vec_id", S.bucket_col("embedding").alias("bucket"))
    lsh_cand = (
        b.filter(F.col("vec_id") < nq)
        .join(b.filter(F.col("vec_id") >= nq), "bucket")
        .count()
    )
    arm("lsh_ann", S.sim_lsh_ann(spark, sf_dir), lsh_cand)
    # multiprobe candidates: each query probes its own bucket plus the
    # N_BITS Hamming-1 neighbors (same expansion the operator builds)
    probes = F.array(
        F.col("bucket"),
        *[
            F.col("bucket").bitwiseXOR(F.lit(1 << j)).cast("int")
            for j in range(S.N_BITS)
        ],
    )
    mp_cand = (
        b.filter(F.col("vec_id") < nq)
        .select(F.explode(probes).alias("bucket"))
        .join(b.filter(F.col("vec_id") >= nq).select("bucket"), "bucket")
        .count()
    )
    arm("lsh_multiprobe", S.sim_lsh_multiprobe(spark, sf_dir), mp_cand)

    # IVF nprobe sweep
    for nprobe in (1, 2, 3, 4, 6):
        q = assign.filter((F.col("vec_id") < nq) & (F.col("rn") <= nprobe)).select(
            F.col("vec_id").alias("query_id"), "centroid_id"
        )
        c = assign.filter((F.col("vec_id") >= nq) & (F.col("rn") == 1)).select(
            F.col("vec_id").alias("cand_id"), "centroid_id"
        )
        cand = q.join(c, "centroid_id").count()
        arm(f"ivf_nprobe{nprobe}", S._ivf_topk(spark, sf_dir, nprobe=nprobe, assign=assign), cand)

    # PQ codebook-size sweep (ADC over the whole corpus: candidates = all)
    for k in (8, 16, 32):
        arm(f"pq_adc_k{k}", S._pq_adc_topk(spark, sf_dir, k=k), ncand * nq)

    # IVF-PQ compositions
    for nprobe, k in ((2, 8), (4, 8), (4, 32)):
        q = assign.filter((F.col("vec_id") < nq) & (F.col("rn") <= nprobe)).select(
            F.col("vec_id").alias("query_id"), "centroid_id"
        )
        c = assign.filter((F.col("vec_id") >= nq) & (F.col("rn") == 1)).select(
            F.col("vec_id").alias("cand_id"), "centroid_id"
        )
        cand = q.join(c, "centroid_id").count()
        recon = S._pq_recon(spark, sf_dir, k=k).localCheckpoint(eager=False)
        df = S._ivf_pq_topk(
            spark, sf_dir, k=k, assign=assign, recon=recon, nprobe=nprobe
        )
        arm(f"ivf_pq_np{nprobe}_k{k}", df, cand)

    # residual IVF-PQ: queries probe _IVF_NPROBE cells against the
    # rn=1-assigned corpus — the same volume as ivf_nprobe{_IVF_NPROBE}
    q = assign.filter(
        (F.col("vec_id") < nq) & (F.col("rn") <= S._IVF_NPROBE)
    ).select(F.col("vec_id").alias("query_id"), "centroid_id")
    c = assign.filter((F.col("vec_id") >= nq) & (F.col("rn") == 1)).select(
        F.col("vec_id").alias("cand_id"), "centroid_id"
    )
    res_cand = q.join(c, "centroid_id").count()
    arm("ivf_pq_res", S._ivf_pq_res_topk(spark, sf_dir, assign=assign), res_cand)

    exact.unpersist()
    return rows


def main() -> None:
    spark = get_spark("ann-frontier")
    out = {}
    for d in SF_DIRS:
        print(f"== {d}")
        out[d] = measure(spark, d)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
