"""Link-analysis over relationship graphs derived from the replicated
tables: PageRank on the customer↔supplier purchase graph.

Together with connected components (operators/dedup.py `dedup_clusters`)
and Lloyd k-means (operators/similarity.py `kmeans_centroids`) this
completes the iterative-algorithm family: each iteration is a
declarative join+aggregate round, unrolled a fixed number of times so
Catalyst sees one plan (no driver-side convergence loop in the oracle-
checked form).

Cross-engine exactness: every per-edge contribution is an IEEE double
(deterministic), accumulated through DECIMAL(18,12) (order-independent;
double→decimal rounding verified identical Spark vs DuckDB), and the
damping arithmetic uses the same double expression tree on both sides —
so even after 5 iterations the ranks hash-match bit-exactly.

Parity note: derived analytic surface (SURVEY.md §2.B); the reference
(go-cdc) has no graph surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..tables import load

_ITERS = 5
_DAMP = 0.85
# literal, NOT computed as 1-_DAMP: Python/Spark would binary-compute
# 0.15000000000000002 while DuckDB constant-folds decimal literals to the
# double of exactly 0.15 — a 1-ulp teleport difference every iteration.
_TELEPORT = 0.15

# Exact accumulation of sub-1.0 rank mass: scaled sums stay below 2^53
# only for small graphs, so the VARCHAR hop applies as usual.
_CSUM = (
    "CAST(CAST(SUM(CAST({x} AS DECIMAL(18,12))) AS VARCHAR) AS DOUBLE)"
)


def _build_oracle() -> str:
    """Unrolled 5-iteration PageRank as chained CTEs."""
    head = f"""
WITH pairs AS (
  SELECT DISTINCT o_custkey AS ck, l_suppkey AS sk
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
edges AS (
  SELECT 'c:' || ck AS src, 's:' || sk AS dst FROM pairs
  UNION ALL
  SELECT 's:' || sk, 'c:' || ck FROM pairs
),
deg AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS deg FROM edges GROUP BY src),
nodes AS (SELECT DISTINCT src AS node FROM edges),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
r0 AS (SELECT node, 1.0 / nn.n AS rank FROM nodes CROSS JOIN nn)
"""
    its = []
    for i in range(1, _ITERS + 1):
        prev = f"r{i - 1}"
        csum = _CSUM.format(x=f"p.rank / d.deg")
        its.append(f""",
c{i} AS (
  SELECT e.dst AS node, {csum} AS mass
  FROM edges e JOIN {prev} p ON e.src = p.node JOIN deg d ON e.src = d.src
  GROUP BY e.dst
),
r{i} AS (
  SELECT n.node,
         {_TELEPORT} / nn.n + {_DAMP} * COALESCE(c.mass, 0.0) AS rank
  FROM nodes n CROSS JOIN nn LEFT JOIN c{i} c ON n.node = c.node
)""")
    tail = f"""
SELECT node, rank FROM r{_ITERS} ORDER BY node
"""
    return head + "".join(its) + tail


_PINNED: list = []  # previous invocation's cached relations (evicted next call)


@query("pagerank_purchase_graph", oracle=_build_oracle())
def pagerank_purchase_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-iteration (_ITERS) damped PageRank over the bipartite
    customer↔supplier purchase graph (distinct order lineitem pairs,
    both directions, so every node has out-edges — no dangling-mass
    term needed).

    Scale shape: the edge list is built once (one orders⋈lineitem
    shuffle, then DISTINCT on the pair) and reused by all iterations;
    each iteration is exactly one shuffle — contributions aggregate
    by dst — plus a broadcast of the per-src degree (node-sized, dim
    table at fact scale... degree and rank relations are |V|-sized
    while edges are |E|-sized, so rank⋈edges broadcasts rank when |V|
    fits and falls back to a co-partitioned src join when it doesn't;
    AQE makes that call per iteration). The node count enters as a
    1-row broadcast, never a driver collect. Unrolling the iterations
    keeps the whole computation one Catalyst plan;
    checkpoint/cache the rank relation every few iterations at real
    scale to cap lineage depth."""
    while _PINNED:  # bound the cache leak: at most one invocation live
        _PINNED.pop().unpersist()
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    pairs = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("ck"), F.col("l_suppkey").alias("sk"))
        .distinct()
    )
    e1 = pairs.select(
        F.concat(F.lit("c:"), F.col("ck")).alias("src"),
        F.concat(F.lit("s:"), F.col("sk")).alias("dst"),
    )
    e2 = pairs.select(
        F.concat(F.lit("s:"), F.col("sk")).alias("src"),
        F.concat(F.lit("c:"), F.col("ck")).alias("dst"),
    )
    # Loop-invariant relations are persisted AND materialized eagerly:
    # they appear in every unrolled iteration's subtree, exchange-reuse
    # does not dedupe them across iterations, and a LAZY persist still
    # recomputes — the iteration stages run concurrently and race to
    # populate the cache (measured: 21s plain, 30s lazy-persist, 7s
    # eager — all cold-cache, sf0.1). This is the standard
    # iterate-over-cached-edges pattern: edges pinned memory/disk,
    # rank deltas flowing through one shuffle per iteration.
    edges = e1.union(e2)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).cast("double").alias("deg"))
    edged = edges.join(deg, "src").persist()
    edged.count()
    nodes = edges.select(F.col("src").alias("node")).distinct().persist()
    nodes.count()  # eager for the same concurrent-populate race as edged
    _PINNED.extend([edged, nodes])
    nn = nodes.agg(F.count(F.lit(1)).cast("double").alias("n"))

    rank = nodes.join(F.broadcast(nn)).select(
        "node", (F.lit(1.0) / F.col("n")).alias("rank")
    )
    for _ in range(_ITERS):
        contrib = (
            edged.join(rank.withColumnRenamed("node", "src"), "src")
            .select("dst", (F.col("rank") / F.col("deg")).alias("x"))
            .groupBy("dst")
            .agg(
                F.sum(F.col("x").cast("decimal(18,12)")).cast("double").alias("mass")
            )
        )
        rank = (
            nodes.join(F.broadcast(nn))
            .join(contrib.withColumnRenamed("dst", "node"), "node", "left")
            .select(
                "node",
                (
                    F.lit(_TELEPORT) / F.col("n")
                    + _DAMP * F.coalesce(F.col("mass"), F.lit(0.0))
                ).alias("rank"),
            )
        )
    return rank.orderBy("node")
