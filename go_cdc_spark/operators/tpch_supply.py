"""TPC-H supply-side plan archetypes (Q2/Q11/Q16/Q20 shapes).

The fixture has no ``partsupp`` table, so the part↔supplier
relationship is DERIVED from lineitem (the observed supply link):
``supply(partkey, suppkey)`` with per-pair aggregates standing in for
``ps_supplycost`` / ``ps_availqty``. The plan archetypes — the reason
these four queries exist in TPC-H — are preserved exactly:

- Q2:  correlated per-group MIN selection (min-cost supplier per part)
- Q11: scalar global-aggregate threshold (HAVING value > frac * total)
- Q16: distinct-link + NOT IN anti-join + COUNT(DISTINCT) rollup
- Q20: nested semi-joins gated by per-pair aggregate thresholds

With these, all 22 TPC-H plan archetypes are covered (Q1/Q3/Q5/Q6/Q10
in relational.py, the rest in tpch.py).

All revenue/value sums follow the DECIMAL accumulation policy from
relational.py (order-independent exact sums → bit-identical doubles on
both engines). Double division (price/qty) is IEEE-identical in Spark
and DuckDB, so MIN/threshold comparisons over it hash-match too.

Parity note: the reference (go-cdc) is a CDC pipeline with no query
engine; this suite is part of the derived analytic surface required by
SURVEY.md §2.B over the tables the reference replicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..tables import load
from .relational import _sql_sum, dsum


def _ntz(lit: str) -> F.Column:
    return F.lit(f"{lit} 00:00:00").cast("timestamp_ntz")


# Shared derivation: one exact-sum/min aggregate per observed
# (partkey, suppkey) supply link. 51.7k pairs at sf0.01; at 100 TB the
# pair count is bounded by |part|×avg-suppliers-per-part, far below the
# fact row count, so this is the classic "shrink before joining" step.
_SUPPLY_SQL = """
  SELECT l_partkey AS partkey, l_suppkey AS suppkey,
         MIN(l_extendedprice / l_quantity) AS supply_cost
  FROM lineitem
  GROUP BY l_partkey, l_suppkey
"""


def _supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("supply_cost"))


# ---------------------------------------------------------------------------
# Q2 — minimum-cost supplier: correlated per-part MIN over the supply
# relation, restricted to one region.
# ---------------------------------------------------------------------------


@query(
    "q2_min_cost_supplier",
    oracle=f"""
    WITH supply AS ({_SUPPLY_SQL}),
    eligible AS (
      SELECT partkey, supply_cost, s_acctbal, s_name, n_name
      FROM supply
      JOIN supplier ON s_suppkey = suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    ),
    mins AS (
      SELECT partkey AS mpartkey, MIN(supply_cost) AS min_cost
      FROM eligible GROUP BY partkey
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name, supply_cost
    FROM part
    JOIN eligible ON p_partkey = partkey
    JOIN mins ON partkey = mpartkey AND supply_cost = min_cost
    WHERE p_size = 15
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each size-15 part, the EUROPE supplier(s)
    offering its minimum observed unit cost — the correlated
    MIN-subquery archetype, decorrelated into aggregate + equality
    join-back.

    Scale shape: the supply relation aggregates lineitem down to
    |part|×|suppliers-per-part| pairs in one shuffle keyed on
    (partkey, suppkey); the region restriction prunes BEFORE the
    per-part MIN, so the second aggregate and the join-back both run
    on the reduced pair set, co-partitioned on partkey (AQE coalesces
    the equality join's exchange into the MIN's). Nothing re-scans
    lineitem. nation/region keep explicit broadcast hints (25/5 rows
    at ANY SF); the supplier-derived dims relation and filtered part
    grow with SF, so their joins carry NO hint — the optimizer/AQE
    broadcasts while they fit and degrades to a shuffle join beyond
    the threshold (parity pinned by
    test_plans.py::test_broadcast_degradation_parity)."""
    su = load(spark, sf_dir, "supplier")
    na = load(spark, sf_dir, "nation")
    re = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    dims = (
        su.join(F.broadcast(na), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(re), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    eligible = _supply(spark, sf_dir).join(
        dims, F.col("suppkey") == F.col("s_suppkey")
    )
    mins = eligible.groupBy(F.col("partkey").alias("mpartkey")).agg(
        F.min("supply_cost").alias("min_cost")
    )
    pa = load(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    return (
        eligible.join(
            mins,
            (F.col("partkey") == F.col("mpartkey"))
            & (F.col("supply_cost") == F.col("min_cost")),
        )
        .join(pa, F.col("p_partkey") == F.col("partkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "supply_cost")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q11 — important stock: per-part value with a scalar global threshold.
# ---------------------------------------------------------------------------


@query(
    "q11_important_stock",
    oracle=f"""
    WITH filtered AS (
      SELECT l_partkey, l_extendedprice * l_quantity AS val
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_7'
    )
    SELECT l_partkey AS partkey, {_sql_sum('val')} AS part_value
    FROM filtered
    GROUP BY l_partkey
    HAVING {_sql_sum('val')} > (
      SELECT {_sql_sum('val')} * 0.001 FROM filtered
    )
    ORDER BY part_value DESC, partkey
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose stocked value within one nation
    exceeds a fraction of that nation's total — the scalar-subquery-
    threshold archetype.

    Scale shape: the nation's supplier keys flow into the
    lineitem scan (map-side prune to ~1/|nation| of rows); ONE shuffle
    aggregates per-part value; the global total is a 1-row re-aggregate
    of the per-part partials (NOT a second lineitem scan) broadcast
    back as the threshold. Both sides of the `>` are decimal-exact
    doubles, so the HAVING hash-matches DuckDB."""
    su = load(spark, sf_dir, "supplier")
    na = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    supp = su.join(
        F.broadcast(na), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey")
    li = load(spark, sf_dir, "lineitem")
    filtered = li.join(
        supp, F.col("l_suppkey") == F.col("s_suppkey")
    ).select(
        "l_partkey", (F.col("l_extendedprice") * F.col("l_quantity")).alias("val")
    )
    per_part = filtered.groupBy(F.col("l_partkey").alias("partkey")).agg(
        dsum(F.col("val")).alias("part_value")
    )
    # Re-aggregate the per-part decimal partials for the global total:
    # sum-of-exact-sums equals the oracle's single exact sum.
    total = per_part.agg(
        (F.sum(F.col("part_value").cast("decimal(28,6)")).cast("double") * 0.001).alias(
            "threshold"
        )
    )
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("part_value") > F.col("threshold"))
        .select("partkey", "part_value")
        .orderBy(F.desc("part_value"), "partkey")
    )


# ---------------------------------------------------------------------------
# Q16 — parts/supplier relationship: COUNT(DISTINCT) + NOT IN anti-join.
# ---------------------------------------------------------------------------


@query(
    "q16_parts_supplier",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey AS partkey, l_suppkey AS suppkey
          FROM lineitem) supply
    JOIN part ON p_partkey = partkey
    WHERE p_brand <> 'Brand#5'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7'
      )
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16_parts_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers can provide each
    surviving (brand, type, size) bucket, excluding a complaint-listed
    supplier set — distinct-link + anti-join + COUNT(DISTINCT) rollup.

    Scale shape: the supply link dedups in one (partkey, suppkey)
    shuffle; the excluded-supplier list is dim-sized and broadcast as a
    left-anti hash join (NOT IN with non-nullable keys ≡ anti join);
    part joins un-hinted with its filters applied map-side. The final
    COUNT(DISTINCT suppkey) expands to a two-phase distinct-aggregate —
    partial distinct within partitions before the (brand,type,size)
    exchange, so the wide shuffle carries deduped pairs only."""
    li = load(spark, sf_dir, "lineitem")
    supply = li.select(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).distinct()
    bad = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_name").like("%7"))
        .select("s_suppkey")
    )
    pa = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin([1, 4, 9, 14, 19, 23, 36, 45])
    )
    return (
        supply.join(bad, F.col("suppkey") == F.col("s_suppkey"), "left_anti")
        .join(pa, F.col("p_partkey") == F.col("partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# ---------------------------------------------------------------------------
# Q20 — potential part promotion: nested semi-joins over aggregate
# thresholds.
# ---------------------------------------------------------------------------


@query(
    "q20_potential_promotion",
    oracle=f"""
    WITH pair_qty AS (
      SELECT l_partkey AS partkey, l_suppkey AS suppkey,
             {_sql_sum('l_quantity')} AS qty_all,
             {_sql_sum("CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' "
                       "AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00' "
                       "THEN l_quantity END")} AS qty96
      FROM lineitem
      GROUP BY l_partkey, l_suppkey
    )
    SELECT s_name, s_acctbal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_5'
      AND s_suppkey IN (
        SELECT suppkey FROM pair_qty
        JOIN part ON p_partkey = partkey
        WHERE p_name LIKE 'small%'
          AND qty96 IS NOT NULL
          AND qty_all > 1.5 * qty96
      )
    ORDER BY s_name
    """,
)
def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers in one nation holding excess stock of
    'small*' parts — per-(part,supplier) aggregate thresholds feeding a
    nested IN (semi join) that gates the outer supplier scan.

    Scale shape: both the all-time and the 1996 quantity aggregate
    come out of ONE conditional-sum pass over lineitem (one shuffle on
    the pair key, two sum buffers) — not two scans joined after; the
    part-name filter joins into the pair set (un-hinted); the candidate
    supplier keys collapse via the semi join (dedup for free) and the
    outer side is dim-sized. The `1.5 ×` threshold compares
    decimal-exact doubles, so the semi-join membership hash-matches
    DuckDB."""
    li = load(spark, sf_dir, "lineitem")
    in96 = (F.col("l_shipdate") >= _ntz("1996-01-01")) & (
        F.col("l_shipdate") < _ntz("1997-01-01")
    )
    pa = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    # r14 (guide §3.2): the part-name screen keeps ~13% of parts, so
    # semi-join it into lineitem BEFORE the pair aggregate — the pair
    # shuffle drops ~8x (591k -> ~75k pair rows at sf0.1) and the
    # post-agg join disappears. Identical candidates: part keys are
    # unique, so join-after-agg == filter-before-agg per pair.
    li_small = li.join(
        F.broadcast(pa), li.l_partkey == pa.p_partkey, "left_semi"
    )
    pair_qty = li_small.groupBy(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).agg(
        dsum(F.col("l_quantity")).alias("qty_all"),
        dsum(F.when(in96, F.col("l_quantity"))).alias("qty96"),
    )
    candidates = pair_qty.filter(
        F.col("qty96").isNotNull() & (F.col("qty_all") > 1.5 * F.col("qty96"))
    ).select("suppkey")
    su = load(spark, sf_dir, "supplier")
    na = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    return (
        su.join(F.broadcast(na), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(candidates, F.col("s_suppkey") == F.col("suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )
