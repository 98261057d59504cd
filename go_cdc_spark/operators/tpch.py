"""Extended TPC-H-shaped suite (Q4/Q7/Q8/Q12-Q15/Q17-Q19/Q21/Q22 shapes).

Complements the Q1/Q3/Q5/Q6/Q10 shapes in relational.py with the
remaining plan archetypes expressible over the fixture schema (which
has no partsupp and no l_shipmode/l_commitdate/l_receiptdate — queries
needing those columns are adapted to equivalent plan shapes on the
columns that exist, noted per query):

- existential semi/anti joins (Q4, Q21, Q22)
- two-sided dimension self-join with disjunctive nation pairing (Q7)
- nested-aggregate market share (Q8)
- conditional (CASE) aggregation (Q12, Q14)
- outer-join distribution (Q13)
- max-of-aggregate selection (Q15)
- correlated per-group average threshold (Q17)
- group-having semi-join on aggregated keys (Q18)
- disjunction-of-conjunctions pushdown (Q19)

All revenue sums follow the DECIMAL accumulation policy from
relational.py (order-independent exact sums, hash-parity with DuckDB).

Parity note: the reference (go-cdc) is a CDC pipeline with no query
engine; this suite is part of the derived analytic surface required by
SURVEY.md §2.B over the tables the reference replicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..plans.registry import query
from ..tables import load
from .relational import _sql_avg, _sql_sum, davg, dsum

def _ntz(lit: str) -> F.Column:
    return F.lit(f"{lit} 00:00:00").cast("timestamp_ntz")


# ---------------------------------------------------------------------------
# Q4 — order priority checking: EXISTS → left-semi join.
# Adapted: "late lineitem" = l_shipdate > o_orderdate (fixture has no
# commitdate/receiptdate); the plan shape (filtered fact semi-joined on
# an equi key + residual non-equi condition, then tiny agg) is Q4's.
# ---------------------------------------------------------------------------


@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: quarter-filtered orders that have at least one
    late lineitem, counted per priority.

    Scale shape: the EXISTS compiles to a left-semi hash join keyed on
    the order key (one shuffle each side; the date filter pushes to the
    orders scan and bounds the build side); the semi join dedups
    multi-line orders for free — no distinct, no count-then-filter."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ntz("1996-07-01"))
        & (F.col("o_orderdate") < _ntz("1996-10-01"))
    )
    li = load(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (li.l_orderkey == o.o_orderkey) & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Q7 — volume shipping between two nations.
# ---------------------------------------------------------------------------


@query(
    "q7_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           {_sql_sum('volume')} AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations per
    shipment year — the same dimension (nation) joined twice under a
    disjunctive pairing predicate.

    Scale shape: both nation joins broadcast (25 rows at any SF); the
    disjunction sits on broadcast-side columns so it's evaluated
    map-side after the hash lookups, never forcing a nested-loop join.
    The big-side shuffles are lineitem⋈orders and orders⋈customer —
    the shipdate filter pushes into the lineitem scan first."""
    su = load(spark, sf_dir, "supplier")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ntz("1996-01-01"))
        & (F.col("l_shipdate") < _ntz("1998-01-01"))
    )
    o = load(spark, sf_dir, "orders")
    cu = load(spark, sf_dir, "customer")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        su.join(li, su.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(cu, cu.c_custkey == o.o_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ---------------------------------------------------------------------------
# Q8 — national market share: ratio of two conditional aggregates.
# ---------------------------------------------------------------------------


@query(
    "q8_market_share",
    oracle=f"""
    SELECT o_year,
           {_sql_sum("CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END")}
             / {_sql_sum('volume')} AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region    ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        AND p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's order volume
    for one part type, per year — a ratio of conditional aggregate over
    total aggregate computed in a single grouped pass.

    Scale shape: part is pre-filtered on p_type and joined FIRST
    (prunes lineitem early — the most selective edge goes first), but
    deliberately NOT hint-broadcast: part grows with SF, so the
    broadcast decision belongs to the optimizer/AQE, which broadcasts
    the filtered side while it fits and degrades to a shuffle join
    when it outgrows the threshold (hash-identical either way —
    pinned by test_plans.py::test_broadcast_degradation_parity).
    Only the genuinely SF-invariant dims (nation 25 rows, region 5)
    keep explicit hints. The only big shuffles are lineitem⋈orders
    and orders⋈customer. Both sums come out of ONE hash aggregate
    (CASE inside sum), not two passes."""
    pa = load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = load(spark, sf_dir, "lineitem")
    su = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ntz("1996-01-01"))
        & (F.col("o_orderdate") < _ntz("1998-01-01"))
    )
    cu = load(spark, sf_dir, "customer")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    re = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(pa, F.col("p_partkey") == F.col("l_partkey"))
        .join(su, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cu, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(re), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            (
                dsum(F.when(F.col("nation") == "NATION_3", volume).otherwise(F.lit(0.0)))
                / dsum(volume)
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# Q12 — shipping-mode priority counts: join + CASE aggregation.
# Adapted: fixture has no l_shipmode, so the group key is l_linestatus
# and "late" = shipped >30 days after order date; the plan shape
# (fact⋈fact join, conditional counts in one agg) is Q12's.
# ---------------------------------------------------------------------------


@query(
    "q12_priority_shipping",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 30 DAY
      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: how many high- vs low-priority orders shipped
    late, per line status — two conditional counts in one grouped pass.

    Scale shape: the year filter pushes to the lineitem scan; the
    residual late-by-30-days predicate evaluates post-join (it spans
    both sides). One fact⋈fact shuffle on the order key, one tiny agg."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ntz("1997-01-01"))
        & (F.col("l_shipdate") < _ntz("1998-01-01"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution: outer join + two-level agg.
# Adapted: the o_comment NOT LIKE filter becomes a priority filter
# (fixture has no comments); the shape (filtered LEFT join preserving
# zero-order customers, count per customer, histogram of counts) is Q13's.
# ---------------------------------------------------------------------------


@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey
                      AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of per-customer order counts —
    LEFT join (so zero-order customers count as 0), per-customer count,
    then a histogram over the counts.

    Scale shape: the priority filter applies to the orders side BEFORE
    the join (inside the join's ON for outer-join correctness); first
    agg shuffles on c_custkey, the second on the tiny count domain —
    partial aggregation collapses both map-side."""
    cu = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        cu.join(
            o,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# ---------------------------------------------------------------------------
# Q14 — promotion effect: ratio of conditional to total revenue.
# ---------------------------------------------------------------------------


@query(
    "q14_promo_effect",
    oracle=f"""
    SELECT 100.0 * {_sql_sum("CASE WHEN p_type = 'PROMO' "
                             "THEN l_extendedprice * (1 - l_discount) ELSE 0 END")}
             / {_sql_sum('l_extendedprice * (1 - l_discount)')} AS promo_revenue
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
    """,
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: percentage of one month's revenue from PROMO
    parts — conditional and total sums from one aggregate, divided.

    Scale shape: part joins un-hinted (AQE broadcasts the filtered
    side while it fits, shuffle-join beyond); the month filter prunes
    the lineitem scan to ~1/80th; the whole query is map-side join +
    singleton aggregate, no fact shuffle at all."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ntz("1996-09-01"))
        & (F.col("l_shipdate") < _ntz("1996-10-01"))
    )
    pa = load(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(pa, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0)
                * dsum(F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0.0)))
                / dsum(disc)
            ).alias("promo_revenue")
        )
    )


# ---------------------------------------------------------------------------
# Q15 — top supplier: aggregate, then select the max of the aggregate.
# ---------------------------------------------------------------------------


@query(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue0 AS (
      SELECT l_suppkey AS supplier_no,
             {_sql_sum('l_extendedprice * (1 - l_discount)')} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier
    JOIN revenue0 ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue0)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with the quarter's maximum revenue
    — an aggregate reused both as join input and inside a scalar-max
    selection.

    Scale shape: revenue0 is computed once and the 1-row global max is
    broadcast back against it (no window-over-everything, no second
    scan of lineitem); the equality compare is safe because both sides
    carry the identical decimal-exact double. Supplier join broadcasts
    the (tiny) max-filtered revenue row set."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ntz("1996-01-01"))
        & (F.col("l_shipdate") < _ntz("1996-04-01"))
    )
    revenue0 = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "total_revenue"
        )
    )
    max_rev = revenue0.agg(F.max("total_revenue").alias("max_revenue"))
    top = revenue0.join(
        F.broadcast(max_rev), F.col("total_revenue") == F.col("max_revenue")
    )
    su = load(spark, sf_dir, "supplier")
    return (
        su.join(F.broadcast(top), F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue: correlated per-group average.
# Adapted: the p_container filter becomes a p_size bound (no containers
# in fixture); the shape (per-part average threshold applied back to
# the same fact rows) is Q17's.
# ---------------------------------------------------------------------------


@query(
    "q17_small_quantity",
    oracle=f"""
    SELECT {_sql_sum('l_extendedprice')} / 7.0 AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#4'
      AND p_size <= 25
      AND l_quantity < 0.2 * (
        SELECT {_sql_avg('l2.l_quantity')}
        FROM lineitem l2
        WHERE l2.l_partkey = p_partkey
      )
    """,
)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from orders of less than 20% of a
    part's average order quantity, for one brand — a correlated
    per-part average applied back to the part's own lineitems.

    Scale shape: the correlated subquery decorrelates to ONE extra
    aggregate over only the candidate parts' lineitems (filtered part
    joins into lineitem first — un-hinted, AQE picks broadcast while
    the filtered part fits — so both the avg input and the probe
    side are pruned to the brand's ~2% of rows), then an un-hinted join
    of the tiny per-part averages back onto the same pruned fact —
    lineitem is scanned once, shuffled never."""
    pa = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#4") & (F.col("p_size") <= 25)
    )
    li = load(spark, sf_dir, "lineitem")
    cand = li.join(pa, F.col("l_partkey") == F.col("p_partkey")).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    # cand is consumed twice (avg input + probe); both consumptions are
    # scan + broadcast-probe with no shuffle, so recomputing beats
    # persisting (a cache of a fact-sized join is the 100 TB mistake).
    part_avg = cand.groupBy(F.col("l_partkey").alias("avg_partkey")).agg(
        davg(F.col("l_quantity")).alias("avg_qty")
    )
    return (
        cand.join(part_avg, F.col("l_partkey") == F.col("avg_partkey"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg((dsum(F.col("l_extendedprice")) / F.lit(7.0)).alias("avg_yearly"))
    )


# ---------------------------------------------------------------------------
# Q18 — large-volume customers: HAVING on an aggregate, semi-joined back.
# ---------------------------------------------------------------------------


@query(
    "q18_large_volume",
    oracle=f"""
    SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
           {_sql_sum('l_quantity')} AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(38,6))) > 300
    )
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers who placed orders totalling >300
    units — an aggregate-derived key set (HAVING SUM) semi-joining the
    3-way join back down to a handful of orders.

    Scale shape: the qualifying order keys are a tiny aggregate output
    (p99 of per-order quantity is ~260), a left-semi build side that
    AQE broadcasts while it fits (un-hinted: it grows with SF)
    side into BOTH fact scans — lineitem AND orders — before anything
    joins. The customer join then sees only the surviving ~1% of
    orders (broadcast build side), so neither customers nor orders
    ever shuffle; the large-large form (customer⋈orders first, reduce
    later) would shuffle both full tables. Top-100 is
    TakeOrderedAndProject with a deterministic orderkey tie-break."""
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("qty"))
        .filter(F.col("qty") > 300)
        .select("l_orderkey")
    )
    li_big = li.join(big, "l_orderkey", "left_semi")
    o_big = load(spark, sf_dir, "orders").join(
        big.withColumnRenamed("l_orderkey", "o_orderkey"),
        "o_orderkey",
        "left_semi",
    )
    cu = load(spark, sf_dir, "customer")
    reduced = li_big.join(
        o_big, F.col("l_orderkey") == F.col("o_orderkey")
    )
    return (
        cu.join(reduced, F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum(F.col("l_quantity")).alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q19 — discounted revenue: disjunction of conjunctions across a join.
# Adapted: p_container/l_shipmode clauses become p_size bands (same
# OR-of-ANDs pushdown shape on the columns that exist).
# ---------------------------------------------------------------------------


@query(
    "q19_disjunctive_revenue",
    oracle=f"""
    SELECT {_sql_sum('l_extendedprice * (1 - l_discount)')} AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#2'  AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#4'  AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#19' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue from three OR-ed brand/size/quantity
    windows — the classic disjunctive-predicate pushdown test.

    Scale shape: Catalyst extracts the common-prefix conjuncts per
    side: part rows must match one of three (brand,size) bands and
    lineitem rows one of three quantity bands — both derivable
    single-side filters push to the scans, shrinking the join inputs
    before the full cross-side disjunction is checked post-join. Part
    joins un-hinted (AQE broadcast while it fits); no fact shuffle."""
    li = load(spark, sf_dir, "lineitem")
    pa = load(spark, sf_dir, "part")
    j = li.join(pa, F.col("p_partkey") == F.col("l_partkey"))
    band = (
        (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#4")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#19")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.filter(band).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# ---------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting: EXISTS + NOT EXISTS.
# Adapted: "late" = shipped >60 days after order date (no
# receipt/commit dates in fixture); the shape (semi + anti existential
# conditions over siblings within the same order) is Q21's.
# ---------------------------------------------------------------------------


@query(
    "q21_waiting_supplier",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F'
      AND n_name = 'NATION_3'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers in one nation who were the SOLE late
    shipper on a finished multi-supplier order — an EXISTS (another
    supplier participated) plus a NOT EXISTS (no other supplier was
    late) over sibling lineitems.

    Scale shape: both existentials depend only on per-order supplier
    sets, so they decorrelate into per-order WINDOW aggregates
    (distinct suppliers, distinct LATE suppliers) over the already-
    joined rows — ONE scan of lineitem⋈orders and ONE shuffle on
    l_orderkey, versus the aggregate-then-self-join form that scans
    and shuffles the join twice (measured 2× slower at sf0.1; no
    ReusedExchange fires there because the two branches differ by the
    is_late filter). Per-order state is bounded by suppliers-per-order
    (single digits). EXISTS ≡ n_supp ≥ 2; NOT EXISTS ≡ the late-
    supplier set is exactly {self} ≡ n_late_supp = 1 (l1 is itself
    late)."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    lo = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
            ).alias("is_late"),
        )
    )
    w = Window.partitionBy("l_orderkey")
    lo = lo.withColumn(
        "n_supp", F.size(F.collect_set("l_suppkey").over(w))
    ).withColumn(
        "n_late_supp",
        F.size(F.collect_set(F.when(F.col("is_late"), F.col("l_suppkey"))).over(w)),
    )
    su = load(spark, sf_dir, "supplier")
    na = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    return (
        lo.filter(
            F.col("is_late") & (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)
        )
        .join(su, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(na), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q22 — global sales opportunity: scalar-average filter + anti join.
# Adapted: phone-prefix country codes become nation keys, and "never
# ordered" (impossible in fixture — every customer has orders) becomes
# "never placed an URGENT order"; the shape (scalar subquery threshold
# + NOT EXISTS anti join + group) is Q22's.
# ---------------------------------------------------------------------------


@query(
    "q22_sales_opportunity",
    oracle=f"""
    SELECT cntrycode, COUNT(*) AS numcust,
           {_sql_sum('c_acctbal')} AS totacctbal
    FROM (
      SELECT c_nationkey AS cntrycode, c_acctbal, c_custkey
      FROM customer
      WHERE c_nationkey IN (1, 5, 7, 11, 13, 17, 19)
        AND c_acctbal > (
          SELECT {_sql_avg('c_acctbal')}
          FROM customer
          WHERE c_acctbal > 0.0
            AND c_nationkey IN (1, 5, 7, 11, 13, 17, 19)
        )
    ) custsale
    WHERE NOT EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
    )
    GROUP BY cntrycode
    ORDER BY cntrycode
    """,
)
def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: wealthy-but-inactive customers per country code
    — a scalar average as filter threshold, an anti join against
    orders, and a final per-code rollup.

    Scale shape: the scalar average is a 1-row aggregate cross-joined
    (broadcast) into the filter — never collected to the driver; the
    anti join's build side is only the URGENT orders (~20%), hashed on
    the customer key. Everything after the threshold filter operates on
    a small fraction of customers."""
    codes = [1, 5, 7, 11, 13, 17, 19]
    cu = load(spark, sf_dir, "customer").filter(F.col("c_nationkey").isin(codes))
    avg_bal = cu.filter(F.col("c_acctbal") > 0.0).agg(
        davg(F.col("c_acctbal")).alias("avg_bal")
    )
    urgent = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        cu.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum(F.col("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


# ---------------------------------------------------------------------------
# Q9 — product-type profit by nation and year. Adapted: no partsupp in
# the fixture, so "profit" is discounted revenue (the supplycost term
# drops); the plan shape — part-name filter fanned through a 5-way
# join, grouped by (nation, year) — is Q9's.
# ---------------------------------------------------------------------------


@query(
    "q9_product_profit",
    oracle=f"""
    SELECT n_name AS supp_nation,
           CAST(year(o_orderdate) AS BIGINT) AS o_year,
           {_sql_sum('l_extendedprice * (1 - l_discount)')} AS profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%widget%'
    GROUP BY supp_nation, o_year
    ORDER BY supp_nation, o_year DESC
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit on one product family, per supplier
    nation per order year — the widest join fan in the suite (lineitem
    against part, supplier, orders, nation at once).

    Scale shape: the part-name filter is the selectivity driver — it
    prunes the part side BEFORE the join (filter above the scan,
    the survivors join back un-hinted), so the big lineitem⋈orders
    join runs on pre-filtered lineitems. nation keeps its broadcast
    hint (25 rows at any SF); supplier joins un-hinted; the only
    big shuffle is lineitem⋈orders on orderkey, then the tiny
    (nation, year) aggregate."""
    li = load(spark, sf_dir, "lineitem")
    pa = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").contains("widget"))
        .select("p_partkey")
    )
    su = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    na = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(pa, F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(su, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(na), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("supp_nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("profit"))
        .orderBy(F.asc("supp_nation"), F.desc("o_year"))
    )
