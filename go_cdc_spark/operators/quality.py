"""Data-quality audit operators: the validation pass a replication
engine runs over materialized tables (null rates, key uniqueness,
referential integrity, domain rules).

The reference replicates tables but never validates them; any real
deployment bolts a checker onto the sink. These make the checks
first-class queries so they run IN the engine, over the same scan
infrastructure, with the same scale properties.

Parity note: derived analytic surface (SURVEY.md §2.B); complements
table_checksum/table_diff (operators/cdc.py) which compare two
replicas — these validate ONE table against declared expectations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..tables import fan_out, load


@query(
    "dq_audit_orders",
    oracle="""
    WITH base AS (
      SELECT COUNT(*) AS n_rows,
             COUNT(*) - COUNT(o_custkey) AS null_custkey,
             COUNT(*) - COUNT(o_orderdate) AS null_orderdate,
             SUM(CASE WHEN o_totalprice <= 0.0 THEN 1 ELSE 0 END)
               AS nonpositive_price,
             SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END)
               AS bad_status,
             COUNT(*) - COUNT(DISTINCT o_orderkey) AS dup_pk
      FROM orders
    ),
    fk AS (
      SELECT COUNT(*) AS orphan_custkey
      FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE c.c_custkey IS NULL
    )
    SELECT rule, CAST(violations AS BIGINT) AS violations FROM (
      SELECT 'null_custkey' AS rule, CAST(null_custkey AS BIGINT) AS violations
        FROM base
      UNION ALL SELECT 'null_orderdate', CAST(null_orderdate AS BIGINT) FROM base
      UNION ALL SELECT 'nonpositive_price', CAST(nonpositive_price AS BIGINT)
        FROM base
      UNION ALL SELECT 'bad_status', CAST(bad_status AS BIGINT) FROM base
      UNION ALL SELECT 'dup_pk', CAST(dup_pk AS BIGINT) FROM base
      UNION ALL SELECT 'orphan_custkey', CAST(orphan_custkey AS BIGINT) FROM fk
      UNION ALL SELECT 'n_rows', CAST(n_rows AS BIGINT) FROM base
    )
    ORDER BY rule
    """,
)
def dq_audit_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality audit of the orders table: null rates
    on required columns, positive-amount and status-domain rules, PK
    uniqueness, and FK integrity to customer — one row per rule with
    its violation count.

    Scale shape: all row-level rules fold into ONE scan (conditional
    sums share the pass; COUNT(DISTINCT pk) rides the same aggregate
    via Expand); the FK check is a broadcast anti-join against the
    customer key column only. The unpivot to (rule, violations) rows
    happens on the 1-row aggregate — free. No rule re-scans the
    table."""
    o = load(spark, sf_dir, "orders")
    cu = load(spark, sf_dir, "customer").select("c_custkey")
    base = o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - F.count("o_custkey")).alias("null_custkey"),
        (F.count(F.lit(1)) - F.count("o_orderdate")).alias("null_orderdate"),
        F.sum(F.when(F.col("o_totalprice") <= 0.0, 1).otherwise(0)).alias(
            "nonpositive_price"
        ),
        F.sum(
            F.when(~F.col("o_orderstatus").isin(["O", "F", "P"]), 1).otherwise(0)
        ).alias("bad_status"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("dup_pk"),
    )
    orphans = (
        o.join(F.broadcast(cu), F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .agg(F.count(F.lit(1)).alias("orphan_custkey"))
    )
    wide = base.join(F.broadcast(orphans))
    return (
        wide.unpivot(
            [],
            [
                "null_custkey",
                "null_orderdate",
                "nonpositive_price",
                "bad_status",
                "dup_pk",
                "orphan_custkey",
                "n_rows",
            ],
            "rule",
            "violations",
        )
        .select("rule", F.col("violations").cast("bigint").alias("violations"))
        .orderBy("rule")
    )


_K_ANON = 5


@query(
    "k_anonymity_audit",
    oracle=f"""
    SELECT c_nationkey,
           c_mktsegment,
           CAST(FLOOR(c_acctbal / 2000.0) AS BIGINT) AS acctbal_band,
           CAST(COUNT(*) AS BIGINT) AS group_size,
           COUNT(*) < {_K_ANON} AS violates_k
    FROM customer
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over quasi-identifiers (nation, market
    segment, account-balance band): group sizes below k={_K_ANON} are
    re-identification risks that a privacy-preserving release must
    suppress or generalize — the privacy-side sibling of the PII
    redaction pass (operators/curation.py pii_redact).

    Scale shape: one hash aggregate on the QI tuple with map-side
    partial counts; the violation flag is a projection on the group
    row. Generalization loops (coarsen bands until all groups pass)
    re-run only this aggregate with a wider band divisor."""
    cu = load(spark, sf_dir, "customer")
    return (
        cu.groupBy(
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / 2000.0).cast("bigint").alias("acctbal_band"),
        )
        .agg(F.count(F.lit(1)).alias("group_size"))
        .select(
            "c_nationkey",
            "c_mktsegment",
            "acctbal_band",
            "group_size",
            (F.col("group_size") < _K_ANON).alias("violates_k"),
        )
        .orderBy("c_nationkey", "c_mktsegment", "acctbal_band")
    )


# ---------------------------------------------------------------------------
# Data-drift monitor: distribution shift of event types between the
# first and second half of the observation window (chi-square-style
# per-category components). The replication-side early warning that
# upstream behavior changed — schema drift's statistical sibling.
# Rational arithmetic only: every share is ONE IEEE division of exact
# integers and the component combines them with exact-rounded
# +,-,*,/ in an identical expression tree on both engines — no
# ln()/pow() (engine-dependent libm), so the output is bit-exact.
#
# Scale shape: one scan → map-side halves assignment (bounds arrive
# via a 1-row broadcast) → per-type conditional aggregate (map-side
# partials; category cardinality is tiny) → totals via a second
# 1-row broadcast. No corpus-sized shuffle at any scale.
# ---------------------------------------------------------------------------

_DRIFT_ORACLE = """
WITH ev AS (SELECT event_type, CAST(ts AS DATE) AS d FROM events),
b AS (SELECT MIN(d) AS d0, MAX(d) AS d1 FROM ev),
h AS (
    SELECT event_type,
           CASE WHEN 2 * datediff('day', d0, d) < datediff('day', d0, d1)
                THEN 0 ELSE 1 END AS half
    FROM ev, b
),
c AS (
    SELECT event_type,
           CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_early,
           CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_late
    FROM h GROUP BY event_type
),
t AS (
    SELECT CAST(SUM(n_early) AS BIGINT) AS t_early,
           CAST(SUM(n_late) AS BIGINT) AS t_late
    FROM c
)
SELECT event_type, n_early, n_late,
       CAST(n_early AS DOUBLE) / CAST(t_early AS DOUBLE) AS share_early,
       CAST(n_late AS DOUBLE) / CAST(t_late AS DOUBLE) AS share_late,
       (CAST(n_early AS DOUBLE) / CAST(t_early AS DOUBLE)
          - CAST(n_late AS DOUBLE) / CAST(t_late AS DOUBLE))
       * (CAST(n_early AS DOUBLE) / CAST(t_early AS DOUBLE)
          - CAST(n_late AS DOUBLE) / CAST(t_late AS DOUBLE))
       / (CAST(n_early AS DOUBLE) / CAST(t_early AS DOUBLE)
          + CAST(n_late AS DOUBLE) / CAST(t_late AS DOUBLE)) AS chi_component
FROM c, t
"""


@query("drift_chisq", oracle=_DRIFT_ORACLE)
def drift_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type distribution drift between the first and second half
    of the window: per-category counts, shares, and the chi-square
    component (share_early - share_late)² / (share_early + share_late).
    Categories whose component dominates drive the drift."""
    ev = load(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("d")
    )
    b = ev.agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
    halves = ev.crossJoin(F.broadcast(b)).select(
        "event_type",
        F.when(
            2 * F.datediff(F.col("d"), F.col("d0"))
            < F.datediff(F.col("d1"), F.col("d0")),
            F.lit(0),
        )
        .otherwise(F.lit(1))
        .alias("half"),
    )
    c = halves.groupBy("event_type").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("n_early"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("n_late"),
    )
    t = c.agg(
        F.sum("n_early").alias("t_early"), F.sum("n_late").alias("t_late")
    )
    se = F.col("n_early").cast("double") / F.col("t_early").cast("double")
    sl = F.col("n_late").cast("double") / F.col("t_late").cast("double")
    return c.crossJoin(F.broadcast(t)).select(
        "event_type",
        "n_early",
        "n_late",
        se.alias("share_early"),
        sl.alias("share_late"),
        ((se - sl) * (se - sl) / (se + sl)).alias("chi_component"),
    )


# ---------------------------------------------------------------------------
# Functional-dependency audit — the schema-inference side of data
# quality: does column A determine column B? The CDC angle: a violated
# FD that "should" hold is the classic symptom of a torn replication or
# a bad merge key, so replication QA suites run exactly this check.
# ---------------------------------------------------------------------------

_FD_SQL = """
WITH fd1 AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS lhs_values,
         CAST(SUM(CASE WHEN k > 1 THEN 1 ELSE 0 END) AS BIGINT) AS violating_lhs,
         CAST(MAX(k) AS BIGINT) AS max_rhs
  FROM (SELECT n_nationkey, COUNT(DISTINCT n_regionkey) AS k
        FROM nation GROUP BY n_nationkey)
),
fd2 AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS lhs_values,
         CAST(SUM(CASE WHEN k > 1 THEN 1 ELSE 0 END) AS BIGINT) AS violating_lhs,
         CAST(MAX(k) AS BIGINT) AS max_rhs
  FROM (SELECT o_custkey, COUNT(DISTINCT o_orderpriority) AS k
        FROM orders GROUP BY o_custkey)
),
fd3 AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS lhs_values,
         CAST(SUM(CASE WHEN k > 1 THEN 1 ELSE 0 END) AS BIGINT) AS violating_lhs,
         CAST(MAX(k) AS BIGINT) AS max_rhs
  FROM (SELECT l_partkey, COUNT(DISTINCT l_suppkey) AS k
        FROM lineitem GROUP BY l_partkey)
),
fd4 AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS lhs_values,
         CAST(SUM(CASE WHEN k > 1 THEN 1 ELSE 0 END) AS BIGINT) AS violating_lhs,
         CAST(MAX(k) AS BIGINT) AS max_rhs
  FROM (SELECT c.c_nationkey, COUNT(DISTINCT n.n_name) AS k
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY c.c_nationkey)
)
SELECT fd, lhs_values, violating_lhs, max_rhs,
       violating_lhs = 0 AS holds
FROM (
  SELECT 'nation.n_nationkey->n_regionkey' AS fd, * FROM fd1
  UNION ALL SELECT 'orders.o_custkey->o_orderpriority', * FROM fd2
  UNION ALL SELECT 'lineitem.l_partkey->l_suppkey', * FROM fd3
  UNION ALL SELECT 'customer.c_nationkey->nation.n_name', * FROM fd4
)
ORDER BY fd
"""


def _fd_summary(grouped: DataFrame, fd: str) -> DataFrame:
    """grouped = (lhs, k) with k = exact COUNT(DISTINCT rhs)."""
    return grouped.agg(
        F.count(F.lit(1)).cast("long").alias("lhs_values"),
        F.sum(F.when(F.col("k") > 1, 1).otherwise(0))
        .cast("long")
        .alias("violating_lhs"),
        F.max("k").cast("long").alias("max_rhs"),
    ).select(F.lit(fd).alias("fd"), "lhs_values", "violating_lhs", "max_rhs")


@query("dq_functional_deps", oracle=_FD_SQL)
def dq_functional_deps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audit four candidate functional dependencies — two that hold
    (key-determined), two that real data violates — reporting per FD
    the distinct LHS count, how many LHS values map to >1 RHS, and the
    worst fan-out. Exact BIGINT counts throughout (hash-checked).

    Scale shape: each FD is ONE keyed COUNT(DISTINCT) aggregate with
    map-side partials over its table (Spark plans distinct-aggregates
    as two-phase Expand; no row ever leaves its table scan except the
    FK join's broadcast dim), then a 1-row summary — the audit output
    is 4 rows regardless of data volume."""
    nation = load(spark, sf_dir, "nation")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    cust = load(spark, sf_dir, "customer")

    g1 = nation.groupBy("n_nationkey").agg(
        F.countDistinct("n_regionkey").alias("k")
    )
    g2 = orders.groupBy("o_custkey").agg(
        F.countDistinct("o_orderpriority").alias("k")
    )
    g3 = li.groupBy("l_partkey").agg(F.countDistinct("l_suppkey").alias("k"))
    g4 = (
        cust.join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            cust.c_nationkey == F.col("n_nationkey"),
        )
        .groupBy("c_nationkey")
        .agg(F.countDistinct("n_name").alias("k"))
    )
    out = (
        _fd_summary(g1, "nation.n_nationkey->n_regionkey")
        .unionByName(_fd_summary(g2, "orders.o_custkey->o_orderpriority"))
        .unionByName(_fd_summary(g3, "lineitem.l_partkey->l_suppkey"))
        .unionByName(_fd_summary(g4, "customer.c_nationkey->nation.n_name"))
    )
    return out.select(
        "fd",
        "lhs_values",
        "violating_lhs",
        "max_rhs",
        (F.col("violating_lhs") == 0).alias("holds"),
    ).orderBy("fd")


# ---------------------------------------------------------------------------
# Column completeness / cardinality profile (round 13).
# ---------------------------------------------------------------------------

_PROFILE_COLS = ("event_id", "ts", "user_id", "event_type", "value", "props")


@query(
    "quality_null_profile",
    oracle=" UNION ALL ".join(
        f"""
        SELECT '{c}' AS column_name,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_null,
               CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
               CAST((COUNT(*) - COUNT({c})) * 1000000 // COUNT(*) AS BIGINT)
                 AS null_ppm
        FROM events
        """
        for c in _PROFILE_COLS
    )
    + " ORDER BY column_name",
)
def quality_null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column data profile of the events stream: row count, null
    count, exact distinct cardinality, null rate (ppm) — the first
    audit run on any newly landed table, one row per column.

    Scale shape: ONE pass computes every per-column count (Spark's
    multi-distinct aggregate expands the input once per distinct
    column but keeps map-side partials; at 6 columns the expansion is
    a constant factor, not a join chain), then a 6-literal ``stack``
    unpivots driver-free. At 100 TB swap exact distincts for
    approx_count_distinct per column — the exact form is the
    oracle-checkable one."""
    # NOT fanned out (r14 interleaved A/B: plain 0.84s vs fanned
    # 1.25s): unlike profile_numeric's numeric columns, the distinct
    # targets here include high-cardinality strings/timestamps whose
    # per-partition distinct partials barely dedup — round-robin
    # multiplies them and shuffles more (the byval effect again).
    ev = load(spark, sf_dir, "events")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count(F.lit(1)).cast("long").alias(f"__rows_{c}"),
            (F.count(F.lit(1)) - F.count(c)).cast("long").alias(f"__null_{c}"),
            F.countDistinct(c).cast("long").alias(f"__dist_{c}"),
        ]
    wide = ev.agg(*aggs)
    stack = ", ".join(
        f"'{c}', __rows_{c}, __null_{c}, __dist_{c}" for c in _PROFILE_COLS
    )
    return (
        wide.select(
            F.expr(
                f"stack({len(_PROFILE_COLS)}, {stack}) "
                "AS (column_name, n_rows, n_null, n_distinct)"
            )
        )
        .select(
            "column_name", "n_rows", "n_null", "n_distinct",
            F.expr("CAST(n_null * 1000000 DIV n_rows AS BIGINT)").alias("null_ppm"),
        )
        .orderBy("column_name")
    )


# ---------------------------------------------------------------------------
# Benford leading-digit audit (round 13).
# ---------------------------------------------------------------------------


@query(
    "quality_benford",
    oracle="""
    SELECT digit, n,
           CAST(n * 1000000 // SUM(n) OVER () AS BIGINT) AS share_ppm
    FROM (
      SELECT substr(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR), 1, 1)
               AS digit,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM orders WHERE o_totalprice > 0
      GROUP BY 1
    ) ORDER BY digit
    """,
)
def quality_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford leading-digit audit of order totals: the observed
    first-significant-digit distribution (fabricated or truncated
    monetary data drifts from Benford's log curve; the expected curve
    needs log10 and stays with the consumer — ln/log are libm-drifty
    cross-engine). The leading digit is taken from the DECIMAL(18,2)
    string rendering, which is exact and identical in both engines —
    never from float formatting or a log10 bucket, both of which
    drift at digit boundaries.

    Scale shape: digit extraction is map-side; the aggregate has ≤9
    groups; the share normalizes with a window over that 9-row
    aggregate (one scan, no second pass for the total)."""
    from pyspark.sql.window import Window

    orders = load(spark, sf_dir, "orders")
    counts = (
        orders.filter(F.col("o_totalprice") > 0)
        .groupBy(
            F.substring(
                F.col("o_totalprice").cast("decimal(18,2)").cast("string"), 1, 1
            ).alias("digit")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    return (
        counts.withColumn("__tot", F.sum("n").over(Window.partitionBy()))
        .select(
            "digit", "n",
            F.expr("CAST(n * 1000000 DIV __tot AS BIGINT)").alias("share_ppm"),
        )
        .orderBy("digit")
    )
