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
from ..tables import load


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
