"""Semi-structured and reshaping operators: JSON extraction, unpivot.

The events fixture carries a JSON payload column (``props``) — the
standard CDC pattern of a typed envelope with a schemaless tail
(mirrors how the reference transports row images as JSON text in its
changelog envelope, internal/cannal/handler.go). These operators give
that tail a queryable surface without a schema migration.

Parity note: the reference (go-cdc) is a CDC pipeline with no query
engine; this module is part of the derived analytic surface of
SURVEY.md §2.B.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..tables import fan_out, load
from .relational import _sql_sum, dsum


@query(
    "json_extract_props",
    oracle="""
    SELECT event_id, event_type,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
    ORDER BY event_id
    """,
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed extraction from the JSON props payload with a pushed
    predicate on the extracted value.

    Scale shape: ``get_json_object`` is a JVM codegen expression (no
    Python in the row path); the filter on the extracted value applies
    map-side in the same stage as the scan, so only matching rows ever
    leave the scan stage. Column pruning still reaches parquet — only
    (event_id, event_type, props) are read. r14 fan_out: the JSON
    parse of every payload ran on the single scan task; the rebalance
    spreads it (a no-op at real scan widths) and pruning/pushdown stay
    at the scan below it."""
    ev = fan_out(load(spark, sf_dir, "events"))
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return (
        ev.select("event_id", "event_type", k.alias("prop_k"))
        .filter(F.col("prop_k") > 50)
        .orderBy("event_id")
    )


@query(
    "json_props_rollup",
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS n_events,
           {_sql_sum("CAST(json_extract_string(props, '$.k') AS BIGINT)")} AS sum_k,
           MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def json_props_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate directly over a JSON-extracted field — extraction and
    partial aggregation fuse into the scan stage, so the shuffle
    carries |event_type| × 4 buffers, not the payloads."""
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("k")).alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


@query(
    "unpivot_measures",
    oracle="""
    SELECT l_orderkey, l_linenumber, metric, value FROM (
      SELECT l_orderkey, l_linenumber, 'quantity' AS metric,
             l_quantity AS value FROM lineitem WHERE l_orderkey < 300
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'extendedprice', l_extendedprice
      FROM lineitem WHERE l_orderkey < 300
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'discount', l_discount
      FROM lineitem WHERE l_orderkey < 300
    )
    ORDER BY l_orderkey, l_linenumber, metric
    """,
)
def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape of three lineitem measures (the inverse of the
    pivot in relational.py's ``pivot_status_priority``).

    Scale shape: ``unpivot`` compiles to a single Expand node — one
    scan emitting 3 rows per input row map-side, NO union of repeated
    scans (the oracle's UNION ALL form would scan the fact 3×; DuckDB
    is free to do that at 600-row test scale, we are not at 100 TB).
    The key filter pushes below the Expand into the parquet scan."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 300)
    return (
        li.unpivot(
            ["l_orderkey", "l_linenumber"],
            ["l_quantity", "l_extendedprice", "l_discount"],
            "metric",
            "value",
        )
        .withColumn(
            "metric",
            # align metric labels with the oracle's names
            F.regexp_replace(F.col("metric"), "^l_", ""),
        )
        .orderBy("l_orderkey", "l_linenumber", "metric")
    )
