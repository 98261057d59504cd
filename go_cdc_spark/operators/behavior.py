"""Behavioral analytics over the event stream: ordered funnels and
cohort retention.

These are the classic event-log analyses a CDC-replicated events table
feeds (the reference replicates the table; the analytic surface on top
is SURVEY.md §2.B). Both are expressed as staged per-user aggregations:

- **funnel** — strictly-ordered view → click → purchase conversion.
  Each stage is a per-user MIN(ts) aggregate of one event type,
  constrained to fall after the previous stage's timestamp. All stages
  key on user_id, so the stage joins are between already-co-partitioned
  aggregates (Catalyst reuses the exchange; AQE broadcasts the rapidly
  shrinking later stages). No window over the raw event stream — the
  100 TB event scan is touched exactly once per stage with the
  event-type filter pushed to the scan.
- **cohort retention** — users bucketed by the ISO week of their first
  event; activity counted per (cohort week, weeks-since-cohort) cell.
  One per-user MIN(ts) aggregate (broadcast back against the stream —
  user-count ≪ event-count), then a count-distinct keyed by the small
  (cohort, offset) grid with map-side partial distinct.

Timestamps stay TIMESTAMP_NTZ end-to-end (tables.load policy) and week
truncation/day arithmetic happen on DATE in both engines, so results
are timezone-invariant and hash-match DuckDB exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..tables import load

_FUNNEL_ORACLE = """
WITH v AS (
    SELECT user_id, MIN(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id
),
c AS (
    SELECT e.user_id, MIN(e.ts) AS t2
    FROM events e JOIN v USING (user_id)
    WHERE e.event_type = 'click' AND e.ts > v.t1
    GROUP BY e.user_id
),
p AS (
    SELECT e.user_id, MIN(e.ts) AS t3
    FROM events e JOIN c USING (user_id)
    WHERE e.event_type = 'purchase' AND e.ts > c.t2
    GROUP BY e.user_id
)
SELECT (SELECT COUNT(DISTINCT user_id) FROM events) AS n_users,
       (SELECT COUNT(*) FROM v) AS n_viewed,
       (SELECT COUNT(*) FROM c) AS n_clicked_after_view,
       (SELECT COUNT(*) FROM p) AS n_purchased_after_click
"""


@query("funnel_conversion", oracle=_FUNNEL_ORACLE)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered three-stage funnel: first view, first click
    after that view, first purchase after that click; one row of stage
    counts.

    Scale shape: each stage filters the event scan by type (pushed
    filter), aggregates MIN(ts) per user, and joins the previous stage
    on user_id. The stage frames shrink monotonically, so AQE turns the
    later joins into broadcasts; nothing is windowed over raw events.
    """
    ev = load(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        ev.agg(F.count_distinct("user_id").alias("n_users"))
        .crossJoin(v.agg(F.count("*").alias("n_viewed")))
        .crossJoin(c.agg(F.count("*").alias("n_clicked_after_view")))
        .crossJoin(p.agg(F.count("*").alias("n_purchased_after_click")))
    )


_COHORT_ORACLE = """
WITH first_ev AS (
    SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
    FROM events GROUP BY user_id
)
SELECT f.cohort_week,
       CAST(floor(date_diff('day', f.cohort_week, CAST(e.ts AS DATE)) / 7) AS INTEGER)
           AS week_offset,
       COUNT(DISTINCT e.user_id) AS n_users
FROM events e JOIN first_ev f USING (user_id)
GROUP BY 1, 2
"""


@query("cohort_retention", oracle=_COHORT_ORACLE)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by the ISO week (Monday
    start, both engines) of their first event; distinct active users per
    (cohort week, weeks since cohort) cell.

    Scale shape: one per-user MIN(ts) aggregate — the user dimension is
    orders of magnitude smaller than the event stream, so it broadcasts
    back onto the stream (no event-side shuffle for the join). The final
    count-distinct keys on the tiny (cohort, offset) grid; Spark plans
    it as the two-phase distinct-then-count aggregate with map-side
    partials.
    """
    ev = load(spark, sf_dir, "events")
    first_ev = ev.groupBy("user_id").agg(
        F.to_date(F.date_trunc("week", F.min("ts"))).alias("cohort_week")
    )
    return (
        ev.join(F.broadcast(first_ev), "user_id")
        .select(
            "user_id",
            "cohort_week",
            F.floor(F.datediff(F.to_date("ts"), F.col("cohort_week")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("user_id").alias("n_users"))
    )
