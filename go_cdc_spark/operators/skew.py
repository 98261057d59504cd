"""Skew-mitigation utilities for hot-key joins and aggregations.

AQE's skew-join split handles sort-merge cases at runtime; explicit
salting remains necessary when (a) the skew is in a shuffled *hash*
aggregation, or (b) one key is so hot a single split still exceeds an
executor (the 100 TB failure mode: one user/document owns 1% of the
corpus). Both tools keep results exactly equal to their unsalted forms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join a skewed fact side against a smaller dim side with the
    hot keys spread over ``n_salts`` shuffle partitions.

    Fact rows take a per-row salt (row-uniform, NOT key-derived — a
    key-derived salt would send the hot key to one partition again);
    the dim side replicates once per salt value, so every fact row
    still meets its dim row exactly once. Cost: dim × n_salts rows
    through the shuffle — cheap by the premise that dim is the small
    side (were it broadcastable, you'd broadcast and skew wouldn't
    exist).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (dim side must be dense)")
    salted_facts = facts.withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int")
    )
    replicated_dim = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>"))
    )
    return salted_facts.join(replicated_dim, [*on, "__salt"], how).drop("__salt")


def two_phase_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Skew-safe groupBy for algebraic aggregates: pre-aggregate on
    (keys, salt) — hot keys split across ``n_salts`` reducers — then
    combine per key. ``aggs`` maps output name → (input column, fn)
    with fn ∈ {sum, count, min, max}: the re-aggregable subset (count
    recombines by summing partial counts).

    Spark's hash aggregate already does map-side partial combine; this
    helps when the *reduce* side still skews — i.e. the hot key's
    partials outnumber one reducer's share, which at 100 TB happens for
    power-law keys (one user = millions of partials across mappers).
    """
    first, second = [], []
    for out, (col, fn) in aggs.items():
        if fn == "sum":
            first.append(F.sum(col).alias(out))
            second.append(F.sum(out).alias(out))
        elif fn == "count":
            first.append(F.count(col).alias(out))
            second.append(F.sum(out).cast("long").alias(out))
        elif fn == "min":
            first.append(F.min(col).alias(out))
            second.append(F.min(out).alias(out))
        elif fn == "max":
            first.append(F.max(col).alias(out))
            second.append(F.max(out).alias(out))
        else:
            raise ValueError(f"{fn!r} is not re-aggregable (sum/count/min/max)")
    salted = df.withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int")
    )
    partial = salted.groupBy(*keys, "__salt").agg(*first)
    return partial.groupBy(*keys).agg(*second)


# ---------------------------------------------------------------------------
# Oracle-checked query forms: the salted paths must produce EXACTLY the
# unsalted results (that's the whole contract of skew mitigation).
# ---------------------------------------------------------------------------

from ..plans.registry import query  # noqa: E402
from ..tables import load  # noqa: E402
from .relational import DEC  # noqa: E402


@query(
    "join_skew_salted",
    oracle="""
    SELECT s_nationkey,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE)
               AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_nationkey
    """,
)
def join_skew_salted(spark, sf_dir):
    """Salted fact-dim join, aggregated per nation — hash-identical to
    the plain join (the oracle runs the unsalted form).

    Scale note: at THIS dim size you would broadcast and skew couldn't
    exist; the salted path is for the 100 TB regime where the dim is
    too large to broadcast and a handful of fact keys are hot enough
    that even AQE's skew split leaves one reducer over budget. The salt
    is row-uniform on the fact side (a key-derived salt would re-hash
    the hot key to one partition), and the dim replicates n_salts ways
    — bounded by the dim being the small side.
    """
    from pyspark.sql import functions as F

    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("s_suppkey"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .cast(DEC)
        .alias("rev"),
    )
    sup = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    return (
        salted_join(li, sup, on=["s_suppkey"], n_salts=8)
        .groupBy("s_nationkey")
        .agg(
            F.sum("rev").cast("double").alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "agg_skew_twophase",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value,
           COUNT(*) AS n_events,
           MAX(value) AS max_value
    FROM events GROUP BY event_type
    """,
)
def agg_skew_twophase(spark, sf_dir):
    """Two-phase (salted) aggregation over a low-cardinality hot key —
    hash-identical to the one-shot groupBy (the oracle runs it).

    event_type has single-digit cardinality: the worst reduce-skew
    shape, where every partial for a key converges on one reducer. The
    salt spreads phase one over n_salts reducers per key; phase two
    combines n_salts rows per key — O(keys × salts), trivial. Sums
    stay on the exact-decimal accumulation policy, so splitting the
    fold cannot change the result (decimal addition is associative;
    double addition is not).
    """
    from pyspark.sql import functions as F

    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.col("value").cast(DEC).alias("v"),
        "value",
    )
    out = two_phase_agg(
        ev,
        ["event_type"],
        {
            "total_value": ("v", "sum"),
            "n_events": ("value", "count"),
            "max_value": ("value", "max"),
        },
        n_salts=8,
    )
    return out.select(
        "event_type",
        F.col("total_value").cast("double").alias("total_value"),
        "n_events",
        "max_value",
    )
