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
