"""incremental_join_agg (the 10th IVM algebra): the maintained
aggregate-over-join must equal the recompute from the two fully merged
tables — including dim renames migrating whole groups and dim deletes
dropping their facts — with and without the stored-MV fast path."""

from __future__ import annotations

import random

from pyspark.sql import Row
from pyspark.sql import functions as F

from go_cdc_spark.operators.cdc import apply_changes, incremental_join_agg


def _facts(spark, rows):
    return spark.createDataFrame(
        [Row(id=i, nk=nk, bal=float(b)) for i, nk, b in rows],
        "id long, nk int, bal double",
    )


def _dims(spark, rows):
    return spark.createDataFrame(
        [Row(nk=nk, name=nm) for nk, nm in rows], "nk int, name string"
    )


def _fchanges(spark, evs):
    return spark.createDataFrame(
        [
            Row(id=i, nk=nk, bal=(None if b is None else float(b)),
                pos=f"{p:012d}", op=op)
            for op, p, i, nk, b in evs
        ],
        "id long, nk int, bal double, pos string, op string",
    )


def _dchanges(spark, evs):
    return spark.createDataFrame(
        [Row(nk=nk, name=nm, pos=f"{p:012d}", op=op) for op, p, nk, nm in evs],
        "nk int, name string, pos string, op string",
    )


def _run(spark, fact_rows, dim_rows, fevs, devs, with_mv: bool):
    fact = _facts(spark, fact_rows)
    dim = _dims(spark, dim_rows)
    fch = _fchanges(spark, fevs)
    dch = _dchanges(spark, devs)
    base_view = fact.join(dim, on="nk") if with_mv else None
    got = incremental_join_agg(
        fact, fch, fact_keys=["id"],
        dim=dim, dim_changes=dch, dim_keys=["nk"],
        group_cols=["name"], sum_cols=["bal"],
        base_view=base_view,
    )
    mf = apply_changes(fact, fch, keys=["id"])
    md = apply_changes(dim, dch, keys=["nk"])
    want = (
        mf.join(md, on="nk")
        .groupBy("name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("bal").cast("decimal(38,6)"))
            .cast("decimal(38,6)")
            .alias("sum_bal"),
        )
    )
    g = sorted((r["name"], r["n"], r["sum_bal"]) for r in got.collect())
    w = sorted((r["name"], r["n"], r["sum_bal"]) for r in want.collect())
    assert g == w, f"\ngot  {g}\nwant {w}"


FACTS = [(1, 1, 10), (2, 1, 20), (3, 2, 30), (4, 3, 40)]
DIMS = [(1, "A"), (2, "B"), (3, "C")]


def test_dim_rename_migrates_the_group(spark):
    for with_mv in (True, False):
        _run(spark, FACTS, DIMS,
             fevs=[],
             devs=[("update", 101, 1, "A2")],  # nation 1 renamed
             with_mv=with_mv)


def test_dim_delete_drops_its_facts(spark):
    for with_mv in (True, False):
        _run(spark, FACTS, DIMS,
             fevs=[("insert", 102, 5, 2, 50.0)],
             devs=[("delete", 101, 3, None)],  # group C disappears
             with_mv=with_mv)


def test_fact_fk_migration_and_deletes(spark):
    for with_mv in (True, False):
        _run(spark, FACTS, DIMS,
             fevs=[("update", 101, 1, 2, 15.0),   # moves A -> B
                   ("delete", 102, 2, None, None),
                   ("insert", 103, 6, 3, 60.0)],
             devs=[],
             with_mv=with_mv)


def test_new_dim_picks_up_orphan_facts(spark):
    """A fact referencing a not-yet-existing dim is invisible until the
    dim INSERT arrives — then its group appears."""
    facts = FACTS + [(9, 7, 90)]  # nk=7 has no dim row yet
    for with_mv in (True, False):
        _run(spark, facts, DIMS,
             fevs=[],
             devs=[("update", 101, 7, "G")],  # upsert semantics: new dim
             with_mv=with_mv)


def test_random_interleavings_match_recompute(spark):
    rng = random.Random(13)
    facts = [(i, rng.randint(1, 5), rng.randint(0, 100)) for i in range(1, 30)]
    dims = [(nk, f"N{nk}") for nk in range(1, 5)]  # nk=5 orphan at start
    fevs, devs, pos = [], [], 100
    live = {i for i, _, _ in facts}
    for _ in range(50):
        pos += 1
        if rng.random() < 0.25:
            nk = rng.randint(1, 6)
            if rng.random() < 0.3:
                devs.append(("delete", pos, nk, None))
            else:
                devs.append(("update", pos, nk, f"N{nk}v{pos}"))
        else:
            i = rng.randint(1, 40)
            if i in live and rng.random() < 0.3:
                live.discard(i)
                fevs.append(("delete", pos, i, None, None))
            else:
                live.add(i)
                fevs.append(("update", pos, i, rng.randint(1, 6),
                             rng.randint(0, 100)))
    for with_mv in (True, False):
        _run(spark, facts, dims, fevs, devs, with_mv=with_mv)
