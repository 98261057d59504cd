"""Streaming aggregate-over-join IVM (IncrementalJoinAgg, the 10th
algebra's streaming twin): the maintained (group -> n, sum) must equal
the recompute from fully collapsed sides across micro-batch
boundaries — dim renames migrating groups, FK migrations, deletes —
and a replayed committed batch must be a no-op."""

from __future__ import annotations

import random
from decimal import Decimal

from pyspark.sql import types as T

from go_cdc_spark.sources.changelog import changelog_df
from go_cdc_spark.streaming.ivm import IncrementalJoinAgg

from .test_ivm_join_stream import DIM_FIELDS, FACT_FIELDS, _dev, _fev


def _mk(spark, tmp_path, name="ja"):
    return IncrementalJoinAgg(
        spark,
        str(tmp_path / name),
        fact_table="f", fact_fields=FACT_FIELDS, fact_keys=["id"],
        dim_table="d", dim_fields=DIM_FIELDS, dim_keys=["did"],
        group_cols=["name"], sum_cols=["amount"],
        fk=["fk"],
    )


def _b(spark, events):
    rows = []
    for e in events:
        e = dict(e)
        e.setdefault("ts", None)
        rows.append(e)
    return changelog_df(spark, rows)


def _recompute(all_events):
    """Ground truth: collapse each side by max pos, join, aggregate."""
    def side(table, key):
        rows = {}
        for e in sorted(
            (e for e in all_events if e["table"] == table), key=lambda e: e["pos"]
        ):
            img = e.get("data") or e.get("before")
            k = img[key]
            rows[k] = None if e["op"] == "delete" else e["data"]
        return {k: v for k, v in rows.items() if v is not None}

    facts, dims = side("f", "id"), side("d", "did")
    agg: dict[str, tuple[int, Decimal]] = {}
    for fr in facts.values():
        dr = dims.get(fr["fk"])
        if dr is None:
            continue
        n, s = agg.get(dr["name"], (0, Decimal(0)))
        agg[dr["name"]] = (n + 1, s + Decimal(fr["amount"]))
    return {k: (n, float(s)) for k, (n, s) in agg.items()}


def _read(m):
    return {
        r["name"]: (r["n"], float(r["sum_amount"]))
        for r in m.read_table().collect()
    }


def test_folds_and_group_migration(spark, tmp_path):
    m = _mk(spark, tmp_path)
    ev1 = [
        _dev("insert", 1, 1, "A"),
        _dev("insert", 2, 2, "B"),
        _fev("insert", 3, 10, 1, 5.0),
        _fev("insert", 4, 11, 1, 7.0),
        _fev("insert", 5, 12, 2, 9.0),
    ]
    m.process_batch(_b(spark, ev1), 0)
    assert _read(m) == {"A": (2, 12.0), "B": (1, 9.0)}
    ev2 = [
        _dev("update", 6, 1, "A2", before="A"),     # rename migrates A -> A2
        _fev("update", 7, 12, 1, 9.0, before=(2, 9.0)),  # FK migration B -> A2
        _fev("delete", 8, 11, before=(1, 7.0)),
    ]
    m.process_batch(_b(spark, ev2), 1)
    assert _read(m) == {"A2": (2, 14.0)}
    assert _recompute(ev1 + ev2) == _read(m)


def test_replay_of_committed_batch_is_noop(spark, tmp_path):
    m = _mk(spark, tmp_path)
    ev = [_dev("insert", 1, 1, "A"), _fev("insert", 2, 10, 1, 5.0)]
    m.process_batch(_b(spark, ev), 0)
    before = _read(m)
    m.process_batch(_b(spark, ev), 0)  # crash-replay: must not double-fold
    assert _read(m) == before == {"A": (1, 5.0)}


def test_random_two_sided_interleavings(spark, tmp_path):
    rng = random.Random(23)
    m = _mk(spark, tmp_path)
    all_events, pos = [], 0
    facts: dict[int, tuple[int, float]] = {}
    dims: dict[int, str] = {}
    batches = []
    for _ in range(4):  # 4 micro-batches
        batch = []
        for _ in range(12):
            pos += 1
            if rng.random() < 0.3:
                did = rng.randint(1, 4)
                if did in dims and rng.random() < 0.3:
                    batch.append(_dev("delete", pos, did, before=dims.pop(did)))
                else:
                    old = dims.get(did)
                    nm = f"N{did}v{pos}"
                    batch.append(
                        _dev("update" if old else "insert", pos, did, nm,
                             before=old)
                    )
                    dims[did] = nm
            else:
                i = rng.randint(1, 15)
                if i in facts and rng.random() < 0.3:
                    batch.append(_fev("delete", pos, i, before=facts.pop(i)))
                else:
                    old = facts.get(i)
                    fk, amt = rng.randint(1, 5), float(rng.randint(0, 50))
                    batch.append(
                        _fev("update" if old else "insert", pos, i, fk, amt,
                             before=old)
                    )
                    facts[i] = (fk, amt)
        batches.append(batch)
        all_events.extend(batch)
    for bid, batch in enumerate(batches):
        m.process_batch(_b(spark, batch), bid)
    assert _read(m) == _recompute(all_events)
