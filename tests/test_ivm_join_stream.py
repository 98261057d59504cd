"""Streaming join-view IVM: the maintained ``fact ⋈ dim`` view must
equal the join recomputed from fully collapsed sides — for random
two-sided interleavings of inserts, FK-migrating updates, and deletes
across micro-batch boundaries — and a replayed committed batch must be
a no-op (the bilinear fold is not idempotent)."""

from __future__ import annotations

import random

from pyspark.sql import types as T

from go_cdc_spark.sources.changelog import changelog_df, format_pos
from go_cdc_spark.streaming.ivm import IncrementalJoin

FACT_FIELDS = {"id": T.LongType(), "fk": T.LongType(), "amount": T.DoubleType()}
DIM_FIELDS = {"did": T.LongType(), "name": T.StringType()}


def _fev(op, pos, id_, fk=None, amount=None, before=None):
    e = {
        "data_source": "ds1", "schema": "s", "table": "f", "op": op,
        "ts": None, "pos": format_pos(pos), "txn_id": None,
    }
    if op in ("insert", "update"):
        e["data"] = {"id": str(id_), "fk": str(fk), "amount": str(amount)}
    if op in ("update", "delete"):
        b = before or (fk, amount)
        e["before"] = {"id": str(id_), "fk": str(b[0]), "amount": str(b[1])}
    return e


def _dev(op, pos, did, name=None, before=None):
    e = {
        "data_source": "ds1", "schema": "s", "table": "d", "op": op,
        "ts": None, "pos": format_pos(pos), "txn_id": None,
    }
    if op in ("insert", "update"):
        e["data"] = {"did": str(did), "name": name}
    if op in ("update", "delete"):
        e["before"] = {"did": str(did), "name": before or name}
    return e


def _mk(spark, tmp_path, name="jv"):
    return IncrementalJoin(
        spark,
        str(tmp_path / name),
        fact_table="f", fact_fields=FACT_FIELDS, fact_keys=["id"],
        dim_table="d", dim_fields=DIM_FIELDS, dim_keys=["did"],
        fk=["fk"],
    )


def _recompute(spark, all_events):
    """Ground truth: collapse each side by max pos, inner-join."""

    def side(table, fields, key):
        rows = {}
        for e in sorted(
            (e for e in all_events if e["table"] == table), key=lambda e: e["pos"]
        ):
            img = e.get("data") or e.get("before")
            k = img[key]
            if e["op"] == "delete":
                rows[k] = None
            else:
                rows[k] = e["data"]
        return {k: v for k, v in rows.items() if v is not None}

    facts = side("f", FACT_FIELDS, "id")
    dims = side("d", DIM_FIELDS, "did")
    out = set()
    for fr in facts.values():
        dr = dims.get(fr["fk"])
        if dr is not None:
            out.add((int(fr["id"]), int(fr["fk"]), float(fr["amount"]), dr["name"]))
    return out


def _view_set(jv):
    return {
        (r.id, r.fk, r.amount, r.name) for r in jv.read_table().collect()
    }


def test_join_view_matches_recompute_basic(spark, tmp_path):
    jv = _mk(spark, tmp_path)
    b0 = [
        _dev("insert", 100, 1, "alpha"),
        _dev("insert", 101, 2, "beta"),
        _fev("insert", 102, 10, fk=1, amount=5.0),
        _fev("insert", 103, 11, fk=2, amount=6.0),
        _fev("insert", 104, 12, fk=9, amount=7.0),  # dangling FK
    ]
    b1 = [
        _fev("update", 110, 10, fk=2, amount=5.5, before=(1, 5.0)),  # FK migration
        _dev("update", 111, 1, "alpha2", before="alpha"),
        _dev("insert", 112, 9, "gamma"),          # resolves the dangling FK
        _fev("delete", 113, 11, before=(2, 6.0)),
    ]
    b2 = [
        _dev("delete", 120, 2, before="beta"),    # drops fact 10's join row
        _fev("insert", 121, 13, fk=1, amount=8.0),
    ]
    events = []
    for i, b in enumerate([b0, b1, b2]):
        jv.process_batch(changelog_df(spark, b), i)
        events += b
        assert _view_set(jv) == _recompute(spark, events), f"after batch {i}"


def test_join_view_replay_of_committed_batch_is_noop(spark, tmp_path):
    jv = _mk(spark, tmp_path)
    b0 = [
        _dev("insert", 100, 1, "alpha"),
        _fev("insert", 101, 10, fk=1, amount=5.0),
    ]
    b1 = [
        _fev("update", 110, 10, fk=1, amount=6.0, before=(1, 5.0)),
        _dev("insert", 111, 2, "beta"),
        _fev("insert", 112, 11, fk=2, amount=7.0),
    ]
    jv.process_batch(changelog_df(spark, b0), 0)
    jv.process_batch(changelog_df(spark, b1), 1)
    clean = _view_set(jv)
    jv.process_batch(changelog_df(spark, b1), 1)  # replay after crash
    jv.process_batch(changelog_df(spark, b0), 0)  # stale replay
    assert _view_set(jv) == clean
    # next real batch still applies
    jv.process_batch(
        changelog_df(spark, [_fev("insert", 120, 12, fk=1, amount=9.0)]), 2
    )
    assert (12, 1, 9.0, "alpha") in _view_set(jv)


def test_join_view_random_interleavings(spark, tmp_path):
    rng = random.Random(42)
    jv = _mk(spark, tmp_path, "jvr")
    dims_live, facts_live = {}, {}
    pos = 100
    events = []
    batches = []
    for _ in range(4):
        batch = []
        for _ in range(12):
            pos += 1
            if rng.random() < 0.4:  # dim op
                did = rng.randint(1, 5)
                if did in dims_live and rng.random() < 0.4:
                    if rng.random() < 0.5:
                        batch.append(_dev("delete", pos, did, before=dims_live.pop(did)))
                    else:
                        old = dims_live[did]
                        dims_live[did] = f"n{pos}"
                        batch.append(_dev("update", pos, did, f"n{pos}", before=old))
                else:
                    dims_live[did] = f"n{pos}"
                    batch.append(_dev("insert", pos, did, f"n{pos}"))
            else:  # fact op
                fid = rng.randint(10, 25)
                fk = rng.randint(1, 6)  # 6 can dangle
                amt = float(rng.randint(1, 99))
                if fid in facts_live and rng.random() < 0.4:
                    if rng.random() < 0.5:
                        batch.append(
                            _fev("delete", pos, fid, before=facts_live.pop(fid))
                        )
                    else:
                        old = facts_live[fid]
                        facts_live[fid] = (fk, amt)
                        batch.append(
                            _fev("update", pos, fid, fk=fk, amount=amt, before=old)
                        )
                else:
                    facts_live[fid] = (fk, amt)
                    batch.append(_fev("insert", pos, fid, fk=fk, amount=amt))
        batches.append(batch)
    for i, b in enumerate(batches):
        jv.process_batch(changelog_df(spark, b), i)
        events += b
    assert _view_set(jv) == _recompute(spark, events)


def test_join_view_streaming_end_to_end(spark, tmp_path):
    """Through the real foreachBatch loop (availableNow file source)."""
    import json as jsonlib
    import os

    from go_cdc_spark.streaming.pipeline import read_changelog_stream

    seg = tmp_path / "seg"
    seg.mkdir(parents=True)
    segs = [
        [_dev("insert", 100, 1, "alpha"), _fev("insert", 101, 10, fk=1, amount=5.0)],
        [_fev("update", 110, 10, fk=1, amount=6.5, before=(1, 5.0)),
         _dev("insert", 111, 2, "beta"),
         _fev("insert", 112, 11, fk=2, amount=7.0)],
        [_dev("delete", 120, 2, before="beta")],
    ]
    for i, events in enumerate(segs):
        p = seg / f"s{i}.json"
        with open(p, "w") as f:
            for e in events:
                f.write(jsonlib.dumps(e) + "\n")
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
    jv = _mk(spark, tmp_path, "jvs")
    q = jv.start(read_changelog_stream(spark, str(seg)), str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    assert _view_set(jv) == {(10, 1, 6.5, "alpha")}


def test_multi_swap_torn_crash_recovers(spark, tmp_path):
    """swap_in_many uses the same .tmp-/.old- sibling protocol as
    swap_in, so a crash between the two renames is repaired by
    storeio.recover with the WHOLE relation set intact — never a
    half-updated combination."""
    import os

    from go_cdc_spark import storeio

    path = str(tmp_path / "multi")
    storeio.swap_in_many(
        {"a": spark.range(3), "b": spark.range(5)}, path, batch_id=0, run_id="ck"
    )
    # crash after demoting the live dir, before promoting the tmp:
    # only an .old- sibling remains
    os.rename(path, path + ".old-dead")
    storeio.recover(path)
    assert spark.read.parquet(os.path.join(path, "a")).count() == 3
    assert spark.read.parquet(os.path.join(path, "b")).count() == 5
    assert storeio.applied_batch(path, run_id="ck") == 0
    # leftover tmp dirs from a crash mid-write are swept
    os.makedirs(path + ".tmp-dead")
    storeio.recover(path)
    assert not os.path.exists(path + ".tmp-dead")


def test_join_view_key_mutating_updates_both_sides(spark, tmp_path):
    """PK mutation on either side is delete(old key)+insert(new key):
    the data-over-before key coalesce would otherwise leave the old
    key's row live in side state AND in the view as a duplicate."""
    jv = _mk(spark, tmp_path)
    b0 = [
        _dev("insert", 100, 1, "alpha"),
        _dev("insert", 101, 2, "beta"),
        _fev("insert", 102, 10, fk=1, amount=5.0),
        _fev("insert", 103, 11, fk=2, amount=6.0),
    ]
    jv.process_batch(changelog_df(spark, b0), 0)
    assert _view_set(jv) == {(10, 1, 5.0, "alpha"), (11, 2, 6.0, "beta")}

    # fact PK mutates 10→20; dim PK mutates 2→3 (fact 11 dangles)
    fmv = _fev("update", 110, 20, fk=1, amount=5.5, before=(1, 5.0))
    fmv["before"]["id"] = "10"
    dmv = _dev("update", 111, 3, "beta2", before="beta")
    dmv["before"]["did"] = "2"
    jv.process_batch(changelog_df(spark, [fmv, dmv]), 1)
    assert _view_set(jv) == {(20, 1, 5.5, "alpha")}
    live_facts = {
        r.id for r in jv._side("fact", FACT_FIELDS).filter("op != 'delete'").collect()
    }
    assert live_facts == {20, 11}, "old fact key must be a tombstone"
    live_dims = {
        r.did for r in jv._side("dim", DIM_FIELDS).filter("op != 'delete'").collect()
    }
    assert live_dims == {1, 3}, "old dim key must be a tombstone"

    # fact 11 re-points at the migrated dim key and rejoins
    jv.process_batch(
        changelog_df(spark, [_fev("update", 120, 11, fk=3, amount=6.5, before=(2, 6.0))]),
        2,
    )
    assert _view_set(jv) == {(20, 1, 5.5, "alpha"), (11, 3, 6.5, "beta2")}
