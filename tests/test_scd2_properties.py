"""Property-based soundness for the incremental SCD2 materializer:
for ANY event sequence and ANY batch split, (1) interval chains
partition each key's timeline (no gaps, no overlaps, one open interval
unless deleted), and (2) `current()` equals a pure-Python latest-wins
replay. Batch boundaries are the interesting part — an interval opened
in batch N must close correctly in batch N+k."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from go_cdc_spark.sources.changelog import format_pos
from go_cdc_spark.streaming.scd2 import VF_COL, VT_COL, Scd2Materializer

from .test_streaming import _ev, _snapshot

SNAP = [(1, "alice", 10.0), (2, "bob", 20.0)]
THRESHOLD = format_pos(100)

EVENTS = st.lists(
    st.tuples(
        st.sampled_from(["insert", "update", "delete"]),
        st.integers(min_value=1, max_value=5),  # key
    ),
    min_size=0,
    max_size=12,
)
SPLIT = st.integers(min_value=0, max_value=12)


def _typed_batch(spark, events, start):
    rows = []
    for i, (op, key) in enumerate(events):
        pos = 101 + start + i
        if op == "delete":
            rows.append(_ev("delete", key, pos, minute=i))
        else:
            rows.append(_ev(op, key, pos, name=f"n{pos}", balance=f"{pos}.0", minute=i))
    return spark.createDataFrame(
        rows,
        "data_source string, schema string, table string, op string, "
        "data map<string,string>, before map<string,string>, "
        "ts string, pos string, txn_id string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))


def _python_replay(events):
    state = {1: "alice", 2: "bob"}
    for i, (op, key) in enumerate(events):
        pos = 101 + i
        if op == "delete":
            state.pop(key, None)
        else:
            state[key] = f"n{pos}"
    return state


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(EVENTS, SPLIT)
def test_scd2_intervals_partition_and_current_matches_replay(
    spark, tmp_path_factory, events, split
):
    tmp = tmp_path_factory.mktemp("scd2prop")
    mat = Scd2Materializer(
        spark, _snapshot(spark, SNAP), ["id"], str(tmp / "state"),
        pos_threshold=THRESHOLD,
    )
    batches = [events[:split], events[split:]]
    offset = 0
    # batch ids must increase like the real stream's — the replay guard
    # deliberately skips a repeated id
    for bid, b in enumerate(batches):
        if b:
            mat.process_batch(_typed_batch(spark, b, start=offset), bid)
        offset += len(b)
    hist = mat.history().collect()
    by_key: dict[int, list] = {}
    for r in hist:
        by_key.setdefault(r["id"], []).append((r[VF_COL], r[VT_COL], r["name"]))
    for key, ivs in by_key.items():
        ivs.sort()
        opens = [iv for iv in ivs if iv[1] is None]
        assert len(opens) <= 1, (key, ivs)
        for (vf1, vt1, _), (vf2, _, _) in zip(ivs, ivs[1:]):
            # no overlap; a gap is legal ONLY for delete-then-reinsert
            # (the entity did not exist between the two versions)
            assert vt1 is not None and vt1 <= vf2, f"overlap for key {key}: {ivs}"
    expect = _python_replay(events)
    got = {r["id"]: r["name"] for r in mat.current().collect()}
    assert got == expect
