"""Dead-letter quarantine: malformed/invalid changelog events must be
captured with a reason and the raw payload — not silently dropped
(PERMISSIVE's default) and not allowed to stall the pipeline (the
reference's error-out behavior) — while clean events keep flowing to
the wrapped consumer unchanged."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from go_cdc_spark.streaming.dlq import (
    DeadLetterQueue,
    read_changelog_stream_dlq,
    violation_reason,
)
from go_cdc_spark.streaming.pipeline import StreamingMaterializer

from .test_ivm import _ev


def _write_segment(seg_dir, lines):
    seg_dir.mkdir(parents=True, exist_ok=True)
    p = seg_dir / "s0.json"
    with open(p, "w") as f:
        for line in lines:
            f.write((line if isinstance(line, str) else json.dumps(line)) + "\n")
    os.utime(p, (1_700_000_000, 1_700_000_000))


def _bad_events():
    good1 = _ev("insert", 1, 1, "a", 10.0)
    good2 = _ev("insert", 2, 2, "b", 20.0)
    unknown = dict(_ev("insert", 3, 3, "c", 30.0), op="upsert")
    missing_before = {k: v for k, v in _ev("update", 4, 1, "a", 11.0,
                                           before=("a", 10.0)).items()
                      if k != "before"}
    missing_pos = {k: (None if k == "pos" else v)
                   for k, v in _ev("insert", 5, 4, "d", 40.0).items()}
    return good1, good2, unknown, missing_before, missing_pos


def test_stream_quarantines_and_clean_rows_flow(spark, tmp_path):
    good1, good2, unknown, missing_before, missing_pos = _bad_events()
    _write_segment(tmp_path / "seg", [
        good1,
        "{definitely not json",
        unknown,
        missing_before,
        missing_pos,
        good2,
    ])
    dlq = DeadLetterQueue(spark, str(tmp_path / "quarantine"))
    mat = StreamingMaterializer(
        spark,
        spark.createDataFrame([], "id string, grp string, val string"),
        keys=["id"],
        state_path=str(tmp_path / "state"),
    )
    stream = read_changelog_stream_dlq(spark, str(tmp_path / "seg"))
    (
        stream.writeStream.option(
            "checkpointLocation", str(tmp_path / "ckpt")
        )
        .foreachBatch(dlq.wrap(mat.process_batch))
        .trigger(availableNow=True)
        .start()
        .awaitTermination(120)
    )
    # clean rows materialized — the invalid ones never reached state
    state = {r.id: r.val for r in mat.read_table().collect()}
    assert state == {"1": "10.0", "2": "20.0"}
    # quarantine holds exactly the four violations, each with its reason
    q = dlq.read_table()
    reasons = {r.reason for r in q.collect()}
    assert reasons == {
        "malformed_json", "unknown_op", "missing_before_image", "missing_pos",
    }
    raw = q.filter(F.col("reason") == "malformed_json").collect()[0]
    assert raw.raw.startswith("{definitely not json")
    # parsed fields survive for triage where parsing succeeded
    assert q.filter(F.col("reason") == "unknown_op").collect()[0].op == "upsert"


def test_split_batch_replay_is_idempotent(spark, tmp_path):
    from go_cdc_spark.sources.changelog import changelog_df

    good1, _, _, missing_before, _ = _bad_events()

    def b(events):
        rows = []
        for e in events:
            e = dict(e)
            e["ts"] = None
            e.setdefault("before", None)
            rows.append(e)
        return changelog_df(spark, rows)

    dlq = DeadLetterQueue(spark, str(tmp_path / "q"))
    clean = dlq.split_batch(b([good1, missing_before]), 0)
    assert clean.count() == 1
    first = sorted(map(tuple, dlq.read_table().drop("ts").collect()))
    # crash-replay of the same batch rewrites the identical quarantine
    dlq.split_batch(b([good1, missing_before]), 0)
    assert sorted(map(tuple, dlq.read_table().drop("ts").collect())) == first
    assert dlq.read_table().count() == 1


def test_clean_batch_leaves_no_quarantine_dir(spark, tmp_path):
    from go_cdc_spark.sources.changelog import changelog_df

    good1, good2, *_ = _bad_events()

    def b(events):
        rows = []
        for e in events:
            e = dict(e)
            e["ts"] = None
            rows.append(e)
        return changelog_df(spark, rows)

    dlq = DeadLetterQueue(spark, str(tmp_path / "q"))
    clean = dlq.split_batch(b([good1, good2]), 7)
    assert clean.count() == 2
    assert dlq.read_table().count() == 0
    assert not os.path.exists(os.path.join(str(tmp_path / "q"), "b0000000007"))


def test_violation_reason_order_and_validity(spark):
    """A fully valid event of every op kind yields NULL reason."""
    from go_cdc_spark.sources.changelog import changelog_df

    rows = [
        dict(_ev("insert", 1, 1, "a", 1.0), ts=None),
        dict(_ev("update", 2, 1, "a", 2.0, before=("a", 1.0)), ts=None),
        dict(_ev("delete", 3, 1, before=("a", 2.0)), ts=None),
    ]
    df = changelog_df(spark, rows).withColumn(
        "_corrupt_record", F.lit(None).cast("string")
    )
    assert df.withColumn("r", violation_reason()).filter(
        F.col("r").isNotNull()
    ).count() == 0


def test_engine_boot_with_quarantine(spark, tmp_path):
    """Config-driven engine with quarantine=true: the per-source DLQ
    stream captures malformed/invalid lines once (NULL-table rows never
    reach any per-table rule filter), delivery is unaffected."""
    from go_cdc_spark.app import Engine
    from go_cdc_spark.config import load_config

    from .test_app import SF, _event

    seg_dir = tmp_path / "changelog"
    seg_dir.mkdir()
    cfg = f"""
[engine]
meta_path      = "{tmp_path}/meta"
state_dir      = "{tmp_path}/state"
checkpoint_dir = "{tmp_path}/ckpt"

[[source]]
id         = 1
name       = "dev"
type       = "parquet"
path       = "{SF}"
changelog  = "{seg_dir}"
quarantine = true
[source.primary_keys]
region = ["r_regionkey"]
[source.rules.global]
include_tables = ["region"]
"""
    p = tmp_path / "config.toml"
    p.write_text(cfg)
    engine = Engine(load_config(str(p)), spark=spark)
    engine.init_sources()
    snaps = engine.full_sync()
    pos = int({s.table: s.pos for s in snaps[1]}["region"])
    lines = [
        json.dumps(_event(pos + 1, "insert",
                          {"r_regionkey": "99", "r_name": "ATLANTIS"})),
        "%% broken line %%",
        json.dumps(dict(_event(pos + 2, "insert",
                               {"r_regionkey": "98", "r_name": "MU"}),
                        op="upsert")),
    ]
    with open(seg_dir / "seg0.json", "w") as f:
        f.write("\n".join(lines) + "\n")
    engine.incremental_sync()

    state = {
        r.r_regionkey: r.r_name
        for r in engine.read_table(1, "main", "region").collect()
    }
    assert state[99] == "ATLANTIS" and 98 not in state
    q = {r.reason for r in engine.read_quarantine("dev").collect()}
    assert q == {"malformed_json", "unknown_op"}


def test_config_rejects_quarantine_on_debezium(tmp_path):
    import pytest

    from go_cdc_spark.config import load_config

    p = tmp_path / "bad.toml"
    p.write_text(
        '[engine]\nmeta_path="m"\nstate_dir="s"\ncheckpoint_dir="c"\n'
        '[[source]]\nid=1\nname="a"\nchangelog_format="debezium"\n'
        "quarantine=true\n"
    )
    with pytest.raises(ValueError, match="quarantine requires"):
        load_config(str(p))
