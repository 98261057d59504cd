"""Debezium changelog format driven through the full engine boot path:
config(changelog_format="debezium") → snapshot → readStream.text over
Debezium message values → envelope adapter → StreamingMaterializer MERGE.
The adapter was previously only batch-parity tested; this drives it
end-to-end the way a real deployment would (Kafka topic values replayed
from files)."""

from __future__ import annotations

import json

from go_cdc_spark.app import Engine
from go_cdc_spark.config import load_config

SF = "/root/testdata/sf0.001"


def _config(tmp_path, changelog_dir, schema_changelog_dir) -> str:
    p = tmp_path / "config.toml"
    p.write_text(
        f"""
[engine]
meta_path      = "{tmp_path}/meta"
state_dir      = "{tmp_path}/state"
checkpoint_dir = "{tmp_path}/ckpt"

[[source]]
id               = 1
name             = "dev"
type             = "parquet"
path             = "{SF}"
changelog        = "{changelog_dir}"
changelog_format = "debezium"
schema_changelog = "{schema_changelog_dir}"
[source.primary_keys]
region = ["r_regionkey"]
[source.rules.global]
include_tables = ["region"]
"""
    )
    return str(p)


def _dbz(op, after=None, before=None, gno=1, ts_ms=1700000000000):
    return json.dumps(
        {
            "payload": {
                "before": before,
                "after": after,
                "op": op,
                "ts_ms": ts_ms,
                "source": {
                    "name": "dev",
                    "db": "main",
                    "table": "region",
                    "gtid": f"uuid-a:{gno}",
                },
            }
        }
    )


def test_debezium_changelog_end_to_end(spark, tmp_path):
    seg = tmp_path / "changelog"
    seg.mkdir()
    ddl_seg = tmp_path / "schema-changelog"
    ddl_seg.mkdir()

    engine = Engine(load_config(_config(tmp_path, seg, ddl_seg)), spark=spark)
    engine.init_sources()
    engine.full_sync()

    # Debezium topic values, one JSON message per line (gtid pos sorts
    # after the numeric snapshot pos, so all pass the handoff threshold)
    msgs = [
        _dbz("u", after={"r_regionkey": 2, "r_name": "ASIA-v2"},
             before={"r_regionkey": 2, "r_name": "ASIA"}, gno=1),
        _dbz("c", after={"r_regionkey": 99, "r_name": "ATLANTIS"}, gno=2),
        _dbz("d", before={"r_regionkey": 0, "r_name": "AFRICA"}, gno=3),
        # tombstone (null payload body) must be ignored, not crash
        json.dumps({"payload": None}),
    ]
    (seg / "topic-0.json").write_text("\n".join(msgs) + "\n")
    # schema-change topic: ADD COLUMN flows through as op='ddl'
    (ddl_seg / "schema-0.json").write_text(
        json.dumps(
            {
                "payload": {
                    "databaseName": "main",
                    "ddl": "ALTER TABLE region ADD COLUMN r_tier INT DEFAULT 3",
                    "ts_ms": 1700000000500,
                    "source": {"name": "dev", "db": "main", "table": "region",
                               "gtid": "uuid-a:4"},
                }
            }
        )
        + "\n"
    )

    engine.incremental_sync()

    state = {r.r_regionkey: r for r in engine.read_table(1, "main", "region").collect()}
    assert state[2].r_name == "ASIA-v2"
    assert state[99].r_name == "ATLANTIS"
    assert 0 not in state  # delete carried its image in `before`
    # DDL from the schema-change topic evolved the table: new column,
    # default backfilled on every pre-existing row
    assert state[2].r_tier == 3 and state[99].r_tier == 3
