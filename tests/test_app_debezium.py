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


def _dbz_t(table, op, after=None, before=None, gno=1, txn=None, ts_ms=1700000000000):
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
                    "table": table,
                    "gtid": f"uuid-a:{gno}",
                },
                "transaction": {"id": txn} if txn else None,
            }
        }
    )


def test_debezium_txn_gate_rename_three_way(spark, tmp_path):
    """The three-way intersection where data-loss bugs live: one Debezium
    stream interleaving (a) a cross-table transaction, (b) a RENAME
    COLUMN, and (c) an open transaction whose commit arrives only in a
    later run — driven through the engine boot path with read_committed
    on, commits arriving via the Debezium transaction-metadata topic."""
    seg = tmp_path / "changelog"
    ddl_seg = tmp_path / "schema-changelog"
    txn_seg = tmp_path / "txn-changelog"
    for d in (seg, ddl_seg, txn_seg):
        d.mkdir()

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
changelog        = "{seg}"
changelog_format = "debezium"
schema_changelog = "{ddl_seg}"
txn_changelog    = "{txn_seg}"
read_committed   = true
[source.primary_keys]
region = ["r_regionkey"]
nation = ["n_nationkey"]
[source.rules.global]
include_tables = ["region", "nation"]
"""
    )
    engine = Engine(load_config(str(p)), spark=spark)
    engine.init_sources()
    engine.full_sync()

    # txn t1 spans region AND nation; txn t2 stays open this run
    msgs = [
        _dbz_t("region", "u", after={"r_regionkey": 1, "r_name": "AMERICA-t1"},
               before={"r_regionkey": 1, "r_name": "AMERICA"}, gno=1, txn="t1"),
        _dbz_t("nation", "u", after={"n_nationkey": 0, "n_name": "NATION_0-t1",
                                     "n_regionkey": 0},
               before={"n_nationkey": 0, "n_name": "NATION_0", "n_regionkey": 0},
               gno=2, txn="t1"),
        _dbz_t("region", "u", after={"r_regionkey": 3, "r_name": "EUROPE-t2"},
               before={"r_regionkey": 3, "r_name": "EUROPE"}, gno=3, txn="t2"),
    ]
    (seg / "topic-0.json").write_text("\n".join(msgs) + "\n")
    # RENAME COLUMN lands after the data events in binlog order
    (ddl_seg / "schema-0.json").write_text(
        json.dumps(
            {
                "payload": {
                    "databaseName": "main",
                    "ddl": "ALTER TABLE region RENAME COLUMN r_name TO r_label",
                    "ts_ms": 1700000000400,
                    "source": {"name": "dev", "db": "main", "table": "region",
                               "gtid": "uuid-a:4"},
                }
            }
        )
        + "\n"
    )
    # transaction topic: only t1 has committed
    (txn_seg / "txn-0.json").write_text(
        json.dumps({"payload": {"status": "END", "id": "t1", "event_count": 2,
                                "ts_ms": 1700000000300}})
        + "\n"
    )

    engine.incremental_sync()

    region = {r.r_regionkey: r for r in engine.read_table(1, "main", "region").collect()}
    nation = {r.n_nationkey: r for r in engine.read_table(1, "main", "nation").collect()}
    # rename applied: new column name, data carried across
    assert "r_label" in region[0].asDict() and "r_name" not in region[0].asDict()
    # committed cross-table txn applied on BOTH tables (t1's region image
    # predates the rename — the alias fallback must decode r_name)
    assert region[1].r_label == "AMERICA-t1"
    assert nation[0].n_name == "NATION_0-t1"
    # open txn withheld
    assert region[3].r_label == "EUROPE"
    # watermark capped strictly below the withheld row's pos (uuid-a:3),
    # so a restart cannot skip it
    wm = engine.meta.get_pos("dev", tb="region")
    assert wm is not None and wm <= "uuid-a:2"

    # t2's commit arrives in a later run: buffered row releases, and its
    # pre-rename image decodes through the alias map onto r_label
    (txn_seg / "txn-1.json").write_text(
        json.dumps({"payload": {"status": "END", "id": "t2", "event_count": 1,
                                "ts_ms": 1700000000600}})
        + "\n"
    )
    engine.incremental_sync()
    region = {r.r_regionkey: r for r in engine.read_table(1, "main", "region").collect()}
    assert region[3].r_label == "EUROPE-t2"
    wm = engine.meta.get_pos("dev", tb="region")
    assert wm >= "uuid-a:3"  # watermark released past the buffered row
