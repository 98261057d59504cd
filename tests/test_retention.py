"""Changelog retention + replication attach-time safety.

The reference attaches at the stored watermark and relies on MySQL to
refuse when that falls below ``gtid_purged`` (`internal/cannal/
incremental.go:149` via ``StartSyncGTID``, server error 1236). Our
file-replay changelog gets the explicit equivalent: ``purge_changelog``
records what retention removed, ``Engine.check_attach`` refuses to tail
past a hole. Silent row loss must be impossible; loud boot failure is
the contract.
"""

from __future__ import annotations

import json
import os

import pytest

from go_cdc_spark.app import Engine
from go_cdc_spark.config import load_config
from go_cdc_spark.functions.gtid import PurgedBinlogError
from go_cdc_spark.sources.retention import (
    ChangelogPurgedError,
    attach_guard,
    purge_changelog,
    read_manifest,
)

SF = "/root/testdata/sf0.001"


def _seg(dirpath, name, poss, table="region"):
    with open(os.path.join(dirpath, name), "w") as f:
        for p in poss:
            f.write(
                json.dumps(
                    {
                        "data_source": "dev",
                        "schema": "main",
                        "table": table,
                        "op": "update",
                        "data": {"r_regionkey": "1", "r_name": f"v{p}"},
                        "before": None,
                        "ts": None,
                        "pos": p,
                        "txn_id": None,
                    }
                )
                + "\n"
            )


def z(n: int) -> str:
    return str(n).zfill(12)


# -- unit: purge + guard (no Spark) ----------------------------------------


def test_purge_removes_only_fully_retired_segments(tmp_path):
    d = str(tmp_path)
    _seg(d, "seg0.json", [z(1), z(2), z(3)])
    _seg(d, "seg1.json", [z(4), z(5), z(6)])
    m = purge_changelog(d, through_pos=z(3))
    assert m["purged_max_pos"] == z(3) and m["segments_purged"] == 1
    assert not os.path.exists(tmp_path / "seg0.json")
    assert os.path.exists(tmp_path / "seg1.json")
    # a partially retired segment stays whole (binlog-file semantics)
    m = purge_changelog(d, through_pos=z(5))
    assert m["segments_purged"] == 1 and os.path.exists(tmp_path / "seg1.json")
    # manifest accumulates across purges
    m = purge_changelog(d, through_pos=z(6))
    assert m["purged_max_pos"] == z(6) and m["segments_purged"] == 2


def test_attach_guard_pos_flavor(tmp_path):
    d = str(tmp_path)
    _seg(d, "seg0.json", [z(1), z(2)])
    attach_guard(d, watermark_pos=None)  # no manifest yet: nothing purged
    purge_changelog(d, through_pos=z(2))
    attach_guard(d, watermark_pos=z(2))  # covered: ok
    attach_guard(d, watermark_pos=z(7))  # ahead: ok
    with pytest.raises(ChangelogPurgedError, match="resync required"):
        attach_guard(d, watermark_pos=z(1))
    with pytest.raises(ChangelogPurgedError):
        attach_guard(d, watermark_pos=None)  # no position recorded at all


def test_attach_guard_gtid_flavor(tmp_path):
    d = str(tmp_path)
    _seg(d, "seg0.json", ["uuid-a:1", "uuid-a:2", "uuid-a:3"])
    m = purge_changelog(d, through_pos="uuid-a:3")
    assert json.loads(m["purged_gtid"]) == {"uuid-a": [{"start": 1, "end": 3}]}
    covered = json.dumps({"uuid-a": [{"start": 1, "end": 3}]})
    attach_guard(d, watermark_pos=None, watermark_gtid_json=covered)
    hole = json.dumps({"uuid-a": [{"start": 1, "end": 1}]})
    with pytest.raises(PurgedBinlogError, match="resync required"):
        attach_guard(d, watermark_pos=None, watermark_gtid_json=hole)


# -- engine wiring ----------------------------------------------------------


def _config(tmp_path, changelog_dir) -> str:
    p = tmp_path / "config.toml"
    p.write_text(
        f"""
[engine]
meta_path      = "{tmp_path}/meta"
state_dir      = "{tmp_path}/state"
checkpoint_dir = "{tmp_path}/ckpt"

[[source]]
id        = 1
name      = "dev"
type      = "parquet"
path      = "{SF}"
changelog = "{changelog_dir}"
[source.primary_keys]
region = ["r_regionkey"]
nation = ["n_nationkey"]
[source.rules.global]
include_tables = ["region", "nation"]
"""
    )
    return str(p)


def test_engine_refuses_attach_past_purged_hole(spark, tmp_path):
    seg_dir = tmp_path / "changelog"
    seg_dir.mkdir()
    engine = Engine(load_config(_config(tmp_path, seg_dir)), spark=spark)
    engine.init_sources()
    snaps = engine.full_sync()
    p = max(int(s.pos) for s in snaps[1])

    # round 1: both tables get events, drain, watermarks advance
    _seg(str(seg_dir), "seg0.json", [z(p + 1)])
    _seg(str(seg_dir), "seg0n.json", [z(p + 2)], table="nation")
    engine.incremental_sync()

    # retention through the engine-reported safe pos never blocks attach
    safe = engine.safe_purge_pos(1)
    assert safe == z(p + 1)  # most-behind table (region) governs
    purge_changelog(str(seg_dir), through_pos=safe)
    _seg(str(seg_dir), "seg1.json", [z(p + 3)])
    engine.incremental_sync()  # attaches cleanly, applies seg1
    assert (
        engine.read_table(1, "main", "region")
        .filter("r_regionkey = 1")
        .first()
        .r_name
        == f"v{z(p + 3)}"
    )

    # disaster: an UNCONSUMED segment is purged -> boot must fail loudly
    _seg(str(seg_dir), "seg2.json", [z(p + 9)])
    purge_changelog(str(seg_dir), through_pos=z(p + 9))
    assert read_manifest(str(seg_dir))["purged_max_pos"] == z(p + 9)
    with pytest.raises(ChangelogPurgedError, match="resync required"):
        engine.incremental_sync()
