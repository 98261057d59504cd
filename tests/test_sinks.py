"""Sink wrappers (A13): parquet event-log sink end-to-end; console and
kafka writers build without starting (kafka needs the cluster package)."""

from __future__ import annotations

import json

from go_cdc_spark.sources.changelog import CHANGE_EVENT_SCHEMA
from go_cdc_spark.streaming.pipeline import read_changelog_stream
from go_cdc_spark.streaming.sinks import console_sink, kafka_sink, parquet_sink


def _write_segment(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _rows():
    return [
        {
            "data_source": "ds1",
            "schema": "main",
            "table": "t",
            "op": "insert",
            "data": {"id": str(i), "v": f"v{i}"},
            "before": None,
            "ts": None,
            "pos": str(i).zfill(12),
            "txn_id": None,
        }
        for i in range(4)
    ]


def test_parquet_sink_event_log(spark, tmp_path):
    src = tmp_path / "changelog"
    src.mkdir()
    _write_segment(src / "seg0.json", _rows())
    stream = read_changelog_stream(spark, str(src))
    q = parquet_sink(
        stream, str(tmp_path / "log"), str(tmp_path / "ckpt")
    ).start()
    q.processAllAvailable()
    q.stop()
    out = spark.read.schema(CHANGE_EVENT_SCHEMA).parquet(str(tmp_path / "log"))
    assert out.count() == 4
    # partitioned by (schema, table) for per-table scan pruning
    assert (tmp_path / "log" / "schema=main" / "table=t").exists()


def test_console_and_kafka_writers_build(spark, tmp_path):
    src = tmp_path / "changelog"
    src.mkdir()
    _write_segment(src / "seg0.json", _rows())
    stream = read_changelog_stream(spark, str(src))
    assert console_sink(stream) is not None
    assert kafka_sink(stream, "broker:9092", "cdc.events", str(tmp_path / "k")) is not None
