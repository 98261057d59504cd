"""Event sinks (A12/A13): the delivery edge of the pipeline.

The reference's consumer loop drains a bounded channel into an
``EventConsumer`` whose only implementation logs to console
(`internal/cannal/fullamount_service.go:203-223`,
`internal/cannal/fullamount_event.go:86-96`); Kafka/RabbitMQ delivery
is named as the intended downstream (`docs/全量抓取逻辑.md:27`). Spark's
``writeStream`` gives all of these as formats; the valuable sink — the
one the reference never finished — is the foreachBatch MERGE
materializer in :mod:`.pipeline`.

Everything here is a thin, uniform wrapper so pipelines swap delivery
targets without touching their plan: ``sink(stream).start()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamWriter


def console_sink(events: DataFrame, truncate: bool = False) -> DataStreamWriter:
    """Exact analog of the reference's ConsoleConsumer."""
    return events.writeStream.format("console").option("truncate", str(truncate).lower())


def parquet_sink(
    events: DataFrame, path: str, checkpoint_dir: str
) -> DataStreamWriter:
    """Append-only event log (the replayable archive a 100 TB pipeline
    keeps upstream of materialization). Partition by (schema, table) so
    per-table consumers prune their scan."""
    return (
        events.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("schema", "table")
    )


def kafka_sink(
    events: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint_dir: str,
) -> DataStreamWriter:
    """Kafka delivery (the reference's intended downstream). Key by
    (schema, table, pk-bearing data) so one table's changes land in one
    partition in order — the ordering contract consumers rely on.
    Requires the spark-sql-kafka package on the cluster classpath; the
    wrapper only *builds* the writer, so it stays testable without it."""
    payload = events.select(
        F.concat_ws("|", F.col("schema"), F.col("table")).alias("key"),
        F.to_json(F.struct(*events.columns)).alias("value"),
    )
    return (
        payload.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
    )
