"""SparkSession factory with scale-aware defaults.

Local test profile runs on ``local[N]`` but every knob is chosen so the
same logical plans survive a 1000-executor / 100 TB deployment:

- AQE on (runtime coalescing, skew-join splitting, dynamic join
  selection) — at 100 TB static shuffle-partition counts are always
  wrong, AQE re-plans from actual map-output sizes.
- ``spark.sql.shuffle.partitions`` defaults to cores locally; on a real
  cluster you set it high (2-3× total cores) and let AQE coalesce.
- Arrow enabled so any Pandas-UDF path is vectorized batch transfer.
- Session timezone pinned UTC so event-time semantics match the oracle
  (DuckDB timestamps are UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "go_cdc_spark", cpus: str | None = None) -> SparkSession:
    """Build (or fetch) the session with engine defaults applied."""
    cpus = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.streaming.stateStore.stateSchemaCheck", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
