"""Incremental-stream event operators: demux (A19), GTID watermark
accumulation (A21), update before/after pairing (A22).

The reference's binlog loop demuxes library events with a Go type
switch (`internal/cannal/incremental.go:188-231`) and — in its intended
design (`internal/cannal/handler.go:55-125`, commented out) — buffers
per transaction and pairs an update's consecutive (before, after) rows.
Here the same semantics are declarative DataFrame transforms: the demux
is a codegen'd ``when`` chain; the pairing is one shuffle keyed by
transaction; watermark accumulation is a tiny per-batch aggregate whose
result folds into the pure-Python :class:`~go_cdc_spark.functions.gtid.
GtidSet` (driver-side, O(uuids) rows — never a collect of data).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.gtid import GtidSet

# Event kinds after demux (A19's GTIDEvent / QueryEvent / RowsEvent switch).
KIND_GTID = "gtid"
KIND_DDL = "ddl"
KIND_QUERY = "query"  # non-DDL query events — ignored, like the reference
KIND_ROW = "row"

# DDL prefix classification, `internal/cannal/incremental.go:210-223`:
# the reference string-matches CREATE/ALTER/DROP/RENAME/TRUNCATE prefixes.
DDL_PATTERN = r"^(CREATE|ALTER|DROP|RENAME|TRUNCATE)\b"


def is_ddl_col(query: Column | str) -> Column:
    return F.upper(F.trim(query)).rlike(DDL_PATTERN)


def classify_events(raw: DataFrame) -> DataFrame:
    """Tag each raw replication record with ``event_kind`` (A19).

    Input contract (the file/kafka-replay shape of the binlog):
    GTID records carry (uuid, gno); query records carry ``query``;
    row records carry ``op``. One ``when`` chain, entirely JVM-side —
    branch once, then downstream filters prune by kind.
    """
    return raw.withColumn(
        "event_kind",
        F.when(F.col("uuid").isNotNull() & F.col("gno").isNotNull(), KIND_GTID)
        .when(F.col("query").isNotNull() & is_ddl_col("query"), KIND_DDL)
        .when(F.col("query").isNotNull(), KIND_QUERY)
        .otherwise(KIND_ROW),
    )


def gtid_watermark(events: DataFrame) -> DataFrame:
    """Per-server-UUID high-water mark of a (micro-)batch (A21):
    ``groupBy(uuid).max(gno)`` — the declarative form of the reference's
    mutex-guarded ``SetGTID`` per event. The result is O(#server-uuids)
    rows (single digits), safe to collect into the checkpoint."""
    return (
        events.filter(F.col("uuid").isNotNull() & F.col("gno").isNotNull())
        .groupBy("uuid")
        .agg(F.max("gno").alias("max_gno"), F.min("gno").alias("min_gno"))
    )


def accumulate_gtid(watermark_rows: list, gtid: GtidSet) -> GtidSet:
    """Fold a collected watermark into the running GTID set. Ranges are
    extended [min, max] per uuid — within one replication connection
    gnos arrive gap-free, matching the reference's extend-else-append
    (`internal/model/gtid.go:58-72`); true gaps stay separate ranges."""
    out = gtid
    for row in watermark_rows:
        out = out.union(GtidSet({row["uuid"]: [(row["min_gno"], row["max_gno"])]}))
    return out


def pair_update_images(
    rows: DataFrame,
    image_col: str = "data",
    txn_col: str = "txn_id",
    seq_col: str = "pos",
    op_col: str = "op",
) -> DataFrame:
    """Fold an update's two consecutive rows into ONE event carrying
    both images (A22, `internal/cannal/handler.go:100-108`: rows[i] is
    the before-image, rows[i+1] the after-image, i += 2).

    Sources that already fold (Debezium, our snapshot layer) skip this;
    it exists for raw binlog-replay inputs where each update arrives as
    an (even, odd) row pair within its transaction.

    Shape: rank update rows within their transaction, pair by
    ``(rank-1) div 2``, then one groupBy emits before=min-seq image /
    data=max-seq image per pair. The only shuffle is keyed by
    (txn, pair) — transactions are independent, so this scales with
    stream width, and a whale transaction skews only its own key space
    (AQE skew-split applies).
    """
    upd = rows.filter(F.col(op_col) == "update")
    others = rows.filter(F.col(op_col) != "update").withColumn(
        "before",
        F.when(
            F.col(op_col) == "delete", F.col(image_col)
        ).otherwise(F.lit(None).cast(rows.schema[image_col].dataType)),
    )
    # delete events: the reference puts the deleted row in Before, not Data
    others = others.withColumn(
        image_col,
        F.when(F.col(op_col) == "delete", F.lit(None).cast(rows.schema[image_col].dataType))
        .otherwise(F.col(image_col)),
    )

    w = Window.partitionBy(txn_col).orderBy(seq_col)
    paired = (
        upd.withColumn("__rn", F.row_number().over(w))
        .withColumn("__pair", ((F.col("__rn") - 1) / 2).cast("long"))
        .groupBy(txn_col, "__pair")
        .agg(
            F.min_by(image_col, seq_col).alias("before"),
            F.max_by(image_col, seq_col).alias(image_col),
            F.max_by(op_col, seq_col).alias(op_col),
            F.max(seq_col).alias(seq_col),
        )
        .drop("__pair")
    )
    return others.select(*paired.columns).unionByName(paired)
