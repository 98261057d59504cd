"""Continuous corpus ingestion with cross-batch exact dedup: the
streaming form of operators/dedup.dedup_exact for an always-growing
training corpus. Each micro-batch of documents drops (a) duplicates
within the batch (first occurrence by doc_id wins — the deterministic
survivor rule, not dropDuplicates' partition-order roulette) and
(b) anything whose fingerprint is already in the persistent store,
then appends the survivors and their fingerprints.

Scale shape per batch: the fingerprint store carries (fp, doc_id)
pairs only — never text — so the anti-join shuffles the batch's
fingerprints against a fingerprint-bucketed store; at 100 TB the
store is written bucketed by fp (operators/bucketed.py shows the
plumbing) and the join is co-located with zero store-side shuffle.
Text lands append-only in the corpus sink; nothing ever rewrites.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

FP_SCHEMA = T.StructType(
    [
        T.StructField("fp", T.StringType()),
        T.StructField("doc_id", T.LongType()),
    ]
)

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
    ]
)


class DedupIngest:
    """foreachBatch consumer: dedup against history, append survivors."""

    def __init__(self, spark: SparkSession, corpus_path: str, fp_path: str) -> None:
        self.spark = spark
        self.corpus_path = corpus_path
        self.fp_path = fp_path

    def _known(self) -> DataFrame:
        if os.path.exists(self.fp_path):
            return self.spark.read.parquet(self.fp_path)
        return self.spark.createDataFrame([], FP_SCHEMA)

    def corpus(self) -> DataFrame:
        if os.path.exists(self.corpus_path):
            return self.spark.read.parquet(self.corpus_path)
        return self.spark.createDataFrame([], DOC_SCHEMA)

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        fp = batch.withColumn("fp", F.md5("text"))
        # within-batch survivor: min doc_id per fingerprint (deterministic)
        w_min = fp.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
        batch_first = fp.join(w_min, ["fp", "doc_id"])  # first occurrences only
        # localCheckpoint pins the survivor set BEFORE writing: the two
        # appends otherwise each re-run the anti-join, and the second
        # one would scan fp_path while appending to it (a lazy
        # read-during-write of the same directory)
        novel = batch_first.join(self._known(), "fp", "left_anti").localCheckpoint(
            eager=True
        )
        novel.select(*[f.name for f in DOC_SCHEMA.fields]).write.mode("append").parquet(
            self.corpus_path
        )
        novel.select("fp", "doc_id").write.mode("append").parquet(self.fp_path)

    def start(self, docs_stream: DataFrame, checkpoint_dir: str):
        return (
            docs_stream.writeStream.queryName("dedup_ingest")
            .option("checkpointLocation", checkpoint_dir)
            .foreachBatch(self.process_batch)
            .trigger(availableNow=True)
            .start()
        )


def read_docs_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    return (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(path)
    )
