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

Crash-replay contract: corpus and store land in DETERMINISTIC
per-batch partition dirs (``batch=<id>``) written with overwrite, and
novelty is computed against strictly-earlier batches only — so a
foreachBatch replay (crash between the two sink writes and the
checkpoint commit) recomputes the identical survivor set and
overwrites the same directories instead of double-appending to one
sink and not the other.
"""

from __future__ import annotations

import os
import shutil
import uuid as uuidlib

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


def _batch_ids(path: str) -> list[int]:
    if not os.path.isdir(path):
        return []
    return sorted(
        int(d.split("=", 1)[1]) for d in os.listdir(path) if d.startswith("batch=")
    )


def migrate_legacy_flat(path: str) -> int:
    """Stores written by the pre-partitioned (flat append) layout hold
    parquet files at the directory root instead of ``batch=<id>`` dirs.
    Mixing the two layouts in one directory breaks Spark's partition
    discovery, and the replay filter needs a ``batch`` value — so on
    first contact the flat files are MOVED (pure rename, no rewrite)
    into a ``batch=-1`` dir: strictly below any streaming batch id,
    i.e. committed history that every replay filter keeps. Returns the
    number of files migrated."""
    if not os.path.isdir(path):
        return 0
    flat = [
        n
        for n in os.listdir(path)
        if not n.startswith(("batch=", "_", "."))
        and os.path.isfile(os.path.join(path, n))
    ]
    if not flat:
        return 0
    legacy = os.path.join(path, "batch=-1")
    os.makedirs(legacy, exist_ok=True)
    for n in flat:
        os.rename(os.path.join(path, n), os.path.join(legacy, n))
    return len(flat)


def recover_compaction(path: str) -> None:
    """Finish (or discard) a compaction interrupted by a crash. The tmp
    dir name encodes the target batch id; the sweep deletes the target
    dir FIRST, so its presence discriminates the two crash sides:

    - target still present → the sweep never started; every merged dir
      is intact — discard the tmp (no data ever lived only there);
    - target missing → the sweep had begun; the tmp holds the full
      merged content — promote it, then delete every remaining dir
      below the target (their rows are already inside the merge)."""
    if not os.path.isdir(path):
        return
    for d in os.listdir(path):
        if not d.startswith("_compact-"):
            continue
        tid = int(d.split("-")[1])
        target = os.path.join(path, f"batch={tid}")
        src = os.path.join(path, d)
        if os.path.exists(target):
            shutil.rmtree(src, ignore_errors=True)
        else:
            os.rename(src, target)
            for i in _batch_ids(path):
                if i < tid:
                    shutil.rmtree(
                        os.path.join(path, f"batch={i}"), ignore_errors=True
                    )


def compact_batches(spark: SparkSession, path: str, keep_last: int = 1) -> int:
    """OFFLINE maintenance for the per-batch ingest stores: merge all
    but the last ``keep_last`` batch directories into one, bounding the
    directory (and file) count that otherwise grows one-per-micro-batch
    — the small-files problem at 100 TB scale.

    Run between streaming runs (stop the query first). Correctness of
    the replay contract is preserved because only the LAST committed
    batch can ever replay, and the merged directory keeps the largest
    merged id — still strictly below any live or future batch id. A
    crash mid-compaction is repaired by :func:`recover_compaction`
    (the tmp dir is underscore-prefixed, so parquet readers never see
    a half-merged state). Returns the number of directories merged."""
    # keep_last is clamped to >= 1: merging the NEWEST batch dir would
    # break the replay contract above — if the query stopped with that
    # batch uncommitted, its restart replay overwrites batch=<last_id>,
    # which after a keep_last=0 merge would hold the entire history.
    keep_last = max(keep_last, 1)
    recover_compaction(path)
    ids = _batch_ids(path)
    if len(ids) <= keep_last:
        return 0
    merge = ids[: len(ids) - keep_last]
    if len(merge) < 2:
        return 0
    target = merge[-1]
    df = (
        spark.read.parquet(path)
        .filter(F.col("batch") <= target)
        .drop("batch")
        .coalesce(max(1, len(merge) // 8))
    )
    tmp = os.path.join(path, f"_compact-{target}-{uuidlib.uuid4().hex[:8]}")
    df.write.mode("overwrite").parquet(tmp)
    # target FIRST: once it is gone, recovery knows the tmp is the only
    # complete copy and promotes it (see recover_compaction)
    for i in sorted(merge, reverse=True):
        shutil.rmtree(os.path.join(path, f"batch={i}"), ignore_errors=True)
    os.rename(tmp, os.path.join(path, f"batch={target}"))
    return len(merge)


class DedupIngest:
    """foreachBatch consumer: dedup against history, append survivors.

    Subclasses swap the fingerprint derivation (``_with_fp``) and the
    two schemas — see :class:`MediaDedupIngest` for the perceptual
    (phash) twin over binary media streams."""

    fp_schema = FP_SCHEMA
    doc_schema = DOC_SCHEMA
    query_name = "dedup_ingest"

    def __init__(self, spark: SparkSession, corpus_path: str, fp_path: str) -> None:
        self.spark = spark
        self.corpus_path = corpus_path
        self.fp_path = fp_path

    def _with_fp(self, batch: DataFrame) -> DataFrame:
        """Batch rows + an `fp` column (exact: md5 of the text)."""
        return batch.withColumn("fp", F.md5("text"))

    def _known(self, before_batch: int | None = None) -> DataFrame:
        if os.path.exists(self.fp_path):
            df = self.spark.read.parquet(self.fp_path)
            # a store from the pre-partitioned (flat append) layout has
            # no `batch` column; its rows all predate any replayable
            # batch, so treating them as batch < any id is exact
            if before_batch is not None and "batch" in df.columns:
                # replay safety: a replayed batch must not see its own
                # (possibly partially written) prior attempt
                df = df.filter(F.col("batch") < before_batch)
            return df
        return self.spark.createDataFrame([], self.fp_schema)

    def corpus(self) -> DataFrame:
        if os.path.exists(self.corpus_path):
            return self.spark.read.parquet(self.corpus_path).drop("batch")
        return self.spark.createDataFrame([], self.doc_schema)

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        migrate_legacy_flat(self.corpus_path)
        migrate_legacy_flat(self.fp_path)
        fp = self._with_fp(batch)
        # within-batch survivor: min doc_id per fingerprint (deterministic)
        w_min = fp.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
        batch_first = fp.join(w_min, ["fp", "doc_id"])  # first occurrences only
        # localCheckpoint pins the survivor set BEFORE writing: the two
        # overwrites otherwise each re-run the anti-join, and the second
        # one would scan fp_path while writing to it (a lazy
        # read-during-write of the same directory)
        novel = batch_first.join(
            self._known(before_batch=batch_id), "fp", "left_anti"
        ).localCheckpoint(eager=True)
        # deterministic per-batch dirs + overwrite = replay-idempotent
        novel.select(*[f.name for f in self.doc_schema.fields]).write.mode(
            "overwrite"
        ).parquet(f"{self.corpus_path}/batch={batch_id}")
        novel.select("fp", "doc_id").write.mode("overwrite").parquet(
            f"{self.fp_path}/batch={batch_id}"
        )

    def start(self, docs_stream: DataFrame, checkpoint_dir: str):
        return (
            docs_stream.writeStream.queryName(self.query_name)
            .option("checkpointLocation", checkpoint_dir)
            .foreachBatch(self.process_batch)
            .trigger(availableNow=True)
            .start()
        )


MEDIA_FP_SCHEMA = T.StructType(
    [
        T.StructField("fp", T.LongType()),
        T.StructField("doc_id", T.LongType()),
    ]
)

MEDIA_DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media", T.BinaryType()),
        T.StructField("kind", T.StringType()),
    ]
)


class MediaDedupIngest(DedupIngest):
    """Cross-batch PERCEPTUAL dedup of a media stream: the streaming
    twin of operators/multimodal.media_phash_dedup, exactly as
    DedupIngest twins dedup_exact. The fingerprint is the average hash
    (aHash-64 for decodable images, the byte-level aHash-16 analog for
    opaque payloads — see multimodal.phash_batches), so a re-encoded or
    lightly-noised copy of an already-ingested image is dropped even
    though its bytes (and md5) differ.

    Everything else — strictly-earlier-batch novelty, deterministic
    per-batch overwrite dirs, legacy-layout migration, the
    localCheckpoint pin before the two sink writes — is inherited
    verbatim from DedupIngest, so the crash-replay contract proven for
    the text form holds here unchanged. Per batch, bytes cross to
    Python once (Arrow batches) to hash; the store joins on (fp LONG)
    and never carries media bytes."""

    fp_schema = MEDIA_FP_SCHEMA
    doc_schema = MEDIA_DOC_SCHEMA
    query_name = "media_dedup_ingest"

    def _with_fp(self, batch: DataFrame) -> DataFrame:
        from ..operators.multimodal import _PHASH_SCHEMA, phash_batches

        hashes = batch.select("doc_id", "media").mapInPandas(
            phash_batches, _PHASH_SCHEMA
        ).select("doc_id", F.col("phash").alias("fp"))
        return batch.join(hashes, "doc_id")


def read_docs_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    return (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(path)
    )


# ---------------------------------------------------------------------------
# Streaming NEAR-dup ingestion: MinHash signature store + band-key
# candidate lookup. The batch pipeline's dedup_minhash_lsh
# (operators/dedup.py) answers "find all near-dup pairs in a corpus";
# ingestion needs the online form: "is this incoming doc a near-dup of
# ANYTHING already accepted?" — answered per batch against a persistent
# (band_key, doc_id, signature) store, no corpus rescan.
# ---------------------------------------------------------------------------

from ..operators.dedup import BAND_ROWS, MINHASH_K, N_SEEDS  # noqa: E402
from ..operators.text import shingles_col  # noqa: E402

SIG_COLS = [f"h{i}" for i in range(MINHASH_K)]
NEAR_DUP_EST = 0.5  # signature-agreement threshold (lane-match fraction)


def _signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, h0..h{MINHASH_K-1}) via the codegen explode-aggregate
    shape (see dedup_minhash_lsh for why not array-lambda folds)."""
    ex = docs.select("doc_id", F.explode(shingles_col()).alias("s"))
    hashed = ex.select(
        "doc_id",
        *[
            F.md5(F.concat(F.lit(f"{g}:"), F.col("s"))).alias(f"dg{g}")
            for g in range(N_SEEDS)
        ],
    )
    return hashed.groupBy("doc_id").agg(
        *[
            F.min(F.substring(f"dg{i // 4}", 1 + 8 * (i % 4), 8)).alias(f"h{i}")
            for i in range(MINHASH_K)
        ]
    )


def _banded(sig: DataFrame) -> DataFrame:
    return sig.select(
        "doc_id",
        *SIG_COLS,
        F.explode(
            F.array(
                *[
                    F.md5(
                        F.concat_ws(
                            "|",
                            *[F.col(f"h{b * BAND_ROWS + r}") for r in range(BAND_ROWS)],
                        )
                    )
                    for b in range(MINHASH_K // BAND_ROWS)
                ]
            )
        ).alias("band"),
    )


def _lane_agreement(prefix_a: str, prefix_b: str) -> F.Column:
    matches = sum(
        F.when(F.col(f"{prefix_a}{c}") == F.col(f"{prefix_b}{c}"), 1).otherwise(0)
        for c in SIG_COLS
    )
    return matches / F.lit(float(MINHASH_K))


class NearDupIngest:
    """foreachBatch consumer: drop docs whose MinHash signature agrees
    with an already-accepted doc's on >= {NEAR_DUP_EST} of lanes
    (candidates found via shared LSH bands — never a full-store scan).

    Within a batch the survivor rule is greedy by doc_id: a doc is
    dropped if it near-matches any LOWER-id doc that itself entered the
    comparison, the same one-pass compromise online dedup systems make
    (a full transitive-closure pass is the batch pipeline's job —
    dedup_clusters)."""

    def __init__(self, spark: SparkSession, corpus_path: str, store_path: str) -> None:
        self.spark = spark
        self.corpus_path = corpus_path
        self.store_path = store_path

    def _store(self, before_batch: int | None = None) -> DataFrame:
        if os.path.exists(self.store_path):
            df = self.spark.read.parquet(self.store_path)
            # legacy flat-layout stores carry no `batch` column; all
            # their rows are strictly earlier than any replayable batch
            if before_batch is not None and "batch" in df.columns:
                # replay safety: ignore this batch's own prior attempt
                df = df.filter(F.col("batch") < before_batch)
            return df
        schema = ", ".join(["band string", "doc_id long"] + [f"{c} string" for c in SIG_COLS])
        return self.spark.createDataFrame([], schema)

    def corpus(self) -> DataFrame:
        if os.path.exists(self.corpus_path):
            return self.spark.read.parquet(self.corpus_path).drop("batch")
        return self.spark.createDataFrame([], DOC_SCHEMA)

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        migrate_legacy_flat(self.corpus_path)
        migrate_legacy_flat(self.store_path)
        banded = _banded(_signatures(batch)).localCheckpoint(eager=True)
        store = self._store(before_batch=batch_id)
        # vs store: any shared band -> compare signatures
        s = store.select(
            "band", F.col("doc_id").alias("o_doc_id"),
            *[F.col(c).alias(f"o_{c}") for c in SIG_COLS],
        )
        hit_store = (
            banded.join(s, "band")
            .filter(_lane_agreement("", "o_") >= NEAR_DUP_EST)
            .select("doc_id")
            .distinct()
        )
        # vs batch: lower-id near-match wins (greedy one-pass)
        b = banded.select(
            "band", F.col("doc_id").alias("b_doc_id"),
            *[F.col(c).alias(f"b_{c}") for c in SIG_COLS],
        )
        hit_batch = (
            banded.join(b, "band")
            .filter(F.col("b_doc_id") < F.col("doc_id"))
            .filter(_lane_agreement("", "b_") >= NEAR_DUP_EST)
            .select("doc_id")
            .distinct()
        )
        dropped = hit_store.union(hit_batch).distinct()
        survivors = (
            batch.join(dropped, "doc_id", "left_anti").localCheckpoint(eager=True)
        )
        # deterministic per-batch dirs + overwrite = replay-idempotent
        # (see module docstring): a replayed batch recomputes the same
        # survivor set against the pre-batch store and overwrites its
        # own directories instead of appending beside them
        survivors.select(*[f.name for f in DOC_SCHEMA.fields]).write.mode(
            "overwrite"
        ).parquet(f"{self.corpus_path}/batch={batch_id}")
        new_entries = banded.join(
            survivors.select("doc_id"), "doc_id", "left_semi"
        ).select("band", "doc_id", *SIG_COLS)
        new_entries.write.mode("overwrite").parquet(
            f"{self.store_path}/batch={batch_id}"
        )

    def start(self, docs_stream: DataFrame, checkpoint_dir: str):
        return (
            docs_stream.writeStream.queryName("near_dup_ingest")
            .option("checkpointLocation", checkpoint_dir)
            .foreachBatch(self.process_batch)
            .trigger(availableNow=True)
            .start()
        )
