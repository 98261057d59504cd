"""Multimodal (image/audio/video) column plumbing.

Media is carried as an opaque ``binary`` column plus a typed metadata
struct — the schema pattern for 100 TB multimodal corpora: the bytes
stay unparsed through shuffles/joins (no decode amplification), and all
pipeline decisions (routing, sampling, budgeting) read the cheap typed
metadata. Decode / feature-extraction runs as Arrow-batched pandas
functions over ``mapInPandas`` so the bytes cross the JVM↔Python
boundary once per batch, never per row.

The container ships no image/audio libs, so the actual decoders are
STUBBED (clearly marked, gated behind import-try) — but everything
Spark-side is real and tested: binary column construction, metadata
struct, byte slicing (frame sampling), mapInPandas batch shape, and the
partitioning story.

Test corpus: the driver parquet has no media table, so media bytes are
derived deterministically from ``documents.text`` (md5 → unhex) in BOTH
engines — the oracle checks real binary semantics (octet_length, byte
slices via hex) without fixture files.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..plans.registry import query
from ..tables import load

KINDS = ("image", "audio", "video")
FRAME_BYTES = 4  # bytes per sampled "frame" of the 16-byte fake payload
N_FRAMES = 3


def with_media(docs: DataFrame) -> DataFrame:
    """Attach the opaque media column + typed metadata struct.

    In production this is what a parquet scan of a multimodal table
    yields directly: ``media BINARY`` (or a reference to object
    storage) + ``media_meta STRUCT<kind, width, height, n_frames>``.
    """
    kind = F.element_at(F.array(*[F.lit(k) for k in KINDS]), (F.col("doc_id") % 3 + 1).cast("int"))
    return docs.select(
        "doc_id",
        F.unhex(F.md5(F.col("text"))).alias("media"),
        F.struct(
            kind.alias("kind"),
            (F.lit(32) + F.col("doc_id") % 64).cast("int").alias("width"),
            (F.lit(32) + F.col("doc_id") % 48).cast("int").alias("height"),
            F.lit(N_FRAMES).cast("int").alias("n_frames"),
        ).alias("media_meta"),
    )


_MEDIA_SQL = """
SELECT doc_id,
       unhex(md5(text)) AS media,
       ['image', 'audio', 'video'][CAST(doc_id % 3 AS INTEGER) + 1] AS kind,
       CAST(32 + doc_id % 64 AS INTEGER) AS width,
       CAST(32 + doc_id % 48 AS INTEGER) AS height,
       3 AS n_frames
FROM documents
""".strip()


@query(
    "multimodal_meta",
    oracle=f"""
    SELECT kind,
           COUNT(*) AS n_items,
           CAST(SUM(octet_length(media)) AS BIGINT) AS sum_bytes,
           CAST(SUM(width * height) AS BIGINT) AS sum_pixels
    FROM ({_MEDIA_SQL})
    GROUP BY kind
    """,
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus budgeting over media metadata only — the scan prunes to
    (kind, width, height, octet_length); bytes are never deserialized.
    This is the query shape that must stay cheap at 100 TB."""
    media = with_media(load(spark, sf_dir, "documents"))
    return media.groupBy(F.col("media_meta.kind").alias("kind")).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.length("media")).alias("sum_bytes"),
        F.sum((F.col("media_meta.width") * F.col("media_meta.height")).cast("long")).alias(
            "sum_pixels"
        ),
    )


@query(
    "media_frame_sample",
    oracle=f"""
    SELECT doc_id,
           CAST(frame_idx AS INTEGER) AS frame_idx,
           substring(hex(media), CAST((frame_idx - 1) * {FRAME_BYTES} * 2 + 1 AS BIGINT),
                     {FRAME_BYTES * 2}) AS frame_hex
    FROM ({_MEDIA_SQL})
    CROSS JOIN (SELECT unnest(range(1, {N_FRAMES} + 1)) AS frame_idx)
    WHERE kind = 'video'
    """,
)
def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strided frame sampling: slice each video payload into
    fixed-stride byte windows — one output row per (doc, frame), the
    explode shape a real video pipeline uses (keyframe index → byte
    range fetch). Slicing is JVM-side ``substring`` on the binary;
    nothing crosses into Python."""
    media = with_media(load(spark, sf_dir, "documents"))
    frames = media.filter(F.col("media_meta.kind") == "video").select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.lit(N_FRAMES))).alias("frame_idx"),
        "media",
    )
    return frames.select(
        "doc_id",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        F.hex(
            F.expr(f"substring(media, (frame_idx - 1) * {FRAME_BYTES} + 1, {FRAME_BYTES})")
        ).alias("frame_hex"),
    )


_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("byte_mean", T.DoubleType()),
        T.StructField("decode_status", T.StringType()),
    ]
)


def _decode_media(payload: bytes, kind: str) -> dict:
    """Real decoder hook — STUB. The container has no PIL/librosa/ffmpeg;
    when they're present this becomes Image.open(BytesIO(payload)) etc.
    Until then we fall back to a deterministic byte-level feature so the
    pipeline shape stays testable end to end."""
    try:  # pragma: no cover - libs absent in this container by design
        import PIL.Image  # noqa: F401

        raise NotImplementedError("real image decode not wired yet")
    except ImportError:
        pass
    return {
        "n_bytes": len(payload),
        "byte_mean": float(sum(payload)) / max(len(payload), 1),
        "decode_status": "stubbed",
    }


_FEATURES_ORACLE = """
WITH m AS (
    SELECT doc_id, md5(text) AS hx,
           ['image', 'audio', 'video'][CAST(doc_id % 3 AS INTEGER) + 1] AS kind
    FROM documents
), b AS (
    SELECT doc_id, kind,
           SUM(16 * (strpos('0123456789abcdef', substring(hx, 2 * i - 1, 1)) - 1)
               + (strpos('0123456789abcdef', substring(hx, 2 * i, 1)) - 1)) AS sum_bytes
    FROM m, (SELECT unnest(range(1, 17)) AS i)
    GROUP BY doc_id, kind
)
SELECT doc_id, kind, CAST(16 AS INTEGER) AS n_bytes,
       CAST(sum_bytes AS DOUBLE) / 16 AS byte_mean,
       'stubbed' AS decode_status
FROM b
"""


@query("media_features", oracle=_FEATURES_ORACLE)
def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over media bytes via ``mapInPandas``: Arrow
    moves each partition's (doc_id, media, kind) in columnar batches;
    Python touches bytes once per row inside the batch loop. At 100 TB
    this stage is sized by bytes-per-partition, not rows —
    ``spark.sql.files.maxPartitionBytes`` is the knob; the output is
    small typed features, so everything downstream is cheap again."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_decode_media(m, k) for m, k in zip(pdf["media"], pdf["kind"])]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            out.insert(1, "kind", pdf["kind"].values)
            yield out

    media = with_media(load(spark, sf_dir, "documents")).select(
        "doc_id", F.col("media_meta.kind").alias("kind"), "media"
    )
    return media.mapInPandas(extract, _FEATURE_SCHEMA)


_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)

TARGET_EDGE = 16


@query("media_resize")  # rows-only: binary→binary Python transform
def media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize stage: binary in, binary out, metadata updated — the
    shape of every media-transform stage (resize, transcode, crop).
    The real resampler is stubbed like the decoder (no image libs in
    this container); the stand-in is a deterministic byte downsample
    (every k-th byte) so output size tracks the target dimensions and
    the pipeline stays verifiable end to end.

    Scale note: output partitions shrink by the resize ratio — follow
    with coalesce (not repartition) when writing, to avoid tiny files
    without an extra shuffle."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # import-gate ONCE per task, not per row: when a real resampler
        # lands, this branch point is batch-level and the loop below
        # stays the only per-item work (decoding an image is inherently
        # per-item; everything else is vectorized)
        try:  # pragma: no cover - absent by design
            import PIL.Image  # noqa: F401

            have_pil = True
        except ImportError:
            have_pil = False
        import numpy as np

        for pdf in batches:
            if have_pil:  # pragma: no cover - absent by design
                raise NotImplementedError("real resample not wired yet")
            # step = floor(max(w,h)/edge), clamped ≥1 — all vectorized
            step = np.maximum(
                np.maximum(pdf["width"], pdf["height"]) // TARGET_EDGE, 1
            ).astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    # byte-slicing a variable-length blob is per-item by
                    # nature (C-speed slice, no Python arithmetic inside)
                    "media": [
                        bytes(m[::k]) for m, k in zip(pdf["media"], step)
                    ],
                    "width": np.maximum(pdf["width"] // step, 1).astype("int32"),
                    "height": np.maximum(pdf["height"] // step, 1).astype("int32"),
                }
            )

    media = with_media(load(spark, sf_dir, "documents")).filter(
        F.col("media_meta.kind") == "image"
    ).select(
        "doc_id", "media", F.col("media_meta.width").alias("width"),
        F.col("media_meta.height").alias("height"),
    )
    return media.mapInPandas(resize, _RESIZE_SCHEMA)
