"""Multimodal (image/audio/video) column plumbing.

Media is carried as an opaque ``binary`` column plus a typed metadata
struct — the schema pattern for 100 TB multimodal corpora: the bytes
stay unparsed through shuffles/joins (no decode amplification), and all
pipeline decisions (routing, sampling, budgeting) read the cheap typed
metadata. Decode / feature-extraction runs as Arrow-batched pandas
functions over ``mapInPandas`` so the bytes cross the JVM↔Python
boundary once per batch, never per row.

Decoders: REAL for the formats the stdlib can parse — PPM (P6), BMP and
PNG images (PNG critical chunks via ``zlib``: IHDR/IDAT/IEND, all five
scanline filters, 8-bit gray/RGB/alpha), WAV audio (via ``wave``).
Formats needing external libs (JPEG/MP3/MP4) remain import-gated: when
PIL/librosa are present they take over, otherwise an *unrecognized*
payload falls back to a deterministic byte-level feature
(``decode_status='stubbed'``) so the pipeline shape stays testable end
to end. Recognition is strict (magic + full header validation + PNG
CRCs), so fixture payloads (16 md5 bytes) can never accidentally enter
a real decoder and perturb the oracle.

Test corpus: the driver parquet has no media table, so media bytes are
derived deterministically from ``documents.text`` (md5 → unhex) in BOTH
engines — the oracle checks real binary semantics (octet_length, byte
slices via hex) without fixture files. Real-format decode paths are
covered by pytest fixtures of genuine PPM/BMP/WAV bytes
(tests/test_multimodal_real.py).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
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


# ---------------------------------------------------------------------------
# Real stdlib decoders: PPM (P6), BMP (uncompressed 24/32bpp), WAV.
# Strict validation — any malformed header falls back to the byte-level
# stub path, so arbitrary payloads can never crash a 100 TB job (the
# decode stage's error channel is the decode_status column, mirroring
# the quarantine philosophy of the CDC path).
# ---------------------------------------------------------------------------


def decode_ppm(payload: bytes):
    """P6 (binary) PPM → (width, height, HxWx3 uint8 array), or None if
    the payload is not a valid P6 image."""
    if not payload.startswith(b"P6"):
        return None
    # header = magic, width, height, maxval as ASCII tokens separated by
    # whitespace/comments, then ONE whitespace byte, then raw RGB
    tokens, i, n = [], 2, len(payload)
    while len(tokens) < 3 and i < n:
        while i < n and payload[i : i + 1].isspace():
            i += 1
        if i < n and payload[i : i + 1] == b"#":  # comment to EOL
            while i < n and payload[i] not in (10, 13):
                i += 1
            continue
        start = i
        while i < n and not payload[i : i + 1].isspace():
            i += 1
        if i == start:
            return None
        tokens.append(payload[start:i])
    if len(tokens) < 3 or i >= n:
        return None
    i += 1  # the single whitespace after maxval
    try:
        width, height, maxval = (int(t) for t in tokens)
    except ValueError:
        return None
    if width <= 0 or height <= 0 or maxval != 255:
        return None
    pixels = payload[i:]
    if len(pixels) != width * height * 3:
        return None
    return width, height, np.frombuffer(pixels, dtype=np.uint8).reshape(
        height, width, 3
    )


def encode_ppm(arr: np.ndarray) -> bytes:
    """HxWx3 uint8 → P6 bytes (inverse of decode_ppm)."""
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.astype(np.uint8).tobytes()


def decode_bmp(payload: bytes):
    """Uncompressed 24/32bpp BITMAPINFOHEADER BMP → (width, height,
    HxWx3 uint8 array, top row first), or None if not valid."""
    if len(payload) < 54 or not payload.startswith(b"BM"):
        return None
    file_size, pixel_off = struct.unpack_from("<I4xI", payload, 2)
    hdr_size, width, height, planes, bpp, compression = struct.unpack_from(
        "<IiihHI", payload, 14
    )
    if hdr_size < 40 or planes != 1 or compression != 0 or bpp not in (24, 32):
        return None
    if width <= 0 or height == 0 or file_size > len(payload):
        return None
    flipped = height > 0  # positive height = bottom-up storage
    height = abs(height)
    bypp = bpp // 8
    stride = (width * bypp + 3) & ~3  # rows pad to 4-byte boundaries
    if pixel_off + stride * height > len(payload):
        return None
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * height, offset=pixel_off
    ).reshape(height, stride)
    img = rows[:, : width * bypp].reshape(height, width, bypp)[..., :3]
    img = img[..., ::-1]  # BGR(A) → RGB
    if flipped:
        img = img[::-1]
    return width, height, img


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # gray, RGB, gray+A, RGBA


def _png_unfilter(raw: bytes, width: int, height: int, ch: int):
    """Reverse PNG scanline filtering (types 0-4) → HxWxch uint8, or
    None on a malformed stream. Sub/Average/Paeth carry a left-pixel
    dependency, so those rows run a per-pixel loop; None/Up rows stay
    vectorized. This code runs inside the Arrow batch loop — cost is
    bounded by bytes-per-batch, same as the rest of the decode stage."""
    stride = width * ch
    if len(raw) != (stride + 1) * height:
        return None
    img = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.intp)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.intp)
        if ftype == 0:
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth
            cur = line.copy()
            for x in range(stride):
                a = cur[x - ch] if x >= ch else 0
                b = prev[x]
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + b) >> 1
                else:
                    c = prev[x - ch] if x >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                cur[x] = (cur[x] + pred) & 0xFF
        else:
            return None
        img[y] = cur
        prev = cur
    return img.reshape(height, width, ch)


def decode_png(payload: bytes):
    """PNG (critical chunks, 8-bit gray/RGB/±alpha, no interlace) →
    (width, height, HxWx3 uint8 RGB array), or None if not a valid /
    supported PNG. Pure stdlib: chunk walk + CRC check + ``zlib``
    inflate + filter reversal. Palette (type 3), 16-bit, and Adam7
    payloads are recognized-but-unsupported → None (quarantine path),
    never an exception."""
    import zlib

    if not payload.startswith(_PNG_MAGIC):
        return None
    pos, n = len(_PNG_MAGIC), len(payload)
    hdr = None
    idat = []
    while pos + 8 <= n:
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length or pos + 12 + length > n:
            return None
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            return None
        if ctype == b"IHDR":
            if length != 13:
                return None
            hdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if hdr is None or not idat:
        return None
    width, height, depth, color, comp, filt, interlace = hdr
    ch = _PNG_CHANNELS.get(color)
    if (
        ch is None or depth != 8 or comp != 0 or filt != 0 or interlace != 0
        or width <= 0 or height <= 0
    ):
        return None
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error:
        return None
    img = _png_unfilter(raw, width, height, ch)
    if img is None:
        return None
    if ch == 1:
        img = np.repeat(img, 3, axis=2)
    elif ch == 2:
        img = np.repeat(img[..., :1], 3, axis=2)
    elif ch == 4:
        img = img[..., :3]
    return width, height, img


def encode_png(arr: np.ndarray) -> bytes:
    """HxWx3 uint8 → PNG bytes (filter 0 rows, one zlib stream) — the
    inverse of decode_png for the resize/transcode stages."""
    import zlib

    h, w = arr.shape[:2]
    raw = b"".join(
        b"\x00" + arr[y].astype(np.uint8).tobytes() for y in range(h)
    )

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_wav(payload: bytes):
    """PCM WAV → (n_channels, sample_rate, n_frames, sample array), or
    None if not a parseable RIFF/WAVE payload."""
    if len(payload) < 44 or not (
        payload.startswith(b"RIFF") and payload[8:12] == b"WAVE"
    ):
        return None
    import io
    import wave

    try:
        with wave.open(io.BytesIO(payload)) as w:
            nch, sw, rate, nframes = (
                w.getnchannels(), w.getsampwidth(), w.getframerate(), w.getnframes(),
            )
            raw = w.readframes(nframes)
    except Exception:
        return None
    dtype = {1: np.uint8, 2: np.dtype("<i2"), 4: np.dtype("<i4")}.get(sw)
    if dtype is None:
        return None
    samples = np.frombuffer(raw, dtype=dtype)
    return nch, rate, nframes, samples


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
    """Per-item decode: real formats first (strict magic + header
    validation), then optional external libs, then the deterministic
    byte-level fallback. ``byte_mean`` is over DECODED content (pixel /
    sample bytes) for real formats, raw payload bytes otherwise."""
    ppm = decode_ppm(payload)
    if ppm is not None:
        _w, _h, img = ppm
        return {
            "n_bytes": len(payload),
            "byte_mean": float(img.mean()),
            "decode_status": "ppm",
        }
    bmp = decode_bmp(payload)
    if bmp is not None:
        _w, _h, img = bmp
        return {
            "n_bytes": len(payload),
            "byte_mean": float(img.mean()),
            "decode_status": "bmp",
        }
    png = decode_png(payload)
    if png is not None:
        _w, _h, img = png
        return {
            "n_bytes": len(payload),
            "byte_mean": float(img.mean()),
            "decode_status": "png",
        }
    wav = decode_wav(payload)
    if wav is not None:
        _nch, _rate, _nf, samples = wav
        return {
            "n_bytes": len(payload),
            "byte_mean": float(samples.astype(np.float64).mean())
            if len(samples)
            else 0.0,
            "decode_status": "wav",
        }
    try:  # pragma: no cover - external libs absent in this container
        import io

        import PIL.Image

        # JPEG (and any other PIL-supported compressed format): decode,
        # with the quarantine fallback below on any parse failure
        try:
            with PIL.Image.open(io.BytesIO(payload)) as im:
                arr = np.asarray(im.convert("RGB"))
            return {
                "n_bytes": len(payload),
                "byte_mean": float(arr.mean()),
                "decode_status": im.format.lower() if im.format else "pil",
            }
        except Exception:
            pass  # fall through to the byte-level quarantine path
    except ImportError:
        pass
    return {
        "n_bytes": len(payload),
        "byte_mean": float(sum(payload)) / max(len(payload), 1),
        "decode_status": "stubbed",
    }


def extract_features_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas body for feature extraction (module-level so real-
    format tests drive the exact production code path)."""
    for pdf in batches:
        feats = [_decode_media(m, k) for m, k in zip(pdf["media"], pdf["kind"])]
        out = pd.DataFrame(feats)
        out.insert(0, "doc_id", pdf["doc_id"].values)
        out.insert(1, "kind", pdf["kind"].values)
        yield out


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
    small typed features, so everything downstream is cheap again.

    The fixture payloads (16 md5 bytes) never validate as
    PPM/BMP/PNG/WAV, so the oracle checks the byte-level path; genuine
    format bytes take the real decoders (tests/test_multimodal_real.py)."""
    media = with_media(load(spark, sf_dir, "documents")).select(
        "doc_id", F.col("media_meta.kind").alias("kind"), "media"
    )
    return media.mapInPandas(extract_features_batches, _FEATURE_SCHEMA)


_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("media_hex", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)

TARGET_EDGE = 16


def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body for the resize stage. Valid PPM/PNG payloads get
    a REAL nearest-neighbor resample (decode → subsample → re-encode);
    anything else gets the deterministic byte decimation stand-in so the
    stage stays verifiable over the synthetic corpus. Output is the
    transformed payload hex plus updated dimensions — hex rather than
    raw binary so the driver's oracle can recompute it with nibble
    arithmetic."""
    for pdf in batches:
        out_bytes, out_w, out_h = [], [], []
        for m, w, h in zip(pdf["media"], pdf["width"], pdf["height"]):
            decoded = decode_ppm(m)
            encode = encode_ppm
            if decoded is None:
                decoded = decode_png(m)
                encode = encode_png
            if decoded is not None:
                pw, ph, img = decoded
                k = max(max(pw, ph) // TARGET_EDGE, 1)
                small = img[::k, ::k]
                out_bytes.append(encode(small))
                out_h.append(small.shape[0])
                out_w.append(small.shape[1])
            else:
                # stand-in: every k-th byte; k from the metadata dims
                k = max(max(w, h) // TARGET_EDGE, 1)
                out_bytes.append(bytes(m[::k]))
                out_w.append(max(w // k, 1))
                out_h.append(max(h // k, 1))
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": np.array([len(b) for b in out_bytes], dtype="int32"),
                "media_hex": [b.hex().upper() for b in out_bytes],
                "width": np.array(out_w, dtype="int32"),
                "height": np.array(out_h, dtype="int32"),
            }
        )


_RESIZE_ORACLE = f"""
WITH m AS (
    SELECT doc_id, md5(text) AS hx,
           CAST(32 + doc_id % 64 AS INTEGER) AS width,
           CAST(32 + doc_id % 48 AS INTEGER) AS height
    FROM documents WHERE doc_id % 3 = 0
), s AS (
    SELECT doc_id, width, height,
           GREATEST(GREATEST(width, height) // {TARGET_EDGE}, 1) AS step, hx
    FROM m
), e AS (
    SELECT doc_id, width, height, step,
           upper(string_agg(substring(hx, CAST(2 * i + 1 AS BIGINT), 2),
                            '' ORDER BY i)) AS media_hex,
           COUNT(*) AS n_bytes
    FROM s, (SELECT unnest(range(0, 16)) AS i) t(i)
    WHERE i % step = 0
    GROUP BY doc_id, width, height, step
)
SELECT doc_id,
       CAST(n_bytes AS INTEGER) AS n_bytes,
       media_hex,
       CAST(GREATEST(width // step, 1) AS INTEGER) AS width,
       CAST(GREATEST(height // step, 1) AS INTEGER) AS height
FROM e
"""


@query("media_resize", oracle=_RESIZE_ORACLE)
def media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize stage: binary in, transformed payload out, metadata
    updated — the shape of every media-transform stage (resize,
    transcode, crop). Real PPM payloads are genuinely resampled
    (nearest-neighbor via numpy); the synthetic corpus takes the
    deterministic byte-decimation stand-in, which the oracle recomputes
    hex-nibble-by-nibble (so this stage is value-checked, not
    rows-only).

    Scale note: output partitions shrink by the resize ratio — follow
    with coalesce (not repartition) when writing, to avoid tiny files
    without an extra shuffle."""
    media = with_media(load(spark, sf_dir, "documents")).filter(
        F.col("media_meta.kind") == "image"
    ).select(
        "doc_id", "media", F.col("media_meta.width").alias("width"),
        F.col("media_meta.height").alias("height"),
    )
    return media.mapInPandas(resize_batches, _RESIZE_SCHEMA)


# ---------------------------------------------------------------------------
# Perceptual-hash image dedup (average hash): near-duplicate detection
# that survives re-encoding and light noise, which byte-exact dedup
# (md5 over the payload) by construction cannot. Real decodable images
# (PPM/BMP/PNG) take the classic aHash-64: block-mean downsample to
# 8x8 gray, threshold each cell against the 64-cell mean, pack 64 bits
# MSB-first. Undecodable payloads (the synthetic fixture's 16 md5
# bytes) take the byte-level analog — aHash-16 over the raw bytes as a
# 4x4 "image" — which is exactly expressible in SQL, so the registered
# query carries a FULL hash-checked oracle while the real-image path
# is proven on genuine pixel data in tests/test_multimodal_real.py
# (noise-invariance + discrimination), the media_features split.
# ---------------------------------------------------------------------------


def ahash64(img: np.ndarray) -> int:
    """Average hash of a decoded image (h, w[, ch]) -> 64-bit int.
    Block-mean 8x8 downsample (integer cell edges i*h//8), grayscale by
    channel mean, strict > against the global cell mean."""
    a = np.asarray(img, dtype=np.float64)
    if a.ndim == 3:
        a = a.mean(axis=2)
    h, w = a.shape
    cells = np.empty((8, 8), dtype=np.float64)
    for i in range(8):
        for j in range(8):
            r0, r1 = i * h // 8, max((i + 1) * h // 8, i * h // 8 + 1)
            c0, c1 = j * w // 8, max((j + 1) * w // 8, j * w // 8 + 1)
            cells[i, j] = a[r0:r1, c0:c1].mean()
    m = cells.mean()
    bits = (cells > m).astype(np.uint64).ravel()
    out = np.uint64(0)
    for b in bits:
        out = np.uint64(out << np.uint64(1)) | b
    v = int(out)
    # two's-complement fold into BIGINT range (the simhash convention):
    # a set MSB otherwise infers a pandas uint64 column, which Arrow
    # refuses to convert to the LongType the schema declares
    return v - (1 << 64) if v >= (1 << 63) else v


def _bytes_ahash16(payload: bytes) -> int:
    """Byte-level aHash for undecodable payloads: bit i set iff byte_i
    exceeds the payload mean — compared as ``byte_i * len > sum(bytes)``
    (exact integers, no float mean), first 16 bytes, packed MSB-first.
    For the 16-byte fixture payloads this is the SQL oracle's
    ``b * 16 > total`` literally."""
    n = len(payload)
    if n == 0:
        return 0
    total = sum(payload)
    out = 0
    for i, b in enumerate(payload[:16]):
        if b * n > total:
            out |= 1 << (15 - i)
    return out


def phash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body: decode-if-possible, hash accordingly."""
    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
            decoded = None
            for dec in (decode_ppm, decode_bmp, decode_png):
                got = dec(payload)
                if got is not None:
                    decoded = got[2]
                    break
            if decoded is not None:
                rows.append((doc_id, ahash64(decoded), "image"))
            else:
                rows.append((doc_id, _bytes_ahash16(payload), "bytes"))
        out = pd.DataFrame(rows, columns=["doc_id", "phash", "hash_kind"])
        out["phash"] = out["phash"].astype("int64")
        yield out


_PHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("phash", T.LongType()),
        T.StructField("hash_kind", T.StringType()),
    ]
)

_PHASH_ORACLE = """
WITH m AS (
    SELECT doc_id, md5(text) AS hx FROM documents
), by AS (
    SELECT doc_id, i,
           16 * (strpos('0123456789abcdef', substring(hx, 2 * i - 1, 1)) - 1)
             + (strpos('0123456789abcdef', substring(hx, 2 * i, 1)) - 1) AS b
    FROM m, (SELECT unnest(range(1, 17)) AS i)
), tot AS (
    SELECT doc_id, SUM(b) AS total FROM by GROUP BY doc_id
), h AS (
    SELECT by.doc_id,
           CAST(SUM(CASE WHEN b * 16 > total
                    THEN CAST(1 AS BIGINT) << (16 - i) ELSE 0 END)
                AS BIGINT) AS phash
    FROM by JOIN tot USING (doc_id)
    GROUP BY by.doc_id
)
SELECT phash,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       MIN(doc_id) AS keep_doc_id
FROM h
GROUP BY phash
"""


@query("media_phash_dedup", oracle=_PHASH_ORACLE)
def media_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-duplicate buckets over the media column: group by
    average-hash, deterministic survivor (min doc_id) — the dedup_exact
    contract lifted from byte identity to PIXEL identity-up-to-noise.

    Scale shape: hashing is one mapInPandas pass (bytes cross the
    JVM↔Python boundary once per Arrow batch; output is 3 scalar
    columns), then a count/min aggregation keyed by the 64-bit hash
    with map-side partials — the skew-immune dedup_exact plan. A
    hamming-tolerant variant bands the 64-bit hash into 4×16-bit keys
    exactly like dedup_simhash_banded; the bucket form here is the
    exact-perceptual-match tier."""
    media = with_media(load(spark, sf_dir, "documents")).select("doc_id", "media")
    hashed = media.mapInPandas(phash_batches, _PHASH_SCHEMA)
    return hashed.groupBy("phash").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.min("doc_id").alias("keep_doc_id"),
    )


# ---------------------------------------------------------------------------
# Hamming-tolerant perceptual near-dup pairs: the banded tier above the
# exact-bucket dedup (the dedup_simhash_banded move applied to aHash).
# Pigeonhole: a pair within hamming h must agree on at least one of
# h+1 disjoint bands, so banding is LOSSLESS for the radius it is
# sized for — candidates come from band-key self-joins, never an
# all-pairs scan. Fixture path: 16-bit hashes, 2×8-bit bands, verify
# hamming ≤ 1 (lossless). Real images use the same helper at 64-bit /
# 4×16-bit / hamming ≤ 3 (tests measure recall 1.0 by construction and
# the false-candidate rate on genuine pixels).
# ---------------------------------------------------------------------------

_PHASH_BAND_BITS = 8
_PHASH_N_BANDS = 2
_PHASH_MAX_HAMMING = 1


def phash_banded_pairs(
    hashed: DataFrame,
    n_bands: int = _PHASH_N_BANDS,
    band_bits: int = _PHASH_BAND_BITS,
    max_hamming: int = _PHASH_MAX_HAMMING,
) -> DataFrame:
    """(doc_id, phash) → verified near-dup pairs (doc_a, doc_b,
    hamming ≤ max_hamming). Lossless iff n_bands > max_hamming.

    Scale shape: one self-join per band keyed by the band value (hot
    buckets — flat/monochrome images — get the dedup_simhash_banded
    hub valve at production scale), a distinct over the candidate
    union, and an XOR-popcount verify on candidates only."""
    mask = (1 << band_bits) - 1
    pairs = None
    for j in range(n_bands):
        key = F.shiftrightunsigned(F.col("phash"), j * band_bits).bitwiseAND(
            F.lit(mask)
        )
        b = hashed.select("doc_id", "phash", key.alias("band"))
        a_, b_ = b.alias("a"), b.alias("b")
        cand = a_.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        ).select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.phash").alias("ha"),
            F.col("b.phash").alias("hb"),
        )
        pairs = cand if pairs is None else pairs.union(cand)
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        pairs.distinct()
        .withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


_PHASH_H_CTES = """
m AS (
    SELECT doc_id, md5(text) AS hx FROM documents
), by AS (
    SELECT doc_id, i,
           16 * (strpos('0123456789abcdef', substring(hx, 2 * i - 1, 1)) - 1)
             + (strpos('0123456789abcdef', substring(hx, 2 * i, 1)) - 1) AS b
    FROM m, (SELECT unnest(range(1, 17)) AS i)
), tot AS (
    SELECT doc_id, SUM(b) AS total FROM by GROUP BY doc_id
), h AS MATERIALIZED (
    SELECT by.doc_id,
           CAST(SUM(CASE WHEN b * 16 > total
                    THEN CAST(1 AS BIGINT) << (16 - i) ELSE 0 END)
                AS BIGINT) AS phash
    FROM by JOIN tot USING (doc_id)
    GROUP BY by.doc_id
)
""".strip()

_PHASH_BANDED_ORACLE = f"""
WITH {_PHASH_H_CTES},
cand AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           a.phash AS ha, b.phash AS hb
    FROM h a JOIN h b
      ON a.doc_id < b.doc_id AND a.phash // 256 = b.phash // 256
    UNION
    SELECT a.doc_id, b.doc_id, a.phash, b.phash
    FROM h a JOIN h b
      ON a.doc_id < b.doc_id AND a.phash % 256 = b.phash % 256
)
SELECT doc_a, doc_b, CAST(bit_count(xor(ha, hb)) AS INTEGER) AS hamming
FROM cand WHERE bit_count(xor(ha, hb)) <= {_PHASH_MAX_HAMMING}
"""


@query("media_phash_banded", oracle=_PHASH_BANDED_ORACLE)
def media_phash_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual NEAR-dup pairs (hamming ≤ {_PHASH_MAX_HAMMING}) over
    the media column via {_PHASH_N_BANDS}×{_PHASH_BAND_BITS}-bit band
    blocking — lossless for this radius by pigeonhole, so the output
    is exactly the pairs an all-pairs hamming scan would find, at
    band-bucket-join cost."""
    media = with_media(load(spark, sf_dir, "documents")).select("doc_id", "media")
    hashed = media.mapInPandas(phash_batches, _PHASH_SCHEMA).select(
        "doc_id", "phash"
    )
    return phash_banded_pairs(hashed)


_PHASH_SURVIVORS_ORACLE = f"""
WITH RECURSIVE {_PHASH_H_CTES},
cand AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           a.phash AS ha, b.phash AS hb
    FROM h a JOIN h b
      ON a.doc_id < b.doc_id AND a.phash // 256 = b.phash // 256
    UNION
    SELECT a.doc_id, b.doc_id, a.phash, b.phash
    FROM h a JOIN h b
      ON a.doc_id < b.doc_id AND a.phash % 256 = b.phash % 256
),
pairs AS (
    SELECT doc_a, doc_b FROM cand
    WHERE bit_count(xor(ha, hb)) <= {_PHASH_MAX_HAMMING}
),
sym AS (
    SELECT doc_a AS a, doc_b AS b FROM pairs
    UNION
    SELECT doc_b AS a, doc_a AS b FROM pairs
),
reach(a, b) AS (
    SELECT a, a FROM (SELECT DISTINCT a FROM sym)
    UNION
    SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
),
members AS (
    SELECT a AS doc_id, MIN(b) AS cluster_id FROM reach GROUP BY a
)
SELECT d.doc_id FROM documents d
LEFT JOIN members m ON d.doc_id = m.doc_id
WHERE m.doc_id IS NULL OR m.doc_id = m.cluster_id
"""


@query("media_phash_survivors", oracle=_PHASH_SURVIVORS_ORACLE)
def media_phash_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The perceptually-deduped corpus: connected components over the
    verified hamming-≤{_PHASH_MAX_HAMMING} pairs, keep each class's min
    doc_id, untouched docs survive as singletons — the dedup_survivors
    contract lifted to pixel space, completing the phash family
    (buckets → pairs → survivors). CC runs through the shared hybrid
    (driver union-find under the counted edge threshold, distributed
    min-label + pointer doubling above it — operators/dedup.py)."""
    from .dedup import connected_components

    docs = load(spark, sf_dir, "documents").select("doc_id")
    pairs = media_phash_banded(spark, sf_dir).select("doc_a", "doc_b")
    members = connected_components(pairs, "doc_a", "doc_b")
    non_reps = members.filter(F.col("node") != F.col("cluster_id")).select(
        F.col("node").alias("doc_id")
    )
    return docs.join(non_reps, "doc_id", "left_anti")
