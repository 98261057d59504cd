"""Real-format media decoding: genuine PPM/BMP/WAV bytes through the
exact mapInPandas bodies the registered queries use. The synthetic
corpus can't validate these paths (md5 payloads never parse), so these
fixtures are the real-bytes contract."""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pandas as pd
import pytest

from go_cdc_spark.operators.multimodal import (
    decode_bmp,
    decode_png,
    decode_ppm,
    decode_wav,
    encode_png,
    encode_ppm,
    extract_features_batches,
    resize_batches,
)


def make_bmp(img: np.ndarray) -> bytes:
    """HxWx3 RGB uint8 → 24bpp bottom-up BMP bytes."""
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = []
    for r in img[::-1]:  # bottom-up row order
        row = r[:, ::-1].tobytes()  # RGB → BGR
        rows.append(row + b"\x00" * (stride - len(row)))
    pixel = b"".join(rows)
    off = 54
    header = b"BM" + struct.pack("<IHHI", off + len(pixel), 0, 0, off)
    info = struct.pack(
        "<IiihHIIiiII", 40, w, h, 1, 24, 0, len(pixel), 2835, 2835, 0, 0
    )
    return header + info + pixel


def make_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


@pytest.fixture
def ppm_img():
    rng = np.random.default_rng(7)
    return rng.integers(0, 256, size=(48, 64, 3), dtype=np.uint8)


def test_ppm_round_trip(ppm_img):
    w, h, img = decode_ppm(encode_ppm(ppm_img))
    assert (w, h) == (64, 48)
    assert np.array_equal(img, ppm_img)


def test_ppm_header_with_comment():
    raw = b"P6\n# a comment\n2 1\n255\n" + bytes(6)
    w, h, img = decode_ppm(raw)
    assert (w, h, img.shape) == (2, 1, (1, 2, 3))


def test_ppm_rejects_truncated_and_foreign():
    assert decode_ppm(b"P6\n2 2\n255\n" + bytes(5)) is None  # short pixels
    assert decode_ppm(b"\x00" * 16) is None
    assert decode_ppm(b"P6garbage") is None


def test_bmp_decode_known_pixels():
    img = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [10, 20, 30]]], dtype=np.uint8
    )
    w, h, out = decode_bmp(make_bmp(img))
    assert (w, h) == (2, 2)
    assert np.array_equal(out, img)  # orientation + BGR swap undone


def test_bmp_rejects_invalid():
    assert decode_bmp(b"BM" + bytes(20)) is None  # too short
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    payload = bytearray(make_bmp(img))
    payload[30] = 1  # compression != BI_RGB
    assert decode_bmp(bytes(payload)) is None


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def make_png_filtered(img: np.ndarray, filters: list[int]) -> bytes:
    """Build a PNG whose row y uses filter type filters[y] — exercises
    the Sub/Up/Average/Paeth unfilter paths our own encoder (filter 0
    everywhere) never emits."""
    import zlib

    h, w, ch = img.shape
    assert ch == 3
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.intp)
    for y in range(h):
        cur = img[y].reshape(-1).astype(np.intp)
        f = filters[y]
        raw.append(f)
        for x in range(w * ch):
            a = cur[x - ch] if x >= ch else 0
            b = prev[x]
            c = prev[x - ch] if x >= ch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            raw.append((cur[x] - pred) & 0xFF)
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def test_png_round_trip(ppm_img):
    w, h, img = decode_png(encode_png(ppm_img))
    assert (w, h) == (64, 48)
    assert np.array_equal(img, ppm_img)


def test_png_all_filter_types(ppm_img):
    img = ppm_img[:5]  # 5 rows, one per filter type
    w, h, out = decode_png(make_png_filtered(img, [0, 1, 2, 3, 4]))
    assert (w, h) == (64, 5)
    assert np.array_equal(out, img)


def test_png_gray_and_alpha_channels():
    import zlib

    # 2x2 grayscale (color type 0): filter-0 rows, 1 channel
    gray = np.array([[10, 20], [30, 40]], dtype=np.uint8)
    raw = b"\x00" + gray[0].tobytes() + b"\x00" + gray[1].tobytes()
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    w, h, img = decode_png(payload)
    assert (w, h) == (2, 2)
    assert np.array_equal(img, np.repeat(gray[..., None], 3, axis=2))
    # 1x1 RGBA (color type 6): alpha dropped
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 6, 0, 0, 0)
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"\x00\x07\x08\x09\xff"))
        + _png_chunk(b"IEND", b"")
    )
    w, h, img = decode_png(payload)
    assert img.tolist() == [[[7, 8, 9]]]


def test_png_rejects_invalid(ppm_img):
    good = encode_png(ppm_img[:2, :2])
    assert decode_png(b"\x89PNG\r\n\x1a\n" + bytes(16)) is None  # garbage chunks
    assert decode_png(b"\x00" * 16) is None  # no magic
    corrupt = bytearray(good)
    corrupt[-10] ^= 0xFF  # flip a byte inside IDAT → CRC mismatch
    assert decode_png(bytes(corrupt)) is None
    # 16-bit depth: recognized but unsupported → quarantine, not crash
    import zlib

    ihdr = struct.pack(">IIBBBBB", 1, 1, 16, 2, 0, 0, 0)
    deep = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(7)))
        + _png_chunk(b"IEND", b"")
    )
    assert decode_png(deep) is None


def test_resize_real_png(ppm_img):
    payload = encode_png(ppm_img)  # 64x48 → step 4 → 16x12
    pdf = pd.DataFrame(
        {"doc_id": [1], "media": [payload], "width": [64], "height": [48]}
    )
    (out,) = list(resize_batches(iter([pdf])))
    assert int(out.loc[0, "width"]) == 16 and int(out.loc[0, "height"]) == 12
    resized = bytes.fromhex(out.loc[0, "media_hex"])
    w, h, img = decode_png(resized)  # output is itself a valid PNG
    assert (w, h) == (16, 12)
    assert np.array_equal(img, ppm_img[::4, ::4])


def test_png_features_status(ppm_img):
    pdf = pd.DataFrame(
        {"doc_id": [1], "kind": ["image"], "media": [encode_png(ppm_img)]}
    )
    (out,) = list(extract_features_batches(iter([pdf])))
    assert out.loc[0, "decode_status"] == "png"
    assert out.loc[0, "byte_mean"] == pytest.approx(float(ppm_img.mean()))


def test_wav_decode_known_samples():
    samples = np.array([0, 1000, -1000, 32767], dtype=np.int16)
    nch, rate, nframes, out = decode_wav(make_wav(samples, rate=16000))
    assert (nch, rate, nframes) == (1, 16000, 4)
    assert np.array_equal(out, samples)


def test_features_batch_real_and_fallback(ppm_img):
    wav_samples = np.array([100, -100, 200, -200], dtype=np.int16)
    payloads = [
        encode_ppm(ppm_img),
        make_bmp(ppm_img[:2, :2]),
        make_wav(wav_samples),
        b"\x01\x02\x03\x04",  # unrecognized → stubbed
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "kind": ["image", "image", "audio", "video"],
            "media": payloads,
        }
    )
    (out,) = list(extract_features_batches(iter([pdf])))
    by_id = out.set_index("doc_id")
    assert by_id.loc[1, "decode_status"] == "ppm"
    assert by_id.loc[1, "byte_mean"] == pytest.approx(float(ppm_img.mean()))
    assert by_id.loc[2, "decode_status"] == "bmp"
    assert by_id.loc[2, "byte_mean"] == pytest.approx(float(ppm_img[:2, :2].mean()))
    assert by_id.loc[3, "decode_status"] == "wav"
    assert by_id.loc[3, "byte_mean"] == pytest.approx(0.0)
    assert by_id.loc[4, "decode_status"] == "stubbed"
    assert by_id.loc[4, "byte_mean"] == pytest.approx(10 / 4)
    assert (by_id["n_bytes"] == [len(p) for p in payloads]).all()


def test_resize_real_ppm(ppm_img):
    payload = encode_ppm(ppm_img)  # 64x48 → step 4 → 16x12
    pdf = pd.DataFrame(
        {"doc_id": [1], "media": [payload], "width": [64], "height": [48]}
    )
    (out,) = list(resize_batches(iter([pdf])))
    assert int(out.loc[0, "width"]) == 16 and int(out.loc[0, "height"]) == 12
    resized = bytes.fromhex(out.loc[0, "media_hex"])
    w, h, img = decode_ppm(resized)  # output is itself a valid PPM
    assert (w, h) == (16, 12)
    assert np.array_equal(img, ppm_img[::4, ::4])


def test_real_bytes_through_spark_map_in_pandas(spark, ppm_img):
    """Genuine format bytes survive the Arrow binary transport and take
    the real decoder inside an actual Spark job."""
    from go_cdc_spark.operators.multimodal import _FEATURE_SCHEMA

    rows = [
        (1, "image", bytearray(encode_ppm(ppm_img))),
        (2, "audio", bytearray(make_wav(np.array([5, -5], dtype=np.int16)))),
        (3, "video", bytearray(b"\xde\xad\xbe\xef")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, kind string, media binary")
    out = {
        r.doc_id: r
        for r in df.mapInPandas(extract_features_batches, _FEATURE_SCHEMA).collect()
    }
    assert out[1].decode_status == "ppm"
    assert out[1].byte_mean == pytest.approx(float(ppm_img.mean()))
    assert out[2].decode_status == "wav"
    assert out[3].decode_status == "stubbed"


# ---------------------------------------------------------------------------
# Perceptual hash (aHash) over real pixels
# ---------------------------------------------------------------------------


def test_ahash_known_image():
    """Hand-checkable hash: left half dark, right half bright → the
    right 4 columns of every 8x8 row are above the mean."""
    from go_cdc_spark.operators.multimodal import ahash64

    img = np.zeros((16, 16), dtype=np.uint8)
    img[:, 8:] = 255
    h = ahash64(img)
    expect_row = 0b00001111
    expect = 0
    for _ in range(8):
        expect = (expect << 8) | expect_row
    assert h == expect


def test_ahash_noise_invariance_and_discrimination(ppm_img):
    """aHash survives light noise and re-encoding (BMP vs PPM of the
    same pixels) but separates structurally different images — the
    property byte-exact dedup lacks."""
    from go_cdc_spark.operators.multimodal import ahash64, decode_bmp, decode_ppm

    rng = np.random.RandomState(3)
    base = (rng.rand(32, 32, 3) * 128).astype(np.uint8)
    base[:16, :16] += 100  # strong OFF-CENTER structure dwarfing the noise
    noisy = base.copy()
    noise = rng.randint(-3, 4, size=base.shape)
    noisy = np.clip(base.astype(int) + noise, 0, 255).astype(np.uint8)
    assert ahash64(base) == ahash64(noisy)

    # same pixels, different container → same hash (md5 differs!)
    _, _, via_ppm = decode_ppm(encode_ppm(base))
    _, _, via_bmp = decode_bmp(make_bmp(base))
    assert ahash64(via_ppm) == ahash64(via_bmp)

    different = base[::-1, ::-1].copy()  # flipped structure
    assert ahash64(base) != ahash64(different)


def test_phash_batches_real_and_fallback(ppm_img):
    """The mapInPandas body routes decodable payloads to aHash-64
    ('image') and opaque payloads to the byte-level aHash-16
    ('bytes')."""
    from go_cdc_spark.operators.multimodal import (
        _bytes_ahash16,
        ahash64,
        phash_batches,
    )

    ppm_bytes = encode_ppm(ppm_img)
    pdf = pd.DataFrame(
        {"doc_id": [1, 2], "media": [ppm_bytes, bytes(range(16))]}
    )
    out = pd.concat(list(phash_batches(iter([pdf]))))
    got = {r.doc_id: (r.phash, r.hash_kind) for r in out.itertuples()}
    assert got[1] == (ahash64(ppm_img), "image")
    assert got[2] == (_bytes_ahash16(bytes(range(16))), "bytes")


def test_phash_banded_lossless_on_real_images(spark):
    """Measured blocking quality on genuine pixels: 4×16-bit banding at
    hamming ≤ 3 must find EVERY true near-pair (pigeonhole-lossless —
    recall 1.0 is a theorem here, the test guards the implementation),
    and the verified output must equal the exact all-pairs scan."""
    from go_cdc_spark.operators.multimodal import ahash64, phash_banded_pairs

    rng = np.random.RandomState(5)
    hashes = []
    doc_id = 0
    for _ in range(30):
        base = (rng.rand(24, 24, 3) * 110).astype(np.uint8)
        base[: rng.randint(4, 20), : rng.randint(4, 20)] += 120
        noisy = np.clip(
            base.astype(int) + rng.randint(-4, 5, size=base.shape), 0, 255
        ).astype(np.uint8)
        hashes.append((doc_id, ahash64(base)))
        hashes.append((doc_id + 1, ahash64(noisy)))
        doc_id += 2

    # exact all-pairs ground truth at the same radius
    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    truth = {
        (a_id, b_id)
        for i, (a_id, a_h) in enumerate(hashes)
        for b_id, b_h in hashes[i + 1 :]
        if ham(a_h, b_h) <= 3
    }
    assert truth, "fixture produced no near pairs — regenerate"

    hashed = spark.createDataFrame(hashes, "doc_id long, phash long")
    got = {
        (r["doc_a"], r["doc_b"])
        for r in phash_banded_pairs(
            hashed, n_bands=4, band_bits=16, max_hamming=3
        ).collect()
    }
    assert got == truth  # recall 1.0 AND no false positives post-verify
