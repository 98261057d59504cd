#!/usr/bin/env python
"""Streaming perceptual-dedup ingest throughput: items/second through
MediaDedupIngest (parquet media segments → readStream → mapInPandas
aHash → anti-join store → per-batch overwrite sinks), including every
state rewrite and checkpoint commit — the media twin of
stream_bench.py's CDC apply-path figure.

Payload mix mirrors reality: ~1/4 real decodable images (PPM, taking
the aHash-64 pixel path) and 3/4 opaque byte payloads (the aHash-16
path), with a 10% duplicate rate so the dedup join has real work.

Usage: python tools/media_ingest_bench.py [n_items] [n_segments]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from go_cdc_spark.operators.multimodal import encode_ppm  # noqa: E402
from go_cdc_spark.session import get_spark  # noqa: E402
from go_cdc_spark.streaming.ingest import (  # noqa: E402
    MEDIA_DOC_SCHEMA,
    MediaDedupIngest,
)

N_ITEMS = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
N_SEGMENTS = int(sys.argv[2]) if len(sys.argv) > 2 else 4


def _payload(i: int, rng: np.ndarray) -> bytes:
    import hashlib

    base = i % (N_ITEMS * 9 // 10)  # ~10% duplicates by construction
    if base % 4 == 0:  # real image path
        img = ((rng[base % len(rng)] + base) % 256).astype(np.uint8)
        return encode_ppm(img)
    # full-entropy opaque payload (a counter's leading-zero bytes would
    # collapse the 16-bit hash space and understate the dedup join)
    return hashlib.md5(str(base).encode()).digest()


def main() -> None:
    spark = get_spark()
    rng = np.random.RandomState(3).randint(0, 256, size=(64, 12, 12, 3))
    root = tempfile.mkdtemp(prefix="media_bench_")
    seg = os.path.join(root, "media")
    try:
        per = N_ITEMS // N_SEGMENTS
        for s in range(N_SEGMENTS):
            rows = [
                (i, bytearray(_payload(i, rng)), "image")
                for i in range(s * per, (s + 1) * per)
            ]
            scratch = os.path.join(root, f"scratch{s}")
            spark.createDataFrame(rows, MEDIA_DOC_SCHEMA).coalesce(1).write.mode(
                "overwrite"
            ).parquet(scratch)
            os.makedirs(seg, exist_ok=True)
            part = next(
                f for f in os.listdir(scratch) if f.startswith("part-")
            )
            shutil.move(
                os.path.join(scratch, part), os.path.join(seg, f"seg{s}.parquet")
            )
        ing = MediaDedupIngest(
            spark, os.path.join(root, "corpus"), os.path.join(root, "fps")
        )
        stream = (
            spark.readStream.schema(MEDIA_DOC_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(seg)
        )
        t0 = time.time()
        ing.start(stream, os.path.join(root, "ckpt")).awaitTermination(600)
        dt = time.time() - t0
        kept = ing.corpus().count()
        print(
            json.dumps(
                {
                    "metric": "media_ingest_eps",
                    "n_items": N_ITEMS,
                    "n_segments": N_SEGMENTS,
                    "kept": kept,
                    "seconds": round(dt, 2),
                    "items_per_sec": round(N_ITEMS / dt),
                }
            )
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
