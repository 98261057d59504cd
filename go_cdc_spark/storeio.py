"""Crash-safe parquet store swap, shared by every driver-side store
(materializer state, checkpoint meta, txn-gate pending store).

Pattern: write the new contents to a ``.tmp-`` sibling, demote the live
dir to ``.old-``, promote the tmp, sweep the old. A crash between the
two renames leaves only the ``.old-`` dir; :func:`recover` promotes it
back, losing at most the batch in flight — which the streaming
checkpoint redelivers, and every consumer's merge is idempotent
(max-pos latest-wins / keyed upsert).
"""

from __future__ import annotations

import os
import shutil
import uuid as uuidlib

from pyspark.sql import DataFrame


def swap_in(df: DataFrame, path: str) -> None:
    """Atomically replace the parquet dir at ``path`` with ``df``."""
    tmp = f"{path}.tmp-{uuidlib.uuid4().hex[:8]}"
    df.write.mode("overwrite").parquet(tmp)
    if os.path.exists(path):
        old = f"{path}.old-{uuidlib.uuid4().hex[:8]}"
        os.rename(path, old)
        os.rename(tmp, path)
        shutil.rmtree(old, ignore_errors=True)
    else:
        os.rename(tmp, path)


def _siblings(path: str, kind: str) -> list[str]:
    d = os.path.dirname(path) or "."
    base = os.path.basename(path) + f".{kind}-"
    if not os.path.isdir(d):
        return []
    return sorted(os.path.join(d, n) for n in os.listdir(d) if n.startswith(base))


def recover(path: str) -> None:
    """Promote a demoted ``.old-`` store back if a torn swap left no
    live dir; sweep stale ``.tmp-``/``.old-`` leftovers either way."""
    olds = _siblings(path, "old")
    if not os.path.exists(path) and olds:
        os.rename(olds[-1], path)
        olds = olds[:-1]
    for stale in olds + _siblings(path, "tmp"):
        shutil.rmtree(stale, ignore_errors=True)
