"""Custom stateful streaming operators (``applyInPandasWithState``).

The reference keeps two pieces of mutable state in its binlog loop: the
advancing GTID watermark (mutex-guarded ``SetGTID`` per event,
`internal/cannal/incremental.go:195-208`) and, in the intended design,
per-transaction event buffers flushed on commit
(`internal/cannal/handler.go:55-75`). Spark's stateful-processing API
expresses both as keyed state over a stream — checkpointed, restart-safe,
and scaled by key hashing rather than a single mutex:

- :func:`watermark_tracker` — running per-source position high-water
  mark + event count. State is O(1) per source; output is the updated
  watermark per micro-batch (the thing A14/A15 checkpoint rows record).
- :func:`txn_assembler` — groups events by transaction and emits one
  row per *completed* transaction (commit marker seen), holding open
  transactions in state with a processing-time timeout so an abandoned
  txn cannot leak state forever — the buffering semantics of OnRow/OnXID.

Both are Arrow-batched: pandas DataFrames per key-group, state crosses
the boundary once per group per batch, not per row.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

WATERMARK_OUTPUT = T.StructType(
    [
        T.StructField("data_source", T.StringType()),
        T.StructField("max_pos", T.StringType()),
        T.StructField("n_events", T.LongType()),
    ]
)

_WATERMARK_STATE = T.StructType(
    [
        T.StructField("max_pos", T.StringType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def _track_watermark(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    max_pos, n = state.get if state.exists else (None, 0)
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        batch_max = pdf["pos"].max()
        max_pos = batch_max if max_pos is None else max(max_pos, batch_max)
        n += len(pdf)
    state.update((max_pos, n))
    yield pd.DataFrame([{"data_source": key[0], "max_pos": max_pos, "n_events": n}])


def watermark_tracker(changes: DataFrame) -> DataFrame:
    """Running high-water mark per source over a change-event stream.

    ``pos`` strings are zero-padded (lexicographic == numeric order,
    see sources/changelog.py), so ``max`` is the watermark. Emits the
    cumulative (max_pos, n_events) per source each micro-batch — the
    stream-native form of the reference's watermark mutex."""
    return changes.groupBy("data_source").applyInPandasWithState(
        _track_watermark,
        WATERMARK_OUTPUT,
        _WATERMARK_STATE,
        "update",
        GroupStateTimeout.NoTimeout,
    )


TXN_OUTPUT = T.StructType(
    [
        T.StructField("txn_id", T.StringType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("first_pos", T.StringType()),
        T.StructField("last_pos", T.StringType()),
        T.StructField("complete", T.BooleanType()),
    ]
)

_TXN_STATE = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("first_pos", T.StringType()),
        T.StructField("last_pos", T.StringType()),
    ]
)

COMMIT_OP = "commit"  # XID-event analog: marks the transaction complete
TXN_TIMEOUT_MS = 60_000  # default; override via txn_assembler(timeout_ms=...)


def txn_assembler(changes: DataFrame, timeout_ms: int = TXN_TIMEOUT_MS) -> DataFrame:
    """Transaction assembly (OnRow buffering + OnXID flush): buffer
    events per txn_id in keyed state; emit one summary row when the
    commit marker arrives; time out abandoned transactions (emitted
    with ``complete=false``) so state stays bounded. At 100 TB state
    size is O(open transactions), partitioned by txn hash — no single
    mutex, no unbounded buffer.

    Note: with ProcessingTimeTimeout the query runs paced no-data
    batches to evaluate timeouts, so it is never idle —
    ``processAllAvailable()`` will not return and ``availableNow``
    does not terminate; pace with ``trigger(processingTime=...)`` and
    poll the sink (see tests/test_stateful.py)."""

    # Closure (not a module function): cloudpickle ships it by value, so
    # timeout_ms travels to the Python workers with it.
    def assemble(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            n, first_pos, last_pos = state.get
            state.remove()
            yield pd.DataFrame(
                [{"txn_id": key[0], "n_events": n, "first_pos": first_pos,
                  "last_pos": last_pos, "complete": False}]
            )
            return

        n, first_pos, last_pos = state.get if state.exists else (0, None, None)
        committed = False
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            data_rows = pdf[pdf["op"] != COMMIT_OP]
            n += len(data_rows)
            if len(data_rows):
                lo, hi = data_rows["pos"].min(), data_rows["pos"].max()
                first_pos = lo if first_pos is None else min(first_pos, lo)
                last_pos = hi if last_pos is None else max(last_pos, hi)
            committed = committed or bool((pdf["op"] == COMMIT_OP).any())

        if committed:
            state.remove()
            yield pd.DataFrame(
                [{"txn_id": key[0], "n_events": n, "first_pos": first_pos,
                  "last_pos": last_pos, "complete": True}]
            )
        else:
            state.update((n, first_pos, last_pos))
            state.setTimeoutDuration(timeout_ms)

    return changes.groupBy("txn_id").applyInPandasWithState(
        assemble,
        TXN_OUTPUT,
        _TXN_STATE,
        "update",
        GroupStateTimeout.ProcessingTimeTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming near-dup dedup with the band index IN STREAMING STATE.
#
# NearDupIngest (streaming/ingest.py) keeps its band index in a parquet
# side-store rewritten by foreachBatch; this is the state-store twin:
# the MinHash band index lives in keyed streaming state (checkpointed,
# restart-safe, scaled by band-key hashing), so a near-duplicate
# arriving in ANY later micro-batch is flagged without a side-store
# read. Banding is identical to operators/dedup.dedup_minhash_lsh
# (MINHASH_K lanes, BAND_ROWS-row bands); signatures are computed
# MAP-SIDE with array-lambda folds (no aggregation) so this is the
# query's only stateful operator.
#
# State bound (documented contract): one entry per band KEY, each
# holding at most NEARDUP_BAND_CAP accepted (doc_id, packed-signature)
# pairs — ≈ cap × (8 + MINHASH_K×9) bytes per band key. A band at cap
# stops absorbing new signatures (further docs in that band are only
# CHECKED, mirroring BUCKET_PAIR_CAP's hub-skew bound in the batch
# LSH); at production scale raise the cap or add a TTL timeout.
# ---------------------------------------------------------------------------

from ..operators.dedup import BAND_ROWS, MINHASH_K, N_SEEDS  # noqa: E402
from ..operators.text import shingles_col  # noqa: E402

NEARDUP_BAND_CAP = 64
NEARDUP_EST = 0.5  # lane-agreement threshold (≈ Jaccard estimate)

NEARDUP_OUTPUT = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("band", T.StringType()),
        T.StructField("is_dup", T.BooleanType()),
    ]
)

_NEARDUP_STATE = T.StructType(
    [
        T.StructField("doc_ids", T.ArrayType(T.LongType())),
        T.StructField("sigs", T.ArrayType(T.StringType())),
    ]
)


def _map_side_signature(docs: DataFrame) -> DataFrame:
    """(doc_id, h0..h{MINHASH_K-1}) via array-lambda folds — the
    aggregation-free twin of ingest._signatures, required here so the
    band-keyed applyInPandasWithState is the only stateful operator in
    the streaming query (Spark allows one). Two md5 passes over the
    shingle array (one per 128-bit digest), then 32-bit lane mins."""
    import pyspark.sql.functions as F

    # NB: higher-order-function lambdas must be SINGLE-argument here — a
    # second parameter is interpreted by Spark as the array index, so the
    # usual `lambda x, k=k:` default-capture idiom silently receives the
    # element position instead of k. Bind loop variables via closures.
    def _digest(g: int):
        return lambda s: F.md5(F.concat(F.lit(f"{g}:"), s))

    def _lane(pos: int):
        return lambda d: F.substring(d, pos, 8)

    digs = [
        F.transform(shingles_col(), _digest(g)).alias(f"dg{g}")
        for g in range(N_SEEDS)
    ]
    base = docs.select("doc_id", *digs)
    return base.select(
        "doc_id",
        *[
            F.array_min(
                F.transform(F.col(f"dg{i // 4}"), _lane(1 + 8 * (i % 4)))
            ).alias(f"h{i}")
            for i in range(MINHASH_K)
        ],
    )


def _near_dup_flag(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    ids, sigs = state.get if state.exists else ([], [])
    ids, sigs = list(ids), list(sigs)
    known = [s.split("|") for s in sigs]
    rows = [pdf for pdf in pdfs if len(pdf)]
    if not rows:
        if state.exists:
            state.update((ids, sigs))
        return
    batch = pd.concat(rows, ignore_index=True).sort_values("doc_id")
    out = []
    for _, row in batch.iterrows():
        lanes = row["sig"].split("|")
        dup = any(
            sum(a == b for a, b in zip(lanes, ks)) / MINHASH_K >= NEARDUP_EST
            for ks in known
        )
        if not dup and len(ids) < NEARDUP_BAND_CAP:
            ids.append(int(row["doc_id"]))
            sigs.append(row["sig"])
            known.append(lanes)
        out.append(
            {"doc_id": int(row["doc_id"]), "band": key[0], "is_dup": bool(dup)}
        )
    state.update((ids, sigs))
    yield pd.DataFrame(out)


def near_dup_stream_flags(docs: DataFrame) -> DataFrame:
    """Per-(doc, band) near-dup verdicts over a document stream: a doc
    is a near-duplicate iff ANY of its bands flags it (downstream:
    ``groupBy(doc_id).agg(max(is_dup))`` or an anti-join on flagged
    ids — see tests). Within a batch the survivor rule is greedy by
    doc_id per band, the same one-pass rule as NearDupIngest; across
    batches the band state answers "similar to anything accepted so
    far" without touching the corpus."""
    import pyspark.sql.functions as F

    sig = _map_side_signature(docs)
    packed = sig.select(
        "doc_id",
        F.concat_ws("|", *[F.col(f"h{i}") for i in range(MINHASH_K)]).alias("sig"),
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
    return packed.groupBy("band").applyInPandasWithState(
        _near_dup_flag,
        NEARDUP_OUTPUT,
        _NEARDUP_STATE,
        "append",
        GroupStateTimeout.NoTimeout,
    )
