"""GTID-set algebra (pure Python) + Spark predicates.

Re-expresses the reference's GTID bookkeeping (`internal/model/gtid.go:9-77`:
``GTID = map[serverUUID][]RangeGTID``, ``SetGTID`` extend-or-append,
string/map serialization) as a normalized interval-set class. Differences
from the reference, by design:

- ranges are kept **sorted and coalesced** (the reference only extends the
  last range or appends, so out-of-order or duplicate gnos create
  overlapping ranges; we normalize instead — same covered set, canonical
  form);
- string form is canonical MySQL GTID-set syntax
  ``uuid:1-5:7-9,uuid2:3`` (the reference's ``String()`` emits an
  ambiguous comma-joined form, `internal/model/gtid.go:41-56`).

Spark never sees this class on the hot path: event streams carry a
monotonic zero-padded ``pos`` string so ordering/dedup are plain column
comparisons. The set algebra is used at the *edges* — checkpoint records
(A14/A15) and the snapshot→incremental handoff rule
(``docs/全量抓取逻辑.md:44-52``) — plus an optional vectorized
``covers`` predicate for event-level dedup.
"""

from __future__ import annotations

import json
from collections.abc import Iterable

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType


class GtidSet:
    """A set of executed transaction ids, per server UUID."""

    __slots__ = ("_ranges",)

    def __init__(self, ranges: dict[str, list[tuple[int, int]]] | None = None):
        self._ranges: dict[str, list[tuple[int, int]]] = {}
        if ranges:
            for uuid, rs in ranges.items():
                self._ranges[uuid] = self._normalize(rs)

    # -- construction -------------------------------------------------

    @staticmethod
    def _normalize(rs: Iterable[tuple[int, int]]) -> list[tuple[int, int]]:
        out: list[tuple[int, int]] = []
        for start, end in sorted(rs):
            if start > end:
                raise ValueError(f"invalid range {start}-{end}")
            if out and start <= out[-1][1] + 1:
                out[-1] = (out[-1][0], max(out[-1][1], end))
            else:
                out.append((start, end))
        return out

    @classmethod
    def parse(cls, s: str) -> GtidSet:
        """Parse canonical MySQL GTID-set syntax ``uuid:1-5:7,uuid2:9-12``."""
        ranges: dict[str, list[tuple[int, int]]] = {}
        s = s.strip()
        if not s:
            return cls()
        for part in s.split(","):
            part = part.strip()
            if not part:
                continue
            pieces = part.split(":")
            uuid, intervals = pieces[0], pieces[1:]
            if not intervals:
                raise ValueError(f"no intervals in GTID part {part!r}")
            rs = ranges.setdefault(uuid, [])
            for iv in intervals:
                if "-" in iv:
                    a, b = iv.split("-", 1)
                    rs.append((int(a), int(b)))
                else:
                    rs.append((int(iv), int(iv)))
        return cls(ranges)

    @classmethod
    def from_map(cls, pos: dict[str, list[str]]) -> GtidSet:
        """Build from ``{uuid: ["1-5", "7-9"]}`` (the reference's ParseGTID
        input shape, `internal/model/gtid.go:11-29`)."""
        ranges: dict[str, list[tuple[int, int]]] = {}
        for uuid, strs in pos.items():
            rs = []
            for sr in strs:
                if "-" in sr:
                    a, b = sr.split("-", 1)
                    rs.append((int(a), int(b)))
                else:
                    rs.append((int(sr), int(sr)))
            ranges[uuid] = rs
        return cls(ranges)

    @classmethod
    def from_json(cls, s: str) -> GtidSet:
        """Checkpoint form: ``{"uuid": [{"start":1,"end":42}]}`` (mirrors
        the reference's last_pos JSON, `internal/model/tablemeta.go:57`)."""
        raw = json.loads(s)
        return cls(
            {u: [(int(r["start"]), int(r["end"])) for r in rs] for u, rs in raw.items()}
        )

    # -- mutation ------------------------------------------------------

    def add(self, uuid: str, gno: int) -> None:
        """Record one executed transaction (the reference's SetGTID,
        `internal/model/gtid.go:58-72`): extend the tail range when
        ``gno == end+1``, append otherwise — then normalize, so a
        duplicate or out-of-order gno is a no-op instead of creating an
        overlapping range."""
        rs = self._ranges.get(uuid)
        if rs is None:
            self._ranges[uuid] = [(gno, gno)]
            return
        last = rs[-1]
        if last[1] + 1 == gno:  # the hot path: in-order stream
            rs[-1] = (last[0], gno)
            return
        if self.covers(uuid, gno):
            return
        self._ranges[uuid] = self._normalize([*rs, (gno, gno)])

    def union(self, other: GtidSet) -> GtidSet:
        merged: dict[str, list[tuple[int, int]]] = {}
        for uuid in set(self._ranges) | set(other._ranges):
            merged[uuid] = self._ranges.get(uuid, []) + other._ranges.get(uuid, [])
        return GtidSet(merged)

    def subtract(self, other: GtidSet) -> GtidSet:
        """Ranges in ``self`` not covered by ``other`` — the GTID-set
        difference every real replication client needs at attach time:
        ``source_executed - our_watermark`` = transactions we still
        have to read, and ``our_watermark - source_available`` non-empty
        means the source PURGED binlogs we never saw (resync required,
        not resumable). Pure interval arithmetic, O(ranges)."""
        out: dict[str, list[tuple[int, int]]] = {}
        for uuid, rs in self._ranges.items():
            theirs = other._ranges.get(uuid, [])
            remaining: list[tuple[int, int]] = []
            for start, end in rs:
                segments = [(start, end)]
                for ts, te in theirs:
                    nxt: list[tuple[int, int]] = []
                    for s, e in segments:
                        if te < s or ts > e:  # disjoint
                            nxt.append((s, e))
                            continue
                        if s < ts:
                            nxt.append((s, ts - 1))
                        if te < e:
                            nxt.append((te + 1, e))
                    segments = nxt
                    if not segments:
                        break
                remaining.extend(segments)
            if remaining:
                out[uuid] = self._normalize(remaining)
        return GtidSet(out)

    # -- queries -------------------------------------------------------

    def covers(self, uuid: str, gno: int) -> bool:
        for start, end in self._ranges.get(uuid, ()):
            if start <= gno <= end:
                return True
            if start > gno:
                return False
        return False

    def contains_set(self, other: GtidSet) -> bool:
        """True if every gno in ``other`` is covered by ``self``."""
        for uuid, rs in other._ranges.items():
            mine = self._ranges.get(uuid)
            if not mine and rs:
                return False
            for start, end in rs:
                if not any(ms <= start and end <= me for ms, me in mine):
                    return False
        return True

    def __le__(self, other: GtidSet) -> bool:
        return other.contains_set(self)

    def __eq__(self, other: object) -> bool:
        return isinstance(other, GtidSet) and self._ranges == other._ranges

    def __hash__(self):  # pragma: no cover
        return hash(str(self))

    # -- serialization ---------------------------------------------------

    def __str__(self) -> str:
        parts = []
        for uuid in sorted(self._ranges):
            ivs = ":".join(
                f"{s}-{e}" if s != e else f"{s}" for s, e in self._ranges[uuid]
            )
            parts.append(f"{uuid}:{ivs}")
        return ",".join(parts)

    def __repr__(self) -> str:  # pragma: no cover
        return f"GtidSet({str(self)!r})"

    def to_map(self) -> dict[str, list[str]]:
        return {u: [f"{s}-{e}" for s, e in rs] for u, rs in self._ranges.items()}

    def to_json(self) -> str:
        return json.dumps(
            {u: [{"start": s, "end": e} for s, e in rs] for u, rs in self._ranges.items()},
            sort_keys=True,
        )


def gtid_covers_column(pos: Column, gtid_json: str) -> Column:
    """Vectorized ``covers(uuid, gno)`` predicate over a ``uuid:gno``
    position column — the event-dedup filter of the handoff rule
    ("discard events at or below the snapshot GTID",
    ``docs/全量抓取逻辑.md:44-52``).

    Implemented as an Arrow-batched Pandas UDF (not a row-at-a-time UDF):
    the GtidSet is rebuilt once per batch, and lookups are pure-python
    interval checks. For the common single-source total order, prefer the
    plain column comparison ``pos > threshold`` — this UDF exists for
    multi-UUID positions where no total order exists.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(BooleanType())
    def _covers(series: pd.Series) -> pd.Series:
        gs = GtidSet.from_json(gtid_json)

        def one(v: str | None) -> bool:
            if v is None:
                return False
            uuid, _, gno = v.rpartition(":")
            try:
                return gs.covers(uuid, int(gno))
            except ValueError:
                return False

        return series.map(one)

    return _covers(pos)


class PurgedBinlogError(RuntimeError):
    """The source purged transactions the watermark never covered —
    the changelog has a hole that replay cannot fill; only a fresh full
    snapshot repairs it."""

    def __init__(self, missing: GtidSet):
        self.missing = missing
        super().__init__(
            "source purged binlog transactions never applied here "
            f"(resync required): {missing}"
        )


def attach_check(
    watermark: GtidSet,
    source_executed: GtidSet,
    source_purged: GtidSet | None = None,
) -> GtidSet:
    """Replication attach-time safety check (the step the reference's
    `StartSyncGTID` delegates to the server, made explicit): given OUR
    per-source watermark and the source's ``gtid_executed`` /
    ``gtid_purged``, return the still-to-read set, and refuse to attach
    when the source purged transactions we never applied — resuming
    past a purged hole silently loses rows, the one failure mode a CDC
    pipeline must never absorb.

    Resumable  ⇔  purged ⊆ watermark.  To-read = executed − watermark.
    """
    if source_purged is not None:
        missing = source_purged.subtract(watermark)
        if missing._ranges:
            raise PurgedBinlogError(missing)
    return source_executed.subtract(watermark)
