"""Changelog retention + replication attach-time safety.

The reference attaches its replication client at the stored watermark and
relies on the SERVER to refuse when that position falls below
``gtid_purged`` (`internal/cannal/incremental.go:149` delegating to
``StartSyncGTID``; MySQL errors with 1236 "master has purged binary
logs"). Our file-replay changelog has the same failure mode with nobody
guarding it: if segment files older than a consumer's watermark are
deleted, a restarted stream silently resumes AFTER the hole and loses
rows — the one failure a CDC pipeline must never absorb.

This module makes the server's check explicit, as the reference's
semantics require:

- :func:`purge_changelog` is the retention tool — it deletes fully-retired
  segment files (every event at-or-below ``through_pos``) and records what
  was purged in a ``_retention.json`` manifest inside the changelog dir
  (the leading underscore keeps Spark's file source from reading it as
  data). The manifest carries BOTH position flavors: the lexicographic
  ``purged_max_pos`` (the engine's native zero-padded pos strings) and,
  when positions parse as ``uuid:gno``, the accumulated ``purged_gtid``
  set — the direct analog of ``@@GLOBAL.gtid_purged``.

- :func:`attach_guard` runs at stream-attach time (wired into
  ``Engine.incremental_sync``): given the manifest and the consumer's
  watermark it either returns (safe: everything purged was already
  applied) or raises — :class:`~go_cdc_spark.functions.gtid.
  PurgedBinlogError` via :func:`~go_cdc_spark.functions.gtid.attach_check`
  when both sides speak GTID sets, else :class:`ChangelogPurgedError` on
  the lexicographic pos order. Resuming past a purged hole is never an
  option; only a fresh full snapshot repairs it.
"""

from __future__ import annotations

import json
import os

from ..functions.gtid import GtidSet, attach_check

MANIFEST = "_retention.json"


class ChangelogPurgedError(RuntimeError):
    """Changelog segments beyond the consumer's watermark were purged —
    replay cannot fill the hole; a fresh full snapshot is required."""

    def __init__(self, watermark: str | None, purged_through: str):
        self.watermark = watermark
        self.purged_through = purged_through
        super().__init__(
            "changelog purged through pos "
            f"{purged_through!r} but consumer watermark is {watermark!r} "
            "(resync required)"
        )


def read_manifest(changelog_dir: str) -> dict | None:
    path = os.path.join(changelog_dir, MANIFEST)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def _write_manifest(changelog_dir: str, manifest: dict) -> None:
    path = os.path.join(changelog_dir, MANIFEST)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, path)  # atomic: a crash mid-write keeps the old manifest


def _try_gtid(pos: str) -> tuple[str, int] | None:
    uuid, _, gno = pos.rpartition(":")
    if not uuid:
        return None
    try:
        return uuid, int(gno)
    except ValueError:
        return None


def purge_changelog(changelog_dir: str, through_pos: str) -> dict:
    """Delete every segment file whose events are ALL at-or-below
    ``through_pos`` (segments are only removed whole — a partially
    retired file stays, exactly like a binlog file the server keeps
    until its last event ages out), and fold what was removed into the
    ``_retention.json`` manifest. Returns the updated manifest.

    Driver-side file walk, like the reference's server-side binlog
    purge: retention runs against segment metadata, never through a
    Spark job — the data path is untouched.
    """
    prior = read_manifest(changelog_dir) or {}
    purged_gtid = GtidSet.from_json(prior["purged_gtid"]) if prior.get("purged_gtid") else GtidSet()
    purged_max = prior.get("purged_max_pos")
    removed = 0
    for name in sorted(os.listdir(changelog_dir)):
        if name.startswith("_") or name.startswith("."):
            continue
        path = os.path.join(changelog_dir, name)
        if not os.path.isfile(path):
            continue
        poss: list[str] = []
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                p = json.loads(line).get("pos")
                if p is not None:
                    poss.append(p)
        if not poss or max(poss) > through_pos:
            continue
        for p in poss:
            g = _try_gtid(p)
            if g is not None:
                purged_gtid.add(*g)
        purged_max = max(poss) if purged_max is None else max(purged_max, max(poss))
        os.remove(path)
        removed += 1
    manifest = {
        "purged_max_pos": purged_max,
        "purged_gtid": purged_gtid.to_json() if purged_gtid._ranges else None,
        "segments_purged": prior.get("segments_purged", 0) + removed,
    }
    _write_manifest(changelog_dir, manifest)
    return manifest


def attach_guard(
    changelog_dir: str,
    watermark_pos: str | None,
    watermark_gtid_json: str | None = None,
) -> None:
    """Refuse to attach a changelog stream past a purged hole.

    GTID flavor: when the manifest recorded a ``purged_gtid`` set and the
    caller has a GTID watermark, delegate to :func:`attach_check`
    (resumable ⇔ purged ⊆ watermark) — raises ``PurgedBinlogError``.

    Pos flavor: otherwise compare lexicographic positions — the engine's
    pos strings are zero-padded so string order == position order; a
    watermark strictly below ``purged_max_pos`` (or no watermark at all
    while anything was purged) means lost events — raises
    :class:`ChangelogPurgedError`.
    """
    manifest = read_manifest(changelog_dir)
    if not manifest:
        return
    if manifest.get("purged_gtid") and watermark_gtid_json:
        attach_check(
            GtidSet.from_json(watermark_gtid_json),
            GtidSet(),  # to-read set comes from the stream itself here
            GtidSet.from_json(manifest["purged_gtid"]),
        )
        return
    purged_max = manifest.get("purged_max_pos")
    if purged_max is None:
        return
    if watermark_pos is None or watermark_pos < purged_max:
        raise ChangelogPurgedError(watermark_pos, purged_max)
