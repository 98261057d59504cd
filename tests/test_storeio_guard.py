"""storeio object-store honesty (VERDICT r10 #4): the swap protocol's
load-bearing primitive is POSIX directory rename. Non-local URIs are
refused LOUDLY at the promote seam (every swap flavor funnels through
promote_tmp), and the non-atomic-rename failure shapes an object store
could produce are pinned as recover() behavior. Pure filesystem tests,
no SparkSession."""

from __future__ import annotations

import os

import pytest

from go_cdc_spark import storeio


def _mk_store(d, marker="live"):
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "part-00000.parquet"), "w") as f:
        f.write(marker)


@pytest.mark.parametrize(
    "uri",
    [
        "s3://bucket/state/table",
        "s3a://bucket/state/table",
        "gs://bucket/state/table",
        "abfss://fs@acct.dfs.core.windows.net/state",
        "wasbs://c@acct.blob.core.windows.net/state",
        "oss://bucket/state",
    ],
)
def test_promote_refuses_object_store_uris(tmp_path, uri):
    tmp = str(tmp_path / "t.tmp-x")
    _mk_store(tmp)
    with pytest.raises(ValueError, match="posix-rename filesystem"):
        storeio.promote_tmp(tmp, uri)
    assert os.path.exists(tmp)  # refused BEFORE demoting anything


def test_promote_refuses_file_uri_with_plain_path_hint(tmp_path):
    tmp = str(tmp_path / "t.tmp-x")
    _mk_store(tmp)
    with pytest.raises(ValueError, match="plain filesystem path"):
        storeio.promote_tmp(tmp, f"file://{tmp_path}/store")


def test_promote_accepts_plain_paths(tmp_path):
    path = str(tmp_path / "store")
    tmp = f"{path}.tmp-abc"
    _mk_store(tmp, "v1")
    storeio.promote_tmp(tmp, path)
    assert open(os.path.join(path, "part-00000.parquet")).read() == "v1"


def test_recover_both_dirs_visible_keeps_live_and_sweeps_old(tmp_path):
    """The 'both dirs visible' window a non-atomic rename could leave
    (and which POSIX rename cannot): a live store AND a demoted .old-
    sibling both present. recover() must keep the LIVE dir — it is the
    newer state by construction (the demote happens before the promote)
    — and sweep the stale sibling, never resurrect it over live data."""
    path = str(tmp_path / "store")
    _mk_store(path, "new")
    _mk_store(f"{path}.old-deadbeef", "old")
    _mk_store(f"{path}.tmp-feedface", "tmp")
    storeio.recover(path)
    assert open(os.path.join(path, "part-00000.parquet")).read() == "new"
    assert not os.path.exists(f"{path}.old-deadbeef")
    assert not os.path.exists(f"{path}.tmp-feedface")


def test_recover_torn_swap_promotes_newest_old(tmp_path):
    """No live dir + several .old- siblings (a double torn swap —
    pathological): exactly one is promoted back (sorted-last, a
    deterministic pick) and the rest are swept; the store is never
    left dirless."""
    path = str(tmp_path / "store")
    _mk_store(f"{path}.old-aaaa", "older")
    _mk_store(f"{path}.old-bbbb", "newest")
    storeio.recover(path)
    assert open(os.path.join(path, "part-00000.parquet")).read() == "newest"
    assert not os.path.exists(f"{path}.old-aaaa")
