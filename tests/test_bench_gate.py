"""The bench regression gate's drift allowlist is DATA with an expiry
(VERDICT r10 "What's wrong" #1 / ADVICE r10): entries live in
DRIFT_AB.jsonl, are valid only for the round they were A/B-cleared in,
and are bounded — an observed ratio above the cleared max_ratio still
fails the build. Pure-python tests, no SparkSession."""

from __future__ import annotations

import importlib.util
import json
import os
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(_REPO, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench_under_test"] = mod
    spec.loader.exec_module(mod)
    return mod


_STABLE = {f"stable_q{i}": 1.0 for i in range(8)}


def _priors_with(name: str, t: float, rounds: int = 5) -> list[dict]:
    return [{"queries": {name: t, **_STABLE}, "value": None}] * rounds


def test_current_round_is_max_bench_plus_one(bench, tmp_path):
    assert bench._current_round(str(tmp_path)) == 1
    (tmp_path / "BENCH_r03.json").write_text("{}")
    (tmp_path / "BENCH_r10.json").write_text("{}")
    assert bench._current_round(str(tmp_path)) == 11


def _write_ab(tmp_path, rows):
    p = tmp_path / "DRIFT_AB.jsonl"
    p.write_text("".join(json.dumps(r) + "\n" for r in rows))
    return str(p)


def test_cleared_entry_expires_with_its_round(bench, tmp_path, monkeypatch):
    """A row cleared in round 10 is dead in round 11: the flagged query
    goes back to being a red regression, not a drift suspect."""
    monkeypatch.setattr(
        bench,
        "_DRIFT_AB_PATH",
        _write_ab(tmp_path, [{"round": 10, "query": "slow_q", "max_ratio": 3.0}]),
    )
    monkeypatch.setattr(bench, "_current_round", lambda _d: 11)
    assert bench._host_drift_cleared() == {}
    comparison = bench.vs_prev(
        {"slow_q": 3.0, **_STABLE}, _priors_with("slow_q", 1.0)
    )
    assert comparison["regressions"] == ["slow_q"]
    assert comparison["drift_suspects"] == []


def test_cleared_entry_valid_in_its_round_and_bounded(bench, tmp_path, monkeypatch):
    monkeypatch.setattr(
        bench,
        "_DRIFT_AB_PATH",
        _write_ab(tmp_path, [{"round": 11, "query": "slow_q", "max_ratio": 3.5}]),
    )
    monkeypatch.setattr(bench, "_current_round", lambda _d: 11)
    assert bench._host_drift_cleared() == {"slow_q": 3.5}

    # inside the A/B-justified bound: visible as a drift suspect, not red
    ok = bench.vs_prev({"slow_q": 3.0, **_STABLE}, _priors_with("slow_q", 1.0))
    assert ok["regressions"] == []
    assert ok["drift_suspects"] == ["slow_q"]

    # beyond the bound: a genuine regression cannot hide behind the entry
    bad = bench.vs_prev({"slow_q": 4.0, **_STABLE}, _priors_with("slow_q", 1.0))
    assert bad["regressions"] == ["slow_q"]
    assert bad["drift_suspects"] == []


def test_committed_drift_ab_rows_are_stale_by_now(bench):
    """The repo's committed DRIFT_AB.jsonl must never carry a row for a
    FUTURE round (that would pre-excuse a regression nobody measured):
    every row's round must be <= the round currently being built."""
    cur = bench._current_round(_REPO)
    with open(os.path.join(_REPO, "DRIFT_AB.jsonl")) as f:
        rows = [json.loads(line) for line in f if line.strip()]
    assert rows, "DRIFT_AB.jsonl must document the protocol with real rows"
    for row in rows:
        assert row["round"] <= cur
        assert row["query"]
        if row["max_ratio"] is None:
            # tools/drift_ab.py appends rows with max_ratio=null by
            # design (the human sets the bound after reading the A/B);
            # null rows never feed the gate (bench.py requires a truthy
            # max_ratio), so they are legal here — just not yet active
            continue
        assert row["max_ratio"] > 1.0
