"""Property tests for the round-8-continuation operators: random
inputs against plain-Python references (the spec tests prove specific
shapes; these prove the invariants hold off the fixture distribution)."""

from __future__ import annotations

import datetime as dt
import random

import numpy as np

from go_cdc_spark.operators.behavior import basket_rules, orders_pareto
from go_cdc_spark.operators.text import _ZIPF_TOP, corpus_zipf
from go_cdc_spark.operators.timeseries import resample_gapfill


def _write_events(spark, tmp_path, rows) -> str:
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_gapfill_conserves_mass_and_density(spark, tmp_path):
    """Random sparse events: the dense grid always (a) covers exactly
    |types| x |span hours| cells, (b) conserves the event count, and
    (c) forward-fills every cell after a type's first observation."""
    rng = random.Random(13)
    types = ["a", "b", "c"]
    rows = []
    for i in range(80):
        rows.append(
            (
                i,
                dt.datetime(2024, 2, 1 + rng.randrange(4), rng.randrange(24), 30),
                rng.randrange(5),
                rng.choice(types),
                round(rng.uniform(0.5, 9.5), 3),
                "{}",
            )
        )
    out = resample_gapfill(spark, _write_events(spark, tmp_path, rows)).collect()
    hours = sorted({r["hour"] for r in out})
    span = int((hours[-1] - hours[0]).total_seconds() // 3600) + 1
    present_types = {r["event_type"] for r in out}
    assert len(out) == span * len(present_types)
    assert sum(r["n_events"] for r in out) == len(rows)
    for t in present_types:
        cells = sorted(
            (r for r in out if r["event_type"] == t), key=lambda r: r["hour"]
        )
        seen = False
        for c in cells:
            if c["hour_value"] is not None:
                seen = True
            assert (c["filled_value"] is not None) == seen


def test_basket_rules_match_python_reference(spark, tmp_path):
    """Random small baskets: every reported rule's support, confidence
    and lift equal the brute-force Python computation, and the output
    is the true lift-ranked top slice."""
    rng = random.Random(7)
    baskets = {}
    for ok in range(40):
        baskets[ok] = sorted(rng.sample(range(1, 12), rng.randint(1, 4)))
    rows = [(ok, parts) for ok, parts in baskets.items()]
    spark.createDataFrame(
        [(ok, p) for ok, parts in rows for p in parts],
        "l_orderkey long, l_partkey long",
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))

    # brute-force reference
    n = len(baskets)
    item = {}
    pair = {}
    for parts in baskets.values():
        for p in parts:
            item[p] = item.get(p, 0) + 1
        for i, a in enumerate(parts):
            for b in parts[i + 1 :]:
                pair[(a, b)] = pair.get((a, b), 0) + 1
    ref = {}
    for (a, b), s in pair.items():
        if s < 2:
            continue
        for ant, con in ((a, b), (b, a)):
            ref[(ant, con)] = (
                s,
                s / item[ant],
                (s * n) / (item[ant] * item[con]),
            )
    got = basket_rules(spark, str(tmp_path)).collect()
    for r in got:
        k = (r["antecedent"], r["consequent"])
        s, conf, lift = ref[k]
        assert r["pair_support"] == s
        assert r["confidence"] == conf
        assert r["lift"] == lift
    # true top slice by (lift desc, ant, con)
    ranked = sorted(ref.items(), key=lambda kv: (-kv[1][2], kv[0]))
    expect = [k for k, _ in ranked[: len(got)]]
    assert [(r["antecedent"], r["consequent"]) for r in got] == expect


def test_pareto_shares_match_numpy(spark, tmp_path):
    """Random spends: every decile's revenue share equals the numpy
    threshold computation (same linear-interpolation quantiles)."""
    rng = np.random.RandomState(3)
    spends = np.round(rng.uniform(10, 5000, size=37), 2)
    rows = []
    ok = 0
    for ck, s in enumerate(spends, start=1):
        ok += 1
        rows.append((ok, ck, dt.datetime(2024, 1, 5), float(s)))
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderdate timestamp, "
        "o_totalprice double",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    out = {r["decile"]: r for r in orders_pareto(spark, str(tmp_path)).collect()}
    total = spends.sum()
    for k in range(1, 11):
        t = np.quantile(spends, 1 - k / 10) if k < 10 else spends.min()
        mask = spends >= t
        assert out[k]["customers_above"] == int(mask.sum())
        assert abs(out[k]["revenue_share"] - spends[mask].sum() / total) < 1e-9


def test_zipf_counts_match_python(spark, tmp_path):
    rng = random.Random(5)
    words = [f"w{i}" for i in range(30)]
    texts = [
        " ".join(rng.choices(words, weights=range(1, 31), k=40)) for _ in range(25)
    ]
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    from collections import Counter

    freq = Counter(w for t in texts for w in t.split(" "))
    ranked = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:_ZIPF_TOP]
    rows = corpus_zipf(spark, str(tmp_path)).collect()
    assert [(r["token"], r["freq"]) for r in rows] == ranked
    total = sum(freq.values())
    cum = 0
    for r, (tok, f) in zip(rows, ranked):
        cum += f
        assert r["cum_share"] == cum / total
