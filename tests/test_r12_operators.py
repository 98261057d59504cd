"""Round-12 operator spec tests: constructed inputs with known answers,
independent of the DuckDB oracle (which only proves Spark≡DuckDB on the
fixture — these prove the SEMANTICS are the claimed ones)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from go_cdc_spark.operators.timeseries import crosscorr_core
from go_cdc_spark.plans.queries import QUERIES


def _dense_from(spark, rows):
    return spark.createDataFrame(
        rows, "event_type string, hour string, n_events long"
    ).withColumn("hour", F.col("hour").cast("timestamp_ntz"))


def test_crosscorr_detects_known_lead(spark):
    """b = a shifted LATER by 2 hours ⇒ corr(a[h], b[h+2]) = 1 exactly
    (a leads b); the transpose direction must NOT peak at lag 2."""
    a_vals = [3, 7, 1, 9, 4, 8, 2, 6, 5, 10, 0, 7, 3, 9, 1, 8]
    hours = [f"2024-03-01 {h:02d}:00:00" for h in range(len(a_vals) + 2)]
    rows = [("a", hours[i], v) for i, v in enumerate(a_vals)]
    # b at hour h+2 equals a at hour h
    rows += [("b", hours[i + 2], v) for i, v in enumerate(a_vals)]
    # pad so both series cover the same grid (zeros elsewhere)
    covered_a = {r[1] for r in rows if r[0] == "a"}
    covered_b = {r[1] for r in rows if r[0] == "b"}
    rows += [("a", h, 0) for h in hours if h not in covered_a]
    rows += [("b", h, 0) for h in hours if h not in covered_b]

    out = {
        (r.type_a, r.type_b, r.lag): r.ccf
        for r in crosscorr_core(_dense_from(spark, rows)).collect()
    }
    assert math.isclose(out[("a", "b", 2)], 1.0, abs_tol=1e-12), out[("a", "b", 2)]
    # the opposite direction at the same lag correlates a[h+2] with... b:
    # not the shifted pair — strictly less than the perfect alignment
    assert out[("b", "a", 2)] < 0.99
    # lag 0 between a and b is the series against its own 2-shift: < 1
    assert out[("a", "b", 0)] < 0.99


def test_crosscorr_runs_on_maintained_grid_surface(spark):
    """The core accepts the maintained grid's TIMESTAMP_NTZ hour dtype
    (Engine.read_grid parity is pinned end-to-end in test_grid_ivm)."""
    rows = [("a", "2024-03-01 00:00:00", 1), ("a", "2024-03-01 01:00:00", 2),
            ("b", "2024-03-01 00:00:00", 2), ("b", "2024-03-01 01:00:00", 4)]
    out = crosscorr_core(_dense_from(spark, rows)).collect()
    assert {(r.type_a, r.type_b) for r in out} == {("a", "b"), ("b", "a")}


def test_graph_hits_matches_python_reference(spark, sf_dir):
    """Unnormalized HITS on the real fixture graph vs an independent
    pure-Python power iteration over the same distinct edge set."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pairs = {
        (r.ck, r.sk)
        for r in orders.join(
            li, orders.o_orderkey == li.l_orderkey
        ).select(
            orders.o_custkey.alias("ck"), li.l_suppkey.alias("sk")
        ).distinct().collect()
    }
    # python reference: h0 = 1 for every customer
    from collections import defaultdict

    h = defaultdict(int)
    for ck, _ in pairs:
        h[ck] = 1
    a = defaultdict(int)
    for it in range(3):
        a = defaultdict(int)
        for ck, sk in pairs:
            a[sk] += h[ck]
        h = defaultdict(int)
        for ck, sk in pairs:
            h[ck] += a[sk]
    got = {(r.node, r.role): r.score for r in QUERIES["graph_hits"](spark, sf_dir).collect()}
    want = {(f"s:{sk}", "authority"): v for sk, v in a.items()}
    want |= {(f"c:{ck}", "hub"): v for ck, v in h.items()}
    assert got == want


def test_kneser_ney_probabilities_sum_to_one(spark, sf_dir):
    """Interpolated KN is a PROPER conditional distribution over the
    OBSERVED continuation vocabulary:
    Σ_{w2 observed after w1} P(w2|w1)
      = 1 − d·N1+(w1,·)/c(w1) · (1 − Σ_{w2 obs} Pcont(w2))
    i.e. the discounted mass not given back to observed continuations
    is exactly the backoff mass reserved for UNSEEN ones. We assert the
    closed form per w1 (exact arithmetic identity, float tolerance)."""
    df = QUERIES["lm_kneser_ney_bigrams"](spark, sf_dir)
    rows = df.collect()
    ntot = len({(r.w1, r.w2) for r in rows})
    from collections import defaultdict

    by_w1 = defaultdict(list)
    for r in rows:
        by_w1[r.w1].append(r)
    for w1, rs in by_w1.items():
        c1 = rs[0].c1
        n1w1 = rs[0].n1w1
        got = sum(r.p_kn for r in rs)
        pcont_obs = sum(r.nw2 for r in rs) / ntot
        want = (c1 - 0.75 * n1w1) / c1 + (0.75 * n1w1 / c1) * pcont_obs
        assert math.isclose(got, want, rel_tol=1e-9), (w1, got, want)
        assert got <= 1.0 + 1e-9


def test_functional_deps_verdicts(spark, sf_dir):
    out = {r.fd: r.holds for r in QUERIES["dq_functional_deps"](spark, sf_dir).collect()}
    assert out["nation.n_nationkey->n_regionkey"] is True
    assert out["customer.c_nationkey->nation.n_name"] is True
    assert out["orders.o_custkey->o_orderpriority"] is False
    assert out["lineitem.l_partkey->l_suppkey"] is False


def test_sample_reservoir_is_deterministic_uniform_k(spark, sf_dir):
    q = QUERIES["sample_reservoir"]
    s1 = [r.o_orderkey for r in q(spark, sf_dir).collect()]
    s2 = [r.o_orderkey for r in q(spark, sf_dir).collect()]
    assert s1 == s2 and len(s1) == len(set(s1)) == 500
    # hash order ≠ key order (it actually sampled, not head-k)
    assert s1 != sorted(s1)


def test_win_streaks_constructed_calendar(spark, tmp_path):
    """Known calendar: customer 1 orders on days 1,2,3, 7,8, 12 →
    longest streak 3 starting day 1, three streaks; customer 2 orders
    once; multiple orders on one day collapse."""
    rows = [
        (1, "2024-03-01"), (1, "2024-03-02"), (1, "2024-03-03"),
        (1, "2024-03-07"), (1, "2024-03-08"), (1, "2024-03-12"),
        (1, "2024-03-02"),  # duplicate day — must collapse
        (2, "2024-05-20"),
    ]
    df = spark.createDataFrame(
        [(i, ck, d) for i, (ck, d) in enumerate(rows)],
        "o_orderkey long, o_custkey long, o_orderdate string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("date"))
    out_dir = str(tmp_path / "sf")
    df.write.mode("overwrite").parquet(f"{out_dir}/orders.parquet")
    got = {
        r.o_custkey: (r.longest_streak, str(r.best_start), r.n_streaks)
        for r in QUERIES["win_streaks"](spark, out_dir).collect()
    }
    assert got[1] == (3, "2024-03-01", 3)
    assert got[2] == (1, "2024-05-20", 1)


def test_weighted_median_constructed(spark, tmp_path):
    """Hand-checked masses: prices 10,20,30 with weights 1,1,10 → half
    of total mass 12 is 6, first price whose cumulative weight ≥ 6 is
    30. Unweighted median would say 20."""
    rows = [
        (1, 1, "A", "10.00", "1.00"),
        (2, 1, "A", "20.00", "1.00"),
        (3, 1, "A", "30.00", "10.00"),
        (4, 1, "R", "5.00", "2.00"),
        (5, 1, "R", "7.00", "2.00"),
    ]
    df = spark.createDataFrame(
        rows,
        "l_orderkey long, l_linenumber int, l_returnflag string, "
        "l_extendedprice string, l_quantity string",
    ).select(
        "l_orderkey", "l_linenumber", "l_returnflag",
        F.col("l_extendedprice").cast("decimal(15,2)").alias("l_extendedprice"),
        F.col("l_quantity").cast("decimal(15,2)").alias("l_quantity"),
    )
    out_dir = str(tmp_path / "sf")
    df.write.mode("overwrite").parquet(f"{out_dir}/lineitem.parquet")
    got = {
        r.l_returnflag: (float(r.w_median_price), r.total_weight)
        for r in QUERIES["agg_weighted_median"](spark, out_dir).collect()
    }
    assert got["A"] == (30.0, 12.0)
    # R: cumulative 2 then 4; half of 4 is 2 → first qualifying is 5.00
    assert got["R"] == (5.0, 4.0)


def test_readability_formula_matches_python(spark, sf_dir):
    """Recompute Flesch for a sample of fixture docs independently."""
    import re as _re

    out = {r.doc_id: r for r in QUERIES["text_readability"](spark, sf_dir).collect()}
    docs = {r.doc_id: r.text for r in
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text").limit(25).collect()}
    for did, text in docs.items():
        w = len(text.split(" "))
        s = max(len(_re.findall(r"[.!?]+", text)), 1)
        y = len(_re.findall(r"[aeiouy]+", text.lower()))
        want = 206.835 - 1.015 * (w / s) - 84.6 * (y / w)
        r = out[did]
        assert (r.n_words, r.n_sentences, r.n_syllables) == (w, s, y)
        assert math.isclose(r.flesch, want, rel_tol=1e-12)


def test_simpson_diversity_properties(spark, sf_dir):
    """Σpᵢ² recomputed independently per lang; bounds 1/vocab ≤ S ≤ 1."""
    from collections import Counter, defaultdict

    toks = defaultdict(Counter)
    for r in spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "lang", "text"
    ).collect():
        toks[r.lang].update(r.text.split(" "))
    out = {r.lang: r for r in
           QUERIES["corpus_simpson_diversity"](spark, sf_dir).collect()}
    assert set(out) == set(toks)
    for lang, c in toks.items():
        n = sum(c.values())
        ss = sum(v * v for v in c.values())
        r = out[lang]
        assert (r.n_tokens, r.vocab, r.sum_sq) == (n, len(c), ss)
        assert math.isclose(r.simpson, ss / (n * n), rel_tol=1e-12)
        assert 1.0 / len(c) <= r.simpson <= 1.0
        assert math.isclose(r.gini_simpson, 1.0 - r.simpson, rel_tol=1e-9)
