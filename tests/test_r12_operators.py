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
