"""Round-13 operator spec tests: constructed inputs with known answers,
independent of the DuckDB oracle (which only proves Spark≡DuckDB on the
fixture — these prove the SEMANTICS are the claimed ones)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from go_cdc_spark.plans.queries import QUERIES


def _write(spark, tmp_path, name, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/{name}.parquet")


def _docs(spark, tmp_path, texts):
    _write(
        spark, tmp_path, "documents",
        [(i, t, "en", f"s{i % 2}", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    return str(tmp_path)


def test_text_collocations_counts_adjacent_pairs(spark, tmp_path):
    """'big data' appears adjacently 6 times across docs; margins and
    the corpus total are the plain unigram counts."""
    texts = ["big data " * 3 + "rules", "we love big data and big data",
             "big apple data"]  # 'big apple' / 'apple data': not adjacent 'big data'
    sf = _docs(spark, tmp_path, texts)
    out = {(r.w1, r.w2): (r.c12, r.c1, r.c2, r.n_tokens)
           for r in QUERIES["text_collocations"](spark, sf).collect()}
    # 'big data' adjacent: 3 (doc0) + 2 (doc1) = 5 >= min count
    assert ("big", "data") in out
    c12, c1, c2, n = out[("big", "data")]
    assert c12 == 5
    assert c1 == 6  # 'big' occurrences corpus-wide (3 + 2 + 1)
    assert c2 == 6  # 'data' occurrences (3 + 2 + 1)
    assert n == sum(len(t.split()) for t in texts)
    # sub-threshold pairs are pruned
    assert ("big", "apple") not in out


def test_text_rake_scores_multiword_phrases_higher(spark, tmp_path):
    """RAKE word score = degree/freq: words living in longer
    stopword-free phrases outscore equally frequent loners."""
    # 'deep neural networks' is one 3-token phrase; 'cat' always alone
    texts = ["deep neural networks of the cat", "deep neural networks in a cat"]
    sf = _docs(spark, tmp_path, texts)
    out = {r.token: (r.freq, r.degree, r.score_ppm)
           for r in QUERIES["text_rake_keywords"](spark, sf).collect()}
    assert out["deep"] == (2, 6, 3_000_000)   # two 3-phrases
    assert out["cat"] == (2, 2, 1_000_000)    # two 1-phrases
    # stopwords never appear as keywords
    assert "the" not in out and "of" not in out and "a" not in out


def test_split_kfold_partitions_and_is_stable(spark, sf_dir):
    rows = {r.fold: (r.n_docs, r.n_tokens)
            for r in QUERIES["split_kfold"](spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    total = docs.count()
    assert sum(n for n, _ in rows.values()) == total  # partition, no loss
    assert set(rows) <= set(range(5))
    # deterministic: identical on re-run
    again = {r.fold: (r.n_docs, r.n_tokens)
             for r in QUERIES["split_kfold"](spark, sf_dir).collect()}
    assert again == rows
    # fold is independent of the holdout split's salt (different hash)
    holdout = {r.split: r.n_docs
               for r in QUERIES["split_train_holdout"](spark, sf_dir).collect()}
    assert sum(holdout.values()) == total


def test_vocab_oov_rate_flags_rare_tokens(spark, tmp_path):
    """Tokens under the vocab min-count (5) are OOV; per-source rates
    are exact ppm."""
    # 'common' appears 6x (in vocab); each 'rareN' once (OOV)
    texts = ["common common common rare0", "common common common rare1"]
    sf = _docs(spark, tmp_path, texts)  # sources s0, s1
    out = {r.source: (r.n_tokens, r.n_oov, r.oov_ppm)
           for r in QUERIES["vocab_oov_rate"](spark, sf).collect()}
    assert out["s0"] == (4, 1, 250_000)
    assert out["s1"] == (4, 1, 250_000)


def test_quality_null_profile_exact_counts(spark, tmp_path):
    rows = [
        (1, "2024-01-01 00:00:00", 10, "click", 1.0, None),
        (2, "2024-01-01 00:00:01", 10, "view", None, "{}"),
        (3, "2024-01-01 00:00:02", None, "click", 2.0, None),
        (4, None, 11, None, 2.0, "{}"),
    ]
    _write(
        spark, tmp_path, "events",
        [(a, None if b is None else __import__("datetime").datetime.fromisoformat(b),
          c, d, e, f) for a, b, c, d, e, f in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = {r.column_name: (r.n_rows, r.n_null, r.n_distinct, r.null_ppm)
           for r in QUERIES["quality_null_profile"](spark, str(tmp_path)).collect()}
    assert out["event_id"] == (4, 0, 4, 0)
    assert out["ts"] == (4, 1, 3, 250_000)
    assert out["user_id"] == (4, 1, 2, 250_000)
    assert out["event_type"] == (4, 1, 2, 250_000)
    assert out["value"] == (4, 1, 2, 250_000)  # 2.0 twice -> 2 distinct
    assert out["props"] == (4, 2, 1, 500_000)


def test_quality_benford_leading_digits(spark, tmp_path):
    import datetime

    prices = [123.45, 19.99, 1.01, 250.0, 2999.99, 0.75, 987.0, 13.37]
    _write(
        spark, tmp_path, "orders",
        [(i, i, "O", p, datetime.datetime(2024, 1, 1), "1-URGENT")
         for i, p in enumerate(prices)],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    out = {r.digit: (r.n, r.share_ppm)
           for r in QUERIES["quality_benford"](spark, str(tmp_path)).collect()}
    # leading digits: 1,1,1,2,2,0.75->'0.75'? no: DECIMAL(18,2) of 0.75
    # renders '0.75' -> digit '0'; 9,1 -> totals: 1:4 (123,19,1.01,13),
    # 2:2 (250,2999), 9:1 (987), 0:1 (0.75)
    assert out["1"] == (4, 500_000)
    assert out["2"] == (2, 250_000)
    assert out["9"] == (1, 125_000)
    assert out["0"] == (1, 125_000)


def test_graph_reciprocity_constructed_digraph(spark, tmp_path):
    """user journeys a->b->a (mutual) and a->c (one-way): a's edges
    {b,c} with only b reciprocated; b fully reciprocated; c none."""
    import datetime

    t0 = datetime.datetime(2024, 1, 1)
    evs = [
        (1, t0, 100, "a", 1.0, None),
        (2, t0 + datetime.timedelta(seconds=1), 100, "b", 1.0, None),
        (3, t0 + datetime.timedelta(seconds=2), 100, "a", 1.0, None),
        (4, t0 + datetime.timedelta(seconds=3), 100, "c", 1.0, None),
    ]
    _write(
        spark, tmp_path, "events", evs,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = {r.from_type: (r.n_out, r.n_reciprocated, r.reciprocity_ppm)
           for r in QUERIES["graph_reciprocity"](spark, str(tmp_path)).collect()}
    assert out["a"] == (2, 1, 500_000)  # a->b (mutual), a->c (not)
    assert out["b"] == (1, 1, 1_000_000)
    assert "c" not in out  # c has no outgoing edges


def test_graph_assortativity_matches_python_reference(spark, tmp_path):
    """Star + pendant bipartite graph vs an independent python Pearson
    over the same endpoint-degree pairs."""
    import datetime

    # customers 1,2,3 ; suppliers 10,20: c1-{10,20}, c2-{10}, c3-{10}
    pairs = [(1, 10), (1, 20), (2, 10), (3, 10)]
    _write(
        spark, tmp_path, "orders",
        [(i, c, "O", 1.0, datetime.datetime(2024, 1, 1), "x")
         for i, (c, _) in enumerate(pairs)],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    _write(
        spark, tmp_path, "lineitem",
        [(i, 100 + i, s, 1.0, 1.0, 0.0, datetime.datetime(2024, 1, 1))
         for i, (_, s) in enumerate(pairs)],
        "l_orderkey long, l_partkey long, l_suppkey long, l_quantity double, "
        "l_extendedprice double, l_discount double, l_shipdate timestamp",
    )
    row = QUERIES["graph_assortativity"](spark, str(tmp_path)).first()

    # python reference on the undirected edge list
    from collections import Counter

    edges = [(f"c:{c}", f"s:{s}") for c, s in pairs]
    edges = edges + [(b, a) for a, b in edges]
    deg = Counter(u for u, _ in edges)
    xs = [deg[u] for u, v in edges]
    ys = [deg[v] for u, v in edges]
    m = len(edges)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx, syy = sum(x * x for x in xs), sum(y * y for y in ys)
    want = (m * sxy - sx * sy) / (
        math.sqrt(m * sxx - sx * sx) * math.sqrt(m * syy - sy * sy)
    )
    assert (row.m, row.sx, row.sy, row.sxy, row.sxx, row.syy) == (
        m, sx, sy, sxy, sxx, syy
    )
    assert math.isclose(row.assortativity, want, rel_tol=1e-12)
    assert row.assortativity < 0  # star graphs are disassortative


def test_events_interarrival_known_gaps(spark, tmp_path):
    import datetime

    t0 = datetime.datetime(2024, 1, 1)
    # user 100 'click' at +0, +10, +40 -> gaps 10, 30 (median 20)
    # user 200 'click' at +0, +5 -> gap 5; 'view' solo -> no gap
    evs = [
        (1, t0, 100, "click", 1.0, None),
        (2, t0 + datetime.timedelta(seconds=10), 100, "click", 1.0, None),
        (3, t0 + datetime.timedelta(seconds=40), 100, "click", 1.0, None),
        (4, t0, 200, "click", 1.0, None),
        (5, t0 + datetime.timedelta(seconds=5), 200, "click", 1.0, None),
        (6, t0, 200, "view", 1.0, None),
    ]
    _write(
        spark, tmp_path, "events", evs,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = {r.event_type: r for r in
           QUERIES["events_interarrival"](spark, str(tmp_path)).collect()}
    c = out["click"]
    assert (c.n_gaps, c.min_gap_s, c.max_gap_s, c.sum_gap_s) == (3, 5, 30, 45)
    assert c.median_gap_s == 10.0
    assert "view" not in out  # single events produce no gaps
