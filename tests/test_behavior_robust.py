"""Spec tests for the robust-analytics pair: MAD outliers (including
the masking case the z-score fails) and RFM segmentation."""

from __future__ import annotations

import datetime as dt

from go_cdc_spark.operators.behavior import anomaly_mad, anomaly_zscore, rfm_segments


def _write_events(spark, tmp_path, day_values: dict[int, float]) -> str:
    rows = [
        (i, dt.datetime(2024, 1, 1 + d, 12), 1, "view", v, "{}")
        for i, (d, v) in enumerate(day_values.items())
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_mad_catches_what_zscore_masks(spark, tmp_path):
    """Five 5000-value days among twenty ~20-value days: the outliers
    inflate the sample stddev enough that their own z-scores fall
    under 2.0 (masking); the MAD score flags all five at >100."""
    days = {d: float(10 + d) for d in range(20)}
    for d in range(20, 25):
        days[d] = 5000.0
    sf = _write_events(spark, tmp_path, days)
    z = {r["day"].day: r["is_anomaly"] for r in anomaly_zscore(spark, sf).collect()}
    m = {r["day"].day if hasattr(r["day"], "day") else r["day"]: r
         for r in anomaly_mad(spark, sf).collect()}
    outlier_days = {1 + d for d in range(20, 25)}
    # z-score masked: no day crosses 2 sigma
    assert all(v == 0 for v in z.values())
    for day, r in m.items():
        if day in outlier_days:
            assert r["is_outlier"] == 1 and r["mad_score"] > 100.0
        else:
            assert r["is_outlier"] == 0 and abs(r["mad_score"]) < 3.5


def test_mad_constant_series_scores_zero(spark, tmp_path):
    sf = _write_events(spark, tmp_path, {d: 7.0 for d in range(10)})
    rows = anomaly_mad(spark, sf).collect()
    assert all(r["mad_score"] == 0.0 and r["is_outlier"] == 0 for r in rows)


def _write_orders(spark, tmp_path, custs) -> str:
    """custs: list of (custkey, last_day, n_orders, price_each)."""
    rows = []
    ok = 0
    for ck, last_day, n, price in custs:
        for i in range(n):
            ok += 1
            rows.append(
                (ok, ck, dt.datetime(2024, 1, last_day), float(price))
            )
    spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderdate timestamp, "
        "o_totalprice double"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    return str(tmp_path)


def test_rfm_widely_separated_quartiles(spark, tmp_path):
    """Four customers with order-of-magnitude-separated metrics: any
    interpolated quartile threshold lands between them, so scores are
    unambiguous. Recency is inverted (recent = 4)."""
    sf = _write_orders(
        spark,
        tmp_path,
        [
            (1, 28, 40, 1000.0),  # most recent, most orders, biggest spend
            (2, 20, 12, 100.0),
            (3, 10, 4, 10.0),
            (4, 1, 1, 1.0),  # stale, one tiny order
        ],
    )
    rows = {r["c_custkey"]: r for r in rfm_segments(spark, sf).collect()}
    assert rows[1]["segment"] == 444 and rows[4]["segment"] == 111
    assert (rows[2]["r_score"], rows[2]["f_score"], rows[2]["m_score"]) == (3, 3, 3)
    assert (rows[3]["r_score"], rows[3]["f_score"], rows[3]["m_score"]) == (2, 2, 2)
    assert rows[1]["recency_days"] == 0  # anchored at the corpus max date
    assert rows[4]["recency_days"] == 27
    assert rows[1]["frequency"] == 40
    assert rows[1]["monetary"] == 40 * 1000.0


def _write_lineitem(spark, tmp_path, baskets) -> str:
    rows = [(ok, pk) for ok, parts in baskets for pk in parts]
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    return str(tmp_path)


def test_basket_rules_exact_scores(spark, tmp_path):
    """10 baskets: {a,b} x4, {a} x4, {a,c} x2 -> hand-computable
    support/confidence/lift for every direction."""
    from go_cdc_spark.operators.behavior import basket_rules

    a, b, c = 1, 2, 3
    baskets = [(i, [a, b]) for i in range(4)]
    baskets += [(10 + i, [a]) for i in range(4)]
    baskets += [(20 + i, [a, c]) for i in range(2)]
    sf = _write_lineitem(spark, tmp_path, baskets)
    rows = {(r["antecedent"], r["consequent"]): r
            for r in basket_rules(spark, sf).collect()}
    # s_a=10, s_b=4, s_c=2, s_ab=4, s_ac=2, n=10
    assert rows[(a, b)]["pair_support"] == 4
    assert rows[(a, b)]["confidence"] == 4 / 10
    assert rows[(b, a)]["confidence"] == 1.0
    assert rows[(a, b)]["lift"] == 4 * 10 / (10 * 4)  # = 1.0
    assert rows[(c, a)]["confidence"] == 1.0
    assert rows[(a, c)]["lift"] == 2 * 10 / (10 * 2)
    # pair (b, c) never co-occurs: no rule in either direction
    assert (b, c) not in rows and (c, b) not in rows


def test_pareto_interpolated_top_decile(spark, tmp_path):
    """Spends [1,1,1,7]: the 0.9-quantile threshold interpolates to
    5.2, so the top decile holds exactly the 7-spend customer and 70%
    of revenue; the last decile always covers everyone."""
    from go_cdc_spark.operators.behavior import orders_pareto

    custs = [(1, 5, 1, 7.0), (2, 5, 1, 1.0), (3, 5, 1, 1.0), (4, 5, 1, 1.0)]
    sf = _write_orders(spark, tmp_path, custs)
    rows = {r["decile"]: r for r in orders_pareto(spark, sf).collect()}
    assert rows[1]["customers_above"] == 1
    assert rows[1]["revenue_share"] == 0.7
    assert rows[10]["customers_above"] == 4
    assert rows[10]["revenue_share"] == 1.0
    shares = [rows[k]["revenue_share"] for k in range(1, 11)]
    assert shares == sorted(shares)  # Lorenz curve is monotone


def test_basket_rules_mega_basket_is_excluded(spark, tmp_path):
    """A basket above the size cap leaves the mining universe entirely
    (the measured-8x skew valve): its items gain no support from it
    and no rules involve items that only ever co-occur inside it."""
    from go_cdc_spark.operators.behavior import _RULES_MAX_BASKET, basket_rules

    a, b = 1, 2
    baskets = [(i, [a, b]) for i in range(2)]  # a normal supported pair
    mega = list(range(100, 100 + _RULES_MAX_BASKET + 1))  # cap+1 items
    baskets += [(50, mega), (51, mega)]  # twice, so pairs WOULD have support
    sf = _write_lineitem(spark, tmp_path, baskets)
    rows = {(r["antecedent"], r["consequent"]): r
            for r in basket_rules(spark, sf).collect()}
    assert (a, b) in rows and (b, a) in rows
    assert not any(ant >= 100 or con >= 100 for ant, con in rows)
    # supports/n are counted over the capped universe: 2 baskets total
    assert rows[(a, b)]["confidence"] == 1.0
    assert rows[(a, b)]["lift"] == 2 * 2 / (2 * 2)
