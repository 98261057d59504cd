"""The spark.sql surface must agree with the DataFrame operator surface
— same tables, same Catalyst, same results."""

from __future__ import annotations

from pyspark.sql import functions as F

from go_cdc_spark.plans.queries import QUERIES
from go_cdc_spark.sql import register_views, run_sql


def test_views_register_all_tables(spark, sf_dir):
    names = register_views(spark, sf_dir)
    assert "lineitem" in names and "documents" in names
    assert spark.sql("SELECT COUNT(*) AS n FROM region").collect()[0]["n"] == 5


def test_sql_q1_equals_dataframe_q1(spark, sf_dir):
    sql_df = run_sql(
        spark,
        sf_dir,
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP_NTZ '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        """,
    )
    got = {
        (r["l_returnflag"], r["l_linestatus"]): (r["sum_qty"], r["count_order"])
        for r in sql_df.collect()
    }
    want = {
        (r["l_returnflag"], r["l_linestatus"]): (r["sum_qty"], r["count_order"])
        for r in QUERIES["q1_pricing_summary"](spark, sf_dir)
        .select("l_returnflag", "l_linestatus", "sum_qty", "count_order")
        .collect()
    }
    assert got == want and got


def test_sql_join_pushdown_matches_operator(spark, sf_dir):
    register_views(spark, sf_dir)
    sql_n = spark.sql(
        "SELECT COUNT(*) AS n FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
        "WHERE c.c_mktsegment = 'BUILDING'"
    ).collect()[0]["n"]
    from go_cdc_spark.tables import load

    df_n = (
        load(spark, sf_dir, "orders")
        .join(
            load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .count()
    )
    assert sql_n == df_n > 0
