"""ts_user_similarity salt probe (r14 / VERDICT r13 item 7).

Question: the r13 fix pins the exploding day self-join's width with
``repartition(nparts, day)`` — parallelism is then capped by distinct-
day cardinality (~90 on the fixture), and a hot day lands on one task.
Would a (day, user-bucket) salt — bucket the left side, replicate the
right side per bucket — spread it better?

Context the numbers should be read in: the cohort screen caps the per-
day pair volume at cohort_size^2 (= 200^2 = 40k rows) BY CONSTRUCTION,
so a "hot day" can never exceed 40k join outputs — the salt's upside is
bounded. Its downside is real: the right side is replicated S times
(S x shuffle bytes).

Interleaved min-of-3 of the full registered query body with the two
repartition strategies, plus a skew stressor where every cohort user is
active on EVERY day (maximum per-day fan-out the cohort cap allows).

Run on an idle machine: python tools/ts_salt_probe.py [S]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from go_cdc_spark.session import get_spark
from go_cdc_spark.tables import fan_out, load

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _daily(spark):
    ev = fan_out(load(spark, SF_DIR, "events"))
    cohort = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_ev"))
        .orderBy(F.desc("n_ev"), F.asc("user_id"))
        .limit(200)
        .select("user_id")
    )
    return (
        ev.join(F.broadcast(cohort), "user_id", "left_semi")
        .groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("v"))
    )


def _pairs(a, b):
    return (
        a.join(b, (a["day"] == b["day_b"]) & (F.col("user_a") < F.col("user_b")))
        .groupBy("user_a", "user_b")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def day_pin(spark, nparts):
    daily = _daily(spark)
    a = daily.select(
        F.col("user_id").alias("user_a"), "day", F.col("v").alias("va")
    ).repartition(nparts, "day")
    b = daily.select(
        F.col("user_id").alias("user_b"), F.col("day").alias("day_b"),
        F.col("v").alias("vb"),
    ).repartition(nparts, "day_b")
    return _pairs(a, b)


def day_salt(spark, nparts, s):
    daily = _daily(spark)
    a = daily.select(
        F.col("user_id").alias("user_a"), "day", F.col("v").alias("va"),
        F.pmod(F.xxhash64("user_id"), F.lit(s)).alias("bkt"),
    ).repartition(nparts, "day", "bkt")
    b = (
        daily.select(
            F.col("user_id").alias("user_b"), F.col("day").alias("day_b"),
            F.col("v").alias("vb"),
        )
        .withColumn("bkt", F.explode(F.array(*[F.lit(i) for i in range(s)])))
        .repartition(nparts, "day_b", "bkt")
    )
    joined = (
        a.join(
            b,
            (a["day"] == b["day_b"]) & (a["bkt"] == b["bkt"])
            & (F.col("user_a") < F.col("user_b")),
        )
        .groupBy("user_a", "user_b")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return joined


def main() -> None:
    s = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    spark = get_spark("ts-salt-probe")
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    # parity
    pin = sorted(map(tuple, day_pin(spark, nparts).collect()))
    slt = sorted(map(tuple, day_salt(spark, nparts, s).collect()))
    assert pin == slt, "salted join changed the pair counts!"
    best = {"day_pin": float("inf"), f"day_salt_s{s}": float("inf")}
    for _ in range(3):
        for name, fn in (
            ("day_pin", lambda: day_pin(spark, nparts)),
            (f"day_salt_s{s}", lambda: day_salt(spark, nparts, s)),
        ):
            df = fn()
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best[name] = min(best[name], time.perf_counter() - t0)
    for n, v in best.items():
        print(f"{n}: {v:.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
