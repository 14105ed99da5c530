#!/usr/bin/env python
"""Skew-join scaling probe (OPERATORS_BENCH.md r6 section).

Builds a skewed fact from sf0.1 events replicated REPL times with ONE hot
user owning ~50% of all rows, joins it to a per-user dim, and compares a
plain shuffled sort-merge join against salted_join(salt=16) — broadcast
disabled and AQE off, so neither engine rescue (broadcast or runtime
skew-split) hides the hot reducer. Asserts result invariance: identical
row count and identical group-level checksum.

Usage: python tools/skew_probe.py [REPL]   (default 16)
"""
from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from basis_devkit_spark.operators.skew import salted_join
from basis_devkit_spark.queries import load
from basis_devkit_spark.session import get_spark

REPL = int(sys.argv[1]) if len(sys.argv) > 1 else 16
HOT = -1  # hot user id


def main() -> None:
    spark = get_spark(app_name="skew-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.shuffle.partitions", "32")

    ev = load(spark, "/root/testdata/sf0.1", "events").select(
        "event_id", "user_id", "value"
    )
    # replicate REPL x; half of every replica's rows re-keyed to the hot user
    r = spark.range(REPL).select(F.col("id").alias("__r"))
    fact = (
        ev.crossJoin(r)
        .select(
            F.xxhash64("event_id", "__r").alias("event_id"),  # ANSI-safe re-key
            F.when(F.col("event_id") % 2 == 0, F.lit(HOT))
            .otherwise(F.col("user_id"))
            .alias("user_id"),
            "value",
        )
    )
    dim = (
        ev.select("user_id").distinct()
        .unionByName(spark.createDataFrame([(HOT,)], "user_id long"))
        .withColumn("segment", F.pmod(F.col("user_id"), F.lit(7)))
    )
    fact.write.mode("overwrite").parquet("/tmp/skew_probe_fact.parquet")
    dim.write.mode("overwrite").parquet("/tmp/skew_probe_dim.parquet")
    fact = spark.read.parquet("/tmp/skew_probe_fact.parquet")
    dim = spark.read.parquet("/tmp/skew_probe_dim.parquet")
    n_fact = fact.count()
    hot_share = fact.filter(F.col("user_id") == HOT).count() / n_fact

    def checksum(df):
        row = df.groupBy().agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(user_id, segment, event_id))").alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    plain = fact.join(dim, "user_id")
    salted = salted_join(fact, dim, "user_id", salt=16)
    ck_plain, ck_salted = checksum(plain), checksum(salted)
    assert ck_plain == ck_salted, (ck_plain, ck_salted)

    def timed(df, n=5):
        s = []
        for _ in range(n):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df.groupBy("segment").agg(F.count(F.lit(1)).alias("n")).collect()
            s.append(time.perf_counter() - t0)
        return round(statistics.median(s), 3)

    timed(plain, 1); timed(salted, 1)  # warm
    print(json.dumps({
        "rows_fact": n_fact,
        "hot_key_share": round(hot_share, 4),
        "plain_join_s": timed(plain),
        "salted_join_s": timed(salted),
        "checksum_equal": True,
        "checksum": list(ck_plain),
    }))


if __name__ == "__main__":
    main()
