#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Methodology (BASELINE.md §3 note): Spark's fixed per-query overhead
(session + planning + job launch) exceeds DuckDB's total runtime at these
scales, so we measure steady-state — warm session, one untimed warm-up run
per query, then median of 3 timed runs. Results are materialized through
the `noop` sink (full execution, no collect/serialize overhead).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from basis_devkit_spark.queries import load
from basis_devkit_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def q1_agg(spark, sf):
    """TPC-H Q1-style filtered group-by agg over lineitem."""
    li = load(spark, sf, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "sum_disc_price"
            ),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.count("*").alias("count_order"),
        )
    )


def q3_join(spark, sf):
    """customer ⋈ orders ⋈ lineitem + group-by + top-10."""
    c = load(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf, "orders")
    li = load(spark, sf, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), "o_orderkey")
        .limit(10)
    )


def window_q(spark, sf):
    """row_number partitioned top-3 per customer over orders."""
    o = load(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return o.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 3)


def events_sess(spark, sf):
    """Hourly event rollup (date_trunc group-by)."""
    e = load(spark, sf, "events")
    return (
        e.groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
    )


BENCH_QUERIES = {
    "q1_agg": q1_agg,
    "q3_join": q3_join,
    "window": window_q,
    "events_sess": events_sess,
}


def _run(df) -> int:
    """Materialize via Arrow-batched fetch — the client read path;
    executes the complete plan including result transfer."""
    return len(df.toPandas())


def main() -> None:
    spark = get_spark(app_name="basis-devkit-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    # bind tables once (catalog warm-up, same as the oracle's view creation)
    for t in ("lineitem", "orders", "customer", "events"):
        load(spark, SF_DIR, t)
    timings: dict[str, float] = {}
    for name, fn in BENCH_QUERIES.items():
        _run(fn(spark, SF_DIR))  # warm-up (plan cache, JIT, file listing)
        samples = []
        for _ in range(5):
            t0 = time.perf_counter()
            _run(fn(spark, SF_DIR))  # includes read+plan+execute+fetch
            samples.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(samples), 4)
    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline query wall time (warm, median of 5)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": SF_DIR,
            }
        )
    )


if __name__ == "__main__":
    main()
