#!/usr/bin/env python
"""Round-9 scale probes.

``events_sf1``: settles the r8 VERDICT's one perf-weak row with data.
The claim under test: events_sess's 2.97x-vs-DuckDB ratio at sf0.1 is
Spark's fixed per-job dispatch constant (~25 ms) sitting on a 31 ms
query — an overhead *floor*, not a data-term deficit — so at 10x the
rows (sf1-equivalent, 1M events) the ratio must fall under the 2x gate.

Methodology matches bench.py exactly: same split-file layout for both
engines, plan prepared once (catalog semantics), cache cleared per run,
median of 9 timed executions interleaved Spark/DuckDB so load spikes hit
both medians. The 10x table replicates sf0.1 events with distinct user
ids per replica (density scaling — the hour x event_type group count
stays ~3.6k, exactly how event volume grows in production).

Run: ``python tools/r9_probes.py events_sf1``
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALE_DIR = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/spark_graft_r9_sf1")
# 1M rows: 16 splits beat 8 and 32 (measured 40.4 / 44.8 / 44.1 ms) —
# consistent with bench.py's SPLIT_N scaling (events: 8 files @ 100k rows).
_SPLITS = {10: 16, 100: 32}


def _build_scaled_events(spark, replicas: int) -> str:
    """``replicas``x events with distinct per-replica user ids, split
    files sized per scale. Cached across runs (keyed by _SUCCESS)."""
    from pyspark.sql import functions as F

    dst = os.path.join(f"{SCALE_DIR}_x{replicas}", "events.parquet")
    if os.path.exists(os.path.join(dst, "_SUCCESS")):
        return dst
    e = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    rep = spark.range(replicas).select(F.col("id").alias("__rep"))
    big = e.crossJoin(rep).select(
        (F.col("user_id") + F.col("__rep") * 1_000_000).alias("user_id"),
        (F.col("event_id") + F.col("__rep") * 100_000_000).alias("event_id"),
        "ts",
        "event_type",
        "value",
    )
    big.repartition(_SPLITS[replicas]).write.mode("overwrite").parquet(dst)
    return dst


def events_scaled(replicas: int = 10) -> dict:
    import duckdb
    from pyspark.sql import functions as F

    import bench
    from basis_devkit_spark.session import get_spark

    spark = get_spark(app_name="r9-events-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    # same scan/agg tuning as bench.py main (measured there)
    spark.conf.set("spark.sql.parquet.columnarReaderBatchSize", "16384")
    spark.conf.set("spark.sql.codegen.aggregate.map.vectorized.enable", "true")
    dst = _build_scaled_events(spark, replicas)
    tabs = {"events": spark.read.parquet(dst)}
    n_rows = tabs["events"].count()

    con = duckdb.connect()
    con.execute(f"SET threads = {os.cpu_count() or 32}")
    con.execute(
        "create view events as select * from "
        f"read_parquet('{os.path.join(dst, '*.parquet')}')"
    )
    duck_sql = bench.DUCK_HEADLINE_SQL["events_sess"]

    df = bench.events_sess(tabs)
    # Steady-state warmup: 25 untimed executions — C2 JIT compilation of
    # the codegen'd scan+agg loops (plus the shared parquet-reader/Arrow
    # serializer paths) takes ~20+ runs to flatten on this query (measured
    # curve: 86, 70, 63, 73, 54, 47, 49, 44, 40, 42, 43, ... -> ~32 ms).
    # One warm run leaves the median ~60% above steady state. Total warmup
    # cost is ~2 s — cheap relative to a wrong steady-state claim.
    for _ in range(25):
        spark.catalog.clearCache()
        bench._run(df, "pandas")
        con.execute(duck_sql).fetchall()

    spark_s, duck_s = [], []
    for _ in range(9):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        n_groups = bench._run(df, "pandas")
        spark_s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        con.execute(duck_sql).fetchall()
        duck_s.append(time.perf_counter() - t0)

    # the fixed per-job constant in THIS warm session: a trivial 1-task
    # job on a PREPARED plan (count() would re-analyze per call) — the
    # number the "overhead floor" claim rests on
    one = spark.range(1).groupBy().agg(F.count(F.lit(1)).alias("c"))
    floor = []
    for i in range(12):
        t0 = time.perf_counter()
        one.collect()
        if i >= 3:  # skip its own warmup
            floor.append(time.perf_counter() - t0)

    sp, du = statistics.median(spark_s), statistics.median(duck_s)
    out = {
        "probe": f"events_x{replicas}",
        "rows": n_rows,
        "groups": n_groups,
        "spark_ms": round(sp * 1000, 1),
        "duckdb_ms": round(du * 1000, 1),
        "ratio": round(sp / du, 2),
        "sf01_ratio_r8": 2.97,
        "spark_job_floor_ms": round(statistics.median(floor) * 1000, 1),
    }
    print(json.dumps(out))
    return out


def bpe_batch() -> dict:
    """d33 scale claim: batch_merges=N cuts sequential rounds ~N-fold.
    Measures wall + divergence-from-classic for 16 merges at batch 1/4/8
    on the sf0.01 corpus."""
    from basis_devkit_spark.operators.bpe import bpe_learn_merges
    from basis_devkit_spark.queries import load
    from basis_devkit_spark.session import get_spark

    spark = get_spark(app_name="r9-bpe-batch-probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load(spark, "/root/testdata/sf0.01", "documents")
    out: dict = {"probe": "bpe_batch", "num_merges": 16}
    classic = None
    for b in (1, 4, 8):
        t0 = time.perf_counter()
        rows = [
            (r["left"], r["right"])
            for r in bpe_learn_merges(
                docs, "text", num_merges=16, batch_merges=b
            ).orderBy("merge_rank").collect()
        ]
        wall = round(time.perf_counter() - t0, 2)
        if b == 1:
            classic = rows
        # positional equality understates agreement (order shifts where
        # counts interact); the learned VOCABULARY overlap is the signal
        common = len(set(rows) & set(classic))
        out[f"batch{b}"] = {"wall_s": wall, "vocab_overlap": common}
    print(json.dumps(out))
    return out


def dsir_scale() -> dict:
    """d34 scale claim: the weight relation is bounded by num_buckets
    regardless of corpus size; scoring wall grows ~linearly while fit
    state stays flat. Measured at sf0.01 (500 docs) vs sf0.1 (5000)."""
    from pyspark.sql import functions as F

    from basis_devkit_spark.operators.dsir import (
        dsir_bucket_counts,
        dsir_pipeline,
    )
    from basis_devkit_spark.queries import load
    from basis_devkit_spark.session import get_spark

    spark = get_spark(app_name="r9-dsir-probe")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"probe": "dsir_scale"}
    for tag, sfd in (("sf0.01", "/root/testdata/sf0.01"),
                     ("sf0.1", "/root/testdata/sf0.1")):
        docs = load(spark, sfd, "documents")
        target = docs.filter(F.col("source") == "src0")
        wrows = dsir_bucket_counts(docs).count()
        t0 = time.perf_counter()
        n = dsir_pipeline(docs, target).count()
        out[tag] = {
            "docs": n,
            "weight_state_rows": int(wrows),
            "wall_s": round(time.perf_counter() - t0, 2),
        }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "events_sf1"
    {
        "events_sf1": lambda: events_scaled(10),
        "events_sf10": lambda: events_scaled(100),
        "bpe_batch": bpe_batch,
        "dsir_scale": dsir_scale,
    }[which]()
