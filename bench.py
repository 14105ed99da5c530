#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Methodology (argued per VERDICT r01, with measured evidence)
-----------------------------------------------------------
The headline number is **steady-state execution**: tables bound once,
each query PREPARED once (analyzed/optimized plan built and warmed), then
median of 9 timed executions of the prepared plan — every timed run does
the full scan + shuffle + aggregate + result fetch; only query *compilation*
is reused. Two environment artifacts motivate this, both measured at sf0.1
(local[32], warm JVM):

1. **Single-row-group inputs.** The driver's seed parquet files have one
   row group each, so a plain scan is a single task regardless of cores.
   Setup (untimed, cached across runs) re-lays each bench table into a
   32-file local copy — the layout any real deployment would have; at
   100 TB inputs are thousands of row groups and this artifact does not
   exist. Effect on q1: 634 ms → 480 ms fresh-plan.
2. **Per-query compile cost.** Building + optimizing + codegen'ing a fresh
   plan costs ~350-500 ms per query in this JVM (analysis alone ~90 ms;
   DuckDB's parse+plan is ~1 ms so the baseline doesn't see this term).
   Measured q1 decomposition: fresh-plan 480 ms vs reused-plan 75 ms — the
   ~400 ms delta is compilation, not data work. VERDICT r01 sanctioned
   "pre-warm/reuse analyzed plans" + "bind tables once" as defensible
   managed-catalog semantics (the DuckDB oracle also binds views once);
   prepared-statement reuse is the exact analogue for repeated queries.

For transparency the JSON also carries ``fresh_queries`` — the same
median-of-5 with the plan REBUILT every run (compile included). The gap
between the two is fixed per-query compile overhead, invariant in data
size: at 100 TB it vanishes into the noise; at sf0.1 it dominates.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from basis_devkit_spark.queries import load
from basis_devkit_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# Local re-layout of the single-row-group seed files (see module docstring).
SPLIT_DIR = os.environ.get(
    "SPARK_GRAFT_SPLIT_DIR", "/tmp/spark_graft_bench_split"
)
# Per-table split counts: sized so each task gets meaningful work — tiny
# tables at more splits just pay task-launch overhead (measured: events
# 100k rows runs fastest at 8 splits, lineitem 600k at 32).
# documents at 32: its bench rows (minhash fold, ngram explode) are
# CPU-bound, not scan-bound — measured minhash 1.42s@8 -> 1.05s@32,
# ngram fresh 0.86s@8 -> 0.38s@32 on local[32].
SPLIT_N = {"lineitem": 32, "orders": 16, "customer": 8, "events": 8, "documents": 32}
BENCH_TABLES = tuple(SPLIT_N)


def bind_tables(spark) -> dict:
    """Bind bench inputs once (catalog semantics). Untimed setup: re-lay
    each table into a multi-file local copy so scans parallelize — cached
    across bench runs under SPLIT_DIR, keyed by the SF dir name."""
    key = os.path.basename(os.path.normpath(SF_DIR))
    tabs = {}
    for t in BENCH_TABLES:
        dst = os.path.join(SPLIT_DIR, key, f"{t}.parquet")
        have = (
            len([f for f in os.listdir(dst) if f.endswith(".parquet")])
            if os.path.exists(os.path.join(dst, "_SUCCESS"))
            else -1
        )
        if have != SPLIT_N[t]:  # missing OR split count changed
            load(spark, SF_DIR, t).repartition(SPLIT_N[t]).write.mode(
                "overwrite"
            ).parquet(dst)
        tabs[t] = spark.read.parquet(dst)
    return tabs


def q1_agg(tabs):
    """TPC-H Q1-style filtered group-by agg over lineitem."""
    li = tabs["lineitem"]
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


def q3_join(tabs):
    """customer ⋈ orders ⋈ lineitem + group-by + top-10.

    Physical strategy: the dim side (orders ⋈ BUILDING customers) is built
    first and broadcast, so the lineitem fact table never shuffles — the
    plan that survives a 1000× fact-table scale-up as long as the filtered
    dim fits the broadcast threshold (AQE would demote it otherwise).
    """
    c = tabs["customer"].filter(F.col("c_mktsegment") == "BUILDING")
    o = tabs["orders"]
    li = tabs["lineitem"]
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


def window_q(tabs):
    """Top-3 orders per customer (row_number semantics).

    Physical strategy: algebraic rewrite of the window — per-group top-k
    via collect_list + sort_array + slice aggregation. Avoids the window
    exec's full sort of every shuffle partition (hash-agg + per-group
    array sort instead; ~40% faster here). Same result as the row_number
    form; b29/b35 keep the window-function formulation for correctness.
    """
    o = tabs["orders"]
    packed = o.groupBy("o_custkey").agg(
        F.slice(
            F.sort_array(
                F.collect_list(F.struct("o_totalprice", "o_orderkey")), False
            ),
            1,
            3,
        ).alias("top3")
    )
    return packed.select(
        "o_custkey", F.posexplode("top3").alias("pos", "t")
    ).select(
        "o_custkey",
        F.col("t.o_orderkey").alias("o_orderkey"),
        F.col("t.o_totalprice").alias("o_totalprice"),
        (F.col("pos") + 1).alias("rn"),
    )


def events_sess(tabs):
    """Hourly event rollup.

    Physical strategy: pre-project to the 3 needed columns and group on a
    LONG hour bucket (epoch-micros div) instead of a truncated timestamp —
    long hash/compare beats timestamp in the hash agg — then convert the
    bucket back to a timestamp only on the ~3.6k result groups. Same result
    as the date_trunc form (b40b keeps that formulation for correctness).
    """
    e = tabs["events"]
    p = e.select(
        (F.unix_micros(F.col("ts").cast("timestamp")) / 3600000000)
        .cast("long")
        .alias("hb"),
        "event_type",
        "value",
    )
    g = p.groupBy("hb", "event_type").agg(
        F.count("*").alias("n"), F.sum("value").alias("total_value")
    )
    return g.select(
        F.timestamp_micros(F.col("hb") * 3600000000)
        .cast("timestamp_ntz")
        .alias("hour"),
        "event_type",
        "n",
        "total_value",
    )


def ngram_top(tabs):
    """D-layer: corpus-wide top-100 word 2-grams over documents (d04l).

    Scale shape: explode → one partial-combining hash agg → TakeOrdered.
    DuckDB reference for the identical query (unnest + group + order/limit)
    at sf0.1: ~0.26 s — this plan beats it (~0.10 s steady)."""
    from basis_devkit_spark.operators.text import ngram_counts

    return ngram_counts(tabs["documents"], "text", n=2, k=100)


def sessionize_q(tabs):
    """E-layer: 30-min gap sessionization roll-up over events (e01
    shape). One user-key shuffle + lag/running-sum window + session agg.

    LIKE-FOR-LIKE shapes (r6 fix: the r5 pairing was Spark count() vs a
    DuckDB full fetch — different materializations): both engines now
    execute the identical rollup SQL/plan and deliver ALL ~95k result
    rows to client memory — Spark via Arrow toPandas, DuckDB via native
    fetchall. Measured on this box at sf0.1 (median of 7): Spark 0.099 s
    vs DuckDB 0.106 s -> 0.94x. The count-materializer pairing
    (count(*) both sides) measures 0.219 s vs 0.029 s — Spark's count
    adds an extra aggregation stage on top of the window pipeline, so
    the fetch pairing is the one with identical work on both sides."""
    from basis_devkit_spark.operators.events import session_stats

    return session_stats(tabs["events"], gap_minutes=30)


def minhash_dedup_q(tabs):
    """D-layer: MinHash-LSH keep-one dedup over documents (d02b shape) —
    the flagship near-dup operator, timed for wall-clock regression (no
    SQL-expressible DuckDB equivalent; correctness is oracle-checked via
    the literal-table model in queries/pyoracle.py).

    Scale shape: shuffle-free signatures (array_min over transform) →
    banded equi-self-join → anti-join. The count() materializer sums the
    survivor set without transferring text bodies.

    Bench shape: ``materialize_signatures=False`` — the persist-free
    single-fold plan (merge-hinted self-join + ReuseExchange) — so the
    plan is prepared/reused steady-state like every other row; the
    default materialized mode is the corpus-scale shape but its
    persisted relation can't be re-timed honestly after a cache clear
    (re-materialization mode, see r6 notes)."""
    from basis_devkit_spark.operators.dedup import minhash_dedup

    return minhash_dedup(
        tabs["documents"], "doc_id", "text", jaccard_threshold=0.7,
        materialize_signatures=False,
    )


# name -> (query fn, materializer). Arrow fetch (toPandas) for large
# results; plain collect for small ones (Arrow job setup costs more than
# it saves under ~10k result rows). count for wide survivor sets whose
# payload (full text) isn't the measurand.
#
# BENCH_QUERIES are the BASELINE.md §3 headline queries — their steady
# sum is the `value` the driver grades against DuckDB's 457 ms total.
BENCH_QUERIES = {
    "q1_agg": (q1_agg, "collect"),        # 6 result rows
    "q3_join": (q3_join, "collect"),      # 10 result rows
    "window": (window_q, "pandas"),       # ~3 rows per customer
    "events_sess": (events_sess, "pandas"),  # ~3.6k rows: Arrow beats py4j
}
# D-layer operator rows, reported in their own section (NOT summed into
# `value` — BASELINE.md has no row for them; mixing them in would make the
# headline ratio incomparable across rounds). ngram_top carries a measured
# DuckDB reference; minhash_dedup is wall-time regression tracking only.
# minhash now runs persist-free (materialize_signatures=False, see
# minhash_dedup_q) so its plan is prepared once and re-timed steady-state
# like the other rows — the r5/r6 rebuild-per-run special case (persisted
# relation re-materialization weirdness) no longer applies.
DLAYER_QUERIES = {
    "ngram_top": (ngram_top, "collect", False),       # 100 result rows
    "minhash_dedup": (minhash_dedup_q, "count", False),  # survivor count
    "sessionize": (sessionize_q, "pandas", False),    # ~95k sessions; Arrow fetch
}
# Historical frozen DuckDB references (measured once 2026-08-13) — kept
# for round-over-round context ONLY. The GRADED ratios use the live
# measurements below (duck_* medians from THIS bench process, interleaved
# run-for-run with the Spark side), because a frozen constant against a
# live measurement makes the ratio track machine load, not code: r6's
# loaded box read minhash 1.40 s vs the frozen 0.835 s — an apparent
# 1.67x "regression" on untouched code.
DLAYER_BASELINES_FROZEN_S = {
    "ngram_top": 0.26, "sessionize": 0.106, "minhash_dedup": 0.835,
}
HEADLINE_BASELINES_FROZEN_S = {  # BASELINE.md §3, same 2026-08-13 session
    "q1_agg": 0.177, "q3_join": 0.128, "window": 0.112, "events_sess": 0.040,
}


def duck_connect(split_key: str):
    """DuckDB session over the SAME split parquet copies Spark scans —
    views bound once (catalog semantics, the oracle's own methodology)."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"SET threads = {os.environ.get('SPARK_GRAFT_CPUS', str(os.cpu_count() or 32))}"
    )
    for t in BENCH_TABLES:
        glob = os.path.join(SPLIT_DIR, split_key, f"{t}.parquet", "*.parquet")
        con.execute(f"create view {t} as select * from read_parquet('{glob}')")
    return con


# DuckDB equivalents, identical work over the identical split files, with
# the same materialization shape as the Spark side (fetchall vs
# collect/toPandas; count vs count). Run INTERLEAVED with the Spark
# rounds so transient machine load lands on both engines' medians.
DUCK_HEADLINE_SQL = {
    "q1_agg": """
        select l_returnflag, l_linestatus,
               sum(l_quantity) as sum_qty,
               sum(l_extendedprice) as sum_base_price,
               sum(l_extendedprice * (1 - l_discount)) as sum_disc_price,
               avg(l_quantity) as avg_qty,
               avg(l_extendedprice) as avg_price,
               count(*) as count_order
        from lineitem where l_shipdate <= '1998-09-02'
        group by l_returnflag, l_linestatus
    """,
    "q3_join": """
        select o_orderkey, o_orderdate,
               sum(l_extendedprice * (1 - l_discount)) as revenue
        from lineitem
        join orders on l_orderkey = o_orderkey
        join customer on o_custkey = c_custkey
        where c_mktsegment = 'BUILDING'
        group by o_orderkey, o_orderdate
        order by revenue desc, o_orderkey limit 10
    """,
    "window": """
        select o_custkey, o_orderkey, o_totalprice, rn from (
          select o_custkey, o_orderkey, o_totalprice,
                 row_number() over (partition by o_custkey
                                    order by o_totalprice desc, o_orderkey) as rn
          from orders) t
        where rn <= 3
    """,
    "events_sess": """
        select date_trunc('hour', ts) as hour, event_type,
               count(*) as n, sum(value) as total_value
        from events group by 1, 2
    """,
}
DUCK_DLAYER_SQL = {
    "ngram_top": """
        with toks as (
          select doc_id, string_split(lower(trim(text)), ' ') as ws from documents
        ),
        g as (
          select doc_id, array_to_string(list_slice(ws, i, i + 1), ' ') as gram
          from (
            select doc_id, ws, unnest(range(1, len(ws) - 2 + 2)) as i
            from toks where len(ws) >= 2
          )
        )
        select gram, count(*) as n_occurrences,
               count(distinct doc_id) as n_docs
        from g group by gram
        order by n_occurrences desc, gram limit 100
    """,
    "sessionize": """
        with o as (
          select user_id, event_id, ts,
                 lag(ts) over (partition by user_id order by ts, event_id) as prev_ts
          from events
        ), f as (
          select user_id, event_id, ts,
                 case when prev_ts is null or ts - prev_ts > interval 30 minute
                      then 1 else 0 end as ns
          from o
        ), s as (
          select user_id, ts,
                 cast(sum(ns) over (partition by user_id order by ts, event_id
                                    rows unbounded preceding) as int) as session_seq
          from f
        )
        select user_id, session_seq, count(*) as n_events,
               min(ts) as session_start, max(ts) as session_end,
               epoch_us(cast(max(ts) as timestamp))
                 - epoch_us(cast(min(ts) as timestamp)) as duration_us
        from s group by user_id, session_seq
    """,
    # minhash_dedup: built below (64-col signature SQL) via
    # tools/minhash_duckdb_baseline.build_sql over the split docs glob —
    # the identical LSH pipeline (shingles, 64-min signature, 16x4 bands,
    # verify, anti-join), count materializer on both sides.
}


def _run(df, how: str) -> int:
    """Materialize the complete plan including result transfer."""
    if how == "count":
        return df.count()
    return len(df.toPandas()) if how == "pandas" else len(df.collect())


def main() -> None:
    spark = get_spark(app_name="basis-devkit-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    # Interactive-workload tuning: AQE's per-stage runtime replan costs a
    # fixed ~50 ms per query — pure overhead on sub-second queries (it pays
    # off on large shuffles, where it stays on: engine default). Measured
    # events_sess: 118 ms AQE-on -> 70 ms AQE-off/shuf8. Broadcast joins
    # are forced by explicit hints, so no plan regresses.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    # Larger columnar read batches amortize per-batch virtual-call overhead
    # on scan-bound rows (r9 measured: events_sess at 1M rows 40.4 -> 36.1
    # ms; sub-1% change elsewhere). 16k rows x widest bench row is still
    # well under executor memory at any realistic column width.
    spark.conf.set("spark.sql.parquet.columnarReaderBatchSize", "16384")
    # First-level codegen'd VECTORIZED aggregate hash map (off by default
    # upstream): columnar probe/update for the partial agg. r9 measured on
    # events_sess at 1M rows: 48.6 -> 31.9 ms median; no headline row
    # regressed (bench re-run vs r8).
    spark.conf.set("spark.sql.codegen.aggregate.map.vectorized.enable", "true")
    tabs = bind_tables(spark)
    split_key = os.path.basename(os.path.normpath(SF_DIR))
    con = duck_connect(split_key)
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools"))
    from minhash_duckdb_baseline import build_sql as minhash_sql

    duck_sql = dict(DUCK_HEADLINE_SQL)
    duck_dsql = dict(DUCK_DLAYER_SQL)
    duck_dsql["minhash_dedup"] = minhash_sql(
        os.path.join(SPLIT_DIR, split_key, "documents.parquet", "*.parquet")
    )
    for sql in (*duck_sql.values(), *duck_dsql.values()):
        con.execute(sql).fetchall()  # warm (file handles, caches)
    # Prepare phase (untimed): build + warm one plan per query.
    prepared = {}
    for name, (fn, how) in BENCH_QUERIES.items():
        df = fn(tabs)
        _run(df, how)  # warms codegen cache, JIT, file listing, the plan
        prepared[name] = (df, how)
    dprepared = {}
    for name, (fn, how, rebuild) in DLAYER_QUERIES.items():
        df = fn(tabs)
        _run(df, how)  # warm JIT/codegen either way
        dprepared[name] = df
    # Timed rounds are INTERLEAVED across queries so a transient load spike
    # on this shared box lands on all medians equally instead of sinking
    # one query.
    steady_samples: dict[str, list[float]] = {n: [] for n in BENCH_QUERIES}
    duck_samples: dict[str, list[float]] = {n: [] for n in BENCH_QUERIES}
    for _ in range(9):
        for name, (df, how) in prepared.items():
            # Steady-state reuses the PLAN, never materialized data: drop
            # any persisted blocks so each timed run recomputes the full
            # query, scan included.
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            _run(df, how)
            steady_samples[name].append(time.perf_counter() - t0)
            # the DuckDB reference runs IMMEDIATELY after its Spark twin,
            # so load spikes hit both sides of every ratio equally
            t0 = time.perf_counter()
            con.execute(duck_sql[name]).fetchall()
            duck_samples[name].append(time.perf_counter() - t0)
    dlayer_samples: dict[str, list[float]] = {n: [] for n in DLAYER_QUERIES}
    duck_dlayer_samples: dict[str, list[float]] = {n: [] for n in DLAYER_QUERIES}
    for _ in range(5):
        for name, (fn, how, rebuild) in DLAYER_QUERIES.items():
            spark.catalog.clearCache()
            df = fn(tabs) if rebuild else dprepared[name]
            t0 = time.perf_counter()
            _run(df, how)
            dlayer_samples[name].append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            con.execute(duck_dsql[name]).fetchall()
            duck_dlayer_samples[name].append(time.perf_counter() - t0)
    fresh_samples: dict[str, list[float]] = {n: [] for n in BENCH_QUERIES}
    for _ in range(3):
        for name, (fn, how) in BENCH_QUERIES.items():
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            _run(fn(tabs), how)
            fresh_samples[name].append(time.perf_counter() - t0)
    # Decomposition of the fresh-vs-steady gap: time ONLY plan
    # construction + analysis + optimization + physical planning (no
    # execution, no codegen) — a fixed per-query Catalyst cost invariant
    # in data size. fresh ~= compile + codegen/job-setup + steady; at
    # 100 TB the data term dominates and this fixed term vanishes.
    compile_samples: dict[str, list[float]] = {n: [] for n in BENCH_QUERIES}
    for _ in range(5):
        for name, (fn, how) in BENCH_QUERIES.items():
            t0 = time.perf_counter()
            fn(tabs)._jdf.queryExecution().executedPlan()
            compile_samples[name].append(time.perf_counter() - t0)
    timings = {n: round(statistics.median(s), 4) for n, s in steady_samples.items()}
    dlayer = {n: round(statistics.median(s), 4) for n, s in dlayer_samples.items()}
    fresh = {n: round(statistics.median(s), 4) for n, s in fresh_samples.items()}
    compile_t = {
        n: round(statistics.median(s), 4) for n, s in compile_samples.items()
    }
    duck = {n: round(statistics.median(s), 4) for n, s in duck_samples.items()}
    duck_d = {
        n: round(statistics.median(s), 4) for n, s in duck_dlayer_samples.items()
    }
    total = round(sum(timings.values()), 4)
    duck_total = round(sum(duck.values()), 4)
    ratio = lambda a, b: round(a / b, 3) if b > 0 else None  # noqa: E731
    line = json.dumps(
        {
            "metric": "headline query wall sec (steady, median of 9 interleaved)",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "fresh_queries": fresh,
            "fresh_total": round(sum(fresh.values()), 4),
            "compile_total": round(sum(compile_t.values()), 4),
            "duckdb_measured": duck,
            "duckdb_measured_total": duck_total,
            "ratio_measured": ratio(total, duck_total),
            "ratio_measured_queries": {
                n: ratio(timings[n], duck[n]) for n in timings
            },
            "dlayer_queries": dlayer,
            "dlayer_baselines_measured": duck_d,
            "dlayer_ratio_measured": {
                n: ratio(dlayer[n], duck_d[n]) for n in dlayer
            },
            "sf": SF_DIR,
            "notes": "DuckDB refs measured live, interleaved, same process/files; methodology + frozen 2026-08-13 constants: OPERATORS_BENCH.md 'Bench methodology'.",
        }
    )
    # The round driver parses this line out of the LAST ~2000 chars of
    # stdout; a longer line loses its opening brace and parses as null
    # (this is exactly what voided BENCH_r07). Hard-gate the length.
    assert len(line) < 1600, f"bench JSON line too long ({len(line)} chars)"
    print(line)


if __name__ == "__main__":
    main()
