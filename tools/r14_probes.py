#!/usr/bin/env python
"""Round-14 scale probes (VERDICT r13 tasks #1 and #4).

``events_scale``: re-pin the events_sess dispatch-floor claim with a
CURRENT measured table. events_sess at sf0.1 is ~3.2× live DuckDB on
~40 ms of work — the r9 analysis said the gap is Spark's fixed
job-dispatch floor and inverts as data grows. This probe times the
bench events_sess query and its DuckDB twin on the SAME data at 1×
and 10× events (10× = per-replica-shifted user/event ids, the r9
builder), records both walls, and where the ratio crosses 1.

``kn_scale``: d88 after the r14 consolidation pays a ~1 s constant
Catalyst-compile term plus a data term with exactly 2 corpus-touching
exchanges (was 6). At sf0.1 that makes it 1.97 s vs DuckDB 0.42 s;
this probe shows the same query at 10× documents, where the constant
amortizes and the per-byte cost decides.

Run: ``python tools/r14_probes.py [events_scale|kn_scale]``
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
SCALE_DIR = os.environ.get(
    "SPARK_GRAFT_SCALE_DIR", "/tmp/spark_graft_r14_scale"
)


def _spark():
    from basis_devkit_spark import get_spark

    s = get_spark(app_name="r14-scale-probes")
    s.sparkContext.setLogLevel("ERROR")
    return s


def _scaled_events(spark, replicas: int) -> str:
    from pyspark.sql import functions as F

    dst = os.path.join(f"{SCALE_DIR}_ev_x{replicas}", "events.parquet")
    if os.path.exists(os.path.join(dst, "_SUCCESS")):
        return dst
    e = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    rep = spark.range(replicas).select(F.col("id").alias("__rep"))
    big = e.crossJoin(rep).select(
        (F.col("user_id") + F.col("__rep") * 1_000_000).alias("user_id"),
        (F.col("event_id") + F.col("__rep") * 100_000_000).alias(
            "event_id"
        ),
        "ts",
        "event_type",
        "value",
    )
    big.repartition(16).write.mode("overwrite").parquet(dst)
    return dst


def _scaled_documents(spark, replicas: int) -> str:
    from pyspark.sql import functions as F

    dst = os.path.join(f"{SCALE_DIR}_doc_x{replicas}", "documents.parquet")
    if os.path.exists(os.path.join(dst, "_SUCCESS")):
        return dst
    d = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    rep = spark.range(replicas).select(F.col("id").alias("__rep"))
    big = d.crossJoin(rep).select(
        (F.col("doc_id") + F.col("__rep") * 10_000_000).alias("doc_id"),
        *[c for c in d.columns if c != "doc_id"],
    )
    big.repartition(16).write.mode("overwrite").parquet(dst)
    return dst


def _walls(fn, warm: int, timed: int) -> list[float]:
    for _ in range(warm):
        fn()
    out = []
    for _ in range(timed):
        t0 = time.perf_counter()
        fn()
        out.append(time.perf_counter() - t0)
    return out


def events_scale() -> dict:
    import duckdb

    import bench

    spark = _spark()
    # bench.py main's own session tuning (same methodology as the r9
    # probe and the headline bench — this is the configuration the
    # floor claim is ABOUT)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    spark.conf.set("spark.sql.parquet.columnarReaderBatchSize", "16384")
    spark.conf.set(
        "spark.sql.codegen.aggregate.map.vectorized.enable", "true"
    )
    results = []
    for replicas in (1, 10, 100):
        dst = (
            os.path.join(SF_DIR, "events.parquet")
            if replicas == 1
            else _scaled_events(spark, replicas)
        )
        tabs = {"events": spark.read.parquet(dst)}
        n_rows = tabs["events"].count()
        con = duckdb.connect()
        con.execute(f"SET threads = {os.cpu_count() or 32}")
        glob = (
            f"{dst}/*.parquet" if os.path.isdir(dst) else dst
        )
        con.execute(
            f"create view events as select * from read_parquet('{glob}')"
        )
        duck_sql = bench.DUCK_HEADLINE_SQL["events_sess"]
        df = bench.events_sess(tabs)
        # steady state needs deep C2-JIT warmup on this query (r9
        # measured ~20+ runs to flatten)
        warm = 25
        sp = statistics.median(
            _walls(lambda: bench._run(df, "pandas"), warm, 7)
        )
        du = statistics.median(
            _walls(lambda: con.execute(duck_sql).fetchall(), 3, 7)
        )
        results.append(
            {
                "replicas": replicas,
                "rows": n_rows,
                "spark_ms": round(sp * 1000, 1),
                "duckdb_ms": round(du * 1000, 1),
                "ratio": round(sp / du, 2),
            }
        )
        print(json.dumps(results[-1]), flush=True)
    out = {
        "probe": "events_scale",
        "results": results,
        "crossover": next(
            (
                f"ratio < 1 at {r['rows']} rows"
                for r in results
                if r["ratio"] < 1
            ),
            f"ratio {results[0]['ratio']} -> {results[-1]['ratio']}",
        ),
    }
    print(json.dumps(out))
    return out


def _old_kn(spark, sf: str):
    """The r13 five-join d88 shape, verbatim (reference for the
    consolidation comparison — five corpus-stream joins, hierarchical
    fit aggs)."""
    from pyspark.sql import functions as F

    d = spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id", "text"
    )
    train = d.filter(F.col("doc_id") % 5 == 0)
    toks = lambda dd: F.split(
        F.lower(F.coalesce(F.col("text"), F.lit(""))), " "
    )

    def trigrams(dd, with_id):
        base = dd.select(
            *(["doc_id"] if with_id else []), toks(dd).alias("__ws")
        ).filter(F.size("__ws") >= 3)
        tg = F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("__ws") - 3),
                lambda i: F.struct(
                    F.col("__ws")[i].alias("w1"),
                    F.col("__ws")[i + 1].alias("w2"),
                    F.col("__ws")[i + 2].alias("w3"),
                ),
            )
        ).alias("__t")
        idc = ["doc_id"] if with_id else []
        return base.select(*idc, tg).select(
            *idc, "__t.w1", "__t.w2", "__t.w3"
        )

    tri = trigrams(train, False).groupBy("w1", "w2", "w3").agg(
        F.count(F.lit(1)).alias("__c3")
    )
    c2ctx = tri.groupBy("w1", "w2").agg(
        F.sum("__c3").alias("__c2"), F.count(F.lit(1)).alias("__n3f")
    )
    mid = tri.groupBy("w2", "w3").agg(F.count(F.lit(1)).alias("__n1p"))
    midctx = mid.groupBy("w2").agg(
        F.sum("__n1p").alias("__nmc"), F.count(F.lit(1)).alias("__nmf")
    )
    cont = mid.groupBy("w3").agg(F.count(F.lit(1)).alias("__nct"))
    btypes = mid.agg(F.count(F.lit(1)).alias("__bt"))
    sg = (
        trigrams(d, True)
        .join(tri, ["w1", "w2", "w3"], "left")
        .join(c2ctx, ["w1", "w2"], "left")
        .join(mid, ["w2", "w3"], "left")
        .join(midctx, ["w2"], "left")
        .join(cont, ["w3"], "left")
        .crossJoin(F.broadcast(btypes))
    )
    dd2 = lambda c: F.coalesce(F.col(c), F.lit(0)).cast("double")
    dl = F.lit(0.75)
    pcont = dd2("__nct") / F.col("__bt").cast("double")
    pkn2 = F.when(
        dd2("__nmc") > 0,
        F.greatest(dd2("__n1p") - dl, F.lit(0.0)) / dd2("__nmc")
        + ((dl * dd2("__nmf")) / dd2("__nmc")) * pcont,
    ).otherwise(pcont)
    pkn3 = F.when(
        dd2("__c2") > 0,
        F.greatest(dd2("__c3") - dl, F.lit(0.0)) / dd2("__c2")
        + ((dl * dd2("__n3f")) / dd2("__c2")) * pkn2,
    ).otherwise(pkn2)
    p = F.greatest(pkn3, F.lit(1e-10))
    scored = sg.select(
        "doc_id",
        F.floor(F.log(p) * F.lit(1e9)).cast("long").alias("__lp"),
    )
    agg = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_trigrams"),
        F.sum("__lp").alias("__slp"),
    )
    return agg.select(
        "doc_id",
        "n_trigrams",
        F.round(
            F.col("__slp").cast("double") / F.col("n_trigrams") / 1e9, 6
        ).alias("lm_score"),
    )


def _run_shuffle_bytes(spark, fn) -> tuple[int, int]:
    """(write, read) shuffle bytes of the stages a run creates, via
    the UI REST API (the py4j statusStore needs Scala default args)."""
    import json as _json
    import urllib.request

    base = (
        f"{spark.sparkContext.uiWebUrl}/api/v1/applications/"
        f"{spark.sparkContext.applicationId}/stages"
    )

    def stages():
        return {
            s["stageId"]: s
            for s in _json.load(urllib.request.urlopen(base))
        }

    before = set(stages())
    fn()
    after = stages()
    new = [s for sid, s in after.items() if sid not in before]
    return (
        sum(s.get("shuffleWriteBytes", 0) for s in new),
        sum(s.get("shuffleReadBytes", 0) for s in new),
    )


def kn_shuffle() -> dict:
    """Shuffle-byte comparison old vs shipped at 10× documents with
    broadcast DISABLED (the 100 TB regime proxy: count tables too big
    to broadcast). Walls converge at toy scale — bytes moved through
    the shuffle are the scale currency the consolidation bought."""
    from basis_devkit_spark.queries import all_queries

    spark = _spark()
    dst = _scaled_documents(spark, 10)
    sf = os.path.dirname(dst)
    q = all_queries()["d88_kn_trigram_lm"]
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        q.spark(spark, sf).collect()  # warm
        w_new, r_new = _run_shuffle_bytes(
            spark, lambda: q.spark(spark, sf).collect()
        )
        _old_kn(spark, sf).collect()  # warm
        w_old, r_old = _run_shuffle_bytes(
            spark, lambda: _old_kn(spark, sf).collect()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    out = {
        "probe": "kn_shuffle_x10_bc_off",
        "shipped_shuffle_write_mb": round(w_new / 1e6, 1),
        "old_shuffle_write_mb": round(w_old / 1e6, 1),
        "shipped_shuffle_read_mb": round(r_new / 1e6, 1),
        "old_shuffle_read_mb": round(r_old / 1e6, 1),
        "write_ratio_old_over_new": round(w_old / max(w_new, 1), 2),
    }
    print(json.dumps(out))
    return out


def kn_scale() -> dict:
    import duckdb

    from basis_devkit_spark.queries import all_queries

    spark = _spark()
    q = all_queries()["d88_kn_trigram_lm"]
    results = []
    for replicas in (1, 10):
        if replicas == 1:
            sf, glob = SF_DIR, f"{SF_DIR}/documents.parquet"
        else:
            dst = _scaled_documents(spark, replicas)
            sf = os.path.dirname(dst)
            glob = f"{dst}/*.parquet"
        # the registry query loads {sf}/documents.parquet
        con = duckdb.connect()
        con.execute(f"SET threads = {os.cpu_count() or 32}")
        con.execute(
            "create view documents as select * from "
            f"read_parquet('{glob}')"
        )
        sp = statistics.median(
            _walls(lambda: q.spark(spark, sf).collect(), 2, 3)
        )
        du = statistics.median(
            _walls(lambda: con.execute(q.oracle_text()).fetchall(), 2, 3)
        )
        results.append(
            {
                "replicas": replicas,
                "spark_s": round(sp, 2),
                "duckdb_s": round(du, 2),
                "ratio": round(sp / du, 2),
            }
        )
        print(json.dumps(results[-1]), flush=True)
    out = {"probe": "kn_scale", "results": results}
    print(json.dumps(out))
    return out


def kcore_rounds(n_edges: int = 1_000_000) -> dict:
    """Instrumented d92 k-core rounds on the r13 power-law generator:
    per-round frontier size and wall, proving (a) the frontier shrinks
    geometrically (the active-set claim) and (b) per-round wall is
    dispatch-floor-bound at toy scale — rounds are a property of the
    GRAPH (h-index cascade length), not the implementation."""
    import time as _t

    from pyspark.sql import functions as F

    from basis_devkit_spark.operators.graphrank import (
        _canonical_edges,
    )
    from basis_devkit_spark.operators.lineage import release_plan_blocks
    from tools.r13_probes import _edges_df

    spark = _spark()
    edges = _edges_df(spark, n_edges, n_nodes=max(n_edges // 10, 1000))
    und = _canonical_edges(edges, "id_a", "id_b")
    sym = und.select(
        F.col("a").alias("s"), F.col("b").alias("d")
    ).unionAll(und.select(F.col("b").alias("s"), F.col("a").alias("d")))
    cores = (
        sym.groupBy(F.col("s").alias("node"))
        .agg(F.count(F.lit(1)).cast("long").alias("__c"))
        .localCheckpoint(eager=True)
    )
    active = cores.select("node")
    prev = cores
    rounds = []
    for it in range(100):
        t0 = _t.time()
        affected = sym.join(
            active.select(F.col("node").alias("d")), "d", "semi"
        ).select(F.col("s").alias("node"))
        nb = (
            sym.join(
                affected.select(F.col("node").alias("s")), "s", "semi"
            )
            .join(cores.select(F.col("node").alias("d"), "__c"), "d")
            .select(F.col("s").alias("node"), F.col("__c").alias("__nc"))
        )
        hist = nb.groupBy("node", "__nc").agg(
            F.count(F.lit(1)).cast("long").alias("__k")
        )
        folded = hist.groupBy("node").agg(
            F.aggregate(
                F.reverse(F.array_sort(F.collect_list(
                    F.struct(F.col("__nc").alias("c"),
                             F.col("__k").alias("k"))))),
                F.struct(F.lit(0).cast("long").alias("cum"),
                         F.lit(0).cast("long").alias("h")),
                lambda acc, e: F.struct(
                    (acc["cum"] + e["k"]).alias("cum"),
                    F.greatest(acc["h"],
                               F.least(e["c"], acc["cum"] + e["k"])
                               ).alias("h"),
                ),
            )["h"].alias("__h")
        )
        nxt = cores.join(folded, "node", "left").select(
            "node",
            F.coalesce("__h", "__c").alias("__c"),
            F.col("__c").alias("__old"),
        )
        ck = nxt.localCheckpoint(eager=True)
        changed_nodes = ck.filter(F.col("__c") != F.col("__old"))
        changed = changed_nodes.count()
        cores = ck.select("node", "__c")
        active = changed_nodes.select("node")
        release_plan_blocks(prev)
        prev = ck
        rounds.append(
            {"round": it + 1, "frontier": changed,
             "wall_s": round(_t.time() - t0, 2)}
        )
        if changed == 0:
            break
    out = {
        "probe": f"kcore_rounds_{n_edges}",
        "n_rounds": len(rounds),
        "total_s": round(sum(r["wall_s"] for r in rounds), 1),
        "frontiers": [r["frontier"] for r in rounds],
        "median_round_s": sorted(r["wall_s"] for r in rounds)[
            len(rounds) // 2
        ],
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("events_scale", "all"):
        events_scale()
    if which in ("kn_scale", "all"):
        kn_scale()
    if which in ("kn_shuffle", "all"):
        kn_shuffle()
    if which == "kcore_rounds":
        import sys as _s
        kcore_rounds(int(_s.argv[2]) if len(_s.argv) > 2 else 1_000_000)
