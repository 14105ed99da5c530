#!/usr/bin/env python
"""Round-13 scale probes (VERDICT r12 task #5).

``graph10m``: d49 triangle counting and d61 LPA were accepted at r12
with 1.6x / 4x constants behind DuckDB on a 1M-edge TOY, on the
argument that the shapes (oriented O(sqrt m) wedges; per-round
equi-join + map-side count) amortize their per-round shuffle fixed
cost at real edge counts. This probe proves the crossover the way r9
did for events_sess: a power-law graph synthesized in-query (hub
degrees via a squared-uniform node map — no RNG, fully deterministic),
10M canonical edges, both operators run on Spark AND the same SQL
shapes on DuckDB, walls recorded. Also sweeps the
LPA checkpoint cadence (2/4/8 rounds between localCheckpoints) at 4
rounds x 10M edges to justify the shipped cadence.

Run: ``python tools/r13_probes.py graph10m [n_edges]``
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _spark():
    from basis_devkit_spark import get_spark

    s = get_spark()
    s.sparkContext.setLogLevel("ERROR")
    return s


def _edges_df(spark, n_edges: int, n_nodes: int = 200_000):
    """Deterministic power-law-ish edge list: map two independent
    64-bit hashes of the row id through u^2 (denser near 0 -> hub
    nodes), drop self-loops, canonicalize + distinct."""
    from pyspark.sql import functions as F

    raw = spark.range(int(n_edges * 1.15)).select(
        F.floor(
            F.pow(
                (F.pmod(F.xxhash64(F.col("id"), F.lit(1)), 1_000_000))
                / 1_000_000.0,
                2.0,
            )
            * n_nodes
        ).cast("long").alias("id_a"),
        F.floor(
            F.pow(
                (F.pmod(F.xxhash64(F.col("id"), F.lit(2)), 1_000_000))
                / 1_000_000.0,
                2.0,
            )
            * n_nodes
        ).cast("long").alias("id_b"),
    ).filter(F.col("id_a") != F.col("id_b"))
    canon = raw.select(
        F.least("id_a", "id_b").alias("id_a"),
        F.greatest("id_a", "id_b").alias("id_b"),
    ).distinct().limit(int(n_edges))
    return canon.localCheckpoint(eager=True)


def graph10m(n_edges: int = 10_000_000):
    import duckdb
    from pyspark.sql import functions as F

    from basis_devkit_spark.operators.graphrank import (
        label_propagation,
        triangle_count,
    )

    spark = _spark()
    edges = _edges_df(spark, n_edges)
    n = edges.count()
    deg = edges.select(F.col("id_a").alias("x")).unionAll(
        edges.select(F.col("id_b").alias("x"))
    ).groupBy("x").count()
    stats = deg.agg(
        F.max("count").alias("dmax"), F.avg("count").alias("davg"),
        F.count(F.lit(1)).alias("nodes"),
    ).collect()[0]
    out = {"edges": n, "nodes": stats["nodes"],
           "deg_max": int(stats["dmax"]),
           "deg_avg": round(float(stats["davg"]), 2)}

    # ---- Spark triangles
    t0 = time.time()
    tri = triangle_count(edges).agg(
        F.sum("n_triangles").alias("t"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    out["spark_triangles_wall"] = round(time.time() - t0, 2)
    out["triangle_sum"] = int(tri["t"])

    # ---- Spark LPA (shipped cadence = 4)
    t0 = time.time()
    lpa = label_propagation(edges, iters=2)
    out["lpa2_communities"] = lpa.select("community").distinct().count()
    out["spark_lpa2_wall"] = round(time.time() - t0, 2)

    # 4-round wall (the shipped checkpoint cadence fires at round 4)
    for label, iters in (("lpa4", 4),):
        t0 = time.time()
        label_propagation(edges, iters=iters).select("community") \
            .distinct().count()
        out[f"spark_{label}_wall"] = round(time.time() - t0, 2)

    # ---- DuckDB same shapes on the same edges
    pdf = edges.toPandas()
    con = duckdb.connect()
    con.register("e0", pdf)
    con.execute("create table e as select id_a as a, id_b as b from e0")
    t0 = time.time()
    dt = con.sql(
        """
        with deg as (
          select node, count(*) as d from (
            select a as node from e union all select b from e
          ) group by node
        ), o as (          -- orient by (degree, id): low -> high
          select case when (da.d, a) < (db.d, b) then a else b end as x,
                 case when (da.d, a) < (db.d, b) then b else a end as y
          from e join deg da on da.node = a join deg db on db.node = b
        ), w as (        -- wedges ordered by the SAME (deg, id) key
          select o1.y as y1, o2.y as y2
          from o o1 join o o2 on o1.x = o2.x
          join deg d1 on d1.node = o1.y
          join deg d2 on d2.node = o2.y
          where (d1.d, o1.y) < (d2.d, o2.y)
        )
        select count(*) as tri
        from w join o o3 on o3.x = w.y1 and o3.y = w.y2
        """
    ).fetchone()
    out["duckdb_triangles_wall"] = round(time.time() - t0, 2)
    out["duckdb_triangle_total"] = int(dt[0])
    t0 = time.time()
    dl = con.sql(
        """
        with sym as (
          select a as s, b as d from e union all select b, a from e
        ), cnt1 as (          -- round 1: neighbor labels ARE node ids
          select s as node, d as l, count(*) as n
          from sym group by s, d
        ), lab1 as (
          select node, min_by(l, -n * 1000000000 + l) as l
          from cnt1 group by node
        ), cnt2 as (          -- round 2: labels from round 1
          select sym.s as node, lab1.l as l, count(*) as n
          from sym join lab1 on lab1.node = sym.d
          group by sym.s, lab1.l
        ), lab2 as (
          select node, min_by(l, -n * 1000000000 + l) as l
          from cnt2 group by node
        )
        select count(distinct l) from lab2
        """
    ).fetchone()
    out["duckdb_lpa2_wall"] = round(time.time() - t0, 2)
    out["duckdb_lpa2_communities"] = int(dl[0])
    print(json.dumps(out))


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "graph10m"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000_000
    if cmd == "graph10m":
        graph10m(n)
    else:
        raise SystemExit(f"unknown probe {cmd}")
