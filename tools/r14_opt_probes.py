#!/usr/bin/env python
"""Round-14 optimization probes: isolated breakdowns for the heavy
walls found by tools/r14_all_walls.py. Each probe labels its jobs and
prints stage-level timing so the wall decomposes into compile / stage
dispatch / data work (the d88 lesson: measure compile separately).

Usage: python tools/r14_opt_probes.py <probe> [args]
Probes: kcore_break, tri_break, walls <name...>
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = SF


def _spark():
    from basis_devkit_spark import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _edges(spark):
    from pyspark.sql import functions as F

    from basis_devkit_spark.queries import load

    l = load(spark, SF, "lineitem").select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    )
    a = l.alias("a")
    b = l.alias("b")
    return a.join(
        b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p"))
    ).select(F.col("a.p").alias("id_a"), F.col("b.p").alias("id_b"))


def kcore_break(spark):
    """Instrument kcore_decompose round-by-round via a monkeypatched
    localCheckpoint boundary: report edge count, round count, wall."""
    from basis_devkit_spark.operators.graphrank import (
        _canonical_edges,
        kcore_decompose,
    )

    e = _edges(spark)
    und = _canonical_edges(e, "id_a", "id_b")
    m = und.count()
    print(json.dumps({"edges": m}))
    t0 = time.time()
    out = kcore_decompose(_edges(spark))
    n = out.count()
    print(json.dumps({"kcore_wall_s": round(time.time() - t0, 2), "nodes": n}))


def tri_break(spark):
    """triangle_count stagewise: edge build+distinct, orientation,
    adjacency, intersection explode, final agg."""
    from pyspark.sql import functions as F

    from basis_devkit_spark.operators.graphrank import (
        _canonical_edges,
        _degrees,
        _per_node_triangles,
    )

    t0 = time.time()
    und = _canonical_edges(_edges(spark), "id_a", "id_b")
    m = und.count()
    t1 = time.time()
    deg = _degrees(und)
    deg.write.format("noop").mode("overwrite").save()
    t2 = time.time()
    tri = _per_node_triangles(und, deg)
    tri.write.format("noop").mode("overwrite").save()
    t3 = time.time()
    print(
        json.dumps(
            {
                "edges": m,
                "canon_s": round(t1 - t0, 2),
                "degrees_s": round(t2 - t1, 2),
                "triangles_s": round(t3 - t2, 2),
            }
        )
    )


def walls(spark, names):
    from basis_devkit_spark.queries import all_queries

    qs = all_queries()
    for name in names:
        q = qs[name]
        samples = []
        rows = 0
        for _ in range(3):
            t0 = time.time()
            rows = len(q.spark(spark, SF).collect())
            samples.append(round(time.time() - t0, 3))
        print(
            json.dumps(
                {
                    "query": name,
                    "rows": rows,
                    "walls": samples,
                    "median_warm": round(statistics.median(samples[1:]), 3),
                }
            )
        )


if __name__ == "__main__":
    probe = sys.argv[1]
    sp = _spark()
    if probe == "kcore_break":
        kcore_break(sp)
    elif probe == "tri_break":
        tri_break(sp)
    elif probe == "walls":
        walls(sp, sys.argv[2:])
    else:
        raise SystemExit(f"unknown probe {probe}")
