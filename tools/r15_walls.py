#!/usr/bin/env python
"""Round-15 walls: wall time for registry queries at sf0.1 (r14_all_walls
methodology — warm run + timed run, full collect) but with the slow-query
cutoff configurable so expensive iterative queries still get a STEADY
(second-run) wall: ``SPARK_GRAFT_SLOW_S`` (default 600 = always re-run).

Usage: python tools/r15_walls.py [prefix ...] > out.jsonl
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = SF
SLOW_S = float(os.environ.get("SPARK_GRAFT_SLOW_S", "600"))


def main():
    from basis_devkit_spark import get_spark
    from basis_devkit_spark.queries import all_queries

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    only = sys.argv[1:]
    out = []
    for name, q in qs.items():
        if only and not any(name.startswith(p) for p in only):
            continue
        spark.sparkContext.setJobDescription(f"walls:{name}")
        spark.catalog.clearCache()
        try:
            t0 = time.time()
            rows = len(q.spark(spark, SF).collect())
            warm = time.time() - t0
            if warm > SLOW_S:
                wall = warm
            else:
                t0 = time.time()
                rows = len(q.spark(spark, SF).collect())
                wall = time.time() - t0
            rec = {"query": name, "rows": rows, "warm_s": round(warm, 3),
                   "wall_s": round(wall, 3)}
        except Exception as e:
            rec = {"query": name, "error": f"{type(e).__name__}: {e}"}
        out.append(rec)
        print(json.dumps(rec), flush=True)
    total = sum(r.get("wall_s", 0.0) for r in out)
    print(json.dumps({"sf": SF, "n": len(out),
                      "total_wall_s": round(total, 1),
                      "errors": [r["query"] for r in out if "error" in r]}))


if __name__ == "__main__":
    main()
