#!/usr/bin/env python
"""Round-14 OPTIMIZATION: wall time for EVERY registry query at sf0.1.

Methodology: each query runs twice — run 1 warms (plan compile, codegen,
JIT, file listing), run 2 is the reported wall. Queries whose warm run
exceeds SLOW_S report the warm wall itself (rough is fine for a ranking
pass; precise re-measurement happens per-optimization). Materializer is
full collect() — the registry queries return bounded result relations by
design, so collect is the honest result-transfer cost.

Output: JSONL, one line per query, then a final summary line. Intended
use: ``python tools/r14_all_walls.py > /tmp/r14_all_walls.jsonl``.
"""
from __future__ import annotations

import json
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = SF
SLOW_S = 20.0


def main():
    from basis_devkit_spark import get_spark
    from basis_devkit_spark.queries import all_queries

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    only = sys.argv[1:]  # optional name filter(s), prefix match
    out = []
    for name, q in qs.items():
        if only and not any(name.startswith(p) for p in only):
            continue
        spark.sparkContext.setJobDescription(f"walls:{name}")
        # queries that persist session-scoped caches without a release
        # path would otherwise accumulate across 333 queries and inflate
        # later measurements (memory pressure / GC) — isolate each row
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
        except Exception as e:  # keep ranking pass going
            rec = {"query": name, "error": f"{type(e).__name__}: {e}"}
            traceback.print_exc(file=sys.stderr)
        out.append(rec)
        print(json.dumps(rec), flush=True)
    total = sum(r.get("wall_s", 0) for r in out)
    errs = [r["query"] for r in out if "error" in r]
    print(json.dumps({"sf": SF, "n": len(out), "total_wall_s": round(total, 1),
                      "errors": errs}), flush=True)


if __name__ == "__main__":
    main()
