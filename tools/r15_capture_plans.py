#!/usr/bin/env python
"""Capture .explain("formatted") output for named registry queries into
plans/r15/<query>_<tag>.txt (the round-15 optimization deliverable).

Usage: python tools/r15_capture_plans.py <before|after> name [name ...]

Queries are BUILT at $SPARK_GRAFT_SF_DIR (default sf0.1). Note that for
queries whose construction runs jobs (iterative operators, streaming
fixtures), building the frame executes those jobs; the captured plan of
a checkpoint-returning query is the post-checkpoint scan — the per-round
inner plans are captured separately via the operators' plan tap
(tools/r15_round_plans.py).
"""
from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from r14_capture_plans import formatted  # noqa: E402  (shared helper)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = SF
OUT = os.path.join(REPO, "plans", "r15")


def main():
    tag = sys.argv[1]
    names = sys.argv[2:]
    from basis_devkit_spark import get_spark
    from basis_devkit_spark.queries import all_queries

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    os.makedirs(OUT, exist_ok=True)
    for name in names:
        df = qs[name].spark(spark, SF)
        path = os.path.join(OUT, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(formatted(df))
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
