#!/usr/bin/env python
"""Capture per-round INNER physical plans of the iterative graph
operators (pagerank, kcore) into plans/r15/ — the declared queries
return checkpoint scans, so the interesting plans are transient and are
captured via the operators' plan tap (graphrank._ROUND_PLAN_TAP).

Usage: python tools/r15_round_plans.py <tag> <d28|d92|d86> [round_index]

Writes plans/r15/<query>_round_inner_<tag>.txt containing the plan of
round ``round_index`` (default: first round) plus the LAST tapped round
(tail shape), labelled.
"""
from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = SF
OUT = os.path.join(REPO, "plans", "r15")

NAMES = {
    "d28": "d28_pagerank_fixed_point",
    "d92": "d92_kcore_decomposition",
    "d86": "d86_textrank_keywords",
}


def main():
    tag, key = sys.argv[1], sys.argv[2]
    idx = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    from basis_devkit_spark import get_spark
    from basis_devkit_spark.operators import graphrank
    from basis_devkit_spark.queries import all_queries

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    tap: list[tuple[str, str]] = []
    graphrank._ROUND_PLAN_TAP = tap
    try:
        all_queries()[NAMES[key]].spark(spark, SF).collect()
    finally:
        graphrank._ROUND_PLAN_TAP = None
    os.makedirs(OUT, exist_ok=True)
    path = os.path.join(OUT, f"{NAMES[key]}_round_inner_{tag}.txt")
    picks = [tap[idx]] if idx < len(tap) else []
    if len(tap) > 1 and tap[-1] is not (picks[0] if picks else None):
        picks.append(tap[-1])
    with open(path, "w") as f:
        f.write(f"# {len(tap)} rounds tapped; showing round {idx} and last\n")
        for label, txt in picks:
            f.write(f"\n## {label}\n{txt}\n")
    print(f"wrote {path} ({len(tap)} rounds tapped)")


if __name__ == "__main__":
    main()
