#!/usr/bin/env python
"""Round-12 continuation query walls at sf0.1 (median of 2 warm runs,
full collect), with the DuckDB oracle wall where the oracle does
comparable WORK (streaming-lifecycle queries and literal-table oracles
are marked — correctness devices, not engine races).

Run: ``python tools/r12b_walls.py``
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

QUERIES = [
    # (name, oracle_comparable)
    ("d58_robust_outliers", True),
    ("e17_ewma_control", True),
    ("d59_kmeans_clusters", True),
    ("d60_char_entropy", True),
    ("d61_label_propagation", True),
    ("c28_stream_kmeans_profile_maintenance", False),  # streaming lifecycle
    ("d62_zipf_fit", True),
    ("d63_containment_pairs", False),  # literal pair table
    ("c29_stream_zipf_maintenance", False),  # streaming lifecycle
    ("d05g_mp3_frame_parse", False),  # construction-truth oracle
    ("a35_clone_shallow", False),  # in-query store writes both sides differ
    ("d64_source_kl", True),
    ("e18_markov_attribution", True),
    ("d65_quality_ecdf", True),
    ("a36_incremental_view_maintenance", False),  # in-query store writes
    ("d05h_webp_dimensions", False),  # construction-truth oracle
    ("e19_retention_decay", True),
    ("d66_cluster_top_terms", True),
    ("e20_transition_entropy", True),
    ("c30_stream_outer_interval_join", False),  # streaming lifecycle
    ("c31_stream_transition_maintenance", False),  # streaming lifecycle
]


def main():
    import duckdb

    from basis_devkit_spark import get_spark
    from basis_devkit_spark.queries import all_queries

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"create view {t} as select * from '{SF}/{t}.parquet'"
        )
    out = []
    for name, comparable in QUERIES:
        q = qs[name]
        walls = []
        rows = 0
        for _ in range(3):  # first run warms; keep the last two
            t0 = time.time()
            rows = len(q.spark(spark, SF).collect())
            walls.append(time.time() - t0)
        sw = statistics.median(walls[1:])
        dw = None
        if comparable and q.oracle is not None:
            dwalls = []
            for _ in range(3):
                t0 = time.time()
                con.execute(q.oracle_text()).fetchall()
                dwalls.append(time.time() - t0)
            dw = statistics.median(dwalls[1:])
        out.append(
            {
                "query": name,
                "rows": rows,
                "spark_s": round(sw, 2),
                "duckdb_s": None if dw is None else round(dw, 2),
            }
        )
        print(json.dumps(out[-1]))
    print(json.dumps({"sf": SF, "walls": out}))


if __name__ == "__main__":
    main()
