#!/usr/bin/env python
"""Round-12 query walls at sf0.1 (median of 2 warm runs, full collect),
with the DuckDB oracle wall where the oracle does comparable WORK
(literal-table oracles and streaming-lifecycle queries are marked —
those are correctness devices, not engine races).

Run: ``python tools/r12_walls.py``
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
    ("d48_registrable_domain", True),
    ("d48b_domain_cap", True),
    ("d48c_url_features", True),
    ("d02k_minhash_quality_keeper", False),  # literal pair table
    ("a33_stats_drift", True),
    ("a34_expectations", True),
    ("c26_stream_domain_cap_maintenance", False),  # streaming lifecycle
    ("e16_touch_attribution", True),
    ("d05f_mp4_ftyp_parse", False),  # construction-truth oracle
    ("d49_graph_triangles", True),
    ("d49b_clustering_coefficient", True),
    ("d50_winsorize", True),
    ("d51_calibration_bins", False),  # literal score table
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
