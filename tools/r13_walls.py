#!/usr/bin/env python
"""Round-13 query walls at sf0.1 (median of 2 warm runs, full collect),
with the DuckDB oracle wall where the oracle does comparable WORK
(literal-table oracles and streaming-lifecycle queries are marked —
those are correctness devices, not engine races).

Run: ``python tools/r13_walls.py``
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
    ("d65_quality_ecdf", True),
    ("d50_winsorize", True),
    ("d58_robust_outliers", True),
    ("e17_ewma_control", True),
    ("e18_markov_attribution", True),
    ("e21_periodicity_signals", True),
    ("d75_canonical_url", True),
    ("d76_paragraph_dedup", True),
    ("d77_encoding_signals", True),
    ("d78_script_profile", True),
    ("d79_matryoshka_truncation_recall", True),
    ("d80_snapshot_novelty", True),
    ("d81_group_split", False),      # literal assignment table
    ("d05i_ogg_opus_parse", False),  # construction-truth oracle
    ("c32_stream_calibration_maintenance", False),  # streaming lifecycle
    ("c33_stream_domain_profile_maintenance", False),
    ("c34_stream_novelty_gate", False),
    # r13 continuation batch
    ("e22_cusum_changepoints", True),
    ("d82_source_overlap_matrix", False),  # literal XXH64-model oracle
    ("d83_hard_negative_mine", True),
    ("c35_stream_cusum_maintenance", False),  # streaming lifecycle
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
