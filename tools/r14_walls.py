#!/usr/bin/env python
"""Round-14 query walls at sf0.1 (median of 2 warm runs, full collect),
with the DuckDB oracle wall where the oracle does comparable WORK
(literal-table oracles and streaming-lifecycle queries are marked —
those are correctness devices, not engine races).

Run: ``python tools/r14_walls.py``
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
    ("d88_kn_trigram_lm", True),          # r14 consolidation re-wall
    ("e25_poisson_bootstrap_ratio_ci", True),
    ("e26_msprt_always_valid", True),
    ("e27_power_mde_readout", True),
    ("d48_registrable_domain", True),     # full-PSL re-wall
    ("d48b_domain_cap", True),
    ("d57_domain_profile", True),
    ("d89_unigram_lm_fit", False),        # literal Python-model oracle
    ("d90_unigram_fertility", False),     # literal Python-model oracle
    ("d92_kcore_decomposition", False),   # literal Python-model oracle
    ("d05j_exif_tiff_parse", False),      # construction-truth oracle
    ("c37_stream_kn_counts_maintenance", False),  # streaming lifecycle
    ("c38_stream_unigram_fit_maintenance", False),  # streaming lifecycle
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
