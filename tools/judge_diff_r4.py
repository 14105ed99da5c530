#!/usr/bin/env python
"""Judge adjudication: exact-value diff for the 6 driver hash-mismatch queries."""
from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = SF_DIR
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

NAMES = [
    "e05_conversion_latency",
    "e10_inter_event_gaps",
    "e13_experiment_readout",
    "e14_activity_concentration",
    "b78_numeric_profile",
    "b75_tpch_q3_bench_flagship",
]


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("judge-diff")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    import __spark_entry__ as entry

    qs = entry.queries()
    oracles = entry.oracle_sql()
    for name in NAMES:
        sdf = qs[name](spark, SF_DIR).toPandas()
        odf = con.execute(oracles[name]).fetchdf()
        sdf = sdf.reindex(sorted(sdf.columns), axis=1)
        odf = odf.reindex(sorted(odf.columns), axis=1)
        key = list(sdf.columns)
        sdf = sdf.sort_values(key, key=lambda s: s.astype(str)).reset_index(drop=True)
        odf = odf.sort_values(key, key=lambda s: s.astype(str)).reset_index(drop=True)
        print(f"===== {name} =====")
        print("spark dtypes:", dict(sdf.dtypes.astype(str)))
        print("oracle dtypes:", dict(odf.dtypes.astype(str)))
        ncell = 0
        for col in sdf.columns:
            a = sdf[col].astype(str).values
            b = odf[col].astype(str).values
            for i, (x, y) in enumerate(zip(a, b)):
                if x != y:
                    ncell += 1
                    if ncell <= 8:
                        print(f"  DIFF col={col} row={i}: spark={x!r} oracle={y!r}")
        if ncell == 0:
            print("  exact string match on all cells (after sort)")
        else:
            print(f"  total differing cells: {ncell}")
    spark.stop()


if __name__ == "__main__":
    main()
