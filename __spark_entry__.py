"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes the declared operator inventory from SURVEY.md §2
(implemented in ``basis_devkit_spark.queries``); ``oracle_sql()`` exposes
the DuckDB-equivalent SQL for each hash-checked entry. Keys without an
oracle are genuinely non-SQL-expressible ops (LSH internals, composite
heuristics, binary plumbing) and get rows-only checks.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q1-style rollup."""
    from basis_devkit_spark.queries import all_queries

    return all_queries()["b20_groupby_agg"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from basis_devkit_spark.queries import all_queries

    return {name: q.spark for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    from basis_devkit_spark.queries import all_queries

    return {
        name: q.oracle_text()
        for name, q in all_queries().items()
        if q.oracle is not None
    }
