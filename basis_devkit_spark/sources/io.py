"""File sources/sinks (SURVEY §2.B B1-B6): thin, option-forwarding wrappers
over Spark's readers/writers, plus the row-oriented in-memory source the
node SDK exchanges (`list[dict]` records, node.py:142-154).

Scale notes baked in:
- CSV/JSON schema inference triggers an extra pass over the data — callers
  at scale should pass an explicit ``schema``; we surface the parameter
  prominently rather than hiding inference.
- Writers accept ``partition_by`` so big tables land partitioned (partition
  pruning downstream) and ``max_records_per_file`` to bound file sizes.
"""

from __future__ import annotations

from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_parquet(spark: SparkSession, path: str, **options: Any) -> DataFrame:
    return spark.read.options(**options).parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    header: bool = True,
    infer_schema: bool = True,
    **options: Any,
) -> DataFrame:
    reader = spark.read.options(header=header, **options)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", infer_schema)
    return reader.csv(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    multiline: bool = False,
    **options: Any,
) -> DataFrame:
    """JSON-lines by default; ``multiline=True`` for one-document files."""
    reader = spark.read.options(multiLine=multiline, **options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_jsonl(spark: SparkSession, path: str, **kw: Any) -> DataFrame:
    return read_json(spark, path, multiline=False, **kw)


def read_records(
    spark: SparkSession,
    records: list[dict[str, Any]] | dict[str, Any],
    schema: T.StructType | str | None = None,
) -> DataFrame:
    """In-memory records source (B3) — the node SDK's row-oriented ingress."""
    if isinstance(records, dict):
        records = [records]
    if schema is not None:
        return spark.createDataFrame(records, schema)
    return spark.createDataFrame(pd.DataFrame.from_records(records))


def _writer(
    df: DataFrame,
    mode: str,
    partition_by: list[str] | None,
    max_records_per_file: int | None,
):
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    return w


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
    compression: str = "snappy",
) -> None:
    _writer(df, mode, partition_by, max_records_per_file).option(
        "compression", compression
    ).parquet(path)


def write_csv(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    header: bool = True,
    partition_by: list[str] | None = None,
    **options: Any,
) -> None:
    _writer(df, mode, partition_by, None).options(header=header, **options).csv(path)


def write_json(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options: Any,
) -> None:
    _writer(df, mode, partition_by, None).options(**options).json(path)


def read_orc(spark: SparkSession, path: str, **options: Any) -> DataFrame:
    """ORC scan (columnar like parquet; predicate pushdown + column
    pruning apply the same way — Spark ships the reader natively)."""
    return spark.read.options(**options).orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
) -> None:
    _writer(df, mode, partition_by, max_records_per_file).orc(path)


def read_avro(spark: SparkSession, path: str, **options: Any) -> DataFrame:
    """Avro source — requires the external ``spark-avro`` package
    (``org.apache.spark:spark-avro_2.13:<spark-version>`` on the
    classpath; it is NOT bundled with Spark or this container). The
    call is format-gated so environments without the jar get a clear
    actionable error instead of a ClassNotFoundException mid-job."""
    try:
        return spark.read.format("avro").options(**options).load(path)
    except Exception as exc:  # AnalysisException: failed to find data source
        if "avro" in str(exc).lower():
            raise RuntimeError(
                "Avro support needs the spark-avro package on the "
                "classpath: start the session with "
                "spark.jars.packages=org.apache.spark:spark-avro_2.13:<ver>"
            ) from exc
        raise


def write_avro(df: DataFrame, path: str, mode: str = "overwrite", **options: Any) -> None:
    """Avro sink — same external-package gate as :func:`read_avro`."""
    try:
        df.write.format("avro").mode(mode).options(**options).save(path)
    except Exception as exc:
        if "avro" in str(exc).lower():
            raise RuntimeError(
                "Avro support needs the spark-avro package on the "
                "classpath: start the session with "
                "spark.jars.packages=org.apache.spark:spark-avro_2.13:<ver>"
            ) from exc
        raise
