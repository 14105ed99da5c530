from basis_devkit_spark.sources.io import (
    read_csv,
    read_json,
    read_jsonl,
    read_orc,
    read_parquet,
    read_records,
    write_csv,
    write_json,
    write_orc,
    write_parquet,
)

__all__ = [
    "read_csv",
    "read_json",
    "read_jsonl",
    "read_orc",
    "read_parquet",
    "read_records",
    "write_csv",
    "write_json",
    "write_orc",
    "write_parquet",
]
